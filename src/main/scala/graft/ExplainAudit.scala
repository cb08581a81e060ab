package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print scan/pushdown facts for the declared queries — the
  * .explain-and-iterate loop made repeatable. Run:
  * `sbt "runMain graft.ExplainAudit [queryKey ...]"`. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val keys = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- keys) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // DISTINCT node ids: formatted mode reprints a node wherever its
      // subtree appears (e.g. inside each InMemoryRelation), so raw line
      // counts overstate scans for persisted plans.
      val scans = """\((\d+)\) Scan parquet""".r
        .findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"######## $name  [parquet scans: $scans]")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .map(_.trim.take(160)).foreach(println)
    }
    spark.stop()
  }
}
