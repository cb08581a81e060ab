package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: write each named query's `.explain("formatted")` output to
  * `<outDir>/<key>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/rNN/`. Run:
  * `sbt "runMain graft.PlanDump <outDir> <tag> key [key ...]"`.
  *
  * Session config mirrors [[Bench]] (same shuffle partitions, extensions,
  * timezone). Explain itself is driver-side, but CONSTRUCTING some frames
  * runs jobs: the Louvain keys eagerly localCheckpoint their substrates
  * when those are not memo-backed, so a default dump executes those pin
  * jobs and captures the full-lineage plan — NOT literally the plan the
  * bench executes (Bench sets `graft.bench.memo`, so its Louvain/harness
  * substrates are parquet memo scans). Set `SPARK_GRAFT_MEMO=1` to point
  * `graft.bench.memo` at a temp dir and dump the bench-mode plan shape
  * instead (first access materializes each memo table, which runs jobs).
  * AQE nodes show the initial plan — the Exchange/join-strategy shape the
  * optimizer chose, which is what the plan pins assert about. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> key [key ...]")
    val (outDir, tag, keys) = (args(0), args(1), args.drop(2).toSeq)
    if (sys.env.contains("SPARK_GRAFT_MEMO")) {
      val memoDir = java.nio.file.Files.createTempDirectory("graft-plandump-memo")
      sys.props("graft.bench.memo") = memoDir.toString
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- keys) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
      val exchanges = "Exchange".r.findAllIn(plan).size
      println(s"$name: ${plan.linesIterator.size} lines, ~$exchanges Exchange mentions -> $p")
    }
    spark.stop()
  }
}
