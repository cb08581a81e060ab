package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

// dev-only stage-timing scratchpad — NOT part of the library; deleted
// before commit.
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val memoDir = java.nio.file.Files.createTempDirectory("graft-scratch-memo")
    sys.props("graft.bench.memo") = memoDir.toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def teardown(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.queries.ExtQueries
    // warm
    (1 to 2).foreach { _ =>
      time("full e_pca_power") { noop(ExtQueries.pcaPower(spark, dir)); teardown() }
    }
    val ms = ExtQueries.getClass.getDeclaredMethods
    val pp = ms.find(_.getName == "pcaParts").get
    pp.setAccessible(true)
    val (gUpper, vFinal) = pp.invoke(ExtQueries, spark, dir)
      .asInstanceOf[(DataFrame, DataFrame)]
    time("gram (gUpper materialize)") { gUpper.count() }
    time("iterations (vFinal noop, gram cached)") { noop(vFinal) }
    teardown()
    // fresh parts: iterations including gram
    val (g2, v2) = pp.invoke(ExtQueries, spark, dir)
      .asInstanceOf[(DataFrame, DataFrame)]
    time("iterations cold (vFinal noop incl gram)") { noop(v2) }
    teardown()
    (1 to 2).foreach { _ =>
      time("full e_pca_power again") { noop(ExtQueries.pcaPower(spark, dir)); teardown() }
    }
    spark.stop()
  }
}
