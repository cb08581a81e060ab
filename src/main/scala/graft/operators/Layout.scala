package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — the WRITE-side half of `e_zorder`
  * (`ExtQueries.zorder` computes the Morton key; this object turns it into
  * files). The point of a Z-order layout is what it does to per-file
  * min-max statistics: files written in interleaved-key order carry ranges
  * that are tight on EVERY woven dimension at once, so a scan with a
  * predicate on any of them prunes whole files — the Delta `OPTIMIZE
  * ZORDER BY` / Iceberg sort-order mechanism, built from the two Spark
  * primitives it reduces to (`repartitionByRange` + `sortWithinPartitions`).
  *
  * At 100 TB the clustered write is the one intentional range shuffle of
  * the layout job (the same exchange `PlanSpec` pins on `e_zorder`), and
  * file count scales with data — `files` here is executor-parallelism ×
  * target-file-size at scale. [[avgMatchFraction]] is the layout's
  * feedback loop: the expected fraction of files a point predicate cannot
  * prune, measurable per dimension straight from the written files. */
object Layout {

  /** Write `df` clustered by `key`: range-partition into `files` output
    * files, sorted within each — every file owns a contiguous key range. */
  def clusteredWrite(df: DataFrame, key: String, files: Int, path: String): Unit =
    df.repartitionByRange(files, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite").parquet(path)

  /** Per-file [min, max] of each of `dims` — the ranges a pruning scan
    * planner consults, read back from the files themselves. */
  def fileBounds(spark: SparkSession, path: String, dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Expected scan cost of the layout for one dimension: the fraction of
    * files whose [min, max] covers a point predicate `dim = v`, averaged
    * over all distinct values v. 1.0 = the layout never prunes this
    * dimension; 1/files = it prunes it perfectly. */
  def avgMatchFraction(spark: SparkSession, path: String, dim: String): Double = {
    val bounds = fileBounds(spark, path, Seq(dim))
    val vals = spark.read.parquet(path).select(col(dim)).distinct()
    val nFiles = bounds.count().toDouble
    val nVals = vals.count().toDouble
    val hits = vals.join(bounds,
      col(dim) >= col(s"min_$dim") && col(dim) <= col(s"max_$dim")).count().toDouble
    hits / (nFiles * nVals)
  }
}
