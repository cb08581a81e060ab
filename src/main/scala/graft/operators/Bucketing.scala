package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) join support — the storage-level answer to "this
  * join shuffles the fact table every day". Writing both sides bucketed and
  * sorted by the join key fixes their physical partitioning at write time;
  * Spark then plans a sort-merge join with NO exchange on either side — at
  * 100 TB that deletes the dominant network cost of every recurring join on
  * the same key (the day's shuffle is paid once, at ingest). */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. `buckets`
    * should match across every table that will join on `key` (and divide
    * evenly into cluster parallelism). */
  def writeBucketed(df: DataFrame, path: String, table: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their shared key — shuffle-free by
    * construction (assert with `hasShuffle`). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True iff the physical plan repartitions (an `Exchange hashpartitioning`
    * appears) — the thing bucketing exists to eliminate. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
