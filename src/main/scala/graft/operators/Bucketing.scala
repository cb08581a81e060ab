package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

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

  /** True iff the physical plan repartitions — the thing bucketing exists to
    * eliminate. Detected structurally ([[ShuffleExchangeLike]] nodes, which
    * covers hash, range AND rebalance exchanges), not by plan-string
    * matching, so the check cannot pass vacuously if Spark's rendering
    * changes; recurses into AQE's wrapped plan, whose nodes `collect` does
    * not traverse. */
  def hasShuffle(df: DataFrame): Boolean = {
    // Leaf wrappers AQE introduces once stages materialize (QueryStageExec,
    // ReusedExchangeExec) hide their subtree from collect — recurse into
    // each, or an executed plan's shuffles would go undetected (a false
    // "no shuffle" is exactly the vacuous pass this method must not give).
    def shuffles(p: SparkPlan): Seq[SparkPlan] = p.collect {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec        => shuffles(q.plan)
      case r: ReusedExchangeExec    => shuffles(r.child)
      case e: ShuffleExchangeLike   => Seq(e: SparkPlan)
    }.flatten
    shuffles(df.queryExecution.executedPlan).nonEmpty
  }
}
