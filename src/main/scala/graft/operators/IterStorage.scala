package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage housekeeping shared by the iterative operators
  * ([[ConnectedComponents]], [[GreedySelection]]).
  *
  * A `localCheckpoint(true)` frame persists its materialized RDD at the
  * RDD level — `spark.catalog.clearCache()` does NOT release it (that only
  * drops Dataset-level cache entries), so an iterative loop that abandons
  * each round's frame without releasing it accumulates one block set per
  * round in executor storage for the life of the session. The operators
  * release every SUPERSEDED round frame as soon as its successor is
  * materialized; only the frame backing the RETURNED result stays
  * persisted (it has to — the result's data lives there), which callers
  * can release the same way once consumed.
  *
  * Fault-tolerance trade, stated once for both operators: `localCheckpoint`
  * truncates lineage by persisting on the executors that computed each
  * partition — losing an executor mid-loop loses partitions with NO
  * recomputation path, aborting the job. That is the right trade in
  * local[*] and on short loops; on a real multi-executor cluster where the
  * loop must survive executor churn, switch to RELIABLE
  * `checkpoint()` (with `sparkContext.setCheckpointDir` on durable
  * storage) — same plan-truncation effect, durable blocks, one extra
  * write per round. */
private[graft] object IterStorage {

  /** Release the persisted RDD(s) behind a localCheckpointed frame (or a
    * projection over one). Blocking=false: the removal is async, callers
    * never wait on it. No-op for frames that are not checkpoint-backed. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(false)
      case _               => ()
    }
}
