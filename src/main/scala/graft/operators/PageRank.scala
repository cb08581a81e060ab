package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an arbitrary edge list — the general engine
  * behind similarity-graph centrality
  * ([[graft.queries.ExtQueries.pageRank]]), usable on any (src, dst) frame
  * whose vertex universe is supplied explicitly (so isolated vertices keep
  * their teleport mass instead of vanishing).
  *
  * ENTIRELY INTEGER arithmetic, by construction: mass is int64 fixed-point
  * at [[Scale]], the damping factor 0.85 is the integer computation
  * `m*85 div 100`, and per-edge contributions divide by the out-degree
  * with integer `div` — every operation is exact and
  * partition-order-invariant, so any iteration count yields bit-identical
  * masses on any partitioning (and cross-engine, which is what lets the
  * query layer hash-match a DuckDB oracle). All masses are non-negative,
  * where floor and truncating division agree; each division loses at most
  * one fixed-point unit (deterministically), and dangling vertices leak
  * their damped mass — the standard no-redistribution variant.
  *
  * At scale: the edge list is joined with its out-degrees ONCE,
  * repartitioned by `src` and persisted, so every iteration reuses that
  * layout — the per-round cost is shuffling the SLIM (vertex, mass) frame
  * to the edges' partitioning, one map-side-combined contribution sum by
  * destination, and a left join back to the vertex set for the teleport
  * term. Nothing about the underlying corpus moves after graph
  * construction.
  *
  * Loop/storage discipline (the [[ConnectedComponents]] pattern): each
  * round's mass frame is `localCheckpoint`ed — an unbounded-iteration
  * plan would otherwise nest one join tree per round and Catalyst
  * re-walks the whole tree per action — and every SUPERSEDED round's
  * checkpoint plus the edge cache are released before returning
  * ([[IterStorage]]); only the RETURNED frame's backing checkpoint
  * remains persisted — release it the same way (or stop the session)
  * once consumed. See [[IterStorage]] for the localCheckpoint-vs-reliable-
  * checkpoint fault-tolerance statement.
  */
object PageRank {

  /** Fixed-point scale (2⁴⁰): masses are probabilities ≤ 1, so scaled
    * values fit comfortably in int64 even summed over every in-edge of a
    * hub vertex. */
  val Scale: Long = 1L << 40

  /** Integer-exact power iteration.
    *
    * @param edges directed edge list with `src` and `dst` long columns;
    *              parallel edges count twice (pre-distinct if unwanted)
    * @param nodes the vertex universe, one `id` long column per vertex —
    *              must cover every src/dst (vertices outside it silently
    *              drop from the result)
    * @param iters power-iteration rounds, >= 1
    * @return (id, mass) — int64 fixed-point at [[Scale]]; divide by
    *         [[Scale]] for the probability
    */
  def ranks(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iteration count must be >= 1, got $iters")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgesDeg = edges.select(col("src"), col("dst")).join(deg, Seq("src"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = nodes.select(col("id"))
    val nRow = ids.agg(count(lit(1)).as("n"))
    var pr = ids.crossJoin(broadcast(nRow))
      .select(col("id"), expr(s"$Scale div n").as("mass"))
    for (_ <- 1 to iters) {
      val inflow = edgesDeg
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("((mass * 85) div 100) div deg").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("inflow"))
      val next = ids.crossJoin(broadcast(nRow))
        .join(inflow, Seq("id"), "left")
        .select(col("id"),
          (expr(s"(($Scale * 15) div 100) div n")
            + coalesce(col("inflow"), lit(0L))).as("mass"))
        .localCheckpoint(true)
      IterStorage.release(pr) // superseded round (no-op for the seed frame)
      pr = next
    }
    edgesDeg.unpersist(false) // final checkpoint no longer depends on it
    pr
  }
}
