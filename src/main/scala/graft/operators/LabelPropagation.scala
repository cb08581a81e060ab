package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous seeded label propagation over an arbitrary edge list — the
  * weak-supervision primitive: a small set of trusted labels (human-tagged
  * documents, known-language pages, verified-quality samples) spreads to
  * the rest of the corpus along a similarity graph
  * ([[graft.queries.ExtQueries.labelProp]] binds it to the knn graph).
  *
  * Update rule, per round, for every NON-seed vertex: take the majority
  * label among neighbors labeled in the PREVIOUS round (synchronous —
  * a round reads only the prior round's assignment, so the result is
  * independent of intra-round execution order), tie-broken (count DESC,
  * label ASC); keep the current label when no neighbor is labeled. Seeds
  * never change. All-integer labels and counts — every step is exact and
  * partition-order-invariant, so any round count yields bit-identical
  * assignments on any partitioning (and cross-engine against a SQL oracle).
  *
  * The deterministic argmax is two map-side-combinable AGGREGATES (max
  * count per vertex, then min label at that count) rather than a ranking
  * window — a hub vertex's full vote list never lands on one window
  * partition (the [[graft.queries.ExtQueries.chunkDedup]] rationale).
  *
  * At scale: the edge list is repartitioned by `dst` ONCE and persisted;
  * each round shuffles only the SLIM (id, label) frame to that layout,
  * one vote aggregate, and a left join back to the vertex set. Loop
  * storage follows the [[ConnectedComponents]]/[[PageRank]] discipline:
  * every round's frame is `localCheckpoint`ed, superseded checkpoints and
  * the edge cache are released before returning; only the RETURNED
  * frame's checkpoint stays persisted (release it once consumed). See
  * [[IterStorage]] for the localCheckpoint-vs-reliable-checkpoint
  * fault-tolerance statement. */
object LabelPropagation {

  /** @param edges directed (src, dst): src COLLECTS votes from its dst
    *              neighbors — symmetrize before calling for undirected
    *              propagation
    * @param seeds (id, label) fixed assignments, never overwritten
    * @param nodes vertex universe, one `id` per vertex (vertices outside
    *              it silently drop)
    * @param iters synchronous rounds, >= 1
    * @return (id, label, is_seed) — label null where propagation never
    *         reached the vertex
    */
  def propagate(edges: DataFrame, seeds: DataFrame, nodes: DataFrame,
                iters: Int): DataFrame = {
    require(iters >= 1, s"iteration count must be >= 1, got $iters")
    val edgesP = edges.select(col("src"), col("dst"))
      .repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lab = nodes.select(col("id"))
      .join(seeds.select(col("id"), col("label"), lit(true).as("is_seed")),
        Seq("id"), "left")
      .select(col("id"), col("label"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val votes = edgesP
        .join(lab.select(col("id").as("dst"), col("label").as("nlab")), Seq("dst"))
        .filter(col("nlab").isNotNull)
        .groupBy(col("src"), col("nlab"))
        .agg(count(lit(1)).as("cnt"))
      val mc = votes.groupBy(col("src")).agg(max(col("cnt")).as("mcnt"))
      val best = votes.join(mc, Seq("src"))
        .filter(col("cnt") === col("mcnt"))
        .groupBy(col("src")).agg(min(col("nlab")).as("maj"))
      val prev = lab
      lab = lab.join(best.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"),
          when(col("is_seed"), col("label"))
            .otherwise(coalesce(col("maj"), col("label"))).as("label"),
          col("is_seed"))
        .localCheckpoint(true)
      IterStorage.release(prev)
    }
    edgesP.unpersist(false)
    lab
  }
}
