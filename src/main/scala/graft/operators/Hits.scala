package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed HITS (Kleinberg's hubs-and-authorities, JACM'99) over an
  * arbitrary edge list — the bipartite-flavored centrality that
  * [[PageRank]] cannot express: a vertex is a good AUTHORITY when good
  * hubs point at it, and a good HUB when it points at good authorities.
  * On a similarity graph the two scores separate "documents many
  * representative documents resemble" (authorities — cluster cores worth
  * keeping) from "documents that resemble a little of everything" (hubs —
  * templated/boilerplate mixtures worth reviewing), a split PageRank's
  * single mass conflates.
  *
  * ENTIRELY INTEGER arithmetic ([[PageRank]]'s fixed-point device extended
  * to the two-phase recurrence): scores are int64 fixed-point at [[Scale]];
  * each half-round is (1) an exact integer contribution sum along edges and
  * (2) an L1 normalization `raw div max(total div Scale, 1)` — two
  * truncating divisions of non-negative values, where Spark `div` and
  * DuckDB `//` agree — so any round count yields bit-identical scores on
  * any partitioning AND cross-engine (what lets the query layer hash-match
  * a DuckDB oracle). The classical formulation normalizes in L2; L1 is the
  * standard integer-friendly variant and identical in the limit up to
  * scale — rankings are unaffected (normalization is a positive scalar).
  * The div-by-div normalization (instead of `raw * Scale div total`) keeps
  * every intermediate ≤ |E|·[[Scale]] ≈ 2²⁰·|E|, overflow-safe to
  * |E| ≈ 2⁴³ edges; the cost is ≤ one fixed-point unit of truncation per
  * vertex per half-round, deterministic and mirrored.
  *
  * At scale: the edge list is repartitioned by `src` ONCE and persisted;
  * each half-round shuffles only the SLIM (vertex, score) frame to the
  * edges' partitioning, one map-side-combined sum by the receiving
  * endpoint, a 1-row total aggregate broadcast back, and a left join to
  * the vertex universe (isolated vertices hold score 0 instead of
  * vanishing). Loop/storage discipline is [[ConnectedComponents]]'s:
  * every round's frames are `localCheckpoint`ed, superseded checkpoints
  * and the edge cache released before returning ([[IterStorage]]).
  */
object Hits {

  /** Fixed-point scale (2²⁰) — deliberately smaller than
    * [[PageRank.Scale]]: HITS sums un-normalized contributions over
    * in-edges before dividing, so headroom must cover |E|·Scale, not
    * just Scale. */
  val Scale: Long = 1L << 20

  /** Integer-exact HITS iteration.
    *
    * @param edges directed edge list with `src` and `dst` long columns;
    *              parallel edges count twice (pre-distinct if unwanted)
    * @param nodes the vertex universe, one `id` long column per vertex
    * @param iters full (authority + hub) rounds, >= 1
    * @return (id, auth, hub) — int64 fixed-point at [[Scale]]; each
    *         column L1-sums to ~[[Scale]] (minus deterministic
    *         truncation); divide by [[Scale]] for the normalized score
    */
  def scores(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iteration count must be >= 1, got $iters")
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ids = nodes.select(col("id"))

    /** One propagate-and-normalize half-round: sum `scores`(id, s) over
      * `from`→`to` edges into the receiving endpoint, then L1-normalize.
      * The contribution sum is persisted for its two consumers (the 1-row
      * total and the normalize join) — unpersisted, the edge join and
      * aggregate would execute twice per half-round. */
    def halfRound(scores: DataFrame, from: String, to: String): DataFrame = {
      val raw = e
        .join(scores.withColumnRenamed("id", from), Seq(from))
        .groupBy(col(to).as("id"))
        .agg(sum(col("s")).as("raw"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = raw.agg(greatest(expr(s"sum(raw) div $Scale"), lit(1L)).as("t"))
      val out = ids.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(total))
        .select(col("id"),
          expr("coalesce(raw, 0L) div t").as("s"))
        .localCheckpoint(true)
      raw.unpersist(false)
      out
    }

    var hub = ids.select(col("id"), lit(Scale).as("s"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val nextAuth = halfRound(hub, "src", "dst")
      if (auth != null) IterStorage.release(auth)
      auth = nextAuth
      val nextHub = halfRound(auth, "dst", "src")
      IterStorage.release(hub) // superseded round (no-op for the seed frame)
      hub = nextHub
    }
    val out = ids
      .join(auth.withColumnRenamed("s", "auth"), Seq("id"))
      .join(hub.withColumnRenamed("s", "hub"), Seq("id"))
      .localCheckpoint(true)
    IterStorage.release(auth)
    IterStorage.release(hub)
    e.unpersist(false)
    out
  }
}
