package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peel over an arbitrary UNDIRECTED edge list — the
  * general engine behind the mutual-kNN dense-region extractor
  * ([[graft.queries.ExtQueries.kcore]]), usable on any symmetric
  * `(src, nbr)` frame: social/citation graphs, co-occurrence graphs,
  * similarity graphs. Each round deletes every vertex with fewer than `k`
  * SURVIVING neighbors; run to the fixpoint this computes the classic
  * k-core, and with a pinned round count it computes the peel's
  * deterministic prefix (what an oracle with unrolled rounds can state).
  *
  * Determinism: exact integer degrees; the survivor set after any round
  * is a pure function of the edge SET — partition- and arrival-order
  * invariant (ScalaCheck-pinned against a sequential peel on random
  * graphs, including the fixpoint and k-monotonicity laws).
  *
  * At scale: each round is two semi-joins of the edge list against the
  * SHRINKING survivor set plus one map-side-combined degree count — slim
  * id pairs only. Loop/storage discipline (the [[ConnectedComponents]]
  * pattern): each round's survivor frame `localCheckpoint`s eagerly (a
  * lazily-chained peel nests one join tree per round — measured
  * pathological past ~10 rounds) and every superseded round releases via
  * [[IterStorage]]; only the RETURNED frame's checkpoint survives —
  * callers release it the same way once consumed.
  *
  * CALLER CONTRACT: `edges` must be SYMMETRIC (both directions present
  * for every undirected edge — degrees are counted over `src`) and
  * should be MATERIALIZED (persisted or checkpointed) by the caller: the
  * engine scans it twice per round and deliberately does not cache it,
  * so one materialization can serve the peel AND the caller's own
  * degree/report passes without a second copy.
  */
object Kcore {

  /** Survivors of `rounds` peel rounds at threshold `k`, as one `id`
    * column. `rounds = 0` returns the vertex set (every edge endpoint). */
  def survivors(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"degree threshold must be >= 1, got $k")
    require(rounds >= 0, s"round count must be >= 0, got $rounds")
    var alive = edges.select(col("src").as("id")).distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val next = edges
        .join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("id").as("nbr")), Seq("nbr"), "left_semi")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("id"))
        .localCheckpoint(true)
      IterStorage.release(alive)
      alive = next
    }
    alive
  }
}
