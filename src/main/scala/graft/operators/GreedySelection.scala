package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-greedy maximal independent set over a conflict graph — the
  * distributed form of "walk items in id order; keep each one unless it
  * conflicts with something already kept". This is the keep-against-
  * SURVIVORS rule semantic dedup actually wants
  * ([[graft.queries.ExtQueries.semanticDedup]] documents why its single-pass
  * pairwise rule over-drops on conflict CHAINS): the greedy result
  * guarantees both
  *   - independence: no two kept items conflict, and
  *   - domination: every dropped item conflicts with a KEPT item
  * whereas pairwise domination only guarantees the first.
  *
  * Algorithm: fixpoint over a keep/drop/unknown ternary state. An item is
  * KEPT once every smaller conflicting neighbor is known-dropped (items
  * with no smaller neighbor resolve immediately); an item is DROPPED once
  * any smaller conflicting neighbor is known-kept. The result equals the
  * sequential greedy walk by construction (spec-checked against a literal
  * sequential reference on random graphs).
  *
  * COMPLEXITY, honestly: rounds = the depth of the longest conflict CHAIN,
  * and each chain link is a true sequential dependency of the greedy order
  * (on a path, vertex k cannot resolve before k−1 — lexicographically-first
  * MIS is P-complete, so no generic pointer-jumping shortcut exists the way
  * it does for [[ConnectedComponents]]). Dedup conflict graphs are shallow
  * in practice (dup groups are near-cliques, which resolve in 2 rounds);
  * pre-clustering with [[ConnectedComponents]] bounds chain depth by
  * component diameter if the data can be adversarial. Per-round work is
  * limited to the FRONTIER: only in-edges of still-unresolved items are
  * aggregated, so total edge visits are O(Σ frontier in-edges), not
  * O(rounds × |E|).
  *
  * Same loop discipline as [[ConnectedComponents]]: per-round frames are
  * `localCheckpoint`ed (plan-growth trap; executor-loss trade and the
  * reliable-`checkpoint()` cluster switch documented on [[IterStorage]]),
  * and the convergence probe is an aggregate-to-scalar, no row collects.
  *
  * STORAGE CONTRACT: the conflict-pair cache and every superseded round's
  * checkpoint are released before returning ([[IterStorage]], spec-pinned);
  * only the RETURNED frame's backing checkpoint remains persisted —
  * release it the same way once consumed.
  */
object GreedySelection {

  /** Bound on conflict-CHAIN depth, not a convergence heuristic: each round
    * resolves at least the minimum unresolved item, so hitting this means
    * the data has a conflict chain deeper than [[MaxRounds]] — raise the
    * limit or pre-cluster ([[ConnectedComponents]]) and process components;
    * it does not indicate a code bug. */
  val MaxRounds = 1000

  /** @param pairs conflict edges as two long columns `src` < `dst`
    *              (orientation REQUIRED: src must be the smaller id — the
    *              "smaller neighbor" logic below reads it as such, so a
    *              reversed or unordered edge would silently corrupt the
    *              survivor set; enforced by a one-aggregate runtime guard
    *              that fails loud on the first misoriented edge)
    * @return one row per item appearing in `pairs`: (`v`, `keep`) */
  def survivors(pairs: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = pairs.select(col("src"), col("dst")).persist(lvl)
    var state: DataFrame = null
    try {
      survivorsLoop(p, { s => state = s })
    } catch { case t: Throwable =>
      // failure-path housekeeping: a caller that catches (misoriented
      // input, over-deep chain) and retries must not accumulate a pair
      // cache + round checkpoint per failed call
      if (state != null) IterStorage.release(state)
      p.unpersist(false)
      throw t
    }
  }

  /** The guarded fixpoint; `track` publishes the live round frame so the
    * failure path above can release it. */
  private def survivorsLoop(p: DataFrame, track: DataFrame => Unit): DataFrame = {
    // Orientation guard: one aggregate over the frame the loop probes every
    // round anyway (the action doubles as the cache warm-up), so the check
    // adds no extra scan of the input lineage. min(dst - src) > 0 iff every
    // edge satisfies src < dst. The cast makes the guard type-stable: int-
    // typed id columns must hit the require message, not a ClassCastException.
    val minGap = p.agg(min((col("dst") - col("src")).cast("long"))).head().get(0)
    require(minGap == null || minGap.asInstanceOf[Long] > 0,
      "greedy_selection: pairs must be oriented src < dst (the greedy order " +
        s"reads src as the smaller id); found an edge with dst - src = $minGap. " +
        "Orient with least/greatest (and drop self-pairs) before calling.")

    // state: 0 = unknown, 1 = keep, -1 = drop. Items with no smaller
    // conflicting neighbor (never a dst) start resolved as keep.
    val verts = p.select(col("src").as("v"))
      .unionByName(p.select(col("dst").as("v"))).distinct()
    var state = verts
      .join(p.select(col("dst").as("v")).distinct().withColumn("hasSmaller", lit(true)),
        Seq("v"), "left")
      .select(col("v"), when(col("hasSmaller").isNull, 1).otherwise(0).as("st"))
      .localCheckpoint(true)
    track(state)
    var unresolved = state.filter(col("st") === 0).count()
    var round = 0
    while (unresolved > 0 && round < MaxRounds) {
      // FRONTIER-limited: aggregate only the in-edges of still-unresolved
      // items — resolved items' edges would recompute the same min/max
      // every round for nothing
      val open = state.filter(col("st") === 0).select(col("v").as("dst"))
      val fromSmaller = p.join(open, Seq("dst"), "leftsemi")
        .join(state.withColumnRenamed("v", "src").withColumnRenamed("st", "sst"), "src")
        .groupBy(col("dst").as("v"))
        .agg(max(col("sst")).as("maxSt"), min(col("sst")).as("minSt"))
      val next = state.join(fromSmaller, Seq("v"), "left")
        .select(col("v"),
          when(col("st") =!= 0, col("st"))
            .when(col("maxSt") === 1, -1)  // a smaller kept neighbor exists
            .when(col("minSt") === -1 && col("maxSt") === -1, 1) // all dropped
            .otherwise(0)
            .as("st"))
        .localCheckpoint(true)
      // next is materialized (eager checkpoint): the previous round's state
      // is superseded — release it (storage contract above)
      IterStorage.release(state)
      state = next
      track(state)
      unresolved = next.filter(col("st") === 0).count()
      round += 1
    }
    require(unresolved == 0,
      s"greedy_selection: a conflict chain deeper than $MaxRounds rounds remains " +
        "unresolved — raise MaxRounds or pre-cluster with ConnectedComponents " +
        "and process components separately (greedy order is inherently sequential " +
        "along chains)")
    // the result rides the final checkpoint only — the pair cache served
    // the loop and is dead weight from here on
    p.unpersist(false)
    state.select(col("v"), (col("st") === 1).as("keep"))
  }
}
