package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the general engine
  * behind near-duplicate CLUSTERING ([[graft.queries.ExtQueries.dupClusters]]):
  * every vertex ends up labeled with the minimum vertex id of its component.
  *
  * Algorithm: min-label propagation with POINTER JUMPING. Each round does
  * two relaxations —
  *   1. neighbor min: `l(v) ← min(l(v), min over neighbors u of l(u))`
  *   2. jump: `l(v) ← l(l(v))` (labels are vertex ids, so a vertex can
  *      adopt its label's label — Shiloach–Vishkin-style shortcutting, the
  *      same idea as the large-star/small-star MapReduce formulation)
  * Step 1 alone needs O(diameter) rounds (a 50-chain = 50 rounds); the jump
  * doubles the effective reach every round, so convergence is O(log d) —
  * a 10⁶-vertex chain converges in ~21 rounds, and the [[MaxRounds]] guard
  * is unreachable for any graph that fits in storage.
  *
  * Scale/lineage discipline: every round's frame is `localCheckpoint`ed —
  * an iterative DataFrame loop that persists instead grows its ANALYZED
  * plan ~k^round (k = self-references per round) and Catalyst re-walks the
  * whole tree per action (measured 3 s → 15 s per round before truncation;
  * see the dup-clusters scaladoc). Labels only ever DECREASE, so the
  * convergence check rides the same projection (changed ⇔ any min < old) —
  * one aggregate-to-scalar action per round, no row collects.
  * `localCheckpoint` trades executor-loss tolerance for speed — on a real
  * cluster with churn, reliable `checkpoint()` is the switch (see
  * [[IterStorage]] for the full statement).
  *
  * STORAGE CONTRACT: the edge frames and every superseded round's
  * checkpoint are released before returning ([[IterStorage]],
  * spec-pinned via getPersistentRDDs); only the RETURNED frame's backing
  * checkpoint remains persisted — release it the same way (or stop the
  * session) once consumed.
  */
object ConnectedComponents {

  /** Unreachable for real graphs (reach doubles per round); exists so a
    * logic bug fails loud instead of looping forever. */
  val MaxRounds = 64

  /** @param pairs undirected edges as two long columns `src`, `dst`
    *              (each edge listed once, either orientation)
    * @return one row per vertex that appears in `pairs`: (`v`, `label`)
    *         with `label` = min vertex id of v's component */
  def components(pairs: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = pairs.select(col("src"), col("dst")).persist(lvl)
    val edges = p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .persist(lvl)

    var live = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(true)
    val result =
      try componentsLoop(edges, live, { l => live = l })
      catch { case t: Throwable =>
        // failure-path housekeeping: the non-convergence guard must not
        // leave the edge caches + the last live round's checkpoint behind
        // for a caller that catches and moves on
        IterStorage.release(live)
        p.unpersist(false)
        edges.unpersist(false)
        throw t
      }
    // the result rides the FINAL checkpoint only — the edge caches served
    // the loop and are dead weight from here on
    p.unpersist(false)
    edges.unpersist(false)
    result
  }

  /** The fixpoint itself; returns the converged checkpoint-backed frame.
    * `track` publishes each round's live frame so the failure path above
    * can release it (the caller owns release of everything else). */
  private def componentsLoop(edges: DataFrame, init: DataFrame,
      track: DataFrame => Unit): DataFrame = {
    var labels = init
    var converged = false
    var round = 0
    while (!converged && round < MaxRounds) {
      val neighborMin = edges.join(labels.withColumnRenamed("v", "src"), "src")
        .groupBy(col("dst").as("v"))
        .agg(min(col("label")).as("nmin"))
      val stepped = labels.withColumnRenamed("label", "old")
        .join(neighborMin, Seq("v"), "left")
        .select(col("v"),
          least(col("old"), coalesce(col("nmin"), col("old"))).as("label"),
          (coalesce(col("nmin"), col("old")) < col("old")).as("chg"))
        // checkpointed BEFORE the self-join below: both jump sides read this
        // frame, and without materialization the neighbor-min subtree would
        // plan and execute once per side every round
        .localCheckpoint(true)
      // pointer jump: adopt the label's own label (labels are vertex ids,
      // and a label can only shrink, so the jump is always a relaxation)
      val next = stepped.as("a")
        .join(stepped.select(col("v").as("lv"), col("label").as("ll")).as("b"),
          col("a.label") === col("b.lv"), "left")
        .select(col("a.v").as("v"),
          least(col("a.label"), coalesce(col("b.ll"), col("a.label"))).as("label"),
          (col("a.chg") ||
            coalesce(col("b.ll"), col("a.label")) < col("a.label")).as("chg"))
        .localCheckpoint(true)
      // next is materialized (eager checkpoint): everything it was derived
      // from is now superseded — release, don't accumulate a block set per
      // round (storage contract above)
      IterStorage.release(stepped)
      IterStorage.release(labels)
      labels = next.select(col("v"), col("label"))
      track(labels)
      val changed = next.filter(col("chg")).count()
      converged = changed == 0
      round += 1
    }
    require(converged,
      s"connected_components did not converge in $MaxRounds rounds — impossible " +
        "for a finite graph with doubling reach; this is a bug, not a data problem")
    labels
  }
}
