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
  * any smaller conflicting neighbor is known-kept. Each round resolves at
  * least the minimum unresolved item, and in practice a whole "frontier"
  * per round, so rounds track the conflict-chain depth — shallow for dedup
  * graphs. The result equals the sequential greedy walk by construction
  * (spec-checked against a literal sequential reference on random graphs).
  *
  * Same loop discipline as [[ConnectedComponents]]: per-round frames are
  * `localCheckpoint`ed (plan-growth trap), the convergence probe is an
  * aggregate-to-scalar, and the edge frame is persisted.
  *
  * CACHING CONTRACT: persists the conflict-pair frame; callers invoking
  * repeatedly in one session should clearCache() after materializing.
  */
object GreedySelection {

  /** Guard against a logic bug looping forever; each round must resolve
    * at least one item, so hitting this means the fixpoint is broken, not
    * the data. */
  val MaxRounds = 1000

  /** @param pairs conflict edges as two long columns `src` < `dst`
    *              (orientation REQUIRED: src must be the smaller id)
  * @return one row per item appearing in `pairs`: (`v`, `keep`) */
  def survivors(pairs: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = pairs.select(col("src"), col("dst")).persist(lvl)

    // state: 0 = unknown, 1 = keep, -1 = drop. Items with no smaller
    // conflicting neighbor (never a dst) start resolved as keep.
    val verts = p.select(col("src").as("v"))
      .unionByName(p.select(col("dst").as("v"))).distinct()
    var state = verts
      .join(p.select(col("dst").as("v")).distinct().withColumn("hasSmaller", lit(true)),
        Seq("v"), "left")
      .select(col("v"), when(col("hasSmaller").isNull, 1).otherwise(0).as("st"))
      .localCheckpoint(true)
    var unresolved = state.filter(col("st") === 0).count()
    var round = 0
    while (unresolved > 0 && round < MaxRounds) {
      // per unknown item: does any smaller neighbor keep? are all resolved?
      val fromSmaller = p
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
      unresolved = next.filter(col("st") === 0).count()
      state = next
      round += 1
    }
    require(unresolved == 0,
      s"greedy_selection did not resolve in $MaxRounds rounds — each round must " +
        "resolve the minimum unresolved item, so this is a bug, not a data problem")
    state.select(col("v"), (col("st") === 1).as("keep"))
  }
}
