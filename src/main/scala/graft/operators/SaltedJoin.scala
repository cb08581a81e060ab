package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigating salted equi-join — the standard remedy when a shuffle
  * equi-join's key distribution is skewed and the small side is still too
  * large to broadcast (the broadcast path, [[graft.queries.RefQueries
  * .broadcastJoin]], is always preferred when it fits; AQE's skew-join
  * split only helps SORT side skew of already-planned joins).
  *
  * Mechanics: the big side salts each row into one of `salts` buckets by a
  * deterministic hash of a caller-supplied id column; the small side
  * replicates each row `salts` times (one per bucket); the join key becomes
  * (key, salt). A hot key's rows now spread over `salts` reducer
  * partitions instead of one, at the price of a `salts`× blow-up of the
  * SMALL side only. The salt is dropped from the output — salting is
  * invisible mechanics, and the result is row-identical to the unsalted
  * join (spec-pinned in `SaltedJoinSpec`).
  *
  * The salt derives from a row ID, not `rand()` — the repo's determinism
  * contract (re-runs, retries and the DuckDB oracle all see the same
  * rows), and exactly as sound for load-spreading since ids are
  * hash-uniform. */
object SaltedJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted `salts` ways.
    * `bigId` should be non-null and hash-uniform (any primary key works);
    * a null `bigId` salts to bucket 0 rather than to a null salt, so such
    * rows still join exactly as they would unsalted instead of silently
    * vanishing through a null join key. Neither input may already carry a
    * `__salt` column — the mechanics would silently overwrite it. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      bigId: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salted join needs salts > 0, got $salts")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedEquiJoin reserves the __salt column; rename it on the inputs first")
    val b = big.withColumn("__salt",
      coalesce(
        pmod(graft.functions.GraftFunctions.hash64(bigId.cast("string")),
          lit(salts.toLong)),
        lit(0L)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
