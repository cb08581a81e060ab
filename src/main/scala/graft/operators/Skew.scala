package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for heavy-hitter group keys (100 TB discipline:
  * one hot key must not serialize a 1000-executor aggregation onto one
  * reducer).
  *
  * Salting splits each group across `salts` sub-groups for the heavy partial
  * aggregation, then combines the per-salt partials — a two-level aggregate
  * whose RESULT is identical to the direct form for any decomposable
  * aggregate (sum/count/min/max, and means carried as sum+count). AQE's skew
  * handling covers joins; salting is the aggregation-side counterpart.
  */
object Skew {

  /** A deterministic salt in [0, salts) derived from a spread column (a row
    * id / hash — NOT the group key, which is what's skewed). */
  def saltCol(spread: Column, salts: Int): Column = pmod(xxhash64(spread), lit(salts))

  /** Two-level salted sum+count per group: level 1 aggregates
    * (key, salt) — spreading a hot key over `salts` reducers — level 2
    * combines the tiny per-salt partials. Decimal sums keep the combine
    * exact, so the output is bit-identical to the unsalted aggregate. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     spread: Column, salts: Int = 16): DataFrame =
    df.groupBy(key.as("key"), saltCol(spread, salts).as("salt"))
      .agg(
        count(lit(1)).as("part_n"),
        sum(value.cast("decimal(28,6)")).as("part_sum"))
      .groupBy(col("key"))
      .agg(
        sum(col("part_n")).as("n"),
        sum(col("part_sum")).cast("double").as("total"))
}
