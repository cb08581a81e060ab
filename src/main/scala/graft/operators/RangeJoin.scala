package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — point x matched to intervals with
  * lo ≤ x < hi. Spark plans a bare inequality join as a broadcast
  * nested-loop or cartesian product — quadratic and a 100 TB non-starter.
  * This is the binned form: intervals explode to the fixed-width bins they
  * overlap, points map to their bin, and the match becomes an EQUI-join on
  * the bin key plus a residual bounds filter. Each (point, interval) pair
  * can only meet in the point's own bin, so no dedup pass is needed.
  * Cost: shuffle ∝ |points| + |intervals|·(span/W + 1); pick `binWidth`
  * near the typical interval span so most intervals explode to ≤ 2 bins.
  */
object RangeJoin {

  /** @return each point row joined to every interval row containing it.
    * Precondition (checked): the two frames' column names are disjoint and
    * neither uses the reserved `_bin`/`_x`/`_lo`/`_hi` temporaries — a
    * shared name would survive the using-column join as an ambiguous pair,
    * and a reserved name would be silently overwritten. Fail fast instead. */
  def pointInInterval(points: DataFrame, x: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      binWidth: Double): DataFrame = {
    val reserved = Set("_bin", "_x", "_lo", "_hi")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"pointInInterval requires disjoint column names; shared: ${overlap.mkString(", ")}")
    val clash = (points.columns ++ intervals.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"pointInInterval reserves ${reserved.mkString("/")}; rename: ${clash.mkString(", ")}")
    val binned = intervals
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .withColumn("_bin",
        explode(sequence(floor(col("_lo") / binWidth).cast("long"),
          floor(col("_hi") / binWidth).cast("long"))))
    points
      .withColumn("_x", x)
      .withColumn("_bin", floor(col("_x") / binWidth).cast("long"))
      .join(binned, "_bin")
      .filter(col("_lo") <= col("_x") && col("_x") < col("_hi"))
      .drop("_bin", "_x", "_lo", "_hi")
  }
}
