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

  /** @return each point row joined to every interval row containing it. */
  def pointInInterval(points: DataFrame, x: Column,
                      intervals: DataFrame, lo: Column, hi: Column,
                      binWidth: Double): DataFrame = {
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
