package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — an operator Spark lacks natively: for every
  * left row, the LATEST right row with rightTime ≤ leftTime within the same
  * key. The naive formulation is a range join (quadratic cross-per-key);
  * this is the scalable form: tag and UNION both sides, one shuffle+sort on
  * (key, time, tag), and a running `last(payload, ignoreNulls)` window —
  * right rows sort before left rows at equal time, so the inclusive ≤
  * semantics fall out of the tag order. Cost: one exchange + one sort over
  * |L|+|R|, independent of match fan-out.
  *
  * Right rows must be unique per (key, time) — pre-aggregate ties (e.g.
  * max_by) to pin which row "the latest" means.
  */
object AsofJoin {

  /** @param payload right-side columns to carry (packed as one struct)
    * @return left rows + `asof` struct column (null when no right row ≤ t) */
  def asof(left: DataFrame, leftKey: Column, leftTime: Column,
           right: DataFrame, rightKey: Column, rightTime: Column,
           payload: Column): DataFrame = {
    val leftCols = left.columns
    // Fail fast (same contract as RangeJoin): the internal temporaries and
    // the output column are reserved — colliding left columns would be
    // silently replaced (`asof`) or produce an opaque ambiguous-column error.
    val reserved = Seq("_k", "_t", "_p", "_tag", "asof")
    val clash = leftCols.filter(reserved.contains)
    require(clash.isEmpty,
      s"asof: left frame must not contain reserved column(s) ${clash.mkString(", ")} " +
        "(internal temporaries _k/_t/_p/_tag and the output column `asof`)")
    val r = right.select(rightKey.as("_k"), rightTime.as("_t"),
      payload.as("_p"), lit(0).as("_tag"))
    val l = left.select((col("*") +: Seq(leftKey.as("_k"), leftTime.as("_t"),
      lit(null).cast(r.schema("_p").dataType).as("_p"), lit(1).as("_tag"))): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select((leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_k"), col("_t"), col("_p"), col("_tag"))): _*))
      .withColumn("asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .drop("_k", "_t", "_p", "_tag")
  }
}
