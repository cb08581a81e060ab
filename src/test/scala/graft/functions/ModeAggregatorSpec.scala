package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** §2.10 custom-UDAF semantics: pinned tie-break (count DESC, value ASC),
  * null inputs ignored, all-null group → SQL NULL (not a sentinel). */
class ModeAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def mode(values: Seq[java.lang.Long]): java.lang.Long = {
    import spark.implicits._
    val agg = new LongModeAggregator
    val modeOf = udaf(agg, agg.inputEncoder)
    values.map(v => ("g", v)).toDF("g", "v")
      .groupBy("g").agg(modeOf(col("v")).as("m"))
      .collect()(0).getAs[java.lang.Long]("m")
  }

  test("plain mode") {
    assert(mode(Seq(1L, 2L, 2L, 3L)) === 2L)
  }

  test("tie breaks toward the LOWEST value (pinned rule)") {
    assert(mode(Seq(5L, 5L, 3L, 3L, 9L)) === 3L)
  }

  test("nulls are ignored, not counted as a bucket") {
    assert(mode(Seq(null, null, null, 7L)) === 7L)
  }

  test("all-null group yields SQL NULL") {
    assert(mode(Seq(null, null)) === null)
  }
}
