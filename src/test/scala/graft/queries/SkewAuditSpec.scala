package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_skew_audit` — join-key skew diagnostics. Replays every reported
  * metric sequentially from the raw key counts and pins the salt
  * recommendation's defining property: rec_salt shards are each ≤ one
  * fair partition share of rows for the heaviest key. */
class SkewAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("all reported metrics equal a sequential recount") {
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").cast("string"), col("event_type")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byCol = Map(
      "user_id" -> events.groupBy(_._1).view.mapValues(_.length.toLong).toMap,
      "event_type" -> events.groupBy(_._2).view.mapValues(_.length.toLong).toMap)
    val got = ExtQueries.skewAudit(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("event_type", "user_id"))
    got.foreach { r =>
      val counts = byCol(r.getString(0))
      val nRows = counts.values.sum
      val maxCnt = counts.values.max
      assert(r.getLong(1) == nRows)
      assert(r.getLong(2) == counts.size.toLong)
      assert(r.getLong(3) == maxCnt)
      assert(r.getString(4) ==
        counts.filter(_._2 == maxCnt).keys.max, "heaviest key, largest-key tie-break")
      assert(r.getDouble(5) == nRows.toDouble / counts.size.toDouble)
      assert(r.getDouble(6) == maxCnt.toDouble / nRows.toDouble)
      assert(r.getDouble(7) == (maxCnt * counts.size).toDouble / nRows.toDouble)
      val p = ExtQueries.SkewTargetPartitions
      assert(r.getLong(8) == (maxCnt * p + nRows - 1) / nRows, "integer ceil-div")
      // the recommendation's defining property: split max_cnt rows across
      // rec_salt shards and each shard holds at most a fair share
      assert(maxCnt <= r.getLong(8) * ((nRows + p - 1) / p),
        "salted shards of the heaviest key must fit a fair partition share")
    }
  }
}
