package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_retention` + `e_funnel` — the two product-analytics operators over
  * the event stream, each checked against a sequential driver-side replay
  * of its definition. */
class AnalyticsOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def activeDays: Array[(Long, Long)] =
    RefQueries.table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))

  test("retention matches the cohort replay; offset-0 row is the full cohort") {
    val active = activeDays
    val cohorts = active.groupBy(_._1).map { case (u, ds) => (u, ds.map(_._2).min) }
    val sizes = cohorts.values.groupBy(identity).map { case (c, us) => (c, us.size.toLong) }
    val want = active.map { case (u, d) => (cohorts(u), d - cohorts(u)) }
      .groupBy(identity).map { case ((c, off), rows) =>
        (c, off, rows.length.toLong, sizes(c))
      }.toSet
    val got = ExtQueries.retention(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == want)
    // by construction every cohort member is active on their first day
    got.filter(_._2 == 0L).foreach { case (c, _, nActive, nCohort) =>
      assert(nActive == nCohort, s"cohort=$c")
    }
    // retention can never exceed 1 and n_active never exceeds the cohort
    ExtQueries.retention(spark, dir).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getDouble(4) <= 1.0)
    }
  }

  test("funnel matches the sequential per-user walk; counts are monotone") {
    val events = RefQueries.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    // sequential replay: per user, walk the ordered steps, each conversion
    // strictly after the previous one
    val converted = ExtQueries.FunnelSteps.indices.map { k =>
      events.count { case (_, evs) =>
        var t = Long.MinValue
        var ok = true
        ExtQueries.FunnelSteps.take(k + 1).foreach { step =>
          if (ok) {
            val cand = evs.filter(e => e._2 == step && e._3 > t)
            if (cand.isEmpty) ok = false else t = cand.map(_._3).min
          }
        }
        ok
      }.toLong
    }
    val got = ExtQueries.funnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.map(_._3).toSeq == converted)
    assert(got.map(_._2).toSeq == ExtQueries.FunnelSteps)
    // the funnel narrows: each step converts a subset of the previous one
    assert(got.map(_._3).toSeq == got.map(_._3).toSeq.sorted.reverse)
    // conversion rates are consistent with the counts
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._4 == b._3.toDouble / a._3.toDouble, s"step=${b._1}")
      case _ =>
    }
  }

  test("mad outliers: medians/MAD match the sorted replay; band flags agree") {
    val events = RefQueries.table(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = ExtQueries.madOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4)))
    assert(got.map(_._1).toSeq == events.keys.toSeq.sorted)
    got.foreach { case (et, n, med, mad, nOut) =>
      val vs = events(et).sortBy(t => (t._3, t._2))
      assert(n == vs.length, s"type=$et")
      val medWant = vs(((n + 1) / 2).toInt - 1)._3
      assert(med == medWant, s"type=$et")
      val devs = events(et).map(t => (math.abs(t._3 - medWant), t._2))
        .sortBy(identity)
      val madWant = devs(((n + 1) / 2).toInt - 1)._1
      assert(mad == madWant, s"type=$et")
      assert(nOut == events(et).count(t => math.abs(t._3 - medWant) > 3.0 * madWant),
        s"type=$et")
      // MAD is robust: at most half the values can sit outside the band
      assert(nOut <= n / 2, s"type=$et")
    }
  }

  test("anomaly days: integer inequality IS the 2-sigma test, replayed in exact arithmetic") {
    val got = ExtQueries.anomalyDays(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    got.groupBy(_._1).foreach { case (et, rows) =>
      val cs = rows.map(_._3)
      val n = cs.length.toLong
      val s = cs.sum
      val q = cs.map(c => c * c).sum
      rows.foreach { case (_, day, c, dev2, var4, flag) =>
        assert(dev2 == (c * n - s) * (c * n - s), s"type=$et day=$day")
        assert(var4 == 4L * (n * q - s * s), s"type=$et day=$day")
        assert(flag == (dev2 > var4), s"type=$et day=$day")
        // the integer inequality is exactly |c - mean| > 2*sigma
        val mean = s.toDouble / n
        val variance = (q.toDouble - s.toDouble * s / n) / n
        val exact = math.abs(c - mean) > 2.0 * math.sqrt(variance)
        assert(flag == exact, s"type=$et day=$day")
      }
    }
  }
}
