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

  /** Driver-side replica of hash64(s) mod 2 (first 60 md5 bits). */
  private def armOf(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 2
  }

  test("ab test: arms partition the users; counts and z match the replay") {
    val users = RefQueries.table(spark, dir, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
    val perUser = users.toSeq.map { case (u, evs) =>
      val conv = evs.count(_._2 == "purchase") > evs.count(_._2 == "error")
      (armOf(s"exp1:$u"), if (conv) 1L else 0L)
    }
    val (na, ca) = (perUser.count(_._1 == 0L).toLong,
      perUser.filter(_._1 == 0L).map(_._2).sum)
    val (nb, cb) = (perUser.count(_._1 == 1L).toLong,
      perUser.filter(_._1 == 1L).map(_._2).sum)
    val row = ExtQueries.abTest(spark, dir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(3), row.getLong(4)) ==
      ((na, ca, nb, cb)))
    assert(na + nb == users.size.toLong)
    // a hash split is near-balanced, not degenerate
    assert(na > 0 && nb > 0)
    val (ra, rb) = (ca.toDouble / na, cb.toDouble / nb)
    val pooled = (ca + cb).toDouble / (na + nb)
    val zWant = (ra - rb) /
      math.sqrt(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb))
    assert(row.getDouble(2) == ra && row.getDouble(5) == rb)
    assert(row.getDouble(6) == zWant)
  }

  test("transitions: pair counts match the per-user sequence replay; rows sum to 1 per source") {
    val seqs = RefQueries.table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val want = seqs.values.flatMap { evs =>
      evs.sortBy(e => (e._3, e._2)).sliding(2).collect {
        case Array(x, y) => (x._4, y._4)
      }
    }.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val got = ExtQueries.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.map(t => ((t._1, t._2), t._3)).toMap == want)
    // each source row's probabilities are n_pairs/n_from and sum to ~1
    got.groupBy(_._1).foreach { case (from, rows) =>
      val nFrom = rows.head._4
      assert(rows.map(_._3).sum == nFrom, s"from=$from")
      rows.foreach(t => assert(t._5 == t._3.toDouble / nFrom, s"from=$from"))
    }
  }

  test("cube: every margin equals the sum of the cells it collapses") {
    val got = ExtQueries.cubeAgg(spark, dir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val cells = got.filter { case ((t, d), _) => t != "ALL" && d != -1L }
    // type margins, day margins, grand total — all additive over the cells
    cells.groupBy(_._1._1).foreach { case (t, cs) =>
      assert(got((t, -1L)) ==
        ((cs.values.map(_._1).sum, cs.values.map(_._2).sum)), s"type=$t")
    }
    cells.groupBy(_._1._2).foreach { case (d, cs) =>
      assert(got(("ALL", d)) ==
        ((cs.values.map(_._1).sum, cs.values.map(_._2).sum)), s"day=$d")
    }
    assert(got(("ALL", -1L)) ==
      ((cells.values.map(_._1).sum, cells.values.map(_._2).sum)))
    // lattice size: cells + type margins + day margins + grand total
    val (nT, nD) = (cells.keys.map(_._1).toSet.size, cells.keys.map(_._2).toSet.size)
    assert(got.size == cells.size + nT + nD + 1)
  }

  test("trend: integer OLS moments match the replay; slope is num/den exactly") {
    val daily = RefQueries.table(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).groupBy(_._1)
    ExtQueries.trend(spark, dir).collect().foreach { r =>
      val (et, n, num, den, slope) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))
      val pts = daily(et)
      assert(n == pts.length.toLong, s"type=$et")
      val (sx, sy) = (pts.map(_._2).sum, pts.map(_._3).sum)
      val sxy = pts.map(p => p._2 * p._3).sum
      val sxx = pts.map(p => p._2 * p._2).sum
      assert(num == n * sxy - sx * sy && den == n * sxx - sx * sx, s"type=$et")
      assert(slope == num.toDouble / den.toDouble, s"type=$et")
      // the denominator is n²·Var(x) — strictly positive over ≥2 distinct days
      assert(den > 0, s"type=$et")
    }
  }

  test("window suite: rank fractions and frame navigation match the sorted replay") {
    val events = RefQueries.table(spark, dir, "events")
      .filter(col("user_id") < ExtQueries.WindowSuiteUsers)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).groupBy(_._1)
    val got = ExtQueries.windowSuite(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
    assert(got.length == events.values.map(_.length).sum)
    got.groupBy(_._1).foreach { case (et, rows) =>
      val sorted = events(et).sortBy(t => (t._3, t._2))
      val n = sorted.length
      val pos = sorted.zipWithIndex.map { case (t, i) => (t._2, i) }.toMap
      rows.foreach { case (_, eid, _, pr, cd, vf, vl, vn) =>
        val i = pos(eid)
        assert(pr == (if (n == 1) 0.0 else i.toDouble / (n - 1)), s"$et/$eid")
        assert(cd == (i + 1).toDouble / n, s"$et/$eid")
        assert(vf == sorted.head._3 && vl == sorted.last._3, s"$et/$eid")
        assert(vn == (if (n >= 3) Some(sorted(2)._3) else None), s"$et/$eid")
      }
    }
  }

  test("histogram: bins partition each type's values exactly; replay agrees") {
    val events = RefQueries.table(spark, dir, "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val got = ExtQueries.histogram(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val b = ExtQueries.HistogramBuckets
    got.groupBy(_._1).foreach { case (et, rows) =>
      val vs = events(et)
      val (lo, hi) = (vs.map(_._2).min, vs.map(_._2).max)
      assert(rows.forall(r => r._4 == lo && r._5 == hi), s"type=$et")
      // mass conservation and bin range
      assert(rows.map(_._3).sum == vs.length.toLong, s"type=$et")
      assert(rows.forall(r => r._2 >= 0 && r._2 < b), s"type=$et")
      // exact per-bin replay with the same IEEE op sequence
      val want = vs.map { case (_, v) =>
        if (hi == lo) 0L
        else math.min(math.floor((v - lo) / (hi - lo) * b).toLong, b - 1L)
      }.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
      assert(rows.map(r => (r._2, r._3)).toMap == want, s"type=$et")
    }
  }

  test("collocations: counts, PMI rationals and top-k order match the replay") {
    val texts = RefQueries.table(spark, dir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val toks = texts.map(_.trim.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
    val nUni = uni.values.sum
    val pairCounts = toks.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
      .groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
      .filter(_._2 >= ExtQueries.CollocMinCount)
    val nPairs = pairCounts.values.sum
    val ranked = pairCounts.toSeq.map { case ((a, b), cab) =>
      val num = cab * nUni * nUni
      val den = nPairs * uni(a) * uni(b)
      (a, b, cab, uni(a), uni(b), num, den, num.toDouble / den.toDouble)
    }.sortBy(t => (-t._8, t._1, t._2)).take(ExtQueries.CollocTopK)
    val got = ExtQueries.collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toSeq
    spark.catalog.clearCache()
    assert(got == ranked)
    // PMI sanity: every reported pair co-occurs at least the floor
    assert(got.forall(_._3 >= ExtQueries.CollocMinCount))
  }

  test("skyline: survivors are exactly the non-dominated points (quadratic replay)") {
    val pts = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val t = r.getString(2).trim.split("\\s+")
        (r.getString(1), r.getLong(0), t.length.toLong, t.distinct.length.toLong)
      }
    val got = ExtQueries.skyline(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong,
        r.getInt(3).toLong))
    // the operator's pinned dominance: dominated iff ∃ strictly-longer doc
    // with ≥ distinct; among equal lengths the max-distinct (min id) wins
    val want = pts.groupBy(_._1).flatMap { case (lang, ps) =>
      val best = ps.groupBy(_._3).map { case (_, g) =>
        g.minBy(p => (-p._4, p._2))
      }
      best.filter(p => !best.exists(q => q._3 > p._3 && q._4 >= p._4))
    }.map(p => (p._1, p._2, p._3, p._4)).toSet
    assert(got.toSet == want)
    // within a language the frontier is strictly decreasing in distinct
    // count as token count grows
    got.groupBy(_._1).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(_._3).toSeq
      assert(ordered.map(_._4) == ordered.map(_._4).sorted.reverse, s"lang=$lang")
    }
  }

  test("stickiness: DAU/MAU matches the trailing-window distinct replay") {
    val active = RefQueries.table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = ExtQueries.stickiness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet == active.map(_._2).toSet)
    got.foreach { case (d, dau, mau, s) =>
      val dauWant = active.count(_._2 == d).toLong
      val mauWant = active.filter(a => a._2 > d - ExtQueries.StickinessWindowDays
        && a._2 <= d).map(_._1).distinct.length.toLong
      assert(dau == dauWant && mau == mauWant, s"day=$d")
      assert(s == dau.toDouble / mau, s"day=$d")
      // DAU can never exceed the window's distinct population
      assert(dau <= mau, s"day=$d")
    }
  }

  test("time to convert: durations replay the funnel walk; median is the exact rank") {
    val events = RefQueries.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    // sequential replay of the full chain: (t_first, t_last) per completer
    val durs = events.toSeq.flatMap { case (_, evs) =>
      var t = Long.MinValue
      var first = Long.MinValue
      var ok = true
      ExtQueries.FunnelSteps.zipWithIndex.foreach { case (step, i) =>
        if (ok) {
          val cand = evs.filter(e => e._2 == step && e._3 > t)
          if (cand.isEmpty) ok = false
          else {
            t = cand.map(_._3).min
            if (i == 0) first = t
          }
        }
      }
      if (ok) Some(t - first) else None
    }.sorted
    val row = ExtQueries.timeToConvert(spark, dir).collect().head
    spark.catalog.clearCache()
    assert(row.getLong(0) == durs.length.toLong)
    assert(row.getLong(1) == durs.head && row.getLong(2) == durs.last)
    val medWant = durs((math.ceil(durs.length * 0.5) - 1).toInt)
    assert(row.getLong(3) == medWant)
    // a completer's latency is positive by the strictly-after rule
    assert(durs.head > 0L)
  }
}
