package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_domain_cap` + `e_importance_sample` — the two deterministic samplers
  * added on top of [[ExtQueries.stratifiedSample]]/[[ExtQueries.tempMix]]:
  * per-domain capping (bounded-state top-k selection) and LM-likelihood
  * importance sampling (exact-integer acceptance). Both are checked against
  * sequential driver-side replays of their selection rules. */
class SamplingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("domain cap: never more than K per source, selection matches the sequential draw") {
    val got = ExtQueries.domainCap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val perSource = got.groupBy(_._2)
    assert(perSource.values.forall(_.length <= ExtQueries.DomainCapK))
    // ranks are contiguous 1..n within each source under (priority, doc_id)
    perSource.foreach { case (src, rows) =>
      val ordered = rows.sortBy(t => (t._3, t._1))
      assert(ordered.map(_._4).toSeq == (1 to rows.length), s"source=$src")
    }
    // the kept set is exactly the first K of the full deterministic order —
    // replay it from the raw table
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.hash64
    val all = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        pmod(hash64(concat(lit("cap:"), col("doc_id").cast("string"))),
          lit(1L << 20)).as("priority"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(t => (t._3, t._1)).take(ExtQueries.DomainCapK).toSeq
    }.map(t => (t._1, t._2, t._3)).toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet == want)
  }

  /** Driver-side replica of hash64(s) mod 2^20 (first 60 md5 bits). */
  private def bucket20(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % (1L << 20)
  }

  test("importance sample: kept set IS {u*max < p_fp*2^20}, replayed exactly") {
    val scores = ExtQueries.bigramLm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))   // (doc_id, p_fp)
    spark.catalog.clearCache()
    val kept = ExtQueries.importanceSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(3)))   // (doc_id, u)
    spark.catalog.clearCache()
    val m = scores.map(_._2).max
    assert(m > 0)
    // full sequential replay of the acceptance rule over EVERY document
    val want = scores.collect {
      case (id, p) if bucket20(s"imp:$id") * m < p * (1L << 20) =>
        id -> bucket20(s"imp:$id")
    }.toMap
    assert(kept.toMap == want)
    // the sampler behaves like a sampler: keeps something, drops something,
    // and every zero-score document is dropped (inherits the score domain)
    assert(kept.nonEmpty && kept.length < scores.length)
    val keptIds = kept.map(_._1).toSet
    assert(scores.filter(_._2 == 0L).forall(t => !keptIds.contains(t._1)))
  }

  test("priority sample: top-k replayed exactly; HT estimate sums near the true total") {
    import org.apache.spark.sql.functions._
    val got = ExtQueries.prioritySample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(got.length == ExtQueries.PrioritySampleK)

    // sequential replay of the priority order over every document
    val P = graft.functions.GraftFunctions.IntModulus
    val all = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val h = hashMod(s"pri:$id", P)
        (id, w, w.toDouble * P.toDouble / (h + 1).toDouble)
      }
    val order = all.sortBy(t => (-t._3, t._1))
    val wantSample = order.take(ExtQueries.PrioritySampleK)
      .map(t => (t._1, t._2, t._3)).toSeq
    assert(got.map(t => (t._1, t._2, t._3)).sortBy(t => (-t._3, t._1)).toSeq
      == wantSample)

    // τ is the (k+1)-th priority; ŵ = max(w, τ) row-wise
    val tau = order(ExtQueries.PrioritySampleK)._3
    got.foreach { case (id, w, _, est) =>
      assert(est == math.max(w.toDouble, tau), s"doc $id")
    }
    // every heavy item (w > τ) is provably in the sample (its priority
    // w·P/(h+1) ≥ w > τ), and carries ŵ = w
    val sampled = got.map(_._1).toSet
    all.filter(_._2 > tau).foreach { case (id, _, _) =>
      assert(sampled.contains(id), s"heavy doc $id missing")
    }
    // the estimator estimates: Σŵ over the sample lands near Σw (unbiased
    // with near-optimal variance — a 2x deviation would mean a bug, not
    // bad luck)
    val estSum = got.map(_._4).sum
    val trueSum = all.map(_._2.toDouble).sum
    assert(estSum > 0.5 * trueSum && estSum < 2.0 * trueSum,
      s"HT sum $estSum vs true $trueSum")
  }

  test("priority sample: n <= k means tau = 0, est_w = w, HT sum = TRUE total") {
    import org.apache.spark.sql.functions._
    // sample size >= population: the whole table is the sample and DLT
    // defines tau = 0 — every weight survives unchanged and the estimate
    // is exact (round-10 ADVICE: a min-of-population tau inflates it)
    val n = RefQueries.table(spark, dir, "documents").count().toInt
    val got = ExtQueries.prioritySampleK(spark, dir, n + 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(got.length == n)
    got.foreach { case (id, w, est) =>
      assert(est == w.toDouble, s"doc $id: est_w must equal w when tau = 0")
    }
    val trueSum = RefQueries.table(spark, dir, "documents")
      .agg(sum(col("n_chars"))).collect()(0).getLong(0).toDouble
    assert(got.map(_._3).sum == trueSum)
  }

  /** Driver-side replica of hash64(s) mod m. */
  private def hashMod(s: String, m: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % m
  }
}
