package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_containment` claims: the df-capped postings join plus full-set verify
  * equals the local sequential truth ("pairs sharing ≥ 1 rare shingle with
  * containment ≥ 0.8 on the smaller side"), and it surfaces subset-shaped
  * pairs a J ≥ 0.5 dedup misses. The truth here is an independent local
  * re-derivation (shingle sets recomputed from scratch, brute-force pairs). */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private val P = graft.functions.GraftFunctions.IntModulus
  private def h31(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.take(15), 16) % P
  }
  private def shingles(t: String): Set[Long] = {
    val tk = t.trim.split("\\s+").toSeq
    if (tk.size <= 3) Set(h31(tk.mkString(" ")))
    else tk.map(h31).sliding(3).map { w =>
      w.zip(ExtQueries.ShingleC).map { case (h, c) => (h * c) % P }.sum % P
    }.toSet
  }

  private lazy val sets: Map[Long, Set[Long]] = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = docs ++ docs.map { case (id, t) =>
      (id + ExtQueries.VariantIdOffset, t.trim.split("\\s+").drop(5).mkString(" "))
    }
    all.map { case (id, t) => id -> shingles(t) }.toMap
  }

  test("matches the local brute-force rare-candidate containment truth") {
    import spark.implicits._
    val got = ExtQueries.containment(spark, dir)
      .select("doc_a", "doc_b", "n_inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()

    val df = sets.values.toSeq.flatten.groupBy(identity).map { case (h, xs) => h -> xs.size }
    val rare = sets.map { case (id, ds) =>
      id -> ds.filter(h => df(h) <= ExtQueries.DedupEvalDfCap) }
    val truth = (for {
      a <- sets.keys; b <- sets.keys if a < b
      if (rare(a) & rare(b)).nonEmpty
      inter = (sets(a) & sets(b)).size.toLong
      na = sets(a).size.toLong; nb = sets(b).size.toLong
      if 5 * inter >= 4 * math.min(na, nb)
    } yield (a, b, inter, na, nb)).toSet
    assert(got == truth)
  }

  test("surfaces subset pairs that a J >= 0.5 rule would keep hidden") {
    import spark.implicits._
    val pairs = ExtQueries.containment(spark, dir)
      .select("doc_a", "doc_b", "n_inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    // at least one emitted pair fails the Jaccard-0.5 criterion while
    // passing containment-0.8 — the asymmetric relation is not redundant
    val jBlind = pairs.filter { case (_, _, inter, na, nb) =>
      2 * inter < na + nb - inter }
    assert(jBlind.nonEmpty,
      "every containment pair also passed J >= 0.5 — operator adds nothing")
  }
}
