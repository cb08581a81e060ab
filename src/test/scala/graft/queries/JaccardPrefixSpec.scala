package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_jaccard_prefix` claims two things: (1) EXACTNESS — prefix-filtered
  * candidate generation plus verify equals the unfiltered all-pairs truth
  * (the prefix-filter theorem), and (2) SCALE — the prefix index generates
  * strictly fewer candidate pairs than the full posting join. Both are
  * graded here; the DuckDB oracle re-checks (1) independently at sf0.01. */
class JaccardPrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("prefix-filtered output equals the unblocked all-pairs truth") {
    // truth: same bigram sets, candidates = EVERY posting collision (the
    // oracle's formulation), verified with the same integer rule
    import spark.implicits._
    val got = ExtQueries.jaccardPrefix(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    spark.catalog.clearCache()

    // independent local truth: brute-force over collected bigram sets
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = docs ++ docs.map { case (id, t) =>
      (id + 1000000L, t.trim.split("\\s+").drop(5).mkString(" "))
    }
    val P = graft.functions.GraftFunctions.IntModulus
    def h31(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % P
    }
    def bigrams(t: String): Set[Long] = {
      val tk = t.trim.split("\\s+").toSeq
      if (tk.size <= 2) Set(h31(tk.mkString(" ")))
      else tk.map(h31).sliding(2).map { w =>
        ((w(0) * ExtQueries.ShingleC(0)) % P + (w(1) * ExtQueries.ShingleC(1)) % P) % P
      }.toSet
    }
    val sets = all.map { case (id, t) => id -> bigrams(t) }.toMap
    val truth = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toLong
      union = (sets(a) | sets(b)).size.toLong
      if 2 * inter >= union
    } yield (a, b, inter, union)).toSet
    assert(got == truth)
  }

  test("each candidate stage prunes: positional <= prefix < full postings") {
    val (positional, prefixCand, fullCand) =
      ExtQueries.jaccardPrefixCandidateCounts(spark, dir)
    assert(prefixCand < fullCand,
      s"prefix filter pruned nothing: $prefixCand vs $fullCand")
    // and it still found every truth pair (subset relation is what the
    // first test pins; here just assert the pruning is material, not ~0)
    assert(prefixCand.toDouble / fullCand < 0.8,
      s"prefix filter pruned <20%: $prefixCand of $fullCand")
    // the positional (min-collision ubound) filter prunes further still —
    // the lever that keeps the verify affordable on a dense small-vocab
    // corpus where the prefix filter alone barely bites (measured 5.8x
    // on the whole key at sf0.1)
    assert(positional < prefixCand,
      s"positional filter pruned nothing: $positional vs $prefixCand")
  }
}
