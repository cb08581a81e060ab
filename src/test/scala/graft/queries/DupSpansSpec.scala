package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_dup_spans` against an independent sequential Scala walk of the
  * Lee-et-al. exact-substring rule: hash every overlapping window, mark
  * every non-first occurrence in (doc_id, pos) order, merge marked windows
  * per doc into maximal spans (touching intervals merge). Written from the
  * definition, not from the Column code. */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val W = ExtQueries.DupSpanTokens

  private def h64(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def windows(text: String): Seq[Long] = {
    val t = text.trim.split("\\s+").toSeq
    (0 to t.length - W).map(i => h64(t.slice(i, i + W).mkString(" ")))
  }

  /** Merge marked window starts into (spanCount, coveredTokens). */
  private def mergeSpans(starts: Seq[Int]): (Long, Long) = {
    var nSpans = 0L; var covered = 0L
    var s = -1; var e = -2
    for (p <- starts.sorted) {
      if (p > e + 1) { // neither overlapping nor touching: close the island
        if (s >= 0) { nSpans += 1; covered += e - s + 1 }
        s = p
      }
      e = math.max(e, p + W - 1)
    }
    if (s >= 0) { nSpans += 1; covered += e - s + 1 }
    (nSpans, covered)
  }

  test("per-doc span counts and covered tokens match the sequential walk") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[Long]
    val want = docs.map { case (id, text) =>
      val dupStarts = windows(text).zipWithIndex.collect {
        case (h, pos) if !seen.add(h) => pos
      }
      val (nSpans, covered) = mergeSpans(dupStarts)
      id -> ((nSpans, covered))
    }.toMap
    val got = ExtQueries.dupSpans(spark, dir)
      .select("doc_id", "n_spans", "dup_tokens").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    spark.catalog.clearCache() // dupSpans persists its posting frame
    assert(got == want)
  }

  test("every doc reports; fractions are consistent and bounded") {
    val rows = ExtQueries.dupSpans(spark, dir).collect()
    spark.catalog.clearCache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.length.toLong == nDocs, "zero-duplicate docs must still report")
    rows.foreach { r =>
      val (nTok, nSpans, dupTok, frac) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(dupTok >= 0 && dupTok <= nTok)
      assert((nSpans == 0) == (dupTok == 0))
      assert(frac == dupTok.toDouble / nTok.toDouble)
      // a merged span covers at least one full window
      if (nSpans > 0) assert(dupTok >= W)
    }
  }

  test("removal rewrite: cuts exactly the reported extents, sequential-walk clean text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // independent walk: drop tokens covered by merged non-first spans
    val seen = scala.collection.mutable.Set.empty[Long]
    val want = docs.map { case (id, text) =>
      val t = text.trim.split("\\s+").toSeq
      val dupStarts = windows(text).zipWithIndex.collect {
        case (h, pos) if !seen.add(h) => pos
      }
      val coveredPos = dupStarts.flatMap(p => p until p + W).toSet
      val kept = t.zipWithIndex.collect { case (tok, i) if !coveredPos(i) => tok }
      id -> ((t.length, t.length - kept.length, kept.mkString(" ")))
    }.toMap
    val report = ExtQueries.dupSpans(spark, dir)
      .select("doc_id", "dup_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ExtQueries.dupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
    spark.catalog.clearCache() // both operators persist the posting frame
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (nTok, nRemoved, clean)) =>
      assert((nTok, nRemoved.toLong, clean) ==
        ((want(id)._1, want(id)._2.toLong, want(id)._3)), s"doc $id")
      // the rewrite and the report agree: tokens removed = extents reported
      assert(nRemoved.toLong == report(id), s"doc $id removed-vs-reported")
    }
  }
}
