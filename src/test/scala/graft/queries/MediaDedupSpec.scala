package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_media_dedup` — perceptual-hash near-dup over media payloads. The
  * whole signature pipeline (byte-grid cells → position-salted intensities
  * → aHash mean bits → 16-bit band values) is replayed sequentially
  * driver-side, and the operator's banded output is compared against the
  * BRUTE-FORCE all-pairs Hamming ≤ τ truth — the pigeonhole claim (τ < 4
  * bands ⇒ banding loses nothing) checked as an equality, not an
  * inclusion. The DuckDB oracle re-checks the same at sf0.01. */
class MediaDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  /** Driver-side replica of hash64 (first 60 md5 bits). */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Code-point substring `[a, b)` — Spark's `length`/`substr` (and DuckDB's
    * `length`/`substr`) index by code point, not UTF-16 char, so the replay
    * must too or any non-BMP character in fixture text would shift the grid. */
  private def cpSub(s: String, a: Int, b: Int): String = {
    val start = s.offsetByCodePoints(0, a)
    s.substring(start, s.offsetByCodePoints(start, b - a))
  }

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Sequential replay of the perceptual signature: [[ExtQueries.PhashBands]]
    * 16-bit band values over the 64-cell grid (code-point indexed, matching
    * both engines' string semantics). */
  private def signature(text: String): Array[Long] = {
    val n = cpLen(text).toLong
    val cells = (0 until ExtQueries.PhashCells).map { i =>
      val a = ((i * n) / ExtQueries.PhashCells).toInt
      val b = (((i + 1) * n) / ExtQueries.PhashCells).toInt
      h60(s"ph:$i:" + cpSub(text, a, b)) % ExtQueries.PhashIntensityMod
    }
    val total = cells.sum
    (0 until ExtQueries.PhashBands).map { bnd =>
      (15 to 0 by -1).foldLeft(0L)((acc, j) =>
        acc * 2 + (if (cells(bnd * 16 + j) * ExtQueries.PhashCells > total) 1L
                   else 0L))
    }.toArray
  }

  test("banded join loses nothing: output == brute-force Hamming <= tau truth") {
    val docs = RefQueries.table(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tail = ExtQueries.PhashEditChars
    val uni = docs ++ docs.map { case (id, t) =>
      (id + ExtQueries.VariantIdOffset,
        cpSub(t, 0, math.max(cpLen(t) - tail, 0)) + ("z" * tail))
    }
    val sigs = uni.map { case (id, t) => (id, signature(t)) }
    def ham(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val want = (for {
      (ia, sa) <- sigs
      (ib, sb) <- sigs
      if ia < ib && ham(sa, sb) <= ExtQueries.PhashTau
    } yield (ia, ib, ham(sa, sb))).toSet

    val got = ExtQueries.mediaDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.clearCache()
    assert(got == want,
      "banded candidates must reproduce the exact Hamming truth (pigeonhole)")
    assert(got.nonEmpty)
    // the tail-corruption re-encode variants are what the operator exists
    // to catch — the fixture pairs must actually be among the detections
    val variantPairs = got.count { case (a, b, _) =>
      b == a + ExtQueries.VariantIdOffset }
    assert(variantPairs > docs.length / 2,
      s"most re-encode variants should land within tau, got $variantPairs")
  }

  test("plan: banded equi-join, no cartesian product, one persisted signature frame") {
    val df = ExtQueries.mediaDedup(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(plan.contains("InMemoryTableScan"),
      "signature frame feeds both join sides and must persist:\n" + plan.take(800))
    df.unpersist()
    spark.catalog.clearCache()
  }
}
