package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_align_screen` — caption↔media alignment screen. The whole margin
  * pipeline (half-vector split → fold cosine → fixed-point floor →
  * reference top-k neighborhood sums → integer verdict) is replayed
  * sequentially driver-side (the BitextMineSpec device applied to the
  * diagonal); the DuckDB oracle re-checks the same at sf0.01. */
class AlignScreenSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-document margins and verdicts replay exactly; both classes occur") {
    val got = ExtQueries.alignScreen(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
    spark.catalog.clearCache()

    val vecs = RefQueries.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val d = ExtQueries.AlignDim
    def tHalf(v: Array[Float]): Array[Float] = v.take(d)
    def mHalf(v: Array[Float]): Array[Float] = v.slice(d, 2 * d)
    def norm(v: Array[Float]): Double =
      math.sqrt(v.foldLeft(0.0)((a, f) => a + f.toDouble * f.toDouble))
    def cfp(a: Array[Float], b: Array[Float]): Long = {
      val dot = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      math.floor(dot / (norm(a) * norm(b)) * 1e12).toLong
    }
    val ref = vecs.filter(_._1 < ExtQueries.AlignRefSample)
    val k = ExtQueries.AlignK
    def topkSum(scores: Seq[(Long, Long)]): Long = // (rid, cfp)
      scores.sortBy(t => (-t._2, t._1)).take(k).map(_._2).sum

    val want = vecs.map { case (id, v) =>
      val tv = tHalf(v); val mv = mHalf(v)
      val c = cfp(tv, mv)
      val sx = topkSum(ref.map { case (rid, rv) => (rid, cfp(tv, mHalf(rv))) }.toSeq)
      val sy = topkSum(ref.map { case (rid, rv) => (rid, cfp(mv, tHalf(rv))) }.toSeq)
      val s = sx + sy
      (id, c, sx, sy,
        if (s > 0) Some((2L * k * c).toDouble / s.toDouble) else None,
        s > 0 &&
          2L * k * ExtQueries.AlignMarginDen * c >= ExtQueries.AlignMarginNum * s)
    }.toSet
    assert(got.toSet == want)
    // the screen discriminates on this fixture: the halves are NOT a truly
    // paired encoder output, so most diagonals screen as mismatched and a
    // tail clears the margin — both verdicts must occur
    assert(got.exists(_._6) && got.exists(!_._6))
  }

  test("plan: reference broadcasts; the corpus side never cartesian-joins") {
    val df = ExtQueries.alignScreen(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    df.unpersist()
    spark.catalog.clearCache()
  }
}
