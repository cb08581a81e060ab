package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_bitext_mine` — margin-based parallel-pair mining. The whole pipeline
  * (fold cosine → fixed-point floor → k-NN neighborhood sums → forward
  * best → integer acceptance) is replayed sequentially driver-side; the
  * DuckDB oracle re-checks the same at sf0.01. */
class BitextMineSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("forward-best pairs, margins and verdicts replay exactly") {
    val got = ExtQueries.bitextMine(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    spark.catalog.clearCache()

    def sideVecs(lbl: Int): Array[(Long, Array[Float])] =
      RefQueries.table(spark, dir, "embeddings")
        .filter(col("label") === lbl).select(col("vec_id"), col("embedding"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val xs = sideVecs(ExtQueries.BitextSrcLabel)
    val ys = sideVecs(ExtQueries.BitextDstLabel)
    assert(xs.nonEmpty && ys.nonEmpty)

    // the engine contract: sequential left-fold sums, double casts per step
    def norm(v: Array[Float]): Double =
      v.foldLeft(0.0)((a, f) => a + f.toDouble * f.toDouble) match { case s => math.sqrt(s) }
    def cfp(a: Array[Float], b: Array[Float]): Long = {
      val dot = a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      math.floor(dot / (norm(a) * norm(b)) * 1e12).toLong
    }
    val scored = for { (xi, xv) <- xs; (yi, yv) <- ys } yield (xi, yi, cfp(xv, yv))
    val k = ExtQueries.BitextK
    def topk(rows: Seq[(Long, Long)]): Seq[(Long, Long)] = // (other, cfp)
      rows.sortBy(t => (-t._2, t._1)).take(k)
    val fwd = scored.groupBy(_._1).view.mapValues { rs =>
      val tk = topk(rs.map(t => (t._2, t._3)).toSeq)
      (tk.map(_._2).sum, tk.head._1, tk.head._2)  // (sx, bestY, bestCfp)
    }.toMap
    val bwd = scored.groupBy(_._2).view.mapValues { rs =>
      topk(rs.map(t => (t._1, t._3)).toSeq).map(_._2).sum
    }.toMap
    val want = fwd.toSeq.collect {
      case (xid, (sx, yid, c)) if c > 0 && sx + bwd(yid) > 0 =>
        val s = sx + bwd(yid)
        (xid, yid, c, (2L * k * c).toDouble / s.toDouble,
          2L * k * ExtQueries.BitextMarginDen * c >= ExtQueries.BitextMarginNum * s)
    }.toSet
    assert(got.toSet == want)
    // the verdict column discriminates on this fixture: both outcomes occur
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("plan: scored frame computed once (persisted), neighborhood sums join broadcast") {
    val df = ExtQueries.bitextMine(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("InMemoryTableScan"),
      "the |X|x|Y| scored frame must persist — three consumers re-derive " +
        s"the full cosine pass otherwise:\n${plan.take(800)}")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
    df.unpersist()
    spark.catalog.clearCache()
  }
}
