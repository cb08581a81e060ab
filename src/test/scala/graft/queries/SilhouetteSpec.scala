package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_silhouette` — the silhouette math (fixed-point pair distances →
  * exact-sum means → (b−a)/max(a,b)) is replayed sequentially driver-side
  * from the operator's OWN emitted cluster labels; the k-means chain those
  * labels come from has its own spec (`KmeansTrainSpec`) and oracle. */
class SilhouetteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-vector silhouette replays exactly from the emitted clustering") {
    val got = ExtQueries.silhouette(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(5)))
    spark.catalog.clearCache()
    assert(got.length == ExtQueries.SilhouetteSample)

    val vecs = RefQueries.table(spark, dir, "embeddings")
      .filter(col("vec_id") < ExtQueries.SilhouetteSample)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val cluster = got.map(t => (t._1, t._2)).toMap

    def cos(a: Array[Float], b: Array[Float]): Double = {
      def n(v: Array[Float]) =
        math.sqrt(v.foldLeft(0.0)((acc, f) => acc + f.toDouble * f.toDouble))
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble) /
        (n(a) * n(b))
    }
    def dfp(i: Long, j: Long): Long =
      math.floor((1.0 - cos(vecs(i), vecs(j))) * 1e12).toLong

    got.foreach { case (i, ci, nOwn, a, b, s) =>
      val others = cluster.keys.filter(_ != i)
      val byCluster = others.groupBy(cluster)
      val own = byCluster.get(ci).map(_.toSeq).getOrElse(Seq.empty)
      assert(nOwn == own.size, s"vec $i")
      val wantA = if (own.isEmpty) None
        else Some(own.map(j => dfp(i, j)).sum.toDouble / own.size / 1e12)
      assert(a == wantA, s"vec $i a")
      val otherMeans = byCluster.collect { case (c, js) if c != ci =>
        js.map(j => dfp(i, j)).sum.toDouble / js.size / 1e12
      }
      val wantB = if (otherMeans.isEmpty) None else Some(otherMeans.min)
      assert(b == wantB, s"vec $i b")
      val wantS = (wantA, wantB) match {
        case (Some(x), Some(y)) if math.max(x, y) > 0 => (y - x) / math.max(x, y)
        case _ => 0.0
      }
      assert(s == wantS, s"vec $i s")
      assert(s >= -1.0 && s <= 1.0)
    }
    // the honest reading on this unclustered corpus: silhouettes hug zero
    // (k-means found partitions, not structure) — a strongly positive mean
    // would mean the fixture grew real clusters and this pin should move
    val meanS = got.map(_._6).sum / got.length
    assert(math.abs(meanS) < 0.5, s"mean silhouette $meanS")
  }
}
