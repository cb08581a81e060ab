package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_index_delete` — deletion propagation into the ANN substrate. The
  * local replay proves the repair theorem the oracle's hash gate states
  * distributedly: (1) the incremental repair (tombstone + rescore only
  * nodes whose top-k lost a member) produces EXACTLY the full rebuild
  * over survivors; (2) the deletion genuinely changes top-k answers (a
  * promotion from outside an old top-k list exists — the repair is live,
  * not a no-op); (3) the distributed summary equals the local replay
  * count-for-count and digest-for-digest (md5-hash31 sums); (4) the
  * quantizer row surfaces the honest non-zero residual (a seed centroid
  * id in the request set stays a model parameter until retrain). */
class IndexDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def h31(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483647L
  }

  test("repair == rebuild; a promotion exists; summary equals the local replay") {
    import TrainReplay.cos
    val mod = ExtQueries.DeleteEveryMod
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val nCells = ExtQueries.IvfCells
    val cents = emb.filter(_._1 < nCells)
    val cellOf = emb.map { case (id, v) =>
      id -> cents.maxBy { case (cid, c) => (cos(v, c), -cid) }._1
    }.toMap
    val k = ExtQueries.KnnK

    def knn(ids: Set[Long]): Map[Long, Seq[(Long, Int)]] =
      ids.toSeq.sorted.map { src =>
        val sv = emb(src.toInt)._2
        src -> ids.toSeq
          .filter(o => o != src && cellOf(o) == cellOf(src))
          .map(o => (o, cos(sv, emb(o.toInt)._2)))
          .sortBy { case (o, s) => (-s, o) }.take(k).zipWithIndex
          .map { case ((o, _), i) => (o, i + 1) }
      }.toMap

    val allIds = emb.map(_._1).toSet
    val delIds = allIds.filter(_ % mod == 0)
    val survIds = allIds -- delIds
    val knnAll = knn(allIds)
    val rebuild = knn(survIds)

    // the repair theorem, replayed: untouched survivors keep their old
    // lists; only srcs whose old top-k held a deleted nbr are rescored
    val touched = survIds.filter(s => knnAll(s).exists { case (n, _) => delIds(n) })
    val repair = survIds.map { s =>
      s -> (if (touched(s)) rebuild(s) else knnAll(s))
    }.toMap
    assert(repair == rebuild, "incremental repair must equal the full rebuild")
    assert(touched.nonEmpty, "fixture must exercise the repair path")

    // the deletion changes answers: some repaired list holds a PROMOTED
    // neighbor that was outside the old top-k
    val promoted = touched.filter { s =>
      val old = knnAll(s).map(_._1).toSet
      rebuild(s).exists { case (n, _) => !old(n) }
    }
    assert(promoted.nonEmpty, "a deletion must promote a new neighbor somewhere")

    // distributed summary vs the local replay
    val edges = (m: Map[Long, Seq[(Long, Int)]]) =>
      m.toSeq.flatMap { case (s, l) => l.map { case (n, r) => (s, n, r) } }
    val got = ExtQueries.indexDelete(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    spark.catalog.clearCache()
    val survSorted = survIds.toSeq.sorted
    val want = Map(
      "ivf_assignment" -> ((allIds.size.toLong, survIds.size.toLong, 0L,
        delIds.size.toLong,
        survSorted.map(id => h31(s"ia:$id:${cellOf(id)}")).sum)),
      "knn_adjacency" -> ((edges(knnAll).size.toLong,
        edges(rebuild).size.toLong, 0L,
        (edges(knnAll).size - edges(rebuild).size).toLong,
        edges(rebuild).map { case (s, n, r) => h31(s"ka:$s:$n:$r") }.sum)),
      "quantizer_params" -> ((nCells.toLong, nCells.toLong,
        cents.count(_._1 % mod == 0).toLong, 0L,
        cents.map(c => h31(s"qp:${c._1}")).sum)))
    assert(got == want, "summary must equal the local replay")
    // the honest residual: seed id 0 is in the request set and remains a
    // model parameter — the row a compliance review reads before retrain
    assert(got("quantizer_params")._3 == 1L)
  }
}
