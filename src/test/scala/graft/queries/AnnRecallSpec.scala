package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_ann_recall` against overlap counts recomputed directly from the four
  * collected rank lists — the evaluation must report exactly the set
  * intersections of what the family operators actually return. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("per-family hit counts equal the recomputed rank-list intersections") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = pairs(ExtQueries.cosineTopk(spark, dir))
    val fams = Map(
      "n_lsh" -> pairs(ExtQueries.cosineTopkLsh(spark, dir)),
      "n_ivf" -> pairs(ExtQueries.cosineTopkIvf(spark, dir)),
      "n_pq" -> pairs(ExtQueries.cosineTopkPq(spark, dir)),
      "n_beam" -> pairs(ExtQueries.cosineTopkBeam(spark, dir)),
      "n_ivf_t" -> pairs(ExtQueries.cosineTopkIvfTrained(spark, dir)),
      "n_pq_t" -> pairs(ExtQueries.cosineTopkPqTrained(spark, dir)),
      "n_ivfpq" -> pairs(ExtQueries.cosineTopkIvfPq(spark, dir)),
      "n_sq" -> pairs(ExtQueries.sqTopk(spark, dir)),
      "n_sqr" -> pairs(ExtQueries.sqRerank(spark, dir)),
      "n_ivfpqr" -> pairs(ExtQueries.ivfPqRerank(spark, dir)),
      "n_mrl" -> pairs(ExtQueries.mrlRerank(spark, dir)))
    val got = ExtQueries.annRecall(spark, dir).collect()
    spark.catalog.clearCache() // the family pipelines persist intermediates
    assert(got.length == 8)
    got.foreach { r =>
      val qid = r.getLong(0)
      assert(r.getLong(1) == 10, s"qid $qid: exact baseline must be full k")
      for ((colName, fam) <- fams) {
        val want = ex.count { case (q, c) => q == qid && fam.contains((q, c)) }
        assert(r.getAs[Long](colName) == want.toLong, s"qid $qid $colName")
        assert(r.getAs[Double]("recall" + colName.stripPrefix("n")) ==
          want.toDouble / 10.0, s"qid $qid recall for $colName")
      }
    }
  }

  test("beam search equals a literal re-run of the bounded-round greedy search") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val adj = ExtQueries.knnGraph(spark, dir).select("src", "nbr").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def topB(q: Long, cands: Set[Long], b: Int): Seq[Long] =
      cands.toSeq.map(c => (c, cos(emb(q), emb(c))))
        .sortBy { case (c, s) => (-s, c) }.take(b).map(_._1)
    val want = (0L until 8L).flatMap { q =>
      var beam = topB(q, (0L until ExtQueries.IvfCells.toLong).toSet,
        ExtQueries.BeamWidth)
      for (_ <- 1 to ExtQueries.BeamRounds)
        beam = topB(q,
          beam.toSet ++ beam.flatMap(c => adj.getOrElse(c, Nil)),
          ExtQueries.BeamWidth)
      beam.filter(_ != q).zipWithIndex.map { case (c, i) => (q, c, i + 1) }
    }.toSet
    val got = ExtQueries.cosineTopkBeam(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    spark.catalog.clearCache() // beam + knn-graph pipelines persist
    assert(got == want, "beam search must match the literal greedy re-run")
  }

  test("beam rounds knob: per-query best score is non-decreasing in rounds") {
    // greedy beam with carried candidates: round r+1 prunes a SUPERSET of
    // round r's beam, and at most one beam slot is the query itself, so the
    // best non-self score can only improve — the invariant that makes the
    // rounds knob a pure recall-vs-work dial
    def best(rounds: Int): Map[Long, Double] = {
      val m = ExtQueries
        .cosineTopkBeamParams(spark, dir, ExtQueries.BeamWidth, rounds)
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getDouble(2)).max).toMap
      spark.catalog.clearCache() // beam + knn-graph pipelines persist
      m
    }
    val byRound = (0 to ExtQueries.BeamRounds).map(best)
    assert(byRound.last.keySet == (0L until 8L).toSet)
    for (r <- 1 until byRound.size; q <- byRound(r - 1).keys)
      assert(byRound(r)(q) >= byRound(r - 1)(q),
        s"round $r qid $q: best score regressed")
  }

  test("rank fusion matches RRF recomputed from the collected family lists") {
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.select("qid", "cid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val fams = Seq(
      ranks(ExtQueries.cosineTopkLsh(spark, dir)),
      ranks(ExtQueries.cosineTopkIvf(spark, dir)),
      ranks(ExtQueries.cosineTopkPq(spark, dir)),
      ranks(ExtQueries.maxsimTopk(spark, dir)))
    val want = fams.flatMap(_.keys).distinct
      .map { key =>
        val contribs = fams.flatMap(_.get(key)).map(r => 1.0 / (60.0 + r.toDouble))
        key -> ((contribs.foldLeft(0.0)(_ + _), contribs.length))
      }.toMap
    val got = ExtQueries.rankFusion(spark, dir).collect()
    spark.catalog.clearCache() // fusion + family pipelines persist
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getDouble(2) == want(key)._1, s"$key rrf")
      assert(r.getLong(3) == want(key)._2.toLong, s"$key n_lists")
    }
    // per query: exactly 10 rows, ranked by (rrf DESC, cid ASC) over ALL
    // fused candidates — the top-k must agree with a full sort
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length == 10, s"qid $qid row count")
      val expectTop = want.collect { case ((q, c), (s, _)) if q == qid => (c, s) }
        .toSeq.sortBy { case (c, s) => (-s, c) }.take(10).map(_._1)
      assert(rows.sortBy(_.getInt(4)).map(_.getLong(1)).toSeq == expectTop,
        s"qid $qid fused order")
    }
  }

  test("hybrid search matches RRF recomputed from the three dense lists plus bm25") {
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.select("qid", "cid", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val nq = ExtQueries.Bm25Queries.size
    val dense = Seq(
      ranks(ExtQueries.cosineTopkLsh(spark, dir)),
      ranks(ExtQueries.cosineTopkIvf(spark, dir)),
      ranks(ExtQueries.cosineTopkPq(spark, dir)))
      .map(_.filter { case ((q, _), _) => q < nq })
    val bm25 = ExtQueries.bm25Topk(spark, dir)
      .select("qid", "doc_id", "rank").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1)) -> r.getInt(2)).toMap
    val fams = dense :+ bm25
    val want = fams.flatMap(_.keys).distinct
      .map { key =>
        val contribs = fams.flatMap(_.get(key)).map(r => 1.0 / (60.0 + r.toDouble))
        key -> ((contribs.foldLeft(0.0)(_ + _), contribs.length))
      }.toMap
    val got = ExtQueries.hybridSearch(spark, dir).collect()
    spark.catalog.clearCache() // fusion + family pipelines persist
    assert(got.map(_.getLong(0)).toSet == (0L until nq.toLong).toSet,
      "hybrid queries are exactly the bm25 qids")
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getDouble(2) == want(key)._1, s"$key rrf")
      assert(r.getLong(3) == want(key)._2.toLong, s"$key n_lists")
    }
    // a doc surfaced by BOTH modalities must outvote single-list docs:
    // at least one fused row carries votes from more than one list
    assert(got.exists(_.getLong(3) > 1L), "no cross-modality consensus found")
  }
}
