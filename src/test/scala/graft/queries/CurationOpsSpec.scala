package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_split` / `e_centroid_score` / `e_dedup_eval` — the corpus-curation
  * trio added in round 8: leakage-safe splitting, nearest-centroid
  * classifier scoring, and the dedup-family evaluation harness. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("split: content-hash fate — byte-identical texts always share a split") {
    val out = ExtQueries.corpusSplit(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val perText = out.join(docs, Seq("doc_id"))
      .groupBy(col("text"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .agg(max(col("n_splits"))).head.getLong(0)
    assert(perText == 1L, "a duplicated text must never straddle splits")
  }

  test("split: 80/10/10 shape, total coverage, bucket range") {
    val rows = ExtQueries.corpusSplit(spark, dir).collect()
    val n = rows.length.toDouble
    val by = rows.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(by.keySet.subsetOf(Set("train", "val", "test")))
    assert(by.values.sum.toDouble == n, "every document gets exactly one split")
    assert(by("train") / n > 0.7 && by("train") / n < 0.9)
    assert(by("val") / n > 0.03 && by("val") / n < 0.18)
    assert(by("test") / n > 0.03 && by("test") / n < 0.18)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0L && b < 100L
    })
  }

  test("centroid score: matches a sequential reference walk exactly") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .sortBy(_._1)
    // fixed-point centroid sums per label, in dim order
    val cents: Map[Int, Array[Double]] = emb.groupBy(_._2).map { case (l, vs) =>
      val d = vs.head._3.length
      val s = Array.ofDim[Long](d)
      vs.foreach { case (_, _, v) =>
        var i = 0
        while (i < d) { s(i) += math.floor(v(i).toDouble * 1048576.0 + 0.5).toLong; i += 1 }
      }
      l -> s.map(_.toDouble)
    }
    def fold(xs: Iterator[Double]): Double = xs.foldLeft(0.0)(_ + _)
    val ncent = cents.map { case (l, c) => l -> math.sqrt(fold(c.iterator.map(x => x * x))) }
    val got = ExtQueries.centroidScore(spark, dir).collect()
    assert(got.length == emb.length)
    got.foreach { r =>
      val (vid, label) = (r.getLong(0), r.getInt(1))
      val v = emb.find(_._1 == vid).get._3
      val nrm = math.sqrt(fold(v.iterator.map(x => x.toDouble * x.toDouble)))
      val scores = cents.keys.toSeq.sorted.map { l =>
        val c = cents(l)
        val dot = fold(v.iterator.zip(c.iterator).map { case (x, y) => x.toDouble * y })
        (l, dot / (nrm * ncent(l)))
      }
      val ranked = scores.sortBy { case (l, s) => (-s, l) }
      assert(r.getAs[Int]("pred_label") == ranked.head._1, s"vec $vid pred")
      assert(r.getAs[Double]("score") == ranked.head._2, s"vec $vid score")
      assert(r.getAs[Double]("margin") ==
        -ranked(1)._2 - (-ranked.head._2), s"vec $vid margin")
      assert(r.getAs[Long]("correct") ==
        (if (ranked.head._1 == label) 1L else 0L), s"vec $vid correct")
    }
  }

  test("bpe merges: top-20 pairs match the sequential weighted pair count") {
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
    val wc = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
      }
    }
    val want = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = ExtQueries.bpeMerges(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("snapshot diff: every fixture-derived status lands where the rule says") {
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = ExtQueries.snapshotDiff(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == ids.size * 2, "current ids + the removed tail")
    ids.foreach { id =>
      val expected =
        if (id % 5 == 0) "added"
        else if (id % 7 == 0) "changed"
        else "unchanged"
      assert(got(id) == expected, s"doc $id")
      assert(got(id + 3000000L) == "removed", s"doc ${id + 3000000L}")
    }
  }

  test("split contamination: counts recompute from the two composed operators") {
    val splits = ExtQueries.corpusSplit(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).filter(_._1 >= 20)
    val contam = ExtQueries.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    spark.catalog.clearCache() // decontaminate persists shingles
    val want = splits.groupBy(_._2).view.mapValues { xs =>
      (xs.length.toLong, xs.count(x => contam(x._1)).toLong)
    }.toMap
    val got = ExtQueries.splitContamination(spark, dir).collect()
    spark.catalog.clearCache()
    assert(got.map(_.getString(0)).toSeq == got.map(_.getString(0)).sorted.toSeq)
    got.foreach { r =>
      val (n, c) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == c, s"split ${r.getString(0)}")
      assert(r.getDouble(3) == c.toDouble / n.toDouble)
    }
    assert(got.map(_.getLong(1)).sum == splits.length.toLong, "every doc counted once")
  }

  test("curation funnel: stage labels partition the corpus and agree with the composed operators") {
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val rows = ExtQueries.curationFunnel(spark, dir).collect()
    val got = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    val surv = rows.map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    spark.catalog.clearCache() // funnel persists corpus/survivor/drop frames
    assert(got.size.toLong == 3 * n, "originals + re-fetches + revisions")
    // every exact re-fetch (+1M, identical bytes) must fall at stage 1,
    // attributed to the byte-identical original that shadowed it
    (0L until n).foreach { id =>
      assert(got(id + 1000000L) == "exact_dup", s"re-fetch of $id")
      assert(surv(id + 1000000L).contains(id), s"re-fetch survivor of $id")
    }
    // survivor attribution is exactly the dropped-by-a-duplicate stages:
    // present iff exact_dup or near_dup, always a lower id, and an exact
    // drop's survivor is never itself an exact drop (min-id of the group)
    rows.foreach { r =>
      val (id, stage) = (r.getLong(0), r.getString(1))
      surv(id) match {
        case Some(s) =>
          assert(stage == "exact_dup" || stage == "near_dup", s"doc $id")
          assert(s < id, s"survivor $s of $id must be the lower id")
          if (stage == "exact_dup")
            assert(got(s) != "exact_dup", s"exact survivor $s of $id re-dropped")
        case None =>
          assert(stage == "quality" || stage == "kept", s"doc $id lacks survivor")
      }
    }
    // cross-operator consistency: an ORIGINAL doc that reached the quality
    // stage must carry the same verdict e_quality_filter gives it directly
    val qualKeep = ExtQueries.qualityFilter(spark, dir)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    (0L until n).foreach { id =>
      got(id) match {
        case "quality" => assert(!qualKeep(id), s"doc $id dropped but battery keeps")
        case "kept"    => assert(qualKeep(id), s"doc $id kept but battery drops")
        case _         => () // dropped before the quality stage
      }
    }
    val byStage = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byStage.keySet.subsetOf(Set("exact_dup", "near_dup", "quality", "kept")))
    assert(byStage("kept") > 0, "a funnel that keeps nothing is a bug")
  }

  test("dedup eval: minhash precision is structurally 1.0; counts consistent") {
    val rows = ExtQueries.dedupEval(spark, dir).collect()
    spark.catalog.clearCache() // dedupEval + family pipelines persist
    assert(rows.map(_.getString(0)).toSeq == Seq("minhash", "simhash"))
    val Array(mh, sh) = rows
    val nTruth = mh.getAs[Long]("n_truth")
    assert(nTruth > 0 && sh.getAs[Long]("n_truth") == nTruth)
    // minhash verifies candidates with the SAME exact-Jaccard criterion the
    // truth set uses, so predicted ⊆ truth: n_hit = n_pred, precision = 1
    assert(mh.getAs[Long]("n_hit") == mh.getAs[Long]("n_pred"))
    assert(mh.getAs[Double]("precision") == 1.0)
    assert(mh.getAs[Double]("recall") > 0.0 && mh.getAs[Double]("recall") <= 1.0)
    // simhash answers a different contract (Hamming ≤ 1): both metrics free,
    // but hits can never exceed either side
    assert(sh.getAs[Long]("n_hit") <= math.min(sh.getAs[Long]("n_pred"), nTruth))
    assert(sh.getAs[Double]("recall") >= 0.0 && sh.getAs[Double]("recall") <= 1.0)
    assert(sh.getAs[Double]("precision") >= 0.0 && sh.getAs[Double]("precision") <= 1.0)
  }

  test("dedup eval: stop-shingle df cap is invariant at gate scale, conservative below it") {
    val shd = ExtQueries.shingleSets(
      ExtQueries.docsWithVariants(spark, dir).select(col("doc_id"), col("text")))
      .persist()
    val post = shd.select(col("doc_id"), explode(col("ds")).as("h"))
    // DedupEvalDfCap exceeds the corpus's max document frequency at the
    // correctness-gate scales, so the capped truth pipeline drops NOTHING
    // there — the strongest form of "capped ≡ uncapped". If testdata ever
    // changes shape, this pins the re-check.
    val maxDf = post.groupBy(col("h")).count().agg(max("count")).head.getLong(0)
    assert(maxDf <= ExtQueries.DedupEvalDfCap,
      s"max shingle df $maxDf exceeds cap ${ExtQueries.DedupEvalDfCap}: " +
        "capped truth may diverge at gate scale — re-verify invariance")
    def truthWithCap(cap: Long): Set[(Long, Long)] = {
      val capped =
        if (cap == Long.MaxValue) post
        else {
          val hot = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
            .filter(col("df") > cap).select(col("h"))
          post.join(broadcast(hot), Seq("h"), "left_anti")
        }
      val cand = capped.as("x")
        .join(capped.as("y"),
          col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
      ExtQueries.verifiedJaccardPairs(cand, shd)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val uncapped = truthWithCap(Long.MaxValue)
    assert(truthWithCap(ExtQueries.DedupEvalDfCap) == uncapped)
    // an artificially tight cap may lose pairs but must never invent them
    assert(truthWithCap(2L).subsetOf(uncapped))
    shd.unpersist()
  }
}
