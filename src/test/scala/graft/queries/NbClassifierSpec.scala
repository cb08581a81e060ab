package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_nb_train` / `e_nb_classify` / `e_nb_eval` — the NB voting classifier
  * chain. Pins the leakage discipline (classified docs are EXACTLY the
  * test-fate docs, counts come from train only), the tally arithmetic
  * (n_win ≤ n_votes = the doc's token count), the vote-table partition
  * property (every train-vocab token votes exactly one class), and that
  * the eval matrix is the classifier's own groupBy (composition). */
class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def clear(): Unit = spark.catalog.clearCache()

  test("classified docs are exactly the test-fate docs; tallies are consistent") {
    val split = ExtQueries.corpusSplit(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cls = ExtQueries.nbClassify(spark, dir).collect()
    clear()
    val testIds = split.collect { case (id, "test") => id }.toSet
    assert(cls.map(_.getLong(0)).toSet == testIds,
      "classify must cover the test fate exactly — no train/val leakage in, no test doc dropped")
    val tokCount = docs.map { case (id, _, t) =>
      id -> t.trim.split("\\s+").length.toLong }.toMap
    val langs = docs.map(_._2).toSet
    for (r <- cls) {
      val (id, lang, pred, nWin, nVotes, correct) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5))
      assert(nVotes == tokCount(id), s"doc $id: every token must cast exactly one vote")
      assert(nWin >= 1 && nWin <= nVotes)
      assert(langs.contains(pred))
      assert(correct == (lang == pred))
    }
  }

  test("eval matrix is the classifier's own confusion groupBy; train card partitions the vocab") {
    val cls = ExtQueries.nbClassify(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    clear()
    val want = cls.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = ExtQueries.nbEval(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    clear()
    assert(got == want, "e_nb_eval must be exactly the classify output's groupBy")

    val train = ExtQueries.nbTrain(spark, dir).collect()
    clear()
    // every train-vocab token votes exactly one class → the per-class vote
    // counts partition the global train vocabulary
    val split = ExtQueries.corpusSplit(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    clear()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val trainVocab = docs.filter(d => split(d._1) == "train")
      .flatMap(_._2.trim.split("\\s+")).toSet
    assert(train.map(_.getLong(4)).sum == trainVocab.size,
      "per-class n_vote_tokens must sum to the global train vocab size")
    assert(train.map(_.getLong(1)).sum == split.values.count(_ == "train"),
      "per-class n_docs must sum to the train-fate doc count")
  }
}
