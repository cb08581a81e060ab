package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_bm25_topk` against an independent sequential Scala walk of the
  * rational-idf BM25 definition, written from the formula rather than the
  * Column code. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("top-k lists match the sequential BM25 walk exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").toSeq))
      .sortBy(_._1)
    val nDocs = docs.length
    val totalTokens = docs.map(_._2.length.toLong).sum
    val avgdl = totalTokens.toDouble / nDocs.toDouble
    val tf: Map[(Long, String), Int] = docs.flatMap { case (id, t) =>
      t.groupBy(identity).map { case (tok, xs) => (id, tok) -> xs.length }
    }.toMap
    val df: Map[String, Int] = tf.keys.groupBy(_._2).view.mapValues(_.size).toMap

    val want = ExtQueries.Bm25Queries.flatMap { case (qid, terms) =>
      val scored = docs.flatMap { case (id, t) =>
        val contribs = terms.zipWithIndex.flatMap { case (term, _) =>
          tf.get((id, term)).map { f =>
            ((nDocs.toDouble - df(term).toDouble + 0.5) / (df(term).toDouble + 0.5)) *
              ((f.toDouble * 2.2) /
                (f.toDouble + 1.2 * (0.25 + 0.75 * (t.length.toDouble / avgdl))))
          }
        }
        if (contribs.isEmpty) None
        else Some(id -> contribs.foldLeft(0.0)(_ + _))
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1) }
    }

    val got = ExtQueries.bm25Topk(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == want)
  }
}
