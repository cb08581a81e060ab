package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_novelty` — first-occurrence attribution must replay exactly from
  * the shared shingle pipeline, every distinct corpus shingle must be
  * credited to exactly one document, and the earliest document must be
  * fully novel. */
class NoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("novelty counts replay min-doc_id attribution over the shingle sets") {
    import org.apache.spark.sql.functions.col
    val sets = ExtQueries.shingleSets(
      spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val firstDoc = sets.toSeq.flatMap { case (id, ds) => ds.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = sets.map { case (id, ds) =>
      id -> (ds.size.toLong, ds.count(firstDoc(_) == id).toLong)
    }

    val got = ExtQueries.novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    assert(got.toMap == want)

    // each distinct shingle is credited exactly once across the corpus
    assert(got.map(_._2._2).sum == firstDoc.size)
    // every count is a valid fraction of the doc's shingle budget
    for ((id, (n, novel)) <- got) assert(0 <= novel && novel <= n, s"doc $id")
    // the earliest document can only contain first occurrences
    val (minId, (n0, novel0)) = got.minBy(_._1)
    assert(novel0 == n0, s"earliest doc $minId must be fully novel")
  }
}
