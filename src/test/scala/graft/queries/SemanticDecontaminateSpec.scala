package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_semantic_decontaminate` — embedding-space benchmark contamination.
  * The distributed zero-shuffle fold must EXACTLY match a sequential
  * driver-side replay (same left-to-right IEEE fold, same tie-break), and
  * the plan must stay join-free on the corpus path. */
class SemanticDecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val vecs: Array[(Long, Array[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Sequential left-to-right fold — the exact op order of seqSum/zip_with
    * and DuckDB list_reduce. */
  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
  private def nrm(a: Array[Float]): Double =
    math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))

  test("argmax, cosine, and flag exactly match the sequential replay") {
    val got = ExtQueries.semanticDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val bench = vecs.filter(_._1 < ExtQueries.DecontamBenchIds).sortBy(_._1)
    val corpus = vecs.filter(_._1 >= ExtQueries.DecontamBenchIds)
    assert(got.length == corpus.length)
    val want = corpus.map { case (id, e) =>
      val n = nrm(e)
      // strict > over the bid-ascending bench order = lowest-id tie-break
      val (bestId, bestCos) = bench.foldLeft((-1L, -2.0)) {
        case ((bi, bc), (qid, qe)) =>
          val c = dot(e, qe) / (n * nrm(qe))
          if (c > bc) (qid, c) else (bi, bc)
      }
      (id, bestId, bestCos, bestCos >= ExtQueries.SemDedupTheta)
    }.sortBy(_._1)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"vec ${w._1}") }
  }

  test("corpus path is fold-only: no join, no hash exchange; one output sort") {
    val df = ExtQueries.semanticDecontaminate(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // the ONLY join is the broadcast of the 1-row bench array
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("hashpartitioning("),
      "per-corpus-vector argmax must fold scan-side, not group-by")
    val ranges = "rangepartitioning".r.findAllIn(plan).length
    assert(ranges == 1, s"expected exactly the output sort, got $ranges\n$plan")
  }
}
