package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import org.apache.spark.sql.functions._

/** Grades [[graft.operators.LabelPropagation]] twice: the general engine on a hand-built
  * graph where every round's majority vote is known, and the
  * `e_label_prop` binding against a literal local re-run of the update
  * rule over the operator's own knn edges. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("hand graph: majority wins, ties break to the lower label, seeds freeze") {
    // path 1-2-3-4 plus hub 5 connected to 1,3; seeds: 1→7, 4→2, 5→7.
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L), (5L, 3L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq((1L, 7), (4L, 2), (5L, 7)).toDF("id", "label")
    val nodes = (1L to 5L).toDF("id")
    val r1 = graft.operators.LabelPropagation.propagate(edges, seeds, nodes, 1)
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), r.getBoolean(2))).toMap
    // round 1: node 2 sees {1→7}; node 3 sees {4→2, 5→7} — tie, lower label 2 wins
    assert(r1(2) == (Some(7), false))
    assert(r1(3) == (Some(2), false))
    // seeds keep their labels even when neighbors disagree
    assert(r1(1) == (Some(7), true) && r1(4) == (Some(2), true) && r1(5) == (Some(7), true))
    val r2 = graft.operators.LabelPropagation.propagate(edges, seeds, nodes, 2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // round 2 (synchronous, reads round-1 state): node 2 sees {1→7, 3→2}
    // — tie → lower label 2; node 3 sees {2→7, 4→2, 5→7} — majority 7
    assert(r2(2) == Some(2) && r2(3) == Some(7))
  }

  test("e_label_prop matches a local re-run over its own knn edges") {
    val knn = ExtQueries.knnGraph(spark, dir)
      .select("src", "nbr").collect().map(r => (r.getLong(0), r.getLong(1)))
    spark.catalog.clearCache()
    val edges = (knn ++ knn.map(_.swap)).distinct
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSeq }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val seedMax = ExtQueries.LabelSeedMax
    var lab: Map[Long, Option[Int]] =
      emb.map { case (v, l) => v -> (if (v < seedMax) Some(l) else None) }
    (1 to ExtQueries.LabelPropIters).foreach { _ =>
      val next = lab.map { case (v, cur) =>
        if (v < seedMax) v -> cur
        else {
          val votes = edges.getOrElse(v, Seq.empty).flatMap(lab(_))
          if (votes.isEmpty) v -> cur
          else {
            val byLabel = votes.groupBy(identity).view.mapValues(_.size)
            val mc = byLabel.values.max
            v -> Some(byLabel.collect { case (l, c) if c == mc => l }.min)
          }
        }
      }
      lab = next
    }
    val got = ExtQueries.labelProp(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    spark.catalog.clearCache()
    assert(got == lab)
    // propagation did something: labels spread beyond the seed set
    assert(got.count { case (v, l) => v >= seedMax && l.isDefined } > 0)
  }
}
