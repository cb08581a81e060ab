package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_compaction_plan` — greedy cumulative-rollover bin packing over the
  * file inventory. Replays the plan sequentially and pins the packing
  * invariants: bins are contiguous per source, bytes are conserved, and
  * no bin overshoots target by more than one input file. */
class CompactionPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private val target = ExtQueries.CompactionTargetBytes

  test("plan equals the sequential greedy replay; invariants hold") {
    val files = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy(col("source"),
        expr(s"doc_id div ${ExtQueries.CompactionFileDocs}").as("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // sequential replay: walk files per source in file_id order, rolling
    // the bin when the running offset crosses a target multiple
    val planned: Seq[(String, Long, Long, Long, Long)] =
      files.toSeq.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
        var cum = 0L
        fs.sortBy(_._2).map { case (_, fid, nd, by) =>
          val bin = cum / target
          cum += by
          (src, bin, fid, nd, by)
        }
      }
    val want = planned.groupBy(t => (t._1, t._2)).map { case ((src, bin), rows) =>
      (src, bin) -> ((rows.size.toLong, rows.map(_._3).min, rows.map(_._3).max,
        rows.map(_._4).sum, rows.map(_._5).sum))
    }

    val got = ExtQueries.compactionPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want, "plan must equal the sequential greedy replay")

    // the contiguous-from-0 check below assumes no single input file
    // exceeds the target (a larger file makes the greedy cum div SKIP bin
    // indices — the operator would still be correct, so assert the
    // precondition explicitly rather than fail for a misleading reason
    assert(files.map(_._4).max < target,
      "precondition: every input file is smaller than the target bin size")
    val bySource = got.keys.groupBy(_._1)
    bySource.foreach { case (src, keys) =>
      val bins = keys.map(_._2).toSeq.sorted
      assert(bins == (0L until bins.size.toLong), s"$src: bins contiguous from 0")
      val maxFile = files.filter(_._1 == src).map(_._4).max
      keys.foreach { k =>
        assert(got(k)._5 < target + maxFile,
          s"$src bin ${k._2}: overshoot bounded by one input file")
      }
      assert(keys.map(got(_)._5).sum == files.filter(_._1 == src).map(_._4).sum,
        s"$src: bytes conserved")
    }
    assert(got.size > bySource.size, "fixture must produce multi-bin sources")
  }
}
