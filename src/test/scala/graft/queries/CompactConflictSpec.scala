package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_compact_conflict` — compaction vs concurrent writer validation.
  * Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE (file inventory, greedy rollover
  *    bins, the writer's touch classes, per-bin verdicts and
  *    post-rebase stats) at both gate scales;
  *  - both verdict classes non-empty — the sparse writer rule is
  *    load-bearing (a dense writer would conflict every bin and prove
  *    nothing);
  *  - `commit` bins are pure rearrangements: post-state ≡ pre-state;
  *  - `rebase` bins genuinely changed: each lost its deleted rows
  *    and/or re-priced its updated payloads;
  *  - the plan's bins PARTITION the file inventory (every file routed
  *    exactly once — the precondition of per-bin partial retry).
  */
class CompactConflictSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + verdict semantics ($dir)") {
      val docs = RefQueries.table(spark, dir, "documents")
        .select("source", "doc_id", "n_chars").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val got = ExtQueries.compactConflict(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6),
          r.getLong(7), r.getLong(8))).toMap
      spark.catalog.clearCache()

      val fd = ExtQueries.CompactionFileDocs
      val tgt = ExtQueries.CompactionTargetBytes
      val cm = ExtQueries.CompactConflictMod
      val delta = ExtQueries.CompactConflictCharsDelta
      val files = docs.groupBy { case (s, id, _) => (s, id / fd) }.map {
        case ((s, f), ds) =>
          val touched = ds.count(d => d._2 % cm == 0 || d._2 % cm == 1).toLong
          val after = ds.filter(_._2 % cm != 0)
          (s, f, ds.size.toLong, ds.map(_._3).sum, touched,
            after.size.toLong,
            after.map(d => if (d._2 % cm == 1) d._3 + delta else d._3).sum)
      }.toSeq
      val want = files.groupBy(_._1).flatMap { case (s, fs) =>
        val sorted = fs.sortBy(_._2)
        val offs = sorted.scanLeft(0L)(_ + _._4).init
        sorted.zip(offs).map { case (f, off) => (f, off / tgt) }
          .groupBy(_._2).map { case (bin, members) =>
            val ms = members.map(_._1)
            val stale = ms.map(_._5).sum
            (s, bin) -> (ms.size.toLong, ms.map(_._3).sum, ms.map(_._4).sum,
              stale, if (stale > 0) "rebase" else "commit",
              ms.map(_._6).sum, ms.map(_._7).sum)
          }
      }
      assert(got == want, {
        val diffs = got.collect { case (k, v) if want.get(k).exists(_ != v) =>
          s"$k: got $v want ${want(k)}" }.take(5)
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet} diffs=$diffs"
      })

      val verdicts = got.values.map(_._5).toSet
      assert(verdicts == Set("commit", "rebase"),
        s"degenerate verdict split: $verdicts")
      for ((k, (_, nd, by, stale, v, nda, bya)) <- got) {
        if (v == "commit")
          assert(stale == 0 && nda == nd && bya == by,
            s"commit bin $k must be a pure rearrangement")
        else
          assert(stale > 0 && (nda < nd || bya != by),
            s"rebase bin $k must have genuinely changed")
      }
      assert(got.values.map(_._1).sum == files.size.toLong,
        "bins must partition the file inventory")
    }
  }
}
