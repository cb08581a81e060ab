package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_txn_readset` — backward read-set validation over the write-skew
  * fixture. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE of the ledger (both writers' ops,
  *    partner reads, derived values, stale flags, outcomes) at both gate
  *    scales;
  *  - the ANOMALY PRECONDITION: A's and B's write sets are DISJOINT, so
  *    the family's write-write validator (`e_txn_rebase`'s rule) would
  *    commit every B op — the skew is invisible to snapshot isolation;
  *  - the anomaly is REAL: every aborted op's derivation, re-run against
  *    A's committed state, yields a DIFFERENT value than the stale one
  *    the op would have written — the abort prevents an actual
  *    lost-derivation, not a false positive;
  *  - non-degeneracy: both `ssi_abort` and `committed_b` classes are
  *    non-empty.
  */
class TxnReadsetSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"local recompute + write-skew anomaly ($dir)") {
      val base = RefQueries.table(spark, dir, "documents")
        .select("doc_id", "n_chars").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = ExtQueries.txnReadset(spark, dir).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getBoolean(5), r.getString(6))).toMap
      spark.catalog.clearCache()

      val off = ExtQueries.VariantIdOffset
      val aOps = base.collect {
        case (id, n) if id % 7 == 0 =>
          (id, "a") -> (("D", None, None, false, "committed_a"))
        case (id, n) if id % 7 == 1 =>
          (id, "a") -> (("U", None, Some(n + 4), false, "committed_a"))
        case (id, n) if id % 7 == 2 =>
          (id + off, "a") -> (("I", None, Some(n + 4), false, "committed_a"))
      }
      val aWrites = base.keySet.filter(id => id % 7 == 0 || id % 7 == 1)
      val bOps = base.collect {
        case (id, n) if id % 7 == ExtQueries.TxnReadsetBClass =>
          val p = if (id % 2 == 0) id + 1 else id - 2
          base.get(p).map { pn =>
            val stale = aWrites(p)
            (id, "b") -> (("U", Some(p), Some(n + pn), stale,
              if (stale) "ssi_abort" else "committed_b"))
          }
      }.flatten
      val want = (aOps ++ bOps).toMap
      assert(got == want, {
        val diffs = got.collect { case (k, v) if want.get(k).exists(_ != v) =>
          s"$k: got $v want ${want(k)}" }.take(5)
        s"extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet} diffs=$diffs"
      })

      // write sets disjoint — the write-write validator sees nothing
      val bWrites = bOps.map(_._1._1).toSet
      val aWriteKeys = aWrites ++ base.keySet.collect {
        case id if id % 7 == 2 => id + off }
      assert((bWrites & aWriteKeys).isEmpty,
        "write skew precondition broken: write-write overlap exists")

      // the aborted derivations are genuinely stale: re-derived against
      // A's committed state they produce different values
      for (((id, _), (_, Some(p), Some(v), stale, outcome)) <- bOps
           if stale) {
        assert(outcome == "ssi_abort")
        // A updated the partner (class 1): committed value is pn + 4
        val fresh = base(id) + (base(p) + 4)
        assert(fresh != v,
          s"abort of $id was a false positive: fresh $fresh == stale $v")
      }
      val outcomes = bOps.map(_._2._5).toSet
      assert(outcomes == Set("ssi_abort", "committed_b"),
        s"degenerate outcome split: $outcomes")
    }
  }
}
