package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_txn_retry` — the OCC retry completing the detect→rebase→retry
  * loop. Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE of the serial base→A→B′→B″
  *    replay + refined ledger at both gate scales;
  *  - retried updates apply to the key's CURRENT value (A's committed
  *    payload — the `ub:upd:` double prefix is the lost-update guard
  *    made visible in bytes), never B's stale derivation;
  *  - retries against A-deleted keys are no-ops (`retry_noop`);
  *  - non-degeneracy: retried_update, retried_delete and retry_noop all
  *    occur on the fixture.
  */
class TxnRetrySpec extends AnyFunSuite {
  private case class Doc(text: String, lang: String, source: String, n: Long)

  private def localRetry(dir: String): Map[Long, (String, Option[Doc])] = {
    val spark = SparkFixture.spark
    val base = RefQueries.table(spark, dir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) ->
        Doc(r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toMap
    spark.catalog.clearCache()
    def batch(mod: Long, off: Long, up: String, ip: String, d: Long) =
      base.flatMap { case (id, doc) =>
        (id % mod: @unchecked) match {
          case 0 => Some(id -> ("D", doc.copy(n = doc.n + d)))
          case 1 => Some(id -> ("U", doc.copy(text = up + doc.text, n = doc.n + d)))
          case 2 => Some((id + off) -> ("I", doc.copy(text = ip + doc.text, n = doc.n + d)))
          case _ => None
        }
      }
    val off = ExtQueries.VariantIdOffset
    val bMod = ExtQueries.TxnBMod
    val bD = ExtQueries.TxnBCharsDelta
    val a = batch(7L, off, "upd:", "ins:", 4L)
    val b = batch(bMod, 2L * off, "ub:", "ib:", bD)
    def apply(snap: Map[Long, Doc], ops: Map[Long, (String, Doc)]) =
      ops.foldLeft(snap) { case (s, (k, (op, doc))) =>
        if (op == "D") s - k else s + (k -> doc)
      }
    val s2 = apply(apply(base, a), b.filter { case (k, _) => !a.contains(k) })
    val conflicted = a.keySet & b.keySet
    // third serial step: re-derive each rejected op against s2's preimage
    val s3 = conflicted.foldLeft(s2) { (s, k) =>
      s.get(k) match {
        case None => s // A deleted it — nothing to retry against
        case Some(cur) =>
          if (k % bMod == 0) s - k
          else s + (k -> cur.copy(text = "ub:" + cur.text, n = cur.n + bD))
      }
    }
    val outcomes = (a.keySet ++ b.keySet).map { k =>
      k -> (if (conflicted(k))
          (if (!s2.contains(k)) "retry_noop"
           else if (k % bMod == 0) "retried_delete" else "retried_update")
        else if (a.contains(k)) "committed_a" else "committed_b")
    }.toMap
    (s3.keySet ++ outcomes.keySet).map { k =>
      k -> (outcomes.getOrElse(k, "base"), s3.get(k))
    }.toMap
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"retry snapshot + refined ledger == serial local replay ($dir)") {
      val spark = SparkFixture.spark
      val want = localRetry(dir)
      val got = ExtQueries.txnRetry(spark, dir).collect().map { r =>
        val payload = if (r.isNullAt(2)) None
          else Some(Doc(r.getString(2), r.getString(3), r.getString(4),
            r.getLong(5)))
        r.getLong(0) -> (r.getString(1), payload)
      }.toMap
      spark.catalog.clearCache()
      assert(got.keySet == want.keySet, "key universe")
      for ((k, v) <- want) assert(got(k) == v, s"key $k")
    }
  }

  test("retry semantics are non-degenerate and current-value-based (sf0.001)") {
    val want = localRetry("/root/testdata/sf0.001")
    val byOutcome = want.values.groupBy(_._1)
    for (o <- Seq("retried_update", "retried_delete", "retry_noop",
        "committed_a", "committed_b", "base"))
      assert(byOutcome.contains(o), s"outcome $o never occurred")
    // a retried update on an A-updated key carries BOTH writers' edits in
    // commit order — B's edit applied to A's committed value
    val doubled = want.collect {
      case (k, ("retried_update", Some(d))) if k % 7 == 1 => d.text }
    assert(doubled.nonEmpty && doubled.forall(_.startsWith("ub:upd:")),
      "retried updates must apply to A's committed value")
    assert(want.collect { case (_, ("retry_noop", p)) => p }.forall(_.isEmpty),
      "retry_noop keys must be payload-free")
  }
}
