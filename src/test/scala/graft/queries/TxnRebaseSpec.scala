package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_txn_rebase` — OCC auto-rebase of writer B over writer A's commit.
  * Pins:
  *
  *  - FULL INDEPENDENT LOCAL RECOMPUTE of the rebased snapshot + outcome
  *    ledger (serial copy-on-write in plain Scala maps) at both gate
  *    scales — rebased ≡ serial A-then-B′;
  *  - write-write keys carry writer A's value exactly (the lost-update
  *    guard): A-updated conflicts show A's payload, A-deleted conflicts
  *    show no payload;
  *  - all four outcomes occur, and `b_retry` appears in both the live
  *    (A updated) and dead (A deleted) forms — non-degenerate fixture.
  */
class TxnRebaseSpec extends AnyFunSuite {
  private case class Doc(text: String, lang: String, source: String, n: Long)

  private def localRebase(dir: String):
      Map[Long, (String, Option[Doc])] = {
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
    val a = batch(7L, off, "upd:", "ins:", 4L)
    val b = batch(ExtQueries.TxnBMod, 2L * off, "ub:", "ib:",
      ExtQueries.TxnBCharsDelta)
    def apply(snap: Map[Long, Doc], ops: Map[Long, (String, Doc)]) =
      ops.foldLeft(snap) { case (s, (k, (op, doc))) =>
        if (op == "D") s - k else s + (k -> doc)
      }
    val s1 = apply(base, a)
    val bReb = b.filter { case (k, _) => !a.contains(k) }
    val s2 = apply(s1, bReb)
    val outcomes = (a.keySet ++ b.keySet).map { k =>
      k -> (if (a.contains(k) && b.contains(k)) "b_retry"
        else if (a.contains(k)) "committed_a" else "committed_b")
    }.toMap
    (s2.keySet ++ outcomes.keySet).map { k =>
      k -> (outcomes.getOrElse(k, "base"), s2.get(k))
    }.toMap
  }

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"rebased snapshot + ledger == serial local replay ($dir)") {
      val spark = SparkFixture.spark
      val want = localRebase(dir)
      val got = ExtQueries.txnRebase(spark, dir).collect().map { r =>
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

  test("write-write keys carry A's value; all outcomes occur (sf0.001)") {
    val want = localRebase("/root/testdata/sf0.001")
    val outcomes = want.values.map(_._1).toSet
    assert(outcomes == Set("base", "committed_a", "committed_b", "b_retry"))
    val retries = want.collect { case (k, ("b_retry", p)) => (k, p) }
    // A updated (k%7==1): conflict carries A's "upd:" payload
    val live = retries.collect { case (k, Some(d)) if k % 7 == 1 => d }
    assert(live.nonEmpty && live.forall(_.text.startsWith("upd:")),
      "A-updated conflicts must carry A's payload")
    // A deleted (k%7==0): conflict is an outcome row with no payload
    val dead = retries.collect { case (k, p) if k % 7 == 0 => p }
    assert(dead.nonEmpty && dead.forall(_.isEmpty),
      "A-deleted conflicts must be payload-free ledger rows")
  }
}
