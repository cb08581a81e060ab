package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_txn_conflict` — optimistic-concurrency validation. Local recompute
  * of the coprime class grid: a base key conflicts iff doc_id mod 7 ∈
  * {0,1} AND doc_id mod 5 ∈ {0,1} (both writers touch it in place);
  * inserts land on writer-unique offset ranges and never conflict. Pinned
  * non-degenerate at both gate scales: conflicts exist, and not
  * everything conflicts. */
class TxnConflictSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"conflict set is exactly the coprime class grid ($dir)") {
      val ids = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id").collect().map(_.getLong(0))
      val off = ExtQueries.VariantIdOffset
      val bMod = ExtQueries.TxnBMod
      def aKeys = ids.collect {
        case i if i % 7 == 0 || i % 7 == 1 => i
        case i if i % 7 == 2 => i + off
      }.toSet
      def bKeys = ids.collect {
        case i if i % bMod == 0 || i % bMod == 1 => i
        case i if i % bMod == 2 => i + 2 * off
      }.toSet

      val rows = ExtQueries.txnConflict(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(rows.keySet == (aKeys ++ bKeys), "union of write sets")
      val ww = rows.collect { case (k, "write_write") => k }.toSet
      val wantWw = aKeys intersect bKeys
      assert(ww == wantWw, "write-write set != the class-grid intersection")
      // every conflict is an in-place op on a BASE key (inserts are
      // writer-unique by the offset construction)
      assert(ww.forall(k => k < off), "an insert key conflicted")
      assert(ww.forall(k => k % 7 <= 1 && k % bMod <= 1))
      // non-degenerate: conflicts exist, and not everything conflicts
      assert(ww.nonEmpty, "fixture produced no conflicts")
      assert(ww.size < rows.size, "everything conflicted")
      // disjoint keys classify to their writer
      for ((k, t) <- rows if t == "a_only") assert(!bKeys(k))
      for ((k, t) <- rows if t == "b_only") assert(!aKeys(k))
    }
  }
}
