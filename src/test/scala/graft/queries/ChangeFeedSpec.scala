package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_change_feed` — the CDF read. The load-bearing pin is APPLY-CLOSURE:
  * replaying version v's feed rows over the AS-OF-(v−1) snapshot must
  * reproduce the AS-OF-v snapshot exactly (delete the `delete` keys,
  * overwrite with `update_postimage`, add `insert`) — a feed that passes
  * this is consumable by any downstream incremental pipeline. Plus pair
  * completeness (every update emits preimage AND postimage) and the
  * change-class arithmetic recomputed from the base table's mod rule. */
class ChangeFeedSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Doc(text: String, lang: String, source: String, n: Long)
  private def snapMap(v: Int) =
    ExtQueries.snapshotAsOf(spark, dir, v).collect()
      .map(r => r.getLong(1) ->
        Doc(r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
      .toMap

  test("apply-closure: feed(v) over snapshot(v-1) reproduces snapshot(v)") {
    val feed = ExtQueries.changeFeed(spark, dir).collect()
      .groupBy(_.getLong(0))
    assert(feed.keySet == (1 to ExtQueries.TimeTravelVersions).map(_.toLong).toSet)
    for (v <- 1 to ExtQueries.TimeTravelVersions) {
      val rows = feed(v.toLong).map(r => (r.getString(1), r.getLong(2),
        Doc(r.getString(3), r.getString(4), r.getString(5), r.getLong(6))))
      var snap = snapMap(v - 1)
      for ((t, id, _) <- rows if t == "delete") {
        assert(snap.contains(id), s"v$v: delete of absent key $id")
        snap -= id
      }
      for ((t, id, d) <- rows if t == "update_postimage") {
        assert(snap.contains(id), s"v$v: update of absent key $id")
        snap += (id -> d)
      }
      for ((t, id, d) <- rows if t == "insert") {
        assert(!snap.contains(id), s"v$v: insert collides on $id")
        snap += (id -> d)
      }
      assert(snap == snapMap(v), s"feed($v) does not close onto snapshot $v")

      // pair completeness + preimage fidelity
      val pre = rows.filter(_._1 == "update_preimage")
      val post = rows.filter(_._1 == "update_postimage")
      assert(pre.length == post.length, s"v$v: unpaired update images")
      val prevSnap = snapMap(v - 1)
      for ((_, id, d) <- pre)
        assert(prevSnap(id) == d, s"v$v: preimage of $id is not the prior row")
    }
  }

  test("change-class arithmetic matches the base table's mod rule") {
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    def cls(m: Long) = base.count(_ % 9 == m).toLong
    val counts = ExtQueries.changeFeed(spark, dir).collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .view.mapValues(_.length.toLong).toMap
    for (v <- 1 to 3) {
      assert(counts((v.toLong, "insert")) == cls(0), s"v$v inserts")
      val wantDel = if (v == 3) cls(3) + cls(4) else cls(v.toLong)
      assert(counts((v.toLong, "delete")) == wantDel, s"v$v deletes")
      assert(counts((v.toLong, "update_postimage")) == cls(v.toLong + 3) + cls(7),
        s"v$v updates")
    }
  }
}
