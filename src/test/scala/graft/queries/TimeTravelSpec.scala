package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** `e_time_travel` — snapshot AS-OF reads. The local pin is a SEQUENTIAL
  * replay of the change history (the copy-on-write fold the oracle also
  * states): v0 must be the base table verbatim, every version of the
  * all-versions table must equal the fold at that version, the
  * production-shaped single-version read must equal the sliced table,
  * and the class semantics must hold — the every-version-updated key
  * shows exactly its latest tag per version (precedence), the
  * update-then-delete key exists at v1/v2 and vanishes at v3, and each
  * version's inserts appear from that version on. */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private case class Doc(text: String, lang: String, source: String, n: Long)

  test("all versions equal the sequential replay; AS-OF read equals the slice") {
    val off = ExtQueries.VariantIdOffset
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => r.getLong(0) ->
        Doc(r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toMap

    // sequential copy-on-write fold
    def applyBatch(s: Map[Long, Doc], v: Int): Map[Long, Doc] = {
      val delCls: Long => Boolean =
        if (v == 3) m => m == 3 || m == 4 else m => m == v
      val afterDel = s.filter { case (id, _) =>
        !(base.contains(id) && delCls(id % 9)) || id >= off
      }
      // deletes only ever target base keys; offset keys are insert-only
      val afterUpd = afterDel.map { case (id, d) =>
        if (id < off && (id % 9 == 3 + v || id % 9 == 7) && !delCls(id % 9))
          id -> Doc(s"u$v:${base(id).text}", d.lang, d.source, base(id).n + 3)
        else id -> d
      }
      val ins = base.collect { case (id, d) if id % 9 == 0 =>
        (id + v * off) -> Doc(s"i$v:${d.text}", d.lang, d.source, d.n + 3)
      }
      afterUpd ++ ins
    }
    var snap = base
    val want = scala.collection.mutable.Map(0 -> base)
    for (v <- 1 to ExtQueries.TimeTravelVersions) {
      snap = applyBatch(snap, v); want(v) = snap
    }

    val got = ExtQueries.timeTravel(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r => r.getLong(1) ->
        Doc(r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
        .toMap).toMap
    assert(got.keySet == want.keySet.toSet)
    for (v <- got.keys.toSeq.sorted)
      assert(got(v) == want(v.toInt), s"version $v != sequential replay")

    // class semantics, read off the table
    val k7 = base.keys.filter(_ % 9 == 7).head
    assert(got(1L)(k7).text == s"u1:${base(k7).text}")
    assert(got(2L)(k7).text == s"u2:${base(k7).text}", "precedence: latest tag wins")
    assert(got(3L)(k7).text == s"u3:${base(k7).text}")
    val k4 = base.keys.filter(_ % 9 == 4).head
    assert(got(1L)(k4).text == s"u1:${base(k4).text}")
    assert(got(2L).contains(k4) && !got(3L).contains(k4), "update-then-delete")
    val k0 = base.keys.filter(_ % 9 == 0).head
    assert(!got(1L).contains(k0 + 2 * off) && got(2L).contains(k0 + 2 * off),
      "inserts appear from their version on")

    // the production-shaped single-version read equals the slice
    for (v <- Seq(0, 2, ExtQueries.TimeTravelVersions)) {
      val asOf = ExtQueries.snapshotAsOf(spark, dir, v).collect()
        .map(r => r.getLong(1) ->
          Doc(r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
        .toMap
      assert(asOf == got(v.toLong), s"AS OF $v must equal the sliced table")
    }
  }
}
