package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** `e_delete_apply` — deletion cascade execution + re-audit. Replays the
  * cascade sequentially per artifact (anti-join for per-document
  * artifacts; member-drop + re-count + sub-2 dissolution for the cluster
  * artifact) and pins the compliance gate: zero references remain in any
  * artifact after the apply. The dissolution rule is exercised through
  * the mod knob: the spec searches for a request rule that deletes PART
  * of a cross-document cluster, so the cascade's secondary loss
  * (dissolved sub-2 survivors) is observed, not just defined. */
class DeleteApplySpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  private def base(id: Long): Long =
    if (id >= ExtQueries.VariantIdOffset) id - ExtQueries.VariantIdOffset else id

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val v = df.select("doc_id").collect().map(r => base(r.getLong(0))).toSeq
    spark.catalog.clearCache()
    v
  }

  private lazy val perDocIds = Map(
    "chunk_dedup" -> ids(ExtQueries.chunkDedup(spark, dir)),
    "fingerprint" -> ids(ExtQueries.fingerprint(spark, dir)),
    "split" -> ids(ExtQueries.corpusSplit(spark, dir)))
  private lazy val clus: Array[(Long, Long)] = {
    val v = ExtQueries.dupClusters(spark, dir)
      .select("doc_id", "cluster_id").collect()
      .map(r => (base(r.getLong(0)), r.getLong(1)))
    spark.catalog.clearCache()
    v
  }
  private lazy val allIds: Set[Long] = perDocIds("fingerprint").toSet

  /** Sequential cascade replay at request rule `id % mod == 0`. */
  private def replay(mod: Long): Map[String, (Long, Long, Long, Long)] = {
    val dels = allIds.filter(_ % mod == 0)
    val docRows = perDocIds.map { case (name, is) =>
      val after = is.filterNot(dels.contains)
      name -> ((is.length.toLong, after.length.toLong, 0L,
        (is.length - after.length).toLong))
    }
    val kept = clus.filterNot { case (bid, _) => dels.contains(bid) }
    val bigEnough = kept.groupBy(_._2).filter(_._2.length >= 2).keySet
    val after = kept.filter { case (_, cid) => bigEnough(cid) }
    docRows ++ Map("dup_clusters" -> ((clus.length.toLong, after.length.toLong,
      0L, (clus.length - after.length).toLong)))
  }

  private def collectApply(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long, Long, Long)] = {
    val got = df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    spark.catalog.clearCache()
    got
  }

  test("pinned rule: cascade equals the sequential replay; no references survive") {
    val got = collectApply(ExtQueries.deleteApply(spark, dir))
    assert(got == replay(ExtQueries.DeleteEveryMod),
      "apply report must equal the sequential cascade replay")
    got.foreach { case (name, (before, after, refs, dropped)) =>
      assert(refs == 0L, s"$name: the compliance gate — no reference survives")
      assert(after < before && dropped == before - after, name)
    }
  }

  test("dissolution knob: some request rule dissolves a sub-2 cluster survivor") {
    // find a rule whose request set deletes PART of a cross-document
    // cluster: the replay predicts secondary loss (dropped > direct refs)
    val mods = (2L to 60L)
    val mod = mods.find { m =>
      val dels = allIds.filter(_ % m == 0)
      val refs = clus.count { case (bid, _) => dels.contains(bid) }.toLong
      dels.nonEmpty && replay(m)("dup_clusters")._4 > refs
    }
    assert(mod.isDefined,
      "fixture must admit a partial-cluster deletion rule in [2, 60]")
    val m = mod.get
    val got = collectApply(ExtQueries.deleteApplyImpl(spark, dir, m))
    assert(got == replay(m), s"mod $m: apply must equal the replay")
    val dels = allIds.filter(_ % m == 0)
    val refs = clus.count { case (bid, _) => dels.contains(bid) }.toLong
    assert(got("dup_clusters")._4 > refs,
      s"mod $m: a dissolved survivor must drop beyond the direct references")
    assert(got("dup_clusters")._3 == 0L)
  }
}
