package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.queries.RefQueries

/** Scale-operator semantics: salted aggregation must not change results;
  * bucketed joins must not shuffle. */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("salted aggregation is bit-identical to the direct groupBy") {
    val ev = RefQueries.table(spark, dir, "events")
    val salted = Skew.saltedSumCount(ev, col("event_type"), col("value"),
        col("event_id"), salts = 16)
      .orderBy("key").collect().toSeq
    val direct = ev.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("total"))
      .orderBy("key").collect().toSeq
    assert(salted === direct)
  }

  test("linear-counting sketch estimates within 5% of exact cardinality") {
    val out = graft.queries.ExtQueries.distinctSketch(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val m = graft.queries.ExtQueries.SketchSlots.toDouble
      val k = r.getAs[Long]("k_slots").toDouble
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = -m * math.log1p(-k / m)
      assert(math.abs(est - exact) / exact < 0.05,
        s"${r.getAs[String]("event_type")}: est=$est exact=$exact")
    }
  }

  test("approx percentiles match the exact order statistics at small n") {
    // GK sketch with accuracy >= group size degenerates to exact rank
    // selection — at sf0.001 every group is far under the 10000 accuracy,
    // so the one-pass scale path must agree with the rank-exact form.
    val exact = RefQueries.orderStats(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val approx = RefQueries.orderStatsApprox(spark, dir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") === e.getAs[Long]("n"))
      for (c <- Seq("p50", "p90", "p99"))
        assert(r.getAs[Double](c) === e.getAs[Double](c),
          s"${r.getAs[String]("event_type")}.$c")
    }
  }

  test("as-of join: inclusive <=, latest-wins, null when nothing precedes") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val right = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1L),
      ("a", ts("2024-01-01 12:00:00"), 2L),
      ("b", ts("2024-01-01 11:00:00"), 3L)).toDF("k", "t", "v")
    val left = Seq(
      ("a", ts("2024-01-01 09:00:00"), "before-any"),
      ("a", ts("2024-01-01 10:00:00"), "exactly-at"),   // inclusive: matches v=1
      ("a", ts("2024-01-01 11:59:00"), "between"),      // matches v=1
      ("a", ts("2024-01-01 23:00:00"), "after-all"),    // latest: v=2
      ("c", ts("2024-01-01 12:00:00"), "no-such-key")).toDF("k", "t", "name")
    val out = AsofJoin.asof(left, col("k"), col("t"),
        right, col("k"), col("t"), struct(col("v")))
      .select(col("name"), col("asof.v").as("v"))
      .collect().map(r => r.getAs[String]("name") -> Option(r.get(1))).toMap
    assert(out("before-any") === None)
    assert(out("exactly-at") === Some(1L))
    assert(out("between") === Some(1L))
    assert(out("after-all") === Some(2L))
    assert(out("no-such-key") === None)
  }

  test("same-bucketed tables join without an exchange; results match") {
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val orders = RefQueries.table(spark, dir, "orders")
      .withColumnRenamed("o_custkey", "custkey")
    val cust = RefQueries.table(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "custkey")
    Bucketing.writeBucketed(orders, s"$wh/orders_b", "orders_b", "custkey", 8)
    Bucketing.writeBucketed(cust, s"$wh/customer_b", "customer_b", "custkey", 8)

    // force SMJ so the assertion is about bucketing, not broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "customer_b", "custkey")
      assert(!Bucketing.hasShuffle(joined), joined.queryExecution.executedPlan.toString.take(800))
      val expected = orders.join(cust, Seq("custkey")).count()
      assert(joined.count() === expected)

      // control: the SAME join on plain (unbucketed) frames DOES shuffle
      val plain = orders.join(cust, Seq("custkey"))
      assert(Bucketing.hasShuffle(plain))
      // ...and still reports it AFTER execution, when AQE has rewritten the
      // exchanges into materialized query stages (leaf wrappers). collect(),
      // not count(): count() builds its OWN QueryExecution and would leave
      // THIS df's adaptive plan unexecuted — the assertion would then pass
      // even with the QueryStageExec recursion removed (verified).
      plain.collect()
      assert(Bucketing.hasShuffle(plain),
        "shuffle went undetected in the post-execution AQE plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
