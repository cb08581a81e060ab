package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.functions.GraftFunctions.dsum

/** §2.9 gate (not oracle-checkable — test-gated per SURVEY §5): checkpointed
  * exactly-once file ingest across restarts, and batch/stream parity of the
  * watermarked daily aggregate. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  private def events(ids: Range, day: Int): Seq[(Long, Timestamp, String, Double)] =
    ids.map { i =>
      (i.toLong,
        Timestamp.valueOf(f"2024-02-0$day%d ${i % 24}%02d:00:00"),
        if (i % 2 == 0) "click" else "view",
        i * 0.5)
    }

  test("AvailableNow ingest is exactly-once across restarts (checkpoint = A8 guard)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-stream-in").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val schema = events(0 until 1, 1).toDF("event_id", "ts", "event_type", "value").schema

    events(0 until 50, 1).toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(in)

    Streaming.ingestAvailableNow(spark, in, out, ckpt, schema).awaitTermination()
    assert(spark.read.parquet(out).count() === 50L)

    // restart with nothing new: the checkpoint makes the re-run a no-op
    Streaming.ingestAvailableNow(spark, in, out, ckpt, schema).awaitTermination()
    assert(spark.read.parquet(out).count() === 50L)

    // drop one new file: exactly the new rows land
    events(100 until 120, 2).toDF("event_id", "ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(in)
    Streaming.ingestAvailableNow(spark, in, out, ckpt, schema).awaitTermination()
    assert(spark.read.parquet(out).count() === 70L)
    assert(spark.read.parquet(out).select("event_id").distinct().count() === 70L)
  }

  test("stateful sessionization matches the batch window formulation") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sess-in").toString
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString
    // two users; u1 has a >30min gap splitting two sessions; u2 one session
    def ev(u: Long, id: Long, t: String) = (u, id, Timestamp.valueOf(t))
    val df = Seq(
      ev(1, 1, "2024-02-01 10:00:00"), ev(1, 2, "2024-02-01 10:10:00"),
      ev(1, 3, "2024-02-01 11:30:00"), ev(1, 4, "2024-02-01 11:40:00"),
      ev(2, 5, "2024-02-01 09:00:00"), ev(2, 6, "2024-02-01 09:29:59"))
      .toDF("user_id", "event_id", "ts")
    df.coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema(df.schema).parquet(in)
      .as[Streaming.SessionEvent]
    val q = Streaming.sessionize(stream).writeStream
      .format("memory").queryName("sess_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = Streaming.latestSessions(spark.table("sess_stream"))
      .orderBy("user_id", "session_id").collect().toSeq
    assert(streamed.size === 3)
    val u1s1 = streamed(0)
    assert(u1s1.getAs[Long]("n_events") === 2L)
    assert(u1s1.getAs[Timestamp]("session_end").toString === "2024-02-01 10:10:00.0")
    assert(streamed(1).getAs[Long]("session_id") === 2L)
    assert(streamed(2).getAs[Long]("user_id") === 2L)

    // parity with the batch formulation over the same rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val batch = df
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id").collect().toSeq
    assert(streamed.map(_.toSeq) === batch.map(_.toSeq))
  }

  test("sessionize changelog compacts correctly when input spans micro-batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sess-mb-in").toString
    val ckpt = Files.createTempDirectory("graft-sess-mb-ckpt").toString
    def ev(u: Long, id: Long, t: String) = (u, id, Timestamp.valueOf(t))
    // one user whose single session spans two FILES → two micro-batches
    val f1 = Seq(ev(7, 1, "2024-03-01 10:00:00"), ev(7, 2, "2024-03-01 10:05:00"))
      .toDF("user_id", "event_id", "ts")
    val f2 = Seq(ev(7, 3, "2024-03-01 10:10:00"), ev(7, 4, "2024-03-01 11:30:00"))
      .toDF("user_id", "event_id", "ts")
    f1.coalesce(1).write.mode("append").parquet(in)
    f2.coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema(f1.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .as[Streaming.SessionEvent]
    val q = Streaming.sessionize(stream).writeStream
      .format("memory").queryName("sess_mb_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val raw = spark.table("sess_mb_stream").collect()
    // the changelog DOES contain per-batch snapshots of the open session...
    assert(raw.length > 2, s"expected changelog snapshots, got ${raw.length} rows")
    // ...and compaction yields exactly the true sessions (order of file
    // pickup is nondeterministic, so assert set-level facts)
    val compacted = Streaming.latestSessions(spark.table("sess_mb_stream"))
      .orderBy("session_id").collect()
    assert(compacted.map(_.getAs[Long]("n_events")).sum === 4L)
    assert(compacted.map(_.getAs[Long]("session_id")).distinct.length === compacted.length)
  }

  test("native session_window parity with the custom sessionizer, stream and batch") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sw-in").toString
    val ckpt = Files.createTempDirectory("graft-sw-ckpt").toString
    val ckpt2 = Files.createTempDirectory("graft-sw-ckpt2").toString
    val base = Timestamp.valueOf("2024-03-01 00:00:00")
    def at(s: Long) = new Timestamp(base.getTime + s * 1000)
    // both sides of the 1800 s boundary, never the boundary itself
    // (the documented off-by-one between the two conventions):
    // user 1 splits on a 1801 s gap; user 2 merges across a 1799 s gap;
    // user 3 is a singleton; user 99 only advances the watermark so every
    // real session closes under append mode
    val evs = Seq(
      (1L, 1L, at(0)), (1L, 2L, at(600)), (1L, 3L, at(600 + 1801)),
      (2L, 4L, at(100)), (2L, 5L, at(100 + 1799)), (2L, 6L, at(100 + 1804)),
      (3L, 7L, at(50)),
      (99L, 8L, at(100000)))
    val df = evs.toDF("user_id", "event_id", "ts")
    df.coalesce(1).write.mode("append").parquet(in)
    val want = Set(
      (1L, at(0), at(600), 2L),
      (1L, at(2401), at(2401), 1L),
      (2L, at(100), at(1904), 3L),
      (3L, at(50), at(50), 1L))

    // stream form: horizon 0 so the flusher's event time closes everything
    Streaming.sessionWindows(
        spark.readStream.schema(df.schema).parquet(in), 1800, "0 seconds")
      .writeStream.format("memory").queryName("sess_native")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val gotStream = spark.table("sess_native").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .filter(_._1 != 99L).toSet
    assert(gotStream == want, "native stream sessions")

    // batch form (no watermark gating): identical sessions
    val gotBatch = Streaming.sessionWindows(df, 1800).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .filter(_._1 != 99L).toSet
    assert(gotBatch == want, "native batch sessions")

    // parity with the custom stateful sessionizer on the same events
    Streaming.sessionize(
        spark.readStream.schema(df.schema).parquet(in)
          .as[Streaming.SessionEvent])
      .writeStream.format("memory").queryName("sess_custom_par")
      .outputMode("append").option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val gotCustom = Streaming
      .latestSessions(spark.table("sess_custom_par")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start"),
        r.getAs[Timestamp]("session_end"), r.getAs[Long]("n_events")))
      .filter(_._1 != 99L).toSet
    assert(gotCustom == want, "custom sessionizer must agree off-boundary")
  }

  test("sessionize gap test floor-divides pre-epoch sub-second timestamps") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-sess-pre-in").toString
    val ckpt = Files.createTempDirectory("graft-sess-pre-ckpt").toString
    // epoch -1800.5 s: floorDiv(-1800500, 1000) = -1801, so the gap to the
    // epoch-0 event is 1801 s > 1800 → TWO sessions. Truncation toward zero
    // (-1800500 / 1000 = -1800) would read the gap as exactly 1800 s and
    // merge them — the divergence the Math.floorDiv fix removes.
    val df = Seq(
      (5L, 1L, new Timestamp(-1800500L)),
      (5L, 2L, new Timestamp(0L)))
      .toDF("user_id", "event_id", "ts")
    df.coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema(df.schema).parquet(in)
      .as[Streaming.SessionEvent]
    val q = Streaming.sessionize(stream).writeStream
      .format("memory").queryName("sess_pre_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sessions = Streaming.latestSessions(spark.table("sess_pre_stream"))
      .orderBy("session_id").collect()
    assert(sessions.length === 2,
      s"pre-epoch 1801 s gap must split the sessions, got ${sessions.toSeq}")
    assert(sessions.map(_.getAs[Long]("n_events")).toSeq === Seq(1L, 1L))
  }

  test("watermarked daily window aggregate matches the batch computation") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-stream-agg-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-agg-ckpt").toString
    val df = (events(0 until 40, 1) ++ events(40 until 90, 2) ++ events(90 until 100, 3))
      .toDF("event_id", "ts", "event_type", "value")
    df.coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream.schema(df.schema).parquet(in)
    val q = Streaming.dailyAgg(stream).writeStream
      .format("memory").queryName("daily_agg_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("daily_agg_stream")
      .orderBy("date", "event_type").collect().toSeq
    val batch = df
      .groupBy(to_date(col("ts")).as("date"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("date", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.size === 6) // 3 days × 2 event types
  }

  test("watermarked 7-day window aggregate matches Monday-aligned batch weeks") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-stream-wk-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-wk-ckpt").toString
    // 2024-02-01 is a Thursday: days 1-4 land in week Mon 2024-01-29,
    // days 5-9 in week Mon 2024-02-05 — two Monday-aligned windows.
    val df = (1 to 9).flatMap(d => events(d * 10 until d * 10 + 10, d))
      .toDF("event_id", "ts", "event_type", "value")
    df.coalesce(1).write.mode("append").parquet(in)

    val q = Streaming.weeklyAgg(spark.readStream.schema(df.schema).parquet(in))
      .writeStream
      .format("memory").queryName("weekly_agg_stream")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("weekly_agg_stream")
      .orderBy("week_start", "event_type").collect().toSeq
    // independent batch formulation: Monday via date arithmetic, not window()
    val batch = df
      .groupBy(
        date_sub(to_date(col("ts")),
          (dayofweek(to_date(col("ts"))) + lit(5)) % 7).as("week_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("week_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.map(_.getAs[java.sql.Date]("week_start")).distinct ===
      Seq(java.sql.Date.valueOf("2024-01-29"), java.sql.Date.valueOf("2024-02-05")))
  }

  test("streaming dedup keeps one row per content across micro-batches") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-dedup-in").toString
    val ckpt = Files.createTempDirectory("graft-dedup-ckpt").toString
    // one file of re-crawl copies (high ids) + one of originals, processed
    // as SEPARATE micro-batches (maxFilesPerTrigger=1): dedup state must
    // suppress the second batch's duplicates across the batch boundary
    val docs = (0 until 40).map(i => (i.toLong, s"doc body number ${i % 25}"))
    docs.map { case (id, t) => (id + 1000000L, t) }
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    docs.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    val q = Streaming.dedupStream(spark.readStream
        .schema(docs.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", 1).parquet(in))
      .writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("dedup_stream").collect()
    // 80 input rows, 25 distinct contents — exactly one survivor each,
    // never both members of an (original, re-crawl) id pair
    assert(streamed.length === 25)
    assert(streamed.map(_.getAs[Long]("content_hash")).distinct.length === 25)
    val ids = streamed.map(_.getAs[Long]("doc_id")).toSet
    assert((0 until 40).forall(i => !(ids(i.toLong) && ids(i + 1000000L))))
    // the surviving fingerprint SET matches the batch operator (survivor
    // IDS differ by design: first-arrival vs min-id)
    val batchHashes = docs.flatMap { case (id, t) => Seq((id, t), (id + 1000000L, t)) }
      .toDF("doc_id", "text")
      .select(graft.functions.GraftFunctions.hash64(col("text")).as("h"))
      .distinct().as[Long].collect().toSet
    assert(streamed.map(_.getAs[Long]("content_hash")).toSet === batchHashes)
  }

  test("streaming funnel walks the strictly-after state machine in event order") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-funnel-in").toString
    val ckpt = Files.createTempDirectory("graft-funnel-ckpt").toString
    def ev(u: Long, id: Long, t: String, et: String) =
      (u, id, Timestamp.valueOf(t), et)
    // u1 completes the funnel; u2's purchase PRECEDES any view (must not
    // count) and its click precedes its view (must not count either);
    // u3 skips the middle step and therefore stalls at step 1
    val df = Seq(
      ev(1, 1, "2024-02-01 10:00:00", "view"),
      ev(1, 2, "2024-02-01 10:05:00", "click"),
      ev(1, 3, "2024-02-01 10:10:00", "purchase"),
      ev(2, 4, "2024-02-01 09:00:00", "purchase"),
      ev(2, 5, "2024-02-01 09:20:00", "click"),
      ev(2, 6, "2024-02-01 09:30:00", "view"),
      ev(3, 7, "2024-02-01 08:00:00", "view"),
      ev(3, 8, "2024-02-01 08:30:00", "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    df.coalesce(1).write.mode("append").parquet(in)
    val q = Streaming.funnelStream(spark.readStream.schema(df.schema)
        .parquet(in).as[Streaming.FunnelEvent])
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("funnel_stream").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("step"),
        r.getAs[String]("event_type"))).toSet
    assert(got === Set(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view"), (3L, 1, "view")))
  }

  test("streaming funnel state carries step progress across separate runs") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-funnel2-in").toString
    val ckpt = Files.createTempDirectory("graft-funnel2-ckpt").toString
    def ev(u: Long, id: Long, t: String, et: String) =
      (u, id, Timestamp.valueOf(t), et)
    val schema = Seq(ev(9, 1, "2024-02-01 10:00:00", "view"))
      .toDF("user_id", "event_id", "ts", "event_type").schema
    // memory sinks cannot recover from a checkpoint, so each run collects
    // its emitted advances through foreachBatch instead
    def run(): Seq[(Long, Int, String)] = {
      val buf = new scala.collection.mutable.ArrayBuffer[(Long, Int, String)]()
      val q = Streaming.funnelStream(spark.readStream.schema(schema)
          .parquet(in).as[Streaming.FunnelEvent])
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streaming.FunnelProgress], _: Long) =>
          buf.synchronized {
            buf ++= batch.collect().map(p => (p.user_id, p.step, p.event_type))
          }; ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.synchronized(buf.toSeq)
    }
    Seq(ev(9, 1, "2024-02-01 10:00:00", "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    assert(run() === Seq((9L, 1, "view")))
    // the later steps arrive in a SECOND run over the same checkpoint: the
    // carried (step, t) state must admit them — and a re-delivered view
    // must not re-advance
    Seq(ev(9, 2, "2024-02-01 10:02:00", "view"),
      ev(9, 3, "2024-02-01 10:05:00", "click"),
      ev(9, 4, "2024-02-01 10:10:00", "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    assert(run().sorted === Seq((9L, 2, "click"), (9L, 3, "purchase")))
  }

  test("funnel walk: micro-batch composition ≡ one pass, and matches the batch rule (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val steps = graft.queries.ExtQueries.FunnelSteps
    val evGen = Gen.listOf(Gen.zip(
      Gen.oneOf(steps :+ "noise"), Gen.chooseNum(0L, 50L)))
      .map(_.sortBy(_._2).toSeq)
    val splitGen = Gen.chooseNum(0, 100)
    val init = Streaming.FunnelState(0, Long.MinValue)
    val p = Prop.forAll(evGen, splitGen, splitGen) { (evs, s1, s2) =>
      // one-pass walk
      val (endState, out) = Streaming.funnelWalk(7L, init, evs)
      // arbitrary 3-way ordered split with carried state — the micro-batch
      // shape checkpointed state must make equivalent to one pass
      val (i, j) = {
        val a = if (evs.isEmpty) 0 else s1 % (evs.length + 1)
        val b = if (evs.isEmpty) 0 else s2 % (evs.length + 1)
        (math.min(a, b), math.max(a, b))
      }
      val (st1, o1) = Streaming.funnelWalk(7L, init, evs.take(i))
      val (st2, o2) = Streaming.funnelWalk(7L, st1, evs.slice(i, j))
      val (st3, o3) = Streaming.funnelWalk(7L, st2, evs.drop(j))
      val composed = st3 == endState && (o1 ++ o2 ++ o3) == out
      // batch parity: the reached step count matches the conditional-min
      // rule (step k's time = first step-k event strictly after t_{k-1})
      var t = Long.MinValue
      var reached = 0
      var ok = true
      steps.foreach { step =>
        if (ok) {
          val cand = evs.filter(e => e._1 == step && e._2 > t)
          if (cand.isEmpty) ok = false
          else { t = cand.map(_._2).min; reached += 1 }
        }
      }
      composed && endState.step == reached && out.length == reached
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("streaming dedup runs on the RocksDB state store (the corpus-scale provider)") {
    // The scaladoc's 100 TB prescription — RocksDB instead of the in-heap
    // HDFS-backed default — must be a config swap, not a rewrite: same
    // query, same results, state keyed identically. This pins it.
    import spark.implicits._
    val in = Files.createTempDirectory("graft-rocks-in").toString
    val ckpt = Files.createTempDirectory("graft-rocks-ckpt").toString
    val docs = (0 until 20).map(i => (i.toLong, s"rocks body ${i % 10}"))
    docs.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streaming.dedupStream(spark.readStream
          .schema(docs.toDF("doc_id", "text").schema).parquet(in))
        .writeStream
        .format("memory").queryName("rocks_dedup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("rocks_dedup").collect()
      assert(got.length === 10)
      assert(got.map(_.getAs[Long]("content_hash")).distinct.length === 10)
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("watermarked dedup: duplicate inside the horizon drops, outside re-emits") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val in = Files.createTempDirectory("graft-wmdedup-in").toString
    val ckpt = Files.createTempDirectory("graft-wmdedup-ckpt").toString
    val schema = Seq((0L, "x", ts("2024-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts").schema
    // four files = four micro-batches (maxFilesPerTrigger=1), horizon 2h:
    //   batch 1: first "same" (emit) + an in-batch duplicate 30min later (drop)
    //   batch 2: "same" again 1h after first seen — inside horizon (drop);
    //            plus "advance" 4 days later (emit), pushing the watermark
    //            far past the first "same"'s eviction point
    //   batch 3: unrelated row (emit). Needed because eviction LAGS a
    //            batch: cleanup at the end of batch N runs with the
    //            watermark derived from batch N-1's max event time, so this
    //            batch is where "same body"'s expired fingerprint actually
    //            leaves the store
    //   batch 4: "same" once more — its state is gone, so it re-emits: the
    //            bounded-state trade the scaladoc documents
    def write(rows: (Long, String, Timestamp)*): Unit =
      rows.toSeq.toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(in)
    write((1L, "same body", ts("2024-01-01 00:00:00")),
          (2L, "same body", ts("2024-01-01 00:30:00")))
    write((3L, "same body", ts("2024-01-01 01:00:00")),
          (4L, "advance body", ts("2024-01-05 00:00:00")))
    write((5L, "noise body", ts("2024-01-05 00:30:00")))
    write((6L, "same body", ts("2024-01-05 01:00:00")))

    val q = Streaming.dedupStreamWithinWatermark(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(in),
        horizon = "2 hours")
      .writeStream
      .format("memory").queryName("wm_dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("wm_dedup_stream").collect()
      .map(r => r.getAs[Long]("doc_id")).toSet
    // 2 (same batch) and 3 (within horizon across batches) dedup away;
    // 6 survives because the watermark evicted "same body"'s fingerprint
    assert(got === Set(1L, 4L, 5L, 6L), s"emitted: $got")
  }

  test("stream-stream score attach: in-window joins, late/missing scores emit null") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val dIn = Files.createTempDirectory("graft-ssj-docs").toString
    val sIn = Files.createTempDirectory("graft-ssj-scores").toString
    val ckpt = Files.createTempDirectory("graft-ssj-ckpt").toString
    val dSchema = Seq((0L, ts("2024-01-01 00:00:00"))).toDF("doc_id", "ts").schema
    val sSchema = Seq((0L, ts("2024-01-01 00:00:00"), 0.0))
      .toDF("doc_id", "sts", "score").schema
    def writeD(rows: (Long, Timestamp)*): Unit =
      rows.toSeq.toDF("doc_id", "ts").coalesce(1).write.mode("append").parquet(dIn)
    def writeS(rows: (Long, Timestamp, Double)*): Unit =
      rows.toSeq.toDF("doc_id", "sts", "score")
        .coalesce(1).write.mode("append").parquet(sIn)
    // batch 1: d1 scored in-window (00:30 ∈ [00:00, 01:00]); d2's score
    // arrives at 02:00 — OUTSIDE its 1h window (must not attach); d3 never
    // gets a score at all
    writeD((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:10:00")),
      (3L, ts("2024-01-01 00:20:00")))
    writeS((1L, ts("2024-01-01 00:30:00"), 0.9), (2L, ts("2024-01-01 02:00:00"), 0.8))
    // batch 2: a matched pair 4 days on — advances BOTH watermarks far past
    // every batch-1 row's eviction point
    writeD((99L, ts("2024-01-05 00:00:00")))
    writeS((99L, ts("2024-01-05 00:10:00"), 0.7))
    // batch 3: one more pair — eviction (hence the outer-null emission for
    // d2/d3) lags a batch, exactly like the watermarked-dedup test above
    writeD((100L, ts("2024-01-06 00:00:00")))
    writeS((100L, ts("2024-01-06 00:05:00"), 0.6))

    val docs = spark.readStream.schema(dSchema)
      .option("maxFilesPerTrigger", 1).parquet(dIn)
    val scores = spark.readStream.schema(sSchema)
      .option("maxFilesPerTrigger", 1).parquet(sIn)
    val q = Streaming.attachScoresStream(docs, scores,
        horizon = "2 hours", window = "1 hour")
      .writeStream
      .format("memory").queryName("ssj_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("ssj_stream").collect()
      .filter(_.getAs[Long]("doc_id") < 100L)
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Double]("score")).map(_.toDouble)).toMap
    assert(got === Map(1L -> Some(0.9), 2L -> None, 3L -> None, 99L -> Some(0.7)),
      s"emitted: $got")
  }

  test("trending tokens emits each window's top-k exactly once, on finalization") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-trend-in").toString
    val ckpt = Files.createTempDirectory("graft-trend-ckpt").toString
    def doc(id: Long, t: String, text: String) =
      (id, Timestamp.valueOf(t), text)
    // window 1 [10:00, 11:00): spark×4, agg×3, scan×3 (tie with agg), row×1
    val w1 = Seq(
      doc(1, "2024-02-01 10:00:00", "spark agg scan"),
      doc(2, "2024-02-01 10:10:00", "spark agg scan row"),
      doc(3, "2024-02-01 10:30:00", "spark spark agg scan"))
    val w2 = Seq(doc(4, "2024-02-01 13:00:00", "later tokens here"))
    val w3 = Seq(doc(5, "2024-02-01 15:00:00", "even later"))
    val schema = w1.toDF("doc_id", "ts", "text").schema
    // three files → three micro-batches: window 1 must finalize in the
    // batch whose watermark (derived from the PREVIOUS batch's max event
    // time) passes 11:00 — batch 3 — and only then reach the sink
    for (f <- Seq(w1, w2, w3))
      f.toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(in)

    val collected = scala.collection.mutable.ArrayBuffer.empty[(Timestamp, String, Long, Int)]
    val emptyBatches = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val q = Streaming.startTrending(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      horizon = "1 minute", every = "1 hour", k = 3, ckpt = ckpt) { topk =>
      val rows = topk.collect()
      emptyBatches += rows.isEmpty
      collected ++= rows.map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[String]("token"), r.getAs[Long]("n"), r.getAs[Int]("rank")))
    }
    q.awaitTermination()

    // window 1's top-3 with pinned ties (count DESC, token ASC): spark(4) >
    // agg(3) = scan(3) → agg before scan; row(1) cut by k=3. Window 2
    // finalizes via AvailableNow's closing no-data batch (watermark 14:59
    // passes its 14:00 end): all-ties rank alphabetically.
    val w1Start = Timestamp.valueOf("2024-02-01 10:00:00")
    val w2Start = Timestamp.valueOf("2024-02-01 13:00:00")
    assert(collected.toSeq === Seq(
      (w1Start, "spark", 4L, 1), (w1Start, "agg", 3L, 2), (w1Start, "scan", 3L, 3),
      (w2Start, "here", 1L, 1), (w2Start, "later", 1L, 2), (w2Start, "tokens", 1L, 3)))
    // window 3 never finalized (watermark 14:59 < its 16:00 end) — withheld,
    // not partially emitted; each finalized window arrived in ONE batch
    assert(emptyBatches.count(_ == false) === 2)
  }

  test("heavy-hitter windows: closed-window watchlists are bounded and never " +
      "miss a true > n/k token, across micro-batch partials") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-hh-in").toString
    val ckpt = Files.createTempDirectory("graft-hh-ckpt").toString
    def doc(id: Long, t: String, text: String) = (id, Timestamp.valueOf(t), text)
    val k = 4
    // window 1 [10:00, 11:00): hot×8 of 20 tokens (40% > 1/4); the tail is
    // 12 distinct tokens, more than the k−1 = 3 counters — the sketch must
    // shed tail, keep `hot`. Spread over TWO files so the window's sketch
    // merges across micro-batch partial states.
    val w1a = Seq(
      doc(1, "2024-03-01 10:00:00", "hot hot hot hot t1 t2 t3 t4"),
      doc(2, "2024-03-01 10:10:00", "hot hot t5 t6"))
    val w1b = Seq(doc(3, "2024-03-01 10:30:00", "hot hot t7 t8 t9 ta tb tc"))
    val w2 = Seq(doc(4, "2024-03-01 13:00:00", "all distinct tokens here now"))
    val w3 = Seq(doc(5, "2024-03-01 15:00:00", "closer closer"))
    val schema = w1a.toDF("doc_id", "ts", "text").schema
    for (f <- Seq(w1a, w1b, w2, w3))
      f.toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(in)

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Long, Seq[String])]
    val q = Streaming.startHeavyHitters(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      horizon = "1 minute", every = "1 hour", k = k, ckpt = ckpt) { batch =>
      collected ++= batch.collect().map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[Long]("n_total"),
        r.getSeq[String](r.fieldIndex("candidates")).toSeq))
    }
    q.awaitTermination()

    val byWindow = collected.map(t => t._1 -> (t._2, t._3)).toMap
    val w1Start = Timestamp.valueOf("2024-03-01 10:00:00")
    val w2Start = Timestamp.valueOf("2024-03-01 13:00:00")
    // window 3 unfinalized (watermark stops at 14:59) — withheld
    assert(byWindow.keySet == Set(w1Start, w2Start))
    val (n1, c1) = byWindow(w1Start)
    assert(n1 == 20L)
    // the survival guarantee across the cross-file merge: hot (8/20 > 1/4)
    // must be in the watchlist; state stayed bounded
    assert(c1.contains("hot"), s"candidates: $c1")
    assert(c1.size <= k - 1)
    // window 2: 5 distinct singletons of n=5 — none exceeds n/k, and the
    // sketch is allowed hangers-on but not more than k−1 of them
    val (n2, c2) = byWindow(w2Start)
    assert(n2 == 5L && c2.size <= k - 1)
    // each finalized window emitted exactly once
    assert(collected.size == 2)
  }

  test("count-min windows: closed grids replay the shared bucket rule, " +
      "merge linearly across windows, estimates never undercount") {
    import spark.implicits._
    import graft.queries.ExtQueries
    val in = Files.createTempDirectory("graft-cm-in").toString
    val ckpt = Files.createTempDirectory("graft-cm-ckpt").toString
    def doc(id: Long, t: String, text: String) = (id, Timestamp.valueOf(t), text)
    // window 1 split over TWO files so its grid merges across micro-batch
    // partial aggregates; window 2 is a different mix; window 3 stays open
    val w1a = Seq(doc(1, "2024-05-01 10:00:00", "a b a c a"),
      doc(2, "2024-05-01 10:20:00", "b c d"))
    val w1b = Seq(doc(3, "2024-05-01 10:40:00", "a d e f"))
    val w2 = Seq(doc(4, "2024-05-01 13:00:00", "a a b g"))
    val w3 = Seq(doc(5, "2024-05-01 15:00:00", "closer"))
    val schema = w1a.toDF("doc_id", "ts", "text").schema
    for (f <- Seq(w1a, w1b, w2, w3))
      f.toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(in)

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Int, Long, Long)]
    val q = Streaming.startCountMin(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      horizon = "1 minute", every = "1 hour", ckpt = ckpt) { batch =>
      collected ++= batch.collect().map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[Int]("r"), r.getAs[Long]("b"), r.getAs[Long]("cnt")))
    }
    q.awaitTermination()

    // sequential replay of the SHARED md5 bucket rule (ExtQueries.cmBuckets)
    def h64(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    def grid(tokens: Seq[String]): Map[(Int, Long), Long] = tokens
      .flatMap(t => (0 until ExtQueries.CmDepth)
        .map(r => (r, h64(s"cm$r:$t") % ExtQueries.CmWidth)))
      .groupBy(x => x).view.mapValues(_.size.toLong).toMap
    val w1Toks = "a b a c a b c d a d e f".split(" ").toSeq
    val w2Toks = "a a b g".split(" ").toSeq
    val w1Start = Timestamp.valueOf("2024-05-01 10:00:00")
    val w2Start = Timestamp.valueOf("2024-05-01 13:00:00")
    val got = collected.groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3) -> t._4).toMap).toMap
    assert(got.keySet == Set(w1Start, w2Start)) // w3 open — withheld
    assert(got(w1Start) == grid(w1Toks))
    assert(got(w2Start) == grid(w2Toks))
    // LINEARITY: cell-wise sum of the closed grids is the union's grid —
    // the property that lets hourly grids roll up into daily bit-exactly
    val merged = (got(w1Start).keySet ++ got(w2Start).keySet).map(k =>
      k -> (got(w1Start).getOrElse(k, 0L) + got(w2Start).getOrElse(k, 0L))).toMap
    assert(merged == grid(w1Toks ++ w2Toks))
    // point estimates served from the window grid never undercount
    for (t <- w1Toks.distinct) {
      val est = (0 until ExtQueries.CmDepth)
        .map(r => got(w1Start)((r, h64(s"cm$r:$t") % ExtQueries.CmWidth))).min
      assert(est >= w1Toks.count(_ == t), s"token $t undercounted")
    }
  }

  test("drift monitor: closed-window TV against the static reference is " +
      "exact, windows emitted once, open windows withheld") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-drift-in").toString
    val ckpt = Files.createTempDirectory("graft-drift-ckpt").toString
    def doc(id: Long, t: String, nTokens: Int) =
      (id, Timestamp.valueOf(t), Seq.fill(nTokens)("tok").mkString(" "))
    // window 1 [10:00, 11:00): one doc per bucket 0/1/2 (10, 40, 70 tokens)
    val w1 = Seq(
      doc(1, "2024-04-01 10:00:00", 10),
      doc(2, "2024-04-01 10:10:00", 40),
      doc(3, "2024-04-01 10:30:00", 70))
    // window 2 [13:00, 14:00): a single short doc — a length-profile shift
    val w2 = Seq(doc(4, "2024-04-01 13:00:00", 10))
    val w3 = Seq(doc(5, "2024-04-01 15:00:00", 10)) // closes w2, stays open
    val schema = w1.toDF("doc_id", "ts", "text").schema
    for (f <- Seq(w1, w2, w3))
      f.toDF("doc_id", "ts", "text").coalesce(1).write.mode("append").parquet(in)
    // static reference histogram: buckets 0/1/2 with mass 2/1/1, N_ref = 4
    val reference = Seq((0, 2L), (1, 1L), (2, 1L)).toDF("b", "c_b")

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Timestamp, Long, Long, Double, Int, Long)]
    val q = Streaming.startDriftMonitor(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(in),
      reference, horizon = "1 minute", every = "1 hour", ckpt = ckpt) { drift =>
      collected ++= drift.collect().map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("tv_num"), r.getAs[Double]("tv"),
        r.getAs[Int]("top_bucket"), r.getAs[Long]("top_term")))
    }
    q.awaitTermination()

    val w1Start = Timestamp.valueOf("2024-04-01 10:00:00")
    val w2Start = Timestamp.valueOf("2024-04-01 13:00:00")
    // hand-computed exact integers: w1 terms |1*4-2*3|, |1*4-1*3|, |1*4-1*3|
    // = 2,1,1 -> tv_num 4, tv 4/24; w2 terms |1*4-2*1|, |0-1|, |0-1| = 2,1,1
    // -> tv_num 4, tv 4/8; worst bucket 0 with term 2 in both
    assert(collected.toSet === Set(
      (w1Start, 3L, 4L, 4.0 / 24.0, 0, 2L),
      (w2Start, 1L, 4L, 4.0 / 8.0, 0, 2L)))
    // window 3 never finalized — withheld, and each window emitted ONCE
    assert(collected.size == 2)
  }

  test("drift monitor finalizer matches the batch operator's arithmetic " +
      "on identical histograms (zero drift)") {
    import spark.implicits._
    // a window distributed exactly like the reference must read TV = 0 —
    // the same invariance DomainDriftSpec pins for the batch operator
    val counts = Seq((Timestamp.valueOf("2024-04-01 10:00:00"), 0, 4L),
      (Timestamp.valueOf("2024-04-01 10:00:00"), 2, 2L)).toDF("window_start", "b", "o")
    val reference = Seq((0, 2L), (2, 1L)).toDF("b", "c_b")
    val out = Streaming.windowDrift(counts, reference).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("tv_num") == 0L)
    assert(out.head.getAs[Double]("tv") == 0.0)
  }

  test("change capture: per-snapshot changelog matches the batch diff core") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-cdc-in").toString
    val fp = Files.createTempDirectory("graft-cdc-fp").toString
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
    val snap1 = (0L until 10L).map(i => (i, s"content of doc $i"))
    val snap2 = (0L until 8L).map { i =>
      (i, if (i == 3L) "revised content of doc 3" else s"content of doc $i")
    } ++ Seq((10L, "brand new doc 10"), (11L, "brand new doc 11"))
    // two FULL snapshots, processed as separate micro-batches
    snap1.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    snap2.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    val batches = scala.collection.mutable.ArrayBuffer.empty[Map[Long, String]]
    def stream() = Streaming.startChangeCapture(
      spark.readStream.schema(snap1.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      fp, ckpt) { changes =>
      batches += changes.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    }
    stream().awaitTermination()

    assert(batches.length == 2)
    // first snapshot diffs against nothing: everything is an add
    assert(batches(0) == snap1.map(_._1 -> "added").toMap)
    // second snapshot: adds, a change, removals, the rest unchanged
    val want2 = Map(3L -> "changed", 8L -> "removed", 9L -> "removed",
      10L -> "added", 11L -> "added") ++
      Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L).map(_ -> "unchanged")
    assert(batches(1) == want2)
    // stream/batch parity end-to-end: the emitted changelog equals the
    // batch diff core applied to the two static snapshots
    def fps(s: Seq[(Long, String)], h: String) = s.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.GraftFunctions.hash64(col("text")).as(h))
    val batchDiff = graft.queries.ExtQueries
      .fingerprintDiff(fps(snap2, "h_cur"), fps(snap1, "h_prev"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batches(1) == batchDiff)
    // restart with nothing new: the checkpoint makes the re-run emit nothing
    stream().awaitTermination()
    assert(batches.length == 2)
  }

  test("media dup gate: stream verdicts match the batch perceptual screen") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-mdg-in").toString
    val ckpt = Files.createTempDirectory("graft-mdg-ckpt").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // incoming payload batch: half exact re-uploads (hamming 0, must flag),
    // half token-reversed payloads (a different grid — expected clean)
    val incoming = docs.take(20).map { case (id, t) => (90000L + id, t) } ++
      docs.take(20).map { case (id, t) =>
        (95000L + id, t.trim.split("\\s+").reverse.mkString(" "))
      }
    val (b1, b2) = incoming.splitAt(incoming.length / 2)
    b1.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    b2.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    val got = scala.collection.mutable.Map.empty[Long, Option[(Long, Long)]]
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    Streaming.startMediaDupGate(
      spark.readStream.schema(b1.toSeq.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
      ckpt) { verdicts =>
      val rows = verdicts.collect()
      batchSizes += rows.length
      rows.foreach { r =>
        got(r.getLong(0)) =
          if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3)))
        assert(r.getBoolean(1) == !r.isNullAt(2))
      }
    }.awaitTermination()
    spark.catalog.clearCache()
    assert(batchSizes.length == 2 && batchSizes.sum == incoming.length,
      s"per-batch verdict counts: $batchSizes")

    // stream/batch parity: verdicts equal the shared phash derivation run
    // as ONE batch cross screen (corpus bands x full incoming batch)
    import graft.queries.ExtQueries
    val corpusBands = ExtQueries.phashBands(ExtQueries.phashSignatures(
      docs.toSeq.toDF("doc_id", "text")))
    val batchBands = ExtQueries.phashBands(ExtQueries.phashSignatures(
      incoming.toSeq.toDF("doc_id", "text")))
    val pairs = ExtQueries.phashPairs(corpusBands, batchBands, lit(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spark.catalog.clearCache()
    val want = incoming.map(_._1).map { id =>
      val m = pairs.filter(_._2 == id).map(t => (t._1, t._3))
      id -> (if (m.isEmpty) None else Some(m.min))
    }.toMap
    assert(got.toMap == want)
    // every exact re-upload must flag (its source signature is identical,
    // hamming 0 — though the REPORTED match may be a smaller near-match
    // id); both verdicts occur on this fixture
    assert(want.values.exists(_.isDefined) && want.values.exists(_.isEmpty),
      "fixture must exercise both verdicts")
    assert(incoming.take(20).forall { case (id, _) => want(id).isDefined },
      "exact re-uploads must all flag")
    assert(incoming.take(20).exists { case (id, _) =>
      want(id).exists(_._2 == 0L) }, "a hamming-0 match must surface")
  }

  test("near-dup gate: static-index stream verdicts match the batch cross-dedup") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-ndg-in").toString
    val ckpt = Files.createTempDirectory("graft-ndg-ckpt").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the same re-crawl construction the batch operator's universe uses
    val variants = docs.map { case (id, t) =>
      (id + graft.queries.ExtQueries.VariantIdOffset,
        t.trim.split("\\s+").drop(5).mkString(" "))
    }.sortBy(_._1)
    val (b1, b2) = variants.splitAt(variants.length / 2)
    b1.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
    b2.toSeq.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)

    val got = scala.collection.mutable.Map.empty[Long, Option[Long]]
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    Streaming.startNearDupGate(
      spark.readStream.schema(b1.toSeq.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
      ckpt) { verdicts =>
      val rows = verdicts.collect()
      batchSizes += rows.length
      rows.foreach { r =>
        got(r.getLong(0)) = if (r.isNullAt(2)) None else Some(r.getLong(2))
        assert(r.getBoolean(1) == !r.isNullAt(2))
      }
    }.awaitTermination()
    spark.catalog.clearCache()
    assert(batchSizes.length == 2 && batchSizes.sum == variants.length,
      s"per-batch verdict counts: $batchSizes")

    // stream/batch parity: verdicts equal the batch cross-dedup pairs
    val pairs = graft.queries.ExtQueries.crossDedup(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    val want = variants.map(_._1).map { id =>
      val m = pairs.filter(_._2 == id).map(_._1)
      id -> (if (m.isEmpty) None else Some(m.min))
    }.toMap
    assert(got.toMap == want)
    assert(want.values.exists(_.isDefined) && want.values.exists(_.isEmpty),
      "fixture must exercise both verdicts")
  }

  test("filtered vector gate: static-index stream serving matches batch e_ivf_filter") {
    val dir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-fvg-in").toString
    val ckpt = Files.createTempDirectory("graft-fvg-ckpt").toString
    // the batch key's own query set, arriving as two micro-batches
    val qdf = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").filter(col("vec_id") < 8)
    qdf.filter(col("vec_id") < 4).coalesce(1).write.mode("append").parquet(in)
    qdf.filter(col("vec_id") >= 4).coalesce(1).write.mode("append").parquet(in)

    val got = scala.collection.mutable.Map.empty[(Long, Int), (Long, Double)]
    val batchQids = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    Streaming.startFilteredVectorGate(
      spark.readStream.schema(qdf.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding", "label"),
      ckpt) { verdicts =>
      val rows = verdicts.collect()
      batchQids += rows.map(_.getLong(0)).toSet
      rows.foreach { r =>
        got((r.getLong(0), r.getInt(3))) = (r.getLong(1), r.getDouble(2))
      }
    }.awaitTermination()
    spark.catalog.clearCache()

    // bounded per-trigger work: each micro-batch served exactly its own
    // queries against the standing index — nothing leaked across batches
    assert(batchQids.length == 2, s"micro-batch count: ${batchQids.length}")
    assert(batchQids(0) == (0L until 4L).toSet && batchQids(1) == (4L until 8L).toSet,
      s"per-batch query sets: $batchQids")

    // stream/batch parity: the union of micro-batch results IS the batch
    // key's output, bitwise (shared index/probe/serve definitions)
    val want = graft.queries.ExtQueries.ivfFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getLong(1), r.getDouble(2)))).toMap
    spark.catalog.clearCache()
    assert(got.toMap == want, "streamed filtered serving must equal the batch key")
    assert(got.nonEmpty)
  }

  test("knn attach gate: per-batch attach equals the shared core; one trigger equals e_incr_knn") {
    val dir = "/root/testdata/sf0.001"
    val in = Files.createTempDirectory("graft-kag-in").toString
    val ckpt = Files.createTempDirectory("graft-kag-ckpt").toString
    import graft.queries.ExtQueries
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    // the e_incr_knn daily batch, arriving as two micro-batches
    val off = ExtQueries.VariantIdOffset
    val batchAll = corpus.filter(pmod(col("vec_id"), lit(10L)) === 0)
      .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"))
    val ids = batchAll.select("vec_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    batchAll.filter(col("vec_id") < cut).coalesce(1).write.mode("append").parquet(in)
    batchAll.filter(col("vec_id") >= cut).coalesce(1).write.mode("append").parquet(in)

    type Edge = (Long, Long, Double, Int)
    def edges(rows: Array[org.apache.spark.sql.Row]): Array[Edge] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Array[Edge]]
    Streaming.startKnnAttachGate(
      spark.readStream.schema(batchAll.schema)
        .option("maxFilesPerTrigger", 1).parquet(in),
      corpus, ckpt) { adj => perBatch += edges(adj.collect()) }
      .awaitTermination()
    spark.catalog.clearCache()
    assert(perBatch.length == 2, s"micro-batch count: ${perBatch.length}")

    // stream/batch parity per micro-batch: each trigger's adjacency IS the
    // shared attach core run on that trigger's vectors (one definition)
    val cents = ExtQueries.seedCentroidsOf(corpus)
    val corpusAssigned = ExtQueries.knnAssign(corpus, cents)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val standing = ExtQueries.knnAdjacency(corpusAssigned)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val subBatches = Seq(batchAll.filter(col("vec_id") < cut),
      batchAll.filter(col("vec_id") >= cut))
    for ((b, i) <- subBatches.zipWithIndex) {
      val want = edges(ExtQueries.knnAttach(corpusAssigned, standing,
        ExtQueries.knnAssign(b, cents)).collect())
      assert(perBatch(i).toSet == want.toSet, s"micro-batch $i parity")
      // bounded per-trigger work: the NEW-node lists emitted by trigger i
      // are exactly trigger i's arrivals — nothing leaked across triggers
      val newSrcs = perBatch(i).map(_._1).filter(_ >= off).toSet
      val bIds = b.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(newSrcs == bIds, s"micro-batch $i new-node set")
      assert(perBatch(i).nonEmpty)
    }
    spark.catalog.clearCache()

    // single-trigger form: the whole daily batch in one micro-batch must
    // equal the graded batch key e_incr_knn bit-for-bit
    val in2 = Files.createTempDirectory("graft-kag-in2").toString
    val ckpt2 = Files.createTempDirectory("graft-kag-ckpt2").toString
    batchAll.coalesce(1).write.mode("append").parquet(in2)
    var one: Array[Edge] = Array.empty
    Streaming.startKnnAttachGate(
      spark.readStream.schema(batchAll.schema).parquet(in2),
      corpus, ckpt2) { adj => one = edges(adj.collect()) }
      .awaitTermination()
    spark.catalog.clearCache()
    val wantFull = edges(ExtQueries.incrKnn(spark, dir).collect())
    spark.catalog.clearCache()
    assert(one.toSet == wantFull.toSet,
      "single-trigger attach must equal the batch key")
  }

  test("stream-static enrichment: stateless broadcast join, unknown sources kept") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-enrich-in").toString
    val ckpt = Files.createTempDirectory("graft-enrich-ckpt").toString
    Seq((1L, "alpha.example", "aa"), (2L, "beta.example", "bb"),
        (3L, "unknown.example", "cc"))
      .toDF("doc_id", "source", "text")
      .coalesce(1).write.mode("append").parquet(in)
    val dim = Seq(("alpha.example", "high", 0.9), ("beta.example", "low", 0.2))
      .toDF("source", "tier", "quality_rate")

    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q = Streaming.enrichStream(stream, dim)
      .writeStream
      .format("memory").queryName("enrich_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // stateless: the progress report must show zero state rows
    q.awaitTermination()
    val got = spark.table("enrich_stream")
      .select("doc_id", "tier", "quality_rate").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, Some("high"), Some(0.9)),
      (2L, Some("low"), Some(0.2)),
      (3L, None, None)), "left join: never-seen sources flow with nulls")
    assert(q.lastProgress.stateOperators.isEmpty ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
      "stream-static joins must accumulate no streaming state")
  }

  test("online quality gate matches the batch operator row-for-row, stateless") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-qg-in").toString
    val ckpt = Files.createTempDirectory("graft-qg-ckpt").toString
    // spans the verdict space: keep, too_short, garbage token, no stopwords
    val fluent = ("the quick brown fox of a lazy dog " * 4).trim
    val docs = Seq(
      (1L, "en", "alpha.example", fluent),
      (2L, "en", "alpha.example", "too short"),
      (3L, "en", "beta.example", fluent + " " + ("x" * 20)),
      (4L, "de", "beta.example", ("wort " * 30).trim))
      .toDF("doc_id", "lang", "source", "text")
    docs.coalesce(1).write.mode("append").parquet(in)

    val stream = spark.readStream
      .schema(spark.read.parquet(in).schema).parquet(in)
    val q = Streaming.qualityGateStream(stream)
      .writeStream
      .format("memory").queryName("quality_gate_stream")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val key = (r: org.apache.spark.sql.Row) => r.getLong(0)
    val got = spark.table("quality_gate_stream").collect().sortBy(key).map(_.toSeq)
    val want = graft.queries.ExtQueries.qualitySignals(spark.read.parquet(in))
      .collect().sortBy(key).map(_.toSeq)
    assert(got.toSeq === want.toSeq, "stream and batch gate must agree exactly")
    // the fixture exercised more than one verdict, so parity is non-vacuous
    val verdicts = spark.table("quality_gate_stream")
      .select("verdict").collect().map(_.getString(0)).toSet
    assert(verdicts.contains("keep") && verdicts.size >= 3, verdicts.toString)
    assert(q.lastProgress.stateOperators.isEmpty ||
      q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
      "the gate is a projection — no streaming state")
  }
}
