package graft

import java.sql.Timestamp

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.{Event, SessionSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming execution of the streaming surface: file-backed
  * and MemoryStream micro-batches driven synchronously
  * (processAllAvailable), checked against the batch run of the same
  * transform — Spark's batch/stream parity makes the batch result the
  * oracle. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def eventsBatch = Tables.events(spark, TestSession.Sf)

  /** The file stream source needs a directory; the fixture is a single
    * parquet file, so stage it into a temp dir once. */
  private lazy val eventsStreamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSession.Sf}/events.parquet"),
      dir.resolve("part-0.parquet"))
    dir.toString
  }

  /** Same ts normalization as [[Tables.events]], applied to the stream:
    * the fixture's `ts` physical type has drifted across driver versions
    * (nanos-as-long, TIMESTAMP, TIMESTAMP_NTZ), so dispatch on the
    * batch-read schema rather than hard-coding one shim. */
  private def eventsStream = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val schema = Tables.load(spark, TestSession.Sf, "events").schema
    val raw = spark.readStream.schema(schema).parquet(eventsStreamDir)
    schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  test("streamed tumbling window (complete mode) equals batch") {
    val stream = eventsStream
    val agg = StreamingOps.tumblingCounts(stream, withWatermark = false)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling_out")
    val batch = StreamingOps.tumblingCounts(eventsBatch, withWatermark = false)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0)
  }

  test("stream-static dimension join enriches each micro-batch") {
    // the static side is re-planned per micro-batch and (being a dim)
    // broadcast — the standard streaming enrichment shape; the SAME
    // transform is declared as `stream_enrich` with a DuckDB oracle,
    // so this test only has to prove stream/batch parity of it
    val customers = Tables.customer(spark, TestSession.Sf)
    val joined = StreamingOps.customerEnrich(eventsStream, customers)
    val q = joined.writeStream.outputMode("complete")
      .format("memory").queryName("dimjoin_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dimjoin_out")
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    val batch = StreamingOps.customerEnrich(eventsBatch, customers)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    assert(streamed == batch)
    assert(streamed.values.map(_._1).sum > 0)
  }

  test("watermarked session windows emit finalized sessions (append)") {
    val agg = StreamingOps.sessionCounts(eventsStream, withWatermark = true)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sessions_out")
    // append mode only emits sessions sealed by the final watermark —
    // every emitted session must match the batch computation exactly.
    val batch = StreamingOps.sessionCounts(eventsBatch, withWatermark = false)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty,
      "streamed sessions must be a subset of batch sessions")
  }

  test("DYNAMIC-gap session windows (per-event timeout) emit " +
      "finalized sessions matching the batch computation") {
    val agg = StreamingOps.sessionCountsDynamic(eventsStream,
      withWatermark = true)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("dyn_sessions_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dyn_sessions_out")
    val batch = StreamingOps.sessionCountsDynamic(eventsBatch,
      withWatermark = false)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty,
      "streamed dynamic sessions must be a subset of batch sessions")
    // the dynamic gap must actually CHANGE the segmentation somewhere
    // vs the static 30-minute rule, else the case proves nothing
    val static30 = StreamingOps.sessionCounts(eventsBatch,
      withWatermark = false)
    assert(batch.exceptAll(static30).count() > 0,
      "dynamic gaps segmented identically to the static rule")
  }

  test("dropDuplicatesWithinWatermark dedups a re-delivered stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val base = Seq(
      Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0),
      Event(2L, Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "view", 2.0),
      Event(3L, Timestamp.valueOf("2024-01-01 10:02:00"), 2L, "click", 3.0))
    mem.addData(base: _*)
    mem.addData(base: _*) // exact re-delivery (at-least-once duplicate)
    val dedup = StreamingOps.dedupWithinWatermark(mem.toDF())
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_out").select("event_id").distinct().count() == 3)
    assert(spark.table("dedup_out").count() == 3)
  }

  test("transformWithState sessions emit on event-time timers (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      mem.addData(
        Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.5),
        Event(2L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "view", 2.5),
        Event(3L, Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "click", 4.0))
      val withWm = mem.toDS().withWatermark("ts", "1 minute").as[Event]
      val out = StreamingOps.twsSessions(withWm)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("tws_out").start()
      try {
        q.processAllAvailable()
        mem.addData(Event(99L,
          Timestamp.valueOf("2024-01-01 12:00:00"), 9L, "click", 0.0))
        q.processAllAvailable()
        mem.addData(Event(100L,
          Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "click", 0.0))
        q.processAllAvailable()
      } finally q.stop()
      val results = spark.table("tws_out").as[SessionSummary]
        .collect().map(s => s.user_id -> ((s.n_events, s.total_value))).toMap
      assert(results.get(1L).contains((2, 4.0)), s"got $results")
      assert(results.get(2L).contains((1, 4.0)), s"got $results")
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState sessions emit on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.5),
      Event(2L, Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "view", 2.5),
      Event(3L, Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "click", 4.0))
    val withWm = mem.toDS()
      .withWatermark("ts", "1 minute")
      .as[Event]
    val out = StreamingOps.statefulSessions(withWm)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stateful_out").start()
    try {
      q.processAllAvailable()
      // advance the watermark far past both sessions → timeout fires
      mem.addData(Event(99L,
        Timestamp.valueOf("2024-01-01 12:00:00"), 9L, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(100L,
        Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val results = spark.table("stateful_out").as[SessionSummary]
      .collect().map(s => s.user_id -> ((s.n_events, s.total_value))).toMap
    assert(results.get(1L).contains((2, 4.0)), s"got $results")
    assert(results.get(2L).contains((1, 4.0)), s"got $results")
  }

  test("transformWithState pattern chains on RocksDB recover their " +
      "state across a query restart with exactly-once output") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val ckpt = java.nio.file.Files
        .createTempDirectory("tws_chain_ckpt").toString
      def ev(id: Long, t: String, uid: Long, tpe: String) =
        Event(id, Timestamp.valueOf(t), uid, tpe, 1.0)
      // memory sink refuses checkpoint recovery — collect through
      // foreachBatch (checkpoint-recoverable) into a shared set
      val gotRef =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      def start() = StreamingOps.twsPatternChains(mem.toDS(), 3600L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingOps.ChainMatch],
              _: Long) =>
            df.collect().foreach(m =>
              { gotRef.add((m.user_id, m.event_id)); () })
            ()
        }.start()
      // run 1: user 1 completes a chain (emits 3); user 2 reaches
      // view→click — the two longs of pending state the restart must
      // recover from the RocksDB checkpoint
      val q1 = start()
      try {
        mem.addData(
          ev(1, "2024-01-01 10:00:00", 1, "view"),
          ev(2, "2024-01-01 10:10:00", 1, "click"),
          ev(3, "2024-01-01 10:20:00", 1, "purchase"),
          ev(4, "2024-01-01 10:00:00", 2, "view"),
          ev(5, "2024-01-01 10:05:00", 2, "click"))
        q1.processAllAvailable()
      } finally q1.stop()
      // run 2, same checkpoint: user 2's purchase completes ACROSS the
      // restart — it can only emit if ChainState recovered; and event 3
      // must NOT re-emit (committed offsets replay nothing)
      val q2 = start()
      try {
        mem.addData(
          ev(6, "2024-01-01 10:30:00", 2, "purchase"),
          ev(7, "2024-01-01 10:30:00", 3, "purchase"))
        q2.processAllAvailable()
      } finally q2.stop()
      val got = scala.jdk.CollectionConverters
        .CollectionHasAsScala(gotRef).asScala.toSeq.sorted
      // run 1's chain completed once; run 2's chain can only emit if
      // ChainState recovered from the RocksDB checkpoint; a replayed
      // batch would surface as a DUPLICATE in the multiset; user 3's
      // chainless purchase never emits
      assert(got == Seq((1L, 3L), (2L, 6L)),
        s"expected exactly the two chains once each, got: $got")
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("the tws chain detector EVICTS idle users once the watermark " +
      "passes last-activity + window: state tracks ACTIVE users, " +
      "results unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prevProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      def ev(id: Long, t: String, uid: Long, tpe: String) =
        Event(id, Timestamp.valueOf(t), uid, tpe, 1.0)
      val got =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
      val q = StreamingOps.twsPatternChains(mem.toDS(), 3600L)
        .writeStream.outputMode("append")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory("tws_evict_ckpt").toString)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[StreamingOps.ChainMatch],
              _: Long) =>
            df.collect().foreach(m => { got.add((m.user_id, m.event_id)); () })
            ()
        }.start()
      try {
        // batch 1: five users park view(+click) carries
        mem.addData((1L to 5L).flatMap(u => Seq(
          ev(u * 10, "2024-01-01 10:00:00", u, "view"),
          ev(u * 10 + 1, "2024-01-01 10:05:00", u, "click"))): _*)
        q.processAllAvailable()
        val peak = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        // batch 2: one far-future event advances the watermark a day
        // past every carry's last-activity + window
        mem.addData(ev(1000, "2024-01-02 12:00:00", 99L, "view"))
        q.processAllAvailable()
        // batch 3: timers fired against the new watermark — the five
        // idle carries evict; user 1's late-window purchase emits
        // nothing (semantics unchanged: it is outside the 1 h window
        // regardless), and user 99 completes a FRESH chain to prove
        // the detector still works after eviction ran
        mem.addData(
          ev(1001, "2024-01-02 12:10:00", 1L, "purchase"),
          ev(1002, "2024-01-02 12:20:00", 99L, "click"),
          ev(1003, "2024-01-02 12:30:00", 99L, "purchase"))
        q.processAllAvailable()
        val settled = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(peak >= 5, s"expected ≥5 state rows at peak, got $peak")
        assert(settled < peak,
          s"idle users' state never evicted: peak=$peak settled=$settled")
        // the only CARRY-holding user at the end is 99 (user 1's
        // purchase folded to an EMPTY carry, which must clear rather
        // than park an untimered row forever — the bot/purchase-only
        // traffic leak): ≤ 1 chain row + 1 timer row in the store
        assert(settled <= 2,
          s"state not bounded by ACTIVE carries: settled=$settled")
        val out = scala.jdk.CollectionConverters
          .CollectionHasAsScala(got).asScala.toSeq.sorted
        assert(out == Seq((99L, 1003L)),
          s"eviction changed results: $out")
      } finally q.stop()
    } finally {
      prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stateful pattern chains equal the batch events_pattern " +
      "formulation across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val out = StreamingOps.patternChains(mem.toDS(), windowSec = 3600L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("chains_out").start()
    def ev(id: Long, t: String, uid: Long, tpe: String) =
      Event(id, Timestamp.valueOf(t), uid, tpe, 1.0)
    try {
      // batch 1: user 1 view→click (qualified); user 2 click with no
      // view (never qualifies)
      mem.addData(
        ev(1, "2024-01-01 10:00:00", 1, "view"),
        ev(2, "2024-01-01 10:10:00", 1, "click"),
        ev(3, "2024-01-01 10:00:00", 2, "click"))
      q.processAllAvailable()
      // batch 2: the chain COMPLETES ACROSS THE BATCH BOUNDARY for
      // user 1; user 2's purchase has no qualified click; user 1's
      // second purchase falls outside the window
      mem.addData(
        ev(4, "2024-01-01 10:30:00", 1, "purchase"),
        ev(5, "2024-01-01 10:30:00", 2, "purchase"),
        ev(6, "2024-01-01 13:00:00", 1, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("chains_out")
      .as[StreamingOps.ChainMatch].collect()
      .map(m => (m.user_id, m.event_id)).toSet
    assert(got == Set((1L, 4L)), s"chains: $got")
  }

  test("stream-stream interval join equals the batch join") {
    val clicksS = eventsStream.filter(col("event_type") === "click")
    val purchS = eventsStream.filter(col("event_type") === "purchase")
    val joined = StreamingOps.clickPurchaseJoin(clicksS, purchS)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssjoin_out")
    val batch = StreamingOps.clickPurchaseJoin(
      eventsBatch.filter(col("event_type") === "click"),
      eventsBatch.filter(col("event_type") === "purchase"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "stream-stream join must equal the batch interval join")
  }

  test("stream-stream LEFT OUTER join emits unmatched rows only after " +
    "the watermark proves no match can arrive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamingOps.clickPurchaseLeftJoin(
      clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_outer_out").start()
    try {
      // batch 1: one matched purchase (user 1), one unmatched (user 2)
      clicks.addData(
        Event(10L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 0))
      purchases.addData(
        Event(20L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 0),
        Event(21L, Timestamp.valueOf("2024-01-01 10:30:00"), 2L, "purchase", 0))
      q.processAllAvailable()
      val early = spark.table("ssjoin_outer_out").collect()
      // the matched row may emit now; the unmatched one MUST NOT yet —
      // a click for user 2 could still arrive within the watermark delay
      assert(!early.exists(r => r.getLong(0) == 21L),
        s"unmatched purchase emitted before watermark: ${early.mkString}")
      // batch 2: advance event time far past purchase-ts + join window +
      // watermark delay so the outer side can be finalized
      clicks.addData(
        Event(11L, Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "click", 0))
      purchases.addData(
        Event(22L, Timestamp.valueOf("2024-01-01 13:00:00"), 9L, "purchase", 0))
      q.processAllAvailable()
      // one more cycle so the advanced watermark is applied to state
      purchases.addData(
        Event(23L, Timestamp.valueOf("2024-01-01 13:01:00"), 9L, "purchase", 0))
      q.processAllAvailable()
      val rows = spark.table("ssjoin_outer_out").collect()
      val unmatched = rows.filter(r => r.getLong(0) == 21L)
      assert(unmatched.length == 1 && unmatched.head.isNullAt(1),
        s"expected exactly one null-click row for purchase 21 in: ${rows.mkString}")
      val matched = rows.filter(r => r.getLong(0) == 20L)
      assert(matched.length == 1 && matched.head.getLong(1) == 10L)
    } finally q.stop()
  }

  test("FULL OUTER stream-stream join null-pads both sides after the " +
    "watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = StreamingOps.clickPurchaseFullJoin(
      clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_full_out").start()
    try {
      // matched pair (user 1); unmatched purchase (user 2); unmatched
      // click (user 3)
      clicks.addData(
        Event(10L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 0),
        Event(11L, Timestamp.valueOf("2024-01-01 10:00:00"), 3L, "click", 0))
      purchases.addData(
        Event(20L, Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 0),
        Event(21L, Timestamp.valueOf("2024-01-01 10:30:00"), 2L, "purchase", 0))
      q.processAllAvailable()
      // push the watermark far forward on both sides, twice, so state
      // for all three users finalizes
      for (h <- Seq("14:00:00", "15:00:00")) {
        clicks.addData(
          Event(90L, Timestamp.valueOf(s"2024-01-01 $h"), 9L, "click", 0))
        purchases.addData(
          Event(91L, Timestamp.valueOf(s"2024-01-01 $h"), 8L, "purchase", 0))
        q.processAllAvailable()
      }
      val rows = spark.table("ssjoin_full_out").collect()
      def one(p: java.lang.Long, c: java.lang.Long): Int = rows.count(r =>
        (if (p == null) r.isNullAt(0) else !r.isNullAt(0) && r.getLong(0) == p) &&
          (if (c == null) r.isNullAt(1) else !r.isNullAt(1) && r.getLong(1) == c))
      assert(one(20L, 10L) == 1, s"matched pair: ${rows.mkString}")
      assert(one(21L, null) == 1, s"unmatched purchase: ${rows.mkString}")
      assert(one(null, 11L) == 1, s"unmatched click: ${rows.mkString}")
    } finally q.stop()
  }

  test("checkpoint recovery resumes offsets and aggregate state across a restart") {
    import java.nio.file.{Files, Paths}
    val src = Files.createTempDirectory("events_ckpt_src").toString
    val ckptRows = Files.createTempDirectory("events_ckpt_rows").toString
    val ckptAgg = Files.createTempDirectory("events_ckpt_agg").toString
    val all = eventsBatch
    def stage(half: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory(s"stage_$name").toString
      half.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(src, s"$name.parquet"))
    }
    stage(all.filter(col("event_id") % 2 === 0), "half1")

    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    def runOnce(): Unit = {
      // two queries over the same source dir, each resuming from its
      // own checkpoint: a row counter (proves offset resume — a
      // restart must NOT redeliver already-committed files) and a
      // complete-mode aggregation (proves the state store restores)
      val stream = spark.readStream.schema(all.schema).parquet(src)
      val qRows = stream.writeStream
        .option("checkpointLocation", ckptRows)
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
           _: Long) => seen.addAndGet(df.count()); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      val qAgg = stream
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.option("checkpointLocation", ckptAgg)
        .outputMode("complete").format("memory")
        .queryName("ckpt_agg")
        .trigger(Trigger.AvailableNow()).start()
      try { qRows.processAllAvailable(); qAgg.processAllAvailable() }
      finally { qRows.stop(); qAgg.stop() }
    }

    runOnce()
    val half1Rows = all.filter(col("event_id") % 2 === 0).count()
    assert(seen.get() == half1Rows, "first run must see exactly half1")

    stage(all.filter(col("event_id") % 2 =!= 0), "half2")
    runOnce()
    assert(seen.get() == all.count(),
      s"restart redelivered committed rows: saw ${seen.get()}")
    val recovered = spark.table("ckpt_agg").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = all.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(recovered == expected,
      s"post-restart aggregate state diverged: $recovered vs $expected")
  }

  test("arrow streaming sink lands micro-batches the batch reader scans") {
    val out = java.nio.file.Files.createTempDirectory("arrow_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("arrow_ckpt").toString
    val q = eventsStream
      .select(col("event_id"), col("user_id"), col("event_type"))
      .writeStream.format("arrow")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(out)
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.format("arrow").load(out)
    val a = eventsBatch.select(col("event_id"), col("user_id"),
      col("event_type"))
    assert(back.count() == a.count())
    assert(a.exceptAll(back).isEmpty && back.exceptAll(a).isEmpty)
    // and the streamed files carry the same footer stats as batch
    // writes: COUNT over the sink directory stays metadata-only
    val agg = spark.read.format("arrow").load(out)
      .agg(count(lit(1)).as("n"))
    val before = graft.sources.arrow.ArrowDataSource
      .recordBatchesLoaded.get()
    assert(agg.collect()(0).getLong(0) == a.count())
    assert(graft.sources.arrow.ArrowDataSource
      .recordBatchesLoaded.get() == before)
  }

  test("arrow streaming source discovers only new files across restarts") {
    val src = java.nio.file.Files.createTempDirectory("arrow_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("arrow_sck").toString
    val first = eventsBatch.filter(col("event_id") < 500)
      .select(col("event_id"), col("user_id"))
    val second = eventsBatch.filter(col("event_id") >= 500)
      .select(col("event_id"), col("user_id"))
    first.write.format("arrow").mode("overwrite").save(src)

    // the memory sink refuses checkpoint recovery, so drain through
    // the arrow sink and count the landed rows after each restart
    val out = java.nio.file.Files.createTempDirectory("arrow_sout").toString
    def drain(): Long = {
      val q = spark.readStream.format("arrow").load(src)
        .writeStream.format("arrow")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(out)
      try q.processAllAvailable() finally q.stop()
      spark.read.format("arrow").load(out).count()
    }
    assert(drain() == first.count())
    // append more files; a restarted stream on the same checkpoint
    // must process ONLY the delta (the offset is the seen file set)
    second.write.format("arrow").mode("append").save(src)
    assert(drain() == first.count() + second.count(),
      "restart re-read already-committed files or missed the delta")
  }

  test("arrow-to-arrow streaming pipeline round-trips") {
    val src = java.nio.file.Files.createTempDirectory("a2a_src").toString
    val out = java.nio.file.Files.createTempDirectory("a2a_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("a2a_ck").toString
    eventsBatch.select(col("event_id"), col("event_type"), col("value"))
      .write.format("arrow").mode("overwrite").save(src)
    val q = spark.readStream.format("arrow").load(src)
      .filter(col("event_type") === "click")
      .writeStream.format("arrow")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start(out)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.format("arrow").load(out)
    val expected = eventsBatch
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("event_type"), col("value"))
    assert(got.count() == expected.count())
    assert(expected.exceptAll(got).isEmpty && got.exceptAll(expected).isEmpty)
  }

  test("arrow sink rejects complete output mode instead of duplicating") {
    val out = java.nio.file.Files.createTempDirectory("arrow_cm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("arrow_cmc").toString
    val agg = eventsStream.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
    val e = intercept[Exception] {
      val q = agg.writeStream.format("arrow")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start(out)
      try q.processAllAvailable() finally q.stop()
    }
    // the epoch protocol is append-only; complete mode would re-land
    // the whole snapshot every trigger — fail fast, not duplicate
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage)
        .exists(_.contains("append-only"))),
      s"unexpected failure: $e")
  }

  test("foreachBatch sink delivers every row exactly once across batches") {
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = eventsStream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.addAndGet(df.count()); batches.incrementAndGet(); ()
      }
      .trigger(Trigger.AvailableNow()).start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.get() == eventsBatch.count())
    assert(batches.get() >= 1)
  }

  test("streaming ingest dedup: each micro-batch probes the maintained " +
      "band index for near-dup candidates, then appends its own bands") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val cut = maxId * 8L / 10L // base 80%, stream the last 20% in epochs

    val src = java.nio.file.Files
      .createTempDirectory("stream_dedup_src").toString
    val index = java.nio.file.Files
      .createTempDirectory("stream_dedup_idx").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("stream_dedup_ckpt").toString
    // base corpus; the index starts EMPTY (schema-only seed) and is
    // built by the maintenance loop itself — the snapshot epoch streams
    // the base docs as the first micro-batch
    docs.filter(col("doc_id") < cut).coalesce(2)
      .write.format("arrow").mode("overwrite").save(src)
    graft.sources.arrow.ArrowDataSource.initTableLog(src)
    graft.queries.DedupQueries.bandsOf(spark, docs.limit(0))
      .coalesce(1).write.format("arrow").mode("overwrite").save(index)

    // the ingest: two later epochs of new docs
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.arrow.GraftCatalog].getName)
    val mid = cut + (maxId - cut) / 2
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("arrow").load(src)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            _: Long) =>
          val newBands = graft.queries.DedupQueries
            .bandsOf(spark, batch.select(col("doc_id"), col("text")))
            .persist()
          val idx = spark.read.format("arrow").load(index)
          // candidates: new×index ∪ new×new — old×old never re-examined
          val cross = newBands.as("x").join(idx.as("y"),
              col("x.band") === col("y.band") &&
                col("x.sig") === col("y.sig") &&
                col("x.doc_id") =!= col("y.doc_id"))
            .select(least(col("x.doc_id"), col("y.doc_id")).as("d1"),
              greatest(col("x.doc_id"), col("y.doc_id")).as("d2"))
          val self = newBands.as("x").join(newBands.as("y"),
              col("x.band") === col("y.band") &&
                col("x.sig") === col("y.sig") &&
                col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          found ++= cross.unionByName(self).distinct().collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          // maintenance: the batch's bands join the index
          newBands.write.format("arrow").mode("append").save(index)
          newBands.unpersist(); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    drain() // snapshot epoch: the base corpus itself streams first
    val baseFound = found.toSet // pairs found while draining the base
    spark.sql(s"INSERT INTO graft.arrow.`$src` " +
      s"SELECT doc_id, text FROM parquet.`$sf/documents.parquet` " +
      s"WHERE doc_id >= $cut AND doc_id < $mid")
    drain()
    spark.sql(s"INSERT INTO graft.arrow.`$src` " +
      s"SELECT doc_id, text FROM parquet.`$sf/documents.parquet` " +
      s"WHERE doc_id >= $mid")
    drain()

    // ground truth: the full-corpus band-collision pair set
    val all = graft.queries.DedupQueries.bandsOf(spark, docs).persist()
    val expected = all.as("x").join(all.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.toSet == expected,
      s"streamed candidates diverge from one-shot: missing " +
        s"${expected -- found}, extra ${found.toSet -- expected}")
    assert((found.toSet -- baseFound)
      .forall { case (_, d2) => d2 >= cut },
      "a post-base epoch surfaced a pair not touching its batch")
    // the maintained index converged to the full band table
    val finalIdx = spark.read.format("arrow").load(index)
    assert(finalIdx.count() == all.count(),
      "maintained index lost or duplicated band rows")
    all.unpersist(); ()
  }
}
