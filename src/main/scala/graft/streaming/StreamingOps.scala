package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming surface (SURVEY.md §2b "Streaming"): the same transforms
  * run on a batch DataFrame (oracle-checkable; Spark guarantees
  * batch/stream semantic parity for these operators) and on
  * `readStream` sources (exercised in ScalaTest with file-backed
  * micro-batches).
  *
  * Scale notes: every aggregation below keys on (window/user) so state
  * is hash-partitioned across executors; watermarks bound state size —
  * without one, 100 TB of stream history accumulates in the state
  * store. `transformWithState`-style custom logic is shown with
  * `flatMapGroupsWithState` + explicit timeout so sessions get evicted.
  */
object StreamingOps {

  /** Tumbling 1-hour windows per event type. */
  def tumblingCounts(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes")
    else events
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_value"))
  }

  /** Sliding 1-hour windows every 15 minutes, per event type. */
  def slidingCounts(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes")
    else events
    src.groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))
  }

  /** Session windows with a 30-minute gap, per user. */
  def sessionCounts(events: DataFrame, withWatermark: Boolean): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes")
    else events
    src.groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"))
  }

  /** Session windows with a DYNAMIC per-event gap (Spark 3.2+
    * `session_window(ts, gapExpr)`): a purchase holds its session open
    * for 60 minutes, a click for 15, anything else 30 — the
    * engagement-dependent timeout real clickstream sessionization
    * uses. Windows are [ts, ts+gap) per event, merged on overlap, so
    * the running-MAX end governs (not the previous event's gap alone
    * — the batch oracle mirrors this with a running-max
    * gaps-and-islands). */
  def sessionCountsDynamic(events: DataFrame, withWatermark: Boolean)
      : DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "10 minutes")
    else events
    val gap = when(col("event_type") === "purchase", lit("60 minutes"))
      .when(col("event_type") === "click", lit("15 minutes"))
      .otherwise(lit("30 minutes"))
    src.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("session_start"), col("user_id"), col("n"))
  }

  /** Stateful dedup by event_id within the watermark horizon. The
    * within-watermark variant exists only for streams (state eviction
    * is its whole point); on a batch input the same contract is plain
    * dropDuplicates — the one transform serves both the declared
    * batch-parity query (`stream_dedup`) and StreamingSpec's
    * micro-batch execution. */
  def dedupWithinWatermark(events: DataFrame): DataFrame = {
    val wm = events.withWatermark("ts", "10 minutes")
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark("event_id")
    else wm.dropDuplicates("event_id")
  }

  /** The shared stream-stream interval-join body: each purchase
    * matched to the same user's clicks in the preceding hour. Both
    * sides carry watermarks and the join condition time-bounds the
    * match, so Spark can evict click state once the watermark passes
    * click-ts + 1h — without the bound, the click side's state grows
    * with the whole stream. The coalesce on user_id is a no-op for
    * inner/left (the purchase side is always present there) and the
    * correct fill for full outer. Works identically on batch inputs
    * (each variant's declared oracle). */
  private def clickPurchaseJoinOf(joinType: String)(
      clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("p_ts"))
    p.join(c,
      col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("purchase_id"), col("click_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"))
  }

  /** Inner stream-stream interval join (see [[clickPurchaseJoinOf]]). */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame = clickPurchaseJoinOf("inner")(clicks, purchases)

  /** LEFT OUTER variant: every purchase emits — once per matching
    * click, or once with a NULL click_id. Outer emission is
    * WATERMARK-DRIVEN: the null row is released only after the
    * watermark proves no matching click can still arrive (emitting
    * earlier could require a retraction append mode cannot express),
    * and the state store evicts on the same time bound as the inner
    * join. */
  def clickPurchaseLeftJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame = clickPurchaseJoinOf("left_outer")(clicks, purchases)

  /** FULL OUTER variant: both unmatched purchases AND unmatched clicks
    * emit null-padded once the watermark closes their join window —
    * the audit shape ("every click and every purchase, matched where
    * possible"). */
  def clickPurchaseFullJoin(clicks: DataFrame, purchases: DataFrame)
      : DataFrame = clickPurchaseJoinOf("full_outer")(clicks, purchases)

  /** Stream-static dimension enrichment: events joined to a static
    * customer dimension, rolled up per nation. The static side is
    * re-planned on every micro-batch and — being a dimension —
    * broadcast, the standard streaming enrichment shape: at scale the
    * dim is a catalog table the batch planner prunes/broadcasts as
    * usual, and no state store is involved (unlike stream-stream
    * joins, a static side needs no watermark or eviction). The sum is
    * the exact-decimal formulation so the batch declaration
    * (`stream_enrich`) hash-matches the DuckDB oracle; StreamingSpec
    * runs the SAME transform over readStream micro-batches. */
  def customerEnrich(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
        broadcast(customers.select(col("c_custkey"), col("c_nationkey"))),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
      .select(col("c_nationkey").as("nation"), col("n"), col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessState(n_events: Int, total_value: Double,
      last_ts_ms: Long)
  final case class SessionSummary(user_id: Long, n_events: Int,
      total_value: Double)

  /** Gap between a user's last event and session eviction. */
  val SessionGapMs: Long = 30L * 60 * 1000

  final case class ChainState(lastViewSec: Long, lastQualClickSec: Long)
  final case class ChainMatch(user_id: Long, event_id: Long)

  /** Streaming twin of the batch `events_pattern` query: per-user
    * view→click→purchase chain detection with a per-step window,
    * carried as TWO LONGS of state per user (the latest view time and
    * the latest QUALIFIED click time) — the same carry-forward
    * semantics the batch window formulation computes, so results
    * agree when events arrive in order (StreamingSpec pins this
    * equality). Rows within a micro-batch are sorted by
    * (ts, event_id) before folding (arrival order is not event
    * order); cross-batch ordering is the watermark contract every
    * streaming sequence detector lives by. State is O(1) per user and
    * never grows with history — the property that lets this run
    * against an unbounded 100 TB clickstream. */
  def patternChains(events: Dataset[Event],
      windowSec: Long = 86400L): Dataset[ChainMatch] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[ChainState, ChainMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event],
            state: GroupState[ChainState]) =>
          val st0 = state.getOption.getOrElse(ChainState(-1L, -1L))
          val (st, out) = foldChain(uid, st0, rows, windowSec)
          state.update(st)
          out.iterator
      }
  }

  /** The per-batch chain fold shared by the flatMapGroupsWithState and
    * transformWithState detectors — one definition, so the two state
    * backends can never drift semantically. Rows sort by
    * (ts, event_id) before folding (arrival order is not event
    * order). */
  private def foldChain(uid: Long, st0: ChainState,
      rows: Iterator[Event], windowSec: Long)
      : (ChainState, Seq[ChainMatch]) = {
    var st = st0
    val out = scala.collection.mutable.ArrayBuffer.empty[ChainMatch]
    rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val sec = Math.floorDiv(e.ts.getTime, 1000L)
      e.event_type match {
        case "view" => st = st.copy(lastViewSec = sec)
        case "click" if st.lastViewSec >= 0 &&
            sec - st.lastViewSec <= windowSec =>
          st = st.copy(lastQualClickSec = sec)
        case "purchase" if st.lastQualClickSec >= 0 &&
            sec - st.lastQualClickSec <= windowSec =>
          out += ChainMatch(uid, e.event_id)
        case _ => ()
      }
    }
    (st, out.toSeq)
  }

  /** The pattern-chain detector on Spark 4's transformWithState API:
    * the SAME two-longs-per-user carry as [[patternChains]] (shared
    * [[foldChain]]), held in a typed ValueState on the RocksDB state
    * store — the larger-than-heap state path. flatMapGroupsWithState
    * keeps every group's state on the executor heap; transformWithState
    * requires RocksDBStateStoreProvider, whose per-key state lives
    * off-heap and spills to local disk with changelog checkpointing —
    * at 100 TB clickstream scale, user cardinality is bounded by
    * executor DISK, not heap — and, with the event-time timer below,
    * by ACTIVE users, not lifetime users.
    *
    * State TTL: each batch (re)arms ONE event-time timer per user at
    * last-activity + window; when the watermark passes it, the carry
    * is cleared. Eviction is LOSSLESS under the watermark contract:
    * any event the cleared carry could still have qualified
    * (sec - lastSec ≤ window) carries an event time below the
    * watermark that fired the timer, so the stream would have dropped
    * it as late anyway. Without this, a 100 TB clickstream's user
    * cardinality grows the RocksDB store without bound — spilled,
    * but never reclaimed. */
  class ChainProcessor(windowSec: Long)
      extends StatefulProcessor[Long, Event, ChainMatch] {
    @transient private var state: ValueState[ChainState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ChainState](
        "chain", Encoders.product[ChainState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[ChainMatch] = {
      val st0 = if (state.exists()) state.get() else ChainState(-1L, -1L)
      val (st, out) = foldChain(uid, st0, rows, windowSec)
      val lastSec = math.max(st.lastViewSec, st.lastQualClickSec)
      if (lastSec >= 0) {
        state.update(st)
        // re-arm the eviction timer at last-activity + window: delete
        // any prior timer first so each user holds exactly one
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        getHandle.registerTimer((lastSec + windowSec) * 1000L)
      } else {
        // an EMPTY carry (only purchases / unqualified clicks /
        // unknown types folded) is identical to absent state — storing
        // it would leak an untimered RocksDB entry per such user
        // forever, the exact unbounded growth the timer exists to stop
        state.clear()
      }
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ChainMatch] = {
      // the timer is always the LATEST one armed (prior ones are
      // deleted on every batch), so firing means the watermark passed
      // this user's last activity + window — the carry is dead weight
      state.clear()
      Iterator.empty
    }
  }

  /** transformWithState wiring for [[ChainProcessor]]. The watermark
    * is applied HERE (event-time timers require one); `lateness` is
    * the out-of-orderness bound the caller's stream tolerates. */
  def twsPatternChains(events: Dataset[Event],
      windowSec: Long = 86400L,
      lateness: String = "0 seconds"): Dataset[ChainMatch] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new ChainProcessor(windowSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Arbitrary stateful processing: per-user session summaries via
    * flatMapGroupsWithState with an event-time timeout — the session
    * closes (and its state is evicted) once the watermark passes
    * last-event + gap. Event-time timeout + watermark is what keeps
    * state bounded when replaying 100 TB of history: eviction tracks
    * data time, not wall-clock. Input must carry a watermark on `ts`. */
  def statefulSessions(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => SessionSummary(userId, s.n_events, s.total_value))
              .iterator
            state.remove()
            out
          } else {
            val prev = state.getOption.getOrElse(SessState(0, 0.0, 0L))
            var n = prev.n_events
            var v = prev.total_value
            var last = prev.last_ts_ms
            rows.foreach { e =>
              n += 1; v += e.value; last = math.max(last, e.ts.getTime)
            }
            state.update(SessState(n, v, last))
            state.setTimeoutTimestamp(last + SessionGapMs)
            Iterator.empty
          }
      }
  }

  /** The same session summary on Spark 4's transformWithState API
    * (typed ValueState + explicit event-time timers — the
    * arbitrary-state surface that supersedes flatMapGroupsWithState;
    * requires the RocksDB state store provider). A session emits when
    * the timer registered for last-event + gap fires; stale timers from
    * earlier batches are recognized and ignored by comparing the expiry
    * against the current state. */
  class SessionProcessor
      extends StatefulProcessor[Long, Event, SessionSummary] {
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState](
        "session", Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionSummary] = {
      val prev = if (state.exists()) state.get() else SessState(0, 0.0, 0L)
      var n = prev.n_events
      var v = prev.total_value
      var last = prev.last_ts_ms
      rows.foreach { e =>
        n += 1; v += e.value; last = math.max(last, e.ts.getTime)
      }
      state.update(SessState(n, v, last))
      getHandle.registerTimer(last + SessionGapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] =
      if (!state.exists()) Iterator.empty
      else {
        val s = state.get()
        // only the timer matching the CURRENT session end closes it;
        // earlier registrations are stale.
        if (expiredTimerInfo.getExpiryTimeInMs() < s.last_ts_ms + SessionGapMs)
          Iterator.empty
        else {
          state.clear()
          Iterator(SessionSummary(userId, s.n_events, s.total_value))
        }
      }
  }

  /** transformWithState wiring for [[SessionProcessor]]. */
  def twsSessions(events: Dataset[Event]): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
