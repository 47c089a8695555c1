package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch request/response only (SURVEY §2.4
  * "Streaming: none") — this module is beyond-parity surface for the
  * continuous-ingest half of a training-data pipeline. All transforms
  * are expressed on an unbounded DataFrame: the SAME code runs in batch
  * mode (tests feed a MemoryStream and a static frame interchangeably).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min is dropped, state evicted); sessionization
  * state is per-user and evicted on timeout, so state size tracks
  * active users, not history.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event_type with a 10-minute
    * watermark — the canonical `readStream → window agg → sink` shape.
    */
  def windowedTypeCounts(events: DataFrame,
                         window: String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(sessionStart: Long, lastSeen: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
                              n_events: Long)

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): a session closes when a user's next
    * event arrives more than `gapSeconds` later. The custom-state
    * analog of the batch window-function sessionizer in SparkEntry.q23.
    *
    * `evictAfterSeconds = Some(n)` additionally closes + evicts idle
    * users via processing-time timeout — required for unbounded
    * key-spaces in production. The default (None) keeps open sessions
    * in state until their closing event arrives; note that the
    * timeout-enabled mode makes Spark's no-data trigger cycle
    * continuously (by design: timeouts need checking), so tests use
    * None.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 3600,
                 evictAfterSeconds: Option[Long] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (evictAfterSeconds.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](OutputMode.Append, timeoutConf) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (evictAfterSeconds.isDefined && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.sessionStart, s.lastSeen, s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { e =>
              val sec = e.ts.getTime / 1000
              cur match {
                case Some(s) if sec - s.lastSeen <= gapSeconds =>
                  cur = Some(s.copy(lastSeen = sec, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.sessionStart, s.lastSeen, s.nEvents)
                  cur = Some(SessionState(sec, sec, 1))
                case None =>
                  cur = Some(SessionState(sec, sec, 1))
              }
            }
            cur.foreach(state.update)
            evictAfterSeconds.foreach(t => state.setTimeoutDuration(t * 1000))
            closed.iterator
          }
      }
  }

  /** Streaming exact dedup on a fingerprint column:
    * `dropDuplicatesWithinWatermark` — duplicates of the same key are
    * dropped regardless of their event time (a producer retry seconds
    * later is still a duplicate), and state stays bounded by the
    * watermark horizon.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming GLOBAL exact dedup: first occurrence of each key ever
    * seen — semantically `SELECT DISTINCT keyCols` over the whole
    * stream, which is what makes it oracle-gateable (q94). State grows
    * with distinct keys (unbounded horizon); [[dedupStream]] is the
    * bounded-state scale path when a duplicate horizon exists.
    */
  def dedupStreamExact(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.dropDuplicates(keyCols)

  /** Watermarked stream–stream inner join: match right events to left
    * events of the same key within `withinSeconds` AFTER the left
    * event. Both sides carry watermarks and the join has a bounded
    * time-range predicate, so Spark can evict join state — without
    * both, stream-stream state grows forever.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
                       withinSeconds: Long = 600,
                       watermark: String = "10 minutes"): DataFrame =
    streamStreamJoinType(left, right, key, withinSeconds, watermark, "inner")

  /** Watermarked stream–stream LEFT OUTER join: same bounded-state
    * shape as [[streamStreamJoin]], but a left event with no match
    * emits once with null right columns WHEN the watermark passes
    * `l_ts + withinSeconds` — i.e. when the engine can prove no match
    * can still arrive. State eviction and outer-row completeness both
    * hang on that proof, which is why the gate (q134) must push the
    * watermark past every real row (sentinels) before comparing to the
    * batch left join.
    */
  def streamStreamLeftJoin(left: DataFrame, right: DataFrame, key: String,
                           withinSeconds: Long = 600,
                           watermark: String = "10 minutes"): DataFrame =
    streamStreamJoinType(left, right, key, withinSeconds, watermark, "left_outer")

  /** Watermarked stream–stream FULL OUTER join: both directions of the
    * outer guarantee at once — an unmatched left event emits with null
    * right columns when the watermark passes `l_ts + withinSeconds`,
    * and an unmatched right event emits with null LEFT columns when
    * the watermark passes `r_ts` (a right row's join window is
    * `[r_ts - within, r_ts]` in left-time, so its no-match proof needs
    * the left watermark past r_ts). Same bounded state as the inner
    * form; the key column is coalesced across sides since either may
    * be null-extended.
    */
  def streamStreamFullOuterJoin(left: DataFrame, right: DataFrame, key: String,
                                withinSeconds: Long = 600,
                                watermark: String = "10 minutes"): DataFrame =
    streamStreamJoinType(left, right, key, withinSeconds, watermark, "full_outer")

  /** Watermarked windowed DISTINCT-user counting via theta-sketch
    * state — the streaming form of the q144 sketch discipline: the
    * aggregation state per (window, type) is a mergeable sketch, not a
    * user set, so state size is O(sketch) however many distinct users
    * a window sees. Below the sketch's nominal entries the estimate is
    * EXACT, which is what lets the q157 gate pin the streamed result
    * against batch COUNT(DISTINCT) — at true scale the same plan
    * degrades gracefully to a bounded-error estimate instead of
    * unbounded state.
    */
  def windowedDistinctSketch(events: DataFrame, windowLen: String = "1 day",
                             watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(expr("theta_sketch_estimate(theta_sketch_agg(user_id))").as("ndv"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("ndv"))

  /** Stream–static enrichment join: each micro-batch of the streaming
    * side broadcast-joins a STATIC dimension — completely stateless
    * (no watermark, no join state; every stream row emits exactly
    * once, null-extended if its key is absent), and the static side
    * is re-resolved per batch, so a slowly-changing dimension picks
    * up updates between batches. The third stream-join shape next to
    * the watermarked stream–stream family: at 100 TB of stream this
    * is the plan for "attach user/document metadata on ingest" —
    * dimension broadcast, stream never shuffles.
    */
  def streamStaticEnrich(stream: DataFrame, dim: DataFrame,
                         key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream–stream LEFT SEMI join — the fourth watermarked join shape:
    * a left event is emitted (once, left columns only) iff a matching
    * right event lands inside the interval window; unmatched left rows
    * age out of state silently at the watermark. The streaming form of
    * "keep views that converted within 10 minutes" — at scale the
    * state and semantics of the inner join without materializing the
    * match multiplicity.
    */
  def streamStreamLeftSemiJoin(left: DataFrame, right: DataFrame, key: String,
                               withinSeconds: Long = 600,
                               watermark: String = "10 minutes"): DataFrame =
    streamStreamJoinType(left, right, key, withinSeconds, watermark, "left_semi")

  private def streamStreamJoinType(left: DataFrame, right: DataFrame,
                                   key: String, withinSeconds: Long,
                                   watermark: String, joinType: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("k"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("k"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    val joined = l.join(r,
      l("k") === r("k") &&
        r("r_ts") >= l("l_ts") &&
        r("r_ts") <= l("l_ts") + expr(s"INTERVAL $withinSeconds SECONDS"),
      joinType)
    if (joinType == "left_semi")
      // semi join exposes left columns only
      joined.select(col("k"), col("l_id"), col("l_ts"))
    else
      // coalesce: under full_outer either side may be null-extended;
      // for inner/left_outer l.k is always present so this is identity
      joined.select(coalesce(l("k"), r("k")).as("k"),
        col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  final case class CusumState(s: Long)
  final case class CusumOut(user_id: Long, event_id: Long, cusum: Long)

  /** Streaming one-sided CUSUM with explicit per-key state
    * (`flatMapGroupsWithState`) — the continuous-monitoring analog of
    * the batch [[graft.operators.TimeSeries.cusumFixed]]: state is ONE
    * long per user (the running statistic), each event emits its
    * updated value immediately. Exactly equals the batch fold when
    * events arrive in (ts, event_id) order (the stream-equals-batch
    * gate contract); integer arithmetic makes the equality hashable.
    * State is O(active users) — eviction hooks would mirror
    * [[sessionize]]'s timeout mode for unbounded key spaces.
    */
  def cusumStream(events: Dataset[Event], targetCents: Long): Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[CusumState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption.map(_.s).getOrElse(0L)
          val out = sorted.map { e =>
            val cents = math.round(e.value * 100)
            cur = math.max(0L, cur + cents - targetCents)
            CusumOut(userId, e.event_id, cur)
          }
          state.update(CusumState(cur))
          out.iterator
      }
  }

  final case class DistinctTypesOut(user_id: Long, event_id: Long, n_types: Long)

  /** Per-user running distinct-event-type count on Spark 4's
    * `transformWithState` arbitrary-state API — the ninth stream≡batch
    * stateful shape, and the first on the new `StatefulProcessor`
    * surface (the successor to `flatMapGroupsWithState`). State is a
    * `MapState[String, Boolean]`: ONE store entry per (user, type), so
    * a new type is a point insert — never a read-modify-write of a
    * whole serialized set blob, which is what makes the shape hold
    * when the per-key universe is large (distinct URLs/domains per
    * crawl source, not 5 event types). Requires the RocksDB state
    * store provider (the only one the API supports).
    */
  class DistinctTypesProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, DistinctTypesOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var seen: org.apache.spark.sql.streaming.MapState[String, Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState("seen", Encoders.STRING,
        Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[DistinctTypesOut] = {
      // event-time order within the batch; the store carries order
      // across batches
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var n = seen.keys().size.toLong // per-key type count: tiny by contract
      sorted.map { e =>
        if (!seen.containsKey(e.event_type)) {
          seen.updateValue(e.event_type, true)
          n += 1
        }
        DistinctTypesOut(key, e.event_id, n)
      }.iterator
    }
  }

  /** `transformWithState` wiring for [[DistinctTypesProcessor]]. */
  def distinctTypesStream(events: Dataset[Event]): Dataset[DistinctTypesOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new DistinctTypesProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  final case class TsEvent(event_id: Long, ts: java.sql.Timestamp,
                           user_id: Long, tu: Long)
  final case class TimerSessionState(start: Long, last: Long, n: Long)
  final case class TimerSessionOut(user_id: Long, session_start: Long,
                                   session_end: Long, n_events: Long)

  /** Gap sessionization with EVENT-TIME TIMERS on `transformWithState`
    * — the idle-user closure q72's `flatMapGroupsWithState` variant
    * gets only from a closing event or a processing-time timeout
    * (which no-data-cycles forever). Here the watermark itself fires
    * the close: each batch re-arms ONE timer at lastSeen + gap; when
    * the watermark passes it, `handleExpiredTimer` emits the session
    * and clears the state. In-batch gaps still close inline, so a
    * session is emitted exactly once either way. Session arithmetic is
    * exact micros carried in `tu` (the watermark column `ts` is only
    * for Spark's late-data accounting).
    */
  class TimerSessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TsEvent, TimerSessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => Encs}
    @transient private var st: org.apache.spark.sql.streaming.ValueState[TimerSessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState("sess",
        Encs.product[TimerSessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TsEvent],
                                 tv: TimerValues): Iterator[TimerSessionOut] = {
      val sorted = rows.toSeq.sortBy(e => (e.tu, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer[TimerSessionOut]()
      var cur = if (st.exists()) st.get() else null
      sorted.foreach { e =>
        if (cur == null) cur = TimerSessionState(e.tu, e.tu, 1L)
        else if (e.tu - cur.last > gapUs) {
          out += TimerSessionOut(key, cur.start, cur.last, cur.n)
          cur = TimerSessionState(e.tu, e.tu, 1L)
        } else
          // min/max guards: a CROSS-batch late event (allowed within
          // the watermark, inside the gap) must never regress the
          // session end — that would emit a wrong session_end and
          // re-arm the timer EARLY, closing the session prematurely —
          // nor miss extending the start backwards
          cur = TimerSessionState(math.min(cur.start, e.tu),
            math.max(cur.last, e.tu), cur.n + 1L)
      }
      if (cur != null) {
        st.update(cur)
        // one live timer per key: drop stale expiries, re-arm at the
        // new idle deadline (timer clock is epoch millis)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(cur.last / 1000L + gapUs / 1000L)
      }
      out.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[TimerSessionOut] = {
      if (st.exists()) {
        val cur = st.get(); st.clear()
        Iterator.single(TimerSessionOut(key, cur.start, cur.last, cur.n))
      } else Iterator.empty
    }
  }

  /** Event-time wiring for [[TimerSessionProcessor]]: the watermark on
    * `ts` both bounds late data and drives timer expiry.
    */
  def timerSessionStream(events: Dataset[TsEvent], gapSeconds: Long = 3600,
                         watermark: String = "10 minutes"): Dataset[TimerSessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapSeconds * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class Rolling3Out(user_id: Long, event_id: Long, sum_last3: Long)

  /** Rolling last-3 sum per user on `transformWithState` with
    * LISTSTATE — the third state primitive (q224 MapState, q234
    * ValueState+timers): the window's elements append/trim as list
    * entries, so state writes touch O(window) values and the store
    * never deserializes a monolithic blob. Emits the trailing-3 sum on
    * every event — the streaming twin of a ROWS BETWEEN 2 PRECEDING
    * frame.
    */
  class Rolling3Processor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TsEvent, Rolling3Out] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => Encs}
    // state = the ≤3 LATEST events BY EVENT TIME as (tsMillis, event_id,
    // value) triples — not bare values by arrival order. A cross-batch
    // late event (allowed within the watermark) then INSERTS at its
    // event-time position: every SUBSEQUENT window is exactly the
    // batch answer (the kept top-3-by-time set is correct inductively —
    // an event older than all three kept can be in no future window
    // either), and the late event's own emission sums the ≤3 events
    // at-or-before it that are still in state. The arrival-order
    // variant this replaces silently shifted every later window by one
    // slot — the same cross-batch ordering trap the TimerSession
    // max-clamp fix closed.
    @transient private var win: org.apache.spark.sql.streaming
      .ListState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      win = getHandle.getListState("win",
        Encs.tuple(Encs.scalaLong, Encs.scalaLong, Encs.scalaLong),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TsEvent],
                                 tv: TimerValues): Iterator[Rolling3Out] = {
      // event-time order (the q192 convention); `tu` carries the VALUE
      // being summed, not the clock
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = win.get().toVector // ≤ 3 triples, event-time ascending
      val out = sorted.map { e =>
        val trip = (e.ts.getTime, e.event_id, e.tu)
        cur = ((cur :+ trip).sortBy(t => (t._1, t._2))).takeRight(3)
        // the event's own window: the ≤3 kept events at-or-before it
        val upTo = cur.filter(t =>
          t._1 < trip._1 || (t._1 == trip._1 && t._2 <= trip._2))
        Rolling3Out(key, e.event_id, upTo.takeRight(3).map(_._3).sum)
      }
      win.clear()
      cur.foreach(win.appendValue)
      out.iterator
    }
  }

  /** `transformWithState` wiring for [[Rolling3Processor]]; carries
    * cents in the `tu` slot (the processor is value-agnostic).
    */
  def rolling3Stream(events: Dataset[TsEvent]): Dataset[Rolling3Out] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new Rolling3Processor,
        TimeMode.None(), OutputMode.Append())
  }
}
