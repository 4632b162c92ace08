package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.10 extension): the reference is
  * strictly batch, so streaming is additive — the same events schema flows
  * through `readStream` with watermarked tumbling windows and custom
  * sessionization state.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * horizon; sessionization state is per-user and evicted via processing-time
  * timeout. Both shuffle once on their grouping key per micro-batch.
  */
object EventsStream {

  /** events schema as written by the batch engine (µs timestamps). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling-window counts/sums per event type. */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Fns.sumExact(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Watermarked tumbling-window activity per user — the state side of a
    * streaming "trending keys" top-k. Ranking cannot run inside an update
    * stream (no sorts mid-stream); the serving query ranks the
    * materialized aggregate, which is the standard split: the stream
    * maintains per-(window, key) counts, the top-k cut is a window
    * function at read time. State is watermark-bounded ONLY in
    * `update`/`append` output modes, where closed windows evict — the
    * production serving shape is `update` into a changelog-consuming sink
    * (e.g. an upserting store keyed on (window, user)). The `stream_topk`
    * gate instead runs `complete` mode over a bounded replay, where Spark
    * ignores the watermark for eviction and retains every window ever
    * seen — fine for a finite replay into a memory sink, NOT the at-scale
    * deployment mode. */
  def trendingAgg(events: DataFrame, window_ : String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("user_id"), col("n"))

  /** Watermarked SLIDING-window counts/sums per event type: each event
    * lands in size/slide windows (bounded fan-out), state bounded by the
    * watermark horizon exactly as [[tumblingAgg]]. */
  def slidingAgg(events: DataFrame, window_ : String = "1 hour",
                 slide: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.functions.Fns.sumExact(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming exact dedup on event_id: state bounded by the watermark
    * horizon (`dropDuplicatesWithinWatermark`) — the streaming analog of
    * the batch engine's hash dedup (S7). */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, n_events: Int, start: Timestamp,
                     end: Timestamp, total_value: Double)
  // public: the state-store encoder's generated code must reach the class
  // and its accessors (a private nested case class fails codegen compile
  // in the real streaming path — only batch-shaped execution tolerates it)
  case class SessionState(nEvents: Int, startMs: Long, endMs: Long,
                          total: Double)

  /** Pure per-batch state transition: merge a batch of one user's events
    * into the open session, emitting sessions closed by a gap break.
    * Factored out of the streaming closure so the cross-batch semantics —
    * in particular that a LATE event must never move the session end
    * backwards (min/max, not assignment) — are directly unit-testable. */
  private[graft] def mergeEvents(userId: Long, batch: Seq[Event],
                                 prior: Option[SessionState], gapMs: Long)
      : (Option[SessionState], Seq[Session]) = {
    var cur = prior
    val out = Seq.newBuilder[Session]
    // null-ts events are dropped (a poison pill would wedge the stream:
    // the failing micro-batch replays from the checkpoint forever)
    batch.filter(_.ts != null).sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t < s.startMs - gapMs =>
          // a straggler older than the open session's own gap horizon
          // belongs to a DIFFERENT (earlier) session; emit it as its own
          // singleton rather than stretching the open session across the
          // silence hole (heuristic: the earlier session can no longer be
          // reassembled once its state was closed)
          out += Session(userId, 1, e.ts, e.ts, e.value)
        case Some(s) if t - s.endMs <= gapMs =>
          cur = Some(s.copy(nEvents = s.nEvents + 1,
            startMs = math.min(s.startMs, t),
            endMs = math.max(s.endMs, t),
            total = s.total + e.value))
        case Some(s) =>
          out += Session(userId, s.nEvents, new Timestamp(s.startMs),
            new Timestamp(s.endMs), s.total)
          cur = Some(SessionState(1, t, t, e.value))
        case None =>
          cur = Some(SessionState(1, t, t, e.value))
      }
    }
    (cur, out.result())
  }

  /** Batch-mode sessionization — the same gap-break semantics as
    * [[sessionize]], INCLUDING sessions still open at end-of-input: the
    * flush `Trigger.AvailableNow` cannot deliver, because a bounded run
    * stops when input drains, before processing-time timeouts ever fire.
    * This is the operator for one-shot backfills; the stateful stream is
    * for continuous input.
    *
    * Plan shape: one shuffle on user_id; the lag/gap-break window, the
    * cumulative session counter, and the final aggregate all reuse that
    * hash partitioning (HashPartitioning(user_id) satisfies the
    * (user_id, session_seq) clustering), so it is one exchange total, at
    * any scale. Semantics notes:
    *  - null-ts events are dropped, exactly like [[mergeEvents]];
    *  - the straggler-singleton rule in [[mergeEvents]] cannot trigger on a
    *    fully sorted partition, so batch output == replaying all of a
    *    user's events through the state transition in one sorted batch
    *    (StreamingSpec pins this equivalence);
    *  - `total_value` goes through the exact decimal carrier so the result
    *    is partitioning- and order-independent. */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .filter(col("ts").isNotNull)
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__brk", when(col("__prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev_ts")) > gapMs * 1000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        graft.functions.Fns.sumExact(col("value")).as("total_value"))
  }

  /** Stream-stream interval join: pair each left-side event with the same
    * user's right-side events inside `(l_ts, l_ts + maxGap]` — e.g. clicks
    * to the purchases they led to (strictly-after excludes the self-pair
    * degenerate when both sides derive from one stream). The SAME plan
    * serves batch frames (ordinary join, range predicate applied after the
    * user_id equi-match) and streaming frames: with both sides
    * watermarked, the time-range condition is what BOUNDS the join state —
    * Spark evicts buffered rows older than `watermark + maxGap`, so state
    * is the per-user traffic of one gap horizon, not the stream's history.
    * An unbounded-condition stream-stream join would grow state forever;
    * this is the only interval-join shape that survives a continuous
    * 100 TB/day stream. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   maxGap: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("__ru"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
    l.join(r, col("user_id") === col("__ru") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("user_id"), col("l_id"), col("r_id"), col("l_ts"), col("r_ts"))
  }

  /** LEFT-OUTER stream-stream interval join: matched pairs emit
    * immediately like [[intervalJoin]]; an UNMATCHED left row emits with
    * null right columns only once the watermark proves no future right
    * row can still match it (its join window has closed) — the
    * production pattern for "click with no purchase within the hour"
    * alerting. State is watermark-bounded on both sides exactly as in
    * the inner join; the null emission is the state EVICTION, so on a
    * bounded AvailableNow replay the emitted null set is the
    * deterministic subset of unmatched left rows whose window end is
    * below the run's final watermark (the same finalization contract
    * stream_append_finalize pins for append-mode windows) — trailing
    * unmatched rows stay in state awaiting a watermark that never
    * comes. */
  def intervalJoinOuter(left: DataFrame, right: DataFrame,
                        maxGap: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("l_id"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermark)
      .select(col("user_id").as("__ru"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
    l.join(r, col("user_id") === col("__ru") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGap"),
        "leftOuter")
      .select(col("user_id"), col("l_id"), col("r_id"), col("l_ts"),
        col("r_ts"))
  }

  /** Custom stateful sessionization: a user's events belong to one session
    * until `gapMs` of silence; emitted when a later event breaks the gap or
    * on processing-time timeout.
    *
    * Note on bounded runs: with `Trigger.AvailableNow` the query stops when
    * input drains, BEFORE timeouts fire, so sessions still open at
    * end-of-input stay in the state store; they are emitted by the next run
    * against the same checkpoint. For a one-shot bounded input, use
    * [[sessionizeBatch]], which emits end-of-input sessions.
    *
    * `timeoutOnIdle=false` disables the idle-flush entirely (NoTimeout):
    * sessions are emitted ONLY when a later event breaks the gap. That is
    * the right mode for bounded replays — a ProcessingTimeTimeout under
    * `AvailableNow` keeps the drained query alive spinning empty wall-clock
    * micro-batches against the state store (measured: a seconds-long sf0.01
    * run became minutes of state-store churn), for a flush that could only
    * fire 30 wall-clock minutes later anyway. */
  // ---- streaming as-of enrichment ----------------------------------

  /** Union-tagged input row: side 0 = right/click, side 1 = left/purchase;
    * `tie` orders right rows sharing a timestamp; `a` is the row's own id,
    * `v` its value. Top-level case class for state-codegen (see
    * [[SessionState]] note). */
  case class AsofEvent(user_id: Long, ts: Timestamp, side: Int, tie: Long,
                       a: Long, v: Option[Double])

  /** O(1) per-key state: the latest right row seen so far. */
  case class AsofState(clickId: Long, clickValue: Option[Double])

  case class Enriched(event_id: Long, user_id: Long, value: Option[Double],
                      click_id: Option[Long], click_value: Option[Double])

  /** Streaming as-of enrichment — the streaming form of
    * [[graft.operators.AsofJoin]]'s backward join: each purchase is
    * enriched with the latest click at-or-before its event time for the
    * same user.
    *
    * State is O(1) per user — the single latest click, NOT a buffer of
    * rows: within a micro-batch each group replays the batch operator's
    * union+window walk (sort by (ts, side, tie); clicks advance the
    * running-last state, purchases emit against it), and the state row
    * carries the walk across micro-batches. Tie semantics match the batch
    * plan exactly: at equal ts the click applies first (`<=`, side 0
    * sorts before side 1), and among clicks sharing a ts the largest tie
    * wins (last in ascending tie order).
    *
    * Ordering ACROSS micro-batches follows source arrival order — exact
    * under the one-file AvailableNow replay the gate drives, and exact in
    * any deployment whose batches respect event time; a continuous
    * deployment with out-of-order arrival puts a watermark-bounded
    * reorder buffer in front (same caveat as [[sessionize]]). A late
    * click cannot retro-correct an already-emitted purchase — the
    * streaming trade this operator makes explicit. */
  def streamAsofEnrich(tagged: Dataset[AsofEvent]): Dataset[Enriched] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[AsofEvent],
         state: GroupState[AsofState]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Enriched]
          val ordered = rows.toSeq.sortWith { (x, y) =>
            val c = x.ts.compareTo(y.ts)
            if (c != 0) c < 0
            else if (x.side != y.side) x.side < y.side
            else x.tie < y.tie
          }
          ordered.foreach { e =>
            if (e.side == 0) last = Some(AsofState(e.a, e.v))
            else out += Enriched(e.a, userId, e.v,
              last.map(_.clickId), last.flatMap(_.clickValue))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** DuckDB oracle for the `stream_asof_join` gate:
    * [[graft.operators.AsofJoin.oracleSql]] restricted to timestamped
    * purchases — the stream processes only rows that carry an event time
    * (clicks are already so filtered on both sides). */
  val streamAsofOracleSql: String = {
    val marker = "FROM events WHERE event_type = 'purchase'"
    val base = graft.operators.AsofJoin.oracleSql
    require(base.contains(marker),
      "as-of oracle shape changed; update streamAsofOracleSql")
    base.replace(marker, marker + " AND ts IS NOT NULL")
  }

  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 timeoutOnIdle: Boolean = true): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (timeoutOnIdle) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.nEvents,
              new Timestamp(s.startMs), new Timestamp(s.endMs), s.total))
          } else {
            val (cur, closed) =
              mergeEvents(userId, rows.toSeq, state.getOption, gapMs)
            cur.foreach { s =>
              state.update(s)
              if (timeoutOnIdle) state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }
}
