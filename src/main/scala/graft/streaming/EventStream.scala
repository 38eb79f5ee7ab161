package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState,
  GroupStateTimeout,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  ValueState
}

/** Structured Streaming surface over the `events` stream. The reference is
  * batch-only (`/root/reference/mapreduce/manager/__main__.py:346-361` runs
  * every job to completion), so this is north-star scope: the same event
  * analytics as [[graft.queries.EventQueries]], expressed as streaming
  * transforms that also run unchanged on batch DataFrames — a green batch
  * correctness row certifies the shared expression logic, and the
  * MemoryStream specs certify watermark/state behavior.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (late data beyond 10 min is dropped, state for closed windows evicted);
  * sessionization state is per-user and evicted on timeout — both are the
  * standard shapes that hold at 1000-executor scale because state is
  * partitioned by group key across executors.
  */
object EventStream {

  /** Tumbling 1-hour windows per event type with a 10-minute watermark.
    * Works on both streaming and batch inputs (watermark is a no-op on
    * batch).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    windowedCounts(events, window(col("ts"), "1 hour"))

  /** The one windowed-count pipeline shared by [[hourlyCounts]] (tumbling)
    * and [[hoppingCounts]] (sliding) — the window spec is the only
    * difference, so the watermark/agg/output contract can't diverge.
    */
  private def windowedCounts(events: DataFrame, win: org.apache.spark.sql.Column): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(win.as("win"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Hopping (sliding) windows: 25-minute windows advancing every 10
    * minutes — Structured Streaming's native overlapping-window replication
    * (each event lands in ⌈25/10⌉ = 3 candidate windows, 2-3 surviving the
    * size bound). The window grid aligns to the epoch exactly like the
    * batch dual `q_events_hopping`'s integer arithmetic
    * (`floor(us/hop)·hop − k·hop`), so the StreamingSpec agreement test
    * can hold the two to the same answer. Watermark bounds the per-window
    * state as usual.
    */
  def hoppingCounts(events: DataFrame): DataFrame =
    windowedCounts(events, window(col("ts"), "25 minutes", "10 minutes"))

  /** Streaming exact dedup on event_id: duplicates arriving within the
    * watermark horizon are dropped, and — unlike plain dropDuplicates —
    * state for ids older than the watermark is evicted, so state size is
    * bounded by the horizon, not the stream's lifetime (the property that
    * matters for a training-data ingest pipeline running for months).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Built-in gap-based session windows (5-minute inactivity gap). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("win.start").as("session_start"), col("n_events"))

  /** One event as consumed by the typed stateful transform. */
  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

  /** Per-user running state for [[runningTotals]]. */
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via flatMapGroupsWithState: per-user running event
    * count and value total, emitted on every trigger with new data. State is
    * evicted 30 min of EVENT time after a user's last event (watermark-driven
    * EventTimeTimeout) — unlike a processing-time timeout this fires no
    * extra no-data micro-batches and scales with the watermark, not the
    * wall clock. The timeout branch emits NOTHING (flatMap, not map): the
    * final aggregate was already emitted when its last event arrived, so a
    * timeout re-emission would duplicate it for downstream consumers.
    */
  def runningTotals(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserAgg, UserAgg](
        OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout
      ) { (userId: Long, batch: Iterator[Event], state: GroupState[UserAgg]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val prev = state.getOption.getOrElse(UserAgg(userId, 0L, 0.0))
          var maxTs = 0L
          var n     = prev.n_events
          var v     = prev.total_value
          batch.foreach { e =>
            n += 1; v += e.value
            if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
          }
          val next = UserAgg(userId, n, v)
          state.update(next)
          state.setTimeoutTimestamp(maxTs + 30L * 60 * 1000)
          Iterator.single(next)
        }
      }
  }

  /** Spark 4 arbitrary-state v2: the same per-user running totals as
    * [[runningTotals]], expressed as a [[StatefulProcessor]] with typed
    * `ValueState` — the API that supersedes mapGroupsWithState (independent
    * typed state variables, timers, TTL eviction, and state-schema
    * evolution, all on the RocksDB state store).
    *
    * Eviction posture — DELIBERATE divergence from v1: this demo keeps
    * per-user state for the stream's lifetime (`TTLConfig.NONE`,
    * `TimeMode.None`). v2's TTL is processing-time only, and running the
    * query in `TimeMode.ProcessingTime` to enable it makes the stream
    * re-trigger for timer housekeeping instead of idling between data
    * batches (observed: `processAllAvailable` never returns under
    * MemoryStream). A production deployment that needs bounded state picks
    * one of: (a) this processor in ProcessingTime mode with
    * `TTLConfig(Duration.ofMinutes(30))` — correct under a real
    * always-on trigger, unsuitable for a drain-and-assert harness; or
    * (b) [[runningTotals]] (the v1 flatMapGroupsWithState form), whose
    * watermark-driven EVENT-time timeout both bounds state and idles
    * cleanly — which is why v1 remains the engine's recommended shape and
    * v2 here demonstrates the typed-state API surface only.
    */
  class RunningTotalsProcessor extends StatefulProcessor[Long, Event, UserAgg] {
    @transient private var agg: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[UserAgg]("agg", Encoders.product[UserAgg], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[Event],
        timerValues: TimerValues
    ): Iterator[UserAgg] = {
      val prev = if (agg.exists()) agg.get() else UserAgg(user, 0L, 0.0)
      var n    = prev.n_events
      var v    = prev.total_value
      rows.foreach { e => n += 1; v += e.value }
      val next = UserAgg(user, n, v)
      agg.update(next)
      Iterator.single(next)
    }
  }

  /** [[runningTotals]] on the transformWithState v2 API. Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`) — transformWithState does not run
    * on the default HDFS-backed store. See [[RunningTotalsProcessor]] for
    * the state-eviction tradeoff (TimeMode.None here on purpose).
    */
  def runningTotalsV2(events: Dataset[Event]): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** A user's first-appearance day, as emitted by [[firstSeen]]. */
  final case class FirstSeen(user_id: Long, first_day: Long)

  /** Streaming new-user detection — the STREAMING half of the batch
    * `q_user_growth` decomposition (cumulative distinct users = prefix sum
    * of per-day first appearances): per-user min first-appearance day kept
    * as typed state, a row emitted whenever a user's min day DECREASES
    * (first sight, or an out-of-order earlier event) — Update-mode
    * semantics, so the LAST emission per user equals the batch
    * `min(day) GROUP BY user`, which StreamingSpec asserts. Downstream the
    * metadata-sized per-day count + prefix sum stay batch jobs over the
    * emitted feed.
    *
    * State is one long per EVER-SEEN user — inherently unbounded for true
    * streaming-distinct (evicting a user's state would re-report them as
    * new on return; no watermark bound exists for "has this user ever
    * appeared"). That is the honest cost of the continuous form, and why
    * the batch decomposition remains the 100 TB backfill path: this
    * operator's production role is the per-batch new-user FEED, with state
    * scaled by |users|, not stream length.
    */
  def firstSeen(events: Dataset[Event]): Dataset[FirstSeen] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FirstSeen, FirstSeen](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout
      ) { (userId: Long, batch: Iterator[Event], state: GroupState[FirstSeen]) =>
        // day buckets match the batch query: epoch micros div 86400000000
        // = floorDiv(millis, 86400000) for the timestamp range
        val incoming = batch.map(e => Math.floorDiv(e.ts.getTime, 86400000L)).min
        if (state.getOption.forall(incoming < _.first_day)) {
          val next = FirstSeen(userId, incoming)
          state.update(next)
          Iterator.single(next)
        } else Iterator.empty
      }
  }

  /** Streaming latest-record-per-key — CDC upsert materialization: each
    * user's single most recent event (ties on ts broken by the unique
    * event_id) survives, updated per micro-batch. Order-equivalent to the
    * batch `q_latest_by_key`'s max-of-struct (the batch query keys by
    * epoch MICROS for its oracle; this one keys by the raw timestamp —
    * same ordering, so the StreamingSpec batch/stream agreement test is
    * what certifies the two stay in lockstep); run with Update/Complete
    * output mode.
    * State is ONE struct per key — bounded by key cardinality, not stream
    * lifetime, the natural posture for a snapshot view (every key's latest
    * value must stay addressable forever, unlike window state).
    */
  def latestByKey(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
      .select(
        col("user_id"),
        col("m.ts").as("ts"),
        col("m.event_id").as("event_id"),
        col("m.event_type").as("event_type")
      )

  /** Streaming dual of the incremental MV refresh ([[graft.ops.MatView]]):
    * the SAME (event_type × day) rollup grain with the same mergeable
    * measures — `count` and an exact-decimal `sum` partial — maintained
    * continuously by a watermarked 1-day tumbling window instead of a
    * batch delta-merge job. Append output emits each day's row exactly
    * once, when the watermark passes the window end: the streaming form of
    * "refresh on watermark advance". State is bounded by the watermark
    * horizon (open days × event types — metadata-sized at any corpus
    * scale), never by stream lifetime, so the query holds at
    * 1000-executor scale exactly like the batch MV's metadata-grained
    * merge. Session timezone is pinned UTC (SparkEnv), so the epoch-
    * aligned window start date equals the batch rollup's `to_date(ts)`
    * grain; StreamingSpec asserts batch/stream agreement against the
    * oracle-certified q_mv_refresh expression, and runs unchanged on
    * batch DataFrames (watermark is a no-op on batch).
    */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(graft.queries.Num.Money)).as("sum_value")
      )
      .select(
        col("event_type"),
        col("window.start").cast("date").as("day"),
        col("n_events"),
        col("sum_value").cast("double").as("sum_value")
      )

  /** Stream-stream interval join: clicks matched to the views they follow
    * within `horizon` for the same user. Both sides carry watermarks and the
    * join condition is time-bounded in BOTH directions, so Spark can evict
    * buffered rows once the watermark passes — state is bounded by the
    * horizon, not the stream's lifetime. This is the streaming dual of the
    * batch `q_range_join` (bucketized interval join in
    * [[graft.ops.TemporalJoins.rangeJoin]]); the batch query's DuckDB-green
    * hash check certifies the interval semantics.
    */
  def viewClickFunnel(events: DataFrame, horizon: String = "10 minutes"): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", horizon)
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", horizon)
    views
      .join(
        clicks,
        col("v_user") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") < col("view_ts") + expr(s"INTERVAL $horizon")
      )
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"), col("view_ts"), col("click_ts"))
  }

  /** Stream-static enrichment join: each micro-batch hash-joins against the
    * (broadcastable) static dimension — no streaming state at all, the
    * static side is re-planned per batch. Left join by default: an event
    * whose key is missing from the dimension snapshot (e.g. a brand-new
    * user) passes through with null metadata instead of silently dropping.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String, joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

  /** Default sink wiring: append-mode parquet with checkpointing — the shape
    * a production pipeline uses (exactly-once via checkpoint + idempotent
    * files).
    */
  def writeParquet(df: DataFrame, path: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .start()
}
