package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig}
import graft.core.Det.cents

/** Structured Streaming twins of the batch event-time operators
  * (SURVEY.md §2.10 / ops.Events). The batch versions are what the oracle
  * hashes; these run the SAME logical transformations over an unbounded
  * source with watermarks bounding state. MemoryStream-driven tests assert
  * the streaming results equal the batch twins on identical data.
  *
  * Scale posture: state is keyed by (window|session|user), lives in the
  * per-partition StateStore, and is evicted by watermark — memory is
  * bounded by the active-window count, not the stream length.
  */
object Streaming {

  /** Input contract: an events-shaped streaming DataFrame with at least
    * (ts_us timestamp, event_type string, value double, user_id long).
    */

  /** Tumbling 1h counts + cents value, 10-minute watermark (late events
    * beyond it are dropped from state — asserted in tests).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "10 minutes")
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("value_cents"))

  /** Sliding 1h/30min twin. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "10 minutes")
      .groupBy(window(col("ts_us"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Session windows with a 30-minute inactivity gap — Spark's native
    * session_window merges what the batch twin computes via lag+cumsum.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "10 minutes")
      .groupBy(session_window(col("ts_us"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"), col("user_id"), col("n_events"))

  /** OHLC bar twin of `q_ohlc_bars`: per (1h window, event_type) the
    * opening/highest/lowest/closing value — open/close via `min/max(
    * struct(event-time, value))`, which streaming state merges
    * incrementally like any algebraic aggregate. (The batch query
    * tie-breaks equal timestamps on event_id; the streaming contract
    * carries no id column, so ties fall to the smaller value — document
    * accordingly.)
    */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_us", "10 minutes")
      .groupBy(window(col("ts_us"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("ts_us").as("t"), cents(col("value")).as("v"))).as("o"),
        max(struct(col("ts_us").as("t"), cents(col("value")).as("v"))).as("c"),
        max(cents(col("value"))).as("high_cents"),
        min(cents(col("value"))).as("low_cents"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"),
        col("o.v").as("open_cents"), col("high_cents"), col("low_cents"),
        col("c.v").as("close_cents"))

  /** Streaming exact dedup on a fingerprint column within the watermark
    * horizon — the streaming face of q_dedup_exact.
    */
  def dedupByKey(withFingerprint: DataFrame): DataFrame =
    withFingerprint
      .withWatermark("ts_us", "10 minutes")
      .dropDuplicates("fingerprint", "ts_us")

  /** Arbitrary stateful op: running per-user cents total + event count via
    * mapGroupsWithState (the iterative-model-update analog: state carried
    * across micro-batches per key, with processing-time timeout).
    */
  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n: Long, total_cents: Long)

  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0L))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserTotals(userId, acc.n + 1, acc.total_cents + math.round(e.value * 100))
          }
          state.update(next)
          next
      }
  }

  /** transformWithState twin of [[runningUserTotals]] — the Spark 4
    * arbitrary-state API (typed ValueState handles, RocksDB-backed state
    * store, TTL-capable). Same semantics, newer state machinery.
    */
  class UserTotalsProcessor extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserTotals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals](
        "totals", Encoders.product[UserTotals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(key, 0L, 0L)
      val next = rows.foldLeft(prev) { (acc, e) =>
        UserTotals(key, acc.n + 1, acc.total_cents + math.round(e.value * 100))
      }
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); see StreamingSpec.
    */
  def runningUserTotalsTws(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** File-sink demo wiring: parquet out with checkpointing (the
    * readStream → transform → writeStream lifecycle end to end).
    */
  def startFileSink(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
}
