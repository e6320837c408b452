package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured Streaming operators over the events stream (SURVEY.md
  * §2.11). The reference is batch-only; these are the engine-surface
  * streaming counterparts: the SAME `window()` aggregation function
  * serves [[graft.queries.CoreQueries.qEventsTimeWindow]] (batch,
  * oracle-checked) and the streaming query here — write the transform
  * once, run it both ways.
  */
object Streaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, sum_value: Double)

  /** Streaming read of events parquet (nanos ts → micros, like
    * Tables.events). `dir` must be a directory of parquet files. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Tumbling event-time aggregation with watermark — works on a batch
    * OR streaming frame unchanged. Late data beyond the watermark is
    * dropped; state is bounded by (#windows in watermark horizon ×
    * #event types). */
  def windowedCounts(events: DataFrame,
      windowLength: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming deduplication — the exactly-once ingest guard: drops
    * re-delivered events by id, keeping state only inside the
    * watermark horizon (`dropDuplicatesWithinWatermark`: an id whose
    * event time falls behind the watermark can no longer collide, so
    * its state is evicted — bounded memory at any input rate, the
    * non-negotiable property for a 100 TB-scale stream; re-deliveries
    * with slightly different timestamps still dedup because the id
    * alone is the key). */
  def dedupEvents(events: DataFrame, watermark: String = "30 minutes",
      idCol: String = "event_id", tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(idCol)

  /** Stream-stream attribution join — the classic two-stream pattern:
    * each purchase matched to the SAME user's clicks in the preceding
    * `windowMinutes`. Works on batch OR streaming frames unchanged
    * (withWatermark is a no-op on batch): the same transform serves the
    * oracle-checked batch query
    * ([[graft.queries.AnalyticsQueries.qAttribution]]) and the live
    * two-stream join, and StreamingSpec proves they emit identical
    * pair sets.
    *
    * Scale/state: the join key is user_id (hash join, no nested loop —
    * the time bound is a post-filter on the equi-match), and on streams
    * BOTH sides carry watermarks + a two-sided time-range condition, so
    * each side's buffered state is evicted once it falls behind the
    * other stream's watermark — bounded memory at any input rate (an
    * unbounded stream-stream inner join without the range condition
    * would buffer forever). */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Long = 30, watermark: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    c.join(p, expr(
      s"""user_id = p_user_id AND
         |click_ts >= p_ts - INTERVAL $windowMinutes MINUTES AND
         |click_ts <= p_ts""".stripMargin))
      .select(col("purchase_id"), col("click_id"))
  }

  /** Batch twin of [[sessionize]]: gap-based sessionization as a pure
    * window composition — events more than `gapMinutes` after their
    * predecessor (per user) open a new session; the session id is the
    * running count of session-open flags.
    *
    * Scale: ONE shuffle partitions by user; the lag, the flag, and the
    * running count all run inside that window sort, and the final
    * per-(user, session) aggregate is a partial-combinable groupBy.
    * No state store, no driver loops — at 100 TB this is the shape you
    * want for backfill while [[sessionize]] handles the live stream
    * with the same gap semantics.
    *
    * Tie safety: rows sharing one (user, ts) get one session id
    * regardless of their arbitrary order — the gap for any tie row is
    * 0, and the default RANGE window frame gives all ts-peers the same
    * running count. Gap comparison is in microseconds (the data's
    * resolution), strictly greater-than. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val gapMicros = gapMinutes * 60L * 1000000L
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("session_open",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("prev_ts")) > gapMicros,
          lit(1)))
      // count(expr) skips the null non-open rows and yields BIGINT on
      // both engines (a sum of int flags would be HUGEINT in DuckDB)
      .withColumn("session_id", count(col("session_open")).over(byUser))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol)).as("sum_value"))
  }

  /** Gap-based sessionization via flatMapGroupsWithState, emitting
    * EVERY session: each session CLOSED within the trigger (final
    * form, exactly once) plus the still-open current one (re-emitted
    * per trigger as it extends — downstream keeps the latest version
    * per (user, session_start)). This is the complete-output variant
    * of [[sessionize]]: a mapGroups operator can only return one row
    * per key per trigger, so sessions opened AND closed inside one
    * trigger would vanish from its output. StreamingSpec proves
    * replay equivalence: accumulated emissions == [[sessionizeBatch]]
    * over the same events, session for session.
    *
    * State per key is still one open-session tuple — O(users) memory,
    * partitioned by user across executors. */
  def sessionizeAll(events: Dataset[Event], gapMinutes: Long)(
      implicit enc: org.apache.spark.sql.Encoder[UserSession],
      enc2: org.apache.spark.sql.Encoder[Long]): Dataset[UserSession] = {
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        org.apache.spark.sql.streaming.OutputMode.Update,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[UserSession]) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val closed = scala.collection.mutable.ListBuffer.empty[UserSession]
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (cur == null)
              cur = UserSession(userId, e.ts, e.ts, 1, e.value)
            else if (t - cur.session_end.getTime > gapMs) {
              closed += cur
              cur = UserSession(userId, e.ts, e.ts, 1, e.value)
            } else {
              val start =
                if (t < cur.session_start.getTime) e.ts else cur.session_start
              val end =
                if (t > cur.session_end.getTime) e.ts else cur.session_end
              cur = cur.copy(session_start = start, session_end = end,
                n_events = cur.n_events + 1, sum_value = cur.sum_value + e.value)
            }
          }
          if (cur != null) state.update(cur)
          (closed.toList ++ Option(cur).toList).iterator
      }
  }

  /** Gap-based sessionization via mapGroupsWithState: events within
    * `gap` of each other belong to one session; emits the LAST closed
    * or open session per user per trigger (custom state beyond what
    * windowed aggs express — SURVEY §2.11 / north-star streaming).
    * For the complete per-session output stream, use [[sessionizeAll]].
    *
    * State per key is one (start, end, n, sum) tuple — O(users)
    * memory, partitioned by user across executors. */
  def sessionize(events: Dataset[Event], gapMinutes: Long)(
      implicit enc: org.apache.spark.sql.Encoder[UserSession],
      enc2: org.apache.spark.sql.Encoder[Long]): Dataset[UserSession] = {
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[UserSession]) =>
          // events within one trigger batch are not ordered — sort here
          // (per-user per-trigger volume is bounded by trigger size)
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur =
              if (cur == null || t - cur.session_end.getTime > gapMs)
                UserSession(userId, e.ts, e.ts, 1, e.value)
              else {
                // late (out-of-order) events may precede the stored
                // bounds — extend, never move session_end backward
                val start =
                  if (t < cur.session_start.getTime) e.ts else cur.session_start
                val end =
                  if (t > cur.session_end.getTime) e.ts else cur.session_end
                cur.copy(session_start = start, session_end = end,
                  n_events = cur.n_events + 1,
                  sum_value = cur.sum_value + e.value)
              }
          }
          state.update(cur)
          cur
      }
  }
}
