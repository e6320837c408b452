package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.queries.CoreQueries

class SessionizeBatchSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("batch sessionize: known gaps split sessions exactly") {
    // user 1: events at 10:00, 10:10, 10:41 (31min gap → new), 11:00
    // user 2: single event
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, ts("2024-01-01 10:10:00"), 2.0),
      (3L, ts("2024-01-01 10:41:00"), 3.0),
      (4L, ts("2024-01-01 11:00:00"), 4.0),
      (5L, ts("2024-01-01 09:00:00"), 5.0))
      .map { case (id, t, v) => (id, t, if (id == 5L) 2L else 1L, "view", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Streaming.sessionizeBatch(events, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val s1 = out(0) // user 1 session 1: 10:00–10:10, 2 events
    assert(s1.getLong(0) == 1L && s1.getLong(2) == 2L)
    assert(s1.getTimestamp(3) == ts("2024-01-01 10:00:00"))
    assert(s1.getTimestamp(4) == ts("2024-01-01 10:10:00"))
    assert(s1.getDouble(5) == 3.0)
    val s2 = out(1) // user 1 session 2: 10:41–11:00 (31 min gap opened it)
    assert(s2.getLong(2) == 2L)
    assert(s2.getTimestamp(3) == ts("2024-01-01 10:41:00"))
    val s3 = out(2)
    assert(s3.getLong(0) == 2L && s3.getLong(2) == 1L)
  }

  test("batch sessionize: a gap of exactly the threshold does NOT split") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:30:00"), 1L))
      .map { case (id, t, u) => (id, t, u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Streaming.sessionizeBatch(events, gapMinutes = 30).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }

  test("exact-gap boundary: native session_window and sessionizeBatch AGREE (both merge)") {
    // Measured on this Spark version: session_window merges sessions
    // when next.start <= prev.ts + gap, so an event exactly `gap`
    // after its predecessor stays in the SAME session — the same
    // strictly-greater split as sessionizeBatch/qSessionizeSql. This
    // boundary agreement is why q_session_window can share the
    // sessionize oracle; if a Spark upgrade flips session_window to
    // half-open ([ts, ts+gap)) semantics, this test fails with this
    // diagnosis instead of the driver hash silently going red.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:30:00"), 1L))
      .map { case (id, t, u) => (id, t, u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ours = Streaming.sessionizeBatch(events, gapMinutes = 30).collect()
    assert(ours.length == 1, "sessionizeBatch keeps an exact-gap pair in ONE session")
    val native = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .collect()
    assert(native.length == 1,
      "native session_window no longer merges an exact-gap pair — " +
        "q_session_window needs its own >=-split oracle now")
  }

  test("batch sessionize: ts ties share one session id") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:00:00"), 1L),
      (3L, ts("2024-01-01 10:00:00"), 1L))
      .map { case (id, t, u) => (id, t, u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Streaming.sessionizeBatch(events, gapMinutes = 30).collect()
    assert(out.length == 1 && out.head.getLong(2) == 3L)
  }

  test("window composition agrees with Spark's native session_window on harness events") {
    // Independent implementation cross-check: session_window(ts, gap)
    // merges events whose gaps are < gap (a gap of exactly the
    // threshold SPLITS there, vs. our strict->splits-only-above; the
    // micro-resolution harness timestamps never land on the exact
    // threshold, so the two agree on this data).
    val events = graft.Tables.events(spark, sf001)
    val ours = Streaming.sessionizeBatch(events, gapMinutes = 30)
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(_.toString).sorted.toSeq
    val native = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select("user_id", "n_events", "session_start", "session_end")
      .collect().map(_.toString).sorted.toSeq
    assert(ours == native)
  }

  test("q_sessionize invariants on harness events") {
    val out = CoreQueries.qSessionize(spark, sf001)
      .persist()
    val total = out.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf001).count(),
      "every event lands in exactly one session")
    // bounds ordered; session ids dense from 1 per user
    out.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to rows.length))
      sorted.foreach(r => assert(!r.getTimestamp(3).after(r.getTimestamp(4))))
      // consecutive sessions of one user are separated by > 30 min
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getTimestamp(3).getTime - a.getTimestamp(4).getTime
          assert(gapMs > 30L * 60000L, s"sessions not gap-separated: $a | $b")
        case _ => ()
      }
    }
    out.unpersist()
  }
}
