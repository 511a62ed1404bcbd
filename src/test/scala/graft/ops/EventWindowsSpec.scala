package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch event-time windows: tumbling, sliding, sessions. */
class EventWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("sessions split on the 30-minute gap, inclusive boundary") {
    val d = tmpDir("sess")
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "c", 1.0, "{}"),
      (2L, ts("2024-01-01 10:29:59"), 7L, "c", 2.0, "{}"),  // same session
      (3L, ts("2024-01-01 10:59:59"), 7L, "c", 3.0, "{}"),  // exactly 30m after #2 → same
      (4L, ts("2024-01-01 11:30:00"), 7L, "c", 4.0, "{}"),  // 30m00.001+ gap → new
      (5L, ts("2024-01-01 09:00:00"), 8L, "v", 5.0, "{}")   // other user
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.userSessions(spark, d.toString).collect()
    val u7 = out.filter(_.getLong(0) == 7L)
    assert(u7.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // two sessions
    assert(u7.head.getAs[Long]("n_events") == 3)
    assert(u7.last.getAs[Long]("n_events") == 1)
    assert(out.count(_.getLong(0) == 8L) == 1)
  }

  test("hourly tumbling windows cover every event exactly once") {
    val total = Tables.events(spark, sfDir).count()
    val agg = EventWindows.hourlyByType(spark, sfDir)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(agg == total)
    val slid = EventWindows.sliding(spark, sfDir)
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(slid == 2 * total) // 1h window every 30m → each event in 2 windows
  }

  test("slidingByType: conservation, grid alignment, and per-type totals match tumbling") {
    val total = Tables.events(spark, sfDir).count()
    val st = EventWindows.slidingByType(spark, sfDir)
    assert(st.agg(sum("n_events")).collect().head.getLong(0) == 2 * total)
    // every window start sits on the 30-minute epoch grid
    assert(st.filter(col("window_start_us") % (1800L * 1000000) =!= 0).count() == 0)
    // per-type event totals are 2x the tumbling per-type totals
    val slidByType = st.groupBy("event_type").agg(sum("n_events").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    EventWindows.hourlyByType(spark, sfDir)
      .groupBy("event_type").agg(sum("n_events").as("n"))
      .collect().foreach { r =>
        assert(slidByType(r.getString(0)) == 2 * r.getLong(1))
      }
  }

  test("sessionStats n_events reconciles with userSessions") {
    val sess = EventWindows.userSessions(spark, sfDir)
    val stats = EventWindows.sessionStats(spark, sfDir)
    val a = sess.agg(sum("n_events")).collect().head.getLong(0)
    val b = stats.agg(sum("n_events")).collect().head.getLong(0)
    assert(a == b && a == Tables.events(spark, sfDir).count())
  }
}
