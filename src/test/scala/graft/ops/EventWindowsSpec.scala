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

  test("funnel: strictly-after semantics — same-timestamp and out-of-order events don't advance") {
    val d = tmpDir("funnel")
    Seq(
      // user 1: clean ordered funnel → reaches all 3 stages
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"),
      (2L, ts("2024-01-01 10:05:00"), 1L, "click", 0.0, "{}"),
      (3L, ts("2024-01-01 10:10:00"), 1L, "purchase", 0.0, "{}"),
      // user 2: click at the SAME instant as signup → not strictly after
      (4L, ts("2024-01-01 11:00:00"), 2L, "signup", 0.0, "{}"),
      (5L, ts("2024-01-01 11:00:00"), 2L, "click", 0.0, "{}"),
      // user 3: purchase BEFORE the first post-signup click → stage 2 only
      (6L, ts("2024-01-01 12:00:00"), 3L, "signup", 0.0, "{}"),
      (7L, ts("2024-01-01 11:59:00"), 3L, "purchase", 0.0, "{}"),
      (8L, ts("2024-01-01 12:30:00"), 3L, "click", 0.0, "{}"),
      // user 4: skips signup entirely → counted nowhere
      (9L, ts("2024-01-01 13:00:00"), 4L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val rows = EventWindows.funnel(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, "signup", 3L), (2L, "click", 2L), (3L, "purchase", 1L)))
  }

  test("funnel: empty stage downstream still emits a zero row") {
    val d = tmpDir("funnel0")
    Seq((1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val rows = EventWindows.funnel(spark, d.toString).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("retention: cohort = first epoch-week, distinct users per offset") {
    val d = tmpDir("retention")
    Seq(
      // user 1: active in its cohort week and again exactly 2 weeks later
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 09:00:00"), 1L, "view", 0.0, "{}"), // same week, dedup'd
      (3L, ts("2024-01-15 00:00:00"), 1L, "view", 0.0, "{}"),
      // user 2: cohort week only
      (4L, ts("2024-01-01 12:00:00"), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val byOffset = EventWindows.retention(spark, d.toString).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byOffset == Map(0L -> 2L, 2L -> 1L))
  }

  test("activeUsers: DAU counts the day, WAU counts the trailing week") {
    val d = tmpDir("active")
    Seq(
      // user 1 active day D and D+3; user 2 active day D only
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "view", 0.0, "{}"), // same day, dedup'd
      (3L, ts("2024-01-04 10:00:00"), 1L, "view", 0.0, "{}"),
      (4L, ts("2024-01-01 12:00:00"), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.activeUsers(spark, d.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // day D: dau 2, wau 2 (both users); day D+3: dau 1, wau 2 (user 2
    // still weekly-active from day D)
    assert(out.toSeq == Seq((2L, 2L, 1.0), (1L, 2L, 0.5)))
  }

  test("interEventGaps: integer-exact mean/max; single-event user has null gaps") {
    val d = tmpDir("gaps")
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "c", 0.0, "{}"),
      (2L, ts("2024-01-01 10:01:00"), 7L, "c", 0.0, "{}"), // gap 60s
      (3L, ts("2024-01-01 10:04:00"), 7L, "c", 0.0, "{}"), // gap 180s
      (4L, ts("2024-01-01 10:00:00"), 8L, "c", 0.0, "{}")  // singleton
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.interEventGaps(spark, d.toString).collect()
    val u7 = out.find(_.getLong(0) == 7L).get
    assert(u7.getAs[Long]("n_gaps") == 2L)
    assert(u7.getAs[Long]("max_gap_us") == 180000000L)
    assert(u7.getAs[Double]("mean_gap_us") == 120000000.0)
    val u8 = out.find(_.getLong(0) == 8L).get
    assert(u8.getAs[Long]("n_gaps") == 0L)
    assert(u8.isNullAt(u8.fieldIndex("max_gap_us")))
    assert(u8.isNullAt(u8.fieldIndex("mean_gap_us")))
  }

  test("hourlyAnomalies: spike flags against a varying baseline; zero-variance baseline yields null z") {
    val d = tmpDir("anomaly")
    var id = 0L
    val rows = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String, Double, String)]
    def hour(h: Int) = ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:30:00")
    // type "v": 24 baseline hours alternating 1/3 events (mean 2, var 1),
    // then a 20-event spike at hour 24
    for (h <- 0 until 24; _ <- 0 until (if (h % 2 == 0) 1 else 3)) {
      id += 1; rows += ((id, hour(h), 1L, "v", 0.0, "{}"))
    }
    for (_ <- 0 until 20) { id += 1; rows += ((id, hour(24), 1L, "v", 0.0, "{}")) }
    // type "k": 25 constant hours — trailing variance 0, z undefined
    for (h <- 0 until 25) { id += 1; rows += ((id, hour(h), 2L, "k", 0.0, "{}")) }
    rows.result().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.hourlyAnomalies(spark, d.toString).collect()
    // only hour 24 has a full 24-hour lookback → one row per type
    assert(out.length == 2, out.mkString("\n"))
    val v = out.find(_.getString(1) == "v").get
    assert(v.getAs[Long]("n_events") == 20L)
    assert(v.getAs[Double]("mean_prev") == 2.0)
    assert(v.getAs[Double]("z_score") == 18.0) // (20-2)/sqrt(1)
    assert(v.getAs[Boolean]("is_anomaly"))
    val k = out.find(_.getString(1) == "k").get
    assert(k.isNullAt(k.fieldIndex("z_score")))
    assert(!k.getAs[Boolean]("is_anomaly"))
  }

  test("sessionStats n_events reconciles with userSessions") {
    val sess = EventWindows.userSessions(spark, sfDir)
    val stats = EventWindows.sessionStats(spark, sfDir)
    val a = sess.agg(sum("n_events")).collect().head.getLong(0)
    val b = stats.agg(sum("n_events")).collect().head.getLong(0)
    assert(a == b && a == Tables.events(spark, sfDir).count())
  }

  test("hourlyMerge of disjoint partials == full hourlyByType recompute, row for row") {
    val ev = Tables.events(spark, sfDir)
    val merged = EventWindows.hourlyMerge(
      EventWindows.hourlyPartial(ev.filter(col("event_id") % 3 === 0)),
      EventWindows.hourlyPartial(ev.filter(col("event_id") % 3 =!= 0)))
      .orderBy("window_start_us", "event_type").collect()
    val full = EventWindows.hourlyByType(spark, sfDir).collect()
    assert(merged.length == full.length)
    merged.zip(full).foreach { case (m, f) =>
      assert(m.getLong(0) == f.getLong(0) && m.getString(1) == f.getString(1))
      assert(m.getLong(2) == f.getLong(2))
      assert(m.getDouble(3) == f.getDouble(3)) // exact: decimal partials
      assert(m.getDouble(4) == f.getDouble(4))
    }
  }

  test("hourlyEwma: constant series converges to the constant; weights sum to 1") {
    val d = tmpDir("ewma")
    var id = 0L
    val rows = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String, Double, String)]
    def hour(h: Int) = ts(f"2024-01-${1 + h / 24}%02d ${h % 24}%02d:15:00")
    // 30 hours with a constant 4 events/hour: any weighted average of a
    // constant is the constant, so EWMA must be exactly 4 where emitted
    for (h <- 0 until 30; _ <- 0 until 4) {
      id += 1; rows += ((id, hour(h), 1L, "c", 0.0, "{}"))
    }
    rows.result().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.hourlyEwma(spark, d.toString, alpha = 0.3, k = 12).collect()
    assert(out.length == 30 - 12 + 1) // full-window positions only
    out.foreach(r => assert(r.getAs[Double]("ewma") == 4.0, r.toString))
  }

  test("transitions: counts conserve (sum = events - users), known tiny sequence") {
    val t = EventWindows.transitions(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    val events = Tables.events(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(t == events - users, "each user contributes n_events - 1 transitions")

    import spark.implicits._
    val d = tmpDir("trans")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a→b→a ; user 2: b→b. Ties impossible (distinct ts).
    Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0, "{}"),
        (2L, ts("2024-01-01 00:01:00"), 1L, "b", 0.0, "{}"),
        (3L, ts("2024-01-01 00:02:00"), 1L, "a", 0.0, "{}"),
        (4L, ts("2024-01-01 00:00:30"), 2L, "b", 0.0, "{}"),
        (5L, ts("2024-01-01 00:03:00"), 2L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val m = EventWindows.transitions(spark, d.toString).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("a", "b") -> 1L, ("b", "a") -> 1L, ("b", "b") -> 1L), m.toString)
  }

  test("scd2: intervals chain gaplessly, states compress, one open row per user") {
    import spark.implicits._
    val d = tmpDir("scd2")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: a a b a (consecutive dup compresses); user 2: c only
    Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a", 0.0, "{}"),
        (2L, ts("2024-01-01 00:01:00"), 1L, "a", 0.0, "{}"),
        (3L, ts("2024-01-01 00:02:00"), 1L, "b", 0.0, "{}"),
        (4L, ts("2024-01-01 00:03:00"), 1L, "a", 0.0, "{}"),
        (5L, ts("2024-01-01 00:00:00"), 2L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val rows = EventWindows.scd2History(spark, d.toString).collect()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[String]("state")).toSeq == Seq("a", "b", "a"),
      "dup compresses; the a→b→a flip-back survives")
    // half-open chaining: valid_to(i) == valid_from(i+1)
    u1.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Long]("valid_to_us") == y.getAs[Long]("valid_from_us")) }
    assert(rows.count(_.getAs[Boolean]("is_current")) == 2, "one open row per user")

    // fixture-scale invariants: change rows only, every user has exactly
    // one open interval, and intervals never overlap
    val full = EventWindows.scd2History(spark, sfDir)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(full.filter(col("is_current")).count() == users)
    val overlaps = full
      .withColumn("next_from", lead(col("valid_from_us"), 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("valid_from_us")))
      .filter(col("next_from").isNotNull && col("valid_to_us") =!= col("next_from"))
    assert(overlaps.count() == 0, "intervals chain exactly")
  }

  test("attribution: credit counts conserve against per-conversion facts") {
    import spark.implicits._
    val d = tmpDir("attr")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: view, click, purchase → first=view, last=click
    // user 2: click, purchase; view AFTER purchase (no credit);
    // user 3: purchase with no prior touch (drops out entirely)
    Seq((1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
        (2L, ts("2024-01-01 00:01:00"), 1L, "click", 0.0, "{}"),
        (3L, ts("2024-01-01 00:02:00"), 1L, "purchase", 0.0, "{}"),
        (4L, ts("2024-01-02 00:00:00"), 2L, "click", 0.0, "{}"),
        (5L, ts("2024-01-02 00:01:00"), 2L, "purchase", 0.0, "{}"),
        (6L, ts("2024-01-02 00:02:00"), 2L, "view", 0.0, "{}"),
        (7L, ts("2024-01-03 00:00:00"), 3L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val m = EventWindows.attribution(spark, d.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m("view") == (1L, 0L, 1L, 1L), m.toString)   // first for u1 only
    assert(m("click") == (1L, 2L, 2L, 2L), m.toString)  // last for u1+u2, first for u2

    // fixture: every credited conversion has exactly one first and one
    // last touch → the totals agree across models
    val full = EventWindows.attribution(spark, sfDir).collect()
    val (nf, nl) = (full.map(_.getAs[Long]("n_first")).sum, full.map(_.getAs[Long]("n_last")).sum)
    assert(nf == nl && nf > 0)
    full.foreach { r =>
      assert(r.getAs[Long]("n_touch_events") >= r.getAs[Long]("n_conversions_touched")) }
  }

  test("linearAttribution: exact basis-point conservation, remainder to earliest touch") {
    import spark.implicits._
    val d = tmpDir("linattr")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1: view, click, click before purchase → 3 touches: 3333 bp each,
    // remainder 1 bp to the EARLIEST (the view) → view 3334, click 6666
    Seq((1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0, "{}"),
        (2L, ts("2024-01-01 00:01:00"), 1L, "click", 0.0, "{}"),
        (3L, ts("2024-01-01 00:02:00"), 1L, "click", 0.0, "{}"),
        (4L, ts("2024-01-01 00:03:00"), 1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val m = EventWindows.linearAttribution(spark, d.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(m("view") == ((1L, 3334L, 0.3334)), m.toString)
    assert(m("click") == ((2L, 6666L, 0.6666)), m.toString)

    // fixture: conservation is EXACT — total credit = 10000 bp per
    // credited conversion, and the result is partitioning-independent
    val full = EventWindows.linearAttribution(spark, sfDir)
    val rows = full.collect()
    val firstLast = EventWindows.attribution(spark, sfDir).collect()
    val nConvs = firstLast.map(_.getAs[Long]("n_first")).sum // 1 first per conversion
    assert(rows.map(_.getAs[Long]("credit_bp")).sum == 10000L * nConvs)
    assert(math.abs(rows.map(_.getAs[Double]("credit_share")).sum - 1.0) < 1e-4)
  }

  test("sessionPaths: trigram mass == sum over sessions of max(0, n_events - 2)") {
    // every session of length L contributes exactly L-2 trigrams (L >= 2
    // -> 0), so the unbounded path counts must conserve session sizes —
    // pinning both the shared sessionization rule and the window leads
    val sess = EventWindows.userSessions(spark, sfDir)
    val expected = sess.select(greatest(col("n_events") - 2L, lit(0L)).as("t"))
      .agg(sum("t")).head.getLong(0)
    val paths = EventWindows.sessionPaths(spark, sfDir, topN = 1000000)
    assert(paths.agg(sum("n")).head.getLong(0) == expected)
    assert(expected > 0, "fixture has no session of length >= 3 - vacuous")
    // top-N ordering is total: counts desc, then the full path
    val rows = paths.limit(50).collect()
      .map(r => (r.getLong(3), r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.sortBy(t => (-t._1, t._2, t._3, t._4)).toSeq == rows.toSeq)
  }

  test("sessionConcurrency: hand-computed sweep line with inclusive ends; fixture conserves starts and peaks above 1") {
    import spark.implicits._
    val d = tmpDir("concurrency")
    def t(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // three single-session users: [0,10], [5,15], [10,20] seconds
    val rows = Seq(
      (1L, t(0), 1L, "a", 0.0, "{}"), (2L, t(10), 1L, "a", 0.0, "{}"),
      (3L, t(5), 2L, "a", 0.0, "{}"), (4L, t(15), 2L, "a", 0.0, "{}"),
      (5L, t(10), 3L, "a", 0.0, "{}"), (6L, t(20), 3L, "a", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.sessionConcurrency(spark, d.toString).collect()
      .map(r => (r.getLong(0) / 1000000L, (r.getLong(1), r.getLong(2), r.getLong(3))))
    // at t=10 user1 ends AND user3 starts: ends count strictly-before,
    // so all three overlap at that instant
    assert(out.toSeq == Seq(
      0L -> ((1L, 0L, 1L)), 5L -> ((1L, 0L, 2L)), 10L -> ((1L, 1L, 3L)),
      15L -> ((0L, 1L, 2L)), 20L -> ((0L, 1L, 1L))))
    // real fixture: starts conserve to the session count, peak > 1
    val sessions = EventWindows.userSessions(spark, sfDir).count()
    val real = EventWindows.sessionConcurrency(spark, sfDir).collect()
    assert(real.map(_.getLong(1)).sum == sessions)
    assert(real.map(_.getLong(3)).max > 1L)
  }

  test("hourlyCusum: hand-computed excursions for a level shift; flat series stays at zero; fixture flags both states") {
    import spark.implicits._
    val d = tmpDir("cusum")
    var id = 0L
    val rows = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String, Double, String)]
    def hour(h: Int) = ts(f"2024-01-01 ${h}%02d:30:00")
    // type "g": 4 hours of 10, then 4 hours of 20 — mean 15, H=8, S=120
    for (h <- 0 until 8; _ <- 0 until (if (h < 4) 10 else 20)) {
      id += 1; rows += ((id, hour(h), 1L, "g", 0.0, "{}"))
    }
    // type "f": 6 flat hours of 5 — every excursion exactly 0
    for (h <- 0 until 6; _ <- 0 until 5) {
      id += 1; rows += ((id, hour(h), 2L, "f", 0.0, "{}"))
    }
    rows.result().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val out = EventWindows.hourlyCusum(spark, d.toString).collect()
      .map(r => (r.getString(1), r.getLong(0))
        -> (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
      .toMap
    val g = (0 until 8).map(h =>
      out(("g", ts(f"2024-01-01 ${h}%02d:00:00").getTime * 1000L)))
    // d = n·8 − 120 = ∓40; cum −40..−160 then back to 0; excursions/H:
    assert(g.map(_._2).toSeq == Seq(0.0, 0.0, 0.0, 0.0, 5.0, 10.0, 15.0, 20.0))
    assert(g.map(_._3).toSeq == Seq(0.0, 5.0, 10.0, 15.0, 10.0, 5.0, 0.0, 0.0))
    assert(g.forall(!_._4)) // max integer excursion 160 < 3·S = 360
    val f = out.filter(_._1._1 == "f").values
    assert(f.size == 6 && f.forall(v => v._2 == 0.0 && v._3 == 0.0 && !v._4))
    // real fixture: drift flags fire somewhere AND not everywhere
    val real = EventWindows.hourlyCusum(spark, sfDir).collect()
    assert(real.exists(_.getBoolean(5)) && real.exists(!_.getBoolean(5)))
  }
}
