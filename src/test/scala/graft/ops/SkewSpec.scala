package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted-join skew mitigation: result equivalence + spreading. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result == plain join result (inner + left)") {
    // heavily skewed: 90% of big rows share key 1
    val big = spark.range(1000).select(
      when(col("id") < 900, 1L).otherwise(col("id")).as("k"), col("id").as("v"))
    val small = Seq((1L, "hot"), (950L, "cold"), (999L, "tail")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, "k").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    val saltedLeft = Skew.saltedJoin(big, small, "k", joinType = "left")
    assert(saltedLeft.count() == big.count())
  }

  test("registered k6 == q9 row-for-row, and the executed plan joins on the salted key") {
    val k6 = graft.SparkEntry.queries("k6_salted_join")(spark, sfDir)
    val q9 = graft.SparkEntry.queries("q9_brand_revenue")(spark, sfDir)
    assert(k6.collect().map(_.toString).toSeq == q9.collect().map(_.toString).toSeq)
    // salting is actually in the executed path, not optimized away
    assert(k6.queryExecution.executedPlan.toString.contains("__salt"),
      "salt column missing from the executed plan")
  }

  test("keyHistogram surfaces the hot key first") {
    val big = spark.range(1000).select(
      when(col("id") < 900, 1L).otherwise(col("id")).as("k"))
    val top = Skew.keyHistogram(big, "k", 1).collect().head
    assert(top.getLong(0) == 1L && top.getLong(1) == 900L)
  }

  test("event ops under a 100x-hot user: exact results, map-side reduction before the user_id shuffle") {
    // bot traffic is the realistic skew for event analytics at corpus
    // scale: one user with 100x the events of everyone else. funnel and
    // retention stay skew-safe because their per-user state is an
    // AGGREGATE (min-ts / distinct week) — partial aggregation collapses
    // the hot user to one row per map task before anything shuffles.
    val d = tmpDir("hotuser")
    val ts0 = 1704067200000000L // 2024-01-01 00:00:00 UTC, micros
    // hot user 1: 10k events, 1s apart; signup first, then click/purchase alternating
    val hot = spark.range(10000).select(
      col("id").as("event_id"),
      timestamp_micros(lit(ts0) + col("id") * 1000000L).as("ts"),
      lit(1L).as("user_id"),
      when(col("id") === 0, "signup").when(col("id") % 2 === 1, "click")
        .otherwise("purchase").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
    // 100 normal users: one clean signup→click→purchase each
    val normal = spark.range(2, 102).select(col("id").as("user_id"))
      .crossJoin(Seq(("signup", 0L), ("click", 1L), ("purchase", 2L)).toDF("event_type", "off"))
      .select((col("user_id") * 10 + col("off") + 100000L).as("event_id"),
        timestamp_micros(lit(ts0) + col("user_id") * 3600000000L + col("off") * 1000000L).as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
    hot.unionByName(normal).write.mode("overwrite")
      .parquet(d.resolve("events.parquet").toString)

    val f = EventWindows.funnel(spark, d.toString)
    assert(f.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 101L), (2L, 101L), (3L, 101L)))
    // the skew guard: per-stage min-ts is PARTIAL before the exchange
    assert(f.queryExecution.executedPlan.toString.contains("partial_min"))

    val r = EventWindows.retention(spark, d.toString)
    // each user contributes exactly one distinct (user, week) — the hot
    // user's 10k events collapse to 1 row; no window operator involved
    assert(r.collect().map(_.getLong(2)).sum == 101L)
    assert(!r.queryExecution.executedPlan.toString.contains("Window"))

    // gaps DOES sort the hot user's timeline in one partition (lag) —
    // exactness is the contract; the 1s cadence comes back exact
    val hotRow = EventWindows.interEventGaps(spark, d.toString)
      .collect().find(_.getLong(0) == 1L).get
    assert(hotRow.getAs[Long]("n_gaps") == 9999L)
    assert(hotRow.getAs[Double]("mean_gap_us") == 1000000.0)
  }

  test("g1 pivot cells reconcile with the rollup totals") {
    val pivoted = Analytics.orderStatusPivot(spark, sfDir)
    val total = pivoted.select(
      sum(col("n_f") + col("n_o") + col("n_p"))).collect().head.getLong(0)
    assert(total == Tables.orders(spark, sfDir).count())
  }
}
