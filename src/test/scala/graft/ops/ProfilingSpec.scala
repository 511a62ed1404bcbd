package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Profiling operators + the new composite/ANN additions. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("correlationMatrix: exact ±1 on linear columns, 0-ish on independent; one aggregate pass") {
    val df = spark.range(1, 101).select(
      col("id").cast("double").as("x"),
      (col("id") * 2.0 + 5.0).as("y"),        // perfectly correlated
      (-col("id")).cast("double").as("z"))    // perfectly anti-correlated
    val out = Profiling.correlationMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("x", "y")) == 1.0)
    assert(out(("x", "z")) == -1.0)
    assert(out(("y", "z")) == -1.0)
    // single scan: exactly one aggregate subtree over the source
    val plan = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "pair rows must unfold from ONE aggregated row")
  }

  test("columnProfile: one row per column with null/distinct counts") {
    val df = Seq((1, Some("a")), (2, None), (3, Some("a"))).toDF("id", "v")
    val out = Profiling.columnProfile(df, Seq("id", "v")).collect()
    val byCol = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byCol("id") == (0L, 3L))
    assert(byCol("v") == (1L, 1L))
  }

  test("columnProfile runs as a single aggregation pass (no per-column jobs)") {
    val df = Tables.orders(spark, sfDir)
    val plan = Profiling.columnProfile(df,
      Seq("o_orderkey", "o_orderstatus")).queryExecution.executedPlan.toString
    // one scan of orders, not one per column
    assert("FileScan parquet".r.findAllIn(plan).length <= 1, plan)
  }

  test("quantilesByGroup: interpolated quartiles on a known distribution") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0))
      .toDF("g", "v")
    val r = Profiling.quantilesByGroup(df, "g", "v").collect().head
    assert(r.getDouble(1) == 2.0) // p25 of 1..5
    assert(r.getDouble(2) == 3.0) // p50
    assert(r.getDouble(3) == 4.0) // p75
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 5.0)
  }

  test("cleanCorpus yields a non-empty per-source summary with avg quality in [0,1]") {
    val out = TextStats.cleanCorpus(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) > 0))
    assert(out.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("ivfTopK: cells partition the corpus; hits are valid ranks/sims") {
    val emb = Tables.embeddings(spark, sfDir)
    val cells = emb.select(Similarity.ivfCell(col("embedding")).as("c"))
      .distinct().count()
    assert(cells > 1) // quantizer actually partitions
    val out = Similarity.ivfTopK(emb, Similarity.querySet(emb, "vec_id", 100)).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 1L && math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("j3: customers without urgent orders is non-empty and disjoint from j1") {
    val j1 = Analytics.customersWithUrgentOrders(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val j3 = Analytics.customersWithoutUrgentOrders(spark, sfDir)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(j3.nonEmpty)
    assert(j1.intersect(j3).isEmpty)
    val total = Tables.customer(spark, sfDir).count()
    assert(j1.size + j3.size == total)
  }

  test("quantileBuckets: buckets partition the keys into near-quartiles, no global sort") {
    val df = Profiling.quantileBuckets(Tables.orders(spark, sfDir), "o_custkey", "o_totalprice")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val keys = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == keys)
    // quartiles: each bucket holds 25% +- interpolation slack
    rows.foreach(r => assert(math.abs(r.getLong(1) - keys / 4.0) <= keys / 10.0 + 2, r.toString))
    // the fatal shape at scale is a partition-less window (ntile) — absent
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("validate: planted violations counted per rule; clean rules report zero") {
    import spark.implicits._
    val df = Seq((1L, 10.0, "a"), (2L, -5.0, null), (2L, 3.0, "c"))
      .toDF("id", "v", "s")
    val out = Profiling.validate(df,
      rowRules = Seq(
        "v_positive" -> (col("v") > 0.0),
        "s_not_null" -> col("s").isNotNull,
        "id_positive" -> (col("id") > 0L)),
      uniqueKeys = Seq("id_unique" -> Seq("id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("v_positive" -> 1L, "s_not_null" -> 1L,
      "id_positive" -> 0L, "id_unique" -> 1L))
  }

  test("approxQuantilesByGroup: t-digest quartiles bounded by the exact min/max per group") {
    val exact = Profiling.quantilesByGroup(Tables.lineitem(spark, sfDir),
      "l_returnflag", "l_extendedprice").collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("vmin"), r.getAs[Double]("vmax"))).toMap
    Profiling.approxQuantilesByGroup(Tables.lineitem(spark, sfDir),
      "l_returnflag", "l_extendedprice").collect().foreach { r =>
      val (lo, hi) = exact(r.getString(0))
      val qs = r.getSeq[Double](1)
      assert(qs.length == 3 && qs == qs.sorted)
      assert(qs.head >= lo && qs.last <= hi)
    }
  }

  test("psiDrift: complete bin grid, zero drift on identical halves, detects a shifted bin") {
    import spark.implicits._
    val out = Profiling.psiDrift(Tables.events(spark, sfDir),
      "event_type", "value", "ts", "2024-01-16 00:00:00").collect()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(out.length == types * 10, "one row per (group, bin), empty bins included")
    assert(out.forall(r => !r.isNullAt(4)), "every bin reports a term")

    // identical halves → every smoothed term is exactly 0 (pc == pb)
    val flat = (1 to 200).flatMap { i =>
      Seq((i.toLong, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), "g", (i % 10) * 50.0 + 1),
          (1000L + i, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), "g", (i % 10) * 50.0 + 1))
    }.toDF("event_id", "ts", "event_type", "value")
    val zero = Profiling.psiDrift(flat, "event_type", "value", "ts", "2024-01-16 00:00:00")
      .collect()
    assert(zero.forall(_.getDouble(4) == 0.0), "no drift must score exactly 0")

    // all mass moves bins 0→9 between halves: both end bins show large
    // positive terms (PSI terms are non-negative by construction:
    // (pc-pb) and ln(pc/pb) always share sign)
    val shifted = (1 to 200).flatMap { i =>
      Seq((i.toLong, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"), "g", 1.0),
          (1000L + i, java.sql.Timestamp.valueOf("2024-01-20 00:00:00"), "g", 480.0))
    }.toDF("event_id", "ts", "event_type", "value")
    val drift = Profiling.psiDrift(shifted, "event_type", "value", "ts", "2024-01-16 00:00:00")
      .collect().map(r => r.getLong(1) -> r.getDouble(4)).toMap
    assert(drift(0L) > 0.2 && drift(9L) > 0.2, s"shifted mass must flag both bins: $drift")
    assert(drift.values.forall(_ >= 0.0), "PSI terms are non-negative")
  }

  test("ksDrift: hand-computed D, identical samples → 0, disjoint shift → 1") {
    def ks(rows: Seq[(String, Double)]) =
      Profiling.ksDrift(rows.toDF("g", "v"), "g", "v", "A", "B").collect().head
    // A = {1,2}, B = {1,3}: ECDF gap peaks at v=2 with |2·2 − 1·2| = 2
    val r = ks(Seq(("A", 1.0), ("A", 2.0), ("B", 1.0), ("B", 3.0)))
    assert(r.getAs[Double]("ks_d") == 0.5 && r.getAs[Double]("d_at_value") == 2.0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    // identical multisets: D = 0, argmax tie resolves to the smallest value
    val same = ks(Seq(("A", 5.0), ("A", 7.0), ("B", 5.0), ("B", 7.0)))
    assert(same.getAs[Double]("ks_d") == 0.0 && same.getAs[Double]("d_at_value") == 5.0)
    // fully separated samples: D = 1 exactly, at A's maximum
    val far = ks(Seq(("A", 1.0), ("A", 2.0), ("B", 101.0), ("B", 102.0)))
    assert(far.getAs[Double]("ks_d") == 1.0 && far.getAs[Double]("d_at_value") == 2.0)
    // fixture: same generator for both flags → near-zero drift, exact
    // result stable under repartitioning (distributed prefix sum)
    val li = Tables.lineitem(spark, sfDir)
    val a = Profiling.ksDrift(li, "l_returnflag", "l_extendedprice", "A", "R").collect().head
    val b = Profiling.ksDrift(li.repartition(13), "l_returnflag", "l_extendedprice", "A", "R")
      .collect().head
    assert(a.toSeq == b.toSeq, "partitioning must not change the exact statistic")
    assert(a.getAs[Double]("ks_d") < 0.1, "same distribution → small D")
  }

  test("rfmSegments: scores in 1..4, customers conserved, spend conserved, quartile marginals balanced") {
    val orders = Tables.orders(spark, sfDir)
    val out = Profiling.rfmSegments(orders).cache()
    try {
      val rows = out.collect()
      assert(rows.forall(r => (1L to 4L).contains(r.getLong(0)) &&
        (1L to 4L).contains(r.getLong(1)) && (1L to 4L).contains(r.getLong(2))))
      val nCust = orders.select("o_custkey").distinct().count()
      assert(rows.map(_.getLong(3)).sum == nCust)
      // spend conserved through the decimal-exact sums
      val total = orders.agg(Num.exactSum(col("o_totalprice"))).head.getDouble(0)
      assert(math.abs(rows.map(_.getDouble(4)).sum - total) < 1e-3)
      // each monetary quartile holds 15-35% of customers (balanced-ish:
      // spend is near-continuous so quartiles split cleanly)
      val mMarg = rows.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(3)).sum).toMap
      mMarg.values.foreach(v =>
        assert(v > nCust * 0.15 && v < nCust * 0.35, s"m marginal $v of $nCust"))
    } finally out.unpersist()
  }

  test("winsorizeReport: hand-computed rank bounds and clipped mean; constant group clips nothing; repartition-invariant") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("g", i.toDouble)) ++
      (1 to 5).map(_ => ("k", 7.0))).toDF("flag", "v")
    val out = Profiling.winsorizeReport(df, "flag", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getLong(5),
         r.getDouble(6), r.getDouble(7))).toMap
    // g: targets rank 1 and 99 → bounds 1.0 / 99.0; only 100.0 clips high
    assert(out("g") == ((100L, 1.0, 99.0, 0L, 1L, 50.5, 50.49)))
    // k: constant values → bounds equal the constant, nothing clips
    assert(out("k") == ((5L, 7.0, 7.0, 0L, 0L, 7.0, 7.0)))
    val re = Profiling.winsorizeReport(df.repartition(11), "flag", "v")
      .collect().map(_.toSeq).toSeq
    assert(re == Profiling.winsorizeReport(df, "flag", "v").collect().map(_.toSeq).toSeq)
  }

  test("keySkew: uniform keys score skew 1 / ratio ~1; a hot key inflates skew and depresses entropy") {
    import spark.implicits._
    val uniform = (1 to 8).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("event_id", "k")
    val u = Profiling.keySkew(uniform, "k").collect().head
    assert(u.getLong(1) == 8L && u.getLong(2) == 2L && u.getLong(3) == 4L)
    assert(u.getDouble(4) == 1.0) // skew factor: max/mean exactly 1
    assert(u.getDouble(5) == 1.0) // 2 keys, top10 covers everything
    assert(math.abs(u.getDouble(6) - math.log(2)) < 1e-4)
    assert(math.abs(u.getDouble(7) - 1.0) < 1e-4)
    val skewed = ((1 to 90).map(i => (i.toLong, "hot")) ++
      (91 to 100).map(i => (i.toLong, s"k$i"))).toDF("event_id", "k")
    val s = Profiling.keySkew(skewed, "k").collect().head
    assert(s.getLong(2) == 11L && s.getLong(3) == 90L)
    assert(s.getDouble(4) == math.floor(90.0 * 11.0 / 100.0 * 1e6 + 0.5) / 1e6)
    assert(s.getDouble(7) < 0.25, "hot key must depress the entropy ratio")
    // real fixture: both profiled key columns report, ratios in (0, 1]
    val real = Profiling.keySkew(Tables.events(spark, sfDir), "user_id").collect().head
    assert(real.getLong(2) > 1L && real.getDouble(7) > 0.0 && real.getDouble(7) <= 1.0 + 1e-6)
  }

  test("chiSquareDrift: hand-computed 2x2 table; proportional halves score exactly 0; terms non-negative") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // base: 30 a, 10 b; cur: 10 a, 30 b → classic 2x2, expected 20 each
    val rows = (1 to 30).map(i => (i.toLong, ts("2024-01-10 00:00:00"), "a")) ++
      (31 to 40).map(i => (i.toLong, ts("2024-01-10 00:00:00"), "b")) ++
      (41 to 50).map(i => (i.toLong, ts("2024-01-20 00:00:00"), "a")) ++
      (51 to 80).map(i => (i.toLong, ts("2024-01-20 00:00:00"), "b"))
    val df = rows.toDF("event_id", "ts", "event_type")
    val out = Profiling.chiSquareDrift(df, "event_type", "ts", "2024-01-16 00:00:00")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // exp = 40*40/80 = 20 per cell; term per category = 100/20 + 100/20 = 10
    assert(out("a") == ((30L, 10L, 20.0, 20.0, 10.0)))
    assert(out("b") == ((10L, 30L, 20.0, 20.0, 10.0)))
    // proportional halves (same distribution, different sizes) → 0 terms
    val prop = ((1 to 20).map(i => (i.toLong, ts("2024-01-10 00:00:00"), "a")) ++
      (21 to 30).map(i => (i.toLong, ts("2024-01-10 00:00:00"), "b")) ++
      (31 to 70).map(i => (i.toLong, ts("2024-01-20 00:00:00"), "a")) ++
      (71 to 90).map(i => (i.toLong, ts("2024-01-20 00:00:00"), "b")))
      .toDF("event_id", "ts", "event_type")
    val zero = Profiling.chiSquareDrift(prop, "event_type", "ts", "2024-01-16 00:00:00").collect()
    assert(zero.forall(_.getDouble(5) == 0.0), "homogeneous slices must score exactly 0")
    // real fixture: one row per event_type, all terms finite and >= 0
    val real = Profiling.chiSquareDrift(Tables.events(spark, sfDir),
      "event_type", "ts", "2024-01-16 00:00:00").collect()
    val types = Tables.events(spark, sfDir).select("event_type").distinct().count()
    assert(real.length == types)
    assert(real.forall(r => r.getDouble(5) >= 0.0 && !r.getDouble(5).isNaN))
  }

  test("outlierReport: hand-computed Tukey fences on a planted outlier; clean group reports zero") {
    import spark.implicits._
    // g1 = [1,2,3,4,100]: interpolated q1 = 2, q3 = 4, IQR = 2,
    // fences (-1, 7) -> exactly the 100 is outside; g2 uniform = clean
    val df = (Seq((1.0, "g1"), (2.0, "g1"), (3.0, "g1"), (4.0, "g1"), (100.0, "g1")) ++
      (1 to 4).map(i => (i.toDouble, "g2"))).toDF("x", "grp")
    val out = Profiling.outlierReport(df, "grp", "x").collect()
      .map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getAs[Long]("n") == 5L)
    assert(g1.getAs[Double]("q1") == 2.0 && g1.getAs[Double]("q3") == 4.0)
    assert(g1.getAs[Double]("lo_fence") == -1.0 && g1.getAs[Double]("hi_fence") == 7.0)
    assert(g1.getAs[Long]("n_low") == 0L && g1.getAs[Long]("n_high") == 1L)
    assert(g1.getAs[Double]("outlier_share") == 0.2)
    val g2 = out("g2")
    assert(g2.getAs[Long]("n_low") == 0L && g2.getAs[Long]("n_high") == 0L)
    assert(g2.getAs[Double]("outlier_share") == 0.0)
    // null values are excluded, not counted as outliers
    val withNull = df.unionByName(Seq((Option.empty[Double], "g1"))
      .toDF("x", "grp"))
    assert(Profiling.outlierReport(withNull, "grp", "x")
      .filter(col("grp") === "g1").head().getAs[Long]("n") == 5L)
  }

  test("sampleQuantiles: group smaller than k -> estimate IS exact; audit delta zero") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i * 13 % 97).toDouble, "g"))
      .toDF("id", "x", "grp")
    val out = Profiling.sampleQuantiles(df, "grp", "x", col("id"), k = 256).head()
    assert(out.getAs[Long]("n_rows") == 100L && out.getAs[Long]("n_sample") == 100L)
    assert(out.getAs[Double]("est_p25") == out.getAs[Double]("p25"))
    assert(out.getAs[Double]("est_p50") == out.getAs[Double]("p50"))
    assert(out.getAs[Double]("est_p75") == out.getAs[Double]("p75"))
    assert(out.getAs[Double]("err_p50") == 0.0)
  }

  test("sampleQuantiles: estimate = exact quantiles OF THE SAMPLE; partitioning-stable; bounded rank error on the fixture") {
    val li = Tables.lineitem(spark, sfDir)
    val key = call_function("splitmix64", col("l_orderkey"))
      .bitwiseXOR(col("l_linenumber").cast("long"))
    val rows = Profiling.sampleQuantiles(li, "l_returnflag", "l_extendedprice", key)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sample") == math.min(r.getAs[Long]("n_rows"), 256L))
      // a 256-row uniform sample's median sits near the true median:
      // generous deterministic bound — within the exact IQR
      val iqr = r.getAs[Double]("p75") - r.getAs[Double]("p25")
      assert(r.getAs[Double]("err_p50") <= iqr,
        s"${r.getAs[String]("l_returnflag")}: err ${r.getAs[Double]("err_p50")} vs IQR $iqr")
    }
    val again = Profiling.sampleQuantiles(li.repartition(13),
      "l_returnflag", "l_extendedprice", key).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("sampleQuantiles: the sample selection is WindowGroupLimit-pruned (map tasks forward <= k rows/group)") {
    val li = Tables.lineitem(spark, sfDir)
    val key = call_function("splitmix64", col("l_orderkey"))
      .bitwiseXOR(col("l_linenumber").cast("long"))
    val plan = Profiling.sampleQuantiles(li, "l_returnflag", "l_extendedprice", key)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pruning in:\n$plan")
  }

  test("sampleQuantileStatsOf projects the same estimates the batch window path lands on") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        call_function("splitmix64", col("event_id")).as("h"),
        col("value").cast("double").as("x"))
      .filter(col("x").isNotNull)
    val sketches = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        call_function("bottomk_pairs", col("h"), col("x"), lit(256)).as("sk"))
    val viaAgg = Profiling.sampleQuantileStatsOf(sketches, "event_type")
      .collect().map(_.toSeq).toSeq
    // window-rank formulation of the same estimator
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"), col("x"))
    val viaRank = ev.withColumn("rn", row_number().over(w)).filter(col("rn") <= 256)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sample"),
        Num.roundTo(percentile(col("x"), lit(0.25)), 6).as("est_p25"),
        Num.roundTo(percentile(col("x"), lit(0.5)), 6).as("est_p50"),
        Num.roundTo(percentile(col("x"), lit(0.75)), 6).as("est_p75"))
      .join(ev.groupBy("event_type").agg(count(lit(1)).as("n_rows")), Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("n_sample"),
        col("est_p25"), col("est_p50"), col("est_p75"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(viaAgg.nonEmpty && viaAgg == viaRank)
  }

  test("snapshotDiffReport: all four statuses on a hand fixture; null text present in both reads unchanged") {
    import spark.implicits._
    val a = Seq((1L, Option("same"), "s1"), (2L, Option("old"), "s1"),
      (3L, Option("gone"), "s2"), (5L, Option.empty[String], "s2"))
      .toDF("doc_id", "text", "source")
    val b = Seq((1L, Option("same"), "s1"), (2L, Option("new"), "s1"),
      (4L, Option("fresh"), "s2"), (5L, Option.empty[String], "s2"))
      .toDF("doc_id", "text", "source")
    val out = Profiling.snapshotDiffReport(a, b).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("added", "s2")) == ((1L, 5L)))      // doc 4 "fresh"
    assert(out(("removed", "s2")) == ((1L, 4L)))    // doc 3 "gone"
    assert(out(("changed", "s1")) == ((1L, 3L)))    // doc 2 old->new
    assert(out(("unchanged", "s1")) == ((1L, 4L)))  // doc 1
    assert(out(("unchanged", "s2")) == ((1L, 0L)))  // doc 5: null == null
    assert(out.size == 5)
  }

  test("incrementalProfile == recompute, including a doc whose group MOVED between snapshots") {
    import spark.implicits._
    val a = Seq((1L, Option("aaaa"), "en", "s1"), (2L, Option("bb"), "en", "s1"),
      (3L, Option("cc"), "de", "s2"), (5L, Option.empty[String], "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    // doc 2 changes AND moves s1->s2; doc 3 removed; doc 4 added;
    // docs 1 (non-null) and 5 (null text) unchanged
    val b = Seq((1L, Option("aaaa"), "en", "s1"), (2L, Option("bbb"), "en", "s2"),
      (4L, Option("dddd"), "de", "s2"), (5L, Option.empty[String], "de", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val inc = Profiling.incrementalProfile(a, b).collect().map(_.toSeq).toSeq
    val recompute = b.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(length(col("text")).cast("long"), lit(0L))).as("total_chars"))
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
        graft.ops.Num.roundTo(col("total_chars").cast("double") /
          col("n_docs").cast("double"), 4).as("avg_chars"))
      .orderBy("lang", "source").collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty && inc == recompute, s"inc=$inc vs recompute=$recompute")
    // a group emptied by the diff (en/s1 keeps doc 1 only) never goes
    // negative; identical snapshots are a no-op adjustment
    val same = Profiling.incrementalProfile(a, a).collect().map(_.toSeq).toSeq
    val aProf = Profiling.incrementalProfile(a.limit(0), a).collect().map(_.toSeq).toSeq
    assert(same == aProf)
  }

  test("incrementalProfile: content-UNCHANGED group move and NULL group keys still equal recompute") {
    import spark.implicits._
    // doc 2: text byte-identical, source moves s1->s2 (the r16-advice
    // gap: an unchanged-hash row must still produce adjustment legs);
    // doc 6: NULL lang in both snapshots (null-safe group identity);
    // doc 7: moves INTO the NULL-lang group with unchanged text
    val a = Seq((1L, Option("aaaa"), Option("en"), "s1"),
      (2L, Option("bb"), Option("en"), "s1"),
      (6L, Option("nn"), Option.empty[String], "s3"),
      (7L, Option("mm"), Option("de"), "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val b = Seq((1L, Option("aaaa"), Option("en"), "s1"),
      (2L, Option("bb"), Option("en"), "s2"),
      (6L, Option("nn"), Option.empty[String], "s3"),
      (7L, Option("mm"), Option.empty[String], "s3"))
      .toDF("doc_id", "text", "lang", "source")
    val inc = Profiling.incrementalProfile(a, b).collect().map(_.toSeq).toSeq
    val recompute = b.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(length(col("text")).cast("long"), lit(0L))).as("total_chars"))
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"),
        graft.ops.Num.roundTo(col("total_chars").cast("double") /
          col("n_docs").cast("double"), 4).as("avg_chars"))
      .orderBy("lang", "source").collect().map(_.toSeq).toSeq
    assert(inc.nonEmpty && inc == recompute, s"inc=$inc vs recompute=$recompute")
    // the moved-but-unchanged doc really is attributed to its NEW group
    val bySrc = inc.map(r => (r(0), r(1)) -> r(2)).toMap
    assert(bySrc(("en", "s2")) == 1L)                // doc 2 landed in s2
    assert(bySrc((null, "s3")) == 2L)                // docs 6 and 7 share the NULL-lang group
  }

  test("sampleQuantiles: NULL rowKeys are excluded everywhere (r15 ADVICE) — window, audit, and aggregate paths agree") {
    import spark.implicits._
    // 3 null-key rows carry extreme values: if any path kept them, its
    // quantiles (or n_rows) would shift — Spark windows sort NULLs
    // first (always sampled), DuckDB sorts them last, the bottomk_pairs
    // aggregate drops them; the contract is they count NOWHERE.
    val df = (Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0))
      .map { case (k, x) => (Option(k), x) } ++
      Seq((Option.empty[Long], 1e9), (Option.empty[Long], -1e9), (Option.empty[Long], 42.0)))
      .toDF("k", "x").withColumn("grp", lit("g"))
    val out = Profiling.sampleQuantiles(df, "grp", "x", col("k"), k = 256).head()
    assert(out.getAs[Long]("n_rows") == 5L, s"null-key rows leaked into the audit: $out")
    assert(out.getAs[Long]("n_sample") == 5L)
    assert(out.getAs[Double]("p50") == 3.0 && out.getAs[Double]("est_p50") == 3.0)
    // the aggregate path lands on the same sample
    val viaAgg = Profiling.sampleQuantileStatsOf(
      df.filter(col("k").isNotNull)
        .select(col("grp"), call_function("splitmix64", col("k")).as("h"),
          col("x").cast("double").as("x"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_rows"),
          call_function("bottomk_pairs", col("h"), col("x"), lit(256)).as("sk")),
      "grp").head()
    assert(viaAgg.getAs[Long]("n_rows") == 5L && viaAgg.getAs[Double]("est_p50") == 3.0)
  }
}
