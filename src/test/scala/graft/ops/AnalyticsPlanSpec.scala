package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the properties that matter at 100 TB — dim joins
  * broadcast (no lineitem shuffle for them), filters reach the parquet
  * scan, aggregates keep partial (map-side) phases. Checked against the
  * optimized physical plan text.
  */
class AnalyticsPlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q3: customer dim joins as broadcast, orderdate/shipdate filters push down") {
    val p = plan(Analytics.q3ShippingPriority(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull"), s"no pushed filters in:\n$p")
  }

  test("q5: the whole dim chain broadcasts — at most one shuffle join") {
    val p = plan(Analytics.q5LocalSupplierVolume(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    val shuffles = "SortMergeJoin".r.findAllIn(p).length +
                   "ShuffledHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$p")
    assert(shuffles <= 1, s"expected <=1 shuffled join, got $shuffles:\n$p")
  }

  test("w5: bounded-heap top-k per group plans with NO window sort and a partial aggregate") {
    val df = Analytics.topCustomersPerNation(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Window"), s"w5 must not use a window sort:\n$p")
    assert(p.contains("partial_topkbyscore"),
      s"expected a map-side partial topk aggregate in:\n$p")
    // and it equals the window formulation row for row
    import org.apache.spark.sql.expressions.Window
    val spend = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(Num.exactSum(col("o_totalprice")).as("spend"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("spend").desc, col("c_custkey"))
    val windowed = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(spend, col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("n_name", "rank", "c_custkey", "spend")
      .orderBy("n_name", "rank")
      .collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).toSeq == windowed.toSeq)
  }

  test("c4_pack: no global window over data — unpartitioned windows only above aggregates") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = TextStats.packChunks(TextStats.chunk(Tables.documents(spark, sfDir)))
      .queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the only single-task window allowed is the one over the
      // one-row-per-partition offsets table — its input must already be
      // aggregated, never the raw chunk relation
      assert(w.collectFirst { case a: Aggregate => a }.isDefined,
        s"global window over un-aggregated data:\n$w")
    }
  }

  test("x6 cross dedup: no text strings ride the shingle join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types.StringType
    val docs = Tables.documents(spark, sfDir)
    val lp = Dedup.ngramJaccardCross(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1),
        threshold = 0.5)
      .queryExecution.optimizedPlan
    val shingleJoins = lp.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "shingle")) => j
    }
    assert(shingleJoins.nonEmpty, "expected a join keyed on `shingle`")
    shingleJoins.foreach { j =>
      val strings = j.children.flatMap(_.output).filter(_.dataType == StringType)
      assert(strings.isEmpty,
        s"string columns ride the shingle join: ${strings.map(_.name)}")
    }
  }

  test("v7 knn eval: scoring keeps the partial (map-side) bounded-heap phase") {
    val p = plan(Similarity.knnLabelAccuracy(Tables.embeddings(spark, sfDir), k = 3))
    assert(p.toLowerCase.contains("partial_topkbyscore")
      || p.toLowerCase.contains("partial_"), s"no partial top-k phase in:\n$p")
  }

  test("v9 knn sampled: stride filter sits below the scoring join — query side shrinks first") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, Join => LJoin}
    val lp = Similarity.knnLabelAccuracySampled(Tables.embeddings(spark, sfDir), stride = 10)
      .queryExecution.optimizedPlan
    val joins = lp.collect { case j: LJoin => j }
    assert(joins.nonEmpty)
    // the n²→n²/stride claim: some join input is already stride-filtered,
    // i.e. the sample is taken BEFORE any scoring/voting join runs
    val strideBelowJoin = joins.exists(_.children.exists(side =>
      side.collect { case f: LFilter if f.condition.toString.contains("% 10") => f }.nonEmpty))
    assert(strideBelowJoin, s"no stride filter below any join:\n$lp")
  }

  test("t9 over materialized pairs: zero shingle explodes — the x4 pipeline runs once per corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    val docs = Tables.documents(spark, sfDir)
    // the combined x4+t9 flow: pairs materialized once, report reads them
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.5).localCheckpoint()
    val lp = TextStats.leakageReport(docs, pairs).queryExecution.optimizedPlan
    val generates = lp.collect { case g: Generate => g }
    assert(generates.isEmpty,
      s"report re-runs shingle generation (${generates.size} Generate nodes):\n$lp")
  }

  test("q1: aggregation has a partial (map-side) phase before the shuffle") {
    val p = plan(Analytics.q1PricingSummary(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert(p.toLowerCase.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("l1 preview limit compiles to CollectLimit — no full-scan sort") {
    val p = plan(graft.serve.Queries.preview(spark, {
      Tables.orders(spark, sfDir).createOrReplaceTempView("orders_plan_v")
      "orders_plan_v"
    }))
    assert(p.contains("CollectLimit"), p)
  }

  test("semi/anti joins stay key-only (no payload columns shuffled)") {
    val semi = plan(Analytics.customersWithUrgentOrders(spark, sfDir))
    assert(semi.contains("LeftSemi"), semi)
    val anti = plan(Analytics.customersWithoutOrders(spark, sfDir))
    assert(anti.contains("LeftAnti"), anti)
  }

  test("column pruning reaches the parquet scan") {
    // q1 projects 7 of 11 lineitem columns — ReadSchema must not carry the rest
    val q1 = plan(Analytics.q1PricingSummary(spark, sfDir))
    assert(!q1.contains("l_partkey") && !q1.contains("l_suppkey"),
      s"unpruned lineitem columns in:\n$q1")
    // t1 needs only doc_id + text from documents
    val t1 = plan(TextStats.qualityScore(Tables.documents(spark, sfDir))
      .select("doc_id", "quality_score"))
    assert(!t1.contains("n_chars") && !t1.contains("source"),
      s"unpruned documents columns in:\n$t1")
  }

  test("q4: existence is a LEFT SEMI join — multi-late orders count once") {
    val p = plan(Analytics.q4OrderPriority(spark, sfDir))
    assert(p.contains("LeftSemi"), p)
    // total counted orders can never exceed the orders in the window
    val window = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp")).count()
    val counted = Analytics.q4OrderPriority(spark, sfDir)
      .agg(sum("order_count")).collect().head.getLong(0)
    assert(counted <= window)
  }

  test("q10/q14/q19: part and customer dims broadcast; q14 share in [0,100]") {
    assert(plan(Analytics.q10ReturnedItems(spark, sfDir)).contains("BroadcastHashJoin"))
    assert(plan(Analytics.q14PromoRevenue(spark, sfDir)).contains("BroadcastHashJoin"))
    assert(plan(Analytics.q19DisjunctiveRevenue(spark, sfDir)).contains("BroadcastHashJoin"))
    val pct = Analytics.q14PromoRevenue(spark, sfDir).collect().head.getDouble(0)
    assert(pct >= 0.0 && pct <= 100.0)
  }

  test("q13: outer join keeps zero-order customers — buckets partition the customer set") {
    val p = plan(Analytics.q13CustomerDistribution(spark, sfDir))
    assert(p.contains("LeftOuter"), s"no left-outer join in:\n$p")
    val customers = Tables.customer(spark, sfDir).count()
    val bucketed = Analytics.q13CustomerDistribution(spark, sfDir)
      .agg(sum("custdist")).collect().head.getLong(0)
    assert(bucketed == customers, s"distribution covers $bucketed of $customers customers")
  }

  test("q15: scalar max broadcasts back — every returned supplier carries the max revenue") {
    val df = Analytics.q15TopSupplier(spark, sfDir)
    assert(plan(df).contains("BroadcastHashJoin"), plan(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("q17: both the brand parts and the per-part thresholds broadcast — lineitem never shuffles") {
    val p = plan(Analytics.q17SmallQuantityRevenue(spark, sfDir))
    val shuffleJoins = "SortMergeJoin".r.findAllIn(p).length +
                       "ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins == 0, s"expected 0 shuffled joins, got $shuffleJoins:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("q18: top-k is a TakeOrdered, and every survivor clears the quantity threshold") {
    val df = Analytics.q18LargeOrders(spark, sfDir)
    assert(plan(df).contains("TakeOrdered"), plan(df))
    assert(df.collect().forall(_.getAs[Double]("total_qty") > 250.0))
  }

  test("q21: no lineitem self-join — the order-level counts come from a window over the pair aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val lp = Analytics.q21WaitingSuppliers(spark, sfDir).queryExecution.optimizedPlan
    // joins: lineitem⋈orders + supplier lookup — never lineitem⋈lineitem,
    // so the plan carries exactly 2 joins
    val joins = lp.collect { case j: LJoin => j }
    assert(joins.length == 2, s"expected 2 joins (li⋈ord, supplier), got ${joins.length}:\n$lp")
    val counted = Analytics.q21WaitingSuppliers(spark, sfDir)
      .agg(sum("numwait")).collect().head.getLong(0)
    assert(counted > 0)
  }

  test("q22: anti join + one-row scalar broadcast; survivors beat the average") {
    val df = Analytics.q22IdleBalances(spark, sfDir)
    val p = plan(df)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("Broadcast"), p)
    assert(df.collect().forall(_.getAs[Long]("numcust") > 0))
  }

  test("d3 hll union: merged half-sketches estimate within 5% of exact, and equal the one-pass sketch") {
    val exact = Analytics.orderCountsDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Analytics.hllUnionDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)) <= math.max(1L, (exact(k) * 0.05).toLong),
        s"$k: est $est vs exact ${exact(k)}")
    }
    // sketch-union tracks the one-pass sketch (not bit-identical: the
    // union's internal HLL mode can differ, shifting estimates ~1%)
    val onePass = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_orderkey"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (k, est) =>
      assert(math.abs(est - onePass(k)) <= math.max(1L, (onePass(k) * 0.02).toLong),
        s"$k: merged $est vs one-pass ${onePass(k)}")
    }
  }

  test("g2 unpivot inverts g1: melt(pivot) == the dense zero-filled grid") {
    val long = Analytics.orderStatusUnpivot(spark, sfDir).collect()
    assert(long.length == Analytics.orderStatusPivot(spark, sfDir).count() * 3)
    val total = long.map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables.orders(spark, sfDir).count())
  }

  test("w3 shares sum to 1 per region") {
    val byRegion = Analytics.regionRevenueShare(spark, sfDir).collect()
      .groupBy(_.getString(0))
    byRegion.values.foreach { rows =>
      val s = rows.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"share sum $s")
    }
  }

  test("q7/q8: the nation-pair and market-share joins keep one fact shuffle, dims broadcast") {
    for (df <- Seq(Analytics.q7NationVolume(spark, sfDir),
                   Analytics.q8MarketShare(spark, sfDir))) {
      val p = plan(df)
      val shuffleJoins = "SortMergeJoin".r.findAllIn(p).length +
                         "ShuffledHashJoin".r.findAllIn(p).length
      assert(shuffleJoins <= 1, s"expected <=1 shuffled join:\n$p")
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    }
    val share = Analytics.q8MarketShare(spark, sfDir).collect()
    assert(share.forall { r =>
      val s = r.getAs[Double]("mkt_share"); s >= 0.0 && s <= 1.0
    })
  }

  test("e12 gap-fill: dense grid, conservation, gaps flagged exactly where counts are zero") {
    val spine = EventWindows.hourlySpine(spark, sfDir).collect()
    val types = spine.map(_.getString(1)).distinct.length
    assert(spine.length % types == 0) // every type spans the same dense grid
    val total = spine.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sfDir).count())
    spine.foreach(r =>
      assert(r.getAs[Boolean]("is_gap") == (r.getAs[Long]("n_events") == 0L)))
    assert(spine.exists(_.getAs[Boolean]("is_gap"))) // fixture has real gaps
  }

  test("analytics results sanity at sf0.001") {
    assert(Analytics.q1PricingSummary(spark, sfDir).count() == 6)
    assert(Analytics.orderRollup(spark, sfDir).count() == 19)
    assert(Analytics.topOrdersPerCustomer(spark, sfDir).count() > 0)
  }

  test("countMinUsers: never undercounts on the fixture; a lone key estimates exactly") {
    import spark.implicits._
    val rows = Analytics.countMinUsers(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "CMS must never undercount")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1) && r.getLong(3) >= 0L)
    }
    // single-user corpus: every cell the key touches holds only its own
    // count, so the min-over-rows estimate is exact
    val d = tmpDir("cms_single")
    (1 to 37).map(i => (i.toLong, java.sql.Timestamp.valueOf("2024-01-10 00:00:00"),
        9L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(d.resolve("events.parquet").toString)
    val one = Analytics.countMinUsers(spark, d.toString).collect()
    assert(one.length == 1 && one.head.getLong(1) == 37L &&
      one.head.getLong(2) == 37L && one.head.getLong(3) == 0L)
  }
}
