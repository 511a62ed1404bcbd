package graft.etl

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The k3 contract: co-bucketed tables join with ZERO shuffle exchanges.
  * Bucketing pre-pays the join's hash distribution at write time — the
  * 100 TB fact⋈fact shape where a runtime shuffle of either side is the
  * dominant cost. Broadcast is disabled inside the test so the assertion
  * exercises the bucketed sort-merge path, not a small-table shortcut.
  */
class BucketedJoinSpec extends SparkSpec {

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    // executedPlan pre-execution; AQE wraps the real plan
    val p = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    p.collect { case s: ShuffleExchangeExec => s }.size
  }

  test("co-bucketed orders ⋈ lineitem plans with no shuffle exchange") {
    Load.replaceTableBucketed(Tables.orders(spark, sfDir), "orders_bkt_spec", 4, Seq("o_orderkey"))
    Load.replaceTableBucketed(Tables.lineitem(spark, sfDir), "lineitem_bkt_spec", 4, Seq("l_orderkey"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt_spec")
        .join(spark.table("lineitem_bkt_spec"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      assert(shuffles(joined) === 0,
        s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")

      // the same join over raw parquet DOES shuffle both sides — the
      // baseline that bucketing eliminates
      val raw = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("l_extendedprice"))
      assert(shuffles(raw) === 2, "raw parquet join should shuffle both sides")

      // and results are identical: layout changes movement, never rows
      assert(joined.count() === raw.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key also skips the shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val agg = spark.table("lineitem_bkt_spec")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      assert(shuffles(agg) === 0,
        s"groupBy on bucket key should not shuffle:\n${agg.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
