package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binned range join: must equal the naive inequality join row-for-row
  * while planning as a hash/sort-merge equi-join — never a nested loop.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def facts = Seq(
    (1L, 3L), (2L, 7L), (3L, 10L), (4L, 21L), (5L, 20L), (6L, -5L)
  ).toDF("fact_id", "p")
  private def intervals = Seq(
    (10L, 0L, 8L),    // catches p=3,7
    (11L, 7L, 21L),   // catches 7,10,20 (21 excluded: half-open)
    (12L, -10L, -1L), // catches -5
    (13L, 5L, 5L),    // empty
    (14L, 9L, 2L)     // inverted
  ).toDF("iv_id", "s", "e")

  test("matches the naive inequality join exactly, across bin widths") {
    val naive = facts.join(intervals, col("p") >= col("s") && col("p") < col("e"))
      .select("fact_id", "iv_id").orderBy("fact_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(naive.nonEmpty)
    for (bw <- Seq(1L, 3L, 7L, 100L)) {
      val binned = AsOf.rangeJoin(facts, "p", intervals, "s", "e", binWidth = bw)
        .select("fact_id", "iv_id").orderBy("fact_id", "iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(binned == naive, s"binWidth=$bw diverged")
    }
  }

  test("negative-domain points bin consistently (floor, not truncation)") {
    // p = -5 with bw=3: floor(-5/3) = -2; interval [-10,-1) spans bins
    // floor(-10/3)=-4 .. floor(-2/3)=-1 — must include -2
    val out = AsOf.rangeJoin(facts.filter(col("p") < 0), "p",
        intervals.filter(col("iv_id") === 12), "s", "e", binWidth = 3)
      .select("fact_id", "iv_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((6L, 12L)))
  }

  test("plans as an equi-join: no nested loop, no cartesian product") {
    val plan = AsOf.rangeJoin(facts, "p", intervals, "s", "e", binWidth = 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // and the same must hold for the registered sf-scale query shape
    val qplan = AsOf.urgentWeekShipVolume(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!qplan.contains("BroadcastNestedLoopJoin"), qplan)
    assert(!qplan.contains("CartesianProduct"), qplan)
  }

  test("equiKeys join through the hash: per-key containment only") {
    val f = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("fid", "fk", "p")
    val iv = Seq((10L, "a", 0L, 10L)).toDF("ivid", "ik", "s", "e")
    val out = AsOf.rangeJoin(f, "p", iv, "s", "e", binWidth = 4,
        equiKeys = Seq("fk" -> "ik"))
      .select("fid").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), s"got $out — key b must not match a's interval")
  }

  test("registered query equals the naive formulation at fixture scale") {
    val fast = AsOf.urgentWeekShipVolume(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val o = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
    val l = Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").cast("date").as("sd"))
    val naive = o.join(l, col("sd") >= col("od") && col("sd") < date_add(col("od"), 7))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(fast.nonEmpty && fast == naive)
  }
}
