package graft.ops

import graft.SparkSpec
import graft.tools.GenData
import org.apache.spark.sql.functions._

/** partsupp suite (TPC-H Q2/Q11/Q16/Q20 shapes) — the driver fixtures
  * ship no partsupp, so these gate against independent SQL-TEXT
  * references (Spark SQL with correlated subqueries, the literal TPC-H
  * formulations) over self-generated deterministic data
  * ([[graft.tools.GenData.partsupp]]).
  */
class PartsuppSpec extends SparkSpec {

  private lazy val tables: Unit = {
    val nPart = 2000L; val nSupp = 100L; val nOrders = 400L
    GenData.partsupp(spark, nPart, nSupp).createOrReplaceTempView("partsupp")
    GenData.part(spark, nPart).createOrReplaceTempView("part")
    GenData.supplier(spark, nSupp).createOrReplaceTempView("supplier")
    GenData.nation(spark).createOrReplaceTempView("nation")
    GenData.region(spark).createOrReplaceTempView("region")
    GenData.lineitem(spark, 4000L, nOrders, nPart, nSupp)
      .createOrReplaceTempView("lineitem")
  }
  private def t(name: String) = { tables; spark.table(name) }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q2: min-cost supplier matches the correlated-subquery reference") {
    val got = Analytics.q2MinCostSupplier(t("partsupp"), t("part"), t("supplier"),
      t("nation"), t("region"), sizeMax = 15, ptype = "STANDARD")
    val ref = spark.sql(
      """SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        |FROM partsupp, part, supplier, nation, region
        |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
        |  AND p_size <= 15 AND p_type = 'STANDARD'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND ps_supplycost = (
        |    SELECT min(ps_supplycost)
        |    FROM partsupp ps2, supplier s2, nation n2, region r2
        |    WHERE ps2.ps_partkey = partsupp.ps_partkey
        |      AND s2.s_suppkey = ps2.ps_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
    assert(rows(got).nonEmpty)
    assert(rows(got) == rows(ref))
  }

  test("q11: important stock matches the HAVING-threshold reference") {
    val got = Analytics.q11ImportantStock(t("partsupp"), t("supplier"), t("nation"),
      nationName = "NATION_7", fraction = 0.001)
    val ref = spark.sql(
      """SELECT ps_partkey,
        |  CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,6))) AS DOUBLE) AS stock_value
        |FROM partsupp, supplier, nation
        |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_7'
        |GROUP BY ps_partkey
        |HAVING stock_value > (
        |  SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,6))) AS DOUBLE) * 0.001
        |  FROM partsupp, supplier, nation
        |  WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_7')
        |ORDER BY stock_value DESC, ps_partkey""".stripMargin)
    assert(rows(got).nonEmpty)
    assert(rows(got) == rows(ref))
  }

  test("q16: supplier counts match the NOT IN reference") {
    val got = Analytics.q16SupplierCount(t("partsupp"), t("part"), t("supplier"))
    val ref = spark.sql(
      """SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp, part
        |WHERE p_partkey = ps_partkey
        |  AND p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND ps_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
    assert(rows(got).nonEmpty)
    assert(rows(got) == rows(ref))
  }

  test("q20: promotion suppliers match the nested-IN reference") {
    val got = Analytics.q20PromotionSuppliers(t("partsupp"), t("part"), t("supplier"),
      t("nation"), t("lineitem"), namePrefix = "green", nationName = Some("NATION_3"))
    val ref = spark.sql(
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier, nation
        |WHERE s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |  AND s_suppkey IN (
        |    SELECT ps_suppkey FROM partsupp
        |    WHERE ps_partkey IN (
        |      SELECT p_partkey FROM part WHERE p_name LIKE 'green%')
        |    AND CAST(ps_availqty AS DOUBLE) > (
        |      SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) * 0.5
        |      FROM lineitem
        |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |        AND l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1997-01-01'))
        |ORDER BY s_name""".stripMargin)
    assert(rows(got).nonEmpty)
    assert(rows(got) == rows(ref))
  }

  test("partsupp generator: (partkey, suppkey) is a genuine primary key, 4 suppliers per part") {
    val ps = t("partsupp")
    assert(ps.count() == 8000L)
    assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() == 8000L)
    assert(ps.groupBy("ps_partkey").count().filter(col("count") =!= 4).count() == 0)
  }

  test("quartet plans: dims broadcast, anti/semi shapes, no cartesian products") {
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // q2: nation/region/part-slice broadcast; the min-cost match is an
    // equi-join, never a nested loop over partsupp
    val p2 = plan(Analytics.q2MinCostSupplier(t("partsupp"), t("part"),
      t("supplier"), t("nation"), t("region"), sizeMax = 15))
    assert(p2.contains("BroadcastHashJoin"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
    // q11: one partsupp shuffle; the grand total rides a one-row
    // broadcast (nested-loop over ONE row, not a data-sized cartesian)
    val p11 = plan(Analytics.q11ImportantStock(t("partsupp"), t("supplier"),
      t("nation"), nationName = "NATION_7"))
    assert(p11.contains("BroadcastHashJoin") && p11.contains("BroadcastNestedLoopJoin"), p11)
    assert(!p11.contains("CartesianProduct"), p11)
    // q16: the NOT IN is a broadcast LEFT ANTI
    val p16 = plan(Analytics.q16SupplierCount(t("partsupp"), t("part"), t("supplier")))
    assert(p16.contains("LeftAnti") && p16.contains("BroadcastHashJoin"), p16)
    // q20: the nested IN ends as a LEFT SEMI into supplier, and the
    // year-quantity aggregate sits BELOW the partsupp join (partial
    // aggregation before the shuffle join, the z2 lever)
    val p20 = plan(Analytics.q20PromotionSuppliers(t("partsupp"), t("part"),
      t("supplier"), t("nation"), t("lineitem")))
    assert(p20.contains("LeftSemi"), p20)
    assert(!p20.contains("CartesianProduct"), p20)
  }
}
