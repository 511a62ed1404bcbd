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

  test("keyHistogram surfaces the hot key first") {
    val big = spark.range(1000).select(
      when(col("id") < 900, 1L).otherwise(col("id")).as("k"))
    val top = Skew.keyHistogram(big, "k", 1).collect().head
    assert(top.getLong(0) == 1L && top.getLong(1) == 900L)
  }

  test("g1 pivot cells reconcile with the rollup totals") {
    val pivoted = Analytics.orderStatusPivot(spark, sfDir)
    val total = pivoted.select(
      sum(col("n_f") + col("n_o") + col("n_p"))).collect().head.getLong(0)
    assert(total == Tables.orders(spark, sfDir).count())
  }
}
