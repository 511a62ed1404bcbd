package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bottomk_pairs aggregate: exact rank-selection semantics, duplicate
  * handling, mergeability — the properties that make p14/st25
  * oracle-replayable and the buffer valid streaming state.
  */
class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  // (h, x) rows with h a mixed unique key, x arbitrary doubles
  private val rows: Seq[(Long, Double)] =
    (1L to 500L).map(i => (Splitmix.mix(i), (i * 37 % 101).toDouble))

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(Long, Double)] =
    df.agg(call_function("bottomk_pairs", col("h"), col("x"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("p")).select(col("p.h"), col("p.x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  private def expectedOf(in: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    in.sortBy(identity)(Ordering.Tuple2(Ordering.Long, Ordering.Double.TotalOrdering)).take(k)

  test("bottomk_pairs = the k (h, x)-smallest pairs, ascending, at any partitioning") {
    val expected = expectedOf(rows, 64)
    assert(sketchOf(rows.toDF("h", "x").repartition(1), 64) == expected)
    assert(sketchOf(rows.toDF("h", "x").repartition(13), 64) == expected)
  }

  test("duplicate pairs are KEPT (multiset, not set — unlike kmv_sketch)") {
    val dup = Seq((1L, 1.0), (1L, 1.0), (2L, 5.0), (2L, 5.0), (3L, 9.0))
    assert(sketchOf(dup.toDF("h", "x"), 4) ==
      Seq((1L, 1.0), (1L, 1.0), (2L, 5.0), (2L, 5.0)))
  }

  test("fewer rows than k: the sample IS the input, sorted") {
    val small = rows.take(20)
    assert(sketchOf(small.toDF("h", "x"), 64) == expectedOf(small, 64))
  }

  test("union-merge of DISJOINT part sketches equals the whole-input sketch (the partial-aggregation contract; overlap would double-count — multiset, not set)") {
    val k = 32
    val (a, b) = (rows.take(250), rows.drop(250)) // a partition of the input
    val whole = sketchOf(rows.toDF("h", "x"), k)
    val merged = expectedOf(sketchOf(a.toDF("h", "x"), k) ++ sketchOf(b.toDF("h", "x"), k), k)
    assert(merged == whole)
  }

  test("selection matches the SQL replay rule: row_number over (h, x) <= k") {
    import org.apache.spark.sql.expressions.Window
    val df = rows.toDF("h", "x")
    val viaRank = df
      .withColumn("rn", row_number().over(Window.orderBy(col("h"), col("x"))))
      .filter(col("rn") <= 64).select("h", "x").orderBy("h", "x")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sketchOf(df, 64) == viaRank)
  }
}
