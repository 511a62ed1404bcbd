package graft.functions

import graft.SparkSpec
import graft.ops.{Analytics, Tables}
import org.apache.spark.sql.functions._

/** KMV sketch aggregate: exact set semantics, mergeability, estimator
  * accuracy — the properties that make `d4`/`d5` oracle-replayable.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val vals: Seq[Long] = (1L to 1000L).map(Splitmix.mix) // incl. negatives

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
    df.agg(call_function("kmv_sketch", col("u"), lit(k)).as("sk"))
      .collect().head.getSeq[Long](0)

  test("kmv_sketch = the k smallest distinct values, at any partitioning, dup-safe") {
    val expected = vals.distinct.sorted.take(64)
    assert(sketchOf(vals.toDF("u").repartition(1), 64) == expected)
    assert(sketchOf(vals.toDF("u").repartition(13), 64) == expected)
    // duplicated input changes nothing — the buffer is a SET
    assert(sketchOf((vals ++ vals ++ vals.take(100)).toDF("u").repartition(7), 64) == expected)
  }

  test("fewer distinct values than k: the sketch IS the distinct set") {
    val small = vals.take(20)
    assert(sketchOf((small ++ small).toDF("u"), 64) == small.distinct.sorted)
  }

  test("union-merge of overlapping half sketches equals the whole-input sketch") {
    val k = 32
    val (a, b) = (vals.take(700), vals.drop(300)) // overlap 300..700
    val whole = sketchOf(vals.toDF("u"), k)
    val skA = sketchOf(a.toDF("u"), k)
    val skB = sketchOf(b.toDF("u"), k)
    // the d5 merge: flatten → distinct → sort → first k
    val merged = (skA ++ skB).distinct.sorted.take(k)
    assert(merged == whole)
  }

  test("estimator lands within 3/sqrt(k) of the exact distinct count (fixture)") {
    val exact = Tables.lineitem(spark, sfDir).select("l_orderkey").distinct().count()
    val est = Analytics.kmvDistinct(spark, sfDir) // k = 256 ⇒ 3σ ≈ 18.75%
      .collect().head.getAs[Double]("est_distinct")
    assert(math.abs(est - exact) / exact < 3.0 / math.sqrt(256.0),
      s"est=$est exact=$exact")
  }

  test("d5 union query: ALL row equals the whole-table d4 sketch stats") {
    val all = Analytics.kmvUnion(spark, sfDir)
      .filter(col("scope") === "ALL").collect().head
    val whole = Analytics.kmvDistinct(spark, sfDir).collect().head
    assert(all.getAs[Long]("kth_min") == whole.getAs[Long]("kth_min"))
    assert(all.getAs[Long]("n_kept") == whole.getAs[Long]("n_kept"))
    assert(all.getAs[Double]("est_distinct") == whole.getAs[Double]("est_distinct"))
  }

  test("theta intersection estimate tracks the exact |A ∩ R| order overlap") {
    val li = Tables.lineitem(spark, sfDir)
    def keys(f: String) =
      li.filter(col("l_returnflag") === f).select("l_orderkey").distinct()
    val exact = keys("A").intersect(keys("R")).count()
    val row = Analytics.kmvIntersect(spark, sfDir).collect().head
    val est = row.getAs[Double]("est_intersect")
    // intersection error compounds two sketches: allow 6/sqrt(k)
    assert(math.abs(est - exact) / exact < 6.0 / math.sqrt(256.0),
      s"est=$est exact=$exact")
    assert(row.getAs[Long]("n_common") > 0)
    // not-full sketches degrade to exact sets: tiny disjoint inputs → 0
    import spark.implicits._
    val d = tmpDir("kmvint")
    (1L to 100L).map(i => (i, if (i <= 50) "A" else "R"))
      .toDF("l_orderkey", "l_returnflag")
      .write.mode("overwrite").parquet(d.resolve("lineitem.parquet").toString)
    val disjoint = Analytics.kmvIntersect(spark, d.toString).collect().head
    assert(disjoint.getAs[Long]("n_common") == 0L)
    assert(disjoint.getAs[Double]("est_intersect") == 0.0)
  }

  test("theta difference estimate tracks exact |A \\ R|; identical sets give exactly 0") {
    val li = Tables.lineitem(spark, sfDir)
    def keys(f: String) =
      li.filter(col("l_returnflag") === f).select("l_orderkey").distinct()
    val exact = keys("A").except(keys("R")).count()
    val row = Analytics.kmvDifference(spark, sfDir).collect().head
    val est = row.getAs[Double]("est_diff")
    assert(math.abs(est - exact) / exact < 6.0 / math.sqrt(256.0),
      s"est=$est exact=$exact")
    // A \ A: coordinated samples coincide — exactly zero, no estimate noise
    val same = Analytics.kmvDifference(spark, sfDir, flagA = "A", flagB = "A")
      .collect().head
    assert(same.getAs[Long]("n_only_a") == 0L && same.getAs[Double]("est_diff") == 0.0)
    // tiny disjoint sets: not-full sketches are exact sets — est == |A|
    import spark.implicits._
    val d = tmpDir("kmvdiff")
    (1L to 100L).map(i => (i, if (i <= 50) "A" else "R"))
      .toDF("l_orderkey", "l_returnflag")
      .write.mode("overwrite").parquet(d.resolve("lineitem.parquet").toString)
    val disjoint = Analytics.kmvDifference(spark, d.toString).collect().head
    assert(disjoint.getAs[Long]("n_only_a") == 50L)
    assert(disjoint.getAs[Double]("est_diff") == 50.0)
  }

  test("theta Jaccard estimate tracks the exact order-set Jaccard; identical sets give exactly 1.0") {
    val li = Tables.lineitem(spark, sfDir)
    def keys(f: String) =
      li.filter(col("l_returnflag") === f).select("l_orderkey").distinct()
    val inter = keys("A").intersect(keys("R")).count().toDouble
    val union = keys("A").union(keys("R")).distinct().count().toDouble
    val row = Analytics.kmvJaccard(spark, sfDir).collect().head
    val est = row.getAs[Double]("est_jaccard")
    assert(math.abs(est - inter / union) < 6.0 / math.sqrt(256.0),
      s"est=$est exact=${inter / union}")
    // identical sets: sketches coincide -> Jaccard exactly 1.0
    val same = Analytics.kmvJaccard(spark, sfDir, flagA = "A", flagB = "A")
      .collect().head
    assert(same.getAs[Double]("est_jaccard") == 1.0)
    assert(same.getAs[Long]("n_inter") == same.getAs[Long]("n_union"))
    // disjoint tiny sets degrade to exact 0.0
    import spark.implicits._
    val d = tmpDir("kmvjac")
    (1L to 100L).map(i => (i, if (i <= 50) "A" else "R"))
      .toDF("l_orderkey", "l_returnflag")
      .write.mode("overwrite").parquet(d.resolve("lineitem.parquet").toString)
    val disjoint = Analytics.kmvJaccard(spark, d.toString).collect().head
    assert(disjoint.getAs[Long]("n_inter") == 0L)
    assert(disjoint.getAs[Double]("est_jaccard") == 0.0)
  }
}
