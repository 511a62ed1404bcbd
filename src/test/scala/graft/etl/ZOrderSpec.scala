package graft.etl

import graft.SparkSpec
import graft.functions.ZOrder
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The k4 contract: z-ordered layout keeps per-file min/max footers
  * tight on BOTH clustering keys, where a single-column sort leaves the
  * second key's footer spanning the whole domain — the file-skipping
  * difference that makes two-sided range scans cheap at 100 TB.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder64: known interleaves, codegen == helper, 31-bit truncation") {
    // a=5 (101) spreads to bits 0,4 = 17; b=3 (011) spreads to 5, <<1 = 10
    assert(ZOrder.interleave(5L, 3L) == 27L)
    assert(ZOrder.interleave(0L, 0L) == 0L)
    assert(ZOrder.interleave(1L, 0L) == 1L)
    assert(ZOrder.interleave(0L, 1L) == 2L)
    // full 31-bit inputs stay positive and bit 62 is the top bit used
    val max31 = 0x7FFFFFFFL
    assert(ZOrder.interleave(max31, max31) == 0x3FFFFFFFFFFFFFFFL)
    // bits above 31 are ignored by contract
    assert(ZOrder.interleave(max31 + 1L, 0L) == ZOrder.interleave(0L, 0L))
    // codegen'd expression agrees with the helper on fixture keys
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long").as("a"), col("l_suppkey").cast("long").as("b"))
      .withColumn("z", call_function("zorder64", col("a"), col("b")))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) == ZOrder.interleave(r.getLong(0), r.getLong(1)))
    }
  }

  test("replaceZOrdered: tight per-file extents on both keys; single-sort is one-sided") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val base = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_test_zorder"
    val nFiles = 8

    // per-file normalized extent of a column: avg over files of
    // (fileMax - fileMin) / (globalMax - globalMin)
    def extents(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
        .select(input_file_name().as("f"), col(c).cast("double").as("v"))
      val g = df.agg(max("v") - min("v")).collect().head.getDouble(0)
      val per = df.groupBy("f").agg((max("v") - min("v")).as("w"))
        .agg(avg("w")).collect().head.getDouble(0)
      per / g
    }

    Load.replaceZOrdered(li, s"$base/z", "l_partkey", "l_suppkey", nFiles)
    // sanity: layout is result-invisible
    assert(spark.read.parquet(s"$base/z").count() == li.count())

    // baseline: range-sort on partkey only, same file count
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$base/single")

    val zP = extents(s"$base/z", "l_partkey")
    val zS = extents(s"$base/z", "l_suppkey")
    val sP = extents(s"$base/single", "l_partkey")
    val sS = extents(s"$base/single", "l_suppkey")
    // the single-column sort nails its own key but leaves suppkey wide open
    assert(sP < 0.35, s"single-sort partkey extent $sP")
    assert(sS > 0.9, s"single-sort suppkey extent $sS should span the domain")
    // z-order bounds BOTH dimensions well below the full domain
    assert(zP < 0.6, s"z-order partkey extent $zP")
    assert(zS < 0.6, s"z-order suppkey extent $zS")
    // and its worst dimension beats the single-sort's worst dimension
    assert(math.max(zP, zS) < math.max(sP, sS),
      s"z worst ${math.max(zP, zS)} vs single worst ${math.max(sP, sS)}")
  }
}
