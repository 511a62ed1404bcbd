package graft.functions

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interpreted-vs-codegen parity for every custom expression: each has two
  * implementations (nullSafeEval and doGenCode) — this pins them to
  * identical results by re-running the same query with whole-stage codegen
  * and expression codegen forced off.
  */
class ExpressionParitySpec extends SparkSpec {

  private def withCodegenOff[T](body: => T): T = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val factory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", factory)
    }
  }

  private def assertSameResults(df: => DataFrame): Unit = {
    val withCodegen = df.collect()
    val interpreted = withCodegenOff(df.collect())
    assert(withCodegen.length == interpreted.length)
    withCodegen.zip(interpreted).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("vec_dot / lsh_bucket: codegen == interpreted on real embeddings") {
    assertSameResults(
      Tables.embeddings(spark, sfDir).select(
        col("vec_id"),
        call_function("vec_dot", col("embedding"), col("embedding")).as("d"),
        call_function("lsh_bucket", col("embedding"), lit(8), lit(42L)).as("b"))
      .orderBy("vec_id"))
  }

  test("shingle_hashes / minhash_sig / simhash64 / sig_agree: codegen == interpreted") {
    assertSameResults(
      Tables.documents(spark, sfDir).select(
        col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(3)).as("sh"),
        call_function("minhash_sig",
          call_function("shingle_hashes", col("text"), lit(3)), lit(32), lit(42L)).as("sig"),
        call_function("simhash64",
          call_function("shingle_hashes", col("text"), lit(3))).as("sim"))
      .withColumn("agree", call_function("sig_agree", col("sig"), col("sig")))
      .withColumn("bk", call_function("band_keys", col("sig"), lit(8), lit(4)))
      .orderBy("doc_id"))
  }

  test("splitmix64 / zorder64: codegen == interpreted on real keys") {
    assertSameResults(
      Tables.lineitem(spark, sfDir).select(
        col("l_orderkey"), col("l_linenumber"),
        call_function("splitmix64", col("l_orderkey").cast("long")).as("sm"),
        call_function("zorder64", col("l_partkey").cast("long"),
          col("l_suppkey").cast("long")).as("z"))
      .orderBy("l_orderkey", "l_linenumber"))
  }

  test("splitmix64: golden value pinned against an independent reference") {
    import spark.implicits._
    // first output of the canonical splitmix64 stream seeded 0, computed
    // from scratch so a transcription bug in Splitmix.mix cannot
    // self-verify
    def ref(x0: Long): Long = {
      var x = x0 + java.lang.Long.parseUnsignedLong("9E3779B97F4A7C15", 16)
      x = (x ^ (x >>> 30)) * java.lang.Long.parseUnsignedLong("BF58476D1CE4E5B9", 16)
      x = (x ^ (x >>> 27)) * java.lang.Long.parseUnsignedLong("94D049BB133111EB", 16)
      x ^ (x >>> 31)
    }
    val got = Seq(0L, 1L, -1L, 42L).toDF("x")
      .select(col("x"), call_function("splitmix64", col("x")).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(0L, 1L, -1L, 42L).foreach(x => assert(got(x) == ref(x), s"splitmix64($x)"))
  }

  test("band_keys: golden values pinned against an independent reference") {
    import spark.implicits._
    // FNV-style band fold computed from scratch (h = basis ^ band;
    // h = (h ^ lane) * 0x100000001B3 wrapping per lane) — independent of
    // BandUtil, so a transcription bug cannot self-verify.
    val sig = Array(1L, 2L, 3L, 4L)
    def ref(band: Int, lanes: Seq[Long]): Long = {
      var h = 0xCBF29CE484222325L ^ band
      lanes.foreach(l => h = (h ^ l) * 0x100000001B3L)
      h
    }
    val got = Seq(Tuple1(sig)).toDF("sig")
      .select(call_function("band_keys", col("sig"), lit(2), lit(2)).as("bk"))
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(ref(0, Seq(1L, 2L)), ref(1, Seq(3L, 4L))))
  }

  test("fnv1a64: codegen == interpreted on real documents") {
    assertSameResults(
      Tables.documents(spark, sfDir).select(
        col("doc_id"), call_function("fnv1a64", col("text")).as("fp"))
      .orderBy("doc_id"))
  }

  test("fnv1a64: golden values pinned against an independent reference") {
    import spark.implicits._
    // Computed with a from-scratch FNV-1a 64 fold over code points
    // (h ^= ord(c); h = h * 0x100000001B3 mod 2^64, offset basis
    // 0xCBF29CE484222325) — NOT with this expression, so a transcription
    // bug in Fnv1a64 cannot self-verify. Covers empty text, non-ASCII
    // (multi-byte UTF-8), and an astral-plane code point (surrogate pair
    // in UTF-16 — must hash as ONE code point, not two units).
    val cases = Seq(
      ("hello", -6615550055289275125L),
      ("", -3750763034362895579L), // offset basis: empty fold
      ("héllo 世界", 2178768425331062039L),
      ("abc 123", -9157355961603870497L),
      ("𝄞clef", -701900599802646587L)
    )
    val got = cases.map(_._1).toDF("text")
      .select(col("text"), call_function("fnv1a64", col("text")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cases.foreach { case (s, want) => assert(got(s) == want, s"fnv1a64('$s')") }
  }

  test("pair_longs: codegen == interpreted") {
    import spark.implicits._
    assertSameResults(
      Seq((1L, Seq(1L, 5L, 9L, 12L)), (2L, Seq(3L)), (3L, Seq.empty[Long]))
        .toDF("id", "xs")
        .select(col("id"), call_function("pair_longs", col("xs")).as("p"))
        .orderBy("id"))
  }
}
