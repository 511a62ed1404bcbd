package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure-JVM foundations (no Spark session):
  * the FNV fingerprint against an independent arithmetic reference, and
  * the bounded top-k heap against a naive sort. Plain scalacheck runner
  * (no scalatest bridge in the offline dependency set).
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  // any valid scalar code point, surrogates excluded (not encodable alone)
  private val codePoint: Gen[Int] = Gen.frequency(
    8 -> Gen.choose(0x20, 0x7E),          // ASCII
    2 -> Gen.choose(0x80, 0xD7FF),        // BMP multi-byte
    1 -> Gen.choose(0xE000, 0xFFFD),      // BMP above surrogates
    1 -> Gen.choose(0x10000, 0x10FFFF))   // astral (surrogate pair in UTF-16)
  private val unicodeString: Gen[String] =
    Gen.listOf(codePoint).map(cps => new String(cps.toArray, 0, cps.length))

  test("fnv1a64CodePoints == independent BigInt mod-2^64 fold, any unicode") {
    val Mod = BigInt(1) << 64
    def reference(s: String): Long = {
      var h = BigInt("cbf29ce484222325", 16)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = ((h ^ BigInt(cp)) * BigInt("100000001b3", 16)).mod(Mod)
        i += Character.charCount(cp)
      }
      h.toLong // wraps to the signed representation
    }
    check(Prop.forAll(unicodeString) { s =>
      TextHashUtil.fnv1a64CodePoints(UTF8String.fromString(s)) == reference(s)
    })
  }

  // scores with the adversarial doubles: NaN, ±0.0, ±Inf, plus normals
  private val score: Gen[Double] = Gen.frequency(
    6 -> Gen.choose(-1.0, 1.0),
    1 -> Gen.const(Double.NaN),
    1 -> Gen.const(0.0), 1 -> Gen.const(-0.0),
    1 -> Gen.oneOf(Double.PositiveInfinity, Double.NegativeInfinity))

  test("TopKBuffer == naive sort under Spark double ordering, incl. NaN/±0.0") {
    val entries = Gen.listOf(Gen.zip(score, Gen.choose(0L, 50L)))
    val ks = Gen.choose(1, 12)
    // Spark's ordering (SQLOrderingUtil): == first (ties ±0.0), then
    // Double.compare (NaN greatest); desc by score, asc by id
    def sparkLt(a: (Double, Long), b: (Double, Long)): Boolean = {
      val c = if (a._1 == b._1) 0 else java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    check(Prop.forAll(entries, ks) { (xs, k) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.add(s, i) }
      val want = xs.sortWith(sparkLt).take(k)
      val got = buf.sortedBestFirst
      got.map(t => (t._2, doubleBits(t._1))) == want.map(t => (t._2, doubleBits(t._1)))
    })
  }

  test("TopKBuffer merge == adding everything to one buffer") {
    val entries = Gen.listOf(Gen.zip(score, Gen.choose(0L, 50L)))
    check(Prop.forAll(entries, entries, Gen.choose(1, 8)) { (xs, ys, k) =>
      val a = new TopKBuffer(k); xs.foreach { case (s, i) => a.add(s, i) }
      val b = new TopKBuffer(k); ys.foreach { case (s, i) => b.add(s, i) }
      b.foreach((s, i) => a.add(s, i))
      val one = new TopKBuffer(k); (xs ++ ys).foreach { case (s, i) => one.add(s, i) }
      a.sortedBestFirst.map(t => (t._2, doubleBits(t._1))) ==
        one.sortedBestFirst.map(t => (t._2, doubleBits(t._1)))
    })
  }

  /** Compare key under the ORDERING's equivalence: ±0.0 collapse to one
    * value (they are ties — which representative survives is legitimately
    * arbitrary) and all NaNs canonicalize (doubleToLongBits normalizes). */
  private def doubleBits(d: Double): Long =
    java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
}
