package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions (with codegen) for the vector/sketch hot
  * paths. Spark's higher-order functions (`transform`/`aggregate`/
  * `zip_with`) evaluate their lambdas interpreted — fine for shaping, but
  * 10–100× too slow when the inner loop runs k×|array| times per row
  * (bench: the HOF MinHash signature alone was 800 s at sf0.1). These
  * expressions move those loops into whole-stage-codegen'd Java.
  *
  * Registered as SQL functions via [[GraftFunctions.register]]
  * (SparkSessionExtensions.injectFunction), used from the DataFrame API
  * through `call_function`.
  */
object Splitmix {
  /** splitmix64 finalizer — the standard public-domain bit mixer. */
  @inline final def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  /** mix → uniform double in [-1, 1). */
  @inline final def unit(x: Long): Double =
    ((mix(x) >>> 11) * (1.0 / 9007199254740992.0)) * 2.0 - 1.0
}

/** Σ aᵢ·bᵢ over two float arrays, accumulated in double, index order —
  * bit-compatible with a sequential fold and DuckDB's list_dot_product.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val s = ctx.freshName("s")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $s += (double)$a.getFloat($i) * (double)$b.getFloat($i);
      }
      ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

/** MinHash signature over pre-hashed elements: sig[i] = min over h of
  * (a[i]·h + b[i]) — one string hash per element upstream, then k
  * multiply-adds per (element, i) in generated code. Universal-hash family
  * coefficients derive deterministically from `seed` (a[i] forced odd).
  */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  require(k > 0, "k must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig expects array<bigint>, got $t")
  }

  private lazy val coefA: Array[Long] =
    Array.tabulate(k)(i => Splitmix.mix(seed + 2L * i) | 1L)
  private lazy val coefB: Array[Long] =
    Array.tabulate(k)(i => Splitmix.mix(seed + 2L * i + 1L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val res = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j); var i = 0
      while (i < k) {
        val v = coefA(i) * h + coefB(i)
        if (v < res(i)) res(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("coefB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("res"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
      long[] $res = new long[$k];
      java.util.Arrays.fill($res, Long.MAX_VALUE);
      for (int $j = 0; $j < $c.numElements(); $j++) {
        long $h = $c.getLong($j);
        for (int $i = 0; $i < $k; $i++) {
          long $v = $aRef[$i] * $h + $bRef[$i];
          if ($v < $res[$i]) $res[$i] = $v;
        }
      }
      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($res);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Packed 64-bit SimHash over pre-hashed tokens: per bit, sum ±1 by the
  * token-hash bit, take the sign bit.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j); var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L; var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val b = ctx.freshName("b"); val out = ctx.freshName("out")
      s"""
      int[] $counts = new int[64];
      for (int $j = 0; $j < $c.numElements(); $j++) {
        long $h = $c.getLong($j);
        for (int $b = 0; $b < 64; $b++) {
          $counts[$b] += (((${h} >>> $b) & 1L) == 1L) ? 1 : -1;
        }
      }
      long $out = 0L;
      for (int $b = 0; $b < 64; $b++) {
        if ($counts[$b] > 0) $out |= (1L << $b);
      }
      ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane sign sketch: `nbits` hyperplanes whose weights derive
  * deterministically from (seed, bit, dim) via splitmix64 — computed inline
  * in generated code, no side table to broadcast. Bit set ⇔ projection ≥ 0.
  */
case class LshBucket(child: Expression, nbits: Int, seed: Long)
    extends UnaryExpression {
  require(nbits > 0 && nbits <= 63, "nbits in [1,63]")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_bucket expects array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L; var b = 0
    while (b < nbits) {
      var s = 0.0; var d = 0
      while (d < n) {
        s += arr.getFloat(d).toDouble * Splitmix.unit(seed + b.toLong * 1000003L + d)
        d += 1
      }
      if (s >= 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val b = ctx.freshName("b"); val d = ctx.freshName("d")
      val s = ctx.freshName("s"); val bucket = ctx.freshName("bucket")
      val sm = classOf[Splitmix.type].getName.stripSuffix("$") // graft.functions.Splitmix
      s"""
      int $n = $c.numElements();
      long $bucket = 0L;
      for (int $b = 0; $b < $nbits; $b++) {
        double $s = 0.0;
        for (int $d = 0; $d < $n; $d++) {
          $s += (double)$c.getFloat($d) *
            $sm$$.MODULE$$.unit(${seed}L + (long)$b * 1000003L + $d);
        }
        if ($s >= 0.0) $bucket |= (1L << $b);
      }
      ${ev.value} = $bucket;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** Registration: `Sessions.configure` wires this into every session via
  * `SparkSession.builder.withExtensions`. Each function is also usable
  * from SQL (`SELECT vec_dot(a, b)`).
  */
object GraftFunctions {
  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  private def litInt(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()
  private def litLong(e: Expression): Long =
    e.eval(null).asInstanceOf[Number].longValue()

  def register(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: length-bound pruning for edit-distance predicates
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPruning)
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot", classOf[VecDot]),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig", classOf[MinHashSig]),
      (args: Seq[Expression]) => MinHashSig(args(0), litInt(args(1)), litLong(args(2)))))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64", classOf[SimHash64]),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((FunctionIdentifier("lsh_bucket"), info("lsh_bucket", classOf[LshBucket]),
      (args: Seq[Expression]) => LshBucket(args(0), litInt(args(1)), litLong(args(2)))))
    ext.injectFunction((FunctionIdentifier("sig_agree"), info("sig_agree", classOf[SigAgree]),
      (args: Seq[Expression]) => SigAgree(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"), info("shingle_hashes", classOf[ShingleHashes]),
      (args: Seq[Expression]) => ShingleHashes(args(0), litInt(args(1)))))
    ext.injectFunction((FunctionIdentifier("band_keys"), info("band_keys", classOf[BandKeys]),
      (args: Seq[Expression]) => BandKeys(args(0), litInt(args(1)), litInt(args(2)))))
    ext.injectFunction((FunctionIdentifier("topk_by_score"), info("topk_by_score", classOf[TopKByScore]),
      (args: Seq[Expression]) => TopKByScore(args(0), args(1), litInt(args(2)))))
    ext.injectFunction((FunctionIdentifier("misra_gries"), info("misra_gries", classOf[MisraGries]),
      (args: Seq[Expression]) => MisraGries(args(0), litInt(args(1)))))
    ext.injectFunction((FunctionIdentifier("kmv_sketch"), info("kmv_sketch", classOf[KmvSketch]),
      (args: Seq[Expression]) => KmvSketch(args(0), litInt(args(1)))))
    ext.injectFunction((FunctionIdentifier("bottomk_pairs"), info("bottomk_pairs", classOf[BottomKPairs]),
      (args: Seq[Expression]) => BottomKPairs(args(0), args(1), litInt(args(2)))))
    ext.injectFunction((FunctionIdentifier("pair_longs"), info("pair_longs", classOf[PairLongs]),
      (args: Seq[Expression]) => PairLongs(args(0))))
    ext.injectFunction((FunctionIdentifier("fnv1a64"), info("fnv1a64", classOf[Fnv1a64]),
      (args: Seq[Expression]) => Fnv1a64(args(0))))
    ext.injectFunction((FunctionIdentifier("fnv1a64_bin"), info("fnv1a64_bin", classOf[Fnv1a64Bin]),
      (args: Seq[Expression]) => Fnv1a64Bin(args(0))))
    ext.injectFunction((FunctionIdentifier("splitmix64"), info("splitmix64", classOf[Splitmix64]),
      (args: Seq[Expression]) => Splitmix64(args(0))))
    ext.injectFunction((FunctionIdentifier("zorder64"), info("zorder64", classOf[ZOrder64]),
      (args: Seq[Expression]) => ZOrder64(args(0), args(1))))
    // Spark's own runtime-filter bloom expressions (public but not in the
    // default registry): bloom_agg(col, estNumItems, numBits) builds a
    // serialized filter; might_contain(bloomBytes, col) probes it with
    // codegen. Both back [[graft.ops.Dedup.corpusBloom]]'s incremental
    // prefilter. NOTE: the aggregate silently caps estNumItems/numBits at
    // spark.sql.optimizer.runtime.bloomFilter.max{NumItems,NumBits} —
    // raise those confs when fingerprinting beyond ~4M distinct keys.
    ext.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", classOf[aggregate.BloomFilterAggregate]),
      (args: Seq[Expression]) => new aggregate.BloomFilterAggregate(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain", classOf[BloomFilterMightContain]),
      (args: Seq[Expression]) => BloomFilterMightContain(args(0), args(1))))
  }
}

/** Fraction of positions where two equal-length long arrays agree —
  * the MinHash signature-agreement Jaccard estimate, codegen'd.
  */
case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sig_agree expects (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    if (n == 0) 0.0
    else {
      var eq = 0; var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
      eq.toDouble / n
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val eq = ctx.freshName("eq")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      int $eq = 0;
      for (int $i = 0; $i < $n; $i++) {
        if ($a.getLong($i) == $b.getLong($i)) $eq++;
      }
      ${ev.value} = ($n == 0) ? 0.0 : ((double)$eq) / $n;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgree =
    copy(left = l, right = r)
}

/** Static core for [[BandKeys]] (compiled once, called from codegen). */
object BandUtil {
  /** Per band b over the signature lanes [b·r, (b+1)·r): FNV-1a-style
    * fold over 64-bit lanes, seeded with (offset basis ^ b) so equal
    * band contents in DIFFERENT bands get independent keys. Chosen over
    * a generic hash (xxhash64) because the arithmetic — xor then one
    * wrapping multiply per lane — is exactly replayable in DuckDB
    * HUGEINT mod-2^64 SQL, which is what lets the x8 banding planner
    * graduate from rows-only to a hash-gated oracle row.
    */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xCBF29CE484222325L ^ b
      var j = b * rowsPerBand
      val end = math.min((b + 1) * rowsPerBand, sig.numElements())
      while (j < end) { h = (h ^ sig.getLong(j)) * 0x100000001B3L; j += 1 }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** LSH band keys over a minhash signature: `bands` keys, each the
  * [[BandUtil.bandKeys]] fold of its `rowsPerBand` signature lanes.
  * Docs sharing any band key are candidate pairs.
  */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"band_keys expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BandUtil.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandUtil.bandKeys($c, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
}

/** Heavy lifting for [[ShingleHashes]] as a plain JVM static (called from
  * generated code — compiled bytecode is as fast as generated Java, and
  * keeps the codegen template one line).
  */
object ShingleUtil {
  /** 64-bit FNV-1a over a char range, folded over Unicode CODE POINTS —
    * the SAME decomposition [[TextHashUtil.fnv1a64CodePoints]] (the
    * injected `fnv1a64` function) folds, so a shingle hash computed here
    * and one re-derived downstream via `fnv1a64(token)` agree on EVERY
    * string, including supplementary-plane text (emoji, rare CJK). The
    * previous UTF-16-unit fold agreed only on BMP tokens: a non-BMP
    * token hashed differently on the two sides, so e.g. boilerplate's
    * hash-keyed df pass and its string-recovery pass silently missed
    * each other. One arithmetic, one truth.
    */
  private def fnv1a(s: String, from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      h ^= cp
      h *= 0x100000001B3L
      i += Character.charCount(cp)
    }
    h
  }

  /** ASCII `\s` — the same class Java regex `\s` (no UNICODE flag) and
    * the DuckDB oracle's RE2 `\s` match, so tokenization agrees with the
    * `split(text, "\\s+")` formulations on both engines. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Distinct hashes of the w-grams of whitespace tokens (lowercased,
    * Locale.ROOT — locale-sensitive lowering would diverge from Spark's
    * lower() and the oracle on e.g. tr-TR JVMs).
    * Shingle identity = order-sensitive splitmix combine of its token
    * hashes; docs with < w tokens get one all-token shingle — mirroring
    * the string formulation in graft.ops.Dedup.shingles.
    */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String, w: Int): ArrayData = {
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    // tokenize: split on runs of whitespace
    val tokHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var i = 0; val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) tokHashes += fnv1a(s, start, i)
    }
    val m = tokHashes.length
    val out = new java.util.HashSet[Long]()
    if (m < w) {
      var h = 0L; var j = 0
      while (j < m) { h = Splitmix.mix(h ^ tokHashes(j)); j += 1 }
      out.add(h)
    } else {
      var st = 0
      while (st <= m - w) {
        var h = 0L; var j = st
        while (j < st + w) { h = Splitmix.mix(h ^ tokHashes(j)); j += 1 }
        out.add(h)
        st += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    java.util.Arrays.sort(arr) // deterministic order regardless of set iteration
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
}

/** Distinct hashed w-gram shingles of a text column — the unit set for
  * Jaccard dedup, produced in one compiled pass (tokenize → hash → slide →
  * dedupe). Replaces an interpreted split/transform/slice/concat_ws HOF
  * chain that benched ~35 µs/doc.
  */
case class ShingleHashes(child: Expression, w: Int)
    extends UnaryExpression {
  require(w > 0, "w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleUtil.shingleHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Helper for [[Fnv1a64]] as a compiled static (called from generated
  * code, same pattern as [[ShingleUtil]]).
  */
object TextHashUtil {
  /** 64-bit FNV-1a folded over Unicode CODE POINTS (not UTF-8 bytes or
    * UTF-16 units): h ^= cp; h *= 0x100000001B3 per code point, wrapping
    * mod 2^64 (Java long arithmetic). Code points are the one string
    * decomposition both engines iterate identically — the DuckDB oracle
    * replays the same fold with string_split(s,'') → unicode(c) and
    * HUGEINT mod-2^64 arithmetic, so the gated query compares exactly.
    */
  def fnv1a64CodePoints(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toString
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h ^= cp
      h *= 0x100000001B3L
      i += Character.charCount(cp)
    }
    h
  }

  /** 64-bit FNV-1a over RAW BYTES (unsigned, 0–255 per fold step) — the
    * hash for BINARY payloads, where a cast through string is lossy:
    * invalid UTF-8 sequences all collapse to U+FFFD on decode, so two
    * DISTINCT binary frames could hash equal under the string fold. On
    * pure-ASCII bytes this fold is value-identical to
    * [[fnv1a64CodePoints]] over the decoded string (each byte IS its
    * code point), which is what keeps ASCII-fixture oracles replayable
    * with the code-point SQL fold while real binary media hashes
    * losslessly.
    */
  def fnv1a64Bytes(bytes: Array[Byte]): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFF)
      h *= 0x100000001B3L
      i += 1
    }
    h
  }
}

/** FNV-1a 64-bit document fingerprint over Unicode code points —
  * oracle-expressible (unlike xxhash64, which DuckDB lacks), codegen'd.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fnv1a64 expects string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.fnv1a64CodePoints(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.fnv1a64CodePoints($c);")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

/** FNV-1a 64-bit over raw BINARY bytes ([[TextHashUtil.fnv1a64Bytes]]) —
  * the lossless frame/payload hash (a string cast would fold invalid
  * UTF-8 through U+FFFD and collide distinct frames). ASCII payloads
  * hash identically to [[Fnv1a64]] on the decoded string, so the
  * ASCII-fixture oracles replay with the same code-point SQL fold.
  */
case class Fnv1a64Bin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"fnv1a64_bin expects binary, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashUtil.fnv1a64Bytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashUtil.fnv1a64Bytes($c);")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64Bin =
    copy(child = newChild)
}

/** splitmix64 finalizer as a column function — the avalanche pass over
  * weak-mixing hashes (FNV-1a over short tokens leaves correlated high
  * bits, which inflates SimHash Hamming-ball collisions). Same fold the
  * oracle replays via mod-2^64 SQL arithmetic, so pipelines stay
  * hash-gate-able end to end.
  */
case class Splitmix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"splitmix64 expects bigint, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    Splitmix.mix(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Splitmix.mix($c);")

  override protected def withNewChildInternal(newChild: Expression): Splitmix64 =
    copy(child = newChild)
}

/** Bit-spreading helper for [[ZOrder64]] — the standard mask-shift
  * morton encode over the LOW 31 BITS of each key (31, not 32, keeps
  * every intermediate and the final 62-bit z-value positive in a signed
  * long, which is what lets DuckDB replay the identical chain in plain
  * BIGINT `&`/`|`/`<<` arithmetic with no unsigned wrapping).
  */
object ZOrder {
  /** bit i of (x & 0x7FFFFFFF) lands at bit 2i */
  @inline final def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  @inline final def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}

/** Morton/Z-order interleave of two long keys (low 31 bits each): the
  * multi-dimensional clustering key behind `OPTIMIZE ZORDER`-style data
  * layout. Sorting by this value co-locates rows that are close in BOTH
  * dimensions, so per-file min/max footers stay tight on both columns
  * and two-sided range scans skip most files — the layout lever for
  * 100 TB fact tables queried on more than one key.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"zorder64 expects (bigint, bigint), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)
}

/** Pair-generation helper for [[PairLongs]]. */
object PairUtil {
  /** All ordered pairs (a[i], a[j]) with i < j from a pre-sorted long
    * array, as array<struct<doc_a,doc_b>> — one compiled pass instead of
    * an interpreted transform/slice/flatten chain.
    */
  def pairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = n.toLong * (n - 1) / 2
    require(m <= Int.MaxValue,
      s"pair_longs: $n elements would produce $m pairs — cap the group size upstream")
    // null elements are skipped (candidate generation has no meaning for
    // null ids); the builder below sizes for the worst case and trims
    val out = new Array[Any](m.toInt)
    var idx = 0; var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val a = arr.getLong(i)
        var j = i + 1
        while (j < n) {
          if (!arr.isNullAt(j)) {
            out(idx) = InternalRow(a, arr.getLong(j))
            idx += 1
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(if (idx == out.length) out else out.take(idx))
  }
}

/** All i<j pairs of a sorted long array — the bounded in-group pair
  * fan-out for shared-key candidate generation (n <= maxDocFreq upstream,
  * so the output is at most maxDocFreq²/2 structs).
  */
case class PairLongs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("doc_a", LongType, nullable = false),
                   StructField("doc_b", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pair_longs expects array<bigint>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    PairUtil.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PairUtil.pairs($c);")

  override protected def withNewChildInternal(newChild: Expression): PairLongs =
    copy(child = newChild)
}
