package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup family: exact, MinHash+LSH, SimHash, n-gram Jaccard. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog and runs far away today"
  private val docB = "the quick brown fox jumps over the lazy dog and runs far away tonight" // near-dup of A
  private val docC = "completely unrelated text about database engines and query optimizers here"

  private def docs = Seq(
    (1L, docA), (2L, docB), (3L, docC), (4L, docA) // 4 = exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical text, keeps min id") {
    val out = Dedup.exact(docs).select("doc_id", "n_copies").orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("exactRows keeps one full representative row per text") {
    val out = Dedup.exactRows(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("shingles produce distinct w-grams; short docs degrade to one") {
    val sh = docs.select(Dedup.shingles(col("text"), 3).as("s"))
      .filter(col("s").isNotNull).select(size(col("s")).as("n")).collect()
    assert(sh.forall(_.getInt(0) >= 1))
    val short = Seq((1L, "two words")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3).as("s")).collect().head.getSeq[String](0)
    assert(short == Seq("two words"))
  }

  test("dupSpans: cross-doc shared spans counted, unique docs at zero, short docs one span") {
    // docs 1 and 4 are identical (14 tokens → 7 w=8 spans each, ALL dup);
    // doc 2 shares its first 6 spans with 1/4 (differs only in the last
    // token, which sits in the final 8-token window... the last span
    // covers tokens 7..14 — token 14 differs, so spans 1..6 are shared
    // and span 7 is unique); doc 3 shares nothing.
    val out = Dedup.dupSpans(docs, w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L))
    val m = out.map(t => t._1 -> t).toMap
    assert(m(1L) == ((1L, 7L, 7L, 1.0)))      // exact dup of 4: every span dup
    assert(m(4L) == ((4L, 7L, 7L, 1.0)))
    assert(m(2L)._2 == 7L && m(2L)._3 == 6L)  // near-dup: all but the last window
    assert(m(3L)._3 == 0L && m(3L)._4 == 0.0) // unrelated: zero dup spans
    // short doc (< w tokens): exactly one all-token span; a repeated short
    // doc is a dup through that single span
    val short = Seq((1L, "two words"), (2L, "two words"), (3L, "other text"))
      .toDF("doc_id", "text")
    val s = Dedup.dupSpans(short, w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(s == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  test("dupSpans: one corpus scan — the h-exchange is reused by both aggregations") {
    // AQE reuses shuffle stages at RUNTIME (canonicalized-exchange match):
    // execute first, then read the final adaptive plan
    val df = Dedup.dupSpans(Tables.documents(spark, sfDir))
    df.collect()
    // the executed-plan string appends the pre-AQE "Initial Plan" copy —
    // read only the final stage tree
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"global-count side must reuse the span exchange:\n$plan")
  }

  test("boilerplate: hash-first plan matches the naive string formulation") {
    // fixture exercises every hash-recovery edge: repeated 3-gram shingles
    // across >= minDf docs, a short doc (< w tokens → one all-token
    // shingle), a repeated short doc, and blank docs (zero tokens → the
    // "" shingle, whose hash is the fold seed 0, not fnv1a64(""))
    val footer = "all rights reserved worldwide"
    // the 😀-bearing footer pins the non-BMP contract: ShingleUtil's
    // per-token fold iterates CODE POINTS, matching the fnv1a64 recovery
    // fold — a UTF-16-unit fold would hash the pass-1 key differently
    // from the pass-2 recovery and silently drop this survivor
    val emojiFooter = "share 😀🌍 widely"
    val fx = (1L to 6L).map(i => (i, s"unique body $i words here $footer")) ++
      Seq((7L, "tiny doc"), (8L, "tiny doc"), (9L, "tiny doc"),
          (10L, "tiny doc"), (11L, "tiny doc"),
          (12L, ""), (13L, " "), (14L, ""), (15L, ""), (16L, "\t\n")) ++
      (17L to 21L).map(i => (i, s"doc $i ends with $emojiFooter"))
    val d = fx.toDF("doc_id", "text")
    val out = Dedup.boilerplate(d, minDf = 5)
    val naive = d.select(explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5).orderBy(col("df").desc, col("shingle"))
    assert(out.collect().toSeq == naive.collect().toSeq)
    // the blank docs must survive recovery as the "" shingle (df = 5)
    assert(out.collect().exists(r => r.getString(0) == "" && r.getLong(1) == 5L))
    // the supplementary-plane shingle survives BOTH passes (df = 5)
    assert(out.collect().exists(r => r.getString(0) == "share 😀🌍 widely" && r.getLong(1) == 5L),
      s"non-BMP shingle lost between hash pass and recovery pass:\n${out.collect().mkString("\n")}")
    // plan: df aggregation shuffles 8-byte hashes, survivors broadcast,
    // and NO exchange is keyed on the shingle string
    out.collect()
    val plan = out.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    assert(plan.contains("BroadcastHashJoin"), s"survivors must broadcast:\n$plan")
    assert(!plan.contains("hashpartitioning(shingle"),
      s"no string-keyed exchange allowed:\n$plan")
  }

  test("cdcChunkDedup: one corpus scan — the chunk-hash exchange is reused by both aggregations") {
    // the dupSpans single-exchange discipline carries over: chunking is
    // one map pass, and partitioning by h serves the (h, doc) agg, the
    // h agg, AND the join — assert the runtime reuse like x11 does
    val df = Dedup.cdcChunkDedup(Tables.documents(spark, sfDir))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"global-count side must reuse the chunk exchange:\n$plan")
  }

  test("cdcChunkDedup: boundaries re-synchronize under prefix insertion; fixed grid does not") {
    // doc 1 = 300 distinct tokens; doc 2 = the same stream with 3 tokens
    // INSERTED at the front. Content-defined cuts depend only on the
    // local 8-token window, so doc 2's boundaries re-align with doc 1's
    // after the first post-insertion cut and the shared chunks hash
    // identically; a fixed 16-token grid shifts every block by 3.
    val base = (1 to 300).map(i => s"tok$i")
    val shifted = Seq("ins1", "ins2", "ins3") ++ base
    val solo = Seq((1L, base.mkString(" ")), (3L, "short doc here"),
      (4L, "short doc here")).toDF("doc_id", "text")
    val both = Seq((1L, base.mkString(" ")), (2L, shifted.mkString(" ")),
      (3L, "short doc here"), (4L, "short doc here")).toDF("doc_id", "text")
    val m = Dedup.cdcChunkDedup(both).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the prefix-shifted twin shares almost everything: at most the
    // chunks overlapping the insertion point differ
    val (n1, d1, f1) = m(1L)
    assert(n1 > 10, s"fixture too short to cut (${m(1L)})") // ~300/16 cuts expected
    assert(f1 >= 0.8, s"CDC failed to re-synchronize: only $d1 of $n1 chunks shared")
    // identical short docs: one whole-doc chunk each, fully duplicated
    assert(m(3L) == ((1L, 1L, 1.0)) && m(4L) == ((1L, 1L, 1.0)))
    // doc 1 alone (no shifted twin): nothing duplicated but the short pair
    val alone = Dedup.cdcChunkDedup(solo).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(alone(1L) == 0L, "self-duplication without a twin?")
    // fixed-grid control: 16-token blocks of the two streams share NO
    // chunk hash (every block shifted by 3 tokens)
    def fnv(s: String): Long = {
      var h = 0xCBF29CE484222325L
      s.codePoints().forEach(cp => { h ^= cp; h *= 0x100000001B3L })
      h
    }
    def gridHashes(ts: Seq[String]) = ts.grouped(16).map(
      _.foldLeft(0L)((h, t) => graft.functions.Splitmix.mix(h ^ fnv(t)))).toSet
    assert((gridHashes(base) & gridHashes(shifted)).isEmpty,
      "fixed grid unexpectedly survived the prefix shift — control broken")
    // determinism under repartition
    val re = Dedup.cdcChunkDedup(both.repartition(7)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(re == m)
  }

  test("scrubDupChunks (c26): exact dup fully scrubbed, unique doc untouched, case preserved") {
    val base = (1 to 120).map(i => s"Tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, (200 to 320).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.scrubDupChunks(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1: first occurrence of every chunk — untouched, ORIGINAL case
    assert(out(1L) == ((120L, 0L, base)))
    // doc 2: exact copy — every chunk repeats doc 1's, fully scrubbed
    assert(out(2L) == ((120L, 120L, "")), s"got ${out(2L)}")
    // doc 3: unique content — untouched
    assert(out(3L)._2 == 0L && out(3L)._3 == out(3L)._3.trim)
    // consistency with the x16 profile: a fully-dup doc has frac 1.0
    val prof = Dedup.cdcChunkDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(prof(1L) == 1.0 && prof(2L) == 1.0 && prof(3L) == 0.0)
    // determinism under repartition
    val re = Dedup.scrubDupChunks(docs.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(re == out)
  }

  test("scrubAudit (x17): exact dup pair collapses to frac_after 0 on both sides; unique doc 0/0; within-doc repeat also clears") {
    val base = (1 to 120).map(i => s"Tok$i").mkString(" ")
    val block = (1 to 40).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),                                  // cross-doc exact dup
      (3L, (200 to 320).map(i => s"uniq$i").mkString(" ")),    // unique
      (4L, s"$block $block $block")                            // within-doc repetition
    ).toDF("doc_id", "text")
    val out = Dedup.scrubAudit(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // dup pair: fully duplicated before; first kept + copy removed →
    // surviving chunks unique corpus-wide → 0 residual on BOTH docs
    assert(out(1L) == ((120L, 0L, 1.0, 0.0)))
    assert(out(2L) == ((120L, 120L, 1.0, 0.0)))
    // unique doc: nothing to scrub, nothing duplicated either side
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0 && out(3L)._4 == 0.0)
    // within-doc repetition: duplicated before, first block survives,
    // residual clears (frac_after 0) with only the repeats removed
    assert(out(4L)._3 > 0.0 && out(4L)._4 == 0.0 && out(4L)._2 > 0L && out(4L)._2 < 120L)
    // determinism under repartition
    val re = Dedup.scrubAudit(docs.repartition(5)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(re == out)
  }

  test("dupSpans: within-doc repetition alone marks spans duplicated") {
    val rep = "a b c d e f g h a b c d e f g h" // 16 tokens, spans 1..9; span(1)=span(9)
    val one = Seq((1L, rep), (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")).toDF("doc_id", "text")
    // positions 1 and 9 hash identically (same 8 tokens in order)
    val m = Dedup.dupSpans(one, w = 8).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(m(1L)._1 == 9L && m(1L)._2 == 2L)
    assert(m(2L) == ((2L, 0L)))
  }

  test("scrubDupSpans: first occurrence survives, later copies drop, unique text untouched") {
    // doc 1 and doc 4 are identical: doc 1 (smaller id) keeps all its
    // spans, doc 4 loses every covered token (14 tokens, 7 spans of w=8
    // → coverage = positions 1..14 = everything)
    val out = Dedup.scrubDupSpans(docs, w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val m = out.map(t => t._1 -> t).toMap
    assert(m(1L) == ((1L, 14L, 0L, docA)))    // first occurrence: untouched
    assert(m(4L) == ((4L, 14L, 14L, "")))     // exact dup: fully scrubbed
    assert(m(3L) == ((3L, 10L, 0L, docC)))    // unique: untouched
    // near-dup doc 2: spans 1..6 duplicate doc 1's (first occurrences are
    // doc 1's), covering tokens 1..13; span 7 (tokens 7..14) is unique.
    // Only token 14 ("tonight") survives.
    assert(m(2L) == ((2L, 14L, 13L, "tonight")), s"got ${m(2L)}")
    // deterministic under repartitioning
    val r2 = Dedup.scrubDupSpans(docs.repartition(7), w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(r2 == out)
    // hashing is case-insensitive (a case-variant copy IS a dup) while
    // the rebuilt text keeps the surviving doc's original case
    val cased = Seq((1L, "Alpha Beta"), (2L, "ALPHA beta"), (3L, "gamma DELTA"))
      .toDF("doc_id", "text")
    val c = Dedup.scrubDupSpans(cased, w = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(c(1L) == ((0L, "Alpha Beta")))   // first occurrence, case kept
    assert(c(2L) == ((2L, "")))             // case-variant dup scrubbed
    assert(c(3L) == ((0L, "gamma DELTA")))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = Dedup.minhashLsh(docs, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: est_jaccard = 1
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near dup
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L }) // unrelated
  }

  test("minhashLshCross = exactly the cross-parity subset of the full pair list; no old×old or new×new ever") {
    val corpus = Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 0)
    val batch = Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 1)
    val cross = Dedup.minhashLshCross(corpus, batch, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cross.keys.forall { case (old, nw) => old % 2 == 0 && nw % 2 == 1 })
    // the full within-corpus run restricted to mixed-parity pairs lands
    // on the same pairs with the same estimated Jaccard
    val full = Dedup.minhashLsh(Tables.documents(spark, sfDir), threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .filter { case ((a, b), _) => a % 2 != b % 2 }
      .map { case ((a, b), j) => (if (a % 2 == 0) (a, b) else (b, a)) -> j }
      .toMap
    assert(cross.nonEmpty && cross == full)
  }

  test("minhashLshFromSigs over a materialized bucketed sig table == single-DAG minhashLsh") {
    // The 100 TB form: signatures computed ONCE, written bucketed by
    // doc_id, then banding + verification run off the table. Must be
    // row-for-row equal to the single-DAG form (which recomputes sigs 3×
    // from lineage) on real documents.
    val corpus = Tables.documents(spark, sfDir)
    val single = Dedup.minhashLsh(corpus, threshold = 0.5)
      .orderBy("doc_a", "doc_b").collect()
    val table = "sigs_bucketed_spec"
    try {
      val sigs = Dedup.materializeSignatures(
        Dedup.minhashSignatures(corpus), table)
      val fromSigs = Dedup.minhashLshFromSigs(sigs, threshold = 0.5)
        .orderBy("doc_a", "doc_b").collect()
      assert(single.nonEmpty && single.length == fromSigs.length)
      single.zip(fromSigs).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1)
          && a.getDouble(2) == b.getDouble(2))
      }
      // the scan of the signature table must be bucket-aware — that is
      // the point of materializing: the verification joins can consume
      // the file layout instead of re-shuffling the signature relation
      val planStr = Dedup.minhashLshFromSigs(sigs, threshold = 0.5)
        .queryExecution.executedPlan.toString
      assert(planStr.contains("SelectedBucketsCount"), planStr.take(2000))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ngramJaccardCross + incrementalSurvivors: new batch vs existing corpus") {
    // old = even ids {2, 4}, new = odd ids {1, 3}; 1≈2 near-dup, 4
    // exact-dup of 1, 3 unrelated
    val old = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val pairs = Dedup.ngramJaccardCross(old, fresh, threshold = 0.5)
      .select("doc_old", "doc_new").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 1L), (4L, 1L)), pairs.toString)
    val surv = Dedup.incrementalSurvivors(old, fresh, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(surv == Seq(3L)) // 1 dropped (exact dup of 4, near-dup of 2)
  }

  test("decontaminate: shared-shingle counts vs a benchmark set; benchmark side broadcasts") {
    // docA (14 tokens) has 12 distinct 3-shingles; docB differs only in
    // the last token → shares exactly the 11 shingles not touching it.
    val train = Seq((1L, docB), (2L, docC), (3L, "tiny doc")).toDF("doc_id", "text")
    val bench = Seq((100L, docA)).toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, minShared = 1)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getAs[Long]("n_hit_shingles"), r.getAs[Long]("n_bench_docs"))).toMap
    assert(rows.keySet == Set(1L)) // docC and the tiny doc share nothing
    assert(rows(1L) == (11L, 1L))
    // contaminated doc drops out below the threshold
    assert(Dedup.decontaminate(train, bench, minShared = 12).collect().isEmpty)
    // the benchmark side must be the broadcast build side
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("pointer jump round bound: 10k-node path converges in O(log diameter) rounds") {
    // the adversarial shape for label propagation: a single path of
    // diameter 9999 — plain min-propagation needs 9999 rounds; the jump
    // roughly doubles the propagation distance per round, so ~log2
    val n = 10000
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    assert(labels.count() == n)
    assert(labels.filter(col("comp") =!= 0L).count() == 0, "all nodes must reach label 0")
    val bound = 2 * (math.log(n - 1.0) / math.log(2.0)).ceil.toInt + 4
    assert(rounds <= bound, s"$rounds rounds > empirical log bound $bound")
    info(s"10k-node path: $rounds rounds (bound $bound, plain propagation would need ${n - 1})")
  }

  test("star and clique collapse in a constant number of rounds") {
    val star = (1 to 5000).map(i => (0L, i.toLong)).toDF("doc_a", "doc_b")
    val (sl, sr) = Dedup.connectedComponentsWithRounds(star)
    assert(sl.count() == 5001 && sl.filter(col("comp") =!= 0L).count() == 0)
    assert(sr <= 3, s"star took $sr rounds")
    val clique = (for (a <- 0 until 40; b <- 0 until 40 if a < b)
      yield (a.toLong, b.toLong)).toDF("doc_a", "doc_b")
    val (cl, cr) = Dedup.connectedComponentsWithRounds(clique)
    assert(cl.count() == 40 && cl.filter(col("comp") =!= 0L).count() == 0)
    assert(cr <= 3, s"clique took $cr rounds")
  }

  test("random graphs: components == driver-side union-find reference (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct.map(v => v -> find(v)).toMap
    }
    val edgeList: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 50)
      m <- Gen.choose(1, 80)
      raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield raw.map { case (a, b) =>
      (a.toLong, (if (a == b) (b + 1) % n else b).toLong) // no self-loops
    }
    val prop = Prop.forAll(edgeList) { edges =>
      val spark2 = spark; import spark2.implicits._
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == ufComponents(edges)
    }
    // few samples — every sample runs an iterative Spark job; the shapes
    // above cover the adversarial cases deterministically
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponents: chain, clique, and disjoint pairs resolve to min-id components") {
    // 64-node chain 100-101-...-163: diameter 63 — the pointer jump
    // resolves it in ~log2(63) rounds where plain min-propagation would
    // need all 63 (within maxIter=64, but two orders slower); plus a
    // 4-clique and a lone pair.
    val chain = (100L until 163L).map(i => (i, i + 1))
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val lone = Seq((900L, 901L))
    val pairs = (chain ++ clique ++ lone).toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (100L to 163L).foreach(v => assert(comp(v) == 100L, s"chain node $v"))
    (0L to 3L).foreach(v => assert(comp(v) == 0L))
    assert(comp(900L) == 900L && comp(901L) == 900L)
    assert(comp.size == 64 + 4 + 2)
  }

  test("star contraction == pointer jumping on chain, clique, disjoint pairs, and random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def comps(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the deterministic adversarial shapes: a diameter-63 chain (the
    // pointer-jumping worst case star contraction exists to bound), a
    // clique, a lone pair
    val chain = (100L until 163L).map(i => (i, i + 1))
    val clique = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val pairs = (chain ++ clique ++ Seq((900L, 901L))).toDF("doc_a", "doc_b")
    assert(comps(Dedup.connectedComponentsContraction(pairs)) ==
           comps(Dedup.connectedComponents(pairs)))
    // random graphs: both algorithms == each other (property)
    val edgeList: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 50)
      m <- Gen.choose(1, 80)
      raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
    } yield raw.map { case (a, b) =>
      (a.toLong, (if (a == b) (b + 1) % n else b).toLong)
    }
    val prop = Prop.forAll(edgeList) { edges =>
      val spark2 = spark; import spark2.implicits._
      val df = edges.toDF("doc_a", "doc_b")
      comps(Dedup.connectedComponentsContraction(df)) == comps(Dedup.connectedComponents(df))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("star contraction: round count stays logarithmic where pointer jumping is diameter-bound") {
    // the whole point of the variant: a long chain converges in a few
    // contraction rounds (paper bound O(log² n)); measured 5 on n=128
    val longChain = (0L until 127L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponentsContraction(longChain, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 127L).forall(out(_) == 0L))
  }

  test("resolveDuplicates: every doc mapped, min-id survivor kept, singletons keep themselves") {
    val out = Dedup.resolveDuplicates(docs, Dedup.ngramJaccard(docs, threshold = 0.5))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // docs: 1≈2 near-dup, 4 exact dup of 1 → {1,2,4} one cluster; 3 alone
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 3L, true), (4L, 1L, false)))
  }

  test("resolveDuplicates with no pairs: all docs are their own component") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.resolveDuplicates(docs, empty).orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.forall(_.getBoolean(2)))
  }

  test("simhash: identical docs distance 0; near dups close; unrelated far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(sh(1L), sh(2L)) < dist(sh(1L), sh(3L)))
  }

  test("simhashNearDup blocks on 16-bit chunks and returns dup pairs") {
    val pairs = Dedup.simhashNearDup(docs, maxDist = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("ngram jaccard: exact dup scores 1.0; hot-shingle guard drops stop-grams") {
    val out = Dedup.ngramJaccard(docs, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 4L)) == 1.0)
    assert(out.keySet.forall { case (a, b) => a != 3L && b != 3L })
    // hot-key guard: with maxDocFreq=0 every shingle is "hot" → no pairs
    assert(Dedup.ngramJaccard(docs, threshold = 0.0, maxDocFreq = 0).count() == 0)
  }

  test("shingleContainment: doc-inside-doc flagged where jaccard misses; contained side is the smaller set") {
    // doc 6 is doc 5's prefix: every shingle of 6 appears in 5, but 5 has
    // ~3x the shingles, so jaccard is diluted while containment is 1.0
    val longDoc = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega")
    val shortDoc = "alpha beta gamma delta epsilon zeta eta theta"
    val cd = Seq((5L, longDoc), (6L, shortDoc), (7L, docC)).toDF("doc_id", "text")
    val out = Dedup.shingleContainment(cd, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3), r.getLong(4)))).toMap
    val ((cont, jac, containedId)) = out((5L, 6L))
    assert(cont == 1.0 && jac < 0.8 && containedId == 6L)
    assert(out.keySet.forall { case (a, b) => a != 7L && b != 7L })
    // containment >= jaccard pointwise: at threshold 0, every jaccard pair
    // appears in the containment pair set with containment >= its jaccard
    val both = Dedup.shingleContainment(docs, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
    assert(both.nonEmpty && both.forall { case (_, (c, j)) => c >= j })
    // exact dup (1,4): containment == jaccard == 1.0, tie → lower id contained
    val exact = Dedup.shingleContainment(docs, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(exact((1L, 4L)) == 1L)
  }

  /** Recall gates for the approximate dedup family vs the exact-Jaccard
    * twin on the real documents corpus: the approximate ops have no DuckDB
    * oracle (inherent), so without these floors a candidate-generation
    * regression that silently emptied the pair set would still pass
    * "rows > 0". Floors sit below pin-time measurements (x2 = 1.0,
    * x3 = 0.93 on sf0.001) with margin for parameter-free drift.
    */
  test("minhashLsh pair-recall floor vs exact ngram Jaccard on real docs") {
    val corpus = Tables.documents(spark, sfDir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.ngramJaccard(corpus, threshold = 0.6))
    assert(exact.nonEmpty)
    val mh = pairSet(Dedup.minhashLsh(corpus, threshold = 0.5))
    val recall = (exact & mh).size.toDouble / exact.size
    assert(recall >= 0.9, s"minhashLsh recall $recall < 0.9 (measured 1.0 at pin time)")
  }

  test("simhashNearDup pair-recall floor vs exact ngram Jaccard on real docs") {
    val corpus = Tables.documents(spark, sfDir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.ngramJaccard(corpus, threshold = 0.6))
    assert(exact.nonEmpty)
    val sh = pairSet(Dedup.simhashNearDup(corpus, maxDist = 8))
    val recall = (exact & sh).size.toDouble / exact.size
    assert(recall >= 0.8, s"simhashNearDup recall $recall < 0.8 (measured 0.93 at pin time)")
  }

  test("lshPlan: workload counts match the real banding pipeline; thresholds follow the S-curve") {
    val docs = Tables.documents(spark, sfDir)
    val sigs = Dedup.minhashSignatures(docs).localCheckpoint()
    val plan = Dedup.lshPlan(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(5))).toSeq
    assert(plan.map(_._1) == Seq(8L, 16L, 32L, 64L))
    // internal consistency: the (32, 4) row's candidate workload equals
    // a direct recount over the same band keys
    val direct = sigs
      .select(explode(Dedup.bandKeys(col("sig"), 32, 4)).as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).collect().head.getDouble(0).toLong
    assert(plan.find(_._1 == 32L).get._3 == direct)
    // more bands -> lower crossover threshold (recall up, cost up)
    assert(plan.map(_._4) == plan.map(_._4).sorted.reverse)
    // golden: (1/32)^(1/4) = 0.420448
    assert(plan.find(_._1 == 32L).get._4 == 0.420448)
    intercept[IllegalArgumentException] {
      Dedup.lshPlan(sigs, configs = Seq((7, 13)))
    }
  }

  test("resolveBestByScore: highest-quality member keeps; score ties degrade to lowest id") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("doc_a", "doc_b")
    val scores = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5), (4L, 0.7), (5L, 0.7))
      .toDF("doc_id", "quality_score")
    val out = Dedup.resolveBestByScore(docs, pairs, scores)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    // cluster {1,2}: 2 has the higher score -> 2 keeps, NOT the lower id
    assert(out(1L) == (1L, false) && out(2L) == (1L, true))
    // singleton keeps itself
    assert(out(3L) == (3L, true))
    // cluster {4,5}: tied scores -> lowest id keeps (resolveDuplicates' rule)
    assert(out(4L) == (4L, true) && out(5L) == (4L, false))
    // a doc the scorer skipped still comes out (one row per input doc),
    // ranks below any scored cluster-mate, and an all-unscored cluster
    // degrades to the lowest-id rule
    val partial = Seq((1L, 0.1)).toDF("doc_id", "quality_score")
    val out2 = Dedup.resolveBestByScore(docs, pairs, partial)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out2.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out2(1L) && !out2(2L)) // scored 1 beats unscored 2
    assert(out2(4L) && !out2(5L)) // all-unscored cluster: lowest id
  }

  test("resolveBestByScore: exactly one keeper per component, and it attains the component max score") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.ngramJaccard(docs, threshold = 0.5)
    val scores = TextStats.qualityScore(docs).select("doc_id", "quality_score")
    val out = Dedup.resolveBestByScore(docs, pairs, scores).cache()
    try {
      assert(out.count() == docs.count())
      val perComp = out.groupBy("component")
        .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
             max(col("quality_score")).as("mx"),
             max(when(col("keep"), col("quality_score"))).as("kept_score"))
        .collect()
      assert(perComp.forall(_.getLong(1) == 1L))
      assert(perComp.forall(r => r.getDouble(2) == r.getDouble(3)))
    } finally out.unpersist()
  }

  test("random graphs + partial scores: resolveBestByScore == union-find + argmax reference (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def ref(nDocs: Int, edges: Seq[(Long, Long)],
            scores: Map[Long, Double]): Map[Long, (Long, Boolean)] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val px = parent.getOrElse(x, x)
        if (px == x) x else { val r = find(px); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val docs = (0L until nDocs.toLong).toSeq
      val comp = docs.map(d => d -> find(d)).toMap
      val best = docs.groupBy(comp).map { case (c, members) =>
        c -> members.maxBy(d =>
          (scores.getOrElse(d, Double.NegativeInfinity), -d))
      }
      docs.map(d => d -> (comp(d), best(comp(d)) == d)).toMap
    }
    val gen = for {
      n <- Gen.choose(2, 20)
      m <- Gen.choose(0, 25)
      raw <- Gen.listOfN(m, Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
      // quantized scores force ties; each doc scored with prob ~2/3
      scored <- Gen.listOfN(n, Gen.option(Gen.choose(0, 4).map(_ / 4.0)))
    } yield (n,
      raw.collect { case (a, b) if a != b => (a.toLong, b.toLong) },
      scored.zipWithIndex.collect { case (Some(v), i) => (i.toLong, v) }.toMap)
    val prop = Prop.forAll(gen) { case (n, edges, scores) =>
      val spark2 = spark; import spark2.implicits._
      val docs = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val scoreDf = scores.toSeq.toDF("doc_id", "quality_score")
      val got = Dedup.resolveBestByScore(docs, pairs, scoreDf)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(3))).toMap
      got == ref(n, edges, scores)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
