package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Similarity search: brute-force cosine top-k + LSH-bucketed ANN. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(1.0f, 0.0f, 0.0f))   // identical to 0
  ).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val a = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f),
                 Array(-1.0f, -2.0f, -3.0f))).toDF("v", "same", "neg")
    val r = a.select(
      Similarity.cosine(col("v"), col("same")).as("s"),
      Similarity.cosine(col("v"), col("neg")).as("n")).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine desc with id tie-break") {
    val q = vecs.filter(col("vec_id") === 0L)
    val out = Similarity.bruteForceTopK(vecs, q, k = 4)
      .orderBy("rank").collect()
    // identical vector 4 first (sim 1), then 1, then 2 (0), then 3 (-1)
    assert(out.map(_.getLong(1)).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(out.head.getLong(2) == 1L)
  }

  test("lsh bucket is deterministic and identical vectors collide") {
    val b = vecs.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) == b(4L)) // identical vectors → same bucket always
    val b2 = vecs.select(Similarity.lshBucket(col("embedding"), 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b2 == Seq(b(0L), b(1L), b(2L), b(3L), b(4L))) // rerun stable
  }

  test("embeddingNearDup finds the identical pair") {
    val pairs = Similarity.embeddingNearDup(vecs, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  test("embeddingNearDup == vector-carrying reference formulation on real embeddings") {
    // Reference = the naive multi-table LSH that carries full vectors
    // through the bucket self-join and dedups AFTER scoring (the r1/r2
    // formulation). The shipped id-only version must produce the identical
    // pair set — it only reorders distinct-then-score vs score-then-distinct.
    val emb = Tables.embeddings(spark, sfDir)
    def norm(c: org.apache.spark.sql.Column) = Similarity.norm(c)
    val keyed = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("n", norm(col("v")))
      .select(col("id"), col("v"), col("n"),
        posexplode(array((0 until 4).map(t =>
          Similarity.lshBucket(col("v"), 8, seed = 42L + t)): _*)).as(Seq("tbl", "bucket")))
    val a = keyed.select(col("tbl"), col("bucket"),
      col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = keyed.select(col("tbl"), col("bucket"),
      col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    val ref = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Num.roundTo(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")), 9).as("sim"))
      .distinct()
      .filter(col("sim") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // nbits/tables pinned to the inline reference's sketch; the cap is
    // lifted explicitly so equality never silently depends on fixture
    // bucket sizes staying under it (cap behavior has its own tests below)
    val got = Similarity.embeddingNearDup(emb, threshold = 0.35, nbits = 8,
        tables = 4, maxBucket = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref && got.nonEmpty)
  }

  test("knnLabelAccuracy: planted clusters with cluster-consistent labels score 1.0") {
    import spark.implicits._
    // planted 50 clusters × 5 members: label = cluster id → every
    // vector's 4 nearest neighbors are its cluster mates → accuracy 1.0
    val labeled = planted.withColumn("label", (col("vec_id") / 5).cast("int"))
    val out = Similarity.knnLabelAccuracy(labeled, k = 4)
      .orderBy("label").collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(r.getLong(1) == 5L && r.getLong(2) == 5L && r.getDouble(3) == 1.0)
    }
    // shuffled labels destroy it: assign label = vec_id % 2 with
    // clusters of 5 — neighbors split 2/2 or 3/1, accuracy < 1
    val adversarial = planted.withColumn("label", (col("vec_id") % 2).cast("int"))
    val acc = Similarity.knnLabelAccuracy(adversarial, k = 4)
      .agg(sum("n_correct").cast("double") / sum("n_queries")).collect().head.getDouble(0)
    assert(acc < 0.9, s"adversarial labels scored $acc")
  }

  test("knnLabelAccuracySampled: stride=1 == full eval; stride>1 counts only sampled queries") {
    import spark.implicits._
    val labeled = planted.withColumn("label", (col("vec_id") / 5).cast("int"))
    // stride=1 samples everything → must equal the full LOO row for row
    // (different join paths: unhinted vs broadcast — same semantics)
    val full = Similarity.knnLabelAccuracy(labeled, k = 4)
      .orderBy("label").collect().toSeq
    val all = Similarity.knnLabelAccuracySampled(labeled, stride = 1, k = 4)
      .orderBy("label").collect().toSeq
    assert(all == full)
    // stride=5 → one query per cluster (ids 0,5,10,…); every sampled
    // query still sees its 4 cluster mates in the FULL corpus → 1.0
    val sampled = Similarity.knnLabelAccuracySampled(labeled, stride = 5, k = 4)
      .orderBy("label").collect()
    assert(sampled.map(_.getLong(1)).sum == 50L, "one query per cluster")
    sampled.foreach(r => assert(r.getDouble(3) == 1.0))
  }

  test("quantizeInt8: q in [-127,127], zero vector safe, error bounded by scale/2") {
    import spark.implicits._
    val df = Seq(
      (1, Array(1.0f, -0.5f, 0.25f)),
      (1, Array(0.0f, 0.0f, 0.0f)), // zero vector: scale 0, q all zeros
      (2, Array(100.0f, -100.0f, 3.0f))
    ).toDF("label", "embedding")
    val q = Similarity.quantizeInt8(df).collect()
    q.foreach { r =>
      val qs = r.getSeq[Int](r.fieldIndex("q_vec"))
      assert(qs.forall(v => v >= -127 && v <= 127), qs.toString)
    }
    val zero = q.find(r => r.getSeq[Float](r.fieldIndex("embedding")).forall(_ == 0.0f)).get
    assert(zero.getSeq[Int](zero.fieldIndex("q_vec")).forall(_ == 0))
    // per-element error of symmetric quantization is <= scale/2 + eps
    val err = Similarity.quantizationError(df).orderBy("label").collect()
    assert(err.length == 2)
    err.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 0.5))
  }

  test("labelCentroids: exact element-wise means per label") {
    import spark.implicits._
    val df = Seq(
      (1, Array(1.0f, 2.0f)), (1, Array(3.0f, 4.0f)), // label 1: mean (2, 3)
      (2, Array(10.0f, 0.0f))                         // label 2: mean (10, 0)
    ).toDF("label", "embedding")
    val out = Similarity.labelCentroids(df).orderBy("label", "dim")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((1, 0L, 2.0, 2L), (1, 1L, 3.0, 2L),
                            (2, 0L, 10.0, 1L), (2, 1L, 0.0, 1L)))
  }

  test("autoNbits tracks corpus size: 8 bits at fixture scale, 20 at 100 TB") {
    assert(Similarity.autoNbits(0L) == 8)
    assert(Similarity.autoNbits(500L) == 8)
    assert(Similarity.autoNbits(65536L) == 10)   // 2^16/64 = 2^10
    assert(Similarity.autoNbits(100_000_000L) == 20) // ceil(log2) = 21, clamped
    assert(Similarity.autoNbits(Long.MaxValue / 2) == 20)
  }

  test("topk_by_score == window formulation on NaN scores") {
    import spark.implicits._
    // Spark's desc ordering treats NaN as greater than any double; the
    // bounded-heap comparator must impose the same total order
    // (Double.compare) — the old `s1 > s2` returned false both ways for
    // NaN, so an under-full heap never evicted it and sortWith saw an
    // inconsistent comparator. (The similarity ops themselves never emit
    // NaN — roundTo's floor coerces it — but topk_by_score is a
    // registered function; any caller can feed raw scores.)
    val scored = Seq(
      (10L, 1L, 0.9), (10L, 2L, Double.NaN), (10L, 3L, 0.95),
      (10L, 4L, Double.NaN), (10L, 5L, 0.1), (11L, 6L, Double.NaN),
      (11L, 7L, 1.0)
    ).toDF("query_id", "neighbor_id", "sim")
    val win = windowRank(scored, 3).orderBy("query_id", "rank").collect()
    val agg = scored.groupBy(col("query_id"))
      .agg(call_function("topk_by_score", col("sim"), col("neighbor_id"), lit(3)).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("nb.score").as("sim"))
      .orderBy("query_id", "rank").collect()
    assert(win.length == agg.length && win.nonEmpty)
    win.zip(agg).foreach { case (w, a) =>
      assert(w.getLong(0) == a.getLong(0) && w.getLong(1) == a.getLong(1)
        && w.getLong(2) == a.getLong(2))
      assert(java.lang.Double.compare(w.getDouble(3), a.getDouble(3)) == 0) // NaN == NaN
    }
    // NaN-first under desc, id tie-break between the two NaNs
    assert(win.take(3).map(_.getLong(1)).toSeq == Seq(2L, 4L, 3L))
  }

  test("dimTruncationRecall: zero-padded dims give recall 1, informative dims degrade, full width exact") {
    import spark.implicits._
    // 4-dim vectors whose last two dims are ZERO: truncating to 2 dims
    // cannot change any cosine, so recall@k(2) == 1.0 exactly
    val padded = (0L until 40L).map { i =>
      (i, Array((i % 7 + 1).toFloat, (i % 5 + 1).toFloat, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val pq = padded.filter(col("vec_id") % 4 === 0)
    val p = Similarity.dimTruncationRecall(padded, pq, dims = Seq(2, 4), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(p(2L) == 1.0 && p(4L) == 1.0, s"zero-padded: $p")
    // fixture corpus: full width is exact by construction; wider prefixes
    // never lose to the 8-dim prefix on aggregate
    val emb = Tables.embeddings(spark, sfDir)
    val r = Similarity.dimTruncationRecall(emb, Similarity.querySet(emb, "vec_id", 20))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(64L) == 1.0, s"full width must agree with itself: $r")
    assert(r(32L) >= r(8L), s"32-dim prefix must not lose to 8-dim: $r")
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("ivfProbeCurve: monotone non-decreasing in nprobe, nprobe=|cells| is exactly 1.0") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.querySet(emb, "vec_id", 20)
    val cb = Similarity.trainIvfCodebook(emb, cells = 16, iters = 3)
    val r = Similarity.ivfProbeCurve(emb, q, cb, probes = Seq(1, 4, 16))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // more probes can only ADD candidate cells: recall is monotone
    assert(r(1L) <= r(4L) && r(4L) <= r(16L), s"monotonicity: $r")
    // probing every cell degenerates to exact brute force
    assert(r(16L) == 1.0, s"nprobe=|cells| must be exact: $r")
    assert(r.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("embeddingNearDup default path is lazy: no Spark job at DataFrame construction") {
    import spark.implicits._
    // Canary input: ANY job that executes this plan throws. r5's default
    // path ran df.count() inside embeddingNearDup at construction time —
    // this fixture would have detected it; the plan-stats estimate must
    // not trigger execution.
    val boom = spark.range(8).map { _ =>
      throw new RuntimeException("eager: a Spark job ran at DataFrame construction")
      (0L, Array(0.0f)): (Long, Array[Float]) // unreachable; fixes the encoder type
    }.toDF("vec_id", "embedding")
    val nd = Similarity.embeddingNearDup(boom) // must not throw: construction is lazy
    // prove the canary works: actually running the plan does throw
    val ex = intercept[Exception](nd.count())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null && c.getMessage.startsWith("eager:")))
  }

  test("estimatedRows: exact when row count known, size-based fallback never zero") {
    import spark.implicits._
    // LocalRelation carries an exact rowCount in plan stats
    val local = (0L until 100L).map(i => (i, Array(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.estimatedRows(local) == 100L)
    // parquet scan: no CBO stats → sizeInBytes/defaultSize fallback, ≥ 1
    val est = Similarity.estimatedRows(Tables.embeddings(spark, sfDir))
    assert(est >= 1L)
  }

  test("topk_by_score == window formulation on ±0.0 ties") {
    import spark.implicits._
    // Spark's double ordering (SQLOrderingUtil.compareDoubles) checks
    // x == y FIRST, so -0.0 and 0.0 tie and fall to the id tie-break; raw
    // Double.compare instead orders 0.0 above -0.0. id 1 carries -0.0 and
    // id 2 carries 0.0 so the raw-compare bug would emit (2, 1) here.
    val scored = Seq(
      (10L, 1L, -0.0), (10L, 2L, 0.0), (10L, 3L, 0.5), (10L, 4L, -0.5),
      (11L, 5L, 0.0), (11L, 6L, -0.0)
    ).toDF("query_id", "neighbor_id", "sim")
    val win = windowRank(scored, 3).orderBy("query_id", "rank").collect()
    val agg = scored.groupBy(col("query_id"))
      .agg(call_function("topk_by_score", col("sim"), col("neighbor_id"), lit(3)).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("nb.score").as("sim"))
      .orderBy("query_id", "rank").collect()
    assert(win.length == agg.length && win.nonEmpty)
    win.zip(agg).foreach { case (w, a) =>
      assert(w.getLong(0) == a.getLong(0) && w.getLong(1) == a.getLong(1)
        && w.getLong(2) == a.getLong(2))
      assert(w.getDouble(3) == a.getDouble(3)) // ±0.0 compare equal under ==
    }
    // the ±0.0 tie breaks by id: 1 before 2 (query 10), 5 before 6 (query 11)
    assert(win.filter(_.getLong(0) == 10L).map(_.getLong(1)).toSeq == Seq(3L, 1L, 2L))
    assert(win.filter(_.getLong(0) == 11L).map(_.getLong(1)).toSeq == Seq(5L, 6L))
  }

  test("embeddingNearDup maxBucket=0 drops every bucket: zero pairs") {
    assert(Similarity.embeddingNearDup(vecs, threshold = 0.0, maxBucket = 0).count() == 0)
  }

  test("embeddingNearDup samples over-cap buckets instead of dropping them wholesale") {
    import spark.implicits._
    // 300 identical vectors: one hot bucket per table, far over the cap.
    // The old wholesale drop returned ZERO pairs here; sampling must keep
    // ≈maxBucket ids per (tbl, bucket) and still surface dup pairs.
    val hot = (0L until 300L).map(i => (i, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDup(hot, threshold = 0.99, nbits = 8,
        tables = 4, maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "over-cap bucket was dropped wholesale")
    // bounded: each table contributes ≤ ~2·maxBucket sampled ids →
    // candidate pairs stay far below the uncapped C(300,2) = 44850
    assert(pairs.length < 10000, s"cap not applied: ${pairs.length} pairs")
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("embeddingNearDup plan: no vector payload below the bucket self-join") {
    // The candidate join on (tbl, bucket) must move ids only — at 100 TB
    // carrying the embeddings through the explode×tables and the self-join
    // is the difference between shuffling 8-byte keys and the corpus ×4.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types.ArrayType
    val plan = Similarity.embeddingNearDup(Tables.embeddings(spark, sfDir))
      .queryExecution.optimizedPlan
    val bucketJoins = plan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "bucket")) => j
    }
    assert(bucketJoins.nonEmpty, "expected a self-join keyed on `bucket`")
    bucketJoins.foreach { j =>
      val arrays = j.children.flatMap(_.output).filter(_.dataType.isInstanceOf[ArrayType])
      assert(arrays.isEmpty,
        s"vector/array columns ride the bucket self-join: ${arrays.map(_.name)}")
    }
  }

  /** Planted near-duplicate clusters: 50 bases × 5 noisy copies (σ=0.05 on
    * unit-scale gaussians, dim 64). The synthetic `embeddings` table is
    * uniform-random — no neighbor structure, so recall there measures
    * nothing; planted clusters make recall a real regression gate (a broken
    * bucket function or candidate join drops it to ~0).
    */
  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    (0 until 50).flatMap { c =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 5).map { i =>
        ((c * 5 + i).toLong, base.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
      }
    }.toDF("vec_id", "embedding")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("lshTopK recall floor on planted clusters (gate vs exact top-k)") {
    val q = Similarity.querySet(planted, "vec_id", 5) // one query per cluster
    val exact = pairSet(Similarity.bruteForceTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val lsh = pairSet(Similarity.lshTopK(planted, q, k = 4, nbits = 8), "query_id", "neighbor_id")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.6, s"lshTopK recall $recall < 0.6 (measured 0.74 at pin time)")
  }

  test("multi-probe LSH dominates single-probe on planted clusters") {
    val q = Similarity.querySet(planted, "vec_id", 5)
    val exact = pairSet(Similarity.bruteForceTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val single = pairSet(Similarity.lshTopK(planted, q, k = 4, nbits = 8), "query_id", "neighbor_id")
    val multi = pairSet(Similarity.lshTopKMultiProbe(planted, q, k = 4, nbits = 8), "query_id", "neighbor_id")
    val rSingle = (exact & single).size.toDouble / exact.size
    val rMulti = (exact & multi).size.toDouble / exact.size
    info(s"recall multi=$rMulti single=$rSingle")
    // candidate sets are supersets probe by probe, and the shared
    // tie-break makes per-query recall monotone in the candidate set —
    // multi-probe can never lose to single-probe
    assert(rMulti >= rSingle, s"multi $rMulti < single $rSingle")
    assert(rMulti >= 0.85, s"multi-probe recall $rMulti < 0.85")
  }

  test("ivfTopK recall floor on planted clusters (gate vs exact top-k)") {
    val q = Similarity.querySet(planted, "vec_id", 5)
    val exact = pairSet(Similarity.bruteForceTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val ivf = pairSet(Similarity.ivfTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"ivfTopK recall $recall < 0.7 (measured 0.875 at pin time)")
  }

  test("multi-probe IVF: nprobe=|cells| degenerates to exact brute force, row for row") {
    // with every cell probed, the cell join scores every (query, neighbor)
    // pair — the whole probe/join/rank pipeline must reproduce
    // bruteForceTopK exactly (same rounding, same tie-breaks)
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.querySet(emb, "vec_id", 50)
    val cb = Similarity.trainIvfCodebook(emb, cells = 8, iters = 2)
    val nCells = cb.count().toInt
    val multi = Similarity.ivfTopKTrainedMultiProbe(emb, q, cb, k = 5, nprobe = nCells)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val brute = Similarity.bruteForceTopK(emb, q, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(multi.nonEmpty && multi == brute)
  }

  test("hardNegativesAnn: nprobe=|cells| degenerates to hardNegatives, row for row") {
    // with every cell probed the band sees every (query, neighbor) pair,
    // so the ANN form must reproduce the exact miner row for row —
    // pinning the routing + band + heap pipeline end to end
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.querySet(emb, "vec_id", 50)
    val cb = Similarity.trainIvfCodebook(emb, cells = 8, iters = 2)
    val nCells = cb.count().toInt
    val ann = Similarity.hardNegativesAnn(emb, q, cb, k = 5, nprobe = nCells)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val brute = Similarity.hardNegatives(emb, q, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(ann.nonEmpty && ann == brute)
  }

  test("hardNegativesAnn recall floor vs the exact band miner at default knobs") {
    // planted 64-d gaussians: cross-cluster cosines sit ~N(0, 1/64), so
    // the [0.05, 0.42) band holds real moderately-similar pairs — the
    // hard negatives; the floor gates that multiprobe routing still
    // surfaces most of what the exact Q×N band scan finds
    val q = Similarity.querySet(planted, "vec_id", 5)
    val cb = Similarity.trainIvfCodebook(planted, cells = 16, iters = 3)
    val exact = pairSet(Similarity.hardNegatives(planted, q, k = 4), "query_id", "neighbor_id")
    val ann = pairSet(Similarity.hardNegativesAnn(planted, q, cb, k = 4, nprobe = 4),
      "query_id", "neighbor_id")
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"hard-negative ANN recall $recall")
    assert(recall >= 0.75, s"hard-neg ANN recall $recall < 0.75 (measured 0.96 at pin time)")
  }

  test("ivfAddReport: counts reconcile, drift flag fires exactly on the planted hot cell") {
    import spark.implicits._
    // corpus: two tight clusters around +e1 and -e1 (4 cells trained);
    // batch: ALL new vectors land near +e1 — its cell's share must
    // drift and flag, while counts reconcile exactly
    val rnd = new scala.util.Random(11)
    def around(base: Float, id: Long) =
      (id, Array.tabulate(8)(i => (if (i == 0) base else 0f) + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = ((0L until 40L).map(around(1f, _)) ++
                  (40L until 80L).map(around(-1f, _))).toDF("vec_id", "embedding")
    val batch = (100L until 140L).map(around(1f, _)).toDF("vec_id", "embedding")
    val cb = Similarity.trainIvfCodebook(corpus, cells = 4, iters = 3)
    val out = Similarity.ivfAddReport(corpus, batch, cb).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(6)))
    assert(out.map(_._1).sum == 80L && out.map(_._2).sum == 40L)
    out.foreach { case (nb, na, nafter, _) => assert(nafter == nb + na) }
    // the hand rule, re-applied: flag iff cross-multiplied share drift >= 250bp
    val (totB, totA) = (80L, 120L)
    out.foreach { case (nb, _, nafter, flag) =>
      val want = math.abs(nafter * totB - nb * totA) * 10000L >= 250L * totB * totA
      assert(flag == want, s"flag mismatch at n_before=$nb n_after=$nafter")
    }
    // the planted skew must actually fire somewhere (+e1 cells gain
    // 100% of the batch) and leave the -e1 side flagged too (its share
    // halves) — but a no-drift batch flags NOTHING
    assert(out.exists(_._4))
    val balanced = Similarity.ivfAddReport(corpus, corpus
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")), cb).collect()
    assert(balanced.forall(!_.getBoolean(6)), "identical distribution must not flag")
  }

  test("ivfDeleteReport: counts reconcile, empty list is a no-op, whole-cluster takedown flags") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def around(base: Float, id: Long) =
      (id, Array.tabulate(8)(i => (if (i == 0) base else 0f) + 0.01f * rnd.nextGaussian().toFloat))
    val corpus = ((0L until 40L).map(around(1f, _)) ++
                  (40L until 80L).map(around(-1f, _))).toDF("vec_id", "embedding")
    val cb = Similarity.trainIvfCodebook(corpus, cells = 4, iters = 3)
    // takedown of the ENTIRE -e1 cluster: its cells empty and flag,
    // counts reconcile exactly
    val out = Similarity.ivfDeleteReport(corpus,
        (40L until 80L).toDF("vec_id"), cb).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(6)))
    assert(out.map(_._1).sum == 80L && out.map(_._2).sum == 40L)
    out.foreach { case (nb, nr, na, _) => assert(na == nb - nr && nr <= nb) }
    val (totB, totA) = (80L, 40L)
    out.foreach { case (nb, _, na, flag) =>
      val want = math.abs(na * totB - nb * totA) * 10000L >= 250L * totB * totA
      assert(flag == want, s"flag mismatch at n_before=$nb n_after=$na")
    }
    assert(out.exists(_._4), "emptying half the corpus must flag somewhere")
    // empty delete-list: nothing removed, nothing flagged
    val noop = Similarity.ivfDeleteReport(corpus,
        spark.emptyDataset[Long].toDF("vec_id"), cb).collect()
    assert(noop.map(_.getLong(2)).sum == 0L)
    assert(noop.forall(!_.getBoolean(6)))
  }

  test("post-delete tombstone serving: deleted ids never surface; nprobe=|cells| == brute force over retained") {
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val retained = corpus.filter(col("vec_id") % 10 =!= 6)
    val cb = Similarity.trainIvfCodebook(corpus, cells = 16, iters = 3)
    val q = Similarity.querySet(corpus, "vec_id", 20)
    val served = Similarity.ivfTopKTrainedMultiProbe(retained, q, cb, nprobe = 4)
      .collect()
    assert(served.nonEmpty)
    assert(served.forall(_.getLong(1) % 10 != 6), "a deleted id surfaced as a neighbor")
    // full probing over the (untouched) pre-delete layout == brute
    // force over the retained set: tombstone filtering loses nothing
    val full = Similarity.ivfTopKTrainedMultiProbe(retained, q, cb, nprobe = 16)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    val brute = Similarity.bruteForceTopK(retained, q)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(full == brute)
  }

  test("ivfRetrain: warm start == continued training; converged zero-batch retrain is a fixed point") {
    import spark.implicits._
    def vec(x: Float) = Array.tabulate(8)(i => if (i == 0) x else 0f)
    // ids INTERLEAVED across the two clusters so the lowest-id cold init
    // covers both (the trainIvfCodebook spec's discipline)
    val corpus = (0L until 80L).map(id =>
      (id, vec(if (id % 2 == 0) 1f else -1f))).toDF("vec_id", "embedding")
    val empty = corpus.filter(lit(false))

    // (1) warm start IS continued training: retraining a 2-round codebook
    // for 1 more round over the same data == cold-training 3 rounds
    val contd = Similarity.ivfRetrainCodebook(corpus, empty,
      Similarity.trainIvfCodebook(corpus, cells = 2, iters = 2), iters = 1)
    val cold = Similarity.trainIvfCodebook(corpus, cells = 2, iters = 3)
    assert(contd.orderBy("cell").collect().map(_.toString).toSeq ==
           cold.orderBy("cell").collect().map(_.toString).toSeq)

    // (2) fixed point: the 2-cluster fixture converges (4 rounds is
    // plenty — verify by one more round changing nothing), and then a
    // retrain with ZERO new vectors moves nothing: every cell keeps its
    // population exactly
    val converged = Similarity.trainIvfCodebook(corpus, cells = 2, iters = 4)
    val oneMore = Similarity.ivfRetrainCodebook(corpus, empty, converged, iters = 1)
    assert(converged.orderBy("cell").collect().map(_.toString).toSeq ==
           oneMore.orderBy("cell").collect().map(_.toString).toSeq,
      "fixture did not converge in 4 rounds; fixed-point premise broken")
    val fp = Similarity.ivfRetrain(corpus, empty, converged, iters = 2).collect()
    fp.foreach { r =>
      assert(r.getLong(3) == 0L && r.getLong(4) == 0L, s"moves in fixed point: $r")
      assert(r.getLong(1) == r.getLong(2), s"population changed in fixed point: $r")
    }

    // (3) the engineered switch-over: a batch at -0.2 drags the -1
    // centroid to ~-0.6, flipping the +0.15 probe vector (nearer +1
    // before, nearer -0.6 after) — exactly one vector moves, and the
    // report's arrivals/departures balance
    val probe = Seq((200L, vec(0.15f))).toDF("vec_id", "embedding")
    val batch = (100L until 140L).map(id => (id, vec(-0.2f))).toDF("vec_id", "embedding")
      .unionByName(probe)
    val cb = Similarity.trainIvfCodebook(corpus, cells = 2, iters = 4)
    val out = Similarity.ivfRetrain(corpus, batch, cb, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(_._2).sum == 121L && out.map(_._3).sum == 121L) // corpus 80 + batch 41
    assert(out.map(_._4).sum == out.map(_._5).sum, s"arrivals != departures: ${out.toSeq}")
    assert(out.map(_._4).sum == 1L, s"expected exactly the probe to move: ${out.toSeq}")
    // determinism under repartition
    val re = Similarity.ivfRetrain(corpus.repartition(7), batch, cb, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("post-retrain search (v29): zero-round retrain leaves the v12 search unchanged; retrained search keeps the top-k contract") {
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val cb = graft.ops.Iterate.materialize(
      Similarity.trainIvfCodebook(corpus, cells = 16, iters = 3))
    val q = Similarity.querySet(emb, "vec_id", 20)
    def run(codebook: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopKTrainedMultiProbe(emb, q, codebook, nprobe = 4)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    // iters=0 retrain is the identity on the codebook → identical search
    val idCb = Similarity.ivfRetrainCodebook(corpus, batch, cb, iters = 0)
    assert(run(idCb) == run(cb))
    // the retrained index still answers the workload: every query keeps
    // contiguous ranks with non-increasing similarity
    val newCb = graft.ops.Iterate.materialize(
      Similarity.ivfRetrainCodebook(corpus, batch, cb, iters = 2))
    val out = run(newCb)
    assert(out.nonEmpty)
    out.groupBy(_.head).foreach { case (_, rows) =>
      val ranks = rows.map(_(2).asInstanceOf[Long])
      assert(ranks == (1L to ranks.length).toSeq)
      val sims = rows.map(_(3).asInstanceOf[Double])
      assert(sims == sims.sorted.reverse)
    }
  }

  test("ivfRelayoutDelta: untouched partitions byte-identical, result == full rewrite, emptied dirs removed") {
    import spark.implicits._
    def vec(x: Float, y: Float) = Array(x, y) ++ Array.fill(6)(0f)
    // three tight groups; ids interleaved so lowest-id init is irrelevant
    // (codebooks are supplied explicitly)
    val all = ((0L until 30L).map(id => (id, vec(1f, 0f))) ++
               (30L until 60L).map(id => (id, vec(-1f, 0f))) ++
               Seq((100L, vec(0.1f, 1f)))).toDF("vec_id", "embedding")
    val oldCb = Seq((0L, vec(1f, 0f)), (1L, vec(-1f, 0f)), (2L, vec(0f, 1f)))
      .toDF("cell", "cv")
    // new codebook: cell 2 moves far away -> vector 100 re-assigns to
    // cell 0 and cell 2 EMPTIES; cells 0/1 keep their members (cell 1
    // wholly unaffected, cell 0 gains one arrival)
    val newCb = Seq((0L, vec(1f, 0f)), (1L, vec(-1f, 0f)), (2L, vec(50f, 50f)))
      .toDF("cell", "cv")
    val tmp = tmpDir("v28").resolve("layout").toString
    Similarity.writeIvfLayout(all, oldCb, tmp)
    def files(cell: Long): Map[String, (Long, Long)] = {
      val d = java.nio.file.Paths.get(tmp, s"cell=$cell")
      if (!java.nio.file.Files.exists(d)) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.list(d)
        try walk.iterator().asScala.map(p => p.toString ->
          (java.nio.file.Files.size(p),
           java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
        finally walk.close()
      }
    }
    val cell1Before = files(1L)
    assert(cell1Before.nonEmpty)
    val report = Similarity.ivfRelayoutDelta(spark, tmp, all, oldCb, newCb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only cells 0 (gains vec 100) and 2 (loses it) are affected
    assert(report.keySet == Set(0L, 2L), s"affected cells: $report")
    assert(report(0L) == 31L && report(2L) == 0L, s"report: $report")
    // the unaffected cell-1 partition is BYTE-IDENTICAL (same files,
    // sizes, mtimes) — the 100 TB claim, checked at the filesystem
    assert(files(1L) == cell1Before, "untouched partition was rewritten")
    // the emptied cell-2 directory is gone
    assert(files(2L).isEmpty && !java.nio.file.Files.exists(
      java.nio.file.Paths.get(tmp, "cell=2")), "stale emptied partition survives")
    // read-back == a from-scratch full rewrite under the new codebook
    val readBack = spark.read.parquet(tmp)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullDir = tmpDir("v28full").resolve("layout").toString
    Similarity.writeIvfLayout(all, newCb, fullDir)
    val full = spark.read.parquet(fullDir)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(readBack == full)
    // no-op retrain (same codebook): nothing affected, nothing written
    val noop = Similarity.ivfRelayoutDelta(spark, tmp, all, newCb, newCb).collect()
    assert(noop.isEmpty)
  }

  test("multi-probe IVF dominates single-probe on planted clusters") {
    val q = Similarity.querySet(planted, "vec_id", 5)
    val exact = pairSet(Similarity.bruteForceTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val cb = Similarity.trainIvfCodebook(planted, cells = 16, iters = 3)
    val single = pairSet(Similarity.ivfTopKTrained(planted, q, cb, k = 4), "query_id", "neighbor_id")
    val multi = pairSet(Similarity.ivfTopKTrainedMultiProbe(planted, q, cb, k = 4, nprobe = 4),
      "query_id", "neighbor_id")
    val rSingle = (exact & single).size.toDouble / exact.size
    val rMulti = (exact & multi).size.toDouble / exact.size
    info(s"ivf recall multi=$rMulti single=$rSingle")
    assert(rMulti >= rSingle, s"multi $rMulti < single $rSingle")
  }

  test("assignCellsMulti: nprobe nearest cells in distance order, ties on cell id") {
    import spark.implicits._
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(-1.0f, 0.0f))).toDF("cell", "cv")
    val vs = Seq((10L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = Similarity.assignCellsMulti(vs, cents, nprobe = 2)
      .orderBy("dist").collect().map(r => r.getLong(1)).toSeq
    assert(out == Seq(0L, 1L), s"got $out") // nearest, then next-nearest
  }

  test("assignCells: nearest centroid by squared L2, cell-id tie-break") {
    import spark.implicits._
    val cents = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cell", "cv")
    val vs = Seq(
      (10L, Array(0.9f, 0.1f, 0.0f)), // → cell 0
      (11L, Array(0.1f, 0.9f, 0.0f)), // → cell 1
      (12L, Array(0.0f, 0.0f, 1.0f))  // equidistant → smaller cell id
    ).toDF("vec_id", "embedding")
    val out = Similarity.assignCells(vs, cents).orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out == Seq(10L -> 0L, 11L -> 1L, 12L -> 0L))
  }

  test("trainIvfCodebook: recovers planted clusters exactly, deterministic retrain") {
    import spark.implicits._
    // 4 well-separated clusters with ids INTERLEAVED (id % 4 = cluster) so
    // the lowest-id init covers every cluster — isolates Lloyd's from
    // init pathology, which the recall gate below covers instead
    val rnd = new scala.util.Random(11)
    val bases = Array.fill(4)(Array.fill(16)(rnd.nextGaussian().toFloat * 5))
    val data = (0 until 40).map { i =>
      (i.toLong, bases(i % 4).map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.trainIvfCodebook(data, cells = 4, iters = 4)
    val assigned = Similarity.assignCells(data, cb)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCluster = (0 until 4).map(c => (c until 40 by 4).map(i => assigned(i.toLong)).toSet)
    assert(perCluster.forall(_.size == 1), s"some cluster split across cells: $perCluster")
    assert(perCluster.flatten.toSet.size == 4, s"clusters merged: $perCluster")
    // retraining is bit-identical (decimal-exact means, deterministic init)
    val again = Similarity.trainIvfCodebook(data, cells = 4, iters = 4)
    assert(cb.orderBy("cell").collect().map(_.toString).toSeq ==
           again.orderBy("cell").collect().map(_.toString).toSeq)
  }

  test("ivfTopKTrained recall floor on planted clusters: beats the train-free cell") {
    val q = Similarity.querySet(planted, "vec_id", 5)
    val exact = pairSet(Similarity.bruteForceTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val cb = Similarity.trainIvfCodebook(planted, cells = 16, iters = 3)
    val trained = pairSet(Similarity.ivfTopKTrained(planted, q, cb, k = 4), "query_id", "neighbor_id")
    val ivf = pairSet(Similarity.ivfTopK(planted, q, k = 4), "query_id", "neighbor_id")
    val recallTrained = (exact & trained).size.toDouble / exact.size
    val recallFree = (exact & ivf).size.toDouble / exact.size
    info(s"recall trained=$recallTrained train-free=$recallFree")
    assert(recallTrained >= recallFree,
      s"trained codebook recall $recallTrained below train-free $recallFree")
    assert(recallTrained >= 0.9, s"trained recall $recallTrained < 0.9")
  }

  test("embeddingNearDup on planted clusters: exactly the true intra-cluster pairs") {
    val found = pairSet(Similarity.embeddingNearDup(planted, threshold = 0.99), "id_a", "id_b")
    val truePairs = (0 until 50).flatMap { c =>
      val ids = (0 until 5).map(i => (c * 5 + i).toLong)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    assert(found == truePairs, s"|found|=${found.size} |true|=${truePairs.size}")
  }

  test("autoNbits end-to-end at cap-stressing scale: 100k vectors, auto-sized sketch, recall holds") {
    import spark.implicits._
    // 100k corpus = 1000 planted clusters × 5 near-identical members +
    // 95k uniform singletons. autoNbits(100000) = 11 — past the 8-bit
    // saturation point the r5 fix addressed — so this drives the AUTO
    // path (previously unit-tested on the arithmetic only) through the
    // full pipeline at a scale where fixture-pinned nbits=8 would
    // overflow every bucket. Deterministic per-id generation, no
    // driver-side 100k-row local relation.
    val n = 100000L
    val corpus = spark.range(n).map { id =>
      if (id < 5000L) {
        val c = id / 5 // cluster id: 5 members each
        val rc = new scala.util.Random(c)
        val base = Array.fill(64)(rc.nextGaussian().toFloat)
        val rn = new scala.util.Random(1000000L + id)
        (id, base.map(x => x + 0.01f * rn.nextGaussian().toFloat))
      } else {
        val r = new scala.util.Random(2000000L + id)
        (id, Array.fill(64)(r.nextGaussian().toFloat))
      }
    }.toDF("vec_id", "embedding")
    assert(Similarity.autoNbits(n) == 11)
    val found = pairSet(
      Similarity.embeddingNearDup(corpus, threshold = 0.995, corpusCount = Some(n)),
      "id_a", "id_b")
    val planted = (0 until 1000).flatMap { c =>
      val ids = (0 until 5).map(i => (c * 5 + i).toLong)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    val recall = (found & planted).size.toDouble / planted.size
    assert(recall >= 0.95, s"planted recall $recall < 0.95 with auto-sized bits")
    // no false accepts at this threshold: every surviving pair passed the
    // exact cosine verification, so non-planted hits would mean the
    // verification join is broken, not the sketch
    assert((found -- planted).isEmpty, s"${(found -- planted).size} non-planted pairs")
  }

  test("topk_by_score aggregate == window formulation, row for row") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.querySet(emb, "vec_id", 50)
    val win = Similarity.bruteForceTopK(emb, q, k = 7)
      .orderBy("query_id", "rank").collect()
    val agg = Similarity.bruteForceTopKAgg(emb, q, k = 7)
      .orderBy("query_id", "rank").collect()
    assert(win.length == agg.length && win.nonEmpty)
    win.zip(agg).foreach { case (w, a) =>
      assert(w.getLong(0) == a.getLong(0) && w.getLong(1) == a.getLong(1)
        && w.getLong(2) == a.getLong(2) && w.getDouble(3) == a.getDouble(3))
    }
    // the aggregate plan must keep a partial (map-side) phase — that is
    // the point: <=k candidates per query leave each partition
    val plan = Similarity.bruteForceTopKAgg(emb, q).queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_topkbyscore")
      || plan.toLowerCase.contains("partial"), plan)
  }

  /** Window+row_number reference ranking — what lshTopK/ivfTopK used before
    * switching to the bounded-heap aggregate; results must be identical. */
  private def windowRank(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  test("lshTopK/ivfTopK: topk_by_score ranking == window formulation, plan keeps partial agg") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.querySet(emb, "vec_id", 25)
    for (topk <- Seq(Similarity.lshTopK(emb, q, k = 5), Similarity.ivfTopK(emb, q, k = 5))) {
      // reconstruct the same scored set from the output's own pairs is not
      // possible (bucketed candidates) — instead re-rank the op's full
      // candidate scoring by window over a k large enough to keep all rows
      val all = topk // k=5 result from the aggregate path
        .orderBy("query_id", "rank").collect()
      assert(all.nonEmpty)
      // ranks are dense 1..n per query, sims sorted desc with id tie-break
      all.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(2))
        assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
        val resorted = sorted.sortBy(r => (-r.getDouble(3), r.getLong(1)))
        assert(resorted.map(_.getLong(1)).toSeq == sorted.map(_.getLong(1)).toSeq)
      }
      // the partial (map-side) bounded-heap phase must sit below the
      // exchange — that is the shuffle-volume win over window+row_number
      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("partial_topkbyscore")
        || plan.toLowerCase.contains("partial"), plan)
      assert(!plan.contains("RunningWindowFunction") && !plan.toLowerCase.contains("window"),
        "window ranking still present")
    }
    // row-for-row equality vs the window formulation on the brute-force
    // scorer (shared scored set — the ranking is what is under test)
    val win = windowRank(
      Similarity.bruteForceTopK(emb, q, k = 500) // un-truncated scored set
        .select("query_id", "neighbor_id", "sim"), 5)
      .orderBy("query_id", "rank").collect()
    val agg = Similarity.bruteForceTopKAgg(emb, q, k = 5)
      .orderBy("query_id", "rank").collect()
    assert(win.length == agg.length && win.nonEmpty)
    win.zip(agg).foreach { case (w, a) =>
      assert(w.getLong(0) == a.getLong(0) && w.getLong(1) == a.getLong(1)
        && w.getLong(2) == a.getLong(2) && w.getDouble(3) == a.getDouble(3))
    }
  }

  test("PQ: cells = corpus size reconstructs perfectly; trained cells beat a single centroid") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    // every subvector is its own centroid -> zero reconstruction error
    val perfect = Similarity.pqReconstructionError(emb, m = 4, dim = 64,
      cells = 100, iters = 0)
    assert(perfect.collect().forall(_.getAs[Double]("mean_abs_err") == 0.0))
    // and vector counts survive the per-subspace round trip
    assert(perfect.agg(sum("n_vectors")).collect().head.getLong(0) == 100)
    val coarse = Similarity.pqReconstructionError(emb, m = 4, dim = 64,
      cells = 1, iters = 1)
      .agg(sum(col("mean_abs_err"))).collect().head.getDouble(0)
    val fine = Similarity.pqReconstructionError(emb, m = 4, dim = 64,
      cells = 16, iters = 3)
      .agg(sum(col("mean_abs_err"))).collect().head.getDouble(0)
    assert(fine < coarse, s"16-cell PQ ($fine) should beat 1-cell ($coarse)")
  }

  test("PQ top-k: cells = corpus size equals brute force row for row; trained PQ keeps recall") {
    val emb = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val qs = Similarity.querySet(emb, "vec_id", 10)
    val brute = Similarity.bruteForceTopKAgg(emb, qs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact reconstruction -> identical ranking, sims and all
    val exactPq = Similarity.pqTopK(emb, qs, m = 4, dim = 64, cells = 100, iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exactPq == brute)
    // compressed PQ: recall@10 floor against brute force
    val pq = Similarity.pqTopK(emb, qs, m = 4, dim = 64, cells = 16, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = bruteIds.count(pq.contains).toDouble / bruteIds.size
    assert(recall >= 0.5, s"PQ recall@10 $recall below floor")
  }

  test("ivfPqTopK: degenerate params == brute force exactly; production params clear a recall floor") {
    // nprobe = |codebook| kills routing loss; PQ cells >= |corpus| with
    // iters=0 kills compression loss -> must equal brute force entirely
    // (corpus capped at 100 so cells=100 covers every subvector)
    val emb100 = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val qs100 = Similarity.querySet(emb100, "vec_id", 10)
    val brute100 = Similarity.bruteForceTopK(emb100, qs100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf4 = Similarity.trainIvfCodebook(emb100, cells = 4, iters = 2)
    val exactBooks = Similarity.pqCodebooks(emb100, cells = 100, iters = 0)
    val degenerate = Similarity.ivfPqTopK(emb100, qs100, ivf4, exactBooks, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(degenerate == brute100, "nprobe=|cells| + exact PQ must reproduce brute force")
    // production-shaped params on the full corpus: both prunings active
    val emb = Tables.embeddings(spark, sfDir)
    val qs = Similarity.querySet(emb, "vec_id", 20)
    val brute = Similarity.bruteForceTopK(emb, qs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf16 = Similarity.trainIvfCodebook(emb, cells = 16, iters = 3)
    val books = Similarity.pqCodebooks(emb, cells = 16, iters = 3)
    val ann = Similarity.ivfPqTopK(emb, qs, ivf16, books, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.count(ann.contains).toDouble / brute.size
    // the fixture's vectors are near-orthogonal (max pairwise cosine
    // ~0.51) — the adversarial no-structure case, where PQ's scoring
    // noise dominates (and more probes only add lossy competitors, so
    // no nprobe-monotonicity claim here). Correctness is pinned by the
    // degenerate equality above; this floor guards the pruning from
    // collapsing outright.
    assert(recall >= 0.2, s"IVFPQ recall@10 $recall below floor")
    // removing PQ loss (exact books) must not hurt: IVF-only >= IVFPQ
    val books500 = Similarity.pqCodebooks(emb, cells = 500, iters = 0)
    val ivfOnly = Similarity.ivfPqTopK(emb, qs, ivf16, books500, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallIvf = brute.count(ivfOnly.contains).toDouble / brute.size
    assert(recallIvf >= recall, s"exact-books recall $recallIvf < PQ recall $recall")
  }

  test("embeddingNearDupExact + resolveDuplicates: pairs share a component, roots are minima") {
    val emb = Tables.embeddings(spark, sfDir)
    val pairs = Similarity.embeddingNearDupExact(emb, 0.42)
    val pairRows = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairRows.forall { case (a, b) => a < b }, "pairs are ordered (a < b)")
    val resolved = graft.ops.Dedup.resolveDuplicates(
      emb.select(col("vec_id")),
      pairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")), "vec_id")
    val rows = resolved.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == emb.count(), "one row per vector")
    rows.foreach { case (id, (comp, keep)) =>
      assert(comp <= id, "canonical is the cluster minimum")
      assert(keep == (comp == id), "keep marks exactly the canonical")
    }
    pairRows.foreach { case (a, b) =>
      assert(rows(a)._1 == rows(b)._1, s"pair ($a,$b) split across components")
    }
    // LSH twin is a subset of the exact pair set (candidates may miss,
    // never invent: every emitted pair is re-scored exactly)
    val exactSet = pairRows.toSet
    val lsh = Similarity.embeddingNearDup(emb, 0.42, nbits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exactSet), "LSH must not emit a below-threshold pair")
  }

  test("semDeDup: within-cell smaller-id neighbor above threshold prunes; cross-cell never pairs") {
    import spark.implicits._
    val codebook = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cell", "cv")
    val out = Similarity.semDeDup(vecs, codebook, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // cell 0: vectors 0, 1 (cos .9939), 4 (identical) -> 0 keeps, 1 and 4 prune
    assert(out(0L) == (0L, true) && out(1L) == (0L, false) && out(4L) == (0L, false))
    // cell 1: vectors 2 and 3 are orthogonal (cos 0 < .95) -> both keep,
    // and 3 never pairs with its true opposite 0 (different cell)
    assert(out(2L) == (1L, true) && out(3L) == (1L, true))
  }

  test("semDeDup: refines exact near-dup and is repartition-invariant on real embeddings") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val codebook = Similarity.trainIvfCodebook(emb, cells = 16, iters = 3)
    val out = Similarity.semDeDup(emb, codebook, threshold = 0.42)
    val pruned = out.filter(!col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // every input vector appears exactly once
    assert(out.count() == emb.count())
    // soundness: each pruned id has a TRUE >= threshold smaller-id
    // neighbor (the cell restriction only removes candidates, never
    // invents similarity)
    val trueDups = Similarity.embeddingNearDupExact(emb, 0.42)
      .select("id_b").collect().map(_.getLong(0)).toSet
    assert(pruned.subsetOf(trueDups))
    val again = Similarity.semDeDup(emb.repartition(7), codebook, threshold = 0.42)
      .filter(!col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == pruned)
  }

  test("semDeDupIncrement: new vector with a corpus cell-mate above threshold drops; cross-cell twin survives") {
    import spark.implicits._
    val codebook = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("cell", "cv")
    val corpus = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val fresh = Seq(
      (1L, Array(0.99f, 0.01f, 0.0f)),   // cell 0, near corpus 0 -> drops
      (3L, Array(-1.0f, 0.0f, 0.1f)),    // cell 1 (farther from e1 than e2? no: picks min L2) -> survives either way (cos <= 0)
      (5L, Array(0.0f, 0.98f, 0.0f)))    // cell 1, near corpus 2 -> drops
      .toDF("vec_id", "embedding")
    val out = Similarity.semDeDupIncrement(corpus, fresh, codebook, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(3L))
  }

  test("assignCellExpr == assignCells on real embeddings (the streaming twin's map-only rule)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val codebook = Similarity.trainIvfCodebook(emb, cells = 16, iters = 3)
    val lits = codebook.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val viaAgg = Similarity.assignCells(emb, codebook)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = emb.select(col("vec_id"),
        Similarity.assignCellExpr(lits, col("embedding")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr == viaAgg)
  }

  test("cellOutliers: farthest decile per cell flags, exactly floor(n/10) outliers per cell") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val codebook = Similarity.trainIvfCodebook(emb, cells = 16, iters = 3)
    val out = Similarity.cellOutliers(emb, codebook).cache()
    try {
      assert(out.count() == emb.count())
      val perCell = out.groupBy("cell")
        .agg(count(lit(1)).as("n"),
             sum(when(col("is_outlier"), 1L).otherwise(0L)).as("flagged"),
             max(when(col("is_outlier"), col("rank"))).as("max_out_rank"),
             max(when(!col("is_outlier"), col("dist"))).as("max_in_dist"),
             min(when(col("is_outlier"), col("dist"))).as("min_out_dist"))
        .collect()
      perCell.foreach { r =>
        // integer-exact decile: exactly floor(n/10) flagged
        assert(r.getLong(2) == r.getLong(1) / 10)
        // flagged set = the TOP ranks (prefix of the dist-desc order)
        if (r.getLong(2) > 0) assert(r.getLong(3) == r.getLong(2))
        // every outlier at least as far as every inlier (rank order sound)
        if (r.getLong(2) > 0 && !r.isNullAt(4) && !r.isNullAt(5))
          assert(r.getDouble(5) >= r.getDouble(4))
      }
    } finally out.unpersist()
  }

  test("embCurationReport: per-label tallies conserve, outlier stage matches cellOutliers") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val codebook = Similarity.trainIvfCodebook(emb, cells = 16, iters = 3)
    val rep = Similarity.embCurationReport(emb, codebook, threshold = 0.42).collect()
    // every vector lands in exactly one of the three buckets
    rep.foreach(r => assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4)))
    assert(rep.map(_.getLong(1)).sum == emb.count())
    // the funnel's outlier stage IS the standalone v18 rule
    val flagged = Similarity.cellOutliers(emb, codebook)
      .filter(col("is_outlier")).count()
    assert(rep.map(_.getLong(2)).sum == flagged)
    // duplicates only counted among survivors: dup stage is a refinement
    // of running semDeDup over the outlier-free subset
    val survivorIds = Similarity.cellOutliers(emb, codebook)
      .filter(!col("is_outlier")).select("vec_id")
    val standaloneDups = Similarity.semDeDup(emb.join(survivorIds, "vec_id"), codebook, 0.42)
      .filter(!col("keep")).count()
    assert(rep.map(_.getLong(3)).sum == standaloneDups)
  }

  test("random vectors: semDeDup == driver-side reference prune (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // reference re-derives the semantics in plain Scala: the same
    // sequential-fold double dot, the same floor(x*1e9+0.5)/1e9 rounding,
    // the same (dist, cell) argmin and greedy keep-earliest rule
    def dotd(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    def refKeep(vs: Seq[(Long, Array[Float])], cb: Seq[(Long, Array[Float])],
                thr: Double): Map[Long, (Long, Boolean)] = {
      val cells = vs.map { case (id, v) =>
        val best = cb.map { case (c, cv) =>
          (r9(dotd(v, v) + dotd(cv, cv) - 2.0 * dotd(v, cv)), c)
        }.min
        id -> best._2
      }.toMap
      vs.map { case (id, v) =>
        val dropped = vs.exists { case (oid, ov) =>
          oid < id && cells(oid) == cells(id) && {
            val sim = r9(dotd(ov, v) / (math.sqrt(dotd(ov, ov)) * math.sqrt(dotd(v, v))))
            sim >= thr
          }
        }
        id -> (cells(id), !dropped)
      }.toMap
    }
    val fvec: Gen[Array[Float]] = Gen.listOfN(4,
      Gen.choose(-4, 4).map(x => x / 2.0f)).map(_.toArray)
        .suchThat(v => v.exists(_ != 0.0f)) // zero vector has undefined cosine
    val corpus: Gen[(List[Array[Float]], List[Array[Float]])] = for {
      n <- Gen.choose(2, 12)
      k <- Gen.choose(1, 3)
      vs <- Gen.listOfN(n, fvec)
      cb <- Gen.listOfN(k, fvec)
    } yield (vs, cb)
    val prop = Prop.forAll(corpus) { case (vsL, cbL) =>
      val spark2 = spark; import spark2.implicits._
      val vs = vsL.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val cb = cbL.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val got = Similarity.semDeDup(vs.toDF("vec_id", "embedding"),
          cb.toDF("cell", "cv"), threshold = 0.42)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      got == refKeep(vs, cb, 0.42)
    }
    // few samples — every sample runs Spark jobs; the grid values (halves
    // in [-2, 2]) exercise exact ties in both the argmin and the cosine
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("kCenterCoreset: seed is lowest id, radii non-increasing, selection is the true farthest point") {
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    val sel = Similarity.kCenterCoreset(emb, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
    assert(sel.map(_._1).toSeq == (0L until 6L).toSeq)
    assert(sel.map(_._2).distinct.length == 6)
    val seedId = emb.agg(min(col("vec_id"))).head().getLong(0)
    assert(sel.head._2 == seedId && sel.head._3.isNaN)
    val radii = sel.tail.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b })
    // coverage/greedy invariant vs a driver-side reference on the same data
    val vs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def d2(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      val raw = dot(a, a) + dot(b, b) - 2.0 * dot(a, b)
      math.floor(raw * 1e9 + 0.5) / 1e9
    }
    var chosen = Vector(vs.minBy(_._1))
    var refRadii = Vector.empty[Double]
    while (chosen.length < 6) {
      val next = vs.map { case (id, v) =>
        (chosen.map(c => d2(v, c._2)).min, id, v)
      }.maxBy { case (dd, id, _) => (dd, -id) }
      refRadii :+= next._1
      chosen :+= ((next._2, next._3))
    }
    assert(sel.map(_._2).toSeq == chosen.map(_._1).toSeq)
    assert(radii.toSeq == refRadii.toSeq)
  }

  test("mmrRerank == driver-side greedy MMR reference; scores non-increasing; rank 1 is the relevance top-1") {
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    val queries = Similarity.querySet(emb, "vec_id", 100) // 5 queries at sf0.001+
    val out = Similarity.mmrRerank(emb, queries, poolK = 12, k = 5, lam = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // driver reference
    val vs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble))).toMap
    def dotd(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def r9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    def cos(a: Array[Double], b: Array[Double]) =
      r9(dotd(a, b) / (math.sqrt(dotd(a, a)) * math.sqrt(dotd(b, b))))
    val lam = 0.7; val mu = 1.0 - lam
    val ref = queries.select("vec_id").collect().map(_.getLong(0)).sorted.flatMap { qid =>
      val pool = vs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(vs(qid), v), v) }
        .sortBy { case (id, rel, _) => (-rel, id) }.take(12)
      var sel = Vector(pool.head)
      var scores = Vector(r9(lam * pool.head._2))
      while (sel.length < 5) {
        val rest = pool.filterNot(p => sel.exists(_._1 == p._1))
        val best = rest.map { case (id, rel, v) =>
          (r9(lam * rel - mu * sel.map(s => cos(v, s._3)).max), id, rel, v)
        }.minBy { case (sc, id, _, _) => (-sc, id) }
        sel :+= ((best._2, best._3, best._4)); scores :+= best._1
      }
      sel.zipWithIndex.map { case ((id, rel, _), i) =>
        (qid, (i + 1).toLong, id, rel, scores(i)) }
    }
    assert(out.toSeq == ref.toSeq)
    // greedy scores never increase within a query (the penalty only grows)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ss = rows.sortBy(_._2).map(_._5)
      assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("powerIteration: planted dominant axis recovered, unit norm, repartition-invariant") {
    import spark.implicits._
    // 40 vectors hugging axis 2 (+noise on axis 0), 4 orthogonal strays
    val vs = ((0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        if (j == 2) 10.0f else if (j == 0) (i % 3 - 1) * 0.5f else 0.0f))
    } ++ (40 until 44).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j == 5) 1.0f else 0.0f))
    }).toDF("vec_id", "embedding")
    val out = Similarity.powerIteration(vs, iters = 5, dim = 8)
      .orderBy("dim").collect()
    val loading = out.map(_.getDouble(1))
    assert(math.abs(math.abs(loading(2)) - 1.0) < 1e-3,
      s"dominant axis 2 must carry ~all the loading: ${loading.toSeq}")
    assert(math.abs(loading.map(x => x * x).sum - 1.0) < 1e-6, "unit norm")
    assert(out.head.getDouble(2) > 0.0, "eigenvalue estimate positive")
    val re = Similarity.powerIteration(vs.repartition(7), iters = 5, dim = 8)
      .orderBy("dim").collect().map(_.toSeq).toSeq
    assert(re == out.map(_.toSeq).toSeq)
  }

  test("ivf at-rest layout: pruned scan touches only probed cell dirs; results == in-memory single-probe path") {
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    val codebook = Similarity.trainIvfCodebook(emb, cells = 8, iters = 2)
    val dir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_test_ivflayout"
    Similarity.writeIvfLayout(emb, codebook, dir)
    val queries = Similarity.querySet(emb, "vec_id", 100)
    val fromLayout = Similarity.ivfTopKFromLayout(spark, dir, queries, codebook, k = 5)
      .orderBy("query_id", "rank")
    val inMemory = Similarity.ivfTopKTrained(emb, queries, codebook, k = 5)
      .orderBy("query_id", "rank")
    assert(fromLayout.collect().map(_.toSeq).toSeq == inMemory.collect().map(_.toSeq).toSeq)
    // the pruned scan only ever READS files under probed cell dirs
    val probed = Similarity.assignCells(queries, codebook).select("cell")
      .distinct().collect().map(_.getLong(0)).toSet
    val files = spark.read.parquet(dir)
      .filter(col("cell").isin(probed.toSeq: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(p => probed.exists(c => p.contains(s"cell=$c"))),
      s"scan must touch only probed cells $probed: ${files.mkString(", ")}")
    // vacuity guard: some cell of the layout is NOT probed by this query set
    val allCells = Similarity.assignCells(emb, codebook).select("cell")
      .distinct().collect().map(_.getLong(0)).toSet
    assert(probed.size < allCells.size,
      "query set probes every cell - pruning assertion is vacuous")
  }

  test("kCenterCoreset: repartition-invariant; k=1 returns just the seed") {
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    val a = Similarity.kCenterCoreset(emb, k = 4).collect().map(_.toSeq).toSeq
    val b = Similarity.kCenterCoreset(emb.repartition(7), k = 4).collect().map(_.toSeq).toSeq
    assert(a == b)
    val one = Similarity.kCenterCoreset(emb, k = 1).collect()
    assert(one.length == 1 && one.head.getLong(0) == 0L && one.head.isNullAt(2))
  }

  test("hardNegatives: band respected, equals the filter-then-rank reference, heap == window formulation") {
    val emb = graft.ops.Tables.embeddings(spark, sfDir)
    val queries = Similarity.querySet(emb, "vec_id", 20)
    val (lo, hi, k) = (0.05, 0.42, 8)
    val got = Similarity.hardNegatives(emb, queries, k, lo, hi).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, sim) =>
      assert(sim >= lo && sim < hi, s"sim $sim escaped the band") }
    // independent reference: full scored pairs (the v5 path), band
    // filter, then window row_number — must match the heap row for row
    import org.apache.spark.sql.expressions.Window
    val ref = Similarity.bruteForceTopKAgg(emb, queries, k = emb.count().toInt)
      .filter(col("sim") >= lo && col("sim") < hi)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.sortBy(t => (t._1, t._3)).toSeq == ref.sortBy(t => (t._1, t._3)).toSeq)
    // near-dups (sim >= hi) that the plain top-k WOULD return are
    // absent, or the band does nothing on this fixture
    val plain = Similarity.bruteForceTopKAgg(emb, queries, k).collect()
      .map(_.getDouble(3))
    assert(plain.exists(_ >= hi), "fixture has no near-dup sims - band check vacuous")
  }

  test("kCenterCoreset: k past the distinct-vector count stops at radius 0, never repeats a center") {
    import spark.implicits._
    // 3 distinct vectors, ids 0..5 (ids 3..5 duplicate 0..2): k=6 must
    // stop after the 3 distinct centers instead of re-selecting the
    // seed with dist 0 forever
    val dup = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f)), (4L, Array(0.0f, 1.0f)), (5L, Array(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val sel = Similarity.kCenterCoreset(dup, k = 6).collect()
    assert(sel.length == 3, s"expected 3 centers, got ${sel.toSeq}")
    val ids = sel.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, s"repeated center: ${ids.toSeq}")
    assert(sel.forall(r => r.isNullAt(2) || r.getDouble(2) > 0.0))
  }
}
