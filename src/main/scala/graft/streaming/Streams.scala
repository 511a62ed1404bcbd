package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface — the streaming upgrades of the batch
  * operators (SURVEY §2.9: streaming is an extension; the reference's only
  * "real-time" element is dashboard polling, `/root/reference/api.py:575`).
  *
  *   - [[csvDirStream]]: streaming version of the CSV directory ingest
  *     (S2) — new files appearing in the directory become micro-batches.
  *   - [[hourlyByType]]: watermarked tumbling-window aggregation, the
  *     streaming twin of [[graft.ops.EventWindows.hourlyByType]].
  *   - [[userSessions]]: `session_window` sessionization, twin of
  *     [[graft.ops.EventWindows.userSessions]] (whose gaps-and-islands
  *     formulation is the batch oracle; session end here is
  *     last-event + gap by session_window's definition).
  *   - [[runningUserCounts]]: custom state via flatMapGroupsWithState —
  *     the escape hatch for semantics windows can't express.
  *
  * Scale notes: all aggregations are keyed-state operators backed by the
  * state store — state is partitioned by grouping key across executors and
  * bounded by the watermark (late data beyond it is dropped and state
  * evicted). File sources at 100 TB need `maxFilesPerTrigger` to bound
  * micro-batch size; both knobs are exposed.
  */
object Streams {

  /** Streaming CSV directory source (S2's streaming upgrade). Streams
    * require an explicit schema — inference would race file arrival. */
  def csvDirStream(spark: SparkSession, dir: String, schema: StructType,
                   maxFilesPerTrigger: Int = 1000): DataFrame =
    spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("pathGlobFilter", "*.csv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)

  /** Streaming parquet directory source (for the testdata tables).
    * `maxFilesPerTrigger > 0` bounds micro-batch size — at 100 TB an
    * unbounded first batch is an OOM, not a convenience. */
  def parquetDirStream(spark: SparkSession, dir: String, schema: StructType,
                       maxFilesPerTrigger: Int = 0): DataFrame = {
    noteSourceWidth(spark, dir)
    val r = spark.readStream.schema(schema)
    (if (maxFilesPerTrigger > 0) r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).parquet(dir)
  }

  /** Data-derived shuffle/state width for the NEXT streaming query
    * (consumed by [[runToMemory]]/[[runToParquet]]/the foreachBatch
    * runners). Stateful operators pin `spark.sql.shuffle.partitions` at
    * query start as their state-partition count, and AQE is disabled in
    * streaming — so with the session default (= core count) every
    * micro-batch committed one state/delta file PER CORE per stateful
    * operator, which made the stateful rows of the r18 driver bench
    * SLOWER at 32 cores than at 8 (st11: 97% of task run time was
    * state-store file I/O wait). Width = input bytes / 1 MB clamped to
    * [1, defaultParallelism]: fixture streams get a handful of state
    * partitions, a 100 TB backlog fans out to the cluster. Driver-side
    * stash, single-threaded builder assumption (the documented
    * materializePartitioned discipline); cleared when consumed, so
    * directly-constructed streams (tests) run unchanged.
    */
  @volatile private var pendingSourceWidth: Option[Int] = None
  private def noteSourceWidth(spark: SparkSession, dir: String): Unit = {
    val bytes = try {
      val d = new java.io.File(dir)
      if (d.isDirectory) d.listFiles().map(_.length()).sum else 0L
    } catch { case _: Throwable => 0L }
    if (bytes > 0L) {
      val cap = spark.sparkContext.defaultParallelism.toLong
      pendingSourceWidth =
        Some(math.max(1L, math.min(cap, bytes / (1L << 20) + 1L)).toInt)
    }
  }

  /** Run `body` (a streaming query start+drain) with the shuffle width
    * pinned to the last [[noteSourceWidth]] stash, restoring after. */
  private def withSourceWidth[T](spark: SparkSession)(body: => T): T = {
    val w = pendingSourceWidth
    pendingSourceWidth = None
    w match {
      case None => body
      case Some(width) =>
        val key = "spark.sql.shuffle.partitions"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, width.toString)
        try body
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
    }
  }

  /** Tumbling 1-hour windows per event_type with a watermark. Output shape
    * matches the batch twin (window start as epoch micros). In append mode
    * a window emits once the watermark passes its end — exactly-once per
    * window; in complete mode (tests) all windows re-emit per batch.
    */
  def hourlyByType(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.ops.Num.exactSum(col("value")).as("total_value"),
           graft.ops.Num.exactAvg(col("value")).as("avg_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
              col("event_type"), col("n_events"), col("total_value"), col("avg_value"))

  /** Sliding 1-hour windows every 30 minutes per event_type — the
    * streaming twin of [[graft.ops.EventWindows.slidingByType]]. Each
    * event updates width/slide = 2 window states; watermark eviction
    * bounds live state to O(active windows × types). Append mode emits
    * each window exactly once when the watermark passes its end.
    */
  def slidingByType(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           graft.ops.Num.exactSum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
              col("event_type"), col("n_events"), col("total_value"))

  /** Sessionization with `session_window`: per-user sessions closed after
    * `gap` of inactivity. `session_end_us` here is (last event + gap) — the
    * session_window definition; the batch twin reports last-event time.
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           graft.ops.Num.exactSum(col("value")).as("session_value"))
      .select(col("user_id"),
              unix_micros(col("w.start")).as("session_start_us"),
              unix_micros(col("w.end")).as("session_end_us"),
              col("n_events"), col("session_value"))

  /** Streaming exact dedup: drop records whose `idCols` were already seen,
    * with state bounded by the event-time watermark
    * (`dropDuplicatesWithinWatermark`) — the streaming twin of
    * [[graft.ops.Dedup.exact]]. State per key is just the key; eviction
    * follows the watermark, so memory is bounded by the duplicate horizon,
    * not the stream length.
    */
  def dedupExact(events: DataFrame, idCols: Seq[String], tsCol: String = "ts",
                 watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming exact-dedup as an AGGREGATION — the oracle-checkable twin
    * of [[graft.ops.Dedup.exact]]: deterministic survivor (min id) and
    * copy count per distinct text, independent of arrival order —
    * [[dedupExact]] keeps first-arrival, which races across partitions;
    * an aggregate converges to the same answer however the stream is
    * partitioned or ordered. State per distinct text is one
    * (hash, min, count) row keyed by the 8-byte xxhash64 — the body never
    * enters the state store. The dedup horizon is deliberately unbounded
    * (state grows with DISTINCT texts, not stream length); when the
    * horizon can be finite, prefer [[dedupExact]]'s watermark eviction.
    */
  def dedupExactAgg(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame =
    docs.groupBy(xxhash64(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))

  /** Latest value per key — CDC-style stream compaction to the current
    * snapshot: one max(struct) aggregate keyed on user_id, so state per
    * key is a single struct and the survivor is arrival-order
    * independent (event-time + id ordering, not processing order) —
    * exactly re-playable by a batch row_number oracle.
    */
  def latestPerUser(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
              col("event_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("us"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("m.us").as("last_us"), col("m.value").as("last_value"))

  /** Stream-static join: enrich a stream against a batch dimension table.
    * The static side behaves like a broadcast lookup re-resolved per
    * micro-batch — no state store involved.
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(dim, Seq(key), "left")

  /** STREAM-STREAM interval join — conversion attribution as both sides
    * flow: each `leftType` event joined to `rightType` events of the
    * SAME user arriving within `[left_ts, left_ts + within]`. This is
    * the one join shape that genuinely needs two-sided streaming state:
    * a left row must be buffered until the watermark proves no more
    * matching right rows can arrive, and vice versa. Both sides carry a
    * watermark AND the join condition bounds event-time distance, which
    * is exactly what lets Spark evict state — without the time bound the
    * state store grows forever (Spark rejects it in append mode). State
    * per side is O(watermark-window of in-flight rows), independent of
    * total stream length — the 100 TB/day property. The join key
    * includes user_id, so state is hash-partitioned by user across
    * executors.
    *
    * Semantics are arrival-order independent (pure event-time
    * predicate), so the result equals the batch self-join — st11 shares
    * a plain SQL oracle.
    */
  def streamIntervalJoin(events: DataFrame, leftType: String, rightType: String,
                         within: String = "30 minutes",
                         watermarkDelay: String = "2 hours"): DataFrame = {
    val left = events.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("left_id"), col("ts").as("left_ts"))
      .withWatermark("left_ts", watermarkDelay)
    val right = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user_id"), col("event_id").as("right_id"),
              col("ts").as("right_ts"))
      .withWatermark("right_ts", watermarkDelay)
    left.join(right,
        col("user_id") === col("r_user_id") &&
          col("right_ts") >= col("left_ts") &&
          col("right_ts") <= col("left_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("left_id"), col("right_id"),
              (unix_micros(col("right_ts")) - unix_micros(col("left_ts"))).as("gap_us"))
  }

  /** Streaming incremental exact dedup against a STATIC corpus — the
    * "daily crawl" reduction as a stream: emit only docs whose text does
    * not already exist in the corpus. The broadcast bloom (build with
    * [[graft.ops.Dedup.textBloom]] once per corpus snapshot) splits each
    * micro-batch: bloom-NEGATIVE docs — the vast majority of a
    * mostly-new crawl — pass through without touching the corpus at
    * all; only bloom-positives probe the stream-static anti-join that
    * removes the ~fpp false positives. One-sided bloom error keeps the
    * union exactly equal to a plain anti-join of the whole stream
    * (shares the batch oracle). Stateless — no state store; the corpus
    * side re-resolves per micro-batch, so a corpus refresh plus a new
    * bloom takes effect without restarting the query.
    */
  def streamSurvivors(newDocs: DataFrame, corpus: DataFrame,
                      textBloom: Array[Byte],
                      textCol: String = "text"): DataFrame = {
    val hit = call_function("might_contain", lit(textBloom), xxhash64(col(textCol)))
    val fresh = newDocs.filter(!hit)
    val maybe = newDocs.filter(hit)
      .join(corpus.select(xxhash64(col(textCol)).as("__corpus_h")),
        xxhash64(col(textCol)) === col("__corpus_h"), "left_anti")
    fresh.unionByName(maybe)
  }

  /** Streaming per-language quality gate — c6's CCNet-style gate with
    * the threshold table staged from a corpus snapshot: each streaming
    * document scores map-only (the t1 features are codegen'd string
    * expressions), then compares against its language's broadcast
    * threshold. Stateless — no state store, no watermark; refreshing
    * the thresholds (a few rows, recomputed per corpus snapshot like
    * any model artifact) takes effect next micro-batch without a
    * restart. Streamed over the same snapshot the thresholds came
    * from, it shares c6's batch oracle verbatim.
    */
  def streamQualityGate(docs: DataFrame, thresholds: DataFrame): DataFrame = {
    import graft.ops.TextStats
    TextStats.qualityScore(docs)
      .select(col("doc_id"), col("lang"), col("quality_score"))
      .join(broadcast(thresholds), Seq("lang"))
      .filter(col("quality_score") > col("q_threshold"))
      .select(col("doc_id"), col("lang"), col("quality_score"))
  }

  /** Streaming DSIR importance RESAMPLING — t28's stateless stream form:
    * the per-bucket log-ratio weights ([[graft.ops.TextStats.bucketWeights]],
    * ≤ nBuckets rows) and the corpus-max log-weight are staged from a
    * corpus snapshot like any model artifact and ride the plan as a
    * literal MAP, so each document's log-weight is ONE map-only
    * higher-order fold — tokens look up their bucket weight and
    * accumulate in DECIMAL(38,6), the same exact arithmetic as the batch
    * per-bucket n·w sum, so emitted log_weights are bit-identical and
    * the twin shares t28's oracle verbatim. The acceptance coin and
    * threshold are the same content-hash / floor(exp·10⁹+0.5) rule.
    * No state store, no aggregation — a weight refresh lands next
    * micro-batch without restart.
    */
  def streamImportanceSample(docs: DataFrame, weights: Seq[(Long, Double)],
                             lwMax: Double, nBuckets: Int = 256,
                             textCol: String = "text"): DataFrame = {
    import graft.ops.Num
    require(weights.nonEmpty, "staged bucket weights must be non-empty")
    val m = map(weights.flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
    val toks = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val lw = aggregate(toks,
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
      (acc, t) => (acc + coalesce(
          element_at(m, pmod(call_function("fnv1a64", t), lit(nBuckets.toLong))),
          lit(0.0)).cast("decimal(18,6)")).cast("decimal(38,6)"))
      .cast("double")
    val u = pmod(call_function("fnv1a64", concat(lit("isample:"), col(textCol))),
                 lit(1000000000L))
    val thr = floor(exp(lw - lit(lwMax)) * lit(1.0e9) + lit(0.5)).cast("long")
    docs.filter(col(textCol).isNotNull && size(toks) > 0)
      .filter(u < thr)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"), lw.as("log_weight"))
  }

  /** Streaming DRIFT MONITOR, current-slice counting stage: one
    * Complete-mode count aggregate per category over events at or after
    * the drift cut — the live half of the p10 chi-square contingency
    * table. The BASE half is a per-category count list staged from the
    * baseline snapshot (a model artifact like st17's bucket weights);
    * the consumer full-outer-joins the sink's latest snapshot with the
    * staged base and feeds [[graft.ops.Profiling.chiSquareTerms]], so
    * the monitor's rows are bit-identical to the batch p10 report at
    * every micro-batch boundary. State is O(categories) counters —
    * constant, watermark-free, runs forever.
    */
  def streamCategoryCounts(events: DataFrame, cutTs: String,
                           catCol: String = "event_type",
                           tsCol: String = "ts"): DataFrame =
    events.filter(col(tsCol) >= lit(cutTs).cast("timestamp"))
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n_cur"))

  /** Streaming PCA scoring — v23's stateless stream form: the component
    * trained once on the corpus snapshot ([[graft.ops.Similarity
    * .powerIteration]]) rides the plan as a 64-double literal array, and
    * each arriving vector's score is the same index-order zip-fold as
    * the batch projection, 9dp on output — so the twin shares v23's
    * oracle verbatim. Map-only, no state; a component refresh lands
    * next micro-batch without restart.
    */
  def streamPcaProject(vectors: DataFrame, component: Array[Double],
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    import graft.ops.Num
    require(component.nonEmpty, "staged component must be non-empty")
    val wLit = array(component.map(lit).toIndexedSeq: _*)
    vectors.select(col(idCol),
      Num.roundTo(aggregate(zip_with(col(vecCol), wLit, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x), 9).as("pc1_score"))
  }

  /** Streaming incremental SemDeDup: a stream of new embedding vectors
    * dedups against a STATIC corpus inside corpus-trained IVF cells —
    * the streaming twin of [[graft.ops.Similarity.semDeDupIncrement]],
    * sharing its batch oracle. Cell assignment is the map-only
    * [[graft.ops.Similarity.assignCellExpr]] (the codebook rides along
    * as literals — no aggregation, so the plan stays stateless), and
    * survivors fall out of one stream-static LEFT ANTI join on
    * (same cell ∧ 9dp cosine ≥ threshold). Because each verdict depends
    * only on the static corpus (new-vs-new is a later batch pass by
    * design), micro-batch boundaries cannot change the answer, and a
    * corpus refresh takes effect next batch without a restart.
    */
  def streamSemDedupIncrement(newVecs: DataFrame, corpus: DataFrame,
                              codebook: Seq[(Long, Array[Float])],
                              threshold: Double = 0.42,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    import graft.ops.{Num, Similarity}
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("corpus_cell", Similarity.assignCellExpr(codebook, col("cv")))
      .withColumn("cn", Similarity.norm(col("cv")))
    val n = newVecs.select(col(idCol), col(vecCol).as("nv"))
      .withColumn("cell", Similarity.assignCellExpr(codebook, col("nv")))
      .withColumn("nn", Similarity.norm(col("nv")))
    n.join(c, col("cell") === col("corpus_cell") &&
        Num.roundTo(Similarity.dot(col("nv"), col("cv")) / (col("nn") * col("cn")), 9)
          >= threshold, "left_anti")
      .select(col(idCol), col("cell"))
  }

  /** Streaming incremental MinHash near-dup (st26) — the x18 twin: new
    * docs arrive as a stream, each micro-batch computes signatures
    * map-only (the codegen'd shingle→minhash expressions — no state),
    * explodes band keys, and probes the STATIC corpus band index by
    * stream-static equi-join; survivors of the signature-agreement
    * verification are the cross near-dup pairs.
    *
    * STATELESS exactly-once pair emission: a pair that agrees on
    * several bands would surface once per band, but both signatures
    * are on the joined row, so each row recomputes the FIRST agreeing
    * band from the sigs and only that band's row emits —
    * deduplication by arithmetic instead of dropDuplicates state.
    * With per-arrival verdicts depending only on the static corpus
    * (the x13/st15 contract), the output is row-identical to the
    * batch [[graft.ops.Dedup.minhashLshCross]] and shares its oracle.
    */
  def streamMinhashCross(newDocs: DataFrame, corpus: DataFrame,
                         w: Int = 3, k: Int = 128, bands: Int = 32,
                         threshold: Double = 0.5): DataFrame = {
    import graft.ops.Dedup
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    // the at-rest corpus artifact: (band, bkey, doc_old, sig_a)
    val bandedC = Dedup.minhashSignatures(corpus, w = w, k = k)
      .select(col("doc_id").as("doc_old"), col("sig").as("sig_a"),
        posexplode(Dedup.bandKeys(col("sig"), bands, r)).as(Seq("band", "bkey")))
    val bandedN = Dedup.minhashSignatures(newDocs, w = w, k = k)
      .select(col("doc_id").as("doc_new"), col("sig").as("sig_b"),
        posexplode(Dedup.bandKeys(col("sig"), bands, r)).as(Seq("band", "bkey")))
    val firstAgree = array_position(
      zip_with(Dedup.bandKeys(col("sig_a"), bands, r),
        Dedup.bandKeys(col("sig_b"), bands, r),
        (x, y) => (x === y).cast("int")), 1) - 1
    bandedN.join(bandedC, Seq("band", "bkey"))
      .withColumn("est_jaccard",
        call_function("sig_agree", col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold && col("band") === firstAgree)
      .select(col("doc_old"), col("doc_new"), col("est_jaccard"))
  }

  /** Streaming IVF index maintenance (st21) — the v26 twin: new vectors
    * arrive as a stream, each micro-batch map-assigns them to their
    * static trained cell ([[graft.ops.Similarity.assignCellExpr]]
    * against the codebook literals — no join, no state lookup), and the
    * per-cell add counters are the ONLY streaming state (≤ |cells|
    * longs, Complete mode). The registration joins the streamed
    * counters into [[graft.ops.Similarity.ivfAddReportFromCounts]], so
    * the emitted report is row-identical to the batch v26 and shares
    * its oracle verbatim — micro-batching cannot change a count.
    */
  def streamIvfAddCounts(newVecs: DataFrame,
                         codebook: Seq[(Long, Array[Float])],
                         vecCol: String = "embedding"): DataFrame = {
    import graft.ops.Similarity
    newVecs.select(Similarity.assignCellExpr(codebook, col(vecCol)).as("cell"))
      .groupBy("cell").agg(count(lit(1)).as("n_added"))
  }

  /** Streaming MEDIA curation (st22) — c22's incremental form, the
    * x13/st15 pattern on the multimodal side: new media arrive as a
    * stream and each row gets a per-row-independent verdict against the
    * STATIC curated corpus — decode gate (undecodable payloads drop,
    * m1's rule), perceptual aHash, chunk-blocked Hamming probe of the
    * corpus's index, and the c14 keep-best rule against the
    * best-quality match (quality desc, id asc tie-break; the new row
    * survives only if it beats the incumbent canonical).
    *
    * The corpus index is an AT-REST chunk-exploded parquet
    * ([[graft.ops.Multimodal.imageCurationIndexChunked]], staged once
    * per corpus snapshot and repartitioned on the (ci, ckey) probe
    * key); every micro-batch runs the DISTRIBUTED batch verdict plan
    * ([[graft.ops.Multimodal.curationAgainstIndex]]) via foreachBatch —
    * a stream-static equi-join on the 8-bit chunk keys, exact Hamming
    * prune, one struct-max best-match aggregate. NOTHING is collected
    * to the driver: the r15/r16 closure-shipped index (O(corpus
    * images) in every task — the verdict's last flagged scale-killer)
    * is replaced by the bucketed parquet the st23/st27/st28 pattern
    * prescribes. There is NO streaming state (verdicts depend only on
    * the static corpus plus the row itself, so micro-batch boundaries
    * provably cannot change them — the batch oracle gates the stream
    * verbatim), a corpus re-stage takes effect next micro-batch, and
    * the sink rides [[writeBatchIdempotent]] so a retried batch can
    * never duplicate verdicts.
    */
  def runMediaCurationBatches(newMedia: DataFrame, indexPath: String,
                              outDir: String, maxDist: Int = 4): StreamingQuery = {
    withSourceWidth(newMedia.sparkSession) {
      val q = newMedia.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val s = batch.sparkSession
          writeBatchIdempotent(
            graft.ops.Multimodal.curationAgainstIndex(
              batch.toDF(), s.read.parquet(indexPath), maxDist),
            outDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** Streaming phrase matching (st24) — t33's incremental form, the
    * decontamination gate: new docs stream in and each row counts its
    * occurrences of the STATIC corpus-derived phrase set
    * ([[graft.ops.TextStats.topNgrams]]'s deterministic derivation),
    * emitting one row per (doc, phrase) with n_matches ≥ 1. Verdicts
    * are per-row functions of the phrase list — topQ strings riding
    * the plan as a literal array, a bounded model artifact — so there
    * is ZERO streaming state (append mode), micro-batch boundaries
    * provably cannot change results, and the batch n-gram replay
    * gates the stream. Map-only at any corpus scale: the stream side
    * never shuffles, and the phrase set is bounded by construction.
    */
  def streamPhraseMatch(newDocs: DataFrame, phrases: Seq[String], n: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(phrases.nonEmpty, "phrases must be non-empty")
    require(n >= 2, "n must be >= 2")
    // the t33 staging discipline: tokens staged, filtered BEFORE the
    // gram projection, grams staged before element-wise consumption
    val toksArr = filter(split(lower(col(textCol)), "\\s+"), t => t =!= "")
    val grams = newDocs.select(col(idCol), toksArr.as("ts"))
      .filter(size(col("ts")) >= n)
      .select(col(idCol),
        transform(sequence(lit(1), size(col("ts")) - (n - 1)),
          i => concat_ws(" ", slice(col("ts"), i, lit(n)))).as("grams"))
    val phraseArr = array(phrases.map(lit): _*)
    grams.select(col(idCol), explode(phraseArr).as("phrase"), col("grams"))
      .select(col(idCol), col("phrase"),
        size(filter(col("grams"), g => g === col("phrase"))).cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1)
  }

  /** Streaming AUDIO near-dup matching (st23) — m10's incremental form,
    * completing the modality × (batch, stream) matrix (text st5/st15,
    * image st22, audio here): new tracks stream in, each row probes the
    * STATIC corpus's window-hash inverted index (window_hash → corpus
    * tracks, df-guarded at build time like [[graft.ops.Dedup
    * .sharedHashPairs]]'s fan-out cap) and reports its best-Jaccard
    * corpus match — highest shared-window Jaccard, ties to the lower
    * id — plus the `is_dup` verdict at `threshold`.
    *
    * Zero cross-batch streaming state: each micro-batch runs the
    * DISTRIBUTED batch verdict plan ([[graft.ops.Multimodal
    * .audioMatchAgainstIndex]]) via foreachBatch — new tracks decode
    * and window map-only, their exploded windows stream-static join
    * the AT-REST df-guarded index parquet on the 8-byte bucket key,
    * and per-track best-match falls out of one struct-max aggregate.
    * NOTHING is collected to the driver: the r15 closure-shipped
    * inverted index (O(corpus windows) longs in every task — the
    * verdict's flagged scale-killer) is replaced by the bucketed
    * parquet the st5/x13 pattern prescribes. Verdicts depend only on
    * the static index plus the row's own windows, so micro-batch
    * boundaries provably cannot change them (spec'd batch ≡ stream),
    * the batch SQL replay still gates the stream verbatim, and a
    * corpus index refresh takes effect next micro-batch. The sink is
    * an append-only parquet dir — a real distributed file sink, not a
    * driver-memory table.
    */
  def runAudioMatchBatches(newMedia: DataFrame, indexPath: String,
                           sizesPath: String, outDir: String,
                           threshold: Double = 0.5): StreamingQuery = {
    withSourceWidth(newMedia.sparkSession) {
      val q = newMedia.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val s = batch.sparkSession
          writeBatchIdempotent(
            graft.ops.Multimodal.audioMatchAgainstIndex(
              graft.ops.Multimodal.audioWindowSets(batch),
              s.read.parquet(indexPath), s.read.parquet(sizesPath), threshold),
            outDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** Streaming VIDEO near-dup matching (st30) — m9's incremental form,
    * filling the modality × (batch, stream) matrix's last cell (text
    * st5/st15/st26, image st22, audio st23, video here): new videos
    * stream in, each micro-batch samples+hashes its frames map-only
    * ([[graft.ops.Multimodal.videoFrameSets]] — pixels/payload never
    * shuffle, 8-byte frame hashes do), stream-static joins the AT-REST
    * df-guarded frame-hash index parquet on the hash key, and reports
    * its best-Jaccard corpus match + `is_dup` verdict
    * ([[graft.ops.Multimodal.videoMatchAgainstIndex]]). Zero cross-batch
    * streaming state, nothing collected to the driver; verdicts depend
    * only on the static index plus the row's own frames, so micro-batch
    * boundaries provably cannot change them and the batch SQL replay
    * gates the stream verbatim. Sink rides [[writeBatchIdempotent]].
    */
  def runVideoMatchBatches(newMedia: DataFrame, indexPath: String,
                           sizesPath: String, outDir: String,
                           threshold: Double = 0.5): StreamingQuery = {
    withSourceWidth(newMedia.sparkSession) {
      val q = newMedia.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val s = batch.sparkSession
          writeBatchIdempotent(
            graft.ops.Multimodal.videoMatchAgainstIndex(
              graft.ops.Multimodal.videoFrameSets(batch),
              s.read.parquet(indexPath), s.read.parquet(sizesPath), threshold),
            outDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** The foreachBatch sink discipline shared by every join-then-aggregate
    * streaming twin (st22/st23/st27/st28): each micro-batch lands in its
    * own `batch_id=<id>` partition directory with OVERWRITE semantics, so
    * a RETRIED micro-batch (foreachBatch is at-least-once — Structured
    * Streaming re-invokes the function with the SAME batchId after a
    * failure) replaces its own output instead of appending a duplicate
    * copy. This matters most where the sink IS an at-rest store
    * ([[runIndexAddBatches]]: duplicated postings would silently double
    * t37/st27 term counts). Partition-style naming keeps the sink one
    * plain parquet dataset — [[readBatchSink]] reads it back and drops
    * the discovered batch_id partition column.
    */
  def writeBatchIdempotent(df: DataFrame, outDir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** Read a [[writeBatchIdempotent]] sink as the logical result table
    * (partition-discovered `batch_id` dropped). */
  def readBatchSink(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).drop("batch_id")

  /** Streaming INDEX ADD (st27) — t37's incremental form, the
    * retrieval-family st21: new documents stream in and each
    * micro-batch becomes its own tf SEGMENT (the Lucene NRT model —
    * [[graft.ops.TextStats.indexSegment]] is map-side-combined
    * aggregation over the batch only, O(batch)), appended to the
    * at-rest segment store as parquet. NO streaming state and NO
    * driver collection: the sink IS the index store, and because
    * segments hold doc-disjoint rows, the union of per-batch segments
    * is row-identical to the one-shot batch segment — so the t37 add
    * report computed over (base, accumulated segments) shares t37's
    * oracle verbatim regardless of micro-batch boundaries (spec'd).
    * The sink IS the at-rest segment store, so it rides
    * [[writeBatchIdempotent]]: a retried micro-batch overwrites its own
    * batch_id partition and can never double postings (spec'd by
    * replaying the whole stream into the same store).
    */
  def runIndexAddBatches(newDocs: DataFrame, segmentDir: String): StreamingQuery = {
    withSourceWidth(newDocs.sparkSession) {
      val q = newDocs.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          writeBatchIdempotent(
            graft.ops.TextStats.indexSegment(batch)._1, segmentDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** Streaming POSITIONAL index add (st31) — st27's phrase-serving
    * twin: new documents stream in and each micro-batch becomes its own
    * POSITIONAL segment ([[graft.ops.TextStats.positionalSegment]] —
    * one map-only posexplode over the batch, O(batch), not even an
    * aggregation), appended to the at-rest postings store. Segments are
    * doc-disjoint, so the accumulated store unions row-identically to
    * the one-shot batch segment regardless of micro-batch boundaries —
    * phrase search THROUGH (base, accumulated segments)
    * ([[graft.ops.TextStats.phraseSearchFromSegments]]) therefore
    * shares t33/t42's oracle over the union corpus verbatim. The sink
    * IS the index; rides [[writeBatchIdempotent]] so a retried batch
    * can never duplicate postings (duplicated positional rows would
    * inflate phrase match counts AND the index-derived query set).
    */
  def runPositionalAddBatches(newDocs: DataFrame, segmentDir: String): StreamingQuery = {
    withSourceWidth(newDocs.sparkSession) {
      val q = newDocs.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          writeBatchIdempotent(
            graft.ops.TextStats.positionalSegment(batch), segmentDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** Streaming SNAPSHOT STATUS (st29) — [[graft.ops.Profiling
    * .snapshotDiffReport]]'s streaming face: new-crawl docs stream in and
    * each row classifies against the STATIC previous snapshot's
    * (id, hash) index by one stream-static LEFT join on the 8-byte id
    * — `added` (no index row), `unchanged` (hashes agree, null-safe),
    * `changed` otherwise. Purely per-row (stateless, append mode):
    * `removed` is the absence of arrival and belongs to the batch p15.
    * The index rows carry an explicit presence flag so a null-text doc
    * in the old snapshot reads as present-with-null-content, never as
    * `added`. Text never reaches the join — both sides project to
    * hashes first.
    */
  def streamSnapshotStatus(newDocs: DataFrame, index: DataFrame,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame =
    newDocs.select(col(idCol),
        call_function("fnv1a64", col(textCol)).as("h_b"), col("source"))
      .join(index, Seq(idCol), "left")
      .select(col(idCol),
        when(col("in_a").isNull, lit("added"))
          .when(col("h_a") <=> col("h_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("source"))

  /** Streaming BM25 query serving (st28) — the retrieval analog of the
    * st4 ANN-serving path: a stream of QUERIES (one row per phrase,
    * its term bag as an array — a row is atomic, so a phrase can never
    * split across micro-batches) served against the STATIC segmented
    * index at rest. Each micro-batch runs the distributed
    * [[graft.ops.TextStats.bm25TopKFromSegments]] plan via foreachBatch
    * — per-segment stats summed, scores 6dp-decimal-exact — and appends
    * to a parquet sink. A query's result depends only on the static
    * segments plus its own terms, so micro-batch boundaries provably
    * cannot change it and the t34/t38 oracle over the union corpus
    * gates the stream verbatim; a segment add takes effect next batch
    * without a restart.
    */
  /** Streaming BM25 serving in TOMBSTONE mode (st32 — st28's takedown
    * twin, the NRT face of t43): phrase queries stream in and each
    * micro-batch serves them through the STATIC segmented index with a
    * STATIC delete list applied — retained postings via one anti-join,
    * every global statistic the base aggregate minus the deleted docs'
    * own contribution ([[graft.ops.TextStats.bm25TopKTombstone]]'s
    * exact integer subtraction, re-planned per batch like the
    * segments themselves). The delete list is an at-rest artifact
    * (staged parquet, re-read per batch) — a takedown lands by writing
    * the list, takes effect next micro-batch, and the segment store
    * stays byte-identical, so the NRT path honors right-to-erasure
    * without a rebuild or a restart. Zero streaming state (verdicts
    * depend only on static stores plus the query row), so micro-batch
    * boundaries provably cannot change ranks and t43's batch oracle
    * over the RETAINED corpus gates the stream verbatim. Sink rides
    * [[writeBatchIdempotent]].
    */
  def runBm25TombstoneQueryBatches(queries: DataFrame,
                                   segPaths: Seq[(String, String)],
                                   deletePath: String, outDir: String,
                                   k: Int = 10): StreamingQuery = {
    withSourceWidth(queries.sparkSession) {
      val q = queries.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val s = batch.sparkSession
          val segs = segPaths.map { case (tfs, lens) =>
            (s.read.parquet(tfs), s.read.parquet(lens)) }
          val qToks = batch.select(col("phrase"), explode(col("toks")).as("tok"))
          writeBatchIdempotent(
            graft.ops.TextStats.bm25TopKTombstone(segs,
              s.read.parquet(deletePath), qToks, k), outDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  def runBm25QueryBatches(queries: DataFrame,
                          segPaths: Seq[(String, String)],
                          outDir: String, k: Int = 10): StreamingQuery = {
    withSourceWidth(queries.sparkSession) {
      val q = queries.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          val s = batch.sparkSession
          val segs = segPaths.map { case (tfs, lens) =>
            (s.read.parquet(tfs), s.read.parquet(lens)) }
          val qToks = batch.select(col("phrase"), explode(col("toks")).as("tok"))
          writeBatchIdempotent(
            graft.ops.TextStats.bm25TopKFromSegments(segs, qToks, k), outDir, batchId)
        }
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** Streaming similarity serving: a stream of query vectors scored
    * against a STATIC corpus — the online ANN-serving path. Each
    * micro-batch stream-static joins the queries to the corpus (corpus
    * broadcast per batch; at real scale, pre-bucket the corpus by LSH
    * key and join on the bucket instead of the open condition), scores
    * with the codegen'd vec_dot, and ranks with the bounded-heap
    * `topk_by_score` aggregate — a TypedImperativeAggregate, so the
    * streaming state per query is the ≤k heap, not the scored
    * candidates. Identical formulation (9dp rounding, id tie-break) to
    * [[graft.ops.Similarity.bruteForceTopKAgg]], so it shares v1's
    * batch oracle.
    */
  def streamTopK(queries: DataFrame, corpus: DataFrame, k: Int = 10,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.ops.{Num, Similarity}
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", Similarity.norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Num.roundTo(Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 9).as("sim"))
    scored.groupBy(col("query_id"))
      .agg(call_function("topk_by_score", col("sim"), col("neighbor_id"), lit(k)).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "nb")))
      .select(col("query_id"), col("nb.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"), col("nb.score").as("sim"))
  }

  final case class EventRow(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserCount(user_id: Long, n_events: Long)
  final case class FunnelEvent(user_id: Long, event_id: Long, us: Long, event_type: String)
  final case class FunnelReach(user_id: Long, max_stage: Long)
  final case class Scd2Closed(user_id: Long, state: String,
                              valid_from_us: Long, valid_to_us: Long)
  final case class ConvTouch(conv_id: Long, touch_type: String, n: Long,
                             is_first: Boolean, is_last: Boolean)
  final case class ConvCredit(conv_id: Long, touch_type: String, n: Long,
                              credit_bp: Long)

  /** Streaming ordered funnel — [[graft.ops.EventWindows.funnel]]'s
    * first-touch strictly-after semantics as custom keyed state: per
    * user, the state is the earliest reach time per stage; each batch's
    * events replay in event-time order against it and emit the user's
    * current max stage. Within a batch the sorted single pass is exact
    * (each stage's anchor is minimal before any later stage consults
    * it); across batches it stays exact when batches arrive in event
    * time (the AvailableNow gate run is one batch) — out-of-order
    * ARRIVAL of an earlier stage event can under-advance later stages
    * until their events recur, the standard streaming-funnel caveat.
    * State is |stages| longs per user.
    */
  def streamFunnelStage(events: Dataset[FunnelEvent],
                        stages: Seq[String]): Dataset[FunnelReach] = {
    import events.sparkSession.implicits._
    require(stages.nonEmpty, "funnel needs at least one stage")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Long], FunnelReach](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[Array[Long]]) =>
          val reach = state.getOption.getOrElse(Array.fill(stages.length)(Long.MaxValue))
          rows.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
            val si = stages.indexOf(e.event_type)
            if (si == 0) { if (e.us < reach(0)) reach(0) = e.us }
            else if (si > 0 && reach(si - 1) != Long.MaxValue &&
                     e.us > reach(si - 1) && e.us < reach(si)) reach(si) = e.us
          }
          state.update(reach)
          Iterator(FunnelReach(uid, (reach.lastIndexWhere(_ != Long.MaxValue) + 1).toLong))
      }
  }

  /** STREAMING SCD TYPE-2 — the incremental twin of
    * [[graft.ops.EventWindows.scd2History]]: per-user keyed state holds
    * only the OPEN interval (state, valid_from) — two values per user,
    * however long the history — and each state CHANGE emits the closed
    * interval exactly once, so the emitted union over all micro-batches
    * equals the batch build's closed rows, row for row (the open
    * current interval stays in state, unemitted, by construction).
    * Within a batch, rows sort by (us, event_id) — the batch build's
    * exact order; like every stateful twin here, cross-batch arrival
    * order must respect event time for intervals to close correctly
    * (the fixture replay and staged-stream gate do).
    */
  def streamScd2(events: Dataset[FunnelEvent]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(String, Long), Scd2Closed](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent], state: GroupState[(String, Long)]) =>
          var cur = state.getOption
          val out = Seq.newBuilder[Scd2Closed]
          rows.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
            cur match {
              case None => cur = Some((e.event_type, e.us))
              case Some((st, from)) if st != e.event_type =>
                out += Scd2Closed(uid, st, from, e.us)
                cur = Some((e.event_type, e.us))
              case _ => ()
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** STREAMING MULTI-TOUCH ATTRIBUTION — the incremental twin of
    * [[graft.ops.EventWindows.attribution]]: per-user keyed state holds
    * only the touches inside the lookback horizon (pruned against the
    * newest event time seen, so state is bounded by per-user activity
    * in one window, not history length), and each conversion emits its
    * per-touch-type credit rows exactly once, at conversion time. The
    * caller aggregates emissions to the batch operator's exact report,
    * so st13 shares e17's oracle verbatim. Like every stateful twin,
    * cross-batch arrival must respect event time (the staged gate does).
    */
  def streamAttribution(events: Dataset[FunnelEvent],
                        convType: String = "purchase",
                        touchTypes: Seq[String] = Seq("click", "view"),
                        lookbackUs: Long = 168L * 3600L * 1000000L): Dataset[ConvTouch] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Array[Long], Array[Long], Array[String]), ConvTouch](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent],
         state: GroupState[(Array[Long], Array[Long], Array[String])]) =>
          var (tus, tid, ttp) = state.getOption
            .getOrElse((Array.empty[Long], Array.empty[Long], Array.empty[String]))
          var lastSeen = if (tus.isEmpty) Long.MinValue else tus.last
          val out = Seq.newBuilder[ConvTouch]
          rows.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
            lastSeen = math.max(lastSeen, e.us)
            if (touchTypes.contains(e.event_type)) {
              tus :+= e.us; tid :+= e.event_id; ttp :+= e.event_type
            } else if (e.event_type == convType) {
              val lo = e.us - lookbackUs
              val idx = tus.indices.filter(i => tus(i) < e.us && tus(i) >= lo)
              if (idx.nonEmpty) {
                // total (us, event_id) order — the batch min_by/max_by rule
                val first = idx.minBy(i => (tus(i), tid(i)))
                val last = idx.maxBy(i => (tus(i), tid(i)))
                idx.groupBy(ttp).foreach { case (tpe, is) =>
                  out += ConvTouch(e.event_id, tpe, is.size.toLong,
                    ttp(first) == tpe && is.contains(first),
                    ttp(last) == tpe && is.contains(last))
                }
              }
            }
          }
          // prune: nothing older than the horizon can credit a future
          // conversion (events arrive in event-time order)
          val keep = tus.indices.filter(i => tus(i) >= lastSeen - lookbackUs)
          state.update((keep.map(tus).toArray, keep.map(tid).toArray,
            keep.map(ttp).toArray))
          out.result().iterator
      }
  }

  /** STREAMING LINEAR ATTRIBUTION — the incremental twin of
    * [[graft.ops.EventWindows.linearAttribution]], same keyed state and
    * horizon pruning as [[streamAttribution]]: each conversion splits
    * its 10,000 basis points equally across its lookback touches at
    * conversion time (integer division, remainder to the
    * (us, event_id)-earliest touch — the batch rule), emitting one
    * credit row per touch type. Aggregated emissions equal the batch
    * report exactly, so st14 shares e18's oracle verbatim.
    */
  def streamLinearAttribution(events: Dataset[FunnelEvent],
                              convType: String = "purchase",
                              touchTypes: Seq[String] = Seq("click", "view"),
                              lookbackUs: Long = 168L * 3600L * 1000000L): Dataset[ConvCredit] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Array[Long], Array[Long], Array[String]), ConvCredit](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FunnelEvent],
         state: GroupState[(Array[Long], Array[Long], Array[String])]) =>
          var (tus, tid, ttp) = state.getOption
            .getOrElse((Array.empty[Long], Array.empty[Long], Array.empty[String]))
          var lastSeen = if (tus.isEmpty) Long.MinValue else tus.last
          val out = Seq.newBuilder[ConvCredit]
          rows.toArray.sortBy(e => (e.us, e.event_id)).foreach { e =>
            lastSeen = math.max(lastSeen, e.us)
            if (touchTypes.contains(e.event_type)) {
              tus :+= e.us; tid :+= e.event_id; ttp :+= e.event_type
            } else if (e.event_type == convType) {
              val lo = e.us - lookbackUs
              val idx = tus.indices.filter(i => tus(i) < e.us && tus(i) >= lo)
              if (idx.nonEmpty) {
                val base = 10000L / idx.size
                val rem = 10000L % idx.size
                val first = idx.minBy(i => (tus(i), tid(i)))
                idx.groupBy(ttp).foreach { case (tpe, is) =>
                  out += ConvCredit(e.event_id, tpe, is.size.toLong,
                    base * is.size + (if (is.contains(first)) rem else 0L))
                }
              }
            }
          }
          val keep = tus.indices.filter(i => tus(i) >= lastSeen - lookbackUs)
          state.update((keep.map(tus).toArray, keep.map(tid).toArray,
            keep.map(ttp).toArray))
          out.result().iterator
      }
  }

  /** Custom keyed state via flatMapGroupsWithState: running per-user event
    * counts emitted on every update — the template for semantics that
    * windows can't express (per-key ML features, custom eviction, CDC).
    * State is one long per user, partitioned across executors.
    */
  def runningUserCounts(events: Dataset[EventRow]): Dataset[UserCount] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator(UserCount(userId, n))
      }
  }

  /** Run `body` with the RocksDB state-store provider (restoring the
    * prior provider after). The default HDFS-backed store keeps every
    * version of every key ON HEAP — for the per-user-state family
    * (sessions, funnels, SCD2, running top-k) whose key space tracks
    * the user population, that heap footprint is the scale-killer at
    * 100 TB/day; RocksDB spills state to local SSD with a bounded block
    * cache, the standard production choice. Correctness is
    * provider-independent (same keys, same values, same watermark
    * semantics) — the oracle rows are identical, which is exactly what
    * the gate re-checks. Session-conf scoped: the provider is read at
    * STREAM START, so wrapping the start call is sufficient, and
    * restoring it leaves concurrently-defined batch queries untouched
    * (Verify runs queries sequentially).
    */
  def withRocksDbState[T](spark: SparkSession)(body: => T): T = {
    // dev A/B knob: SPARK_GRAFT_HEAP_STATE=1 keeps the default heap
    // store so provider cost can be measured same-code, same-box
    if (sys.env.get("SPARK_GRAFT_HEAP_STATE").contains("1")) return body
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Drive any streaming frame to a named in-memory table until all
    * currently-available input is processed (test/dev harness; production
    * sinks go through [[runToParquet]] with checkpointing).
    */
  /** Checkpoint parent for EPHEMERAL streaming queries (memory sinks,
    * foreachBatch twins driven once with AvailableNow and discarded):
    * the state store writes one delta file per partition per micro-batch
    * plus commit/offset logs, and on the ext4 /tmp those tiny-file
    * create+rename storms dominated the stateful rows of the r18 bench —
    * thread dumps showed state-store stages at ~97% non-CPU wait (103 s
    * task run time, 3.7 s CPU on st11's two interval-join stages).
    * Ephemeral state belongs on the fastest local scratch (the same
    * [[graft.Sessions.scratchDir]] ops would point at node-local NVMe on
    * a cluster); durable checkpoints ([[runToParquet]]) keep their
    * caller-chosen locations unchanged.
    */
  private[graft] def ephemeralCheckpoint(): String = {
    val root = java.nio.file.Paths.get(
      graft.Sessions.scratchDir.getOrElse(System.getProperty("java.io.tmpdir")),
      "graft-ckpt")
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, "q").toString
  }

  def runToMemory(df: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Complete()): StreamingQuery = {
    withSourceWidth(df.sparkSession) {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ephemeralCheckpoint())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }

  /** The DURABLE path: drive a streaming frame to a parquet file sink
    * with a checkpoint, processing everything available now, then
    * terminate. Restarting with the same (outDir, checkpointDir) resumes
    * from the recorded offsets with recovered operator state: committed
    * micro-batches are never re-emitted (the file sink's transaction log
    * makes uncommitted files invisible to readers), new input picks up
    * exactly where the last run stopped — kill-and-resume yields
    * exactly-once output. File sinks are append-mode: stateful
    * aggregations emit a window only once the watermark passes it, which
    * is precisely the contract that makes re-emission impossible.
    */
  def runToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery = {
    withSourceWidth(df.sparkSession) {
      val q = df.writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
  }
}
