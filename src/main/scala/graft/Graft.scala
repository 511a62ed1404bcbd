package graft

import graft.etl.{Clean, Ingest, Load, Pipeline, Synthetic}
import graft.serve.{Queries, Runs}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.concurrent.ExecutionContext

/** Single entry point — the reference's complete user-facing surface
  * (`/root/reference/README.md` CLI flow + `api.py` endpoints), one method
  * per capability, so a user of the reference can switch 1:1:
  *
  * {{{
  * val spark = Graft.session()
  * Graft.runPipeline(spark, Pipeline.PipelineConfig(csvPath = "data/raw"))
  * Graft.preview(spark, "products")                       // GET /api/data/preview
  * Graft.stats(spark, "products")                         // GET /api/data/stats
  * Graft.listFiles(spark, "data/raw")                     // GET /api/files/list
  * val reg = Graft.registry(spark)                        // POST /api/pipeline/run …
  * }}}
  */
object Graft {

  /** Preconfigured local session (shuffle partitions = cores, AQE on,
    * graft expressions registered). On a cluster, pass your own builder
    * through [[Sessions.configure]] instead. */
  def session(appName: String = "graft"): SparkSession = Sessions.local(appName)

  // ---- ETL (flows/pipeline.py) ----

  /** Synchronous ingest → clean → load with per-stage counts (E1). */
  def runPipeline(spark: SparkSession, config: Pipeline.PipelineConfig): Pipeline.PipelineResult =
    Pipeline.run(spark, config)

  /** The individual stages, composable as one lazy plan. */
  def ingest(spark: SparkSession, path: String, strict: Boolean = false): DataFrame =
    Ingest.ingest(spark, path, strict)
  def clean(df: DataFrame, subset: Seq[String] = Seq.empty): DataFrame =
    Clean.dropAnyNull(df, subset)
  def load(df: DataFrame, path: String): Unit = Load.replaceParquet(df, path)

  // ---- Serving (api.py) ----

  def preview(spark: SparkSession, table: String, limit: Int = 10): DataFrame =
    Queries.preview(spark, table, limit)
  def stats(spark: SparkSession, table: String): Queries.TableStats =
    Queries.stats(spark, table)
  def listFiles(spark: SparkSession, directory: String): DataFrame =
    Ingest.listCsvFiles(spark, directory)

  /** Background-run registry (POST /api/pipeline/run, GET status/runs,
    * DELETE runs). */
  def registry(spark: SparkSession)(implicit ec: ExecutionContext): Runs.Registry =
    new Runs.Registry(spark)

  /** Startup hook (api.py:589-607): generate the synthetic products CSV
    * if absent. */
  def ensureSampleData(spark: SparkSession, path: String): Unit =
    Synthetic.ensureProductsCsv(spark, path)

  // ---- Training-data pipeline (north-star extensions) ----
  // One-line delegates so the whole corpus workflow reads off this
  // object; the full parameter surface lives on graft.ops.*.

  /** Near-dup pairs by MinHash+LSH ([[ops.Dedup.minhashLsh]]). */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    ops.Dedup.minhashLsh(docs, threshold = threshold)

  /** Canonical survivor per transitive dup cluster
    * ([[ops.Dedup.resolveDuplicates]]; runs jobs — iterative). */
  def resolveDuplicates(docs: DataFrame, pairs: DataFrame): DataFrame =
    ops.Dedup.resolveDuplicates(docs, pairs)

  /** Cross-split near-dup leakage report over a MATERIALIZED pair table
    * ([[ops.TextStats.leakageReport]]) — persist/checkpoint the pairs
    * once and feed every consumer (resolve, incremental dedup, this)
    * from the same table; the pair pipeline is the expensive pass. */
  def leakageReport(docs: DataFrame, pairs: DataFrame): DataFrame =
    ops.TextStats.leakageReport(docs, pairs)

  /** Content-hash train/val/test assignment ([[ops.TextStats.assignSplit]]). */
  def assignSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    ops.TextStats.assignSplit(docs, trainPct = trainPct, valPct = valPct)

  /** Leakage-PROOF split: near-dup clusters co-locate in one split
    * ([[ops.TextStats.assignSplitByComponent]]) — closes the channel
    * [[leakageReport]] measures; feed it the same materialized pairs. */
  def assignSplitSafe(docs: DataFrame, pairs: DataFrame,
                      trainPct: Int = 80, valPct: Int = 10): DataFrame =
    ops.TextStats.assignSplitByComponent(docs, pairs,
      trainPct = trainPct, valPct = valPct)

  /** Corpus fingerprint for incremental dedup ([[ops.Dedup.corpusBloom]];
    * save/load on [[ops.CorpusBloom]]) — build once per corpus snapshot,
    * then [[incrementalSurvivors]] prefilters every future batch without
    * rescanning the corpus. */
  def corpusBloom(oldDocs: DataFrame): ops.CorpusBloom =
    ops.Dedup.corpusBloom(oldDocs)

  /** Batch-vs-corpus survivors, bloom-prefiltered
    * ([[ops.Dedup.incrementalSurvivorsPrefiltered]]) — results are
    * exactly the unfiltered pipeline's. */
  def incrementalSurvivors(oldDocs: DataFrame, newDocs: DataFrame,
                           bloom: ops.CorpusBloom,
                           threshold: Double = 0.6): DataFrame =
    ops.Dedup.incrementalSurvivorsPrefiltered(oldDocs, newDocs, bloom,
      threshold = threshold)

  /** As-of join ([[ops.AsOf.asofJoin]]) and its staleness-bounded
    * variant ([[ops.AsOf.asofJoinWithin]]) — point-in-time lookup via
    * union + sorted carry-forward, one shuffle, no candidate
    * explosion. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               payloadCol: String): DataFrame =
    ops.AsOf.asofJoin(left, right, leftKey, rightKey, leftTime, rightTime, payloadCol)

  def asofJoinWithin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     leftTime: String, rightTime: String,
                     payloadCol: String, toleranceUs: Long): DataFrame =
    ops.AsOf.asofJoinWithin(left, right, leftKey, rightKey, leftTime,
      rightTime, payloadCol, toleranceUs)

  /** Binned range join — interval containment without a nested loop
    * ([[ops.AsOf.rangeJoin]]). */
  def rangeJoin(facts: DataFrame, pointCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                binWidth: Long): DataFrame =
    ops.AsOf.rangeJoin(facts, pointCol, intervals, startCol, endCol, binWidth)

  /** Size-targeted compaction write ([[etl.Load.compactTo]]). */
  def compactTo(df: DataFrame, path: String,
                targetBytes: Long = 128L << 20,
                keys: Seq[String] = Seq.empty): Int =
    Load.compactTo(df, path, targetBytes, keys)

  /** Deterministic weighted downsampling per group ([[ops.TextStats.mixCorpus]]). */
  def mixCorpus(docs: DataFrame, weights: Map[String, Double],
                keyCol: String = "lang"): DataFrame =
    ops.TextStats.mixCorpus(docs, weights, keyCol = keyCol)

  /** Email/phone redaction with audit counts ([[ops.TextStats.scrubPii]]). */
  def scrubPii(docs: DataFrame): DataFrame = ops.TextStats.scrubPii(docs)

  /** Token-window chunking ([[ops.TextStats.chunk]]). */
  def chunk(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48): DataFrame =
    ops.TextStats.chunk(docs, chunkSize, stride)

  /** Concat-and-chop sequence packing ([[ops.TextStats.packChunks]]). */
  def packChunks(chunks: DataFrame, budget: Int = 512): DataFrame =
    ops.TextStats.packChunks(chunks, budget)

  /** Exact cosine top-k with map-side bounded heaps
    * ([[ops.Similarity.bruteForceTopKAgg]]) — THE top-k to use: partial
    * aggregation reduces every partition to ≤k candidates per query
    * before the shuffle. */
  def similarTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    ops.Similarity.bruteForceTopKAgg(corpus, queries, k)

  /** Window+row_number formulation of the same contract
    * ([[ops.Similarity.bruteForceTopK]]) — kept for oracle/debug work
    * only: it shuffles every scored pair, where [[similarTopK]] shuffles
    * O(queries·k·partitions). Same rows out, including tie-breaks. */
  def similarTopKExact(corpus: DataFrame, queries: DataFrame, k: Int = 10): DataFrame =
    ops.Similarity.bruteForceTopK(corpus, queries, k)

  /** Embedding-quality eval: sampled leave-one-out kNN label accuracy
    * ([[ops.Similarity.knnLabelAccuracySampled]]) — the production
    * default; scoring work is n²/stride, not n². */
  def knnEval(vectors: DataFrame, stride: Int = 10, k: Int = 5): DataFrame =
    ops.Similarity.knnLabelAccuracySampled(vectors, stride, k)

  /** FULL leave-one-out kNN eval ([[ops.Similarity.knnLabelAccuracy]]) —
    * every vector queries the whole corpus (n² dot products). Oracle
    * baseline; use [[knnEval]] at corpus scale. */
  def knnEvalFull(vectors: DataFrame, k: Int = 5): DataFrame =
    ops.Similarity.knnLabelAccuracy(vectors, k)

  /** Embedding near-dup pairs via multi-table LSH
    * ([[ops.Similarity.embeddingNearDup]]). */
  def nearDupEmbeddings(vectors: DataFrame, threshold: Double = 0.95): DataFrame =
    ops.Similarity.embeddingNearDup(vectors, threshold)

  /** Benchmark decontamination ([[ops.Dedup.decontaminate]]): flag
    * training docs sharing n-gram shingles with an eval set. The
    * benchmark side broadcasts — the corpus never shuffles for it. */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
                    minShared: Long = 3): DataFrame =
    ops.Dedup.decontaminate(train, benchmark, minShared = minShared)

  /** Real multimodal feature extraction ([[ops.Multimodal.extractFeatures]]):
    * PNG/JPEG grid-RGB color layout, WAV windowed RMS — output shaped
    * like the embeddings table for the similarity ops above. STRICT by
    * default: an undecodable payload raises the typed error rather than
    * silently producing a fake vector. */
  def mediaFeatures(media: DataFrame, dim: Int = 64): DataFrame =
    ops.Multimodal.extractFeatures(media, dim).toDF()

  // ---- Event analytics (events table) ----

  /** Ordered conversion funnel ([[ops.EventWindows.funnel]]) — first-touch,
    * strictly-after stage semantics; skew-safe via partial aggregation. */
  def funnel(spark: SparkSession, dir: String, stages: Seq[String]): DataFrame =
    ops.EventWindows.funnel(spark, dir, stages)

  /** Weekly cohort retention grid ([[ops.EventWindows.retention]]). */
  def retention(spark: SparkSession, dir: String): DataFrame =
    ops.EventWindows.retention(spark, dir)

  /** DAU / trailing-7-day WAU / stickiness ([[ops.EventWindows.activeUsers]]). */
  def activeUsers(spark: SparkSession, dir: String): DataFrame =
    ops.EventWindows.activeUsers(spark, dir)

  /** Per-user inter-event cadence ([[ops.EventWindows.interEventGaps]]). */
  def interEventGaps(spark: SparkSession, dir: String): DataFrame =
    ops.EventWindows.interEventGaps(spark, dir)

  /** Rolling z-score anomaly flags over hourly event-type volumes
    * ([[ops.EventWindows.hourlyAnomalies]]). */
  def hourlyAnomalies(spark: SparkSession, dir: String,
                      lookback: Int = 24, zThreshold: Double = 2.0): DataFrame =
    ops.EventWindows.hourlyAnomalies(spark, dir, lookback, zThreshold)

  /** Exact pairwise Pearson correlations in one aggregation pass
    * ([[ops.Profiling.correlationMatrix]]). */
  def correlations(df: DataFrame, columns: Seq[String]): DataFrame =
    ops.Profiling.correlationMatrix(df, columns)

  /** Vocabulary coverage curve — share of corpus tokens the top-K terms
    * cover ([[ops.TextStats.vocabCoverage]]). */
  def vocabCoverage(docs: DataFrame, ks: Seq[Int] = Seq(10, 100, 1000)): DataFrame =
    ops.TextStats.vocabCoverage(docs, ks)

  /** Boilerplate shingles: repeated w-grams across ≥ minDf distinct docs
    * ([[ops.Dedup.boilerplate]]). */
  def boilerplate(docs: DataFrame, minDf: Int = 5): DataFrame =
    ops.Dedup.boilerplate(docs, minDf)

  /** Per-source exact-duplication profile ([[ops.Dedup.dupProfile]]). */
  def dupProfile(docs: DataFrame): DataFrame = ops.Dedup.dupProfile(docs)

  /** Per-source curation report (c18): doc/token counts, dup rate,
    * quality quartiles, corpus share and a max-share cap
    * recommendation in one pass ([[ops.TextStats.curationReport]]) —
    * the crawl-ops dashboard run before dedup or mixing. */
  def curationReport(docs: DataFrame, maxShareBp: Long = 2500L): DataFrame =
    ops.TextStats.curationReport(docs, maxShareBp)

  /** Training-epoch allocation plan (c19): fill a token budget with
    * the best sources first, each repeating up to maxEpochs
    * ([[ops.TextStats.epochPlan]]) — the data-constrained budgeting
    * step after [[curationReport]]. */
  def epochPlan(docs: DataFrame, budget: Long, maxEpochs: Long = 4L): DataFrame =
    ops.TextStats.epochPlan(docs, budget, maxEpochs)

  /** GPT-style context-window packing plan (c20): docs concatenate in
    * seeded permutation order and split at contextLen boundaries; per
    * doc the pack rank, start offset and window span
    * ([[ops.TextStats.contextPack]]). */
  def contextPack(docs: DataFrame, contextLen: Long, seed: Long = 42L): DataFrame =
    ops.TextStats.contextPack(docs, contextLen, seed)

  /** Hard-negative mining for contrastive training (v24): per anchor
    * the k most-similar vectors inside the [lo, hi) cosine band
    * ([[ops.Similarity.hardNegatives]]). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int = 8,
                    lo: Double = 0.05, hi: Double = 0.42): DataFrame =
    ops.Similarity.hardNegatives(corpus, queries, k, lo, hi)

  /** LSH banding planner — per-config candidate workload and S-curve
    * crossover from one signature table ([[ops.Dedup.lshPlan]]). */
  def lshPlan(docs: DataFrame, k: Int = 128): DataFrame =
    ops.Dedup.lshPlan(ops.Dedup.minhashSignatures(docs, k = k), k)

  /** Keyed upsert/MERGE — updates override, base survives, new keys
    * insert ([[etl.Load.upsert]]). */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    etl.Load.upsert(base, updates, keys)

  /** Quantile bucketing without ntile ([[ops.Profiling.quantileBuckets]]). */
  def quantileBuckets(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    ops.Profiling.quantileBuckets(df, keyCol, valueCol)

  /** Tukey IQR-fence outlier report per group
    * ([[ops.Profiling.outlierReport]]) — counts at value fences; the
    * rank-fence clipping sibling is [[ops.Profiling.winsorizeReport]]. */
  def outlierReport(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    ops.Profiling.outlierReport(df, groupCol, valueCol)

  /** Declarative data-quality validation — all row rules in one pass
    * ([[ops.Profiling.validate]]). */
  def validate(df: DataFrame, rowRules: Seq[(String, org.apache.spark.sql.Column)],
               uniqueKeys: Seq[(String, Seq[String])] = Seq.empty): DataFrame =
    ops.Profiling.validate(df, rowRules, uniqueKeys)

  /** Funnel with mean time-to-convert per stage
    * ([[ops.EventWindows.funnelTiming]]). */
  def funnelTiming(spark: SparkSession, dir: String, stages: Seq[String]): DataFrame =
    ops.EventWindows.funnelTiming(spark, dir, stages)

  /** Perceptual average-hashes for every decodable image
    * ([[ops.Multimodal.imageHashes]]). */
  def imageHashes(media: DataFrame): DataFrame =
    ops.Multimodal.imageHashes(media)

  /** Image near-dup pairs by aHash Hamming distance, exact via 8-chunk
    * pigeonhole blocking ([[ops.Multimodal.nearDupImages]]). */
  def nearDupImages(hashes: DataFrame, maxDist: Int = 6): DataFrame =
    ops.Multimodal.nearDupImages(hashes, maxDist)

  /** Exact heavy hitters via the two-pass Misra-Gries pattern
    * ([[ops.TextStats.heavyHitters]]) — constant-memory candidate
    * generation, exact recount, no term-frequency shuffle. */
  def heavyHitters(docs: DataFrame, phi: Double = 0.01, capacity: Int = 256): DataFrame =
    ops.TextStats.heavyHitters(docs, phi, capacity)

  /** Typo/variant term pairs within an edit-distance budget over a
    * bounded vocabulary slice ([[ops.TextStats.fuzzyTermPairs]]); the
    * [[plans.LevenshteinPruning]] rule length-prunes the pair loop. */
  def fuzzyTermPairs(docs: DataFrame, maxVocab: Int = 1000, maxDist: Int = 2): DataFrame =
    ops.TextStats.fuzzyTermPairs(docs, maxVocab, maxDist)

  /** Product-quantization reconstruction-error report
    * ([[ops.Similarity.pqReconstructionError]]). */
  def pqError(vectors: DataFrame, m: Int = 4, dim: Int = 64,
              cells: Int = 16, iters: Int = 3): DataFrame =
    ops.Similarity.pqReconstructionError(vectors, m, dim, cells, iters)

  /** ANN over PQ-compressed storage ([[ops.Similarity.pqTopK]]). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
             m: Int = 4, dim: Int = 64, cells: Int = 16): DataFrame =
    ops.Similarity.pqTopK(corpus, queries, k, m, dim, cells)

  /** Per-language median quality gate ([[ops.TextStats.qualityGate]]). */
  def qualityGate(docs: DataFrame, pct: Double = 0.5): DataFrame =
    ops.TextStats.qualityGate(docs, pct)

  /** Whitespace/control-char normalization
    * ([[ops.TextStats.normalizeText]]). */
  def normalizeText(docs: DataFrame): DataFrame =
    ops.TextStats.normalizeText(docs)

  /** EWMA smoothing over the hourly grid as a weighted fan-out
    * ([[ops.EventWindows.hourlyEwma]]). */
  def hourlyEwma(spark: SparkSession, dir: String,
                 alpha: Double = 0.3, k: Int = 12): DataFrame =
    ops.EventWindows.hourlyEwma(spark, dir, alpha, k)

  /** Dense zero-filled hourly spine ([[ops.EventWindows.hourlySpine]]). */
  def hourlySpine(spark: SparkSession, dir: String): DataFrame =
    ops.EventWindows.hourlySpine(spark, dir)

  /** Deterministic stratified downsampling by content hash
    * ([[ops.TextStats.stratifiedSample]]): rates in percent per stratum
    * value, monotone in the rate, stable under re-sharding. */
  def stratifiedSample(docs: DataFrame, stratumCol: String,
                       rates: Map[String, Int], defaultPct: Int = 100): DataFrame =
    ops.TextStats.stratifiedSample(docs, stratumCol, rates, defaultPct)

  /** Inverse-frequency class weights ([[ops.TextStats.balanceWeights]]):
    * equal weight mass per stratum, corpus mean weight 1.0. */
  def balanceWeights(docs: DataFrame, stratumCol: String): DataFrame =
    ops.TextStats.balanceWeights(docs, stratumCol)

  /** Per-bin PSI drift between two time windows
    * ([[ops.Profiling.psiDrift]]). */
  def psiDrift(df: DataFrame, groupCol: String, valueCol: String,
               tsCol: String, cutTs: String): DataFrame =
    ops.Profiling.psiDrift(df, groupCol, valueCol, tsCol, cutTs)

  /** First-order event-transition counts ([[ops.EventWindows.transitions]]). */
  def transitions(spark: SparkSession, dir: String): DataFrame =
    ops.EventWindows.transitions(spark, dir)

  /** Watermark-bounded stream-stream interval join
    * ([[streaming.Streams.streamIntervalJoin]]). */
  def streamIntervalJoin(events: DataFrame, leftType: String, rightType: String,
                         within: String = "30 minutes"): DataFrame =
    streaming.Streams.streamIntervalJoin(events, leftType, rightType, within)

  /** Exact embedding near-dup pairs
    * ([[ops.Similarity.embeddingNearDupExact]]) — the oracle baseline for
    * [[nearDupEmbeddings]]'s LSH candidate generation. */
  def nearDupEmbeddingsExact(vectors: DataFrame, threshold: Double = 0.95): DataFrame =
    ops.Similarity.embeddingNearDupExact(vectors, threshold)

  /** Bucketed replace-load for shuffle-free downstream joins
    * ([[etl.Load.replaceTableBucketed]]). */
  /** Z-order layout rewrite: cluster a fact table on TWO keys at once so
    * per-file min/max footers stay tight on both (k4; two-sided range
    * scans skip files a single-column sort cannot).
    */
  def replaceZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                      nFiles: Int = 8): Unit =
    graft.etl.Load.replaceZOrdered(df, path, c1, c2, nFiles)

  /** BPE merge training at production merge counts (t32): parallel-BPE
    * rounds of up-to-m symbol-disjoint merges — ~m× fewer driver
    * round-trips than textbook sequential BPE. THE default for real
    * vocab sizes; [[bpeMergesSequential]] is its exactness anchor.
    * Named `Batched` (not plain `bpeMerges`) on purpose: the ops-layer
    * sequential trainer takes a MERGE count `k` in the same position
    * this takes a ROUND count, so sharing the short name would let a
    * caller porting `TextStats.bpeMerges(docs, 50)` silently train
    * 50 rounds × 8 merges instead of 50 merges.
    */
  def bpeMergesBatched(docs: DataFrame, rounds: Int = 4, m: Int = 8): DataFrame =
    graft.ops.TextStats.bpeMergesBatched(docs, rounds, m)

  /** Textbook one-merge-per-round BPE (t22) — exact argmax chain, one
    * driver round-trip per merge; use for small k or as the reference
    * the batched trainer is spec'd against (they coincide at m = 1).
    */
  def bpeMergesSequential(docs: DataFrame, k: Int = 8): DataFrame =
    graft.ops.TextStats.bpeMerges(docs, k)

  /** Tokenizer encode with a learned BPE merge table (c8): per-doc
    * subword counts; merges apply to the distinct-token vocab, never
    * rewriting the corpus k times.
    */
  def bpeEncode(docs: DataFrame, merges: DataFrame): DataFrame =
    graft.ops.TextStats.bpeEncode(docs, merges)

  /** DSIR-style importance weights against a target-language slice
    * (t23): hashed-unigram log-ratio scores for data selection.
    */
  def importanceWeights(docs: DataFrame, targetLang: String = "en"): DataFrame =
    graft.ops.TextStats.importanceWeights(docs, targetLang)

  def replaceTableBucketed(df: DataFrame, table: String,
                           buckets: Int, keys: Seq[String]): Unit =
    etl.Load.replaceTableBucketed(df, table, buckets, keys)

  /** Per-group top-k via the bounded-heap aggregate
    * ([[ops.Analytics.topCustomersPerNation]]) — map-side k-reduction,
    * no window sort. */
  def topCustomersPerNation(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    ops.Analytics.topCustomersPerNation(spark, dir, k)

  /** Per-doc n-gram novelty vs a reference corpus
    * ([[ops.TextStats.noveltyScore]]). */
  def noveltyScore(newDocs: DataFrame, reference: DataFrame, w: Int = 3): DataFrame =
    ops.TextStats.noveltyScore(newDocs, reference, w = w)

  /** IVF+PQ ANN serving — routed search over compressed storage
    * ([[ops.Similarity.ivfPqTopK]]); train the codebooks once per corpus
    * snapshot ([[ops.Similarity.trainIvfCodebook]],
    * [[ops.Similarity.pqCodebooks]]) and reuse them as model artifacts. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                ivfCodebook: DataFrame, pqBooks: DataFrame,
                k: Int = 10, nprobe: Int = 4): DataFrame =
    ops.Similarity.ivfPqTopK(corpus, queries, ivfCodebook, pqBooks, k, nprobe)

  /** KMV exact-replayable distinct-count sketch over order keys
    * ([[ops.Analytics.kmvDistinct]]); [[ops.Analytics.kmvUnion]] shows
    * the kilobyte-sized sketch-merge path for any-range cardinality. */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    ops.Analytics.kmvDistinct(spark, dir, k)

  /** Per-group KMV distinct estimate with the exact count and relative
    * error beside it ([[ops.Analytics.kmvAccuracy]]) — the sketch-
    * parameter audit; [[ops.Analytics.approxDistinct]] is the HLL++
    * engine-native form (estimates are engine-internal, accuracy
    * spec'd). */
  def kmvAccuracy(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    ops.Analytics.kmvAccuracy(spark, dir, k)

  /** Mergeable-sketch union with per-row merge-exactness proof
    * ([[ops.Analytics.kmvMergeHalves]]); [[ops.Analytics.hllUnionDistinct]]
    * is the HLL++ engine-native form. */
  def kmvMergeHalves(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    ops.Analytics.kmvMergeHalves(spark, dir, k)

  /** SCD TYPE-2 validity-interval history from an event stream
    * ([[ops.EventWindows.scd2History]]). */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    ops.EventWindows.scd2History(spark, dir)

  /** First/last-touch conversion attribution with a lookback window
    * ([[ops.EventWindows.attribution]]). */
  def attribution(spark: SparkSession, dir: String,
                  convType: String = "purchase",
                  touchTypes: Seq[String] = Seq("click", "view"),
                  lookbackHours: Int = 168): DataFrame =
    ops.EventWindows.attribution(spark, dir, convType, touchTypes, lookbackHours)

  /** Linear multi-touch attribution — integer basis-point credit split
    * equally per conversion ([[ops.EventWindows.linearAttribution]]). */
  def linearAttribution(spark: SparkSession, dir: String,
                        convType: String = "purchase",
                        touchTypes: Seq[String] = Seq("click", "view"),
                        lookbackHours: Int = 168): DataFrame =
    ops.EventWindows.linearAttribution(spark, dir, convType, touchTypes, lookbackHours)

  /** Integer-exact PageRank over the part co-purchase graph
    * ([[ops.Graph.partPageRank]]). */
  def partPageRank(spark: SparkSession, dir: String,
                   iters: Int = 3, topN: Int = 20): DataFrame =
    ops.Graph.partPageRank(spark, dir, iters, topN)

  /** Degree-ordered triangle count + clustering coefficient
    * ([[ops.Graph.partTriangles]]). */
  def partTriangles(spark: SparkSession, dir: String): DataFrame =
    ops.Graph.partTriangles(spark, dir)

  /** Deterministic synchronous label-propagation communities over the
    * part co-purchase graph ([[ops.Graph.partLabelProp]]). */
  def partLabelProp(spark: SparkSession, dir: String, rounds: Int = 4): DataFrame =
    ops.Graph.partLabelProp(spark, dir, rounds)

  /** Probability-proportional-to-size document sampling
    * ([[ops.TextStats.weightedSample]]). */
  def weightedSample(docs: DataFrame): DataFrame =
    ops.TextStats.weightedSample(docs)

  /** Theta-sketch intersection estimate from two KMV sketches
    * ([[ops.Analytics.kmvIntersect]]). */
  def kmvIntersect(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    ops.Analytics.kmvIntersect(spark, dir, k)

  /** Two-sample Kolmogorov–Smirnov drift statistic
    * ([[ops.Profiling.ksDrift]]) — the bin-free companion to
    * [[psiDrift]]. */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
              groupA: String, groupB: String): DataFrame =
    ops.Profiling.ksDrift(df, groupCol, valueCol, groupA, groupB)

  /** End-to-end corpus preparation funnel — normalize → dedup → model
    * gate → chunk accounting as one composed pipeline
    * ([[ops.TextStats.corpusPipeline]]). */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame =
    ops.TextStats.corpusPipeline(spark, dir)

  /** End-to-end pretraining assembly (c21): per-language cap → quality
    * gate → exact dedup → context packing, one lazy plan ending in the
    * train-ready window table ([[ops.TextStats.pretrainPipeline]]). */
  def pretrainPipeline(spark: SparkSession, dir: String, capK: Long = 40L,
                       pct: Double = 0.5, contextLen: Long = 512L): DataFrame =
    ops.TextStats.pretrainPipeline(spark, dir, capK, pct, contextLen)

  /** Deterministic shuffle-and-shard — seeded permutation + exact NTILE
    * cuts, the training-data handoff ([[ops.TextStats.shuffleShard]]);
    * [[shardManifest]] is the per-shard summary a trainer reads first. */
  def shuffleShard(docs: DataFrame, nShards: Int, seed: Long = 42L): DataFrame =
    ops.TextStats.shuffleShard(docs, nShards, seed)

  def shardManifest(docs: DataFrame, nShards: Int = 8): DataFrame =
    ops.TextStats.shardManifest(docs, nShards)

  /** Unigram-LM tokenizer induction (SentencePiece-style Viterbi
    * hard-EM, [[ops.TextStats.unigramVocab]]); encode the corpus with
    * the learned vocab via [[unigramEncode]]. */
  def unigramVocab(docs: DataFrame): DataFrame =
    ops.TextStats.unigramVocab(docs)

  /** Viterbi encode with a learned unigram vocab
    * ([[ops.TextStats.unigramEncode]]): per-doc piece accounting, char
    * fallback for capped/unreachable words. */
  def unigramEncode(docs: DataFrame, vocab: DataFrame): DataFrame =
    ops.TextStats.unigramEncode(docs, vocab)

  /** Cross-document duplicate-span profile at w-token granularity
    * ([[ops.Dedup.dupSpans]]) — the exact-substring-dedup signal. */
  def dupSpans(docs: DataFrame, w: Int = 8): DataFrame =
    ops.Dedup.dupSpans(docs, w)

  /** Dimension-truncation recall curve over an embedding corpus
    * ([[ops.Similarity.dimTruncationRecall]]) — how many dims the index
    * actually needs to store. */
  def dimTruncationRecall(corpus: DataFrame, queries: DataFrame,
                          dims: Seq[Int] = Seq(8, 16, 32, 64), k: Int = 10): DataFrame =
    ops.Similarity.dimTruncationRecall(corpus, queries, dims, k)

  /** IVF nprobe-recall curve ([[ops.Similarity.ivfProbeCurve]]) — size
    * the probe count before a corpus-scale serving rollout. */
  def ivfProbeCurve(corpus: DataFrame, queries: DataFrame, codebook: DataFrame,
                    probes: Seq[Int] = Seq(1, 2, 4, 8), k: Int = 10): DataFrame =
    ops.Similarity.ivfProbeCurve(corpus, queries, codebook, probes, k)

  /** Per-language token-budget fill in seeded permutation order
    * ([[ops.TextStats.tokenBudgetMix]]) — mix design by budget, not rate. */
  def tokenBudgetMix(docs: DataFrame, budgets: Map[String, Long],
                     defaultBudget: Long = Long.MaxValue, seed: Long = 42L): DataFrame =
    ops.TextStats.tokenBudgetMix(docs, budgets, defaultBudget, seed)

  /** SemDeDup: cluster-conditional semantic dedup — trained-IVF cells
    * bound the pair search to within-cluster
    * ([[ops.Similarity.semDeDup]]; train a codebook with
    * [[ops.Similarity.trainIvfCodebook]] first). */
  def semDeDup(vectors: DataFrame, codebook: DataFrame,
               threshold: Double = 0.42): DataFrame =
    ops.Similarity.semDeDup(vectors, codebook, threshold)

  /** Quality-aware canonical selection: per near-dup cluster keep the
    * highest-quality member, ties to the lowest id
    * ([[ops.Dedup.resolveBestByScore]]). */
  def resolveBestByScore(docs: DataFrame, pairs: DataFrame,
                         scores: DataFrame): DataFrame =
    ops.Dedup.resolveBestByScore(docs, pairs, scores)

  /** Per-document tf-idf top-k terms ([[ops.TextStats.tfidfTopTerms]]). */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame =
    ops.TextStats.tfidfTopTerms(docs, k)

  /** Incremental SemDeDup: a new batch dedups against an existing corpus
    * inside corpus-trained IVF cells
    * ([[ops.Similarity.semDeDupIncrement]]); streaming twin in
    * [[streaming.Streams.streamSemDedupIncrement]]. */
  def semDeDupIncrement(corpus: DataFrame, newBatch: DataFrame,
                        codebook: DataFrame,
                        threshold: Double = 0.42): DataFrame =
    ops.Similarity.semDeDupIncrement(corpus, newBatch, codebook, threshold)

  /** Per-cell embedding outliers — the prune-list dual of [[semDeDup]]
    * ([[ops.Similarity.cellOutliers]]): farthest decile from each trained
    * centroid, integer-exact rank rule. */
  def cellOutliers(vectors: DataFrame, codebook: DataFrame): DataFrame =
    ops.Similarity.cellOutliers(vectors, codebook)

  /** DSIR importance resampling — keep docs with probability
    * exp(lw − lw_max) from [[importanceWeights]]'s log-weights
    * ([[ops.TextStats.importanceSample]]). */
  def importanceSample(docs: DataFrame, targetLang: String = "en"): DataFrame =
    ops.TextStats.importanceSample(docs, targetLang)

  /** Per-language quality-gate threshold table, staged once per corpus
    * snapshot ([[ops.TextStats.qualityThresholds]]); feed it to
    * [[streaming.Streams.streamQualityGate]] for the stateless
    * streaming gate. */
  def qualityThresholds(scored: DataFrame): DataFrame =
    ops.TextStats.qualityThresholds(scored)

  /** RFM customer segmentation over an orders table
    * ([[ops.Profiling.rfmSegments]]): quartile-scored recency (days) /
    * frequency / monetary, aggregated to the 64-cell segment grid. */
  def rfmSegments(orders: DataFrame): DataFrame =
    ops.Profiling.rfmSegments(orders)

  /** Per-node triangle counts + local clustering coefficient over the
    * part co-purchase graph ([[ops.Graph.partLocalClustering]]). */
  def partLocalClustering(spark: SparkSession, dir: String): DataFrame =
    ops.Graph.partLocalClustering(spark, dir)

  /** Audio near-dup pairs by the PCM-energy perceptual hash
    * ([[ops.Multimodal.audioHashes]] + the modality-agnostic
    * chunk-blocked Hamming join). */
  def audioNearDup(media: DataFrame, maxDist: Int = 4): DataFrame =
    ops.Multimodal.nearDupImages(ops.Multimodal.audioHashes(media), maxDist)

  /** End-to-end embedding curation funnel: outliers pruned first, then
    * SemDeDup over the survivors, per-label report
    * ([[ops.Similarity.embCurationReport]]). */
  def embCurationReport(vectors: DataFrame, codebook: DataFrame,
                        threshold: Double = 0.42): DataFrame =
    ops.Similarity.embCurationReport(vectors, codebook, threshold)

  /** Top session event-type trigram paths
    * ([[ops.EventWindows.sessionPaths]]). */
  def sessionPaths(spark: SparkSession, dir: String, topN: Int = 20): DataFrame =
    ops.EventWindows.sessionPaths(spark, dir, topN = topN)

  /** Theta-sketch Jaccard between two key sets from their KMV sketches
    * alone ([[ops.Analytics.kmvJaccard]]). */
  def kmvJaccard(spark: SparkSession, dir: String, k: Int = 256): DataFrame =
    ops.Analytics.kmvJaccard(spark, dir, k)
}
