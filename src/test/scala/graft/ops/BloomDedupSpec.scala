package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental dedup: the [[CorpusBloom]] fingerprint
  * must be exact (no false negatives → prefiltered results identical to
  * the unfiltered pipeline) and must actually prune (a mostly-new batch's
  * shingles mostly never reach a shuffle).
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val oldSide = docs.filter(col("doc_id") % 2 === 0)
  private lazy val newSide = docs.filter(col("doc_id") % 2 === 1)
  private lazy val bloom = Dedup.corpusBloom(oldSide, maxDocFreq = 64)

  test("corpusBloom admits every guarded old shingle and every old text hash (no false negatives)") {
    val guarded = oldSide
      .select(explode(Dedup.shingleHashes(col("text"), 3)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= 64)
    val missedShingles = guarded
      .filter(!call_function("might_contain", lit(bloom.shingleBloom), col("shingle")))
      .count()
    assert(missedShingles == 0L, s"$missedShingles guarded shingles missed the bloom")
    val missedTexts = oldSide.select(xxhash64(col("text")).as("h"))
      .filter(!call_function("might_contain", lit(bloom.textBloom), col("h")))
      .count()
    assert(missedTexts == 0L, s"$missedTexts old text hashes missed the bloom")
  }

  test("prefiltered cross dedup equals the unfiltered pipeline") {
    val plain = Dedup.ngramJaccardCross(oldSide, newSide, threshold = 0.5)
      .orderBy("doc_old", "doc_new").collect().toSeq
    val pre = Dedup.ngramJaccardCrossPrefiltered(oldSide, newSide, bloom, threshold = 0.5)
      .orderBy("doc_old", "doc_new").collect().toSeq
    assert(pre == plain)
    assert(plain.nonEmpty, "fixture produced no cross pairs — test is vacuous")
  }

  test("prefiltered survivors equal the unfiltered survivors") {
    val plain = Dedup.incrementalSurvivors(oldSide, newSide, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    val pre = Dedup.incrementalSurvivorsPrefiltered(oldSide, newSide, bloom, threshold = 0.5)
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(pre == plain)
    assert(plain.nonEmpty)
  }

  test("bloom prunes a disjoint batch's shingles to ~fpp before any shuffle") {
    // a batch sharing nothing with the corpus: synthetic texts over tokens
    // that appear nowhere in the documents fixture
    val disjoint = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", (0 to 9).map(i =>
        concat(lit(s"zq${i}x"), (col("id") * 31 + i).cast("string"))): _*).as("text"))
    val exploded = disjoint.select(explode(Dedup.shingleHashes(col("text"), 3)).as("shingle"))
    val total = exploded.count()
    val admitted = exploded
      .filter(call_function("might_contain", lit(bloom.shingleBloom), col("shingle")))
      .count()
    assert(total > 1000, s"expected a real shingle volume, got $total")
    // fpp is 1%; allow 5% slack for hash clustering on a small filter
    assert(admitted <= total / 20,
      s"bloom admitted $admitted of $total disjoint shingles — not pruning")
  }

  test("save/load round-trips the fingerprint and preserves results") {
    val p = tmpDir("bloom").resolve("corpus.bloom")
    bloom.save(p)
    val loaded = CorpusBloom.load(p)
    assert(loaded.w == bloom.w && loaded.maxDocFreq == bloom.maxDocFreq &&
      loaded.fpp == bloom.fpp)
    assert(java.util.Arrays.equals(loaded.textBloom, bloom.textBloom))
    assert(java.util.Arrays.equals(loaded.shingleBloom, bloom.shingleBloom))
    val viaLoaded = Dedup.ngramJaccardCrossPrefiltered(oldSide, newSide, loaded, threshold = 0.5)
    val direct = Dedup.ngramJaccardCrossPrefiltered(oldSide, newSide, bloom, threshold = 0.5)
    assert(viaLoaded.orderBy("doc_old", "doc_new").collect().toSeq ==
      direct.orderBy("doc_old", "doc_new").collect().toSeq)
  }

  test("empty old corpus yields a valid bloom that admits nothing") {
    val empty = Dedup.corpusBloom(docs.filter(lit(false)))
    val probes = spark.range(1000).select(xxhash64(col("id")).as("h"))
    val admitted = probes
      .filter(call_function("might_contain", lit(empty.shingleBloom), col("h")))
      .count()
    assert(admitted == 0L, s"empty bloom admitted $admitted probes")
  }
}
