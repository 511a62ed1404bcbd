package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Iterate, Multimodal, Similarity, Tables, TextStats}

/** CHURN probe (r17 verdict ask #6, NOT a registered query): the four
  * at-rest stores' add faces (tf segments t37/st27, positional
  * postings st31, IVF cells v26/st21, curation chunks c31) each
  * measure ONE add batch in the gated surface; a 100 TB user runs
  * hundreds. This probe applies k = 16 SEQUENTIAL add batches (the odd
  * half sliced 16 ways) to each store and prints the per-batch add
  * cost — the O(batch) claim holds iff the series is flat within box
  * noise (the base is never rescanned, so batch index must not
  * matter). For the tf store it also evaluates the t39 tiered merge
  * POLICY after every add: same-sized flush segments pile into one
  * tier, so the policy must trip at the mergeFactor-th add — and the
  * probe runs the c29 compaction on the flagged tier once, timing what
  * the policy's recommendation costs to act on. Results recorded in
  * BENCH_NOTES.md (round-18 churn table).
  */
object ProbeChurn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local("graft-probe-churn")
    import java.nio.file.Files
    val k = 16
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fmt(ts: Seq[Double]): String = ts.map(t => f"$t%.2f").mkString(" ")
    // untimed warmup (the Bench discipline)
    spark.range(1000000L).selectExpr("sum(id) AS s").collect()
    Tables.documents(spark, sfDir).count()

    val docs = Tables.documents(spark, sfDir)
    def docBatch(i: Int) = docs.filter(
      col("doc_id") % 2 === 1 && (col("doc_id") / 2) % k === i)

    // ---- 1) tf segment store (t37/st27): add = O(batch) segment build+flush
    val tfDir = Files.createTempDirectory("churn_tf").toString
    TextStats.indexSegment(docs.filter(col("doc_id") % 2 === 0))._1
      .write.parquet(s"$tfDir/base")
    val tfTimes = (0 until k).map { i =>
      time(TextStats.indexSegment(docBatch(i))._1.write.parquet(s"$tfDir/seg_$i"))
    }
    println(s"tf_add_secs: ${fmt(tfTimes)}")
    // t39 policy over (base + accumulated flush segments): per-segment
    // stats are O(|segments|) aggregate rows the store keeps anyway
    import spark.implicits._
    val segStats = ("base" +: (0 until k).map(i => s"seg_$i")).zipWithIndex.map {
      case (name, id) =>
        val r = spark.read.parquet(s"$tfDir/$name")
          .agg(countDistinct(col("doc_id")), count(lit(1))).head
        (id.toLong, r.getLong(0), r.getLong(1))
    }
    val firstTrip = (1 to k).find { n =>
      TextStats.mergePolicy(
        segStats.take(n + 1).toDF("seg_id", "n_docs", "n_postings"))
        .filter(col("merge_recommended")).limit(1).count() > 0
    }
    println(s"tf_merge_policy_first_trip_after_add: ${firstTrip.getOrElse(-1)}")
    firstTrip.foreach { n =>
      // act on the recommendation once: compact the flagged tier
      val flagged = TextStats.mergePolicy(
          segStats.take(n + 1).toDF("seg_id", "n_docs", "n_postings"))
        .filter(col("merge_recommended")).select("seg_id")
        .collect().map(_.getLong(0)).toSet
      val names = ("base" +: (0 until k).map(i => s"seg_$i")).zipWithIndex
        .collect { case (nm, id) if flagged.contains(id.toLong) => nm }
      val cSec = time(TextStats.compactSegments(
          names.map(nm => spark.read.parquet(s"$tfDir/$nm")))
        .write.parquet(s"$tfDir/compacted"))
      println(f"tf_compact_flagged_tier_secs: $cSec%.2f (${names.length} segments)")
    }

    // ---- 2) positional postings store (st31): add = map-only posexplode flush
    val posDir = Files.createTempDirectory("churn_pos").toString
    TextStats.positionalSegment(docs.filter(col("doc_id") % 2 === 0))
      .write.parquet(s"$posDir/base")
    val posTimes = (0 until k).map { i =>
      time(TextStats.positionalSegment(docBatch(i)).write.parquet(s"$posDir/seg_$i"))
    }
    println(s"pos_add_secs: ${fmt(posTimes)}")

    // ---- 3) IVF cell store (v26/st21): add = assign batch to staged codebook
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") % 2 === 0)
    val cb = Iterate.materialize(Similarity.trainIvfCodebook(corpus, cells = 16, iters = 3))
    val ivfTimes = (0 until k).map { i =>
      time(Similarity.assignCells(
          emb.filter(col("vec_id") % 2 === 1 && (col("vec_id") / 2) % k === i), cb)
        .groupBy("cell").agg(count(lit(1)).as("n")).collect())
    }
    println(s"ivf_add_secs: ${fmt(ivfTimes)}")

    // ---- 4) curation chunk store (c31): add = decode+hash+chunk-explode flush
    val curDir = Files.createTempDirectory("churn_cur").toString
    val imgs = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val curTimes = (0 until k).map { i =>
      time(Multimodal.imageCurationIndexChunked(
          imgs.filter(col("media_id") % 2 === 1 && (col("media_id") / 2) % k === i))
        .write.parquet(s"$curDir/seg_$i"))
    }
    println(s"cur_add_secs: ${fmt(curTimes)}")

    spark.stop()
  }
}
