package graft.tools

import graft.Sessions
import graft.ops.{Dedup, Similarity, Tables}
import org.apache.spark.sql.functions._

/** Scratch probe: measure v2/v4 recall vs v1 exact top-k and x2/x3
  * pair-recall vs x4 exact Jaccard on the sf0.001 fixture, to pin the
  * recall floors asserted in SimilaritySpec/DedupSpec. Not part of the
  * library surface.
  */
object ProbeRecall {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("probe-recall", cpus = "8")
    val sf = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    println(s"emb rows=${emb.count()} docs rows=${docs.count()}")

    val q = Similarity.querySet(emb, "vec_id", 10) // bigger sample than stride 50
    println(s"queries=${q.count()}")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, q, k = 10))
    val lsh = pairs(Similarity.lshTopK(emb, q, k = 10, nbits = 8))
    val ivf = pairs(Similarity.ivfTopK(emb, q, k = 10))
    println(s"v2 lsh recall = ${(exact & lsh).size.toDouble / exact.size} (|exact|=${exact.size}, |lsh|=${lsh.size})")
    println(s"v4 ivf recall = ${(exact & ivf).size.toDouble / exact.size} (|ivf|=${ivf.size})")

    def dpairs(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
      df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val xExact = dpairs(Dedup.ngramJaccard(docs, threshold = 0.6), "doc_a", "doc_b")
    val xMin = dpairs(Dedup.minhashLsh(docs, threshold = 0.5), "doc_a", "doc_b")
    val xSim = dpairs(Dedup.simhashNearDup(docs, maxDist = 8), "doc_a", "doc_b")
    println(s"x4 exact pairs = ${xExact.size}")
    println(s"x2 minhash recall of x4 = ${if (xExact.isEmpty) -1 else (xExact & xMin).size.toDouble / xExact.size} (|x2|=${xMin.size})")
    println(s"x3 simhash recall of x4 = ${if (xExact.isEmpty) -1 else (xExact & xSim).size.toDouble / xExact.size} (|x3|=${xSim.size})")

    // near-dup: new formulation vs inline old (vector-carrying) formulation
    val nd = Similarity.embeddingNearDup(emb, threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"v3 pairs at 0.9 on sf0.001 = ${nd.size}")
    val nd35 = Similarity.embeddingNearDup(emb, threshold = 0.35)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"v3 pairs at 0.35 on sf0.001 = ${nd35.size}")

    // planted clusters: 50 bases x 5 noisy copies, dim 64 — recall of
    // lsh/ivf on data WITH neighbor structure
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val planted = (0 until 50).flatMap { c =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      (0 until 5).map { i =>
        val v = base.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        ((c * 5 + i).toLong, v)
      }
    }.toDF("vec_id", "embedding")
    val pq = Similarity.querySet(planted, "vec_id", 5) // one per cluster
    val pExact = pairs(Similarity.bruteForceTopK(planted, pq, k = 4))
    for (nb <- Seq(4, 8, 12)) {
      val pl = pairs(Similarity.lshTopK(planted, pq, k = 4, nbits = nb))
      println(s"planted lsh nbits=$nb recall = ${(pExact & pl).size.toDouble / pExact.size}")
    }
    val pi = pairs(Similarity.ivfTopK(planted, pq, k = 4))
    println(s"planted ivf recall = ${(pExact & pi).size.toDouble / pExact.size}")
    val pnd = Similarity.embeddingNearDup(planted, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // true same-cluster pairs: 50 * C(5,2) = 500
    val truePairs = (0 until 50).flatMap { c =>
      val ids = (0 until 5).map(i => (c * 5 + i).toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    println(s"planted nearDup recall of true pairs = ${(truePairs & pnd).size.toDouble / truePairs.size} (|found|=${pnd.size})")
    spark.stop()
  }
}
