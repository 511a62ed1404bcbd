package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for `x10_emb_dup_scale` — the at-scale semantic-dedup
  * composition (LSH candidate pairs → exact-cosine verification →
  * pointer-jumping connected components) that replaces x9's bounded
  * all-pairs baseline on a full corpus.
  *
  * Three properties make the scale path trustworthy without an oracle:
  *  1. REFINEMENT — every LSH-recovered pair is exact-verified, so the
  *     pair set is a subset of x9's and the clustering can only split
  *     x9 clusters, never merge across them. Checked at both fixture
  *     scales against the exact pipeline on the same data.
  *  2. RECALL FLOOR on recovered >= 0.42 pairs at sf0.001 and sf0.1 —
  *     the fixtures are near-orthogonal (threshold-tail pairs, the
  *     sign-LSH worst case; see ScaleRecallSpec), so these floors pin
  *     the hard regime. Deterministic generators: a drop is a code
  *     change, not noise.
  *  3. PLANTED CLUSTERS — high-similarity near-dups (the regime real
  *     semantic dedup operates in) must be recovered and co-clustered
  *     with recall 1.0.
  */
class ScaleDedupSpec extends SparkSpec {
  import spark.implicits._

  private def clusters(emb: DataFrame, exact: Boolean): DataFrame = {
    val pairs = (if (exact) Similarity.embeddingNearDupExact(emb, 0.42)
                 else Similarity.embeddingNearDup(emb, threshold = 0.42,
                        corpusCount = Some(emb.count())))
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    Dedup.resolveDuplicates(emb.select(col("vec_id")), pairs, "vec_id")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("x10 refines x9: every LSH cluster is contained in one exact cluster") {
    val emb = Tables.embeddings(spark, sfDir)
    val lsh = clusters(emb, exact = false)
      .select(col("vec_id"), col("component").as("lsh_comp"))
    val ex = clusters(emb, exact = true)
      .select(col("vec_id"), col("component").as("exact_comp"))
    val crossing = lsh.join(ex, "vec_id")
      .groupBy("lsh_comp").agg(countDistinct("exact_comp").as("n_exact"))
      .filter(col("n_exact") > 1)
    assert(crossing.count() == 0,
      "an LSH cluster crossed two exact clusters — verification must prevent this")
  }

  test("x10 pair recall floor at sf0.001 (threshold-tail regime)") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = pairSet(Similarity.embeddingNearDupExact(emb, 0.42))
    val lsh = pairSet(Similarity.embeddingNearDup(emb, threshold = 0.42,
      corpusCount = Some(emb.count())))
    assert(lsh.subsetOf(exact), "LSH pairs must be exact-verified (subset)")
    val recall = if (exact.isEmpty) 1.0 else (exact & lsh).size.toDouble / exact.size
    info(s"sf0.001 pair recall = $recall (${lsh.size}/${exact.size})")
    assert(recall >= 0.05, s"pair recall $recall collapsed — candidate generation broken")
  }

  test("x10 pair recall floor at sf0.1 (bench scale, auto-sized sketch)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val exact = pairSet(Similarity.embeddingNearDupExact(emb, 0.42))
    val lsh = pairSet(Similarity.embeddingNearDup(emb, threshold = 0.42,
      corpusCount = Some(emb.count())))
    assert(lsh.subsetOf(exact), "LSH pairs must be exact-verified (subset)")
    val recall = if (exact.isEmpty) 1.0 else (exact & lsh).size.toDouble / exact.size
    info(s"sf0.1 pair recall = $recall (${lsh.size}/${exact.size})")
    assert(recall >= 0.05, s"pair recall $recall collapsed — candidate generation broken")
  }

  test("x10 recovers planted high-sim clusters with recall 1.0") {
    // three tight clusters of four vectors each (base + tiny rotations,
    // sim > 0.99) in 8-d, plus noise vectors far from everything
    val base = Seq(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    val rows = base.zipWithIndex.flatMap { case (b, ci) =>
      (0 until 4).map { j =>
        val v = b.clone(); v((ci + 3) % 8) = 0.01f * (j + 1)
        ((ci * 4 + j).toLong, v, ci)
      }
    } ++ (12 until 24).map { i =>
      val v = new Array[Float](8); v(3 + (i % 5)) = 1f
      (i.toLong, v, -1)
    }
    val emb = rows.toDF("vec_id", "embedding", "cluster")
    val got = clusters(emb.select("vec_id", "embedding"), exact = false)
      .select(col("vec_id"), col("component"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (ci <- 0 until 3; j <- 0 until 4)
      assert(got((ci * 4 + j).toLong) == got((ci * 4).toLong),
        s"planted cluster $ci member $j not co-clustered")
    assert(Set(got(0L), got(4L), got(8L)).size == 3,
      "distinct planted clusters must stay distinct")
  }
}
