package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual salting fallback for
  * when AQE's skew-join split (enabled in [[graft.Sessions]]) can't help:
  * e.g. a single hot key inside one partition of a sort-merge join, or
  * pre-Spark-3 clusters.
  *
  * Technique: the skewed (big) side gets a random salt in [0, factor);
  * the other side is replicated `factor` times with every salt value.
  * The join key becomes (key, salt) — the hot key's rows spread across
  * `factor` reducers. Cost: `factor`× replication of the small side —
  * choose factor ≈ hot-key-rows / target-partition-rows.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side salted. The join
    * RESULT is independent of the salt assignment (every salt value meets
    * a replica of the small side), so the salt only needs to spread rows —
    * it is derived from a per-row unique id, no rand() in the plan.
    *
    * Only big-side-preserving join types are legal: a right/full outer
    * join would emit one row PER SALT REPLICA for unmatched small-side
    * keys (factor× duplicates) — rejected up front.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi",
        "leftanti", "anti", "cross").contains(normalized),
      s"saltedJoin supports big-side-preserving join types only, got $joinType")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-n heaviest keys of a frame — the diagnostic used to pick salting
    * candidates and factors. One aggregation pass. */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
}
