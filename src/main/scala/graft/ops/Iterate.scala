package graft.ops

import org.apache.spark.sql.DataFrame

/** Materialization helper for iterative DataFrame loops (connected
  * components, Lloyd's codebook training).
  *
  * `localCheckpoint(eager = true)` alone is NOT enough to make a loop
  * scale-safe on Spark 4: `LogicalRDD.fromDataset` rewrites the SOURCE
  * plan's statistics onto the checkpoint node, and the size-only stats
  * visitor estimates a join as the PRODUCT of its children's sizes. In a
  * loop, round k's checkpointed estimate therefore multiplies round
  * k-1's — double-exponential growth. Past ~12 rounds the BigInt
  * estimate has millions of digits: stats computation (driver-side, per
  * checkpoint) takes minutes of Toom-Cook BigInteger multiplication and
  * finally throws "BigInteger would overflow supported range". Observed
  * on the sf1 scale run, where the dup-pair graph's diameter pushed the
  * CC loop past the cliff; fixture scales converge in fewer rounds and
  * never showed it.
  *
  * The fix: after materializing, re-wrap the checkpointed RDD in a fresh
  * DataFrame. The new LogicalRDD carries NO inherited estimate (it
  * reports the session default), so per-round stats stay constant. The
  * row conversion this adds is per-loop-table row — the pair graph /
  * centroid tables, orders of magnitude smaller than the corpus.
  */
object Iterate {
  def materialize(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(eager = true)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** [[materialize]] that PRESERVES the physical partitioning (and pays
    * the stats caveat above by NOT re-wrapping — use only OUTSIDE
    * unbounded loops, for tables checkpointed ONCE and re-joined many
    * times). `localCheckpoint` propagates the source plan's
    * outputPartitioning onto the LogicalRDD, so a table shuffled onto
    * its join key before this call joins WITHOUT re-exchange in every
    * later iteration — the n10 edge table's shape: exchange edges once,
    * then only the O(nodes) rank side moves per round. The createDataFrame
    * re-wrap in [[materialize]] would erase exactly that property.
    *
    * AQE must be OFF while the checkpoint plans: under an
    * AdaptiveSparkPlan the LogicalRDD records UnknownPartitioning(0)
    * (measured on the n2/n10 plans — every "partition-preserving"
    * checkpoint was silently re-exchanged by its consumers), because the
    * adaptive wrapper cannot expose a concrete partitioning at the time
    * the RDD is captured. Disabling AQE for just this plan pins the
    * explicit repartition width (spark.sql.shuffle.partitions — already
    * sized to the session's cores) and the downstream queries still run
    * WITH AQE, now seeing the real hashpartitioning and planning
    * exchange-free joins against it.
    */
  def materializePartitioned(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try df.localCheckpoint(eager = true)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
