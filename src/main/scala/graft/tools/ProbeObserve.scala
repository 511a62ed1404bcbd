package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: can Dataset.observe metrics be read back after an eager
  * localCheckpoint, without a second job? If yes, every iterative
  * loop's convergence probe (compSum / count) can ride the round's own
  * materialization job instead of being a separate action.
  */
object ProbeObserve {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("graft-probe-observe", "4")
    val df = spark.range(1000L).selectExpr("id AS v", "id * 2 AS comp")
      .observe("probe", sum(col("comp")).as("s"), count(lit(1)).as("n"))
    val cp = df.localCheckpoint(eager = true,
      storageLevel = graft.ops.Iterate.CheckpointLevel)
    println("observed (cp.qe): " + cp.queryExecution.observedMetrics)
    println("observed (df.qe): " + df.queryExecution.observedMetrics)
    // and: does a coalesce-wrapped rewrap see them too?
    spark.stop()
  }
}
