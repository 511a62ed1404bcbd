package graft.tools

import graft.Sessions
import graft.ops.{Graph, Tables}

/** Scratch profiler for operator stages (dev-only diagnostics). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warm
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).count()

    time("n1 broadcast walk")(Graph.partPageRank(spark, sfDir).count())
    time("n10 shuffle walk")(Graph.partPageRankShuffle(spark, sfDir).count())
    val plan = Graph.partPageRankShuffle(spark, sfDir)
      .queryExecution.executedPlan.toString
    println("PROBE n10 Exchanges: " + "Exchange hashpartitioning".r.findAllIn(plan).length +
      "  ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).length +
      "  Scans over checkpointed edges: " + "Scan ExistingRDD".r.findAllIn(plan).length)
    spark.stop()
  }
}
