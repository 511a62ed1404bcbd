package graft.tools

import graft.Sessions
import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (dev-only diagnostics). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir)

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("docs.count")(docs.count())
    val sh = docs.select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
    time("shingle_hashes")(sh.select(explode(col("sh"))).count())
    time("x4 full (t=0.5)")(Dedup.ngramJaccard(docs, threshold = 0.5).count())
    time("x2 full")(Dedup.minhashLsh(docs).count())
    time("x3 full")(Dedup.simhashNearDup(docs, maxDist = 16).count())
    val x4 = Dedup.ngramJaccard(docs, threshold = 0.5)
    val plan = x4.queryExecution.executedPlan.toString
    println("PROBE x4 ReusedExchange: " + "ReusedExchange".r.findAllIn(plan).length +
      "  Exchanges: " + "Exchange".r.findAllIn(plan).length +
      "  Generates: " + "Generate".r.findAllIn(plan).length)
    spark.stop()
  }
}
