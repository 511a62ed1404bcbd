package graft.tools

import graft.Sessions
import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.functions._

/** Isolated x3 profiling. */
object ProbeX3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe-x3", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir)

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    time("simhash only")(sh.count())
    val chunked = sh.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => call_function("shiftright", col("sh"), i * 16).bitwiseAND(0xFFFFL)))
        .as(Seq("chunk", "ckey")))
    time("chunked")(chunked.count())
    val capped = chunked
      .withColumn("bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("chunk", "ckey")))
      .filter(col("bsz") <= 256).drop("bsz")
    time("capped")(capped.count())
    val cands = capped.select(col("chunk"), col("ckey"), col("doc_id").as("doc_a"))
      .join(capped.select(col("chunk"), col("ckey"), col("doc_id").as("doc_b")),
            Seq("chunk", "ckey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    time("raw pairs")(cands.count())
    time("distinct pairs")(cands.distinct().count())
    time("x3 full")(Dedup.simhashNearDup(docs, maxDist = 16).count())
    spark.stop()
  }
}
