package graft.tools
import graft.Sessions
import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.functions._
object ProbeX4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe-x4", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBEX4 $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val sh = docs.select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .withColumn("n_sh", size(col("sh")).cast("long"))
    val exploded = sh.select(explode(col("sh")).as("shingle"), col("doc_id"))
    time("exploded")(exploded.count())
    val rare = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= 64).select("shingle")
    time("rare shingles")(rare.count())
    val grouped = exploded.join(rare, Seq("shingle"), "left_semi")
      .groupBy("shingle").agg(collect_list(col("doc_id")).as("docs"))
      .select(array_sort(col("docs")).as("docs"))
    time("grouped")(grouped.count())
    val pairs = grouped.select(explode(call_function("pair_longs", col("docs"))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
    time("pairs (pre-agg)")(pairs.count())
    val agg = pairs.groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
    time("pair agg")(agg.count())
    time("x4 full")(Dedup.ngramJaccard(docs, threshold = 0.5).count())
    time("x4 full again")(Dedup.ngramJaccard(docs, threshold = 0.5).count())
    spark.stop()
  }
}
