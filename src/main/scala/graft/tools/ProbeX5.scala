package graft.tools
import graft.Sessions
import graft.ops.{Dedup, Tables}
object ProbeX5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe-x5", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBEX5 $tag%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val pairs = time("pairs.checkpoint") {
      Dedup.ngramJaccard(docs, threshold = 0.5).localCheckpoint(true)
    }
    time("components")(Dedup.connectedComponents(pairs).count())
    time("resolve(full)")(Dedup.resolveDuplicates(docs, Dedup.ngramJaccard(docs, threshold = 0.5)).count())
    time("resolve(again)")(Dedup.resolveDuplicates(docs, Dedup.ngramJaccard(docs, threshold = 0.5)).count())
    spark.stop()
  }
}
