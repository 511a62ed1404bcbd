package graft.tools

import graft.Sessions

/** Dev-only: min-of-3 quiet timing for the iterative graph gates. */
object ProbeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-probe-graph", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id) AS s").collect()
    graft.ops.Tables.lineitem(spark, sfDir).count()
    def quiet(tag: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag%-18s min=${ts.min}%6.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    quiet("n1_part_pagerank")(graft.ops.Graph.partPageRank(spark, sfDir).count())
    quiet("n2_triangles")(graft.ops.Graph.partTriangles(spark, sfDir).count())
    spark.stop()
  }
}
