package graft.tools

import graft.{Sessions, SparkEntry}

/** Dev-only: quiet min-of-3 timing of the st* streaming twins at an
  * arbitrary sf dir — the round-12 sf1 state-store-axis measurement
  * (the batch oracles ran at sf1 in round 11; the streaming twins had
  * only ever run at sf0.1).
  */
object ProbeStreams {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local("graft-probe-streams", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id) AS s").collect()
    graft.ops.Tables.events(spark, sfDir).count()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val st = SparkEntry.queries.keys.filter(_.startsWith("st"))
      .filter(n => only.forall(_(n))).toSeq.sorted
    st.foreach { name =>
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).count()
        catch { case e: Throwable => println(s"PROBE $name FAILED: ${e.getMessage}"); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-24s min=${ts.min}%7.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
