package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: isolate WHY a query anti-scales with core count by timing
  * it across a (local[threads], spark.sql.shuffle.partitions) matrix.
  * The driver's PERF_r18 scaling table showed iterative/streaming
  * queries 3-10x SLOWER at 32 cores than at 8; this separates "more
  * threads hurt" from "more shuffle partitions hurt".
  *
  * SPARK_GRAFT_COMBOS = "32:32,32:8,8:8" (threads:partitions)
  * SPARK_GRAFT_ONLY   = comma-separated query names (required)
  * SPARK_GRAFT_REPS   = timings per combo (default 2; min is printed)
  */
object ProbeScaling {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val combos = sys.env.getOrElse("SPARK_GRAFT_COMBOS", "32:32,32:8,8:8")
      .split(',').toSeq.map { c => val Array(t, p) = c.split(':'); (t, p) }
    val names = sys.env("SPARK_GRAFT_ONLY").split(',').toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    for ((threads, parts) <- combos) {
      val eventDir = sys.env.get("SPARK_GRAFT_EVENTLOG")
      eventDir.foreach(d => new java.io.File(d).mkdirs())
      val b0 = graft.Sessions.configure(
        SparkSession.builder().master(s"local[$threads]").appName(s"graft-probe-$threads-$parts"),
        parts)
      val spark = eventDir.fold(b0)(d =>
        b0.config("spark.eventLog.enabled", "true").config("spark.eventLog.dir", d))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.range(1000000L).selectExpr("sum(id) AS s").collect()
      graft.ops.Tables.documents(spark, sfDir).count()
      for (name <- names) {
        val fn = graft.SparkEntry.queries(name)
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE threads=$threads%-3s parts=$parts%-3s $name%-30s min=${ts.min}%7.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
