package graft.tools
import graft.Sessions
import graft.ops.{Tables, TextStats}
object ProbeC4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local("graft-probe-c4", "8")
    val df = TextStats.packChunks(TextStats.chunk(Tables.documents(spark, sfDir)))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println("PROBEC4 reused=" + "ReusedExchange|ReusedQueryStage|StageReuse".r.findAllIn(plan).length
      + " scans=" + "Scan parquet".r.findAllIn(plan).length)
    spark.stop()
  }
}
