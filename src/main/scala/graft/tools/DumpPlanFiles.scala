package graft.tools

import graft.{Sessions, SparkEntry}
import java.nio.file.{Files, Paths}

/** Dump per-query formatted physical plans to individual files —
  * the `plans/r19/<query>_{before,after}.txt` evidence artifacts.
  *
  * SPARK_GRAFT_PLANQ   comma-separated query names (required)
  * SPARK_GRAFT_PLANDIR output directory (required)
  * SPARK_GRAFT_PLANSUF file suffix, e.g. "_after" (default "")
  */
object DumpPlanFiles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val names = sys.env("SPARK_GRAFT_PLANQ").split(',').toSeq
    val outDir = Paths.get(sys.env("SPARK_GRAFT_PLANDIR"))
    val suf = sys.env.getOrElse("SPARK_GRAFT_PLANSUF", "")
    Files.createDirectories(outDir)
    val spark = Sessions.local("graft-plan-files")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        // bloom-filter literals print as megabytes of hex — squash runs,
        // keeping a recognizable prefix (the plan SHAPE is the evidence)
        .replaceAll("0x[0-9A-Fa-f]{64}[0-9A-Fa-f]*",
          "0x<bloom-literal-squashed>")
      Files.writeString(outDir.resolve(s"$name$suf.txt"),
        s"## $name\n\n```\n$plan```\n")
      println(s"PLAN $name -> $outDir/$name$suf.txt")
    }
    spark.stop()
  }
}
