package graft

import graft.etl.{Clean, Ingest, Load, Pipeline, Synthetic}
import graft.serve.{Queries, Runs}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.concurrent.ExecutionContext

/** Single entry point — the reference's complete user-facing surface
  * (`/root/reference/README.md` CLI flow + `api.py` endpoints), one method
  * per capability, so a user of the reference can switch 1:1:
  *
  * {{{
  * val spark = Graft.session()
  * Graft.runPipeline(spark, Pipeline.PipelineConfig(csvPath = "data/raw"))
  * Graft.preview(spark, "products")                       // GET /api/data/preview
  * Graft.stats(spark, "products")                         // GET /api/data/stats
  * Graft.listFiles(spark, "data/raw")                     // GET /api/files/list
  * val reg = Graft.registry(spark)                        // POST /api/pipeline/run …
  * }}}
  */
object Graft {

  /** Preconfigured local session (shuffle partitions = cores, AQE on,
    * graft expressions registered). On a cluster, pass your own builder
    * through [[Sessions.configure]] instead. */
  def session(appName: String = "graft"): SparkSession = Sessions.local(appName)

  // ---- ETL (flows/pipeline.py) ----

  /** Synchronous ingest → clean → load with per-stage counts (E1). */
  def runPipeline(spark: SparkSession, config: Pipeline.PipelineConfig): Pipeline.PipelineResult =
    Pipeline.run(spark, config)

  /** The individual stages, composable as one lazy plan. */
  def ingest(spark: SparkSession, path: String, strict: Boolean = false): DataFrame =
    Ingest.ingest(spark, path, strict)
  def clean(df: DataFrame, subset: Seq[String] = Seq.empty): DataFrame =
    Clean.dropAnyNull(df, subset)
  def load(df: DataFrame, path: String): Unit = Load.replaceParquet(df, path)

  // ---- Serving (api.py) ----

  def preview(spark: SparkSession, table: String, limit: Int = 10): DataFrame =
    Queries.preview(spark, table, limit)
  def stats(spark: SparkSession, table: String): Queries.TableStats =
    Queries.stats(spark, table)
  def listFiles(spark: SparkSession, directory: String): DataFrame =
    Ingest.listCsvFiles(spark, directory)

  /** Background-run registry (POST /api/pipeline/run, GET status/runs,
    * DELETE runs). */
  def registry(spark: SparkSession)(implicit ec: ExecutionContext): Runs.Registry =
    new Runs.Registry(spark)

  /** Startup hook (api.py:589-607): generate the synthetic products CSV
    * if absent. */
  def ensureSampleData(spark: SparkSession, path: String): Unit =
    Synthetic.ensureProductsCsv(spark, path)
}
