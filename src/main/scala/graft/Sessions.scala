package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction: one place for the scale-relevant
  * settings so Verify/Bench/tests all run the same engine config.
  */
object Sessions {
  /** Apply graft defaults to a builder. `cpus` sizes shuffle parallelism
    * to the actual cores (local mode) — on a real cluster this would be
    * executors×cores with AQE coalescing the excess.
    */
  def configure(b: SparkSession.Builder, cpus: String): SparkSession.Builder = b
    .withExtensions(graft.functions.GraftFunctions.register)
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // testdata parquet carries INT64 TIMESTAMP(NANOS) (pandas origin);
    // read as long nanos, converted in graft.ops.Tables.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.compression.codec", "snappy")
    .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def local(appName: String = "graft",
            cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cpus]").appName(appName), cpus)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
