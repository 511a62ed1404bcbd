package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, TimestampNTZType}

/** Loader for the driver testdata tables (`/root/repo/TESTDATA.md`).
  *
  * The parquet files carry nanosecond-precision INT64 timestamps (pandas
  * origin). Spark has no nanosecond TimestampType; sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[graft.Sessions]]) so
  * the scan yields LongType nanos, and this loader converts to micros
  * (`timestamp_micros(ns div 1000)`) — identical to the truncation DuckDB
  * applies when reading the same files, keeping oracle parity.
  */
object Tables {
  /** Columns that are nano-timestamps in the source data, per table. */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    tsColumns.getOrElse(name, Seq.empty).foldLeft(df) { (d, c) =>
      d.schema.find(_.name == c) match {
        case Some(StructField(_, LongType, _, _)) =>
          // integer `div`, NOT `/`: double division would lose precision
          // above 2^53 (ns epochs are ~1.7e18)
          d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
        case Some(StructField(_, TimestampNTZType, _, _)) =>
          // micros NTZ (pandas origin): reinterpret as UTC instant —
          // session TZ is UTC so the wall-clock fields are preserved
          d.withColumn(c, col(c).cast("timestamp"))
        case _ => d // already a timestamp (or absent) — leave as is
      }
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
