package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving queries of `/root/reference/api.py`: preview (L1), stats
  * (A1+A3), table-exists (M1), schema introspection (M2).
  *
  * Preview compiles to CollectLimitExec — Spark fetches at most `limit`
  * rows from the first non-empty partitions, never a full scan; count is
  * a partial/final count aggregate with no row movement beyond one long
  * per partition. Both shapes are cluster-safe at any data size.
  */
object Queries {
  final class TableNotFound(t: String)
      extends RuntimeException(s"Table '$t' not found")

  private def resolve(spark: SparkSession, table: String): DataFrame = {
    if (!spark.catalog.tableExists(table)) throw new TableNotFound(table)
    spark.table(table)
  }

  /** Parameter validation for the preview contract — deliberate HARDENING
    * over the reference, not parity: api.py:170's plain `limit: int = 10`
    * has no ge=1 constraint, so the reference returns 200/empty for
    * limit=0, ALL rows for negative limits (SQLite `LIMIT -1`), and 422
    * for non-integers. Unbounded negative limits are arguably a reference
    * bug; here non-positive limits are rejected (→ HTTP 400 via HttpApi)
    * before any Spark work.
    */
  def requireValidLimit(limit: Int): Unit =
    require(limit >= 1, s"limit must be >= 1, got $limit")

  /** L1: SELECT * FROM t LIMIT n (api.py:189-198), default 10. */
  def preview(spark: SparkSession, table: String, limit: Int = 10): DataFrame =
    resolve(spark, table).limit(limit)

  /** A1+A3: {total_records, columns_count, columns} (api.py:227-242). */
  final case class TableStats(totalRecords: Long, columnsCount: Int,
                              columns: Seq[String], tableName: String)
  def stats(spark: SparkSession, table: String): TableStats = {
    val df = resolve(spark, table)
    TableStats(df.count(), df.schema.size, df.schema.fieldNames.toSeq, table)
  }

  /** Stats as a one-row DataFrame (oracle-friendly shape). */
  def statsDf(spark: SparkSession, df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("total_records"),
           lit(df.schema.size).cast("long").as("columns_count"))

  /** M2: ordered column names (api.py:192-193,230-232) — metadata only. */
  def columns(spark: SparkSession, table: String): Seq[String] =
    resolve(spark, table).schema.fieldNames.toSeq
}
