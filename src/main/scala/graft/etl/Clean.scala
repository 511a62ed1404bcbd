package graft.etl

import org.apache.spark.sql.DataFrame

/** The reference's "transform" stage: drop every row containing >=1 null
  * (`/root/reference/src/transform.py:5-7`, duplicated `api.py:54-57`).
  *
  * Faithful default is drop-any over ALL columns — on the reference's
  * shipped dataset (all-null `Message` column) this yields 0 rows, which is
  * the declared semantics (SURVEY §1.3). `subset` is the intent-mode escape
  * hatch: restrict the null check to meaningful columns.
  *
  * Scale: this is a narrow, whole-stage-codegen'd filter fused into the
  * scan — no shuffle, no materialization; null checks on scanned columns
  * push into the parquet/CSV reader where the source supports it.
  */
object Clean {
  def dropAnyNull(df: DataFrame): DataFrame = df.na.drop("any")

  def dropAnyNull(df: DataFrame, subset: Seq[String]): DataFrame =
    if (subset.isEmpty) df.na.drop("any") else df.na.drop("any", subset)

  /** pandas dropna(how="all") sibling, exposed for completeness. */
  def dropAllNull(df: DataFrame): DataFrame = df.na.drop("all")
}
