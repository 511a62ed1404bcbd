package graft.etl

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The s10 contract: a landing directory written by two pipeline
  * versions with different column sets reads back under the UNION
  * schema with null padding — and column pruning still reaches the
  * per-file parquet scans.
  */
class MergeSchemaSpec extends SparkSpec {

  test("mergeSchema read: union schema, null padding, pruning still applies") {
    val docs = Tables.documents(spark, sfDir)
    val dir = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_test_mergeschema"
    docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
      .write.mode("overwrite").parquet(dir)
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("append").parquet(dir)

    val merged = Ingest.parquetMerged(spark, dir)
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "lang", "source", "n_chars"))

    // null padding follows the writing version
    val rows = merged.select("doc_id", "lang", "source", "n_chars").collect()
    assert(rows.nonEmpty && rows.forall { r =>
      if (r.getLong(0) % 2 == 0) !r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)
      else r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3)
    })
    assert(merged.count() == docs.count())

    // projection of one column still prunes the read schema per file
    val pruned = merged.select("doc_id")
    val scanStr = pruned.queryExecution.executedPlan.toString
    assert(scanStr.contains("ReadSchema") && !scanStr.contains("n_chars"),
      s"single-column projection must not read n_chars:\n$scanStr")
  }
}
