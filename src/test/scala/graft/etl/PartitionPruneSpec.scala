package graft.etl

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The k5 contract: a hive-partitioned layout turns an equality filter
  * on the partition column into DIRECTORY pruning — the scan's file list
  * shrinks to the matching partition before any parquet footer is read,
  * the property that makes per-tenant / per-language scans O(slice) on a
  * 100 TB table.
  */
class PartitionPruneSpec extends SparkSpec {

  test("partitioned write prunes to one directory; pruned read == plain filtered scan") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "source")
    val base = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_test_partprune"
    Load.replaceParquetPartitioned(docs, base, Seq("lang"))

    val pruned = spark.read.parquet(base).filter(col("lang") === "en")
    // the plan carries the predicate as a PartitionFilter, not a data filter
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("lang"),
      s"expected partition filters in:\n$planStr")

    // the EXECUTED scan's selected files all live under the lang=en
    // directory (DataFrame.inputFiles lists pre-prune, so go to the
    // FileSourceScanExec's post-prune listing)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    val files = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"pruned scan must touch only lang=en files: ${files.mkString(", ")}")
    assert(spark.read.parquet(base).inputFiles.exists(!_.contains("lang=en")),
      "unpruned listing must span other languages, or the prune check is vacuous")

    // full partition listing covers every language directory
    val all = spark.read.parquet(base)
    assert(all.select("lang").distinct().count() ==
      docs.select("lang").distinct().count())

    // parity row for row with the unpartitioned filtered source
    val got = pruned.select("doc_id", "lang", "source").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val want = docs.filter(col("lang") === "en").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
