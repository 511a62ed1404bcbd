package graft

/** The x4 near-dup pair pipeline (shingle explode → df guard → pair
  * group-by) is the expensive pass of the dedup/split family. Its three
  * registered consumers — x5 cluster resolution, t9 leakage report,
  * t12 leakproof split — must all feed from ONE materialized pair table
  * ([[SparkEntry.stagedPairs]]), not re-run the explode per query: at
  * corpus scale the pair pass runs once per snapshot, the consumers are
  * cheap joins against its (small) output.
  */
class SharedPairsPlanSpec extends SparkSpec {

  test("x5/t9/t12 plans scan the materialized pair table — no shingle explode") {
    for (q <- Seq("x5_dup_resolve", "t9_leakage", "t12_leakproof_split")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Generate"),
        s"$q re-runs the shingle-explode pipeline instead of reading the pair table:\n$plan")
    }
  }

  test("the pair pipeline itself (x4) is the single explode pass, and staging equals it") {
    val x4 = SparkEntry.queries("x4_ngram_jaccard")(spark, sfDir)
    assert(x4.queryExecution.executedPlan.toString.contains("Generate"))
    // the staged table is exactly the x4 pair set (same rows, same values)
    val staged = SparkEntry.stagedPairs(spark, sfDir)
    assert(staged.exceptAll(x4).isEmpty && x4.exceptAll(staged).isEmpty)
  }
}
