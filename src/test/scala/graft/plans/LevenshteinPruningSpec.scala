package graft.plans

import graft.SparkSpec
import graft.ops.{Tables, TextStats}
import org.apache.spark.sql.functions._

/** The levenshtein length-bound rule: bound injected, results unchanged,
  * fixpoint stable.
  */
class LevenshteinPruningSpec extends SparkSpec {
  import spark.implicits._

  test("rule injects the length bound into a fuzzy join condition, once") {
    val lp = TextStats.fuzzyTermPairs(Tables.documents(spark, sfDir))
      .queryExecution.optimizedPlan
    val conds = lp.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join if j.condition.isDefined =>
        j.condition.get.toString
    }
    val withBound = conds.filter(c => c.contains("levenshtein"))
    assert(withBound.nonEmpty, s"no levenshtein join found:\n$lp")
    withBound.foreach { c =>
      // exactly one injected abs(length-diff) bound per lev predicate —
      // a second application must not stack another
      assert("abs\\(\\(length".r.findAllIn(c).length == 1, c)
    }
  }

  test("results are unchanged by the rewrite (bound is implied, not restrictive)") {
    val docs = Seq(
      (1L, "kitten sitting mitten bitten kitte"),
      (2L, "kitten kitten setting sittin biting")).toDF("doc_id", "text")
    val got = TextStats.fuzzyTermPairs(docs, maxVocab = 100, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // brute-force expectation computed in Scala
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").distinct().collect().map(_.getString(0))
    val expected = (for {
      a <- vocab; b <- vocab if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got == expected)
  }
}
