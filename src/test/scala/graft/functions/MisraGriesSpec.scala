package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two-pass heavy hitters: the sketch's superset guarantee under forced
  * eviction, and exactness/order-independence of the final answer.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.TextStats

  // 20k tokens: hot1 5%, hot2 2%, remainder spread over ~2000 cold terms
  // (far more distinct terms than sketch capacity → evictions happen in
  // every partial buffer)
  private lazy val docs = {
    val rnd = new scala.util.Random(42)
    val tokens = Seq.tabulate(20000) { i =>
      if (i % 20 == 0) "hot1"
      else if (i % 50 == 1) "hot2"
      else s"cold${rnd.nextInt(2000)}"
    }
    tokens.grouped(50).zipWithIndex
      .map { case (t, i) => (i.toLong, t.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
  }

  private def exact(phi: Double) = {
    val terms = docs.select(explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val total = terms.count()
    terms.groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") >= math.ceil(phi * total).toLong)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
  }

  test("heavyHitters is exact despite sketch eviction, for any partitioning") {
    val expected = exact(0.01)
    assert(expected.map(_._1) == Set("hot1", "hot2")) // planted heavies only
    for (parts <- Seq(1, 3, 17)) {
      val got = TextStats.heavyHitters(docs.repartition(parts), phi = 0.01, capacity = 128)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
      assert(got == expected, s"parts=$parts: $got != $expected")
    }
  }

  test("sketch candidates form a superset of every term above n/capacity") {
    val terms = docs.select(explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val total = terms.count()
    val capacity = 128
    val candidates = terms.repartition(5)
      .agg(call_function("misra_gries", col("term"), lit(capacity)).as("s"))
      .select(explode(col("s")).as("e")).select(col("e.term"))
      .collect().map(_.getString(0)).toSet
    assert(candidates.size <= capacity)
    val mustSurvive = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") > total.toDouble / capacity)
      .collect().map(_.getString(0)).toSet
    assert(mustSurvive.subsetOf(candidates),
      s"missing: ${mustSurvive -- candidates}")
  }

  test("property: merged sketch counters obey the n/capacity error bound under any partitioning") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val streams = for {
      alphabet <- Gen.choose(51, 300) // cold range below is 50..alphabet-1
      n <- Gen.choose(200, 2000)
      // Zipf-ish skew: low ids drawn far more often
      items <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(0, 9)), (3, Gen.choose(10, 49)), (1, Gen.choose(50, alphabet - 1))))
      nParts <- Gen.choose(1, 8)
    } yield (items.map(i => s"t$i"), nParts)
    val capacity = 32
    val prop = Prop.forAll(streams) { case (items, nParts) =>
      val parts = items.grouped(math.max(1, items.size / nParts)).toSeq
      val bufs = parts.map { p =>
        val b = new MGBuffer(capacity); p.foreach(b.add(_, 1L)); b
      }
      val merged = bufs.reduce { (a, b) => b.foreach(a.addMerged); a.truncate(); a }
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = items.size.toDouble / capacity
      val surviving = {
        val m = scala.collection.mutable.Map.empty[String, Long]
        merged.foreach((t, c) => m(t) = c)
        m.toMap
      }
      // every counter is a lower bound within n/capacity of the truth
      val counterOk = surviving.forall { case (t, c) =>
        c <= truth(t) && truth(t) - c <= bound + 1e-9
      }
      // every item above the bound survives
      val supersetOk = truth.forall { case (t, n) =>
        n <= bound || surviving.contains(t)
      }
      counterOk && supersetOk && surviving.size <= capacity
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("capacity <= 1/phi is rejected — the guarantee would not hold") {
    intercept[IllegalArgumentException] {
      TextStats.heavyHitters(docs, phi = 0.01, capacity = 100)
    }
  }
}
