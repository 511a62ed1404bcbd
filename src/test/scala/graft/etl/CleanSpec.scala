package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** F1: drop-any-null semantics (reference: /root/reference/src/transform.py:5-7),
  * including the all-null-column quirk (SURVEY §1.3). */
class CleanSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", StringType),
    StructField("msg", StringType)))

  private def frame(rows: Seq[(Integer, String, String)]) =
    spark.createDataFrame(
      rows.map { case (a, b, m) => Row(a, b, m) }.asJava, schema)

  test("F1: rows with any null are dropped") {
    val df = frame(Seq((1, "x", "m"), (null, "y", "m"), (2, null, "m"), (3, "z", null)))
    assert(Clean.dropAnyNull(df).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("F1 quirk: all-null column drops every row (shipped-data behavior)") {
    val df = frame(Seq((1, "x", null), (2, "y", null)))
    assert(Clean.dropAnyNull(df).count() == 0)
  }

  test("F1 subset: intent mode checks only meaningful columns") {
    val df = frame(Seq((1, "x", null), (null, "y", null)))
    assert(Clean.dropAnyNull(df, Seq("a", "b")).count() == 1)
  }

  test("dropAllNull keeps rows with any non-null") {
    val df = frame(Seq((1, null, null), (null, null, null)))
    assert(Clean.dropAllNull(df).count() == 1)
  }

  test("property: dropAnyNull ≡ filter(all columns not null), 100 random frames") {
    val rnd = new scala.util.Random(42)
    (1 to 100).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(20) + 1) {
        def cell[T](v: T): Option[T] = if (rnd.nextBoolean()) Some(v) else None
        (cell(rnd.nextInt(10)), cell(s"s${rnd.nextInt(10)}"), cell(s"m${rnd.nextInt(10)}"))
      }
      val df = spark.createDataFrame(
        rows.map { case (a, b, c) =>
          Row(a.map(Int.box).orNull, b.orNull, c.orNull)
        }.asJava, schema)
      val expected = rows.count { case (a, b, c) => a.isDefined && b.isDefined && c.isDefined }
      assert(Clean.dropAnyNull(df).count() == expected)
    }
  }
}
