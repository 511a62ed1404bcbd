package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join: union + carry-forward formulation. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof picks the latest right row at-or-before the left time, per key") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 7L, ts("2024-01-01 09:00:00")), // before any right row
      (4L, 8L, ts("2024-01-01 12:00:00"))  // key with single right row
    ).toDF("event_id", "k", "t")
    val right = Seq(
      (7L, ts("2024-01-01 09:30:00"), 100L),
      (7L, ts("2024-01-01 10:00:00"), 200L), // equal time: inclusive match
      (7L, ts("2024-01-01 11:00:00"), 300L),
      (8L, ts("2024-01-01 00:00:00"), 900L)
    ).toDF("rk", "rt", "payload")
    val out = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", "payload")
      .orderBy("event_id").collect()
    val got = out.map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, Some(200L)), // 10:00 matches the 10:00 right row (inclusive)
      (2L, Some(300L)), // latest before 12:00
      (3L, None),       // nothing at or before 09:00
      (4L, Some(900L))))
  }

  test("asofJoinWithin: tolerance nulls stale matches, keeps fresh ones with their age") {
    import spark.implicits._
    // numeric (micros) times; tolerance 60s
    val left = Seq(
      (1L, 7L, 1000000000L),  // 10s after the 990s right row → fresh
      (2L, 7L, 2000000000L),  // 1010s after → stale, nulls out
      (3L, 7L, 990000000L),   // exact tie → age 0, fresh
      (4L, 9L, 500000000L)    // no right row at all
    ).toDF("event_id", "k", "t")
    val right = Seq((7L, 990000000L, 42L)).toDF("rk", "rt", "payload")
    val out = AsOf.asofJoinWithin(left, right, "k", "rk", "t", "rt", "payload", 60000000L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (1L, Some(42L), Some(10000000L)),
      (2L, None, None),
      (3L, Some(42L), Some(0L)),
      (4L, None, None)))
    // infinite-ish tolerance degrades to the plain as-of join's payloads
    val wide = AsOf.asofJoinWithin(left, right, "k", "rk", "t", "rt", "payload", Long.MaxValue / 2)
      .orderBy("event_id").collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    val plain = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", "payload")
      .orderBy("event_id").collect().map(r => Option(r.get(3)).map(_.asInstanceOf[Long]))
    assert(wide.toSeq == plain.toSeq)
  }

  test("eventsWithLastOrder covers every event exactly once") {
    val out = AsOf.eventsWithLastOrder(spark, sfDir)
    assert(out.count() == Tables.events(spark, sfDir).count())
    assert(out.select("event_id").distinct().count() == out.count())
  }

  test("multimodal resize rewrites dimensions, keeps ids") {
    val meta = Multimodal.decodeMeta(Multimodal.mediaTable(spark, sfDir))
    val resized = Multimodal.resize(meta, 224, 224)
    val rows = resized.collect()
    assert(rows.forall(m => m.width == 224 && m.height == 224))
    assert(rows.map(_.media_id).sorted.toSeq ==
      meta.collect().map(_.media_id).sorted.toSeq)
  }
}
