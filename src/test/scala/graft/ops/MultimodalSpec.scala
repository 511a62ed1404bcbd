package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary columns, decode/extract/frame-sample. */
class MultimodalSpec extends SparkSpec {

  test("mediaTable carries payload bytes equal to text length") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.filter(length(col("payload")) =!= col("payload_len")).count() == 0)
  }

  test("decodeMeta is deterministic and schema-typed") {
    val meta = Multimodal.decodeMeta(Multimodal.mediaTable(spark, sfDir))
    val a = meta.orderBy("media_id").collect()
    val b = meta.orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.width >= 64 && m.height >= 64))
    assert(a.forall(m => Set("jpeg", "png", "webp", "wav").contains(m.format)))
  }

  test("extractFeatures yields fixed-dim float vectors") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir), dim = 16)
    val rows = f.collect()
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(_.feature.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("sampleFrames: frame count follows the stride formula") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val frames = Multimodal.sampleFrames(m, frameBytes = 32, stride = 4)
    val counts = frames.groupBy("media_id").count()
    val expected = m.select(col("media_id"),
      greatest((col("payload_len") / 128).cast("long"), lit(1L)).as("exp"))
    val joined = counts.join(expected, "media_id")
      .filter(col("count") =!= col("exp"))
    assert(joined.count() == 0)
  }
}
