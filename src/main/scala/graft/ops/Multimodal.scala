package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, batching, partition sizing,
  * typed Dataset boundaries — while the codec itself is STUBBED with a
  * deterministic fake (no image/audio libraries ship in this container).
  * Swap [[FakeCodec]] for a real decoder (javacv / TwelveMonkeys / a
  * vectorized Arrow UDF) without touching the pipeline shape.
  *
  * Scale notes: binary payloads dominate row size, so ops repartition by
  * target partition BYTES not row count; metadata extraction projects the
  * blob column away as early as possible so downstream stages scan only
  * small columns (column pruning does the rest in parquet).
  */
object Multimodal {

  final case class MediaMeta(media_id: Long, byte_len: Long, format: String,
                             width: Int, height: Int, checksum: Long)
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Deterministic stand-in for a real decoder: all values derived from the
    * payload bytes only, so tests are stable across runs/partitionings.
    */
  object FakeCodec {
    private val formats = Array("jpeg", "png", "webp", "wav")
    def checksum(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L // FNV-ish rolling hash over the blob
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }
    def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
      val cs = checksum(bytes)
      MediaMeta(id, bytes.length.toLong, formats(math.floorMod(cs, 4).toInt),
        64 + math.floorMod(cs >> 8, 1024).toInt, 64 + math.floorMod(cs >> 18, 1024).toInt, cs)
    }
    /** ??? in spirit: a real impl would run the codec; the fake projects
      * `dim` floats from the bytes deterministically. */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = (math.floorMod(checksum(bytes) >> (i % 56), 2048L) - 1024L) / 1024.0f
        i += 1
      }
      out
    }
  }

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (a deterministic opaque blob fixture), typed metadata columns
    * alongside — the canonical "multimodal row" layout.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"),
      length(col("text")).cast("long").as("payload_len"))

  /** Decode stage: binary → typed metadata via mapPartitions (one codec
    * init per partition, the shape a real decoder needs). Blob column is
    * dropped on output — downstream reads only small typed columns.
    */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs would initialize native state here, once per partition
        it.map { case (id, bytes) => FakeCodec.decode(id, bytes) }
      }
  }

  /** Feature-extraction stage: binary → Array[Float] embedding (stubbed),
    * output shaped exactly like the `embeddings` table for downstream
    * similarity ops. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaFeature(id, FakeCodec.features(bytes, dim))
      })
  }

  /** Resize stage: re-target media dimensions (STUB — a real impl would
    * run the codec's scaler over the payload; the fake rewrites the typed
    * metadata deterministically, preserving the pipeline shape: typed
    * Dataset in, typed Dataset out, per-partition execution).
    */
  def resize(meta: Dataset[MediaMeta], width: Int, height: Int): Dataset[MediaMeta] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.mapPartitions(_.map(m =>
      m.copy(width = width, height = height,
             checksum = 31L * (31L * m.checksum + width) + height)))
  }

  /** Frame-sample stage: take every `stride`-th fixed-size window of the
    * blob as a "frame" (byte-slice stand-in for video frame extraction),
    * exploded to one row per frame — the fan-out shape (and partition-size
    * hazard) a real frame sampler has. Pure expressions: slice/sequence.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    media.select(col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest((length(col("payload")) / (frameBytes * stride)).cast("int") - 1, lit(0))),
          i => col("payload").substr((i * (frameBytes * stride) + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_no", "frame")))
      .withColumn("frame_len", length(col("frame")).cast("long"))

  /** Metadata aggregate registered as a query: per-format size stats. */
  def formatProfile(spark: SparkSession, dir: String): DataFrame = {
    val meta = decodeMeta(mediaTable(spark, dir))
    meta.toDF()
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_media"),
           sum(col("byte_len")).as("total_bytes"),
           round(avg(col("width")), 4).as("avg_width"))
      .orderBy("format")
  }
}
