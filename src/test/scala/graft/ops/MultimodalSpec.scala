package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary columns, decode/extract/frame-sample. */
class MultimodalSpec extends SparkSpec {

  test("mediaTable carries payload bytes equal to text length") {
    val m = Multimodal.mediaTable(spark, sfDir)
    assert(m.filter(length(col("payload")) =!= col("payload_len")).count() == 0)
  }

  test("mediaTable adversarial headers: invalid UTF-8, pair-shared, pair-distinct; a string round-trip collapses them (the gate's teeth)") {
    import graft.functions.TextHashUtil
    val hdrs = Multimodal.mediaTable(spark, sfDir)
      .filter(col("media_id") % 100 === 2 || col("media_id") % 100 === 3)
      .select("media_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]]("payload").take(32)))
    assert(hdrs.nonEmpty)
    // every header is INVALID UTF-8 (decoding loses bytes to U+FFFD)
    hdrs.foreach { case (id, h) =>
      val s = new String(h, java.nio.charset.StandardCharsets.UTF_8)
      assert(s.contains('�'), s"header of $id decoded cleanly — not adversarial")
    }
    val byId = hdrs.toMap
    // shared within each planted pair, distinct across pairs (raw bytes)
    val rawHashes = hdrs.collect { case (id, h) if id % 100 == 2 =>
      assert(byId.get(id + 1).forall(_.sameElements(h)), s"pair $id/${id + 1} headers differ")
      TextHashUtil.fnv1a64Bytes(h)
    }
    assert(rawHashes.distinct.length == rawHashes.length && rawHashes.length >= 2)
    // the r15 bug class: hashing after a string round-trip collapses
    // DISTINCT headers onto far fewer values — exactly what would blow
    // the m9 df guard and move emitted Jaccards, failing the hash gate
    val collapsed = hdrs.collect { case (id, h) if id % 100 == 2 =>
      TextHashUtil.fnv1a64Bytes(
        new String(h, java.nio.charset.StandardCharsets.UTF_8)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    assert(collapsed.distinct.length < rawHashes.length,
      "string round-trip did not collapse headers — fixture lost its adversarial bite")
  }

  test("decodeMeta is deterministic; opaque text blobs decode honestly as unknown") {
    val meta = Multimodal.decodeMeta(Multimodal.mediaTable(spark, sfDir))
    val a = meta.orderBy("media_id").collect()
    val b = meta.orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.format == "unknown" && m.width == 0 && m.height == 0))
    assert(a.forall(m => m.byte_len > 0))
  }

  test("decodeMeta recovers real PNG/JPEG/WAV metadata from encoded bytes") {
    import Multimodal.ImageCodec
    val meta = Multimodal.decodeMeta(Multimodal.imageTable(spark, sfDir))
      .collect()
    assert(meta.nonEmpty)
    meta.foreach { m =>
      ImageCodec.kind(m.media_id) match {
        case 0 =>
          assert(m.format == "png", m.toString)
          assert(m.width == ImageCodec.imgWidth(m.media_id), m.toString)
          assert(m.height == ImageCodec.imgHeight(m.media_id), m.toString)
        case 1 =>
          assert(m.format == "jpeg", m.toString)
          assert(m.width == ImageCodec.imgWidth(m.media_id), m.toString)
          assert(m.height == ImageCodec.imgHeight(m.media_id), m.toString)
        case _ =>
          assert(m.format == "wav", m.toString)
          assert(m.width == ImageCodec.wavRate(m.media_id), m.toString)
          assert(m.height == ImageCodec.wavChannels(m.media_id), m.toString)
      }
    }
  }

  test("ImageCodec: header decode never touches pixel data (dims from a prefix)") {
    import Multimodal.ImageCodec
    // PNG dimensions live in the IHDR chunk (first 33 bytes); truncate the
    // payload to the header and the dimension read must still succeed —
    // the property that makes header profiling cheap on 100 MB media
    val full = ImageCodec.encodeImage(640, 480, seed = 7L, fmt = "png")
    val hdr = full.take(33)
    assert(ImageCodec.imageMeta(hdr).contains(("png", 640, 480)))
    // WAV: the fmt chunk sits in the 44-byte canonical header
    val wav = ImageCodec.encodeWav(44100, 2, nSamples = 64, seed = 7L)
    assert(ImageCodec.wavMeta(wav.take(44)).contains((44100, 2)))
  }

  test("extractFeatures yields fixed-dim float vectors") {
    // text-blob fixture is not decodable media — the fake-projection
    // shape test needs the explicit lenient opt-out
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sfDir),
      dim = 16, strict = false)
    val rows = f.collect()
    assert(rows.forall(_.feature.length == 16))
    assert(rows.forall(_.feature.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("image features are REAL pixel statistics: solid-color PNG → exact RGB means") {
    import Multimodal.ImageCodec
    val img = new java.awt.image.BufferedImage(20, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (120 << 16) | (60 << 8) | 30
    for (y <- 0 until 12; x <- 0 until 20) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val feats = ImageCodec.imageFeatures(out.toByteArray, dim = 12).get
    // every grid cell of a solid image averages to exactly the fill color
    feats.grouped(3).foreach { cell =>
      assert(cell(0) == 120 / 255f && cell(1) == 60 / 255f && cell(2) == 30 / 255f,
        cell.toSeq.toString)
    }
  }

  test("feature dispatch engages the real codecs, not the fake, for real media") {
    import Multimodal.ImageCodec
    val png = ImageCodec.synthPayload(0L)  // png by the id rule
    val wav = ImageCodec.synthPayload(2L)  // wav
    assert(!ImageCodec.features(png, 16).sameElements(Multimodal.FakeCodec.features(png, 16)))
    assert(!ImageCodec.features(wav, 16).sameElements(Multimodal.FakeCodec.features(wav, 16)))
    // wav RMS windows are true energies in [0,1]
    assert(ImageCodec.wavFeatures(wav, 8).get.forall(v => v >= 0f && v <= 1f))
    // opaque text blob → the deterministic fallback, unchanged
    val blob = "just some text".getBytes("UTF-8")
    assert(ImageCodec.features(blob, 16).sameElements(Multimodal.FakeCodec.features(blob, 16)))
  }

  test("m3 contract: decoded features reproduce the fixture's analytic rules (PNG grid means, WAV RMS)") {
    import Multimodal.ImageCodec
    // PNG: decode-side grid-RGB means must equal the pixel RULE means —
    // the in-JVM twin of the m3 DuckDB oracle (same float32 rounding)
    for (id <- Seq(0L, 3L, 48L, 201L)) {
      val (w, h) = (ImageCodec.imgWidth(id), ImageCodec.imgHeight(id))
      val feats = ImageCodec.imageFeatures(ImageCodec.synthPayload(id), dim = 12).get
      for (gy <- 0 until 2; gx <- 0 until 2) {
        val (x0, x1) = (gx * w / 2, (gx + 1) * w / 2)
        val (y0, y1) = (gy * h / 2, (gy + 1) * h / 2)
        var (r, g, b, n) = (0L, 0L, 0L, 0L)
        for (y <- y0 until y1; x <- x0 until x1) {
          val p = (id * 31 + x * 7 + y * 13) & 0xFFFFFF
          r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF; n += 1
        }
        val base = (gy * 2 + gx) * 3
        assert(feats(base) == (r.toFloat / n) / 255f, s"id=$id cell=($gx,$gy) R")
        assert(feats(base + 1) == (g.toFloat / n) / 255f, s"id=$id cell=($gx,$gy) G")
        assert(feats(base + 2) == (b.toFloat / n) / 255f, s"id=$id cell=($gx,$gy) B")
      }
    }
    // WAV: RMS windows must equal the PCM sample RULE energies
    for (id <- Seq(2L, 5L)) {
      val ns = 64 * (1 + (id % 2).toInt)
      val feats = ImageCodec.wavFeatures(ImageCodec.synthPayload(id), dim = 12).get
      for (w <- 0 until 12) {
        val s0 = w * ns / 12
        val s1 = math.max(s0 + 1, (w + 1) * ns / 12)
        val acc = (s0 until s1).map { i =>
          val s = (id * 31 + i * 997) % 32768
          (s * s).toDouble / (32768.0 * 32768.0)
        }.sum
        assert(feats(w) == math.sqrt(acc / (s1 - s0)).toFloat, s"id=$id w=$w")
      }
    }
  }

  test("nearDupImages blocked join == brute-force all-pairs Hamming, any maxDist in range") {
    import org.apache.spark.sql.functions.expr
    val media = Multimodal.imageTable(spark, sfDir)
      .filter(col("media_id") % 3 === 0)
    val hashes = Multimodal.imageHashes(media).localCheckpoint()
    val a = hashes.select(col("media_id").as("id_a"), col("ahash").as("ha"))
    val b = hashes.select(col("media_id").as("id_b"), col("ahash").as("hb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
    for (maxDist <- Seq(0, 4, 7)) {
      val blocked = Multimodal.nearDupImages(hashes, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = brute.filter(col("hamming") <= maxDist)
        .select("id_a", "id_b", "hamming")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(blocked == expected, s"maxDist=$maxDist")
    }
    intercept[IllegalArgumentException] {
      Multimodal.nearDupImages(hashes, maxDist = 8) // pigeonhole breaks
    }
  }

  test("imageHashes: JPEGs hash deterministically too; WAVs drop out; partitioning is irrelevant") {
    val media = Multimodal.imageTable(spark, sfDir) // PNG/JPEG/WAV mix
    val a = Multimodal.imageHashes(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Multimodal.imageHashes(media.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // every PNG (id%3==0) and JPEG (id%3==1) row hashes; no WAV does
    assert(a.keySet.forall(id => id % 3 != 2))
    val decodable = media.filter(col("media_id") % 3 =!= 2).count()
    assert(a.size == decodable)
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

  test("strict feature extraction: real media passes untouched, garbage raises the typed error") {
    import spark.implicits._
    // the encoded-media fixture is fully decodable: strict (the
    // default) == explicit lenient, and no FakeCodec branch runs
    val real = Multimodal.imageTable(spark, sfDir)
    val strictRows = Multimodal.extractFeatures(real)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val laxRows = Multimodal.extractFeatures(real, strict = false)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(strictRows == laxRows && strictRows.nonEmpty)
    // an unidentifiable blob: the DEFAULT raises UnsupportedMediaException
    // with the offending id; only the explicit opt-out falls back
    val garbage = Seq((99L, Array[Byte](1, 2, 3, 4, 5))).toDF("media_id", "payload")
    assert(Multimodal.extractFeatures(garbage, strict = false).collect().length == 1)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(garbage).collect()
    }
    def causes(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(causes(e).exists {
      case u: Multimodal.UnsupportedMediaException => u.mediaId == 99L
      case _ => false
    }, s"expected UnsupportedMediaException(99) in cause chain: $e")
  }

  test("audioHash64: identical PCM -> identical hash, WAV-only, blocked audio join == brute force") {
    import spark.implicits._
    import Multimodal.ImageCodec
    // identical samples, different header rates -> identical energy hash
    val a = ImageCodec.encodeWav(8000, 1, 256, seed = 7L)
    val b = ImageCodec.encodeWav(16000, 1, 256, seed = 7L)
    val c = ImageCodec.encodeWav(8000, 1, 256, seed = 9999L)
    assert(ImageCodec.audioHash64(a) == ImageCodec.audioHash64(b))
    assert(ImageCodec.audioHash64(a).isDefined)
    assert(ImageCodec.audioHash64(a) != ImageCodec.audioHash64(c))
    // non-WAV payloads drop out of audioHashes
    val png = ImageCodec.synthPayload(0L) // id % 3 == 0 -> png
    val media = Seq((1L, a), (2L, b), (3L, c), (4L, png)).toDF("media_id", "payload")
    val hashes = Multimodal.audioHashes(media)
    assert(hashes.count() == 3)
    // the modality-agnostic blocked join finds the planted identical pair
    val pairs = Multimodal.nearDupImages(hashes, maxDist = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    // blocked == brute force over the real WAV fixture slice
    val fixture = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 2)
    val fh = Multimodal.audioHashes(fixture).cache()
    try {
      val blocked = Multimodal.nearDupImages(fh, maxDist = 4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ha = fh.select(col("media_id").as("id_a"), col("ahash").as("hA"))
      val hb = fh.select(col("media_id").as("id_b"), col("ahash").as("hB"))
      val brute = ha.crossJoin(hb).filter(col("id_a") < col("id_b"))
        .filter(bit_count(col("hA").bitwiseXOR(col("hB"))) <= 4)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == brute && blocked.nonEmpty)
    } finally fh.unpersist()
  }

  test("low-dup audio fixture: detected pairs are exactly the planted re-recordings, density ~1/25") {
    val media = Multimodal.audioTableLowDup(spark, sfDir)
    val nTracks = media.count()
    val pairs = Multimodal.nearDupImages(Multimodal.audioHashes(media), maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every detected pair is a planted (base, re-recording) pair: the
    // white-noise tracks sit ~32 bits apart, so random collisions at
    // Hamming<=4 have probability ~1e-14 per pair
    pairs.foreach { case (a, b) =>
      assert(b == a + 6 && Multimodal.ImageCodec.lowDupBase(b) == a,
        s"non-planted pair detected: ($a, $b)")
    }
    // the planted 1/25 rate is substantially detected (the level drop
    // shifts energy bits only at near-ties) and pair count is O(n),
    // nothing like the old fixture's ~n²/2
    val planted = media.select("media_id").collect().map(_.getLong(0))
      .count(id => Multimodal.ImageCodec.lowDupBase(id) != id)
    assert(planted > 0, "fixture too small to plant any dup")
    assert(pairs.length >= (planted * 8) / 10,
      s"only ${pairs.length} of $planted planted pairs detected")
    assert(pairs.length <= planted, s"${pairs.length} pairs exceed the $planted planted")
    assert(pairs.length.toLong < nTracks, s"pair list must stay O(n): ${pairs.length}")
    // determinism under repartition
    val re = Multimodal.nearDupImages(
        Multimodal.audioHashes(media.repartition(13)), maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(re.sorted.toSeq == pairs.sorted.toSeq)
  }

  test("image dup resolution: pair endpoints share a component, roots are minima, singletons keep themselves") {
    val media = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val hashes = Multimodal.imageHashes(media)
    val pairs = Multimodal.nearDupImages(hashes, maxDist = 4)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val resolved = graft.ops.Dedup.resolveDuplicates(
        media.select(col("media_id")), pairs, idCol = "media_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(resolved.size == media.count())
    val ps = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty, "fixture must contain image near-dups or the test is vacuous")
    ps.foreach { case (a, b) => assert(resolved(a)._1 == resolved(b)._1) }
    resolved.foreach { case (id, (comp, keep)) =>
      assert(comp <= id && keep == (comp == id))
    }
    // exactly one keeper per component
    val perComp = resolved.values.groupBy(_._1)
    perComp.foreach { case (_, ms) => assert(ms.count(_._2) == 1) }
  }

  test("nearDupVideos: re-ordered and trimmed frame streams pair, disjoint do not") {
    import spark.implicits._
    // "videos" = payload streams of 128-byte strides (frame = first 32
    // bytes of each stride). Build 4 distinct blocks A/B/C/D of 128
    // chars each; video 1 = ABCD, video 2 = DCBA (re-ordered: same
    // frame SET -> jaccard 1.0), video 3 = ABC (trimmed: 3/4 shared),
    // video 4 = four fresh blocks (disjoint: no pair)
    def block(c: Char) = c.toString * 128
    val (a, b, c2, d) = (block('a'), block('b'), block('c'), block('d'))
    val fresh = "wxyz".map(block).mkString
    val docs = Seq(
      (1L, a + b + c2 + d), (2L, d + c2 + b + a), (3L, a + b + c2),
      (4L, fresh)).toDF("doc_id", "text")
    def media(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("media_id"),
        org.apache.spark.sql.functions.encode(col("text"), "UTF-8").as("payload"))
    val out = Multimodal.nearDupVideos(media(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0, s"re-ordered video must be a full dup: $out")
    assert(out((1L, 3L)) == 0.75 && out((2L, 3L)) == 0.75,
      s"trimmed video shares 3 of 4 frames: $out")
    assert(!out.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"disjoint video must not pair: $out")
    // determinism under repartition
    val re = Multimodal.nearDupVideos(media(docs.repartition(7)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(re == out)
  }

  test("nearDupVideos: frame hashing is byte-lossless on invalid UTF-8 payloads") {
    import spark.implicits._
    // two REAL-binary frame streams that a string cast would collide:
    // every byte is an invalid-UTF-8 continuation byte, so the decode
    // collapses both to runs of U+FFFD and the old string-cast hash saw
    // them as identical (false full-dup). Raw-byte hashing must keep
    // them disjoint. Frames are 32 bytes at stride 4 -> 128-byte blocks.
    def blockBin(b: Int) = Array.fill(128)(b.toByte)
    val v1 = blockBin(0x80) ++ blockBin(0x81) ++ blockBin(0x82) ++ blockBin(0x83)
    val v2 = blockBin(0x90) ++ blockBin(0x91) ++ blockBin(0x92) ++ blockBin(0x93)
    val media = Seq((1L, v1), (2L, v2)).toDF("media_id", "payload")
    val pairs = Multimodal.nearDupVideos(media).collect()
    assert(pairs.isEmpty,
      s"distinct binary frames collided (lossy string-cast hash?): ${pairs.mkString(",")}")
    // and the string cast provably WOULD collide them — document the hazard
    val collided = media
      .select(call_function("fnv1a64", col("payload").cast("string")).as("h"))
      .collect().map(_.getLong(0)).distinct
    assert(collided.length == 1, "fixture no longer demonstrates the U+FFFD collapse")
    // while the binary fold keeps them distinct
    val distinct = media
      .select(call_function("fnv1a64_bin", col("payload")).as("h"))
      .collect().map(_.getLong(0)).distinct
    assert(distinct.length == 2)
  }

  test("nearDupAudioWindows (m10): offset retake pairs at J=50/64 where audioHash64 provably misses") {
    import spark.implicits._
    import Multimodal.ImageCodec
    // the fixture's first planted retake: t = 24 -> id = 3*24+2 = 74,
    // re-recording id 71 at +7 samples; 77/80 are independent noise
    val ids = Seq(71L, 74L, 77L, 80L)
    val media = ids.map(id => (id, ImageCodec.synthAudioShifted(id)))
      .toDF("media_id", "payload")
    val out = Multimodal.nearDupAudioWindows(media).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.keySet == Set((71L, 74L)), s"expected exactly the planted pair: $out")
    assert(math.abs(out((71L, 74L)) - 50.0 / 64.0) < 1e-6,
      s"offset retake must share 50 of 64 distinct windows: ${out((71L, 74L))}")
    // the SAME pair is provably invisible to the m6/m8 whole-payload
    // energy hash: both tracks hash (64 samples), but the 7-sample shift
    // re-bins every fixed window and the Hamming distance blows through
    // the m6/m8 radius (4) by an order of magnitude
    val h71 = ImageCodec.audioHash64(ImageCodec.synthAudioShifted(71L)).get
    val h74 = ImageCodec.audioHash64(ImageCodec.synthAudioShifted(74L)).get
    val hamming = java.lang.Long.bitCount(h71 ^ h74)
    assert(hamming > 4, s"audioHash64 unexpectedly robust to the shift (hamming=$hamming)")
    // determinism under repartition
    val re = Multimodal.nearDupAudioWindows(media.repartition(5)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(re == out)
  }

  test("mediaFromFiles (s11): binaryFile round-trip — ids from names, bytes identical, markers filtered") {
    import Multimodal.ImageCodec
    import java.nio.file.{Files, Paths}
    val d = tmpDir("s11").toString
    for (id <- Seq(0L, 1L, 2L, 30L))
      Files.write(Paths.get(d, f"media_$id%06d.bin"), ImageCodec.synthPayload(id))
    Files.write(Paths.get(d, "_SUCCESS"), Array.empty[Byte]) // must not reach the scan
    val got = Multimodal.mediaFromFiles(spark, d).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 30L))
    got.foreach { case (id, bytes) =>
      assert(java.util.Arrays.equals(bytes, ImageCodec.synthPayload(id)),
        s"payload for $id corrupted in file round-trip")
    }
    // the real decode gate identifies every file's true format
    val fm = Multimodal.decodeMeta(Multimodal.mediaFromFiles(spark, d)).toDF()
      .select("media_id", "format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fm == Map(0L -> "png", 1L -> "jpeg", 2L -> "wav", 30L -> "png"), s"got $fm")
  }

  test("curationIndexAddReport: counts reconcile across scopes; probe volume equals the real chunk-join size") {
    val img = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val base = Multimodal.imageCurationIndexChunked(img.filter(col("media_id") % 2 === 0))
    val add = img.filter(col("media_id") % 2 === 1)
    val out = Multimodal.curationIndexAddReport(base, add).collect()
      .map(r => r.getString(0) -> r).toMap
    val (b, a, m) = (out("base"), out("add"), out("merged"))
    // exactly 8 chunk rows per decodable image; merged images = base + add
    Seq(b, a, m).foreach(r =>
      assert(r.getAs[Long]("n_chunk_rows") == 8 * r.getAs[Long]("n_images")))
    assert(m.getAs[Long]("n_images") == b.getAs[Long]("n_images") + a.getAs[Long]("n_images"))
    assert(m.getAs[Long]("max_bucket") >= b.getAs[Long]("max_bucket") &&
      m.getAs[Long]("max_bucket") >= a.getAs[Long]("max_bucket"))
    assert(m.getAs[Long]("n_buckets") >= b.getAs[Long]("n_buckets") &&
      m.getAs[Long]("n_buckets") <= b.getAs[Long]("n_buckets") + a.getAs[Long]("n_buckets"))
    // the add row's probe volume IS the row count of the real add→base
    // chunk-key join (what each st22-style batch probe would generate)
    val addIdx = Multimodal.imageCurationIndexChunked(add)
    val realProbe = addIdx.select("ci", "ckey")
      .join(base.select("ci", "ckey"), Seq("ci", "ckey")).count()
    assert(a.getAs[Long]("probe_candidates") == realProbe && realProbe > 0)
    assert(b.getAs[Long]("probe_candidates") == 0 && m.getAs[Long]("probe_candidates") == 0)
  }

  test("mediaCuration (c22) == the hand-chained m1/m4/m5/m8/m7/c14 stages") {
    import graft.ops.{Dedup, Iterate}
    val composite = Multimodal.mediaCuration(spark, sfDir).orderBy("media_id")
      .collect().map(_.toString).toSeq
    // hand-chain the stages, materializing between each like a user
    // running the operators one at a time
    val img = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val aud = Multimodal.audioTableLowDup(spark, sfDir)
    val meta = Iterate.materialize(
      Multimodal.decodeMeta(img.unionAll(aud)).toDF().filter(col("format") =!= "unknown"))
    val scores = Iterate.materialize(meta.select(col("media_id"),
      when(col("format") === "wav", col("width"))
        .otherwise(col("width") * col("height")).cast("double").as("quality_score")))
    val imgPairs = Iterate.materialize(
      Multimodal.nearDupImages(Multimodal.imageHashes(img), maxDist = 4))
    val audPairs = Iterate.materialize(
      Multimodal.nearDupImages(Multimodal.audioHashes(aud), maxDist = 4))
    val pairs = imgPairs.unionAll(audPairs)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val chained = Dedup.resolveBestByScore(meta.select("media_id"), pairs,
        scores, idCol = "media_id")
      .orderBy("media_id").collect().map(_.toString).toSeq
    assert(composite.nonEmpty && composite == chained)
    // the decode gate is real: every fixture payload decodes, both
    // modalities are present, and clusters never mix modalities
    val rows = Multimodal.mediaCuration(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.exists(_._1 % 3 == 0) && rows.exists(_._1 % 3 == 2))
    rows.foreach { case (id, comp) => assert(id % 3 == comp % 3, s"modality mix: $id in $comp") }
  }

  test("curationIndexAddReport: empty add batch emits NO add row (oracle GROUP BY parity); merged == base") {
    val img = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val base = Multimodal.imageCurationIndexChunked(img.filter(col("media_id") % 2 === 0))
    val out = Multimodal.curationIndexAddReport(base, img.filter(lit(false)))
      .collect().map(r => r.getString(0) -> r).toMap
    // the DuckDB oracle's GROUP BY scope yields no 'add' group on an
    // empty batch — the engine must agree (a global agg would instead
    // emit a NULL-sum row disagreeing with base+merged)
    assert(out.keySet == Set("base", "merged"), s"got scopes ${out.keySet}")
    val (b, m) = (out("base"), out("merged"))
    Seq("n_images", "n_chunk_rows", "n_buckets", "max_bucket",
      "self_pair_candidates").foreach(c =>
      assert(b.getAs[Long](c) == m.getAs[Long](c), s"$c: base != merged"))
  }

  test("curationAgainstIndexTombstone (c33): untouched index + one anti-join == retained-corpus rebuild; deleted ids never match") {
    val img = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val base = Multimodal.imageCurationIndexChunked(img.filter(col("media_id") % 2 === 0))
    val nw = img.filter(col("media_id") % 2 === 1)
    val del = img.filter(col("media_id") % 10 === 6).select(col("media_id"))
    val tomb = Multimodal.curationAgainstIndexTombstone(nw, base, del)
    val rebuilt = Multimodal.curationAgainstIndex(nw,
      Multimodal.imageCurationIndexChunked(
        img.filter(col("media_id") % 2 === 0 && col("media_id") % 10 =!= 6)))
    assert(tomb.count() > 0)
    assert(tomb.exceptAll(rebuilt).count() == 0 && rebuilt.exceptAll(tomb).count() == 0)
    assert(tomb.filter(col("matched_id") % 10 === 6).count() == 0,
      "a deleted id surfaced as a match")
  }

  test("audio/video tombstone matching (m11/m12): unguarded store + subtracted dfs == rebuild over retained corpus") {
    import graft.ops.Iterate
    val aud = Multimodal.audioTableShifted(spark, sfDir)
    val corpusSets = Iterate.materialize(Multimodal.audioWindowSets(
      aud.filter(expr("((media_id - 2) div 3) % 2 = 0"))))
    val newSets = Iterate.materialize(Multimodal.audioWindowSets(
      aud.filter(expr("((media_id - 2) div 3) % 2 = 1"))))
    val sizes = corpusSets.select(col("doc_id").as("cid"), col("n_sh").as("nb"))
    val full = Multimodal.hashIndexFull(corpusSets)
    val del = aud.filter(expr("((media_id - 2) div 3) % 100 = 24"))
      .select(col("media_id").as("cid"))
    assert(del.count() > 0, "fixture must contain deleted corpus tracks")
    val tomb = Multimodal.audioMatchTombstone(newSets, full,
      Multimodal.hashIndexDfs(full), sizes, del)
    val retainedSets = corpusSets.join(
      del.withColumnRenamed("cid", "doc_id"), Seq("doc_id"), "left_anti")
    val rebuilt = Multimodal.audioMatchAgainstIndex(newSets,
      Multimodal.audioWindowIndex(retainedSets), sizes)
    assert(tomb.count() > 0)
    assert(tomb.exceptAll(rebuilt).count() == 0 && rebuilt.exceptAll(tomb).count() == 0)
    // the delete is observable: a planted retake pair loses its match
    val before = Multimodal.audioMatchAgainstIndex(newSets,
      Multimodal.audioWindowIndex(corpusSets), sizes)
    assert(before.exceptAll(tomb).count() > 0, "delete must change a verdict")
    assert(tomb.filter(col("matched_id").isNotNull)
      .join(del.withColumnRenamed("cid", "matched_id"), Seq("matched_id"),
        "left_semi").count() == 0, "a deleted id surfaced as a match")
  }

  test("guard-crossing (why the store is unguarded): a hash with df just above maxFreq becomes servable when a holder is deleted") {
    import spark.implicits._
    def mkSets(rows: Seq[(Long, Seq[Long])]) =
      rows.toDF("doc_id", "sh")
        .withColumn("n_sh", size(col("sh")).cast("long"))
    // four corpus tracks share hash 100 (df = 4 > maxFreq 3); each has
    // a private filler hash so Jaccards stay fractional
    val corpusSets = mkSets(Seq(1L -> Seq(100L, 11L), 2L -> Seq(100L, 12L),
      3L -> Seq(100L, 13L), 4L -> Seq(100L, 14L)))
    val newSets = mkSets(Seq(10L -> Seq(100L, 15L)))
    val full = Multimodal.hashIndexFull(corpusSets)
    val dfs = Multimodal.hashIndexDfs(full)
    val sizes = corpusSets.select(col("doc_id").as("cid"), col("n_sh").as("nb"))
    def verdict(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    // no delete: df(100) = 4 is guarded out — no candidate
    val none = Seq.empty[Long].toDF("cid")
    assert(verdict(Multimodal.audioMatchTombstone(newSets, full, dfs, sizes,
      none, maxFreq = 3)) == Seq((10L, None)))
    // delete track 4: df_eff(100) = 3 <= maxFreq — the hash crosses
    // DOWN through the guard and track 10 now matches (tie on J=1/3
    // across tracks 1..3 -> lowest id wins, the st23 rule)
    val del = Seq(4L).toDF("cid")
    assert(verdict(Multimodal.audioMatchTombstone(newSets, full, dfs, sizes,
      del, maxFreq = 3)) == Seq((10L, Some(1L))))
    // a GUARDED-only store cannot do this: the df-4 hash was never
    // stored, so anti-joining the delete from it still finds nothing —
    // the exact divergence from a retained-corpus rebuild the unguarded
    // layout exists to prevent
    val guarded = Multimodal.audioWindowIndex(corpusSets, maxWindowFreq = 3)
    assert(verdict(Multimodal.audioMatchAgainstIndex(newSets,
      guarded.join(del, Seq("cid"), "left_anti"), sizes)) == Seq((10L, None)))
    val rebuilt = Multimodal.audioWindowIndex(
      corpusSets.filter(col("doc_id") =!= 4L), maxWindowFreq = 3)
    assert(verdict(Multimodal.audioMatchAgainstIndex(newSets, rebuilt, sizes))
      == Seq((10L, Some(1L))))
  }

  test("hashIndexDeleteReport: hand-computed scopes on a tiny store; guard-crossing and vanish counts; t40 rewrite rule") {
    import spark.implicits._
    // postings: hash 100 held by 1..4 (df 4), hash 20 held only by 4,
    // hash 30 held by 1 and 2 (df 2); delete track 4
    val full = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (20L, 4L), (30L, 1L), (30L, 2L)).toDF("wh", "cid")
    val out = Multimodal.hashIndexDeleteReport(full, Seq(4L).toDF("cid"),
        maxFreq = 3, rebuildDen = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val (b, d, a) = (out("base"), out("delete"), out("after"))
    assert(b.getAs[Long]("n_tracks") == 4 && b.getAs[Long]("n_hashes") == 3 &&
      b.getAs[Long]("n_postings") == 7 && b.getAs[Long]("max_df") == 4)
    assert(d.getAs[Long]("n_tracks") == 1 && d.getAs[Long]("n_postings") == 2)
    assert(a.getAs[Long]("n_tracks") == 3 && a.getAs[Long]("n_hashes") == 2 &&
      a.getAs[Long]("n_postings") == 5 && a.getAs[Long]("max_df") == 3)
    // hash 20 vanished with its only holder; hash 100 crossed DOWN
    // through the maxFreq=3 guard (df 4 -> 3)
    assert(a.getAs[Long]("n_vanished_hashes") == 1)
    assert(a.getAs[Long]("n_unblocked_hashes") == 1)
    // rewrite rule at rebuildDen=2: 2 * 2 < 7 -> tombstones suffice
    assert(!a.getAs[Boolean]("rewrite_recommended"))
    assert(!b.getAs[Boolean]("rewrite_recommended") &&
      !d.getAs[Boolean]("rewrite_recommended"))
    // empty delete: no 'delete' scope row at all (oracle GROUP BY parity)
    val empty = Multimodal.hashIndexDeleteReport(full,
        Seq.empty[Long].toDF("cid"), maxFreq = 3)
      .collect().map(_.getString(0)).toSet
    assert(empty == Set("base", "after"))
  }

  test("curationIndexDeleteReport: scopes reconcile; vanished buckets; deleting everything forces the rewrite rule") {
    val img = Multimodal.imageTable(spark, sfDir).filter(col("media_id") % 3 === 0)
    val corpus = img.filter(col("media_id") % 2 === 0)
    val base = Multimodal.imageCurationIndexChunked(corpus)
    val del = img.filter(col("media_id") % 10 === 6).select(col("media_id"))
    val out = Multimodal.curationIndexDeleteReport(base, del)
      .collect().map(r => r.getString(0) -> r).toMap
    val (b, d, a) = (out("base"), out("delete"), out("after"))
    Seq(b, d, a).foreach(r =>
      assert(r.getAs[Long]("n_chunk_rows") == 8 * r.getAs[Long]("n_images")))
    assert(b.getAs[Long]("n_images") ==
      d.getAs[Long]("n_images") + a.getAs[Long]("n_images"))
    assert(a.getAs[Long]("n_vanished_buckets") ==
      b.getAs[Long]("n_buckets") - a.getAs[Long]("n_buckets"))
    assert(d.getAs[Long]("n_images") > 0 && !b.getAs[Boolean]("rewrite_recommended"))
    // a delete reaching half the corpus trips the 1/8 rewrite rule
    val big = Multimodal.curationIndexDeleteReport(base,
        corpus.filter(col("media_id") % 4 === 0).select(col("media_id")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(big("after").getAs[Boolean]("rewrite_recommended"))
    // deleting the WHOLE corpus empties the after scope entirely
    // (oracle GROUP BY parity: no row, not a zero row)
    val all = Multimodal.curationIndexDeleteReport(base,
        corpus.select(col("media_id")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!all.contains("after"))
    assert(all("delete").getAs[Long]("n_images") == b.getAs[Long]("n_images"))
  }
}
