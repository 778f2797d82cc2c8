package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media pipeline decodes every document with real byte plumbing") {
    val out = Multimodal.pipeline(spark, sf)
    assert(out.count() == 500)
    assert(out.filter(col("n_bytes") <= 0).count() == 0)
    // the stub checksum over payload BYTES must equal the rolling-hash
    // fingerprint over CHARS (text is ASCII, so bytes == char codes) —
    // proves the binary column carries the real content.
    val fp = SparkEntry.queries("ta_fingerprint")(spark, sf)
    val joined = out.join(fp, "doc_id")
      .filter(col("checksum") =!= col("fp"))
    assert(joined.count() == 0)
  }

  test("stub dimensions match the SQL-expressible mm_decode_stub projection") {
    val out = Multimodal.pipeline(spark, sf).select("doc_id", "width", "height")
    val sqlSide = SparkEntry.queries("mm_decode_stub")(spark, sf)
      .select(col("doc_id"), col("width").as("w2"), col("height").as("h2"))
    val diff = out.join(sqlSide, "doc_id")
      .filter(col("width") =!= col("w2") || col("height") =!= col("h2"))
    assert(diff.count() == 0)
  }

  test("decode is iterator-mapped: partitioning preserved, no driver collect") {
    val media = Multimodal.assemble(spark, sf).repartition(7)
    val decoded = Multimodal.decodeFeatures(media)
    assert(decoded.rdd.getNumPartitions == 7)
  }

  test("batched decode (vectorized shape) is identical to row-at-a-time") {
    val media = Multimodal.assemble(spark, sf).repartition(3)
    val rowWise = Multimodal.decodeFeatures(media).collect()
      .map(f => (f.doc_id, f.width, f.height, f.checksum)).sortBy(_._1).toSeq
    // batch size chosen to leave a ragged tail partition batch
    val batched = Multimodal.decodeFeaturesBatched(media, batchSize = 7).collect()
      .map(f => (f.doc_id, f.width, f.height, f.checksum)).sortBy(_._1).toSeq
    assert(batched == rowWise)
  }

  test("resize arithmetic: aspect preserved, bounded, never upscales") {
    assert(Multimodal.resizedDims(640, 480, 320, 320) == ((320, 240)))
    assert(Multimodal.resizedDims(480, 640, 320, 320) == ((240, 320)))
    assert(Multimodal.resizedDims(100, 100, 320, 320) == ((100, 100))) // no upscale
    assert(Multimodal.resizedDims(0, 100, 320, 320) == ((0, 0)))
  }

  test("mm_patch_grid geometry: bounded, never upscales, patch math exact") {
    val rows = SparkEntry.queries("mm_patch_grid")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getInt(1), r.getInt(2))
      val (rw, rh) = (r.getInt(3), r.getInt(4))
      val m = math.max(w, h)
      // integer round-half-up model of the aspect-preserving downscale
      def sc(x: Int) = if (m <= 96) x else math.max(1, (192 * x + m) / (2 * m))
      assert(rw == sc(w) && rh == sc(h), s"doc ${r.getLong(0)}: ($w,$h)→($rw,$rh)")
      assert(rw <= math.max(w, 96) && rh <= math.max(h, 96)) // never upscale
      assert(math.max(rw, rh) <= 96)
      assert(r.getInt(5) == (rw + 15) / 16 && r.getInt(6) == (rh + 15) / 16)
      assert(r.getInt(7) == r.getInt(5) * r.getInt(6) + 1)
    }
  }

  test("mm_audio_frames: 400/160 frame windowing model") {
    val rows = SparkEntry.queries("mm_audio_frames")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(1)
      val samples = n / 2
      assert(r.getLong(2) == samples)
      assert(r.getLong(3) == samples * 1000L / 16000)
      val exp = if (samples >= 400) (samples - 400) / 160 + 1 else 0
      assert(r.getInt(4) == exp, s"doc ${r.getLong(0)}")
    }
    assert(Multimodal.resizedDims(10000, 1, 320, 320)._1 <= 320)
    // ratio distortion stays within 1 pixel of exact for typical shapes
    val (w, h) = Multimodal.resizedDims(1920, 1080, 512, 512)
    assert(math.abs(w.toDouble / h - 1920.0 / 1080) < 0.02)
  }

  test("mm_frame_sample covers every 4th frame and only those") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), octet_length(col("text")).as("nb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val frames = SparkEntry.queries("mm_frame_sample")(spark, sf).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(frames.keySet == docs.keySet)
    docs.foreach { case (id, nb) =>
      val nFrames = nb / 100 + 1
      val expected = (0 until nFrames by 4).toSeq
      val got = frames(id).map(_._1).toSeq.sorted
      assert(got == expected, s"doc $id")
      frames(id).foreach { case (idx, off, nf) =>
        assert(off == idx * 100 && nf == nFrames)
      }
    }
  }

  test("mm_shard_plan: the manifest equals a sequential per-source " +
    "first-fit fold and shards partition every source's docs") {
    import TestSpark._
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("mm_shard_plan")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val model = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      var before = 0L
      g.sortBy(_._2).toSeq.map { case (_, _, nb) =>
        val shard = before / 4096; before += nb; (src, shard, nb)
      }
    }.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      k -> ((g.size.toLong, g.map(_._3).sum))
    }
    assert(got == model)
    // shards partition each source's corpus exactly
    val perSource = docs.groupBy(_._1).map { case (s0, g) =>
      s0 -> (g.length.toLong, g.map(_._3).sum) }
    perSource.foreach { case (s0, (n, b)) =>
      val rows = got.filter(_._1._1 == s0).values
      assert(rows.map(_._1).sum == n && rows.map(_._2).sum == b, s"source $s0")
    }
  }

  test("image header parse: genuine PNG and JPEG byte fixtures, segment " +
    "scanning, and quarantine NULLs for unknown payloads") {
    import spark.implicits._
    import graft.multimodal.ImageHeaders
    def bytes(hexStr: String): Array[Byte] =
      hexStr.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // the canonical 1x1 transparent PNG: real signature, real IHDR with
    // the real CRC (1F15C489), real IDAT/IEND — an actual decodable file
    val realPng = bytes(
      "89504E470D0A1A0A0000000D4948445200000001000000010806000000" +
        "1F15C4890000000A49444154789C6300010000050001" +
        "0D0A2DB40000000049454E44AE426082")
    // a baseline JPEG prefix with w=5, h=7 where SOF0 sits BEHIND an
    // APP0/JFIF segment and a 2-byte-payload COM segment — fixed offsets
    // would misread it, only a marker-chain scan finds the frame header
    val realJpeg = bytes(
      "FFD8" +
        "FFE000104A46494600010100000100010000" + // APP0, 16 bytes
        "FFFE0004DEAD" + // COM: length 4 (2 payload bytes)
        "FFC00011" + "08" + "0007" + "0005" + "03011100021101031101" +
        "FFD9")
    // progressive JPEG (SOF2) with three APPn segments in front
    val progJpeg = bytes(
      "FFD8" +
        "FFE000104A46494600010100000100010000" +
        "FFE100044578" + // APP1 stub, 2 payload bytes (EXIF would sit here)
        "FFED0006503373B0" + // APP13 stub, 4 payload bytes
        "FFC20011" + "08" + "0100" + "0280" + "03011100021101031101" +
        "FFD9")
    val junk = "not an image at all".getBytes("UTF-8")
    val df = Seq(
      (1L, realPng), (2L, realJpeg), (3L, progJpeg), (4L, junk))
      .toDF("doc_id", "payload")
    val got = ImageHeaders.withImageDims(df, "payload")
      .select("doc_id", "fmt", "width", "height")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
          if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    assert(got(1L) == (("png", 1, 1)))
    assert(got(2L) == (("jpeg", 5, 7)))
    assert(got(3L) == (("jpeg", 640, 256))) // 0x0280 wide, 0x0100 tall
    assert(got(4L) == ((null, -1, -1)))
    // the synthesized corpus round-trips: parsed dims equal the formula
    // dims the payload builder embedded (the mm_image_dims oracle)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        ImageHeaders.fakeImagePayload(col("doc_id")).as("payload"))
    val parsed = ImageHeaders.withImageDims(docs, "payload")
    val mism = parsed.filter(
      col("width") =!= (col("doc_id") * 7 % 624 + 16).cast("int") ||
        col("height") =!= (col("doc_id") * 5 % 464 + 16).cast("int") ||
        col("fmt") =!= when(col("doc_id") % 2 === 0, "png").otherwise("jpeg"))
    assert(mism.count() == 0 && parsed.filter(col("width").isNull).count() == 0)
  }
}
