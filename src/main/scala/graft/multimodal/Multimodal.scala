package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * decoded by a partition-mapped stub.
  *
  * The design point: media (image/audio/video) travels through the engine
  * as a `binary` column plus a typed metadata struct; decode/feature-
  * extraction runs as an iterator-to-iterator `mapPartitions` so per-
  * partition setup (a real codec would init once per partition, not per
  * row) amortizes, partitioning is preserved, and nothing materializes on
  * the driver. The decoder itself is STUBBED — the container has no media
  * codecs — with a deterministic fake that reads real bytes from the real
  * binary column, so every seam (schema, encoders, batch shape, partition
  * mapping) is genuine and tested.
  */
object Multimodal {

  /** A media row: payload is an opaque byte blob + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], mime: String,
      n_bytes: Int)

  /** Decoded features (what a real image/audio decoder would emit). */
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, checksum: Long)

  /** Assemble a media table from the documents fixture: the text bytes play
    * the role of an encoded payload. */
  def assemble(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"),
        octet_length(col("text")).as("n_bytes"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode the codec here
    * (JPEG dims, audio frames, video keyframes). The stub derives
    * deterministic pseudo-dimensions and a checksum from the payload bytes
    * so the pipeline shape — per-partition init, iterator-to-iterator
    * mapping, typed output — is fully exercised.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec init" happens once, here.
      it.map { m =>
        val b = m.payload
        val w = if (b.length > 0) (b(0) & 0xff) * 7 % 640 else 0
        val h = if (b.length > 1) (b(1) & 0xff) * 5 % 480 else 0
        val ck = b.foldLeft(0L)((acc, x) => (acc * 31 + (x & 0xff)) % 1000000007L)
        MediaFeatures(m.doc_id, m.mime, m.n_bytes, w, h, ck)
      }
    }
  }

  /** Batched decode: same contract as [[decodeFeatures]], but the iterator
    * is consumed in fixed-size batches — the JVM analog of a vectorized
    * (mapInPandas-style) decode, where a real codec amortizes dispatch over
    * a batch of payloads. Output must be identical to the row-at-a-time
    * form; MultimodalSpec asserts it.
    */
  def decodeFeaturesBatched(media: Dataset[MediaRecord], batchSize: Int = 64)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a real codec would submit `batch` to the device/library in one
        // call; the stub maps it element-wise
        batch.map { m =>
          val b = m.payload
          val w = if (b.length > 0) (b(0) & 0xff) * 7 % 640 else 0
          val h = if (b.length > 1) (b(1) & 0xff) * 5 % 480 else 0
          val ck = b.foldLeft(0L)((acc, x) => (acc * 31 + (x & 0xff)) % 1000000007L)
          MediaFeatures(m.doc_id, m.mime, m.n_bytes, w, h, ck)
        }
      }
    }
  }

  /** Aspect-preserving resize arithmetic (the real op's geometry, minus the
    * pixel work): scale = min(maxW/w, maxH/h, 1) — never upscale. */
  def resizedDims(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    if (w <= 0 || h <= 0) (0, 0)
    else {
      val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
      (math.max(1, math.round(w * scale).toInt),
        math.max(1, math.round(h * scale).toInt))
    }
  }

  /** End-to-end: documents → media records → stub-decoded features. */
  def pipeline(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(assemble(spark, sfDir)).toDF()
}
