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
}
