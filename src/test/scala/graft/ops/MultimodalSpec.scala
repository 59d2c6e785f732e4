package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal.{MediaRow, MediaFeat}

/** Boundary behavior of the batched media decode: partitions smaller
  * than a decode batch, empty partitions, and an empty dataset must
  * all decode every present row exactly once. */
class MultimodalSpec extends SparkSpec {

  private def rows(n: Int): Seq[MediaRow] =
    (0 until n).map(i => MediaRow(i.toLong, s"media/m$i",
      s"payload-$i".getBytes("UTF-8")))

  test("decode covers partitions smaller than DecodeBatchSize and empty partitions") {
    import spark.implicits._
    val n = 5 // << DecodeBatchSize (64)
    // 8 partitions over 5 rows → at least 3 empty partitions and
    // every non-empty one smaller than a batch
    val media = spark.createDataset(rows(n)).repartition(8)
    val out = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(out.length === n)
    assert(out.map(_.doc_id).toSeq === (0L until n.toLong))
    // features equal the direct single-row decode — batching is shape only
    assert(out.toSeq === rows(n).map(Multimodal.decodeStub))
  }

  test("decode of a partition exactly at and one over the batch size") {
    import spark.implicits._
    val n = Multimodal.DecodeBatchSize + 1
    val media = spark.createDataset(rows(n)).coalesce(1)
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length === n)
    assert(out.map(_.doc_id).sorted.toSeq === (0L until n.toLong))
  }

  test("decode of an empty dataset yields an empty result") {
    import spark.implicits._
    val media = spark.emptyDataset[MediaRow].repartition(4)
    assert(Multimodal.decodeFeatures(media).count() === 0L)
  }

  test("empty payload emits no chunk or frame rows (sequence(0,-1) guard)") {
    // Spark's sequence(0, -1) DESCENDS to [0, -1]; without the guard
    // an empty doc would emit spurious chunk/frame rows where the
    // DuckDB oracle emits none
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-doc").toString
    Seq(
      (0L, "", "en", "src0", 0L),
      (1L, "some payload bytes here", "en", "src0", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val chunks = Multimodal.queries3("mm03_chunk_manifest")(spark, dir)
    assert(chunks.filter(org.apache.spark.sql.functions.col("doc_id") === 0L).count() === 0)
    assert(chunks.filter(org.apache.spark.sql.functions.col("doc_id") === 1L).count() === 1)
    val frames = Multimodal.queries2("mm02_frame_sample")(spark, dir)
    assert(frames.filter(org.apache.spark.sql.functions.col("doc_id") === 0L).count() === 0)
    assert(frames.filter(org.apache.spark.sql.functions.col("doc_id") === 1L).count() === 1)
  }

  test("decodeStub is bounded: checksum reads at most 64 bytes") {
    val big = MediaRow(7L, "media/x", Array.fill[Byte](1 << 20)(1))
    val small = MediaRow(7L, "media/x", Array.fill[Byte](64)(1))
    val a = Multimodal.decodeStub(big)
    val b = Multimodal.decodeStub(small)
    assert(a.checksum64 === b.checksum64) // same first-64 prefix
    assert(a.n_bytes === (1L << 20))
  }
}
