package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Multimodal-column plumbing for LLM training-data pipelines.
  *
  * Media (image/audio/video) are carried as opaque `binary` payloads
  * with typed metadata, processed in batches through a typed
  * `Dataset.mapPartitions` — the Scala-side equivalent of a
  * `mapInPandas` batch UDF: the executor sees an iterator per
  * partition, groups it into fixed-size batches (the shape a real
  * decoder library would want), and emits typed feature rows.
  *
  * STUB NOTE: this container has no image/audio codecs, so
  * [[decodeStub]] is a clearly-marked deterministic fake "decoder"
  * (byte length / bounded checksum / synthetic dimensions). The
  * Spark-side plumbing — binary column, metadata schema, batch
  * iteration, partitioning — is real and oracle-checked; swapping
  * [[decodeStub]] for a JNI/codec call is the only change needed for
  * real media.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Batch size handed to the (stubbed) decoder — the tunable that
    * would control decoder memory at scale. */
  val DecodeBatchSize = 64

  /** Opaque media row: payload is a binary column. */
  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Typed decode output. */
  final case class MediaFeat(doc_id: Long, mime: String, n_bytes: Long,
      checksum64: Long, width: Int, height: Int)

  /** STUB decoder: deterministic fake features in place of a real
    * codec (none available in this container). Bounded work per row
    * regardless of payload size (first 64 bytes only). */
  def decodeStub(r: MediaRow): MediaFeat = {
    val checksum = r.payload.take(64).foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeat(r.doc_id, r.mime, r.payload.length.toLong, checksum,
      (r.doc_id % 640 + 1).toInt, (r.doc_id % 480 + 1).toInt)
  }

  /** The batched decode pass: per partition, group rows into
    * [[DecodeBatchSize]] batches and decode each batch (one
    * vectorized call in a real decoder). `grouped` naturally yields
    * a short final batch and nothing for an empty partition, so any
    * partitioning — including partitions smaller than a batch —
    * decodes every row exactly once (MultimodalSpec). */
  def decodeFeatures(media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[MediaFeat] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map(decodeStub)
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // Binary media column → batched mapPartitions decode → typed
    // feature frame. documents.text stands in for the media bytes.
    "mm01_media_features" -> ((s, d) => {
      import s.implicits._
      val media = graft.Tables.documents(s, d)
        .select(col("doc_id"),
          concat(lit("media/"), col("source")).as("mime"),
          col("text").cast(BinaryType).as("payload"))
        .as[MediaRow]
      decodeFeatures(media).toDF().orderBy("doc_id")
    })
  )

  /** Frame-sampling parameters for the video-shaped stub: payload is
    * treated as fixed-size frames; every SampleEvery-th frame is
    * kept. */
  val FrameBytes = 32
  val SampleEvery = 4

  val queries2: Map[String, Q] = Map(
    // Video-shaped frame sampling: payload → frame index space →
    // explode sampled frames → per-frame stub features + a "resize"
    // (metadata transform). The explode/sequence shape is exactly a
    // real frame sampler's plan; only the per-frame decode is fake.
    "mm02_frame_sample" -> ((s, d) =>
      graft.Tables.documents(s, d)
        .select(col("doc_id"),
          col("text").cast(BinaryType).as("payload"),
          length(col("text")).as("n_chars"))
        .withColumn("n_frames", expr(s"CAST(ceil(n_chars / $FrameBytes.0) AS INT)"))
        // same empty guard as mm03: sequence(0, -1) = [0, -1] in
        // Spark, and the filter would keep the spurious frame 0
        .withColumn("frame_idx",
          explode(expr(
            s"""CASE WHEN n_frames <= 0 THEN CAST(array() AS ARRAY<INT>)
               |ELSE filter(sequence(0, n_frames - 1), i -> i % $SampleEvery = 0) END""".stripMargin)))
        .select(
          col("doc_id"), col("frame_idx"),
          // stub per-frame feature: first byte of the frame (ASCII corpus)
          expr(s"CAST(ascii(substring(CAST(payload AS STRING), frame_idx * $FrameBytes + 1, 1)) AS INT)")
            .as("first_byte"),
          // "resize": deterministic metadata transform of the fake dims
          expr("CAST((doc_id % 640 + 1) DIV 2 AS INT)").as("resized_w"),
          expr("CAST((doc_id % 480 + 1) DIV 2 AS INT)").as("resized_h"))
        .orderBy("doc_id", "frame_idx"))
  )

  /** Chunk size for the mm03 manifest. */
  val ChunkBytes = 64

  val queries3: Map[String, Q] = Map(
    // Chunk-digest manifest: fixed-size chunks of the media payload,
    // one digest row each — the content-addressable index media
    // dedup/delta-sync pipelines build before any byte shipping.
    // explode(sequence) over in-row offsets: embarrassingly parallel,
    // no shuffle until the sort. (Text stands in for the payload —
    // ASCII corpus, byte length == char length, mm01 precedent.)
    "mm03_chunk_manifest" -> ((s, d) =>
      graft.Tables.documents(s, d)
        .withColumn("n_chunks", expr(s"CAST(ceil(length(text) / $ChunkBytes.0) AS INT)"))
        // empty guard: Spark's sequence(0, -1) DESCENDS to [0, -1]
        // (default step -1) where DuckDB's generate_series yields [] —
        // an empty payload must emit no chunk rows in both engines
        .withColumn("chunk_idx", explode(expr(
          "CASE WHEN n_chunks <= 0 THEN CAST(array() AS ARRAY<INT>) ELSE sequence(0, n_chunks - 1) END")))
        .select(col("doc_id"), col("chunk_idx").cast("int").as("chunk_idx"),
          expr(s"substring(md5(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)), 1, 16)")
            .as("chunk_md5"),
          expr(s"CAST(length(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS INT)")
            .as("chunk_len"))
        .orderBy("doc_id", "chunk_idx"))
  )

  val oracle3: Map[String, String] = Map(
    "mm03_chunk_manifest" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |         CAST(ceil(strlen(text) / $ChunkBytes.0) AS INT) AS n_chunks
         |  FROM documents
         |),
         |x AS (
         |  SELECT doc_id, text,
         |         unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
         |  FROM c
         |)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |       substring(md5(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)), 1, 16) AS chunk_md5,
         |       CAST(strlen(substring(text, chunk_idx * $ChunkBytes + 1, $ChunkBytes)) AS INT) AS chunk_len
         |FROM x ORDER BY doc_id, chunk_idx""".stripMargin
  )

  val oracle2: Map[String, String] = Map(
    "mm02_frame_sample" ->
      s"""WITH f AS (
         |  SELECT doc_id, text, CAST(ceil(strlen(text) / $FrameBytes.0) AS INT) AS n_frames
         |  FROM documents
         |),
         |fr AS (
         |  SELECT doc_id, text,
         |         unnest(list_filter(generate_series(0, n_frames - 1), i -> i % $SampleEvery = 0)) AS frame_idx
         |  FROM f
         |)
         |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
         |       CAST(unicode(substr(text, frame_idx * $FrameBytes + 1, 1)) AS INT) AS first_byte,
         |       CAST((doc_id % 640 + 1) // 2 AS INT) AS resized_w,
         |       CAST((doc_id % 480 + 1) // 2 AS INT) AS resized_h
         |FROM fr ORDER BY doc_id, frame_idx""".stripMargin
  )

  /** Oracle: the stub's arithmetic re-expressed over the (ASCII)
    * text — byte length == char length and byte value == codepoint
    * for this corpus, which keeps the plumbing verifiable. */
  val oracle: Map[String, String] = Map(
    "mm01_media_features" ->
      """SELECT doc_id,
        |  'media/' || source AS mime,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(generate_series(1, least(strlen(text), 64)),
        |                     i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))),
        |    (a, b) -> a + b) AS BIGINT) AS checksum64,
        |  CAST(doc_id % 640 + 1 AS INT) AS width,
        |  CAST(doc_id % 480 + 1 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
