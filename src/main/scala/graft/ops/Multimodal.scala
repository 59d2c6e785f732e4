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
      media.mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          // a real decoder would process `batch` as one vectorized call
          batch.iterator.map(decodeStub)
        }
      }.toDF().orderBy("doc_id")
    })
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
