package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, concat_ws}

/** Persisted form of the incremental-dedup corpus index
  * (SURVEY.md §2 extension; the 100 TB ingest layout).
  *
  * dd13/st05 derive the band index and signature frame from the
  * session-memoized minhash stage each run — correct, but at corpus
  * scale the index must live on disk and the per-batch probe must do
  * batch-proportional work against it. This object writes both frames
  * ONCE as bucketed parquet tables:
  *
  *   - `<prefix>_bands` (bkey, corpus_doc), bucketed by `bkey` =
  *     "band:key" — the band-probe join key. A probe batch shuffles
  *     only ITSELF into the corpus bucket layout; the corpus-sized
  *     side is read pre-partitioned, no exchange.
  *   - `<prefix>_sigs` (corpus_doc, b_sig_0..k-1), bucketed by
  *     `corpus_doc` — the signature-verify join key; same property.
  *
  * The band id is FOLDED INTO the bucket key rather than kept as a
  * second join column: Spark only reuses a bucket layout when the
  * partitioning covers the join keys exactly (the
  * requireAllClusterKeysForCoPartition default — measured here, a
  * (band, key) join over a key-only layout falls back to shuffling
  * both sides, with the scan stamped "Bucketed: false (disabled by
  * query planner)"). Maintenance is append-only: each accepted
  * batch's bands/sigs are inserted into the same bucketed tables
  * (bucketBy is stable under append), so corpus text is never
  * re-signed.
  *
  * BandIndexSpec proves the plan property: with broadcast disabled,
  * the probe's physical plan contains NO shuffle exchange above either
  * persisted corpus scan, and the decisions are row-identical to
  * dd13's derived-frame output.
  */
object BandIndex {

  val Buckets = 8

  def bandsTable(prefix: String): String = s"${prefix}_bands"
  def sigsTable(prefix: String): String = s"${prefix}_sigs"

  /** Write the corpus band index + signature table as bucketed
    * external tables under `path`, registered as
    * `<prefix>_bands` / `<prefix>_sigs`. */
  def persist(spark: SparkSession, dir: String, path: String,
      prefix: String = "graft_corpus"): Unit = {
    val (bands, sigs) = Dedup.corpusIndex(spark, dir)
    bands
      .select(concat_ws(":", col("band"), col("key")).as("bkey"),
        col("corpus_doc"))
      .write
      .bucketBy(Buckets, "bkey").sortBy("bkey")
      .option("path", s"$path/bands")
      .mode(SaveMode.Overwrite)
      .saveAsTable(bandsTable(prefix))
    sigs.write
      .bucketBy(Buckets, "corpus_doc").sortBy("corpus_doc")
      .option("path", s"$path/sigs")
      .mode(SaveMode.Overwrite)
      .saveAsTable(sigsTable(prefix))
  }

  /** The incremental-batch decision table probed against the
    * PERSISTED index — same dataflow and output as dd13, but the
    * corpus side of every join reads the bucketed tables. */
  def probe(spark: SparkSession, dir: String,
      prefix: String = "graft_corpus"): DataFrame =
    Dedup.incrementalDecisions(spark, dir,
      spark.table(bandsTable(prefix)), spark.table(sigsTable(prefix)))

  // Idempotent persist registry for the dd15/dd16 catalog entries:
  // one bucketed index per (session, dir, tag), written to a fresh
  // temp path on first use and reused afterwards — the bench's
  // repeated sweeps (and BenchCold's memo-clearing resets) re-time
  // the PROBE, not the index build, which is the production read
  // path: the index is a durable artifact maintained by append, not
  // per-query state. The prefix is dir- and tag-scoped so multi-dir
  // sessions (ScaleStress 1×/N×) never collide in the session
  // catalog, and dd16's APPEND mutations never leak into dd15's
  // pristine index. Guarded by a lock against racing double-writes
  // (same discipline as Dedup.memoFrame).
  private val persistedFor =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]
  private val persistLock = new Object

  def ensurePersisted(spark: SparkSession, dir: String,
      tag: String = "dd15"): String = {
    val key = (spark, dir, tag)
    persistedFor.get(key).getOrElse(persistLock.synchronized {
      persistedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      persistedFor.getOrElseUpdate(key, {
        val prefix = s"graft_corpus_${tag}_${Integer.toHexString(dir.hashCode)}"
        val path = java.nio.file.Files
          .createTempDirectory(s"graft-bandidx-$tag").toString
        persist(spark, dir, path, prefix)
        prefix
      })
    })
  }

  /** Day-N+1 MAINTENANCE: append an admitted batch's band and
    * signature rows to the persisted index — the step the dd13/dd15
    * scaladocs promise ("append-only; corpus text is never
    * re-signed"), here made real and testable. `admitted` is a
    * (doc_id) frame of batch docs the decision table called novel
    * (dup_of null). `bucketBy` is STABLE under append: the new file
    * set hashes into the same `Buckets` bucket ids as the original
    * write, so the probe's no-corpus-exchange plan property survives
    * (BandIndexSpec re-asserts it post-append). Only the batch's
    * signature rows move — |admitted|·Bands band rows and |admitted|
    * signature rows, never the corpus. */
  def append(spark: SparkSession, dir: String, admitted: DataFrame,
      prefix: String): Unit = {
    val adm = admitted.select(col(admitted.columns.head).as("doc_id"))
    val sigs = Dedup.minhashSignatures(spark, dir).join(adm, "doc_id")
    val bandKeys = (0 until Dedup.Bands).map(b =>
      concat_ws(":", col(s"sig_${2 * b}"), col(s"sig_${2 * b + 1}")))
    sigs
      .select(col("doc_id").as("corpus_doc"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.array(bandKeys: _*)).as(Seq("band", "key")))
      .select(concat_ws(":", col("band"), col("key")).as("bkey"), col("corpus_doc"))
      .write.mode(SaveMode.Append)
      .bucketBy(Buckets, "bkey").sortBy("bkey")
      .saveAsTable(bandsTable(prefix))
    sigs.toDF("corpus_doc" +: (0 until Dedup.MinhashK).map(j => s"b_sig_$j"): _*)
      .write.mode(SaveMode.Append)
      .bucketBy(Buckets, "corpus_doc").sortBy("corpus_doc")
      .saveAsTable(sigsTable(prefix))
  }

  // Run-once guard for dd16's maintenance step: the decision→append
  // cycle mutates the index, so a bench's repeated sweeps must not
  // stack duplicate appends (the probe's distinct/argmax absorbs
  // duplicates — output stays correct either way — but storage and
  // honesty don't). Keyed like persistedFor.
  private val appendedFor =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), Boolean]

  /** Probe the index, append the batch docs judged NOVEL (dup_of
    * null), once per (session, dir, prefix). */
  def appendNovelOnce(spark: SparkSession, dir: String, prefix: String): Unit = {
    val key = (spark, dir, prefix)
    if (!appendedFor.contains(key)) persistLock.synchronized {
      appendedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      if (!appendedFor.contains(key)) {
        val novel = probe(spark, dir, prefix)
          .filter(col("dup_of").isNull)
          .select(col("batch_doc").as("doc_id"))
        append(spark, dir, novel, prefix)
        appendedFor(key) = true
      }
    }
  }

  /** Drop the registered tables (files under `path` are external and
    * survive; callers own that directory's lifecycle). */
  def drop(spark: SparkSession, prefix: String = "graft_corpus"): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${bandsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${sigsTable(prefix)}")
  }
}
