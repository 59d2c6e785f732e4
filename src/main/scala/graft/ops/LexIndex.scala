package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, expr, hash, lit, pmod, row_number, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Persisted form of the BM25 inverted index — [[VecIndex]]'s
  * lifecycle applied to the LEXICAL retrieval lane (round-15 VERDICT
  * item 1).
  *
  * tx15 derives the inverted index in-session each run: every
  * execution pays tokenize → postings aggregate → df/dl stats over
  * the raw corpus before any query work happens. Correct, but at
  * corpus scale that build IS the index — the expensive artifact a
  * production lexical retriever (Lucene/Elasticsearch) persists once
  * and serves from forever. This object writes it ONCE as bucketed
  * parquet tables:
  *
  *   - `<prefix>_postings` (term, doc_id, tf, dl, ingest_batch),
  *     bucketed AND sorted by `term` — the probe key. The row is
  *     COVERING: `dl` (the doc's token count, BM25's length-norm
  *     input) rides on every posting so the probe never joins a
  *     doc-side table — the lexical analog of the covering-cells
  *     layout ([[VecIndex.persistCovering]]), paying one extra long
  *     per posting at write time to delete a corpus-sized join from
  *     every read.
  *   - `<prefix>_docstats` (doc_id, dl, ingest_batch), bucketed by
  *     `doc_id` — Lucene's norms file: the per-doc length table,
  *     read ONLY by maintenance (retire's dl lookup, compact's stats
  *     rebuild), never by the probe.
  *   - `<prefix>_stats` (ingest_batch, n_docs, sum_dl) — one row per
  *     ingest batch; the probe sums this batch-count-sized table to
  *     recover the corpus stats, so an append maintains global state
  *     by writing ONE row, never re-aggregating the corpus.
  *
  * The probe ([[probe]]) is the serving read path: the fixed query
  * workload's term set is pushed as an `IN` filter on the bucketed
  * `term` column (bucket-pruned, footer-pruned scan — only matched
  * postings are ever read), df per term falls out of counting the
  * matched postings, and the corpus stats arrive as a 1-row
  * broadcast. Scoring, 6-dp rounding, DECIMAL-exact per-(query,doc)
  * summation and the partial-WindowGroupLimit top-k are tx15's, line
  * for line — the decisions are DEFINED identical, so tx16 shares
  * tx15's oracle: a divergence means persistence changed the
  * dataflow's semantics. Round15OpsSpec proves the plan property:
  * the probe plan contains NO scan of the raw documents parquet and
  * no tokenizer expression — the corpus build is GONE from the read
  * path.
  *
  * Lifecycle — the three verbs the BandIndex/VecIndex families
  * established, proven under the same oracle gate:
  *   - [[append]] (tx17): a NEW document batch tokenizes ONLY
  *     itself (tf/dl are doc-local — the batch's postings are
  *     exactly the full build's postings for those docs), appends
  *     postings + docstats + ONE stats row under a fresh
  *     `ingest_batch` stamp.
  *   - [[compact]] (tx18): [[BandIndex.compactTable]]'s per-bucket
  *     local rewrite over both bucketed tables (one file per bucket,
  *     zero exchange), pending tombstones physically purged, stats
  *     re-based to a single row recomputed from the surviving
  *     docstats.
  *   - [[retire]] (tx19): right-to-be-forgotten for documents — the
  *     retired ids land in a tombstone table (O(retired) write; dl
  *     recorded at retire time from the norms table so the stats
  *     correction never rescans anything), probes mask them with a
  *     broadcast anti-join AND subtract their (count, Σdl) from the
  *     corpus stats, so a retired doc vanishes from ranks, df, idf
  *     and length normalization alike — exactly what the oracle's
  *     `doc_id NOT IN (...)` replay demands.
  *
  * 100 TB posture: the build pays one corpus tokenize (once, not per
  * query); the probe exchanges matched postings only (query-vocab
  * bucket pruning upstream of everything); maintenance is
  * batch-proportional. The serving delta vs tx15 is the entire
  * corpus-side build — see SCALE_NOTES.md's third-decade row.
  */
object LexIndex {

  val Buckets = 8

  def postingsTable(prefix: String): String = s"${prefix}_postings"
  def docstatsTable(prefix: String): String = s"${prefix}_docstats"
  def statsTable(prefix: String): String = s"${prefix}_stats"

  import TextAnalysis.{tokensExpr, Bm25K1, Bm25B, Bm25TopK, Bm25Queries}

  /** Tokenized view of a document frame: (doc_id, tokens, dl).
    * `dl` carries tx15's exact semantics (CAST(size AS BIGINT) of the
    * tokenizer output — null for null text, matching the oracle's
    * `len(tokens)` null propagation). */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(tokensExpr).as("tokens"))
      .withColumn("dl", expr("CAST(size(tokens) AS BIGINT)"))

  /** Build and persist the inverted index over `docs` (defaults to
    * the full corpus; the lifecycle cycles build from a slice and
    * grow via [[append]]). One tokenize pass feeds the postings
    * aggregate — a single (doc_id, term, dl) shuffle, tf counted
    * map-side — and one feeds the norms table; the stats row is
    * aggregated from the WRITTEN norms table (batch-count-sized
    * read), not a third corpus pass. */
  def persist(spark: SparkSession, dir: String, path: String,
      prefix: String, docs: Option[DataFrame] = None): Unit = {
    val base = docs.getOrElse(Tables.documents(spark, dir))
    writeBatch(spark, tokenized(base), path, prefix,
      BandIndex.BaseBatch, firstWrite = true)
  }

  /** Shared build/append writer: postings + docstats + one stats row
    * for a tokenized batch, stamped `batch`. */
  private def writeBatch(spark: SparkSession, tok: DataFrame, path: String,
      prefix: String, batch: Long, firstWrite: Boolean): Unit = {
    val mode = if (firstWrite) SaveMode.Overwrite else SaveMode.Append
    // dl is functionally dependent on doc_id, so folding it into the
    // group key keeps the build a single shuffle (no corpus-sized
    // dl-join back): explode → groupBy(doc_id, term, dl) → count.
    // Impact metadata (tx20, round 15): each posting carries its
    // within-term IMPACT RANK — tf desc (more occurrences score
    // higher under BM25's monotone tf saturation), dl asc (shorter
    // docs normalize higher), doc_id tiebreak — and the term's df,
    // both computed over THIS batch. On the fresh base build these
    // are the global values; appends stamp batch-local ones, which
    // go stale until a rebuild — the standard impact-ordered-index
    // contract (Anh & Moffat): impact order refreshes at merge
    // time. tx16's probe ignores both columns (exact df recomputed
    // from matched postings, no cap); only tx20's capped probe
    // reads them, and its catalog entry serves the fresh base
    // build.
    val wImp = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("dl").asc, col("doc_id").asc)
    val postings = tok
      .select(col("doc_id"), col("dl"),
        org.apache.spark.sql.functions.explode_outer(col("tokens")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("imp_rank", row_number().over(wImp))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("imp_rank"), col("df"))
      .withColumn("ingest_batch", lit(batch))
    // sortBy (term, imp_rank): within a bucket each term's postings
    // lie in an impact-ascending run, so at real scale the capped
    // probe's `imp_rank <= C` pushed filter prunes the row groups
    // beyond the cap for high-df terms — bytes ∝ terms × C, not df.
    val pw = postings.write
      .bucketBy(Buckets, "term").sortBy("term", "imp_rank")
      .mode(mode)
    (if (firstWrite) pw.option("path", s"$path/postings") else pw)
      .saveAsTable(postingsTable(prefix))

    val docstats = tok.select(col("doc_id"), col("dl"))
      .withColumn("ingest_batch", lit(batch))
    val dw = docstats.write
      .bucketBy(Buckets, "doc_id").sortBy("doc_id")
      .mode(mode)
    (if (firstWrite) dw.option("path", s"$path/docstats") else dw)
      .saveAsTable(docstatsTable(prefix))

    // ONE row of global state per batch — aggregated from THIS
    // batch's docstats frame, not a stamp-filtered table read-back:
    // a read-back keyed on ingest_batch double-counts every earlier
    // row carrying the same stamp (append's default batch = 0L made
    // stamp collision the default), silently inflating n_docs/sum_dl
    // and corrupting idf + length normalization. Aggregating the
    // in-scope frame makes each append contribute exactly its own
    // row whatever the stamp, at the cost of one extra tokenize
    // execution at build time.
    val st = docstats
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(lit(batch).as("ingest_batch"), col("n_docs"), col("sum_dl"))
      .coalesce(1)
    val sw = st.write.mode(mode)
    (if (firstWrite) sw.option("path", s"$path/stats") else sw)
      .saveAsTable(statsTable(prefix))
  }

  /** Append a NEW document batch: tokenize the batch only (tf and dl
    * are doc-local, so batch postings ≡ the full build's postings for
    * those docs), append under a fresh stamp. Batch-proportional —
    * the existing index is never read, let alone rewritten. */
  def append(spark: SparkSession, dir: String, newDocs: DataFrame,
      prefix: String, batch: Long = 0L): Unit = {
    writeBatch(spark, tokenized(newDocs), path = "", prefix = prefix,
      batch = batch, firstWrite = false)
  }

  /** Current tombstones as (retired_id, dl), or None. dl was recorded
    * at retire time ([[retire]]), so the probe's stats correction is
    * an aggregate over this O(retired) frame. */
  private def tombstones(spark: SparkSession, prefix: String): Option[DataFrame] = {
    val t = BandIndex.tombstonesTable(prefix)
    if (!spark.catalog.tableExists(t)) None
    else { spark.catalog.refreshTable(t); Some(spark.table(t)) }
  }

  /** Retire documents (right-to-be-forgotten): record (doc_id, dl)
    * tombstones — dl looked up in the norms table (the one read this
    * table exists for), already-retired ids excluded so a double
    * retire can't double-subtract from the stats. Probes mask +
    * correct immediately; [[compact]] purges physically. */
  def retire(spark: SparkSession, prefix: String, docIds: DataFrame): Unit = {
    val ids = broadcast(docIds
      .select(col(docIds.columns.head).cast("long").as("rid")))
    val norms = spark.table(docstatsTable(prefix))
    var expired = norms.join(ids, norms("doc_id") === col("rid"))
      .select(col("doc_id").as("retired_id"), col("dl"))
    tombstones(spark, prefix).foreach { ts =>
      expired = expired.join(broadcast(ts.select(col("retired_id").as("already"))),
        col("retired_id") === col("already"), "left_anti")
    }
    val t = BandIndex.tombstonesTable(prefix)
    val w = expired.coalesce(1).write.mode(SaveMode.Append)
    if (spark.catalog.tableExists(t)) w.saveAsTable(t)
    else w.option("path",
      s"${BandIndex.indexRootOf(spark, postingsTable(prefix))}/tombstones")
      .saveAsTable(t)
  }

  /** Compact both bucketed tables (one file per bucket, per-bucket
    * local rewrite — [[BandIndex.compactTable]]'s plan), physically
    * purging pending tombstones, then re-base the stats table to ONE
    * row recomputed from the surviving norms and clear the
    * tombstones. Probe decisions are unchanged — the masks were
    * already hiding exactly the purged rows. */
  def compact(spark: SparkSession, prefix: String): Unit = {
    val tomb = tombstones(spark, prefix).map(_.select("retired_id"))
    BandIndex.compactTable(spark, postingsTable(prefix), "term",
      tomb, minusIdCol = "doc_id")
    BandIndex.compactTable(spark, docstatsTable(prefix), "doc_id",
      tomb, minusIdCol = "doc_id")
    val st = spark.table(docstatsTable(prefix))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(lit(BandIndex.BaseBatch).as("ingest_batch"),
        col("n_docs"), col("sum_dl"))
      .coalesce(1)
    // Re-base via an EXTERNAL-location swap (compactTable's pattern).
    // A bare saveAsTable(Overwrite) would silently re-create the
    // table as MANAGED under the persistent spark-warehouse — files
    // that outlive the JVM and collide with the next session's
    // fresh-serial prefix (the exact failure the driver's full
    // verify surfaced on tx18's second run).
    swapTable(spark, statsTable(prefix), "compact") { (tmpT, newLoc) =>
      st.write.option("path", newLoc).saveAsTable(tmpT)
    }
    BandIndex.clearTombstones(spark, prefix)
  }

  /** The EXTERNAL-location rename swap shared by the stats re-base
    * and [[reindexImpact]]: `write(tmpTable, newLocation)` lays the
    * replacement down, then the live name swings over with
    * crash-safe ordering (compactTable's discipline). Failure
    * handling closes the retry wedge a bare swap leaves: on a failed
    * promotion the ORIGINAL registration is restored, the temp table
    * AND its files are removed (so a retry's saveAsTable cannot hit
    * TableAlreadyExists), and a rollback failure is logged rather
    * than silently swallowed. */
  private def swapTable(spark: SparkSession, table: String, tag: String)(
      write: (String, String) => Unit): Unit = {
    val catalog = spark.sessionState.catalog
    val oldLoc = catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
      .location.toString
    val newLoc = oldLoc.stripSuffix("/") + s"_$tag${serial.incrementAndGet()}"
    val tmpT = s"${table}_$tag"
    write(tmpT, newLoc)
    val oldT = s"${table}_old${serial.incrementAndGet()}"
    spark.sql(s"ALTER TABLE $table RENAME TO $oldT")
    try spark.sql(s"ALTER TABLE $tmpT RENAME TO $table")
    catch {
      case e: Throwable =>
        try spark.sql(s"ALTER TABLE $oldT RENAME TO $table")
        catch {
          case r: Throwable => System.err.println(
            s"[lexindex] ROLLBACK FAILED for $table (recover manually from " +
              s"$oldT at $oldLoc): ${r.getMessage}")
        }
        try {
          spark.sql(s"DROP TABLE IF EXISTS $tmpT")
          deleteDir(newLoc.stripPrefix("file:"))
        } catch { case _: Throwable => () }
        throw e
    }
    spark.sql(s"DROP TABLE $oldT")
    deleteDir(oldLoc.stripPrefix("file:"))
  }

  /** Corpus stats as a 1-row frame (n_docs, sum_dl): the sum of the
    * batch-count-sized stats table, minus the tombstoned docs'
    * contribution (count and Σdl both recorded at retire time —
    * nothing here scales with the corpus). */
  private def statsFrame(spark: SparkSession, prefix: String): DataFrame = {
    spark.catalog.refreshTable(statsTable(prefix))
    val base = spark.table(statsTable(prefix))
      .agg(sum(col("n_docs")).as("nd0"), sum(col("sum_dl")).as("sd0"))
    tombstones(spark, prefix) match {
      case None => base.select(col("nd0").as("n_docs"), col("sd0").as("sum_dl"))
      case Some(ts) =>
        val corr = ts.agg(count(lit(1)).as("ndr"),
          coalesce(sum(col("dl")), lit(0L)).as("sdr"))
        base.crossJoin(broadcast(corr))
          .select((col("nd0") - col("ndr")).as("n_docs"),
            (col("sd0") - col("sdr")).as("sum_dl"))
    }
  }

  /** BM25 top-k SERVING against the persisted index — tx15's scoring
    * dataflow with the corpus build deleted from the read path. The
    * query term set is a literal `IN` filter on the bucketed `term`
    * column (bucket- and footer-pruned scan: only matched postings
    * are read), df counts the matched postings, stats broadcast from
    * the 1-row [[statsFrame]]. Output = tx15's, column for column. */
  def probe(spark: SparkSession, dir: String, prefix: String): DataFrame = {
    val qt = spark.sql(
      s"SELECT query_id, term FROM (VALUES ${TextAnalysis.bm25Values}) AS q(query_id, term)")
    val terms = Bm25Queries.flatMap(_._2).distinct
    spark.catalog.refreshTable(postingsTable(prefix))
    // the impact metadata (imp_rank, stored df) belongs to tx20's
    // capped lane; the EXACT probe recomputes df from the matched
    // postings (correct under appends and tombstones) — drop the
    // stored columns so they can't shadow the live aggregate
    val matchedAll = spark.table(postingsTable(prefix))
      .filter(col("term").isin(terms: _*))
      .drop("imp_rank", "df")
    val matched = tombstones(spark, prefix).fold(matchedAll)(ts =>
      matchedAll.join(broadcast(ts.select("retired_id")),
        matchedAll("doc_id") === col("retired_id"), "left_anti"))
    val dfc = matched.groupBy("term").agg(count(lit(1)).as("df"))
    scoreRankTopK(matched
      .join(broadcast(dfc), Seq("term"))
      .join(broadcast(qt), Seq("term"))
      .crossJoin(broadcast(statsFrame(spark, prefix))))
  }

  /** tx15's scoring/ranking tail, shared VERBATIM by the exact
    * ([[probe]]) and capped ([[impactProbe]]) serving lanes so the
    * oracle-hash-checked arithmetic (6-dp rounded per-term scores,
    * DECIMAL-exact per-(query,doc) summation, the (bm25 desc,
    * doc_id) tie-break) can never diverge between them. `cands`
    * carries (query_id, doc_id, tf, dl, df, n_docs, sum_dl) — the
    * lanes differ only in how candidates and df are produced. */
  private def scoreRankTopK(cands: DataFrame): DataFrame = {
    val scored = cands.withColumn("score", expr(
      s"""round(
         |  ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |           / (CAST(df AS DOUBLE) + 0.5))
         |  * (CAST(tf AS DOUBLE) * ($Bm25K1 + 1.0))
         |  / (CAST(tf AS DOUBLE)
         |     + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * CAST(dl AS DOUBLE)
         |                  * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))),
         |  6)""".stripMargin))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum(col("score").cast(DecimalType(18, 8))).cast(DoubleType).as("bm25"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("doc_id").asc)
    perDoc.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= Bm25TopK)
      .select(col("query_id"), col("rk").cast("int").as("rk"),
        col("doc_id"), col("bm25"), col("n_terms"))
      .orderBy("query_id", "rk")
  }

  private def deleteDir(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete(); ()
    }
    rec(new java.io.File(path))
  }

  /** Per-term candidate cap for the impact-ordered probe (tx20). */
  val ImpactCap = 64

  /** BM25 top-k with an IMPACT-ORDERED candidate cap (tx20, round
    * 15) — the approximation family (Anh & Moffat's impact-ordered
    * indexes; MaxScore/WAND's goal by storage layout) that makes
    * lexical top-k SUBLINEAR in document frequency: only each query
    * term's top-[[ImpactCap]] postings by impact order (tf desc,
    * dl asc — BM25's term score is monotone up in tf, down in dl)
    * are read and scored, then ranked exactly. The cap is pushed to
    * the scan as `imp_rank <= C` alongside the term `IN` — with the
    * postings sorted (term, imp_rank), high-df terms' beyond-cap row
    * groups prune by footer min/max, so probe bytes are
    * ∝ terms × C instead of ∝ Σ df. df for scoring rides the
    * posting row (build-time global — see the writeBatch note);
    * corpus stats broadcast from [[statsFrame]]. Deterministic by
    * construction: the oracle replays the identical cap, so the
    * APPROXIMATION ITSELF is hash-checked, not compared against the
    * uncapped answer. Round15OpsSpec additionally measures the
    * capped/uncapped rank agreement at the fixture scale. */
  def impactProbe(spark: SparkSession, dir: String, prefix: String): DataFrame = {
    val qt = spark.sql(
      s"SELECT query_id, term FROM (VALUES ${TextAnalysis.bm25Values}) AS q(query_id, term)")
    val terms = Bm25Queries.flatMap(_._2).distinct
    spark.catalog.refreshTable(postingsTable(prefix))
    val cappedAll = spark.table(postingsTable(prefix))
      .filter(col("term").isin(terms: _*) && col("imp_rank") <= ImpactCap)
    val capped = tombstones(spark, prefix).fold(cappedAll)(ts =>
      cappedAll.join(broadcast(ts.select("retired_id")),
        cappedAll("doc_id") === col("retired_id"), "left_anti"))
    scoreRankTopK(capped
      .join(broadcast(qt), Seq("term"))
      .crossJoin(broadcast(statsFrame(spark, prefix))))
  }

  /** REBUILD the impact metadata globally (tx21) — the maintenance
    * verb dq08's reindex flag triggers: appends stamp BATCH-LOCAL
    * imp_rank/df (a batch knows nothing of the resident postings),
    * so after enough arrivals the capped probe's per-term top-C
    * drifts from the true global impact order and the stored df
    * undercounts. This rewrites the postings with imp_rank and df
    * recomputed over the WHOLE resident table — one bounded window
    * per term partition, re-written bucketed (term, imp_rank) via
    * the external-location swap (a bare managed overwrite would
    * leak warehouse files across JVMs — the tx18 lesson). The
    * production analog is the merge/optimize pass every
    * impact-ordered index runs (Anh & Moffat; Lucene's
    * forceMerge). */
  def reindexImpact(spark: SparkSession, prefix: String): Unit = {
    val t = postingsTable(prefix)
    spark.catalog.refreshTable(t)
    val wImp = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("dl").asc, col("doc_id").asc)
    val fresh = spark.table(t)
      .select("term", "doc_id", "tf", "dl")
      .withColumn("imp_rank", row_number().over(wImp))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("ingest_batch", lit(BandIndex.BaseBatch))
    swapTable(spark, t, "reindex") { (tmpT, newLoc) =>
      fresh.write
        .bucketBy(Buckets, "term").sortBy("term", "imp_rank")
        .option("path", newLoc)
        .saveAsTable(tmpT)
    }
  }

  /** tx21: the dq08→reindex maintenance cycle made observable —
    * fresh index on 3/4 of the corpus, append the arriving quarter
    * (impact metadata now batch-local/stale), [[reindexImpact]],
    * then the capped probe: the result must equal the GLOBAL-cap
    * oracle (tx20's SQL over the full corpus) — a divergence means
    * the rebuild failed to restore global impact order or df. */
  def reindexCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val docs = Tables.documents(spark, dir)
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(docs.filter(!isNewDoc)))
    }
    Phases.time(tag, "append") {
      append(spark, dir, docs.filter(isNewDoc), prefix)
    }
    Phases.time(tag, "reindex") { reindexImpact(spark, prefix) }
    val dec = Phases.time(tag, "probe") {
      impactProbe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** Drop the registered tables (files are external; the temp-dir
    * lifecycle owns them). */
  def drop(spark: SparkSession, prefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${postingsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${docstatsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${statsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${BandIndex.tombstonesTable(prefix)}")
  }

  // Idempotent persist registry — same shape and rationale as
  // VecIndex.ensurePersisted: the index is a durable artifact, the
  // bench's repeated sweeps re-time the PROBE (the production read
  // path), temp dirs ride BandIndex's shutdown-hook cleanup.
  private val persistedFor =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]
  private val persistLock = new Object
  private val serial = new java.util.concurrent.atomic.AtomicLong(0)

  def ensurePersisted(spark: SparkSession, dir: String,
      tag: String = "tx16"): String = {
    val key = (spark, dir, tag)
    persistedFor.get(key).getOrElse(persistLock.synchronized {
      persistedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      persistedFor.getOrElseUpdate(key, {
        val prefix = s"graft_lex_${tag}_${Integer.toHexString(dir.hashCode)}" +
          s"_s${serial.incrementAndGet()}"
        val path = BandIndex.newTempDir(s"lex$tag")
        persist(spark, dir, path, prefix)
        prefix
      })
    })
  }

  // ------------------------------------------------------------------
  // Fresh lifecycle cycles (tx17/tx18/tx19) — honest bench timing: a
  // fresh index per invocation, per-phase wall times in tools.Phases,
  // the final probe materialized INSIDE the cycle (the sim15–17
  // template).
  // ------------------------------------------------------------------

  private val lastCycle =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), (String, String)]

  private def freshIndex(spark: SparkSession, dir: String, tag: String,
      docs: Option[DataFrame]): (String, String) = {
    val key = (spark, dir, tag)
    persistLock.synchronized {
      lastCycle.remove(key).foreach { case (oldPrefix, oldPath) =>
        drop(spark, oldPrefix)
        BandIndex.retireTempDir(oldPath)
      }
      lastCycle.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    }
    val prefix = s"graft_lex_${tag}_${Integer.toHexString(dir.hashCode)}" +
      s"_s${serial.incrementAndGet()}"
    val path = BandIndex.newTempDir(s"lex$tag")
    persist(spark, dir, path, prefix, docs)
    (prefix, path)
  }

  /** Deterministic new-document predicate for the lifecycle fixtures:
    * ~1/4 of the corpus arrives as the "new" batch. The FINAL index
    * always equals the full corpus, so tx17/tx18 share tx15's
    * oracle. */
  private def isNewDoc: org.apache.spark.sql.Column =
    pmod(hash(col("doc_id")), lit(4)) === lit(0)

  /** tx17: fresh index on 3/4 of the corpus → append the remaining
    * 1/4 → probe. tf/dl are doc-local, so the union of the two
    * builds' postings equals the full build's — a divergence from
    * tx15's oracle means append broke the layout or the stats. */
  def appendCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val docs = Tables.documents(spark, dir)
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(docs.filter(!isNewDoc)))
    }
    Phases.time(tag, "append") {
      append(spark, dir, docs.filter(isNewDoc), prefix)
    }
    val dec = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** tx18: tx17's cycle with the append split into 3 disjoint
    * day-slices (the file-growth regime) and a compaction before the
    * probe — same oracle, plus Round15OpsSpec's file-count
    * assertion. */
  def compactCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val docs = Tables.documents(spark, dir)
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(docs.filter(!isNewDoc)))
    }
    Phases.time(tag, "append") {
      // pmod(h,12) ∈ {0,4,8} partitions pmod(h,4)=0 into 3 slices
      Seq(0, 4, 8).foreach { r =>
        append(spark, dir,
          docs.filter(pmod(hash(col("doc_id")), lit(12)) === lit(r)),
          prefix, batch = r.toLong)
      }
    }
    Phases.time(tag, "compact") { compact(spark, prefix) }
    val dec = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** tx19: retention made OBSERVABLE by construction — probe the full
    * index (phase 0), retire exactly the distinct documents phase 0
    * returned (bounded ≤ queries×k — the right-to-be-forgotten
    * shape), re-probe (phase 1): ranks, df, idf AND length
    * normalization must all re-settle over the surviving corpus. The
    * oracle replays phase 1 with `doc_id NOT IN (phase-0 docs)`. */
  def retentionCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, None)
    }
    val dec0 = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    val expired = dec0.select(col("doc_id")).distinct()
    Phases.time(tag, "retire") { retire(spark, prefix, expired) }
    val dec1 = Phases.time(tag, "reprobe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec0.select(lit(0).as("phase"), col("query_id"), col("rk"),
        col("doc_id"), col("bm25"), col("n_terms"))
      .unionByName(dec1.select(lit(1).as("phase"), col("query_id"),
        col("rk"), col("doc_id"), col("bm25"), col("n_terms")))
      .orderBy("phase", "query_id", "rk")
  }

  // ------------------------------------------------------------------
  // Catalog entries + oracles
  // ------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "tx16_bm25_index_probe" -> ((s, d) =>
      probe(s, d, ensurePersisted(s, d))),
    "tx17_bm25_index_append" -> ((s, d) => appendCycle(s, d, "tx17")),
    "tx18_bm25_index_compact" -> ((s, d) => compactCycle(s, d, "tx18")),
    "tx19_bm25_index_retire" -> ((s, d) => retentionCycle(s, d, "tx19")),
    "tx20_bm25_impact_topk" -> ((s, d) =>
      impactProbe(s, d, ensurePersisted(s, d))),
    "tx21_bm25_reindex" -> ((s, d) => reindexCycle(s, d, "tx21"))
  )

  /** The tx15 BM25 body over a `tok(doc_id, tokens)` CTE already in
    * scope, emitted as CTE definitions ending in `<out>` —
    * parameterized so tx19's oracle can run it twice over different
    * document sets without drift between the copies. */
  private def bm25Body(p: String, out: String): String =
    s"""${p}dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM ${p}tok),
       |${p}st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM ${p}dl),
       |${p}tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(tokens) AS term FROM ${p}tok) t
       |  JOIN (SELECT DISTINCT term FROM q) USING (term)
       |  GROUP BY 1, 2
       |),
       |${p}dfc AS (SELECT term, count(*) AS df FROM ${p}tf GROUP BY 1),
       |${p}scored AS (
       |  SELECT q.query_id, ${p}tf.doc_id,
       |         round(
       |           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |                    / (CAST(df AS DOUBLE) + 0.5))
       |           * (CAST(tf AS DOUBLE) * ($Bm25K1 + 1.0))
       |           / (CAST(tf AS DOUBLE)
       |              + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * CAST(dl AS DOUBLE)
       |                           * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))),
       |           6) AS score
       |  FROM ${p}tf JOIN ${p}dfc USING (term) JOIN q USING (term)
       |       JOIN ${p}dl USING (doc_id), ${p}st
       |),
       |${p}agg AS (
       |  SELECT query_id, doc_id,
       |         CAST(sum(CAST(score AS DECIMAL(18,8))) AS DOUBLE) AS bm25,
       |         count(*) AS n_terms
       |  FROM ${p}scored GROUP BY 1, 2
       |),
       |$out AS (
       |  SELECT query_id, CAST(rk AS INT) AS rk, doc_id, bm25, n_terms FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |                                 ORDER BY bm25 DESC, doc_id ASC) AS rk
       |    FROM ${p}agg) t
       |  WHERE rk <= $Bm25TopK
       |)""".stripMargin

  /** tx19's oracle: phase 0 = tx15 over the full corpus; phase 1 =
    * the same body over the corpus minus phase 0's returned docs. */
  private def retireSql: String =
    s"""WITH q AS (SELECT * FROM (VALUES ${TextAnalysis.bm25Values}) AS q(query_id, term)),
       |tok AS (SELECT doc_id, ${TextAnalysis.tokensSql} AS tokens FROM documents),
       |${bm25Body("", "ph0")},
       |retired AS (SELECT DISTINCT doc_id FROM ph0),
       |rtok AS (SELECT * FROM tok WHERE doc_id NOT IN (SELECT doc_id FROM retired)),
       |${bm25Body("r", "ph1")}
       |SELECT 0 AS phase, * FROM ph0
       |UNION ALL
       |SELECT 1 AS phase, * FROM ph1
       |ORDER BY phase, query_id, rk""".stripMargin

  /** tx20's oracle: tx15's chain with the SAME deterministic
    * per-term impact cap inserted before scoring — the approximation
    * itself is hash-checked, not measured against the uncapped
    * answer. Per-term ranking over query-term postings equals the
    * build-time ranking over all postings (terms do not interfere
    * with each other's ranks). */
  private def impactSql: String =
    s"""WITH q AS (SELECT * FROM (VALUES ${TextAnalysis.bm25Values}) AS q(query_id, term)),
       |tok AS (SELECT doc_id, ${TextAnalysis.tokensSql} AS tokens FROM documents),
       |dl AS (SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM tok),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(tokens) AS term FROM tok) t
       |  JOIN (SELECT DISTINCT term FROM q) USING (term)
       |  GROUP BY 1, 2
       |),
       |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |cand AS (
       |  SELECT doc_id, term, tf, dl FROM (
       |    SELECT tf.doc_id, tf.term, tf.tf, dl.dl,
       |           row_number() OVER (PARTITION BY tf.term
       |             ORDER BY tf.tf DESC, dl.dl ASC, tf.doc_id ASC) AS imp_rank
       |    FROM tf JOIN dl USING (doc_id)) z
       |  WHERE imp_rank <= $ImpactCap
       |),
       |scored AS (
       |  SELECT q.query_id, cand.doc_id,
       |         round(
       |           ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |                    / (CAST(df AS DOUBLE) + 0.5))
       |           * (CAST(tf AS DOUBLE) * ($Bm25K1 + 1.0))
       |           / (CAST(tf AS DOUBLE)
       |              + $Bm25K1 * (1.0 - $Bm25B + $Bm25B * CAST(dl AS DOUBLE)
       |                           * CAST(n_docs AS DOUBLE) / CAST(sum_dl AS DOUBLE))),
       |           6) AS score
       |  FROM cand JOIN dfc USING (term) JOIN q USING (term), st
       |),
       |agg AS (
       |  SELECT query_id, doc_id,
       |         CAST(sum(CAST(score AS DECIMAL(18,8))) AS DOUBLE) AS bm25,
       |         count(*) AS n_terms
       |  FROM scored GROUP BY 1, 2
       |)
       |SELECT query_id, CAST(rk AS INT) AS rk, doc_id, bm25, n_terms FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY bm25 DESC, doc_id ASC) AS rk
       |  FROM agg) t
       |WHERE rk <= ${TextAnalysis.Bm25TopK} ORDER BY query_id, rk""".stripMargin

  val oracle: Map[String, String] = {
    val tx15 = TextAnalysis.oracle("tx15_bm25_topk")
    Map(
      "tx16_bm25_index_probe" -> tx15,
      "tx17_bm25_index_append" -> tx15,
      "tx18_bm25_index_compact" -> tx15,
      "tx19_bm25_index_retire" -> retireSql,
      "tx20_bm25_impact_topk" -> impactSql,
      // tx21 = tx20's GLOBAL-cap semantics restored by the rebuild:
      // same oracle — a divergence means the reindex failed to
      // recompute the impact order or df over the whole table.
      "tx21_bm25_reindex" -> impactSql
    )
  }
}
