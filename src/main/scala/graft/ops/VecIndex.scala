package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, expr, round, row_number}

import graft.Tables
import graft.functions.VectorExprs

/** Persisted form of the IVF vector index — [[BandIndex]]'s design
  * applied to the ANN family (the 100 TB serving layout for
  * similarity search).
  *
  * sim04 derives the coarse-quantizer assignment in-session each run:
  * every probe pays a full corpus × centroids scoring pass before any
  * query work happens. Correct, but at corpus scale that assignment
  * IS the index build — an expensive artifact that must persist, the
  * exact analog of "corpus text is never re-signed". This object
  * writes the assignment ONCE as a bucketed parquet table:
  *
  *   - `<prefix>_cells` (cluster, vec_id, embedding), bucketed AND
  *     sorted by `cluster` — the probe join key. A query batch
  *     resolves its own probe cells against the (broadcast,
  *     K-sized) centroid set and joins the cell table; the
  *     corpus-sized side is read from disk with NO re-scoring pass
  *     and no corpus-side exchange (the probe side is
  *     query-batch-sized and broadcasts).
  *
  * The decision output is DEFINED identical to sim04's (same
  * centroids, same assignment argmax, same nprobe, same exact-cosine
  * re-rank), so the catalog entry shares sim04's oracle — a
  * divergence means the persisted layout changed the dataflow's
  * semantics. VecIndexSpec proves the plan property: the probe plan
  * scans the persisted cell table exactly once, and every scan it
  * makes of the raw embeddings parquet carries a pushed
  * `vec_id < K` filter (centroids / query batch — bounded frames),
  * i.e. the corpus assignment pass is GONE from the read path.
  *
  * Round 11 gives this index the full day-N lifecycle its BandIndex
  * sibling has — the same three verbs, proven under the oracle gate:
  *
  *   - [[append]] (sim15): assign a NEW embedding batch to cells
  *     (batch × broadcast centroids — the corpus is never
  *     re-assigned) and insert into the bucketed cell table; bucketBy
  *     is stable under append, so the probe's one-scan/pushed-bounds
  *     plan property survives (VecIndexSpec re-asserts it);
  *   - [[compact]] (sim16): [[IndexCore.compactTable]]'s per-bucket
  *     local rewrite applied to the cell table (key-agnostic — same
  *     zero-exchange one-file-per-bucket rewrite);
  *   - [[retire]] (sim17): right-to-be-forgotten for embeddings —
  *     the compaction rewrite with a broadcast anti-join on `vec_id`;
  *     post-retire probes behave as if the vectors were never
  *     indexed;
  *   - [[maintainBatch]] (st10): exactly-once append as a SINGLE
  *     durable commit — the batch stamp on the appended cell rows is
  *     the ledger, so a replayed batch (commit marker lost) is a
  *     whole-batch no-op with no crash window in between.
  *
  * Cites: reference has no vector ops; extension per SURVEY.md §2
  * ("similarity search — IVF as the scale path").
  */
object VecIndex {

  /** DEFAULT bucket count — a BUILD parameter since round 17
    * ([[persist]]'s `buckets`); post-build verbs read the table's
    * actual count from the catalog ([[IndexCore.bucketsOf]]). */
  val Buckets = IndexCore.DefaultBuckets

  def cellsTable(prefix: String): String = s"${prefix}_cells"
  // pre-round-11 companion ledger (superseded by the in-row batch
  // stamp); still dropped on cleanup so old runs leave nothing behind
  def ledgerTable(prefix: String): String = s"${prefix}_ledger"

  /** Coarse centroids — sim04's convention: the first
    * [[Similarity.IvfCentroids]] vectors, a deterministic K-sized
    * frame with its `vec_id < K` filter pushed to the parquet scan. */
  private def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < Similarity.IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))

  /** IVF cell assignment for an arbitrary (vec_id, embedding) frame:
    * one frame × broadcast centroids scoring pass, argmax cell per
    * vector. Shared by the full build and the append path — a new
    * batch pays batch-proportional assignment work, never the
    * corpus's. */
  private def assignCells(spark: SparkSession, dir: String,
      emb: DataFrame): DataFrame =
    emb.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") === 1)
      .select(col("cent_id").as("cluster"), col("vec_id"), col("embedding"))

  /** Build and persist the IVF assignment: one corpus × broadcast
    * centroids scoring pass, argmax cell per vector, written bucketed
    * by cluster. This is the INDEX BUILD — paid once, not per probe.
    * `emb` restricts the indexed corpus (the lifecycle cycles build
    * from a slice and grow to the full corpus via [[append]]). */
  def persist(spark: SparkSession, dir: String, path: String,
      prefix: String, emb: Option[DataFrame] = None,
      buckets: Int = Buckets): Unit = {
    import org.apache.spark.sql.functions.lit
    VectorExprs.register(spark)
    val e = emb.getOrElse(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"))
    assignCells(spark, dir, e)
      .withColumn("ingest_batch", lit(BandIndex.BaseBatch))
      // bucket-aligned build: one file per bucket (round 18 — see
      // LexIndex.writePostings; file count independent of cluster width)
      .repartition(buckets, col("cluster"))
      .write
      .bucketBy(buckets, "cluster").sortBy("cluster")
      .option("path", s"$path/cells")
      .mode(SaveMode.Overwrite)
      .saveAsTable(cellsTable(prefix))
  }

  /** ANN serving path against the persisted index: the query batch
    * (bounded, `vec_id < KnnQueries`) scores itself against the
    * broadcast centroids for its [[Similarity.IvfNProbe]] probe
    * cells, joins the cell table (query side broadcasts — the corpus
    * never moves), exact-cosine re-ranks within the probed cells,
    * top-[[Similarity.LshK]] per query. Output = sim04's, column for
    * column. */
  /** The cell table as the probe reads it: tombstoned vec_ids
    * ([[retireTombstone]]) masked by a broadcast anti-join — the
    * streamed side keeps its bucketed partitioning, so the plan
    * property is untouched. */
  private def cellFrame(spark: SparkSession, prefix: String): DataFrame = {
    // Merge-log visibility (round 17 — [[tieredMerge]]): the log is
    // TABLE-scoped (cells and pqcells stamps are independent), and
    // absent a log the frame is untouched. Same single-choke-point
    // rule as the band/lexical read paths: folded input rows still on
    // disk (commit → GC crash window) must not serve alongside their
    // merged copy.
    val scope = cellsTable(prefix)
    // the filter applies even with an EMPTY log: a fold that crashed
    // before its first commit leaves reserved-stamp rows on disk with
    // no log table at all — they must stay invisible
    val base = spark.table(scope)
      .filter(IndexCore.visibleUnder(IndexCore.readMergeLog(spark, scope)))
    IndexCore.tombstoneFrame(spark, prefix).fold(base)(ts =>
      base.join(ts, base("vec_id") === ts("retired_id"), "left_anti"))
  }

  /** The fixed catalog workload as a (vec_id, embedding[, label])
    * frame — the catalog instance of the query-frame serving APIs
    * (round 17, VERDICT r16 item 6: a serving tier takes its workload
    * as DATA, not as a compile-time constant; LexIndex.probe got its
    * frame overload in round 16, these are the vector lanes').
    * The `vec_id <` bound stays pushed to the parquet scan. */
  private def fixedQueries(spark: SparkSession, dir: String,
      withLabel: Boolean = false): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < Similarity.KnnQueries)
    if (withLabel) base.select("vec_id", "embedding", "label")
    else base.select("vec_id", "embedding")
  }

  def probe(spark: SparkSession, dir: String, prefix: String): DataFrame =
    probe(spark, dir, prefix, fixedQueries(spark, dir))

  /** [[probe]] over a (vec_id, embedding) query FRAME — any bounded
    * serving batch; the probe-cell selection and candidate join keep
    * the broadcast-query / corpus-never-moves plan (VecIndexSpec
    * asserts it on the frame arity too). */
  def probe(spark: SparkSession, dir: String, prefix: String,
      queries: DataFrame): DataFrame = {
    VectorExprs.register(spark)
    val probes = queries.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") <= Similarity.IvfNProbe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cluster"),
        col("embedding").as("qe"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cellFrame(spark, prefix)
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.LshK)
      .select(col("query_id"), col("neighbor_id"), col("cluster"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  /** FILTERED ANN against the persisted index (sim22): each query
    * wants top-k among corpus vectors sharing its OWN label — the
    * metadata-predicated search every production vector store serves
    * (category-scoped retrieval, tenant isolation, language-filtered
    * RAG). POST-FILTER composition: probe cells as [[probe]], then
    * drop label-mismatched candidates BEFORE the cosine re-rank and
    * the top-k window, so the filter also cuts the scoring work. The
    * label rides in from a column-pruned dimension scan (vec_id,
    * label — the embedding column, the heavy one, is never read) and
    * joins the bounded probed-candidate set.
    *
    * ROUND 14 (VERDICT r13 item 5): this dim-join form is the
    * BACK-COMPAT/ORACLE lane. The serving DEFAULT is the covering
    * layout ([[filteredServing]] → [[coveringFilteredProbe]]) — at
    * 100 TB nobody pays to build and store both layouts, and the
    * covering row wins the serving economics (see
    * [[persistCovering]] for the write-amplification cost it pays).
    * This lane stays because it reads the BASE cell schema shared
    * with the whole lifecycle family (sim14–17, st09/st10, the
    * tombstone and maintenance cycles): an installation already
    * maintaining the base index can serve filtered queries without a
    * second build, and the sim22 oracle grades this exact dataflow.
    * Post-filter IVF can under-fill k for rare labels (the probed
    * cells may hold < k matching vectors) — inherent to the
    * composition and mirrored exactly by the oracle. */
  def filteredProbe(spark: SparkSession, dir: String, prefix: String): DataFrame =
    filteredProbe(spark, dir, prefix, fixedQueries(spark, dir, withLabel = true))

  /** [[filteredProbe]] over a (vec_id, embedding, label) query FRAME. */
  def filteredProbe(spark: SparkSession, dir: String, prefix: String,
      queries: DataFrame): DataFrame = {
    VectorExprs.register(spark)
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").as("nlabel"))
    val probes = queries.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") <= Similarity.IvfNProbe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cluster"),
        col("embedding").as("qe"), col("label").as("qlabel"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cellFrame(spark, prefix)
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(labels, Seq("vec_id"))
      .filter(col("nlabel") === col("qlabel"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.LshK)
      .select(col("query_id"), col("neighbor_id"), col("cluster"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  /** COVERING-INDEX build for the filtered-ANN serving path (sim23;
    * round-12 VERDICT item 3): [[persist]]'s cell table with the
    * filter label COLOCATED in the cell row — (cluster, vec_id,
    * label, embedding, ingest_batch). One narrow extra column at
    * build time buys the serving path out of [[filteredProbe]]'s
    * (vec_id, label) dimension join: at 100 TB that join is one
    * extra corpus-cardinality exchange-free-but-still-IO probe-time
    * scan PER QUERY BATCH, and the covering row makes the label a
    * pushable cell-scan column instead. The base cell schema stays
    * untouched — the whole lifecycle family (sim14–17, st09/st10,
    * tombstones, compaction) shares it; this is a second, serving-
    * specialized layout of the same assignment, the classic
    * covering-index storage/write tradeoff made explicit. */
  def persistCovering(spark: SparkSession, dir: String, path: String,
      prefix: String, buckets: Int = Buckets): Unit = {
    import org.apache.spark.sql.functions.lit
    VectorExprs.register(spark)
    val e = Tables.embeddings(spark, dir).select("vec_id", "label", "embedding")
    e.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") === 1)
      .select(col("cent_id").as("cluster"), col("vec_id"), col("label"),
        col("embedding"))
      .withColumn("ingest_batch", lit(BandIndex.BaseBatch))
      .repartition(buckets, col("cluster")) // bucket-aligned (round 18)
      .write
      .bucketBy(buckets, "cluster").sortBy("cluster")
      .option("path", s"$path/cells")
      .mode(SaveMode.Overwrite)
      .saveAsTable(cellsTable(prefix))
  }

  /** [[filteredProbe]] served from a COVERING index
    * ([[persistCovering]]): the label predicate reads the cell row
    * itself — the probe plan holds exactly one corpus-sized scan
    * (the bucketed cells) and two bounded raw-embeddings scans
    * (query batch, centroids), both with their `vec_id <` bound
    * pushed. Decisions are DEFINED identical to [[filteredProbe]]'s
    * (same assignment, same predicate, same ranking), so sim23
    * shares sim22's oracle; VecIndexSpec asserts both the
    * row-identity and the no-dim-join plan property. */
  /** DEFAULT filtered-ANN serving entry point (round 14, VERDICT r13
    * item 5): builds/reuses the COVERING index and serves from it.
    * sim22 (dim-join over the base cells) and sim23 (covering)
    * coexisted as equal citizens through round 13; at 100 TB nobody
    * pays to build and store both, so the covering layout is now the
    * declared default — it won the serving economics three decades
    * deep (1000×: 2.3× wall vs the dim-join's 5.0×; stream 1.5× vs
    * 3.7× — SCALE_NOTES). The cost it pays is at WRITE time: the
    * covering build duplicates the (cluster, vec_id, embedding,
    * batch) row set with the label colocated — ~a full second copy
    * of the cell bytes if both layouts are kept, or a one-label-
    * column widening (~2% of the embedding-dominated row) if it is
    * the only one. [[filteredProbe]] remains the back-compat/oracle
    * lane for installations that only maintain the base index. */
  def filteredServing(spark: SparkSession, dir: String): DataFrame =
    coveringFilteredProbe(spark, dir, ensureCoveringPersisted(spark, dir))

  def coveringFilteredProbe(spark: SparkSession, dir: String,
      prefix: String): DataFrame =
    coveringFilteredProbe(spark, dir, prefix,
      fixedQueries(spark, dir, withLabel = true))

  /** [[coveringFilteredProbe]] over a (vec_id, embedding, label)
    * query FRAME. */
  def coveringFilteredProbe(spark: SparkSession, dir: String,
      prefix: String, queries: DataFrame): DataFrame = {
    VectorExprs.register(spark)
    val probes = queries.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") <= Similarity.IvfNProbe)
      .select(col("vec_id").as("query_id"), col("cent_id").as("cluster"),
        col("embedding").as("qe"), col("label").as("qlabel"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cellFrame(spark, prefix)
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .filter(col("label") === col("qlabel"))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.LshK)
      .select(col("query_id"), col("neighbor_id"), col("cluster"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  /** Streaming-safe ANN top-k core — the dataflow shared by the
    * batch catalog entry `st09_stream_ann_probe` (Streams.scala) and
    * the real readStream form StreamingSpec drives. `queries`
    * (query_id, embedding, ts) may be an unbounded streaming frame,
    * so every construct is streaming-legal:
    *
    *   - per-query probe-cell selection is ONE stateless projection:
    *     the K-sized centroid set rides in as a broadcast 1-row
    *     array, and higher-order functions (transform → array_sort →
    *     slice) rank it per query — no window function, no separate
    *     stateful aggregation;
    *   - candidates come from a stream-static inner join against the
    *     persisted cell table (the corpus never moves);
    *   - the per-query top-k is ONE windowed aggregation over the
    *     bounded [[graft.functions.TopKStructs]] state (K rows per
    *     key, never cell-proportional — `collect_list`+sort would
    *     accumulate every candidate in state, the streaming
    *     scale-killer this aggregate exists to avoid), with the
    *     (negated-cosine, neighbor_id) struct prefix encoding
    *     sim04's (cos DESC, id ASC) order.
    *
    * Output: one row per (arrival window, query, ranked neighbor) —
    * sim04's decision columns behind a window_start, the st05
    * convention. */
  /** [[annTopK]] with sim22's label predicate — the streaming form of
    * filtered ANN serving. `queries` carries (query_id, embedding,
    * label, ts); candidates join the static column-pruned label dim
    * (a stream-static join, like the cell table itself) and
    * label-mismatched rows drop BEFORE the cosine and the K-bounded
    * top-k state, so the filter cuts both scoring work and state
    * pressure. Every construct stays streaming-legal: the label dim
    * is a batch frame, the probe-cell selection is the stateless HOF
    * projection, and the per-query state is still K rows. */
  def filteredAnnTopK(spark: SparkSession, dir: String, queries: DataFrame,
      cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{collect_list, date_format, explode, struct, window}
    VectorExprs.register(spark)
    val centArr = centroids(spark, dir)
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cents"))
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").as("nlabel"))
    val probes = queries
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("ts"), col("embedding").as("qe"),
        col("label").as("qlabel"),
        explode(expr(
          s"""slice(
             |  transform(
             |    array_sort(transform(cents,
             |      c -> struct(-cosine_sim(embedding, c.ce) AS nc,
             |                  c.cent_id AS cent_id))),
             |    s -> s.cent_id),
             |  1, ${Similarity.IvfNProbe})""".stripMargin)).as("cluster"))
    val cand = cells.join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(labels, Seq("vec_id"))
      .filter(col("nlabel") === col("qlabel"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
    cand
      .select(col("query_id"), col("ts"),
        struct((-col("cos")).as("nc"), col("vec_id").as("neighbor_id"),
          col("cluster"), round(col("cos"), 6).as("cosine")).as("s"))
      .groupBy(window(col("ts"), "10 minutes"), col("query_id"))
      .agg(expr(s"topk_struct(s, ${Similarity.LshK})").as("top"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("query_id"), explode(col("top")).as("t"))
      .select(col("window_start"), col("query_id"),
        col("t.neighbor_id").as("neighbor_id"),
        col("t.cluster").as("cluster"),
        col("t.cosine").as("cosine"))
  }

  /** [[filteredAnnTopK]] served from COVERING cells
    * ([[persistCovering]]): the label predicate reads the cell row —
    * the stream-static label dim join is gone, so each candidate row
    * costs one stream-static join (the cells) instead of two. The
    * 100 TB argument is sim23's, applied to the serving stream: at a
    * large corpus the (vec_id, label) dim is a second
    * corpus-cardinality input on every micro-batch. Decisions are
    * DEFINED identical to [[filteredAnnTopK]]'s over the same
    * corpus, so st17 shares st16's oracle. */
  def coveringFilteredAnnTopK(spark: SparkSession, dir: String,
      queries: DataFrame, cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{collect_list, date_format, explode, struct, window}
    VectorExprs.register(spark)
    val centArr = centroids(spark, dir)
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cents"))
    val probes = queries
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("ts"), col("embedding").as("qe"),
        col("label").as("qlabel"),
        explode(expr(
          s"""slice(
             |  transform(
             |    array_sort(transform(cents,
             |      c -> struct(-cosine_sim(embedding, c.ce) AS nc,
             |                  c.cent_id AS cent_id))),
             |    s -> s.cent_id),
             |  1, ${Similarity.IvfNProbe})""".stripMargin)).as("cluster"))
    val cand = cells.join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .filter(col("label") === col("qlabel"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
    cand
      .select(col("query_id"), col("ts"),
        struct((-col("cos")).as("nc"), col("vec_id").as("neighbor_id"),
          col("cluster"), round(col("cos"), 6).as("cosine")).as("s"))
      .groupBy(window(col("ts"), "10 minutes"), col("query_id"))
      .agg(expr(s"topk_struct(s, ${Similarity.LshK})").as("top"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("query_id"), explode(col("top")).as("t"))
      .select(col("window_start"), col("query_id"),
        col("t.neighbor_id").as("neighbor_id"),
        col("t.cluster").as("cluster"),
        col("t.cosine").as("cosine"))
  }

  def annTopK(spark: SparkSession, dir: String, queries: DataFrame,
      cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{collect_list, date_format, explode, struct, window}
    VectorExprs.register(spark)
    val centArr = centroids(spark, dir)
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cents"))
    val probes = queries
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("ts"), col("embedding").as("qe"),
        explode(expr(
          s"""slice(
             |  transform(
             |    array_sort(transform(cents,
             |      c -> struct(-cosine_sim(embedding, c.ce) AS nc,
             |                  c.cent_id AS cent_id))),
             |    s -> s.cent_id),
             |  1, ${Similarity.IvfNProbe})""".stripMargin)).as("cluster"))
    val cand = cells.join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
    cand
      .select(col("query_id"), col("ts"),
        struct((-col("cos")).as("nc"), col("vec_id").as("neighbor_id"),
          col("cluster"), round(col("cos"), 6).as("cosine")).as("s"))
      .groupBy(window(col("ts"), "10 minutes"), col("query_id"))
      .agg(expr(s"topk_struct(s, ${Similarity.LshK})").as("top"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("query_id"), explode(col("top")).as("t"))
      .select(col("window_start"), col("query_id"),
        col("t.neighbor_id").as("neighbor_id"),
        col("t.cluster").as("cluster"),
        col("t.cosine").as("cosine"))
  }

  // ------------------------------------------------------------------
  // Day-N lifecycle — append / compact / retire / exactly-once
  // ------------------------------------------------------------------

  /** Append a NEW embedding batch to the persisted index: assign the
    * batch to cells (batch × broadcast centroids — the existing corpus
    * is never re-assigned or rewritten) and insert into the bucketed
    * cell table. bucketBy hashes the new file set into the same
    * bucket ids as the original write, so the probe's
    * one-scan/pushed-bounds plan property survives (VecIndexSpec).
    * Unlike [[BandIndex.append]] there is a single table write and
    * the batch never reads the table it mutates, so no materialize
    * pin is needed. Rows are batch-stamped ([[BandIndex.BaseBatch]]
    * for ad-hoc appends), which is what lets [[maintainBatch]] make
    * the append its own ledger. */
  def append(spark: SparkSession, dir: String, newVecs: DataFrame,
      prefix: String, batchId: Long = BandIndex.BaseBatch): Unit = {
    import org.apache.spark.sql.functions.lit
    VectorExprs.register(spark)
    val b = IndexCore.bucketsOf(spark, cellsTable(prefix))
    assignCells(spark, dir, newVecs.select("vec_id", "embedding"))
      .withColumn("ingest_batch", lit(batchId))
      .repartition(b, col("cluster")) // bucket-aligned append (round 18)
      .write.mode(SaveMode.Append)
      .bucketBy(b, "cluster")
      .sortBy("cluster")
      .saveAsTable(cellsTable(prefix))
  }

  /** Compact the cell table to one file per bucket —
    * [[IndexCore.compactTable]]'s zero-exchange per-bucket local
    * rewrite, key-agnostic by construction. Probe decisions and the
    * plan property are unchanged; the per-bucket merge reads ONE run
    * instead of one per historical append. */
  def compact(spark: SparkSession, prefix: String): Unit = {
    val tomb = IndexCore.tombstoneFrame(spark, prefix)
    IndexCore.compactTable(spark, cellsTable(prefix), "cluster",
      tomb, minusIdCol = "vec_id")
    // the tombstone set is per-PREFIX: clear it only when no sibling
    // table still carries masked rows (a prefix that persists both
    // raw cells and code cells purges on whichever compaction runs
    // LAST)
    if (!spark.catalog.tableExists(pqCellsTable(prefix)))
      IndexCore.clearTombstones(spark, prefix)
  }

  /** RETENTION — remove a (bounded, broadcastable) set of vec_ids
    * from the index in place: the compaction rewrite with a broadcast
    * anti-join on `vec_id`. Post-retire probes behave as if the
    * retired vectors were never indexed — a query whose top-k held a
    * retired vector falls back to the next-best surviving member of
    * its probed cells. */
  def retire(spark: SparkSession, prefix: String,
      expired: DataFrame): Unit =
    IndexCore.compactTable(spark, cellsTable(prefix), "cluster",
      Some(expired), minusIdCol = "vec_id")

  /** O(retired)-cost retention (round 12; VERDICT r11 item 3):
    * [[retire]] pays a corpus-linear rewrite per delete batch; this
    * variant appends the expired vec_ids to the index's tiny
    * tombstone table instead. [[probe]] masks them immediately
    * (broadcast anti-join, partitioning preserved); the next
    * [[compact]] physically purges them and clears the set. sim20's
    * three-phase oracle pins mask, purge, and their equality to an
    * eager retire. */
  def retireTombstone(spark: SparkSession, prefix: String,
      expired: DataFrame): Unit =
    IndexCore.recordTombstones(spark, prefix, cellsTable(prefix), expired)

  /** Exactly-once append, SINGLE-DURABLE-COMMIT form (round 11;
    * [[BandIndex.maintainBatch]]'s ANN analog, simplified by the
    * single-table layout): the batch's cell rows carry `batchId` as
    * their [[append]] stamp, and a Spark parquet append is one atomic
    * job commit — so the append IS its own ledger entry, and there is
    * NO append→record window at all (the design the round-10 ADVICE
    * sketched; the two-table band index needs the self-fencing probe
    * on top, this index does not). Replay guard =
    * [[IndexCore.batchPresent]] on the cell table: storage-derived
    * (holds across JVM restarts), footer-cheap (each append's files
    * carry a single stamp in their column stats). A replayed
    * micro-batch whose checkpoint commit marker was lost is a
    * whole-batch no-op returning false; crash-before-commit replays
    * cleanly (no files became visible). The pre-round-11 companion
    * ledger table is gone — nothing to desynchronize. */
  def maintainBatch(spark: SparkSession, dir: String, prefix: String,
      newVecs: DataFrame, batchId: Long): Boolean = {
    // Same id-domain guard as BandIndex.maintainBatch (round-11
    // ADVICE): -1 is the base/ad-hoc stamp, so a batch with that id
    // would false-skip against any index that has ever been appended
    // to ad hoc.
    require(batchId >= 0,
      s"maintainBatch batchId must be >= 0, got $batchId (ids < 0 are " +
        "reserved for the base-build/ad-hoc stamp)")
    // Replay fence = the stamp itself, EXTENDED by the merge log
    // (round 17): a tiered fold re-stamps the batch's rows and GC
    // deletes its files, so the stamp probe alone would report a
    // folded batch absent and a checkpoint replay would double-append
    // — the fold's own commit row is the durable evidence instead.
    if (IndexCore.batchPresent(spark, cellsTable(prefix), batchId) ||
        IndexCore.foldedUnder(spark, cellsTable(prefix), batchId)) false
    else {
      append(spark, dir, newVecs, prefix, batchId)
      true
    }
  }

  /** SIZE-TIERED segment merge for the vector cells table (round 17
    * — the THIRD family through [[IndexCore]]'s merge log): fold only
    * the batch-stamped segments at or below `maxTierRows` into one
    * merged segment, base files byte-untouched, one atomic log
    * append, dead files GC'd after. The log is scoped to the CELLS
    * table (pqcells stamps are independent — a shared prefix must
    * not have one family's fold kill the other's stamps), and the
    * fold is purely a layout event: cell rows are row-local
    * (cluster, vec_id, …), so probe answers are defined unchanged.
    * The stamp-is-the-ledger replay fence survives because
    * [[maintainBatch]] also consults the log ([[IndexCore.foldedUnder]])
    * — the one genuinely new invariant this family adds, spec-driven
    * through a replay-after-fold. Returns true when a fold ran. */
  def tieredMerge(spark: SparkSession, prefix: String,
      maxTierRows: Long = Long.MaxValue): Boolean = {
    val t = cellsTable(prefix)
    spark.catalog.refreshTable(t)
    val log = IndexCore.readMergeLog(spark, t)
    // ONE footer sweep shared by GC, the tier pick and the
    // fresh-stamp scan (round 17: the fold paid four sweeps)
    val segs0 = IndexCore.fileSegments(spark, t)
    val gone = IndexCore.gcDeadFilesOf(spark, t, log, segs0).toSet
    val segs = segs0.filterNot(s => gone.contains(s._1))
    val sizes = IndexCore.segmentSizesOf(segs, log)
    val fold = sizes.collect {
      case (stamp, (rows, _))
        if stamp != BandIndex.BaseBatch && rows <= maxTierRows => stamp
    }.toSeq.sorted
    if (fold.size < 2) false
    else {
      val usedMin = (segs.map(_._2) ++
        log.outputs ++ Seq(IndexCore.MergeStampCeil + 1)).min
      val out = math.min(log.nextStamp, usedMin - 1)
      import org.apache.spark.sql.functions.lit
      val b = IndexCore.bucketsOf(spark, t)
      spark.table(t).filter(col("ingest_batch").isin(fold: _*))
        .withColumn("ingest_batch", lit(out))
        .repartition(b, col("cluster"))
        .write.mode(SaveMode.Append)
        .bucketBy(b, "cluster").sortBy("cluster")
        .saveAsTable(t)
      IndexCore.commitFold(spark, t, t, fold, out)
      // post-commit GC: the dead set under the just-committed log is
      // exactly the folded stamps' files, already in hand from the
      // shared sweep — no log re-read, no footer re-walk
      IndexCore.gcDeadFilesOf(spark, t,
        IndexCore.MergeLog(log.folded ++ fold, log.outputs + out),
        segs.filter(s => fold.contains(s._2)))
      true
    }
  }

  // ------------------------------------------------------------------
  // Fresh lifecycle cycles (sim15/sim16/sim17/st10) — honest bench
  // timing: a fresh index per invocation, per-phase wall times
  // stamped into graft.tools.Phases (round-10 VERDICT item 3), and
  // the final probe materialized INSIDE the cycle so the stamped
  // phases sum to the entry's bench number.
  // ------------------------------------------------------------------

  private val lastCycle =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), (String, String)]

  private def freshIndex(spark: SparkSession, dir: String, tag: String,
      emb: Option[DataFrame]): (String, String) = {
    val key = (spark, dir, tag)
    persistLock.synchronized {
      lastCycle.remove(key).foreach { case (oldPrefix, oldPath) =>
        drop(spark, oldPrefix)
        IndexCore.retireTempDir(oldPath)
      }
      lastCycle.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    }
    val prefix = s"graft_vec_${tag}_${Integer.toHexString(dir.hashCode)}" +
      s"_s${serial.incrementAndGet()}"
    val path = IndexCore.newTempDir(s"vec$tag")
    persist(spark, dir, path, prefix, emb)
    (prefix, path)
  }

  /** Deterministic new-vector predicate for the lifecycle fixtures:
    * ~1/4 of the corpus arrives as the "new" batch, the rest is the
    * day-0 index. Hash-based so both oracle scales get non-trivial
    * slices; the FINAL index always equals the full corpus, so these
    * cycles share sim04's oracle. */
  private def isNewVec: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    pmod(hash(col("vec_id")), lit(4)) === lit(0)
  }

  /** sim15: fresh index on 3/4 of the corpus → append the remaining
    * 1/4 → probe. Decisions are DEFINED identical to sim04/sim14
    * (same centroids, same per-vector argmax — the union of the two
    * assignment passes equals the full build), so the entry shares
    * sim04's oracle: a divergence means append broke the layout or
    * the assignment. */
  def appendCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(e.filter(!isNewVec)))
    }
    Phases.time(tag, "append") { append(spark, dir, e.filter(isNewVec), prefix) }
    val dec = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** sim16: sim15's cycle with the append split into 3 disjoint
    * day-slices (the file-growth regime) and a compaction before the
    * probe — same oracle, plus VecIndexSpec's file-count assertion. */
  def compactCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val key = (spark, dir, tag)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(e.filter(!isNewVec)))
    }
    Phases.time(tag, "append") {
      // pmod(h,12) ∈ {0,4,8} partitions pmod(h,4)=0 into 3 slices
      Seq(0, 4, 8).foreach { r =>
        append(spark, dir,
          e.filter(pmod(hash(col("vec_id")), lit(12)) === lit(r)), prefix)
      }
    }
    Phases.time(tag, "compact") { compact(spark, prefix) }
    val dec = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** sim30 (round 17): sim16's growth regime maintained by the
    * BOUNDED fold instead of the corpus-sized rewrite — the new
    * quarter lands in 3 micro-batches through [[maintainBatch]]
    * (each under its own stamp), [[tieredMerge]] folds them into one
    * merged segment (base files byte-untouched, post-fold segment
    * count asserted in-cycle), a REPLAY of a folded batch is asserted
    * a no-op (the merge-log fence — the invariant this family adds),
    * and the probe serves through the visibility filter. The final
    * index equals the full corpus, so the entry shares sim04's
    * oracle. */
  def tieredCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val key = (spark, dir, tag)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(e.filter(!isNewVec)))
    }
    Phases.time(tag, "append") {
      Seq(0, 4, 8).foreach { r =>
        if (!maintainBatch(spark, dir, prefix,
            e.filter(pmod(hash(col("vec_id")), lit(12)) === lit(r)),
            batchId = r.toLong))
          sys.error(s"$tag: fresh batch $r claims already maintained")
      }
    }
    Phases.time(tag, "merge") {
      val t = cellsTable(prefix)
      val baseBefore = IndexCore.fileSegments(spark, t)
        .filter(f => f._2 == BandIndex.BaseBatch && f._3 == BandIndex.BaseBatch)
        .map(f => (f._1, f._5)).toSet
      if (!tieredMerge(spark, prefix))
        sys.error(s"$tag: sub-tier segments present but no fold ran")
      val baseAfter = IndexCore.fileSegments(spark, t)
        .filter(f => f._2 == BandIndex.BaseBatch && f._3 == BandIndex.BaseBatch)
        .map(f => (f._1, f._5)).toSet
      if (baseAfter != baseBefore)
        sys.error(s"$tag: the fold touched the base tier's files")
      val segs = IndexCore.segmentSizes(spark, t,
        IndexCore.readMergeLog(spark, t))
      if (segs.size != 2)
        sys.error(s"$tag: expected base + merged segment, got ${segs.keySet}")
      // the merge-log replay fence: a folded batch's replay must be a
      // no-op even though its stamp's files are GC'd
      if (maintainBatch(spark, dir, prefix,
          e.filter(pmod(hash(col("vec_id")), lit(12)) === lit(0)),
          batchId = 0L))
        sys.error(s"$tag: a folded batch replayed as new — the " +
          "merge-log fence failed and the index double-appended")
    }
    val dec = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** sim17: retention made OBSERVABLE by construction — probe the
    * full index (phase 0), retire exactly the distinct neighbors
    * phase 0 returned (a bounded, ≤ queries×K set — the
    * right-to-be-forgotten shape), re-probe (phase 1): every query's
    * entire top-k must be re-filled from surviving cell members. The
    * oracle replays phase 1 with the corpus filtered by the same
    * NOT IN (phase-0 neighbors) predicate. */
  def retentionCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    import org.apache.spark.sql.functions.lit
    val key = (spark, dir, tag)
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, None)
    }
    val dec0 = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    val expired = dec0.select(col("neighbor_id").as("vec_id")).distinct()
    Phases.time(tag, "retire") { retire(spark, prefix, expired) }
    val dec1 = Phases.time(tag, "reprobe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec0.select(lit(0).as("phase"), col("query_id"), col("neighbor_id"),
        col("cluster"), col("cosine"))
      .unionByName(dec1.select(lit(1).as("phase"), col("query_id"),
        col("neighbor_id"), col("cluster"), col("cosine")))
      .orderBy("phase", "query_id", "neighbor_id")
  }

  /** st10: sim15's cycle driven through the batch-stamp-guarded
    * [[maintainBatch]], with the batch REPLAYED in between — the
    * batch analog of a checkpoint restart that lost the commit
    * marker. The replay must be a stamp-skipped no-op (asserted
    * here; a double append would duplicate cell members — harmless
    * for THIS aggregate's output, so the real gate is the skip
    * assertion plus StreamingSpec's restart test). Final probe equals
    * sim04, same oracle. */
  def maintainedCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, Some(e.filter(!isNewVec)))
    }
    Phases.time(tag, "append") {
      if (!maintainBatch(spark, dir, prefix, e.filter(isNewVec), 0L))
        sys.error("st10: fresh index claims batch 0 already maintained")
      if (maintainBatch(spark, dir, prefix, e.filter(isNewVec), 0L))
        sys.error("st10: replayed batch 0 was not stamp-skipped")
    }
    val dec = Phases.time(tag, "probe") {
      probe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  // ------------------------------------------------------------------
  // IVF-PQ serving index (sim18) — the layout you actually ship at
  // 100 TB. sim14's cell table stores RAW vectors: right for exact
  // re-rank, but the serving tier's dominant cost is reading cell
  // members, and a 64-dim float vector is 256 bytes where its PQ code
  // is M small ints. This index persists (cluster, vec_id,
  // c0..cM-1): the IVF assignment gives the probe its cell pruning,
  // the PQ codes give it asymmetric-distance scoring against a
  // broadcast codebook — the corpus' raw embeddings are NOT on the
  // probe's read path at all (VecIndexSpec asserts every embeddings
  // scan in the probe plan carries a pushed bounded vec_id filter:
  // queries + centroids only). Decisions = sim07's trained-codebook
  // ADC restricted to the probed cells — the composed oracle
  // (Similarity.sim18Sql) replays IVF cell selection + Lloyd
  // codebook + encode + ADC end to end in DuckDB.
  // ------------------------------------------------------------------

  def pqCellsTable(prefix: String): String = s"${prefix}_pqcells"
  def codebookTable(prefix: String): String = s"${prefix}_codebook"

  private def subSlice(c: String, m: Int): String =
    s"slice($c, ${m * Similarity.PqSubDims + 1}, ${Similarity.PqSubDims})"

  /** PQ-encode an arbitrary (vec_id, embedding) frame against a
    * codebook frame: frame × broadcast M·K codebook — M fused codegen
    * `sq_dist` argmins, one pass — returning (vec_id, c0..cM-1).
    * Shared by the full build and the append path, so a new batch
    * pays batch-proportional encoding work, never the corpus's. */
  private def pqEncode(emb: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{min, struct}
    val scored = (0 until Similarity.PqM).foldLeft(emb.crossJoin(broadcast(cb))) {
      (df, m) => df.withColumn(s"d$m",
        expr(s"sq_dist(${subSlice("embedding", m)}, ${subSlice("cw", m)})"))
    }
    val aggCols = (0 until Similarity.PqM).map(m =>
      min(struct(col(s"d$m").as("d"), col("code").as("code"))).as(s"b$m"))
    scored.groupBy("vec_id")
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("vec_id") +:
        (0 until Similarity.PqM).map(m => col(s"b$m.code").as(s"c$m")): _*)
  }

  /** INDEX BUILD (paid once): Lloyd-train the PQ codebook
    * ([[Similarity.pqTrainedCodebook]]), encode the corpus
    * ([[pqEncode]]), assign IVF cells (corpus × broadcast centroids),
    * persist the code cells bucketed by cluster plus the (tiny)
    * codebook table — the serving tier is then self-contained.
    * `emb` restricts the indexed corpus (lifecycle cycles build from
    * a slice and grow via [[pqAppend]]); the CODEBOOK is always
    * trained on the generation's full reference sample regardless —
    * see the codebook-generation contract on [[pqAppend]]. */
  def pqPersist(spark: SparkSession, dir: String, path: String,
      prefix: String, emb: Option[DataFrame] = None,
      buckets: Int = Buckets): Unit = {
    import org.apache.spark.sql.functions.lit
    VectorExprs.register(spark)
    val cb = Similarity.pqTrainedCodebook(spark, dir).localCheckpoint()
    cb.write.option("path", s"$path/codebook")
      .mode(SaveMode.Overwrite).saveAsTable(codebookTable(prefix))
    val e = emb.getOrElse(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"))
    assignCells(spark, dir, e)
      .select("cluster", "vec_id")
      .join(pqEncode(e, cb), "vec_id")
      .withColumn("ingest_batch", lit(BandIndex.BaseBatch))
      .repartition(buckets, col("cluster")) // bucket-aligned (round 18)
      .write
      .bucketBy(buckets, "cluster").sortBy("cluster")
      .option("path", s"$path/pqcells")
      .mode(SaveMode.Overwrite)
      .saveAsTable(pqCellsTable(prefix))
  }

  /** ADC serving against the persisted code cells: the query batch
    * resolves its probe cells (bounded frame × broadcast centroids),
    * builds its per-(query, m, code) distance LUT (bounded frame ×
    * broadcast codebook — the classic ADC table), and joins the cell
    * table; candidates are scored by LUT lookup — M broadcast-hash
    * joins on the code columns, no per-candidate vector arithmetic
    * and no corpus-side exchange. Top-[[Similarity.KnnK]] per query
    * by (adc asc, neighbor_id asc), sim07's order. */
  /** The code-cell table as the serving probe reads it — the same
    * tombstone mask as [[cellFrame]] (one id space per index prefix:
    * a retired vec_id vanishes from BOTH the raw-vector and the
    * code-cell read paths until the next compaction purges it). */
  private def pqCellFrame(spark: SparkSession, prefix: String): DataFrame = {
    val base = spark.table(pqCellsTable(prefix))
    IndexCore.tombstoneFrame(spark, prefix).fold(base)(ts =>
      base.join(ts, base("vec_id") === ts("retired_id"), "left_anti"))
  }

  def pqProbe(spark: SparkSession, dir: String, prefix: String): DataFrame =
    pqProbe(spark, dir, prefix, fixedQueries(spark, dir))

  /** [[pqProbe]] over a (vec_id, embedding) query FRAME. */
  def pqProbe(spark: SparkSession, dir: String, prefix: String,
      qf: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.round
    VectorExprs.register(spark)
    val cb = spark.table(codebookTable(prefix))
    val queries = qf
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val probes = queries.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(qe, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") <= Similarity.IvfNProbe)
      .select(col("query_id"), col("cent_id").as("cluster"))
    val qtabs = (0 until Similarity.PqM).map { m =>
      queries.crossJoin(broadcast(cb))
        .select(col("query_id").as(s"q$m"), col("code").as(s"qc$m"),
          expr(s"sq_dist(${subSlice("qe", m)}, ${subSlice("cw", m)})").as(s"qd$m"))
    }
    val cand = pqCellFrame(spark, prefix)
      .join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
    val joined = (1 until Similarity.PqM).foldLeft(
      cand.join(broadcast(qtabs(0)),
        col("query_id") === col("q0") && col("c0") === col("qc0"))) { (df, m) =>
      df.join(broadcast(qtabs(m)),
        col("query_id") === col(s"q$m") && col(s"c$m") === col(s"qc$m"))
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    joined
      .withColumn("adc",
        (0 until Similarity.PqM).map(m => col(s"qd$m")).reduce(_ + _))
      .withColumnRenamed("vec_id", "neighbor_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.KnnK)
      .select(col("query_id"), col("neighbor_id"), col("cluster"),
        round(col("adc"), 6).as("adc_dist"))
      .orderBy("query_id", "neighbor_id")
  }

  /** Streaming-safe IVF-PQ ADC top-k core — sim18's serving dataflow
    * in streaming-legal constructs (st12; the PQ analog of
    * [[annTopK]]). `queries` (query_id, embedding, ts) may be
    * unbounded, so every construct is streaming-legal:
    *
    *   - probe-cell selection is [[annTopK]]'s stateless HOF ranking
    *     (broadcast centroid array → transform → array_sort → slice);
    *   - ADC scoring CANNOT use the batch path's per-query LUT frame:
    *     the LUT is stream-derived, and joining it back to the
    *     (also stream-derived) candidates would be a stream-stream
    *     join — illegal without watermark range bounds. Instead each
    *     candidate joins the broadcast (STATIC) codebook M times on
    *     its code columns and pays the M fused `sq_dist` directly —
    *     more FLOPs per candidate than LUT reuse, but stateless,
    *     stream-static, and bounded by the probed cells;
    *   - the per-query top-k is the K-bounded [[graft.functions.TopKStructs]]
    *     aggregate; ADC is a DISTANCE, so the natural (adc,
    *     neighbor_id) struct order IS the wanted order — no negation
    *     trick.
    *
    * Output: one row per (arrival window, query, ranked neighbor) —
    * sim18's decision columns behind a window_start, the st05/st09
    * convention. */
  def pqAnnTopK(spark: SparkSession, dir: String, queries: DataFrame,
      cells: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{collect_list, date_format, explode, round, struct, window}
    VectorExprs.register(spark)
    val centArr = centroids(spark, dir)
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cents"))
    val probes = queries
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("ts"), col("embedding").as("qe"),
        explode(expr(
          s"""slice(
             |  transform(
             |    array_sort(transform(cents,
             |      c -> struct(-cosine_sim(embedding, c.ce) AS nc,
             |                  c.cent_id AS cent_id))),
             |    s -> s.cent_id),
             |  1, ${Similarity.IvfNProbe})""".stripMargin)).as("cluster"))
    val cand = cells.join(probes, Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
    val scored = (0 until Similarity.PqM).foldLeft(cand) { (df, m) =>
      df.join(broadcast(cb.select(col("code").as(s"k$m"), col("cw").as(s"cw$m"))),
          col(s"c$m") === col(s"k$m"))
        .withColumn(s"qd$m",
          expr(s"sq_dist(${subSlice("qe", m)}, ${subSlice(s"cw$m", m)})"))
        .drop(s"k$m", s"cw$m")
    }
    scored
      .withColumn("adc",
        (0 until Similarity.PqM).map(m => col(s"qd$m")).reduce(_ + _))
      .select(col("query_id"), col("ts"),
        struct(col("adc"), col("vec_id").as("neighbor_id"),
          col("cluster"), round(col("adc"), 6).as("adc_dist")).as("s"))
      .groupBy(window(col("ts"), "10 minutes"), col("query_id"))
      .agg(expr(s"topk_struct(s, ${Similarity.KnnK})").as("top"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("query_id"), explode(col("top")).as("t"))
      .select(col("window_start"), col("query_id"),
        col("t.neighbor_id").as("neighbor_id"),
        col("t.cluster").as("cluster"),
        col("t.adc_dist").as("adc_dist"))
  }

  // ------------------------------------------------------------------
  // IVF-PQ day-N lifecycle (round 12; VERDICT r11 item 2) — the same
  // three verbs + exactly-once that sim15–17/st10 gave the raw-vector
  // cell table, one level up on the serving layout.
  //
  // CODEBOOK-GENERATION CONTRACT (the drift question, decided): a
  // codebook is IMMUTABLE per index generation. Appends always encode
  // against the generation's PERSISTED codebook table — never a
  // retrained one — because ADC compares code-to-code distances that
  // are only meaningful within one codebook; mixing encodings inside
  // one cell table would silently corrupt every distance involving a
  // re-coded id. When the corpus distribution drifts past what the
  // generation's codebook quantizes well (dq05's KL divergence
  // monitor over the embedding-norm/cell-occupancy histograms is the
  // trigger signal), the remedy is a NEW GENERATION: pqPersist to a
  // fresh prefix (retrain + re-encode from the raw vectors — one
  // corpus pass, the same cost as the original build) and swap
  // serving atomically via the catalog-rename discipline
  // IndexCore.compactTable already uses. Nothing in the probe path
  // ever reads two generations at once.
  // ------------------------------------------------------------------

  /** Append a NEW embedding batch to the persisted PQ serving index:
    * encode against the generation's PERSISTED codebook (batch ×
    * broadcast M·K — the corpus is never re-encoded), assign IVF
    * cells (batch × broadcast centroids), insert batch-stamped into
    * the bucketed code-cell table. bucketBy is stable under append,
    * so the probe's code-cells-only read-path property survives
    * (VecIndexSpec re-asserts it post-append). Single table write,
    * nothing read-then-mutated — no materialize pin needed. */
  def pqAppend(spark: SparkSession, dir: String, newVecs: DataFrame,
      prefix: String, batchId: Long = BandIndex.BaseBatch): Unit = {
    import org.apache.spark.sql.functions.lit
    VectorExprs.register(spark)
    val cb = spark.table(codebookTable(prefix))
    val e = newVecs.select("vec_id", "embedding")
    assignCells(spark, dir, e)
      .select("cluster", "vec_id")
      .join(pqEncode(e, cb), "vec_id")
      .withColumn("ingest_batch", lit(batchId))
      .repartition(IndexCore.bucketsOf(spark, pqCellsTable(prefix)),
        col("cluster")) // bucket-aligned append (round 18)
      .write.mode(SaveMode.Append)
      .bucketBy(IndexCore.bucketsOf(spark, pqCellsTable(prefix)), "cluster")
      .sortBy("cluster")
      .saveAsTable(pqCellsTable(prefix))
  }

  /** Compact the code-cell table to one file per bucket —
    * [[IndexCore.compactTable]]'s zero-exchange per-bucket local
    * rewrite (key-agnostic). Decisions and the read-path property are
    * unchanged; the per-bucket merge reads ONE run instead of one per
    * historical append. The codebook table (M·K rows) never needs
    * compaction. */
  def pqCompact(spark: SparkSession, prefix: String): Unit = {
    val tomb = IndexCore.tombstoneFrame(spark, prefix)
    IndexCore.compactTable(spark, pqCellsTable(prefix), "cluster",
      tomb, minusIdCol = "vec_id")
    if (!spark.catalog.tableExists(cellsTable(prefix)))
      IndexCore.clearTombstones(spark, prefix)
  }

  /** GENERATION PROMOTION — the codebook-drift remedy's final step
    * (round 12; the codebook-generation contract above): atomically
    * swap serving from `prefix`'s tables to `newPrefix`'s freshly
    * built generation (retrained codebook + re-encoded code cells),
    * under the serving prefix's names. The rename-aside discipline is
    * [[IndexCore.compactTable]]'s: at every single-failure point
    * either the original registration is intact or a complete
    * aside-named table remains recoverable next to the fully-written
    * new one; a failed promotion restores the original name before
    * rethrowing. Old-generation files stay on disk under their
    * original path (external tables keep locations across RENAME);
    * the caller's temp-dir lifecycle owns them. The codebook swaps
    * WITH the cells — serving never sees a codebook from one
    * generation against codes from another. */
  def pqSwapGeneration(spark: SparkSession, prefix: String,
      newPrefix: String): Unit =
    Seq(pqCellsTable _, codebookTable _).foreach { f =>
      val live = f(prefix)
      val incoming = f(newPrefix)
      val aside = s"${live}_old${serial.incrementAndGet()}"
      spark.sql(s"ALTER TABLE $live RENAME TO $aside")
      try spark.sql(s"ALTER TABLE $incoming RENAME TO $live")
      catch {
        case e: Throwable =>
          try spark.sql(s"ALTER TABLE $aside RENAME TO $live")
          catch { case _: Throwable => () }
          throw e
      }
      spark.sql(s"DROP TABLE $aside")
    }

  /** O(retired) retention for the SERVING index — [[retireTombstone]]
    * anchored at the code-cell table (a PQ-only generation has no raw
    * cells table to anchor the tombstone location on). Masked by
    * [[pqProbe]] immediately; purged by the next [[pqCompact]]. */
  def pqRetireTombstone(spark: SparkSession, prefix: String,
      expired: DataFrame): Unit =
    IndexCore.recordTombstones(spark, prefix, pqCellsTable(prefix), expired)

  /** RETENTION for the serving index — remove a bounded vec_id set
    * from the code cells in place (broadcast anti-join inside the
    * per-bucket rewrite). Post-retire probes behave as if the vectors
    * were never encoded; the codebook is untouched (codewords carry
    * no per-vector data). */
  def pqRetire(spark: SparkSession, prefix: String,
      expired: DataFrame): Unit =
    IndexCore.compactTable(spark, pqCellsTable(prefix), "cluster",
      Some(expired), minusIdCol = "vec_id")

  /** Exactly-once append for the serving index — the same
    * single-durable-commit design as [[maintainBatch]]: the batch
    * stamp on the appended code-cell rows IS the ledger (one atomic
    * job commit, no append→record window), and the replay guard is
    * [[IndexCore.batchPresent]] on the code-cell table —
    * storage-derived, footer-cheap. A replayed micro-batch whose
    * checkpoint commit marker was lost is a whole-batch no-op. */
  def pqMaintainBatch(spark: SparkSession, dir: String, prefix: String,
      newVecs: DataFrame, batchId: Long): Boolean = {
    require(batchId >= 0,
      s"pqMaintainBatch batchId must be >= 0, got $batchId (ids < 0 are " +
        "reserved for the base-build/ad-hoc stamp)")
    if (IndexCore.batchPresent(spark, pqCellsTable(prefix), batchId)) false
    else {
      pqAppend(spark, dir, newVecs, prefix, batchId)
      true
    }
  }

  private def freshPqIndex(spark: SparkSession, dir: String, tag: String,
      emb: Option[DataFrame]): (String, String) = {
    val key = (spark, dir, tag)
    persistLock.synchronized {
      lastCycle.remove(key).foreach { case (oldPrefix, oldPath) =>
        drop(spark, oldPrefix)
        IndexCore.retireTempDir(oldPath)
      }
      lastCycle.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    }
    val prefix = s"graft_vec_${tag}_${Integer.toHexString(dir.hashCode)}" +
      s"_s${serial.incrementAndGet()}"
    val path = IndexCore.newTempDir(s"vec$tag")
    pqPersist(spark, dir, path, prefix, emb)
    (prefix, path)
  }

  /** sim19: the serving index's full maintenance cycle on a FRESH
    * generation — build on 3/4 of the corpus (codebook trained on the
    * generation's full reference sample), append the remaining 1/4 in
    * 3 disjoint day-slices encoded against the PERSISTED codebook
    * (the file-growth regime), compact to one file per bucket, then
    * serve. The final code cells are DEFINED identical to sim18's
    * full build (same codebook, same per-vector argmax assignment and
    * argmin encoding — both per-vector-independent), so the entry
    * shares sim18's composed end-to-end oracle: a divergence means
    * append re-encoded, broke the bucket layout, or drifted from the
    * generation codebook. */
  def pqLifecycleCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val key = (spark, dir, tag)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (prefix, path) = Phases.time(tag, "persist") {
      freshPqIndex(spark, dir, tag, Some(e.filter(!isNewVec)))
    }
    Phases.time(tag, "append") {
      Seq(0, 4, 8).foreach { r =>
        pqAppend(spark, dir,
          e.filter(pmod(hash(col("vec_id")), lit(12)) === lit(r)), prefix)
      }
    }
    Phases.time(tag, "compact") { pqCompact(spark, prefix) }
    val dec = Phases.time(tag, "probe") {
      pqProbe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** sim20: sim17's retention made BOUNDED-COST — probe the full
    * index (phase 0), TOMBSTONE exactly the neighbors phase 0
    * returned (an O(retired) append — the index files are untouched),
    * re-probe masked (phase 1), compact (the purge), re-probe
    * (phase 2). Phases 1 and 2 are DEFINED identical to each other
    * and to sim17's eager-retire phase 1, so the oracle is sim17's
    * with phase 1 emitted twice. */
  def tombstoneRetentionCycle(spark: SparkSession, dir: String,
      tag: String): DataFrame = {
    import graft.tools.Phases
    import org.apache.spark.sql.functions.lit
    val key = (spark, dir, tag)
    val (prefix, path) = Phases.time(tag, "persist") {
      freshIndex(spark, dir, tag, None)
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    def phaseProbe(n: Int): DataFrame =
      probe(spark, dir, prefix)
        .select(lit(n).as("phase"), col("query_id"), col("neighbor_id"),
          col("cluster"), col("cosine"))
        .localCheckpoint()
    val dec0 = Phases.time(tag, "probe") { phaseProbe(0) }
    val expired = dec0.select(col("neighbor_id").as("vec_id")).distinct()
    Phases.time(tag, "retire") { retireTombstone(spark, prefix, expired) }
    val dec1 = Phases.time(tag, "reprobe") { phaseProbe(1) }
    Phases.time(tag, "purge") { compact(spark, prefix) }
    val dec2 = Phases.time(tag, "probe2") { phaseProbe(2) }
    dec0.unionByName(dec1).unionByName(dec2)
      .orderBy("phase", "query_id", "neighbor_id")
  }

  /** st13: sim19's append driven through the batch-stamp-guarded
    * [[pqMaintainBatch]], with the batch REPLAYED in between — the
    * batch analog of a checkpoint restart that lost the commit
    * marker. The replay must be a stamp-skipped no-op (asserted
    * here); the final serve equals sim18's full build, same composed
    * oracle. StreamingSpec drives the same maintenance through a real
    * readStream foreachBatch with a checkpoint restart. */
  def pqMaintainedCycle(spark: SparkSession, dir: String, tag: String): DataFrame = {
    import graft.tools.Phases
    val key = (spark, dir, tag)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val (prefix, path) = Phases.time(tag, "persist") {
      freshPqIndex(spark, dir, tag, Some(e.filter(!isNewVec)))
    }
    Phases.time(tag, "append") {
      if (!pqMaintainBatch(spark, dir, prefix, e.filter(isNewVec), 0L))
        sys.error("st13: fresh index claims batch 0 already maintained")
      if (pqMaintainBatch(spark, dir, prefix, e.filter(isNewVec), 0L))
        sys.error("st13: replayed batch 0 was not stamp-skipped")
    }
    val dec = Phases.time(tag, "probe") {
      pqProbe(spark, dir, prefix).localCheckpoint()
    }
    persistLock.synchronized { lastCycle(key) = (prefix, path) }
    dec
  }

  /** Streaming-legal cell-occupancy DRIFT MONITOR (st14 — dq07's
    * form at the place a drift monitor actually runs: the ingest
    * stream). `batch` (vec_id, embedding, ts) may be unbounded, so
    * every construct is streaming-legal, and the whole monitor is ONE
    * stateful aggregation:
    *
    *   - cell assignment is the stateless HOF argmax over the
    *     broadcast centroid array ([[annTopK]]'s probe-selection
    *     pattern, sliced to 1);
    *   - the reference occupancy p (the indexed corpus's smoothed
    *     cell distribution) rides in as a broadcast STATIC 1-row
    *     array BEFORE the aggregation — joining it after the agg
    *     would chain a stream-static join behind a streaming
    *     aggregation, and carrying it through `first()` keeps the
    *     plan single-stateful-operator;
    *   - per-window occupancy is a PIVOTED single aggregation (one
    *     conditional sum per cell — K bounded columns), never a
    *     second groupBy;
    *   - the KL total is a fixed-order fold of 6-dp-rounded terms
    *     summed as DECIMAL(18,6) — exact, so the per-window decision
    *     is bit-reproducible and oracle-mirrorable.
    *
    * Output: one row per arrival window — (window_start, n_new,
    * kl_total, retrain). */
  def streamingCellDrift(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{collect_list, count, date_format, first, lit, pmod, struct, sum, when, window, log => ln}
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    VectorExprs.register(spark)
    val k = Similarity.IvfCentroids
    // reference occupancy from the indexed corpus (the non-quarter
    // slice — dq07's convention), as one broadcastable array row
    val corpus = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
      .filter(pmod(col("vec_id"), lit(4)) =!= lit(0))
    val pArr = assignCells(spark, dir, corpus)
      .groupBy("cluster").agg(count(lit(1)).as("cnt"))
      .agg(collect_list(struct(col("cluster"), col("cnt"))).as("occ"),
        sum(col("cnt")).as("n_old"))
      .select(expr(
        s"""transform(sequence(0, ${k - 1}), c ->
           |  CAST(coalesce(element_at(
           |         map_from_entries(transform(occ, o -> struct(o.cluster, o.cnt))),
           |         CAST(c AS BIGINT)), 0) + 1 AS DOUBLE)
           |  / (CAST(n_old AS DOUBLE) + $k))""".stripMargin).as("ps"))
    val centArr = centroids(spark, dir)
      .agg(collect_list(struct(col("cent_id"), col("ce"))).as("cents"))
    val assigned = batch
      .crossJoin(broadcast(centArr))
      .crossJoin(broadcast(pArr))
      .select(col("ts"), col("ps"),
        expr(
          s"""element_at(
             |  transform(
             |    array_sort(transform(cents,
             |      c -> struct(-cosine_sim(embedding, c.ce) AS nc,
             |                  c.cent_id AS cent_id))),
             |    s -> s.cent_id),
             |  1)""".stripMargin).as("cluster"))
    val aggs =
      count(lit(1)).as("n_new") +:
        first(col("ps")).as("ps") +:
        (0 until k).map(c =>
          sum(when(col("cluster") === c, 1L).otherwise(0L)).as(s"n$c"))
    val counts = assigned
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(aggs.head, aggs.tail: _*)
    def q(c: Int) = (col(s"n$c") + lit(1L)).cast(DoubleType) /
      (col("n_new").cast(DoubleType) + lit(k.toDouble))
    val klTotal = (0 until k).map { c =>
      val p = expr(s"element_at(ps, ${c + 1})")
      round(q(c) * ln(q(c) / p), 6).cast(DecimalType(18, 6))
    }.reduce(_ + _).cast(DoubleType)
    counts.select(
      date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("n_new"),
      klTotal.as("kl_total"),
      (klTotal > lit(Similarity.KlRetrainThreshold)).as("retrain"))
  }

  /** Idempotent build registry for the sim18 catalog entry — same
    * shape and rationale as [[ensurePersisted]]: the IVF-PQ index is
    * a durable artifact; the bench re-times the PROBE. */
  private val pqPersistedFor =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]

  def ensurePqPersisted(spark: SparkSession, dir: String,
      tag: String = "sim18"): String = {
    val key = (spark, dir, tag)
    pqPersistedFor.get(key).getOrElse(persistLock.synchronized {
      pqPersistedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      pqPersistedFor.getOrElseUpdate(key, {
        val prefix = s"graft_vec_${tag}_${Integer.toHexString(dir.hashCode)}" +
          s"_s${serial.incrementAndGet()}"
        val path = IndexCore.newTempDir(s"vec$tag")
        pqPersist(spark, dir, path, prefix)
        prefix
      })
    })
  }

  // ------------------------------------------------------------------
  // Matryoshka persisted-prefix layout (sim28; round-15 VERDICT
  // item 8). sim27's funnel SAVES COMPUTE (score 16 of 64 dims) but
  // still READS full 64-dim vectors on the candidate pass — the
  // floor/ceiling gap its scaladoc names. This layout closes it
  // physically: the serving table carries the [[Similarity
  // .MatryoshkaPrefix]]-dim prefix as its OWN parquet column
  // (vec_id, pfx, embedding), so the corpus-wide candidate scan
  // column-prunes to (vec_id, pfx) — ~4× fewer vector bytes read
  // where it matters, the pass that touches every row per query
  // batch. The exact re-rank joins the C-bounded survivors back to
  // the same table's full-vector column. Honest accounting: in a
  // pure columnar harness that re-rank is a second scan of the
  // embedding column (row-bounded compute, column-sized bytes); a
  // production serving store does the bounded fetch as point reads —
  // SCALE_NOTES carries the measured per-column byte split. Both
  // stages fold bit-identically to sim27's (pfx IS the materialized
  // slice; the re-rank reads the untouched full vector), so sim28
  // shares sim27's oracle row for row.
  // ------------------------------------------------------------------

  def matTable(prefix: String): String = s"${prefix}_mat"

  def persistMat(spark: SparkSession, dir: String, path: String,
      prefix: String, buckets: Int = Buckets): Unit = {
    import org.apache.spark.sql.functions.lit
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr(s"slice(embedding, 1, ${Similarity.MatryoshkaPrefix})").as("pfx"),
        col("embedding"))
      .withColumn("ingest_batch", lit(BandIndex.BaseBatch))
      .repartition(buckets, col("vec_id")) // bucket-aligned (round 18)
      .write
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .option("path", s"$path/mat")
      .mode(SaveMode.Overwrite)
      .saveAsTable(matTable(prefix))
  }

  /** Matryoshka serving against the persisted-prefix layout: the
    * candidate pass scans ONLY (vec_id, pfx) — Round15OpsSpec pins
    * the pruned ReadSchema — and the exact re-rank joins the
    * C-bounded survivors back to the full-vector column of the same
    * bucketed table (both sides bucketed by vec_id: no shuffle on
    * the corpus side). Decisions are DEFINED identical to sim27's. */
  def matProbe(spark: SparkSession, dir: String, prefix: String): DataFrame =
    matProbe(spark, dir, prefix, fixedQueries(spark, dir))

  /** [[matProbe]] over a (vec_id, embedding) query FRAME. */
  def matProbe(spark: SparkSession, dir: String, prefix: String,
      qf: DataFrame): DataFrame = {
    VectorExprs.register(spark)
    val t = spark.table(matTable(prefix))
    val q = qf
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        expr(s"slice(embedding, 1, ${Similarity.MatryoshkaPrefix})").as("qp"))
    val wp = Window.partitionBy("query_id")
      .orderBy(col("pcos").desc, col("neighbor_id").asc)
    val cands = t.select(col("vec_id").as("neighbor_id"), col("pfx"))
      .join(broadcast(q.select("query_id", "qp")),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("pcos", expr("cosine_sim(qp, pfx)"))
      .withColumn("prn", row_number().over(wp))
      .filter(col("prn") <= Similarity.MatryoshkaCand)
      .select("query_id", "neighbor_id", "pcos")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands
      .join(t.select(col("vec_id").as("neighbor_id"), col("embedding").as("te")),
        Seq("neighbor_id"))
      .join(broadcast(q.select("query_id", "qe")), Seq("query_id"))
      .withColumn("cos", expr("cosine_sim(qe, te)"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Similarity.KnnK)
      .select(col("query_id"), col("neighbor_id"),
        round(col("pcos"), 6).as("prefix_cosine"),
        round(col("cos"), 6).as("cosine"))
      .orderBy("query_id", "neighbor_id")
  }

  def ensureMatPersisted(spark: SparkSession, dir: String,
      tag: String = "sim28"): String = {
    val key = (spark, dir, s"mat-$tag")
    persistedFor.get(key).getOrElse(persistLock.synchronized {
      persistedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      persistedFor.getOrElseUpdate(key, {
        val prefix = s"graft_vec_${tag}_${Integer.toHexString(dir.hashCode)}" +
          s"_s${serial.incrementAndGet()}"
        val path = IndexCore.newTempDir(s"vec$tag")
        persistMat(spark, dir, path, prefix)
        prefix
      })
    })
  }

  /** Drop the registered tables (files under the index path are
    * external; the temp-dir lifecycle owns them). */
  def drop(spark: SparkSession, prefix: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${cellsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${matTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${pqCellsTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${codebookTable(prefix)}")
    spark.sql(s"DROP TABLE IF EXISTS ${IndexCore.tombstonesTable(prefix)}")
  }

  // Idempotent persist registry — same shape and rationale as
  // BandIndex.ensurePersisted: the index is a durable artifact, the
  // bench's repeated sweeps re-time the PROBE (the production read
  // path), and the temp dirs ride BandIndex's shutdown-hook cleanup.
  private val persistedFor =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), String]
  private val persistLock = new Object
  private val serial = new java.util.concurrent.atomic.AtomicLong(0)

  def ensurePersisted(spark: SparkSession, dir: String,
      tag: String = "sim14"): String = {
    val key = (spark, dir, tag)
    persistedFor.get(key).getOrElse(persistLock.synchronized {
      persistedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      persistedFor.getOrElseUpdate(key, {
        val prefix = s"graft_vec_${tag}_${Integer.toHexString(dir.hashCode)}" +
          s"_s${serial.incrementAndGet()}"
        val path = IndexCore.newTempDir(s"vec$tag")
        persist(spark, dir, path, prefix)
        prefix
      })
    })
  }

  /** [[ensurePersisted]] for the COVERING layout ([[persistCovering]])
    * — its own registry key so the base and covering indexes coexist
    * in one session (they are different durable artifacts). */
  def ensureCoveringPersisted(spark: SparkSession, dir: String,
      tag: String = "sim23"): String = {
    val key = (spark, dir, s"covering-$tag")
    persistedFor.get(key).getOrElse(persistLock.synchronized {
      persistedFor.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
      persistedFor.getOrElseUpdate(key, {
        val prefix = s"graft_vec_${tag}_${Integer.toHexString(dir.hashCode)}" +
          s"_s${serial.incrementAndGet()}"
        val path = IndexCore.newTempDir(s"vec$tag")
        persistCovering(spark, dir, path, prefix)
        prefix
      })
    })
  }
}
