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
  * Maintenance verbs follow [[BandIndex]] unchanged — bucketBy is
  * append-stable for admitting new vectors to their cells, and the
  * compaction/retention rewrites are key-agnostic — so they are not
  * duplicated here; the band index is where those cycles are proven
  * under the oracle gate (dd16/dd17/dd18).
  *
  * Cites: reference has no vector ops; extension per SURVEY.md §2
  * ("similarity search — IVF as the scale path").
  */
object VecIndex {

  val Buckets = 8

  def cellsTable(prefix: String): String = s"${prefix}_cells"

  /** Coarse centroids — sim04's convention: the first
    * [[Similarity.IvfCentroids]] vectors, a deterministic K-sized
    * frame with its `vec_id < K` filter pushed to the parquet scan. */
  private def centroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < Similarity.IvfCentroids)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))

  /** Build and persist the IVF assignment: one corpus × broadcast
    * centroids scoring pass, argmax cell per vector, written bucketed
    * by cluster. This is the INDEX BUILD — paid once, not per probe. */
  def persist(spark: SparkSession, dir: String, path: String,
      prefix: String): Unit = {
    VectorExprs.register(spark)
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val assigned = e.crossJoin(broadcast(centroids(spark, dir)))
      .withColumn("cos_c", expr("cosine_sim(embedding, ce)"))
      .withColumn("crn", row_number().over(
        Window.partitionBy("vec_id")
          .orderBy(col("cos_c").desc, col("cent_id").asc)))
      .filter(col("crn") === 1)
      .select(col("cent_id").as("cluster"), col("vec_id"), col("embedding"))
    assigned.write
      .bucketBy(Buckets, "cluster").sortBy("cluster")
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
  def probe(spark: SparkSession, dir: String, prefix: String): DataFrame = {
    VectorExprs.register(spark)
    val queries = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < Similarity.KnnQueries)
      .select("vec_id", "embedding")
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
    spark.table(cellsTable(prefix))
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
        val path = BandIndex.newTempDir(s"vec$tag")
        persist(spark, dir, path, prefix)
        prefix
      })
    })
  }
}
