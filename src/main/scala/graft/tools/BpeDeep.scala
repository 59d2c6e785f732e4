package graft.tools

import org.apache.spark.sql.SparkSession

/** Production-depth BPE training measurement (round-8 VERDICT item 3:
  * tx13 trains 6 merges; a production vocab is 32K). Trains ≥256
  * merges over the distinct-word table and reports the per-round cost
  * curve, two ways:
  *
  *   sequential — [[graft.ops.TextAnalysis.bpeMergeRound]] with a
  *     checkpoint roll each round, plus cadence-2/4 variants: each
  *     un-checkpointed round embeds the word table twice, so k
  *     chained rounds are a 2^k-fold plan — measured: cadence 2 ≈
  *     cadence 1 within noise, cadence 4 ~35% slower (the opposite
  *     regime from PageRank's linear chains, where cadence ~10 wins);
  *   batched — [[graft.ops.TextAnalysis.bpeMergeRoundBatched]] with
  *     m symbol-disjoint merges per scan, the 32K-vocab scale path:
  *     merge count per scan is bounded only by symbol-disjointness,
  *     so reaching a vocab target costs ~target/m scans.
  *
  * Per-decade block times expose drift: a flat row means per-round
  * cost is independent of round index (the word table's SIZE is
  * Heaps'-bounded and its repr strings only grow by merged symbols).
  *
  * Usage: tools/run.sh graft.tools.BpeDeep [merges] [batchM]
  *   (dataset from SPARK_GRAFT_SF_DIR, default sf0.01)
  */
object BpeDeep {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(256)
    val batchM = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.muteReviewedWindowWarning()
    graft.Tables.pin(spark)

    val (load0, _) = LoadGuard.awaitQuiet()
    println(f"bpe depth over $sfDir (loadavg $load0%.2f)")

    import graft.ops.{Ckpt, TextAnalysis}

    def decades(label: String, times: Seq[Double], roundsPerStep: Int): Unit = {
      val n = times.size
      val dec = math.max(1, n / 10)
      println(f"$label: ${times.sum}%.1f s total, $n steps × $roundsPerStep merges")
      times.grouped(dec).zipWithIndex.foreach { case (blk, i) =>
        println(f"  steps ${i * dec}%4d..${i * dec + blk.size - 1}%4d  " +
          f"avg ${blk.sum / blk.size}%6.3f s/step  " +
          f"(${blk.sum / blk.size / roundsPerStep}%6.4f s/merge)")
      }
    }

    // Fourth-decade word supply (round-9 VERDICT item 8): the
    // synthetic corpus pretokenizes to only ~60 distinct words
    // (≈110-merge saturation ceiling — the round-9 sentinel fix
    // exists because of it), so a ≥1024-merge curve is structurally
    // unreachable on the unigram units. The depth fixture keeps the
    // SAME corpus and the SAME trainer code paths but makes the
    // training unit the adjacent word BIGRAM (916 distinct units,
    // ~8.2K merge supply at sf0.01) — exactly how a tokenizer's
    // effective vocabulary grows with corpus richness, without
    // synthesizing any data.
    def bigramWords0: org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      val D = TextAnalysis.BpeDelim
      graft.Tables.documents(spark, sfDir)
        .select(expr(
          s"regexp_extract_all(lower(text), '${TextAnalysis.BpePattern}', 0)").as("ws"))
        .select(explode(expr(
          """transform(sequence(1, greatest(size(ws) - 1, 0)),
            |  i -> concat(trim(element_at(ws, i)), '_', trim(element_at(ws, i + 1))))"""
            .stripMargin)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .withColumn("repr", expr(s"regexp_replace(w, '(.)', '$D$$1')"))
        .select("w", "freq", "repr")
    }

    // NATURAL-unit word supply (round-12 VERDICT item 4; round-10's
    // dropped task 7): the synthetic corpus pretokenizes to ~60
    // distinct words, so past ~110 merges the unigram curve
    // saturates, and round 9's bigram workaround trains on units no
    // real tokenizer would see. This fixture SYNTHESIZES the word
    // table a richer corpus would pretokenize to: 6,000 distinct
    // morphologically-composed word forms (30 onsets × 20 roots × 10
    // suffixes — the productive-morphology shape real vocabularies
    // have, which is exactly what gives BPE its merge supply) with
    // Zipf-ranked frequencies decorrelated from the morphology by a
    // hash. Every form is validated against the REAL pretokenizer
    // (regexp_extract must return the word whole), and repr/trainer
    // code paths are tx13's own — only the word supply is synthetic,
    // and the training unit is the natural word.
    def naturalWords0: org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      val D = TextAnalysis.BpeDelim
      val onsets = Seq("b", "c", "d", "f", "g", "h", "j", "k", "l", "m",
        "n", "p", "r", "s", "t", "v", "w", "z", "br", "ch",
        "cl", "dr", "fr", "gr", "pl", "pr", "sh", "st", "tr", "qu")
      val roots = Seq("an", "ar", "el", "en", "er", "il", "in", "ol", "on", "or",
        "ul", "un", "ad", "ed", "id", "od", "ag", "ig", "og", "ut")
      val sufs = Seq("a", "e", "i", "o", "u", "is", "os", "um", "ing", "tion")
      val n = onsets.size * roots.size * sufs.size
      spark.range(n)
        .select(col("id"),
          concat(
            element_at(array(onsets.map(lit): _*), (col("id") / (roots.size * sufs.size)).cast("int") + 1),
            element_at(array(roots.map(lit): _*), ((col("id") / sufs.size) % roots.size).cast("int") + 1),
            element_at(array(sufs.map(lit): _*), (col("id") % sufs.size).cast("int") + 1)).as("w"))
        .withColumn("rank", pmod(hash(col("id")), lit(n)) + 1)
        .withColumn("freq", greatest(lit(1L), floor(lit(20L * n) / col("rank")).cast("long")))
        .filter(expr(s"regexp_extract(w, '${TextAnalysis.BpePattern}', 0) = w"))
        .withColumn("repr", expr(s"regexp_replace(w, '(.)', '$D$$1')"))
        .select("w", "freq", "repr")
    }

    def train(label: String, steps: Int, roundsPerStep: Int,
        round: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        ckptEvery: Int = 1,
        words0: => org.apache.spark.sql.DataFrame = TextAnalysis.bpeWords0(spark, sfDir)): Unit = {
      var (wds, ids) = Ckpt.roll(spark, words0, Set.empty[Int])
      val times = (1 to steps).map { k =>
        val t0 = System.nanoTime()
        wds = round(wds)
        if (k % ckptEvery == 0 || k == steps) {
          val rolled = Ckpt.roll(spark, wds, ids)
          wds = rolled._1
          ids = rolled._2
        }
        (System.nanoTime() - t0) / 1e9
      }
      decades(label, times, roundsPerStep)
      val vocab = wds.selectExpr(
        s"explode(filter(split(repr, '${TextAnalysis.BpeDelim}'), x -> x <> '')) AS t")
        .select("t").distinct().count()
      println(f"$label: final symbol vocab $vocab")
    }

    if (args.contains("natural")) {
      // round 12: the ≥1024-merge curve on NATURAL word units — the
      // 6,000-distinct-form synthetic vocabulary above, measured with
      // the measured-cheapest trainer config (batched symbol-disjoint
      // merges, checkpoint cadence 2). Distinct-word and merge-supply
      // stats print first so the SCALE_NOTES row is self-contained.
      val w0 = naturalWords0
      println(s"natural-unit supply: ${w0.count()} distinct words, " +
        s"${w0.agg(org.apache.spark.sql.functions.sum("freq")).head.getLong(0)} tokens")
      train(f"batched m=$batchM ckpt=2 x$merges (natural word units)",
        math.max(1, merges / batchM),
        batchM, w => TextAnalysis.bpeMergeRoundBatched(w, batchM),
        ckptEvery = 2, words0 = naturalWords0)
    } else if (args.contains("deep")) {
      // fourth decade (round-9 VERDICT item 8): ONLY the
      // measured-cheapest config — batched symbol-disjoint merges,
      // checkpoint cadence 2 — pushed to the requested merge target
      // (≥1024). The per-decade table is the flat-or-declining
      // per-merge evidence for SCALE_NOTES.
      train(f"batched m=$batchM ckpt=2 x$merges (bigram units)",
        math.max(1, merges / batchM),
        batchM, w => TextAnalysis.bpeMergeRoundBatched(w, batchM),
        ckptEvery = 2, words0 = bigramWords0)
    } else {
      // sequential: one merge per checkpointed step — tx13's exact shape
      train(s"sequential x$merges", merges, 1, TextAnalysis.bpeMergeRound)
      // cadence > 1: each un-checkpointed round embeds the word table
      // TWICE (argmax + fold), so k chained rounds are a 2^k-fold plan —
      // measured to confirm cadence 1 is the optimum for this shape
      // (64 merges is enough to see it; 256 would crawl)
      train(s"sequential ckpt=2 x64", 64, 1, TextAnalysis.bpeMergeRound, ckptEvery = 2)
      train(s"sequential ckpt=4 x64", 64, 1, TextAnalysis.bpeMergeRound, ckptEvery = 4)
      // batched: m disjoint merges per scan, same target merge count
      train(f"batched m=$batchM x$merges", math.max(1, merges / batchM), batchM,
        w => TextAnalysis.bpeMergeRoundBatched(w, batchM))
    }
    spark.stop()
  }
}
