package graft.tools

import org.apache.spark.sql.SparkSession

/** Scans every catalog query's physical plan for repeated EXPENSIVE
  * expression markers — the fingerprint of the alias-inlining /
  * inferred-filter double-evaluation pathologies (SCALE_NOTES History
  * #7 and the df01/dd09 materialization barriers). Prints any query
  * where a marker appears more often than its threshold; silence
  * means the catalog is clean.
  *
  * Usage: tools/run.sh graft.tools.PlanScan [sfDir]
  */
object PlanScan {
  // marker -> max benign occurrences in one plan (md5 appears once
  // per phash call site; several operators legitimately hash 2-3
  // distinct inputs, and minhash CTE-style pipelines reuse a cached
  // stage so their md5 shows once)
  private val markers: Seq[(String, Int)] = Seq(
    "tokenstats(" -> 1,
    "levenshtein(" -> 1,
    "regexp_extract_all(" -> 4,
    "simhash_mix(" -> 1,
    "minhash_mix(" -> 2,
    "array_distinct(" -> 4,
    "aggregate(" -> 6)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.pin(spark)
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val lower = plan.toLowerCase
        markers.foreach { case (m, limit) =>
          // word boundary: "aggregate(" must not match "HashAggregate("
          val re = ("(?<![a-z0-9_])" + java.util.regex.Pattern.quote(m)).r
          val n = re.findAllMatchIn(lower).length
          if (n > limit) {
            flagged += 1
            println(f"$name%-26s $m%-22s x$n (limit $limit)")
          }
        }
      } catch { case e: Throwable =>
        println(s"$name ERR ${e.getMessage.take(80)}")
      }
    }
    println(s"flagged: $flagged")
    spark.stop()
  }
}
