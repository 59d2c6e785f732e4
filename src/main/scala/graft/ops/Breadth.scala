package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Function-surface breadth: the scalar/aggregate families a user of
  * a complete engine expects beyond the reference's inventory —
  * percentiles, moment statistics, string ops, array ops,
  * regexp/JSON extraction, datetime parts. Each family is one catalog
  * query with an exact DuckDB oracle.
  */
object Breadth {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Exact interpolated percentiles (median / p90)
    "a13_percentiles" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(trim(col("event_type")).as("line"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("median_value"),
          round(expr("percentile(value, 0.9)"), 6).as("p90_value"))
        .orderBy("line")),

    // Moment statistics: stddev / variance / correlation / covariance
    "a14_stats" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("epoch_s", unix_timestamp(col("ts")).cast(DoubleType))
        .groupBy(trim(col("event_type")).as("line"))
        .agg(
          round(stddev_samp(col("value")), 6).as("sd_value"),
          round(var_samp(col("value")), 6).as("var_value"),
          round(corr(col("value"), col("epoch_s")), 6).as("corr_value_time"),
          round(covar_samp(col("value"), col("epoch_s")), 2).as("covar_value_time"))
        .orderBy("line")),

    // HLL approximate distinct — the 100 TB form of A6 (exact
    // countDistinct shuffles an Expand of every key; the sketch is
    // mergeable constant-size state). HLL digests are engine-specific,
    // so the ESTIMATE can't hash-match DuckDB — instead the ±rsd error
    // bound is asserted IN-PLAN (`within_bound`) and the oracle pins
    // that assertion to TRUE alongside the exact counts: a hash match
    // IS the quantified accuracy check. Bound = 3×rsd (rsd 0.05
    // default) — the standard 3-sigma envelope for HLL's ~normal
    // estimate error; OpsSpec additionally pins the observed error at
    // the tighter 1×rsd on the test SF, and proves sketch
    // mergeability.
    "a15_approx_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(trim(col("event_type")).as("line"))
        .agg(
          approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("line"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast(DoubleType) /
            col("exact_users").cast(DoubleType) <= lit(0.15)).as("within_bound"))
        .orderBy("line")),

    // Mergeable-sketch rollup — the pattern that makes a15 pay at
    // 100 TB: per-day HLL sketches are built ONCE from the raw scan,
    // then the cumulative ("users to date") series is computed by
    // MERGING stored sketches — the raw table is never rescanned per
    // rollup window. Here the daily frame self-joins (d2 <= day,
    // days² sketch merges over a calendar-bounded frame); exact
    // versions ride alongside, and like a15 the oracle pins the
    // in-plan 3×rsd bound assertions TRUE on both series while the
    // exact sides hash-match.
    "a21_sketch_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val daily = ev.groupBy("day").agg(
        hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("daily_exact"))
      val cumSk = daily.as("a")
        .join(broadcast(daily.select(col("day").as("d2"), col("sk").as("sk2"))),
          col("d2") <= col("a.day"))
        .groupBy(col("a.day").as("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk2"))).as("cum_est"))
      val days = daily.select(col("day").as("d3"))
      val cumEx = ev.select(col("day").as("eday"), col("user_id"))
        .join(broadcast(days), col("eday") <= col("d3"))
        .groupBy(col("d3").as("day"))
        .agg(countDistinct(col("user_id")).as("cum_exact"))
      daily.withColumn("daily_est", hll_sketch_estimate(col("sk")))
        .join(cumSk, "day").join(cumEx, "day")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("daily_exact"), col("cum_exact"),
          (abs(col("daily_est") - col("daily_exact")).cast(DoubleType) <=
            col("daily_exact").cast(DoubleType) * 0.05).as("daily_within_bound"),
          (abs(col("cum_est") - col("cum_exact")).cast(DoubleType) <=
            col("cum_exact").cast(DoubleType) * 0.05).as("cum_within_bound"))
        .orderBy("day")
    }),

    // String function family
    "p14_string_funcs" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        upper(col("source")).as("source_upper"),
        lpad(col("doc_id").cast(StringType), 6, "0").as("doc_key"),
        substring(col("text"), 1, 10).as("prefix10"),
        regexp_replace(col("source"), "src", "s").as("source_short"),
        reverse(col("lang")).as("lang_rev"),
        levenshtein(col("lang"), lit("en")).as("lang_dist"))
        .orderBy("doc_id")),

    // Array function family over tokens
    "p15_array_funcs" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("tokens", expr("filter(split(lower(text), ' +'), t -> t <> '')"))
        .select(
          col("doc_id"),
          array_join(slice(sort_array(col("tokens")), 1, 3), "-").as("sorted_first3"),
          array_contains(col("tokens"), "the").as("has_the"),
          size(array_distinct(col("tokens"))).cast(LongType).as("n_distinct"))
        .orderBy("doc_id")),

    // Regexp extraction/masking + JSON path access over props
    "p16_regexp_json" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("props"), "[0-9]", "X").as("masked"),
        get_json_object(col("props"), "$.k").as("k_str"))
        .orderBy("event_id")),

    // Datetime part family
    "p17_datetime" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("h"),
        minute(col("ts")).as("mi"),
        (weekday(col("ts")) + 1).as("isodow"), // Monday=1, matches isodow
        date_format(col("ts") + expr("INTERVAL 7 DAYS"), "yyyy-MM-dd").as("plus7d"),
        last_day(col("ts")).cast(StringType).as("month_end"))
        .orderBy("event_id"))
  )

  val oracle: Map[String, String] = Map(
    "a13_percentiles" ->
      """SELECT trim(event_type) AS line,
        |       round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS median_value,
        |       round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_value
        |FROM events GROUP BY 1 ORDER BY line""".stripMargin,

    "a14_stats" ->
      """SELECT trim(event_type) AS line,
        |       round(stddev_samp(value), 6) AS sd_value,
        |       round(var_samp(value), 6) AS var_value,
        |       round(corr(value, CAST(floor(epoch(ts)) AS DOUBLE)), 6) AS corr_value_time,
        |       round(covar_samp(value, CAST(floor(epoch(ts)) AS DOUBLE)), 2) AS covar_value_time
        |FROM events GROUP BY 1 ORDER BY line""".stripMargin,

    // Exact side is oracled exactly; `TRUE AS within_bound` pins the
    // Spark-side in-plan assertion that the HLL estimate sits inside
    // the 3×rsd envelope — the hash match is the accuracy check.
    "a15_approx_distinct" ->
      """SELECT trim(event_type) AS line,
        |       count(DISTINCT user_id) AS exact_users,
        |       TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY line""".stripMargin,

    // exact sides recomputed from scratch; the sketch estimates are
    // pinned through the in-plan bound assertions (a15 convention)
    "a21_sketch_rollup" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(DISTINCT user_id) AS daily_exact
        |  FROM events GROUP BY 1
        |),
        |cum AS (
        |  SELECT d.day, count(DISTINCT e.user_id) AS cum_exact
        |  FROM daily d JOIN events e ON CAST(e.ts AS DATE) <= d.day
        |  GROUP BY 1
        |)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.daily_exact, c.cum_exact,
        |       TRUE AS daily_within_bound, TRUE AS cum_within_bound
        |FROM daily d JOIN cum c USING (day) ORDER BY day""".stripMargin,

    "p14_string_funcs" ->
      """SELECT doc_id,
        |       upper(source) AS source_upper,
        |       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS doc_key,
        |       substr(text, 1, 10) AS prefix10,
        |       regexp_replace(source, 'src', 's', 'g') AS source_short,
        |       reverse(lang) AS lang_rev,
        |       levenshtein(lang, 'en') AS lang_dist
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p15_array_funcs" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), ' +'), t -> t <> '') AS tokens
        |  FROM documents
        |)
        |SELECT doc_id,
        |       array_to_string(list_sort(tokens)[1:3], '-') AS sorted_first3,
        |       list_contains(tokens, 'the') AS has_the,
        |       CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct
        |FROM tok ORDER BY doc_id""".stripMargin,

    "p16_regexp_json" ->
      """SELECT event_id,
        |       regexp_extract(props, '([0-9]+)', 1) AS digits,
        |       regexp_replace(props, '[0-9]', 'X', 'g') AS masked,
        |       json_extract_string(props, '$.k') AS k_str
        |FROM events ORDER BY event_id""".stripMargin,

    "p17_datetime" ->
      """SELECT event_id,
        |       CAST(year(ts) AS INT) AS y,
        |       CAST(month(ts) AS INT) AS m,
        |       CAST(day(ts) AS INT) AS dom,
        |       CAST(hour(ts) AS INT) AS h,
        |       CAST(minute(ts) AS INT) AS mi,
        |       CAST(isodow(ts) AS INT) AS isodow,
        |       strftime(ts + INTERVAL 7 DAY, '%Y-%m-%d') AS plus7d,
        |       CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS month_end
        |FROM events ORDER BY event_id""".stripMargin
  )
}
