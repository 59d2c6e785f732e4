package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Proves salted skew joins are semantics-preserving and actually
  * spread the hot key: a synthetic 90%-skewed fact joined to a dim
  * must give byte-identical results salted vs unsalted, and the
  * salted shuffle key must fan the hot key across buckets.
  */
class SaltingSpec extends SparkSpec {

  import spark.implicits._

  test("salted join equals plain join on 90%-skewed data") {
    // 90k rows on key 7, 10k spread over 100 other keys
    val fact = spark.range(100000L)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        (col("id") * 3).as("payload"))
    val dim = spark.range(100L).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

    val plain = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        countDistinct(col("name")).as("d"))
      .head()
    val salted = Salting.saltedInnerJoin(fact, dim, "k", buckets = 16, saltSource = "id")
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        countDistinct(col("name")).as("d"))
      .head()
    assert(plain.getLong(0) === salted.getLong(0))
    assert(plain.getLong(1) === salted.getLong(1))
    assert(plain.getLong(2) === salted.getLong(2))
  }

  test("hot-only split join equals plain join on 90%-skewed data") {
    val fact = spark.range(100000L)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        (col("id") * 3).as("payload"))
    val dim = spark.range(100L).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

    val plain = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        countDistinct(col("name")).as("d"))
      .head()
    val split = Salting.skewSplitJoin(fact, dim, "k",
        hotKeys = Seq(7L), buckets = 16, saltSource = "id")
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        countDistinct(col("name")).as("d"))
      .head()
    assert(plain.getLong(0) === split.getLong(0))
    assert(plain.getLong(1) === split.getLong(1))
    assert(plain.getLong(2) === split.getLong(2))
  }

  test("frame-driven split join equals plain join, for exact AND superset hot sets") {
    val fact = spark.range(100000L)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        (col("id") * 3).as("payload"))
    val dim = spark.range(100L).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val plain = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        countDistinct(col("name")).as("d"))
      .head()
    // the j14 contract: the hot set arrives as an in-plan frame, and
    // sketch FALSE POSITIVES (cold keys flagged hot) must not change
    // the result — only the shuffle layout
    Seq(Seq(7L), Seq(7L, 3L, 50L, 999L)).foreach { hs =>
      val hot = hs.toDF("k")
      val got = Salting.skewSplitJoinByFrame(fact, dim, "k", hot,
          buckets = 16, saltSource = "id")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
          countDistinct(col("name")).as("d"))
        .head()
      assert(plain.getLong(0) === got.getLong(0), s"hot=$hs")
      assert(plain.getLong(1) === got.getLong(1), s"hot=$hs")
      assert(plain.getLong(2) === got.getLong(2), s"hot=$hs")
    }
  }

  test("hot key fans out across salt buckets") {
    val fact = spark.range(10000L)
      .select(col("id"), lit(7L).as("k"), col("id").as("payload"))
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(16)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect()
    assert(buckets.length === 16, "hot key must hit every salt bucket")
    // roughly uniform: no bucket more than 3× the mean
    val mean = 10000.0 / 16
    assert(buckets.forall(_.getLong(1) < mean * 3))
  }
}
