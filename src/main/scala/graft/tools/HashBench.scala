package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the ORACLE-PARITY TAX in the signature family: every
  * shingle hash uses the engine-portable md5-prefix (`Portable.phash`)
  * so DuckDB can reproduce signatures bit-for-bit, but a production
  * deployment — which needs determinism, not cross-engine
  * reproducibility — would use `xxhash64` (codegen, no hex/conv
  * round-trip). This tool times the dd02-shaped signature pass under
  * both hashes at sf0.1; the delta is the ceiling on what a hash swap
  * buys dd02/dd03/dd04/dd05/dd09 at 100 TB.
  *
  * Usage: tools/run.sh graft.tools.HashBench
  */
object HashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.pin(spark)
    graft.functions.VectorExprs.register(spark)

    val tokensExpr = graft.ops.TextAnalysis.tokensExpr
    val shinglesExpr = graft.ops.TextAnalysis.shinglesExpr
    val mod = graft.ops.Dedup.MixMod
    val md5Hash = graft.functions.Portable.phashExpr("s")
    // the production form: one codegen hash, no md5/hex/conv chain
    val xxHash = "xxhash64(s)"

    def sigPass(hashExpr: String): Long = {
      graft.Tables.documents(spark, sfDir)
        .withColumn("tokens", expr(tokensExpr))
        .withColumn("shingles", expr(shinglesExpr))
        .select(expr(s"minhash_mix(transform(shingles, s -> ($hashExpr) % $mod))").as("sigs"))
        .agg(count(lit(1)), sum(expr("element_at(sigs, 1)")))
        .collect()
      0L
    }

    def time(label: String, hashExpr: String): Double = {
      def one(): Double = {
        System.gc()
        val t0 = System.nanoTime()
        sigPass(hashExpr)
        (System.nanoTime() - t0) / 1e9
      }
      one() // warm plan/JIT
      val best = math.min(one(), one())
      println(f"$label%-18s $best%7.2f s")
      best
    }

    val m = time("md5-prefix (oracle)", md5Hash)
    val x = time("xxhash64 (prod)", xxHash)
    println(f"parity tax: ${m / x}%.1fx on the signature pass")
    spark.stop()
  }
}
