package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off probe for the PageRank iteration-cost curve: times
  * pageRank at several iteration counts × checkpoint cadences on one
  * warm session, printing marginal per-iteration cost. Diagnostic
  * companion to [[PrDeep]] — run: tools/run.sh graft.tools.PrProbe
  * [fixtureDir] [cadence...]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale-x10")
    val cadences =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 5, Int.MaxValue)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.pin(spark)
    graft.ops.Dedup.pageRank(spark, dir, 1).count() // warm edges/deg memo
    println(s"edges rows: ${graft.ops.Dedup.verifiedEdges(spark, dir).count()}")
    def t(iters: Int, every: Int): Double = {
      val t0 = System.nanoTime
      graft.ops.Dedup.pageRank(spark, dir, iters, every).count()
      (System.nanoTime - t0) / 1e9
    }
    val iterCounts = sys.env.get("SPARK_GRAFT_ITERS")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(5, 10, 15, 20))
    for (every <- cadences; n <- iterCounts)
      println(f"every=$every%10d iters=$n%2d: ${t(n, every)}%6.2f s")
    spark.stop()
  }
}
