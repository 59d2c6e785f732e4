package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev smoke: mirrors the driver's `SparkEntry.entry` check
  * (rows > 0 on sf0.001). Run: tools/run.sh graft.tools.Smoke
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(10, truncate = false)
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
