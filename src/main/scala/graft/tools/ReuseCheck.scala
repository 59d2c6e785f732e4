package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: execute a catalog query and report whether the runtime
  * (AQE) plan reused the repeated exchanges — `.explain` on the lazy
  * frame shows the pre-execution plan, where reuse is invisible.
  * Usage: tools/run.sh graft.tools.ReuseCheck <query> [sfDir]
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    println(s"ReusedExchange nodes: ${"ReusedExchange".r.findAllIn(plan).size}")
    println(s"BroadcastExchange nodes: ${"BroadcastExchange".r.findAllIn(plan).size}")
    println(s"ObjectHashAggregate nodes: ${"ObjectHashAggregate".r.findAllIn(plan).size}")
    println(s"ShuffleQueryStage / reuse: ${"ShuffleQueryStage".r.findAllIn(plan).size}")
    spark.stop()
  }
}
