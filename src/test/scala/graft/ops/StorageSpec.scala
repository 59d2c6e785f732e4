package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Storage-layer evidence: format round-trips (the engine can land on
  * any of Spark's columnar/text sinks without semantic drift) and
  * partition pruning (a date-partitioned silver layout is read with
  * partition filters, not full scans — the reference built partition
  * paths by hand, SURVEY §4; here the engine prunes natively).
  */
class StorageSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("silver-shaped frame round-trips identically through parquet/orc/json/csv") {
    val base = Relational.silver(spark, sf)
      .withColumn("ts_s", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("date_s", col("date").cast("string"))
      .drop("ts", "date") // text formats carry timestamps as strings
    val dir = Files.createTempDirectory("graft-formats").toString
    val canon = base.collect().map(_.toString).sorted.toSeq
    Seq("parquet", "orc", "json", "csv").foreach { fmt =>
      val path = s"$dir/$fmt"
      val writer = base.write.format(fmt).mode("overwrite")
      (if (fmt == "csv") writer.option("header", "true") else writer).save(path)
      val reader = spark.read.format(fmt)
      val readBack = (fmt match {
        case "csv" => reader.option("header", "true").schema(base.schema).load(path)
        case "json" => reader.schema(base.schema).load(path)
        case _ => reader.load(path)
      }).select(base.columns.map(col): _*)
      val got = readBack.collect().map(_.toString).sorted.toSeq
      assert(got === canon, s"format $fmt drifted")
    }
  }

  test("date-partitioned layout is read with partition pruning, not a full scan") {
    val dir = Files.createTempDirectory("graft-prune").toString
    val ev = Tables.events(spark, sf)
      .withColumn("date", to_date(col("ts")))
    ev.write.partitionBy("date").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir)
      .filter(col("date") === "2024-01-15")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("dynamicpruning") || plan.contains("PartitionFilters: [isnotnull(date"), plan)
    // only the one partition's rows come back
    val expected = ev.filter(col("date") === "2024-01-15").count()
    assert(pruned.count() === expected && expected > 0)
    // and the scan's selected partition count is 1
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scan.nonEmpty)
    assert(scan.get.relation.location.listFiles(
      scan.get.partitionFilters, scan.get.dataFilters).length === 1)
  }
}
