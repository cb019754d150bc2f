package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Partition pruning (SURVEY §4.2): data written partitioned by a column
  * lets Catalyst prune entire directories at plan time — a filtered scan
  * must show the predicate under PartitionFilters and touch only the
  * matching partition.
  */
class PartitionPruningSpec extends SparkSpec {

  test("filtered scan over partitioned parquet prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    graft.Tables.events(spark, sf0001)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)

    val scan = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition filter in:\n$plan")
    // the pruned scan reads exactly the click partition's rows
    val clicks = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(scan.count() == clicks)
    // and the scanned files all come from the click directory
    val files = scan.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\n"))
      .filter(_.contains("Location"))
    assert(files.nonEmpty)
  }
}
