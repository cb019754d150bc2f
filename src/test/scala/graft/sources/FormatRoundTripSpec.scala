package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Columnar/row format round-trips beyond parquet and CSV (SURVEY §2.A
  * breadth): ORC (the other splittable columnar format Spark ships) and
  * JSON-lines (the interchange format ingest pipelines actually
  * receive), both through the engine's own writers/readers with
  * explicit schemas — schema-on-read for JSON is how type drift sneaks
  * into a corpus, so the spec pins typed reads.
  */
class FormatRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private def sample = graft.Tables.documents(spark, sf0001)
    .select("doc_id", "lang", "text", "n_chars")
    .filter($"doc_id" < 100)

  test("ORC round-trip preserves rows, schema, and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc")
    try {
      val p = dir.resolve("docs.orc").toString
      sample.write.mode("overwrite").orc(p)
      val back = spark.read.orc(p)
      assert(back.schema === sample.schema)
      assert(back.orderBy("doc_id").collect()
        .sameElements(sample.orderBy("doc_id").collect()))
    } finally delete(dir)
  }

  test("JSON-lines round-trip with explicit schema preserves values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json")
    try {
      val p = dir.resolve("docs.json").toString
      sample.write.mode("overwrite").json(p)
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("text", StringType),
        StructField("n_chars", LongType)))
      val back = spark.read.schema(schema).json(p)
        .select("doc_id", "lang", "text", "n_chars") // field order
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        sample.schema.map(f => (f.name, f.dataType)))
      assert(back.orderBy("doc_id").collect()
        .sameElements(sample.orderBy("doc_id").collect()))
    } finally delete(dir)
  }

  test("XML round-trip with explicit schema preserves values (Spark 4 native source)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml")
    try {
      val p = dir.resolve("docs.xml").toString
      // ignoreSurroundingSpaces=false on read: the source's default
      // TRIMS element text, so without it this test would only pass
      // while no corpus text happens to carry padding — pin the real
      // behavior instead of depending on the generator's luck
      sample.write.mode("overwrite").option("rowTag", "doc").xml(p)
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("text", StringType),
        StructField("n_chars", LongType)))
      val back = spark.read.schema(schema).option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false").xml(p)
        .select("doc_id", "lang", "text", "n_chars")
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        sample.schema.map(f => (f.name, f.dataType)))
      assert(back.orderBy("doc_id").collect()
        .sameElements(sample.orderBy("doc_id").collect()))
    } finally delete(dir)
  }

  test("XML edge values: padded and empty text survive with ignoreSurroundingSpaces=false") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xml-edge")
    try {
      val p = dir.resolve("edge.xml").toString
      val edge = Seq((1L, "  padded  "), (2L, ""), (3L, "plain"))
        .toDF("doc_id", "text")
      edge.write.mode("overwrite").option("rowTag", "doc").xml(p)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType)))
      val back = spark.read.schema(schema).option("rowTag", "doc")
        .option("ignoreSurroundingSpaces", "false").xml(p)
        .as[(Long, Option[String])].collect().toMap
      assert(back(1L) === Some("  padded  "))
      // with the option set, an empty element round-trips as "" — under
      // the source's TRIMMING default it would collapse to null, which
      // is why the main round-trip test sets the option too
      assert(back(2L) === Some(""))
      assert(back(3L) === Some("plain"))
    } finally delete(dir)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part")
    try {
      val p = dir.resolve("docs_by_lang").toString
      sample.write.mode("overwrite").partitionBy("lang").parquet(p)
      val one = spark.read.parquet(p).filter($"lang" === "en")
      one.collect()
      // the lang=... directory filter must reach the scan as a partition
      // filter, not a post-scan predicate over all partitions
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters: [isnotnull(lang"),
        s"expected partition pruning on lang:\n$scan")
    } finally delete(dir)
  }

  private def delete(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
