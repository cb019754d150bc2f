package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout (z-order): the Morton mapping against a reference
  * implementation, losslessness of the written layout, z-contiguity of
  * the written files (the range shuffle did its job), and the claim
  * that justifies the operator — a selective predicate on the SECOND
  * dimension overlaps strictly fewer files' min/max spans under
  * z-order than under a linear sort on the first dimension.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refZ(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { b =>
      (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    }.sum

  test("z mapping matches the reference interleave on the full 4-bit grid") {
    // the full [0,16)² grid quantizes to itself (lo=0, hi=2^bits−1),
    // so withZ's output is the raw interleave — compare every cell
    val bits = 4
    val grid = for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y)
    val out = grid.toDF("x", "y")
    val got = Layout.withZ(out, "x", "y", bits)
      .select("x", "y", "z").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === refZ(x, y, bits), s"($x,$y)")
    }
  }

  test("z-order write is lossless and its files are z-contiguous") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val src = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    Layout.zorderWrite(src, "l_partkey", "l_suppkey", s"$dir/z", nFiles = 8)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() === src.count())
    assert(src.except(back).count() === 0 && back.except(src).count() === 0)
    // per-file z intervals must be pairwise disjoint (repartitionByRange)
    // — capture the file name BEFORE withZ's broadcast-bounds join
    // (input_file_name() must sit over a single source)
    val spans = Layout.withZ(
        spark.read.parquet(s"$dir/z").withColumn("f", input_file_name()),
        "l_partkey", "l_suppkey", 8)
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, spans.toSeq.toString)
      case _ =>
    }
  }

  test("a second-dimension predicate prunes files under z-order, not under linear sort") {
    val dir = java.nio.file.Files.createTempDirectory("zprune").toString
    val src = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val n = 16
    // linear layout: range-partitioned + sorted on the FIRST dimension
    src.repartitionByRange(n, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/linear")
    Layout.zorderWrite(src, "l_partkey", "l_suppkey", s"$dir/z", nFiles = n)
    // files whose [min,max] l_suppkey span admits a 10-wide probe —
    // the footer-stats proxy every stats-pruning reader (parquet
    // row-group filter, Delta/Iceberg file skipping) applies
    def overlapping(path: String): Long = spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("l_suppkey").as("lo"), max("l_suppkey").as("hi"))
      .filter(col("lo") <= 14 && col("hi") >= 5) // probe: 5 ≤ y ≤ 14
      .count()
    val (lin, zed) = (overlapping(s"$dir/linear"), overlapping(s"$dir/z"))
    // a linear x-sort spreads every y everywhere (all files admit the
    // probe); the z-order boxes confine it to a fraction
    assert(lin >= n - 1, s"linear layout should admit ~all files, got $lin")
    // n/2 + 1, not n/2: repartitionByRange draws its partition
    // boundaries from a reservoir SAMPLE, so the file boxes wobble by
    // one file across runs (observed 8 vs 9 of 16 depending on ambient
    // partitioning); the measured claim — the probe admits ~all linear
    // files but only ~half the z-ordered ones — is unchanged
    assert(zed <= n / 2 + 1,
      s"z-order should admit ~half the files, got $zed")
  }
}
