package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Z-order (Morton-curve) data layout — the WRITE-side half of scan
  * performance the rest of the inventory reads back: cluster rows so
  * that every output file covers a compact axis-aligned box in TWO
  * predicate dimensions at once, making parquet min/max footer stats
  * tight on BOTH columns — the multi-dimensional file-skipping layout
  * Delta/Iceberg `OPTIMIZE ZORDER BY` popularized (Morton 1966's
  * interleaved ordering applied to data skipping).
  *
  * Why a linear sort is not enough: sorting by x makes x-stats tight
  * and y-stats useless — a selective y-predicate still opens every
  * file. Interleaving the quantized bits of x and y gives a total
  * order whose contiguous ranges are (approximate) boxes: a range scan
  * on EITHER column prunes ~√(selectivity) of the files instead of
  * none (LayoutSpec measures exactly this on real written files).
  *
  * Scale shape (the 100 TB story):
  *  - z-value computation is a narrow codegen'd per-row expression
  *    (quantize via exact integer arithmetic against broadcast
  *    min/max scalars, then a bit-interleave fold) — no shuffle.
  *  - the layout itself is `repartitionByRange(z)` + in-partition sort:
  *    ONE range shuffle, the same cost as any total sort, paid once at
  *    write time; every later scan with a predicate on either dimension
  *    skips whole files by footer stats alone (no index structure to
  *    maintain).
  *  - everything is deterministic integer arithmetic, so the z mapping
  *    itself is DuckDB-replicable and hash-checked (nq_zorder).
  */
object Layout {

  /** Quantize column `name` into [0, 2^bits) with EXACT integral
    * arithmetic against inclusive bounds [lo, hi] — SQL `div`, not the
    * double `/` (a double quotient silently loses bits once the scaled
    * numerator passes 2^53; `div` stays exact across the whole LONG
    * range). Caller guarantees (hi − lo) · 2^bits fits in a LONG. */
  private def quantize(name: String, lo: String, hi: String,
      bits: Int): Column =
    expr(s"(`$name` - $lo) * ${1L << bits} div ($hi - $lo + 1)")

  /** Morton interleave of two quantized values: bit b of x lands at
    * position 2b, bit b of y at 2b+1. A codegen'd higher-order fold —
    * no UDF, no shuffle. */
  private def interleave(qx: Column, qy: Column, bits: Int): Column = {
    val x = qx.cast("long"); val y = qy.cast("long")
    (0 until bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)
  }

  /** Add a `z` column interleaving `cx` and `cy` quantized to `bits`
    * each against their OWN global min/max (broadcast single-row
    * scalars, the C8 idiom). */
  def withZ(df: DataFrame, cx: String, cy: String, bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 31, s"zorder: bits must be 1..31, got $bits")
    val bounds = df.agg(
      min(col(cx)).as("lox"), max(col(cx)).as("hix"),
      min(col(cy)).as("loy"), max(col(cy)).as("hiy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("z", interleave(
        quantize(cx, "lox", "hix", bits),
        quantize(cy, "loy", "hiy", bits), bits))
      .drop("lox", "hix", "loy", "hiy")
  }

  /** Write `df` z-ordered on (cx, cy): one range shuffle on z into
    * `nFiles` z-contiguous files, rows z-sorted inside each. Returns
    * the written path for chaining. */
  def zorderWrite(df: DataFrame, cx: String, cy: String, path: String,
      nFiles: Int = 16, bits: Int = 8): String = {
    withZ(df, cx, cy, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(path)
    path
  }

  /** Driver-contract entry: the z mapping over lineitem's
    * (l_partkey, l_suppkey) — sorted by (z, keys) so the driver hash
    * pins every interleaved bit. */
  def nqZorder(s: SparkSession, d: String, bits: Int = 8): DataFrame =
    withZ(lineitem(s, d).select("l_orderkey", "l_linenumber",
        "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", bits)
      .select(col("l_orderkey"), col("l_linenumber"), col("z"))
      .orderBy("z", "l_orderkey", "l_linenumber")

  // Exact integer replica: same quantization (integral division against
  // the same inclusive bounds) and the same interleave fold, written as
  // divisions and powers of two.
  private def zSql(bits: Int): String = {
    val terms = (0 until bits).map { b =>
      s"(qx // ${1L << b} % 2) * ${1L << (2 * b)} + " +
        s"(qy // ${1L << b} % 2) * ${1L << (2 * b + 1)}"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS lox, max(l_partkey) AS hix,
       |         min(l_suppkey) AS loy, max(l_suppkey) AS hiy
       |  FROM lineitem),
       |q AS (
       |  SELECT l_orderkey, l_linenumber,
       |    (l_partkey - b.lox) * ${1L << bits} // (b.hix - b.lox + 1) AS qx,
       |    (l_suppkey - b.loy) * ${1L << bits} // (b.hiy - b.loy + 1) AS qy
       |  FROM lineitem, b)
       |SELECT l_orderkey, l_linenumber, CAST($terms AS BIGINT) AS z
       |FROM q
       |ORDER BY z, l_orderkey, l_linenumber""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_zorder" -> ((s: SparkSession, d: String) => nqZorder(s, d)))

  val oracle: Map[String, String] = Map(
    "nq_zorder" -> zSql(8))
}
