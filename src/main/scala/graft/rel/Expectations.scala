package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/Great-Expectations
  * operator (Schelter et al. 2018, "Automating Large-Scale Data Quality
  * Verification", VLDB): a constraint suite over a table evaluated as
  * ONE fused aggregate scan, plus keyed anti-join jobs for referential
  * checks. The production gate a 100 TB ingest runs before data is
  * allowed downstream.
  *
  * Scale shape — the Deequ trick: every single-table constraint
  * (completeness, range/set/pattern compliance, uniqueness) compiles to
  * aggregate EXPRESSIONS over the same scan, so N constraints cost one
  * table pass (map-side-combined, codegen'd `sum(when(...))`), not N
  * passes. Uniqueness adds `count(distinct key)` — one Expand of the
  * scan per distinct-key check, the documented cost of exactness.
  * Referential checks can't fuse (they touch a second table): each is
  * one left-anti equi-join — dimension side broadcast while it fits —
  * counted, never materialized.
  *
  * Output contract (one row per constraint):
  * (check_name, check_type, metric ∈ [0,1] round 6, n_violations,
  * passed) — `metric` is the compliant fraction (or distinct ratio),
  * `passed` ⇔ zero violations. Null handling is explicit per type:
  * a null fails Complete/InRange/InSet/Matches (compliance counts
  * non-null compliant rows); a null foreign key is exempt from
  * SubsetOf (SQL FK semantics).
  */
object Expectations {

  sealed trait Check { def table: String; def name: String }
  /** Fraction of non-null values in `column`. */
  final case class Complete(table: String, column: String) extends Check {
    def name = s"complete($table.$column)"
  }
  /** `column` values are pairwise distinct (exact, via
    * count(distinct)). */
  final case class Unique(table: String, column: String) extends Check {
    def name = s"unique($table.$column)"
  }
  /** `lo ≤ column ≤ hi` (inclusive; null violates). */
  final case class InRange(table: String, column: String, lo: Double,
      hi: Double) extends Check {
    def name = s"in_range($table.$column,$lo,$hi)"
  }
  /** `column ∈ values` (null violates). */
  final case class InSet(table: String, column: String,
      values: Seq[String]) extends Check {
    def name = s"in_set($table.$column)"
  }
  /** `column` matches the (Java/RE2-common subset) regex (null
    * violates). */
  final case class Matches(table: String, column: String, regex: String)
      extends Check {
    def name = s"matches($table.$column)"
  }
  /** Referential integrity: every non-null `column` appears in
    * `refTable.refColumn`. */
  final case class SubsetOf(table: String, column: String,
      refTable: String, refColumn: String) extends Check {
    def name = s"subset_of($table.$column,$refTable.$refColumn)"
  }

  /** Compliant-count expression for a fused single-table check (null
    * never compliant except where the type says otherwise). */
  private def compliant(c: Check): Column = c match {
    case Complete(_, col0) =>
      sum(when(col(col0).isNotNull, 1L).otherwise(0L))
    case InRange(_, col0, lo, hi) =>
      sum(when(col(col0) >= lo && col(col0) <= hi, 1L).otherwise(0L))
    case InSet(_, col0, vs) =>
      sum(when(col(col0).isin(vs: _*), 1L).otherwise(0L))
    case Matches(_, col0, re) =>
      sum(when(col(col0).rlike(re), 1L).otherwise(0L))
    case Unique(_, col0) => countDistinct(col(col0))
    case _: SubsetOf =>
      throw new IllegalArgumentException("subset checks don't fuse")
  }

  private def typeName(c: Check): String = c match {
    case _: Complete => "complete"
    case _: Unique => "unique"
    case _: InRange => "in_range"
    case _: InSet => "in_set"
    case _: Matches => "matches"
    case _: SubsetOf => "subset_of"
  }

  /** The raw additive metrics (check_name, check_type, compliant, n)
    * — the partial the streaming store persists per batch: compliant
    * and n are ADDITIVE across disjoint batches for every check type
    * except Unique (count-distinct does not sum), which is why
    * [[graft.streaming.ExpectationsStream]] rejects Unique checks. */
  private[graft] def metrics(tables: Map[String, DataFrame],
      checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    checks.foreach { c =>
      require(tables.contains(c.table), s"unknown table ${c.table}")
      c match {
        case s: SubsetOf => require(tables.contains(s.refTable),
          s"unknown ref table ${s.refTable}")
        case _ => ()
      }
    }
    val (subsets, fused) = checks.partition(_.isInstanceOf[SubsetOf])
    val perTable = fused.groupBy(_.table).toSeq.map { case (t, cs) =>
      // one scan: n + each check's compliant count, then one row per
      // check via an exploded struct array (no second scan)
      val aggs = count(lit(1)).as("n") +:
        cs.zipWithIndex.map { case (c, i) => compliant(c).as(s"c_$i") }
      val row = tables(t).agg(aggs.head, aggs.tail: _*)
      val structs = cs.zipWithIndex.map { case (c, i) =>
        struct(lit(c.name).as("check_name"),
          lit(typeName(c)).as("check_type"),
          col(s"c_$i").as("compliant"))
      }
      row.select(col("n"), explode(array(structs: _*)).as("r"))
        .select(col("r.check_name"), col("r.check_type"),
          col("r.compliant"), col("n"))
    }
    val subsetRows = subsets.map { case s: SubsetOf =>
      // one pass over the fact side: LEFT join against the distinct
      // reference keys, then count total and unmatched in the same
      // aggregate (a separate count(*) job would re-scan the fact
      // table — at 100 TB one whole extra pass per referential check)
      val fk = tables(s.table).select(col(s.column).as("fk"))
      val ref = tables(s.refTable)
        .select(col(s.refColumn).as("fk")).distinct()
        .withColumn("hit", lit(1))
      fk.join(ref, Seq("fk"), "left")
        .agg(count(lit(1)).as("n"),
          sum(when(col("fk").isNotNull && col("hit").isNull, 1L)
            .otherwise(0L)).as("n_bad"))
        .select(lit(s.name).as("check_name"),
          lit("subset_of").as("check_type"),
          (col("n") - col("n_bad")).as("compliant"), col("n"))
      case other =>
        throw new IllegalStateException(s"not a subset check: $other")
    }
    (perTable ++ subsetRows).reduce(_ unionAll _)
  }

  /** Finalize raw metrics into the report contract. An EMPTY table
    * (n = 0) reports a null metric with zero violations and passes —
    * guarded with `when`, not left to the division: Spark 4's default
    * ANSI mode throws on a non-null 0/0 (SubsetOf and Unique produce
    * non-null compliant = 0 over empty input), and a validation gate
    * must report an empty ingest slice, not crash on it. */
  private[graft] def finalize(raw: DataFrame): DataFrame = {
    // sum(when(...)) over ZERO rows is NULL (only possible when n = 0):
    // coalesce so the empty-table row reads (null metric, 0, passed)
    // rather than nulls in the violation/passed columns
    val comp = coalesce(col("compliant"), lit(0L))
    raw.select(col("check_name"), col("check_type"),
      when(col("n") === 0, lit(null).cast("double")).otherwise(
        round(comp.cast("double") / col("n"), 6)).as("metric"),
      (col("n") - comp).as("n_violations"),
      (col("n") - comp === 0).as("passed"))
      .orderBy("check_name")
  }

  /** Evaluate the suite. `tables` maps the table names the checks
    * reference to their DataFrames. One aggregate job per distinct
    * table carrying fused checks + one anti-join job per SubsetOf. */
  def validate(tables: Map[String, DataFrame],
      checks: Seq[Check]): DataFrame =
    finalize(metrics(tables, checks))

  /** The contract suite: a realistic ingest gate over the TPC-H-ish
    * tables — key uniqueness, FK closure both directions, domain and
    * range rules, a phone-format regex. */
  def contractSuite(s: SparkSession, d: String): DataFrame = {
    val t = Map(
      "orders" -> graft.Tables.orders(s, d),
      "lineitem" -> graft.Tables.lineitem(s, d),
      "customer" -> graft.Tables.customer(s, d))
    validate(t, Seq(
      Complete("orders", "o_custkey"),
      Complete("lineitem", "l_shipdate"),
      Unique("orders", "o_orderkey"),
      Unique("customer", "c_custkey"),
      InRange("lineitem", "l_quantity", 1.0, 50.0),
      InRange("lineitem", "l_discount", 0.0, 0.1),
      InSet("orders", "o_orderstatus", Seq("O", "F", "P")),
      Matches("customer", "c_name", "^Customer#[0-9]{9}$"),
      SubsetOf("orders", "o_custkey", "customer", "c_custkey"),
      SubsetOf("lineitem", "l_orderkey", "orders", "o_orderkey")))
  }

  /** The streaming-store judge (the nq_agg_store pattern): the same
    * lineitem suite evaluated as 5 disjoint per-batch partials whose
    * additive roll-up must hash-match one pass over the RAW table —
    * any broken additivity (double count, missed batch, non-additive
    * expression) fails against the strongest oracle form. The disk
    * store's fences/replay semantics are spec-pinned in
    * `ExpectationsStreamSpec`; this entry pins the merge ALGEBRA. */
  def storeRollup(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
    val orders = graft.Tables.orders(s, d)
    val cs = Seq(
      Complete("lineitem", "l_shipdate"),
      InRange("lineitem", "l_quantity", 1.0, 50.0),
      InRange("lineitem", "l_discount", 0.0, 0.1),
      SubsetOf("lineitem", "l_orderkey", "orders", "o_orderkey"))
    val perBatch = (0 until 5).map { b =>
      metrics(Map(
        "lineitem" -> li.filter(pmod(col("l_orderkey"), lit(5)) === b),
        "orders" -> orders), cs)
    }
    finalize(perBatch.reduce(_ unionAll _)
      .groupBy("check_name", "check_type")
      .agg(sum("compliant").as("compliant"), sum("n").as("n")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "nq_expectations" -> ((s: SparkSession, d: String) =>
      contractSuite(s, d)),
    "nq_expect_store" -> (storeRollup _))

  val oracle: Map[String, String] = Map(
    "nq_expectations" ->
      """WITH o AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_complete,
        |    count(DISTINCT o_orderkey) AS c_unique,
        |    CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS c_inset
        |  FROM orders),
        |l AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_complete,
        |    CAST(sum(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c_qty,
        |    CAST(sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS c_disc
        |  FROM lineitem),
        |c AS (
        |  SELECT count(*) AS n,
        |    count(DISTINCT c_custkey) AS c_unique,
        |    CAST(sum(CASE WHEN regexp_matches(c_name, '^Customer#[0-9]{9}$') THEN 1 ELSE 0 END) AS BIGINT) AS c_name_fmt
        |  FROM customer),
        |fk1 AS (
        |  -- NOT EXISTS, never NOT IN (r18 review): one NULL in the
        |  -- reference column makes NOT IN evaluate to NULL for EVERY
        |  -- candidate, silently collapsing n_bad to 0 while the Spark
        |  -- side's anti-join keeps counting real violations
        |  SELECT (SELECT count(*) FROM orders) AS n,
        |    (SELECT count(*) FROM orders o
        |     WHERE o.o_custkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey)) AS n_bad),
        |fk2 AS (
        |  SELECT (SELECT count(*) FROM lineitem) AS n,
        |    (SELECT count(*) FROM lineitem li
        |     WHERE li.l_orderkey IS NOT NULL
        |       AND NOT EXISTS (SELECT 1 FROM orders o2
        |                       WHERE o2.o_orderkey = li.l_orderkey)) AS n_bad),
        |rows_out AS (
        |  SELECT 'complete(orders.o_custkey)' AS check_name, 'complete' AS check_type, c_complete AS compliant, n FROM o
        |  UNION ALL SELECT 'unique(orders.o_orderkey)', 'unique', c_unique, n FROM o
        |  UNION ALL SELECT 'in_set(orders.o_orderstatus)', 'in_set', c_inset, n FROM o
        |  UNION ALL SELECT 'complete(lineitem.l_shipdate)', 'complete', c_complete, n FROM l
        |  UNION ALL SELECT 'in_range(lineitem.l_quantity,1.0,50.0)', 'in_range', c_qty, n FROM l
        |  UNION ALL SELECT 'in_range(lineitem.l_discount,0.0,0.1)', 'in_range', c_disc, n FROM l
        |  UNION ALL SELECT 'unique(customer.c_custkey)', 'unique', c_unique, n FROM c
        |  UNION ALL SELECT 'matches(customer.c_name)', 'matches', c_name_fmt, n FROM c
        |  UNION ALL SELECT 'subset_of(orders.o_custkey,customer.c_custkey)', 'subset_of', n - n_bad, n FROM fk1
        |  UNION ALL SELECT 'subset_of(lineitem.l_orderkey,orders.o_orderkey)', 'subset_of', n - n_bad, n FROM fk2)
        |SELECT check_name, check_type,
        |  round(CAST(compliant AS DOUBLE) / n, 6) AS metric,
        |  CAST(n - compliant AS BIGINT) AS n_violations,
        |  (n - compliant) = 0 AS passed
        |FROM rows_out
        |ORDER BY check_name""".stripMargin,
    "nq_expect_store" ->
      """WITH l AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_complete,
        |    CAST(sum(CASE WHEN l_quantity >= 1.0 AND l_quantity <= 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS c_qty,
        |    CAST(sum(CASE WHEN l_discount >= 0.0 AND l_discount <= 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS c_disc
        |  FROM lineitem),
        |fk AS (
        |  SELECT (SELECT count(*) FROM lineitem) AS n,
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IS NOT NULL
        |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_bad),
        |rows_out AS (
        |  SELECT 'complete(lineitem.l_shipdate)' AS check_name, 'complete' AS check_type, c_complete AS compliant, n FROM l
        |  UNION ALL SELECT 'in_range(lineitem.l_quantity,1.0,50.0)', 'in_range', c_qty, n FROM l
        |  UNION ALL SELECT 'in_range(lineitem.l_discount,0.0,0.1)', 'in_range', c_disc, n FROM l
        |  UNION ALL SELECT 'subset_of(lineitem.l_orderkey,orders.o_orderkey)', 'subset_of', n - n_bad, n FROM fk)
        |SELECT check_name, check_type,
        |  round(CAST(compliant AS DOUBLE) / n, 6) AS metric,
        |  CAST(n - compliant AS BIGINT) AS n_violations,
        |  (n - compliant) = 0 AS passed
        |FROM rows_out
        |ORDER BY check_name""".stripMargin)
}
