package graft

import org.apache.spark.sql.DataFrame

/** Oracle-input dumps: contract queries whose inputs are not part of
  * the driver's table dir (generated voice corpora, ANN candidate
  * sets) write the exact relations their oracle SQL `read_parquet`s by
  * absolute path — so DuckDB re-runs the SQL-expressible tail of the
  * operator (interval labeling, cumsum, exact re-rank) on identical
  * inputs and the driver hash-checks it.
  *
  * The dump is GATED on a system property set by `Verify.main`: Bench
  * runs the same query functions and must not pay an extra
  * materialization of the dumped relation per timed run.
  *
  * Paths are fixed per query (not per source dir), which assumes the
  * driver's documented flow — ONE Verify run per DuckDB compare, the
  * compare reading the dumps that run wrote. Two Verify runs over
  * different source dirs followed by two compares would cross-read the
  * second run's dumps; if the contract ever adds a second SF, key the
  * dump roots by sfDir and thread the dir into the oracle-SQL builders.
  */
object OracleDump {

  val Enabled = "graft.oracle.dump"

  def enabled: Boolean = sys.props.get(Enabled).contains("true")

  /** Write `df` for the oracle when enabled — one file, overwrite
    * (dumps are deterministic, so a rewrite is idempotent). */
  def dump(df: DataFrame, path: String): Unit =
    if (enabled) df.coalesce(1).write.mode("overwrite").parquet(path)
}
