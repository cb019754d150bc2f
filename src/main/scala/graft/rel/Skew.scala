package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4.2 / the 100 TB checklist).
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; these
  * cover the two cases it doesn't:
  *  - a skewed AGGREGATE key (one group ≫ others → one reducer burns):
  *    two-phase salted aggregation;
  *  - a skewed JOIN key against a small-but-not-broadcastable side:
  *    salt the big side, replicate the small side per salt.
  *
  * Both are deterministic: the salt is `pmod(hash(entire row), n)` — no
  * rand(), so replays/retries are stable (quirk Q6 discipline).
  */
object Skew {

  private def saltCol(df: DataFrame, nSalts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(nSalts))

  /** Two-phase salted sum/count aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. The hot key's rows spread over nSalts reducers
    * in phase 1; phase 2 only merges nSalts partials per key.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
      nSalts: Int = 16): DataFrame = {
    val k = keyCols.map(col)
    df.withColumn("__salt", saltCol(df, nSalts))
      .groupBy((k :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(k: _*)
      .agg(sum("__psum").as(s"sum_$valueCol"), sum("__pcnt").as("n_rows"))
  }

  /** Salted equi-join: big side gets a deterministic salt in [0, nSalts);
    * the small side is replicated nSalts times (explode) so every
    * (key, salt) pair still matches. Hot keys on the big side fan out
    * across nSalts partitions instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      nSalts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(big, nSalts))
    val repSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(repSmall, Seq(key, "__salt")).drop("__salt")
  }
}
