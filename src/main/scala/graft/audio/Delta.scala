package graft.audio

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Delta (differential) features over per-frame coefficients — the
  * standard companion librosa ships next to MFCC
  * (`librosa.feature.delta`; the reference's ecosystem tier, like
  * [[Mfcc]]): the local slope of each coefficient track, estimated by
  * the width-(2D+1) regression kernel
  *
  *   Δc_t = Σ_{d=1..D} d·(c_{t+d} − c_{t−d}) / (2·Σ_{d=1..D} d²)
  *
  * with edge frames replicated (out-of-range c_{t±d} clamps to the
  * track's first/last value — the classic pad-mode-edge convention).
  * Δ² is the same kernel applied to Δ.
  *
  * Spark-first: this is PURE window arithmetic — lag/lead + first/last
  * over (track, order) — no UDF, fully codegen'd, and the exact same
  * SQL runs in DuckDB, which makes the oracle a hard bitwise one (the
  * numerator is the same left-associated sum of 2D products in both
  * engines). One shuffle on the track key, as any per-track window
  * requires; at 100 TB the track key (clip × coefficient) is
  * high-cardinality and evenly sized, so the exchange is balanced.
  */
object Delta {

  /** Append `deltaCol` = Δ of `valueCol` over tracks keyed by
    * `partitionCols`, ordered by `orderCol`. */
  def withDelta(df: DataFrame, valueCol: String, deltaCol: String,
      partitionCols: Seq[String], orderCol: String, nD: Int = 4): DataFrame = {
    require(nD >= 1, s"delta width must be >= 1, got $nD")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(orderCol))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val c = col(valueCol)
    val firstV = first(c).over(full)
    val lastV = last(c).over(full)
    // left-associated (+) chain — written identically in the oracle SQL
    // so the float sum order is shared, not merely equivalent
    val num = (1 to nD).map { d =>
      lit(d.toDouble) * (coalesce(lead(c, d).over(w), lastV) -
        coalesce(lag(c, d).over(w), firstV))
    }.reduceLeft(_ + _)
    val denom = 2.0 * (1 to nD).map(d => d * d).sum
    df.withColumn(deltaCol, num / lit(denom))
  }
}
