package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Custom `ml.Estimator`: mutual-information feature selection —
  * the rebuild of the reference's `select_most_informative_component`
  * (`/root/reference/src/voice_classifier.py:145-159`, sklearn
  * `mutual_info_classif` + argmax over PCA components).
  *
  * sklearn estimates continuous MI with Kraskov kNN; only the ARGMAX is
  * consumed downstream (`voice_classifier.py:153,166`), which a binned
  * estimator preserves on separable data (SURVEY §7.4 risk 2). Here:
  * equal-width binning (nBins) per candidate column, one distributed
  * `groupBy(candidate, bin, label).count()` pass for every candidate at
  * once (single shuffle of a few hundred grouped rows regardless of input
  * size), MI from the contingency table on the driver, argmax wins.
  */
class MiSelector(override val uid: String)
    extends Estimator[MiSelectorModel] {

  def this() = this(Identifiable.randomUID("miselect"))

  final val featureCols = new StringArrayParam(this, "featureCols",
    "candidate feature columns")
  final val labelCol = new Param[String](this, "labelCol", "label column")
  final val outputCol = new Param[String](this, "outputCol",
    "name of the selected-feature output column")
  final val nBins = new IntParam(this, "nBins", "equal-width bin count")

  setDefault(labelCol -> "speaker", outputCol -> "X", nBins -> 16)

  def setFeatureCols(v: Array[String]): this.type = set(featureCols, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setNBins(v: Int): this.type = set(nBins, v)

  override def fit(ds: Dataset[_]): MiSelectorModel = {
    val df = ds.toDF()
    val cands = $(featureCols)
    val bins = $(nBins)
    // pass 1: per-candidate min/max (one aggregate row)
    val aggExprs = cands.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).first()
    require(!stats.isNullAt(0), "MiSelector.fit on empty dataset")
    val ranges = cands.indices.map { i =>
      val lo = stats.getDouble(2 * i); val hi = stats.getDouble(2 * i + 1)
      (lo, if (hi > lo) hi - lo else 1.0)
    }
    // pass 2: all candidates binned in one shuffle
    val binStructs = cands.zipWithIndex.map { case (c, i) =>
      val (lo, span) = ranges(i)
      struct(lit(i).as("cand"),
        least(lit(bins - 1), greatest(lit(0),
          floor((col(c).cast("double") - lit(lo)) / lit(span) * bins)
            .cast("int"))).as("bin"))
    }
    val counts = df
      .select(col($(labelCol)).as("label"), explode(array(binStructs: _*)).as("cb"))
      .groupBy(col("cb.cand").as("cand"), col("cb.bin").as("bin"), col("label"))
      .count()
      .collect() // contingency table: nCands × nBins × nLabels rows — tiny
    // MI per candidate from the contingency counts
    val mi = cands.indices.map { ci =>
      val cells = counts.filter(_.getInt(0) == ci)
      val n = cells.map(_.getLong(3)).sum.toDouble
      val pBin = cells.groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(3)).sum / n)
      val pLab = cells.groupBy(_.getString(2)).view.mapValues(_.map(_.getLong(3)).sum / n)
      cells.map { r =>
        val pbl = r.getLong(3) / n
        pbl * math.log(pbl / (pBin(r.getInt(1)) * pLab(r.getString(2))))
      }.sum
    }.toArray
    val best = mi.indices.maxBy(mi)
    val model = new MiSelectorModel(uid, cands(best), mi, $(outputCol))
    model.setParent(this)
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): MiSelector = defaultCopy(extra)
}

/** Projects the winning candidate column to `outputColName`. */
class MiSelectorModel(override val uid: String, val selectedCol: String,
    val miScores: Array[Double], val outputColName: String)
    extends Model[MiSelectorModel] {

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn(outputColName, col(selectedCol))

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): MiSelectorModel =
    new MiSelectorModel(uid, selectedCol, miScores, outputColName)
      .setParent(parent)
}
