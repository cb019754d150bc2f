package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param.{DoubleArrayParam, IntParam, Param, ParamMap, StringArrayParam}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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
    extends Estimator[MiSelectorModel] with DefaultParamsWritable {

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
    require(cands.nonEmpty, "MiSelector.fit: featureCols must be non-empty")
    val bins = $(nBins)
    // pass 1: per-candidate min/max/null-count + label cardinality, one
    // aggregate row. Null candidate values must be REJECTED, not binned:
    // greatest() skips null operands, so a null would silently land in
    // bin 0 and a class-correlated missingness pattern would fabricate
    // MI for exactly the wrong candidate. The label-cardinality guard
    // keeps the "contingency table is tiny" collect() claim honest — a
    // continuous or id-like label (plausible misuse; sklearn's
    // mutual_info_classif silently accepts one) would otherwise pull
    // nCands × nBins × nDistinct rows onto the driver.
    val aggExprs = cands.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double"),
        count(when(col(c).isNull, 1)))) :+
      approx_count_distinct(col($(labelCol)))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).first()
    val labelCard = stats.getLong(3 * cands.length)
    require(labelCard <= 1000,
      s"MiSelector.fit: label '${$(labelCol)}' has ~$labelCard distinct " +
        "values — MI selection expects a categorical label (the " +
        "contingency table is collected to the driver)")
    val ranges = cands.indices.map { i =>
      require(!stats.isNullAt(3 * i),
        s"MiSelector.fit: candidate '${cands(i)}' is all-null or the " +
          "dataset is empty")
      require(stats.getLong(3 * i + 2) == 0,
        s"MiSelector.fit: candidate '${cands(i)}' has " +
          s"${stats.getLong(3 * i + 2)} null values — nulls would bias " +
          "the bin-0 count; drop or impute them first")
      val lo = stats.getDouble(3 * i); val hi = stats.getDouble(3 * i + 1)
      // NaN rejected like null (r18 review): Spark's max() treats NaN
      // as the largest double, so one NaN makes hi = NaN, the span
      // guard below silently collapses to 1.0, real values pile into
      // the clamped top bin and NaN rows bin to 0 — fabricated MI with
      // no error, the exact class the null guard above rejects loudly
      require(!lo.isNaN && !hi.isNaN,
        s"MiSelector.fit: candidate '${cands(i)}' contains NaN values " +
          "— NaNs would silently fabricate the bin counts; drop or " +
          "impute them first")
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
    // label as string: MI only needs label identity, and the cast makes
    // numeric/boolean label columns work (counts.getString below)
    val counts = df
      .select(col($(labelCol)).cast("string").as("label"),
        explode(array(binStructs: _*)).as("cb"))
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
    val model = new MiSelectorModel(uid)
      .setSelectedCol(cands(best)).setMiScores(mi).setOutputCol($(outputCol))
    model.setParent(this)
  }

  // appends the output column so downstream stages validate during
  // Pipeline.fit's schema propagation. The winner's type is unknown
  // until fit, but all candidates share one type — declare that (fall
  // back to double when candidates aren't set/present); replace any
  // pre-existing output column, matching withColumn semantics.
  override def transformSchema(schema: StructType): StructType = {
    val dt = if (isSet(featureCols) && $(featureCols).nonEmpty &&
        schema.fieldNames.contains($(featureCols).head))
      schema($(featureCols).head).dataType
    else org.apache.spark.sql.types.DoubleType
    MiSelectorModel.withOutputField(schema, $(outputCol), dt)
  }
  override def copy(extra: ParamMap): MiSelector = defaultCopy(extra)
}

object MiSelector extends DefaultParamsReadable[MiSelector]

/** Projects the winning candidate column to the output column.
  *
  * All fitted state lives in Params (not constructor fields) so the stock
  * `DefaultParamsWritable` machinery persists it — a `PipelineModel`
  * containing this stage round-trips through save/load with no custom
  * reader (SURVEY §1.3 quirk Q5: the full pipeline must be
  * self-contained on disk, unlike the reference's model-only checkpoint
  * at voice_classifier.py:64-71).
  */
class MiSelectorModel(override val uid: String)
    extends Model[MiSelectorModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("miselectmodel"))

  final val selectedCol = new Param[String](this, "selectedCol",
    "winning candidate column")
  final val miScores = new DoubleArrayParam(this, "miScores",
    "MI score per candidate, candidate order")
  final val outputCol = new Param[String](this, "outputCol",
    "name of the selected-feature output column")

  def setSelectedCol(v: String): this.type = set(selectedCol, v)
  def setMiScores(v: Array[Double]): this.type = set(miScores, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def getSelectedCol: String = $(selectedCol)
  def getMiScores: Array[Double] = $(miScores)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(outputCol), col($(selectedCol)))

  override def transformSchema(schema: StructType): StructType =
    MiSelectorModel.withOutputField(schema, $(outputCol),
      if (isSet(selectedCol) && schema.fieldNames.contains($(selectedCol)))
        schema($(selectedCol)).dataType
      else org.apache.spark.sql.types.DoubleType)
  override def copy(extra: ParamMap): MiSelectorModel = defaultCopy(extra)
}

object MiSelectorModel extends DefaultParamsReadable[MiSelectorModel] {
  /** Replace the output field IN PLACE when it already exists (matching
    * `withColumn`'s position-preserving semantics), append otherwise.
    */
  private[ml] def withOutputField(schema: StructType, name: String,
      dt: org.apache.spark.sql.types.DataType): StructType =
    if (schema.fieldNames.contains(name))
      StructType(schema.fields.map(f =>
        if (f.name == name) StructField(name, dt) else f))
    else StructType(schema.fields :+ StructField(name, dt))
}
