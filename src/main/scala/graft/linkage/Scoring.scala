package graft.linkage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scoring: compile fitted m/u tables into a single per-pair weight
  * expression, threshold, rank, and evaluate
  * (reference: scratch.R:106-139).
  *
  * The reference compiles each field's m/u lookup into a `case_when`
  * chain (`dict_lookup_case_when`, scratch.R:109-115) and sums
  * `log(m/u)` across fields with missing fields contributing 0
  * (scratch.R:117-124). The Spark-native equivalent is a folded
  * `when` chain — whole-stage codegen then compiles the entire scoring
  * expression to JVM bytecode, so scoring all pairs is one codegen'd
  * map over the comparison table, no joins, no lookups. For fields
  * with very many levels a broadcast-join lookup would win; for
  * comparator-style fields (≤ a handful of levels) `when` chains are
  * strictly better (SURVEY.md §4).
  */
object Scoring {

  /** `dict_lookup_case_when`: compile level → value into a `when`
    * chain over `col(field)`; unmatched level → NULL
    * (reference: scratch.R:109-115).
    */
  def dictLookup(field: String, dict: Map[String, Double]): Column = {
    val sorted = dict.toSeq.sortBy(_._1)
    val chain = sorted.foldLeft(Option.empty[Column]) { case (acc, (level, v)) =>
      Some(acc.fold(when(col(field) === level, v))(_.when(col(field) === level, v)))
    }
    chain.fold(lit(null).cast("double"))(_.otherwise(lit(null).cast("double")))
  }

  /** Probability floor inside [[weightExpression]]: EM fit over a
    * candidate population can legitimately drive a match-only level's
    * u (or a nonmatch-only level's m) to EXACTLY 0, where the
    * reference's R `log(m/u)` yields ±Inf. Spark 4 diverges twice:
    * ANSI `m/0` THROWS, and `ln(0)` returns NULL (not −Inf) — the
    * NULL silently ate every full-agreement match at the E2E's 150k
    * shape (weight NULL fails every threshold). Flooring both
    * probabilities keeps the weight finite (±~690 per field — still
    * past any threshold) and is an exact pass-through for any real
    * probability (the smallest representable EM output is ≫ 1e-300).
    */
  private val MinProb = 1e-300

  /** Total Fellegi–Sunter weight: Σ over fields of
    * `if (level non-missing) log(m[level]) − log(u[level]) else 0`
    * (reference: scratch.R:117-124), division-free and floored per
    * [[MinProb]]. A level absent from a dict still propagates NULL
    * (the reference's NA). Fields are summed in the given order
    * (left-to-right) so the float result is reproducible.
    */
  def weightExpression(fields: Seq[(String, Map[String, Double], Map[String, Double])]): Column =
    fields.map { case (f, m, u) =>
      val mC = dictLookup(f, m)
      val uC = dictLookup(f, u)
      when(col(f).isNull, 0.0)
        .when(mC.isNull || uC.isNull, lit(null).cast("double"))
        .otherwise(log(greatest(mC, lit(MinProb))) - log(greatest(uC, lit(MinProb))))
    }.reduce(_ + _)

  def weightExpression(em: EM.EMResult): Column =
    weightExpression(em.mProbabilities.keys.toSeq.map(f =>
      (f, em.mProbabilities(f): Map[String, Double], em.uProbabilities(f): Map[String, Double])))

  /** Score a comparison-values table (ids + comparator levels):
    * add `weight` (reference: scratch.R:128-129).
    */
  def score(comparisonValues: DataFrame, em: EM.EMResult): DataFrame =
    comparisonValues.withColumn("weight", weightExpression(em))

  /** Threshold + rank (reference: scratch.R:130,134). */
  def topMatches(scored: DataFrame, threshold: Double = 5.0): DataFrame =
    scored.filter(col("weight") > threshold).orderBy(desc("weight"))

  /** Attach ground-truth cluster labels from both sides and mark true
    * matches (reference: scratch.R:131-133). `truth` has columns
    * (idCol, clusterCol).
    */
  def attachTruth(
      scored: DataFrame,
      truth: DataFrame,
      idCol: String,
      clusterCol: String): DataFrame = {
    val tl = truth.select(col(idCol).as(s"${idCol}_left"), col(clusterCol).as("cluster_left"))
    val tr = truth.select(col(idCol).as(s"${idCol}_right"), col(clusterCol).as("cluster_right"))
    scored
      .join(tl, Seq(s"${idCol}_left"), "left")
      .join(tr, Seq(s"${idCol}_right"), "left")
      .withColumn("true_match", col("cluster_left") === col("cluster_right"))
  }

  /** Precision per rounded weight band — the reference's calibration
    * table (scratch.R:137-139).
    */
  def precisionByBand(withTruth: DataFrame): DataFrame =
    withTruth
      .withColumn("weight_band", round(col("weight")))
      .groupBy("weight_band")
      .agg(avg(col("true_match").cast("double")).as("precision"), count(lit(1)).as("n"))
      .orderBy("weight_band")

  /** Fitted logistic calibration weight → P(match): intercept + slope
    * with a closed-form predictor usable as a plain Column (codegen'd
    * sigmoid — no model object needed at scoring time).
    */
  final case class Calibration(intercept: Double, slope: Double) {
    def predict(weight: Column): Column =
      lit(1.0) / (lit(1.0) + exp(-(lit(intercept) + lit(slope) * weight)))
  }

  /** The reference's final evaluation artifact
    * (`glm(true_match ~ weight, binomial)`, scratch.R:137) as a
    * distributed fit: `spark.ml` LogisticRegression on the single
    * `weight` feature. The input is [[attachTruth]] output (or any
    * frame with a weight column and a boolean truth column). L-BFGS
    * over one feature converges in a handful of distributed gradient
    * passes; no data leaves the executors.
    */
  def calibrate(withTruth: DataFrame, weightCol: String = "weight",
      truthCol: String = "true_match"): Calibration = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val prepared = new VectorAssembler()
      .setInputCols(Array(weightCol)).setOutputCol("__features")
      .transform(withTruth
        .filter(col(truthCol).isNotNull && col(weightCol).isNotNull)
        .withColumn("__label", col(truthCol).cast("double")))
    val model = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(100).setRegParam(0.0)
      .fit(prepared)
    Calibration(model.intercept, model.coefficients(0))
  }
}
