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
    * (`glm(true_match ~ weight, binomial)`, scratch.R:137), fit on
    * DISTINCT-WEIGHT AGGREGATES. `weight` is a pure function of the
    * comparison pattern ([[weightExpression]] reads only the
    * comparator level columns), so it takes at most #patterns distinct
    * values no matter how many pairs were scored — and the binomial
    * log-likelihood factorizes over distinct covariate values:
    *
    * {{{
    *   Σ_pairs [y·log p(w) + (1−y)·log(1−p(w))]
    *     = Σ_distinct w [k_w·log p(w) + (n_w − k_w)·log(1−p(w))]
    * }}}
    *
    * so a weighted logistic fit on the `(w, label, frequency)` rows is
    * EXACTLY the same MLE as a fit over every pair. The pair table is
    * touched once, by one `groupBy(weight)` count — the only form that
    * survives 100×: at the NCVR-scale E2E the per-pair `spark.ml` fit
    * was 233.6 s of a 357.5 s pipeline (65%, docs/LINKAGE_E2E_r11.md)
    * for a ≤37-distinct-input computation; 6.6B scored pairs would
    * make it the whole job, while the groupBy stays one shuffle of
    * #patterns-sized partials. The aggregated fit itself (≤2 rows per
    * distinct weight, L-BFGS via `spark.ml` with a frequency weight
    * column) is effectively free, so its tolerance is pinned tight
    * (1e-12; the default 1e-6 is sized for per-row passes).
    * Parity with the unaggregated fit is spec-asserted at ±1e-6
    * (ScoringSpec) and printed side-by-side by the E2E's 150k shape.
    */
  def calibrate(withTruth: DataFrame, weightCol: String = "weight",
      truthCol: String = "true_match"): Calibration = {
    val agg = withTruth
      .filter(col(truthCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(weightCol).cast("double").as("__w"))
      .agg(count(lit(1)).as("__n"), sum(col(truthCol).cast("long")).as("__k"))
    // Two weighted rows per distinct weight — (label 1, freq k) and
    // (label 0, freq n−k) — zero-frequency rows dropped (a zero weight
    // contributes nothing to the likelihood but spark.ml requires > 0).
    val expanded = agg.select(col("__w"), explode(array(
        struct(lit(1.0).as("__label"), col("__k").cast("double").as("__freq")),
        struct(lit(0.0).as("__label"), (col("__n") - col("__k")).cast("double").as("__freq"))))
        .as("__e"))
      .select(col("__w"), col("__e.__label").as("__label"), col("__e.__freq").as("__freq"))
      .filter(col("__freq") > 0)
    fitLogistic(expanded, Some("__freq"), tol = 1e-12)
  }

  /** The unaggregated per-pair form of [[calibrate]] — same MLE,
    * O(pairs) per optimizer pass instead of O(distinct weights).
    * Retained as the parity reference (ScoringSpec asserts agreement
    * at ±1e-6; the E2E's 150k shape prints both); prefer [[calibrate]]
    * everywhere, and especially at scale.
    */
  def calibrateFull(withTruth: DataFrame, weightCol: String = "weight",
      truthCol: String = "true_match"): Calibration =
    fitLogistic(
      withTruth
        .filter(col(truthCol).isNotNull && col(weightCol).isNotNull)
        .select(col(weightCol).cast("double").as("__w"),
          col(truthCol).cast("double").as("__label")),
      weightColName = None, tol = 1e-12)

  /** Shared single-feature logistic fit: `__w` (feature), `__label`
    * (0/1), optional frequency weight column. `spark.ml` L-BFGS,
    * no regularization — the glm(binomial) MLE.
    */
  private def fitLogistic(rows: DataFrame, weightColName: Option[String],
      tol: Double): Calibration = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val prepared = new VectorAssembler()
      .setInputCols(Array("__w")).setOutputCol("__features")
      .transform(rows)
    val lr = new LogisticRegression()
      .setFeaturesCol("__features").setLabelCol("__label")
      .setMaxIter(100).setRegParam(0.0).setTol(tol)
    weightColName.foreach(lr.setWeightCol)
    val model = lr.fit(prepared)
    Calibration(model.intercept, model.coefficients(0))
  }
}
