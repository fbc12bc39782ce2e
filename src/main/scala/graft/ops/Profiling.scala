package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-flight data profiling — the diagnostics a 100 TB job runs
  * BEFORE committing to a plan: join-key skew is the #1 cause of the
  * one-straggler-task stage, and the fix (salting via
  * [[Joins.saltedJoin]], AQE skew splits, or a broadcast rethink)
  * needs the offending keys and their shares, not a vibe.
  */
object Profiling {

  /** Key-frequency skew profile: the `topN` heaviest key values with
    * exact count, exact parts-per-million share (integral arithmetic —
    * `cnt·1e6 div total`, engine-exact), and the global distinct-key
    * count for context. Deterministic under ties (count desc, then
    * key asc). Plan shape: one hash agg keyed by the key, a broadcast
    * 1-row totals cross join, and a top-N (TakeOrderedAndProject —
    * partial top-N runs map-side; the full key set is never globally
    * sorted).
    *
    * Reading the output: share_ppm ≈ 1e6/expected-partitions per key
    * is healthy; one key at 5e5 ppm means half the table hashes to
    * one reducer — salt that key or split it before the join.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.select(key.as("key")).groupBy("key").agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum("cnt").as("__total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        expr("cnt * 1000000L div __total").as("share_ppm"),
        col("n_keys"))
      // asc_nulls_last: DuckDB's ASC default is NULLS LAST while
      // Spark's is NULLS FIRST — a NULL key tying at the topN
      // boundary would otherwise pick different rows per engine.
      .orderBy(col("cnt").desc, col("key").asc_nulls_last)
      .limit(topN)
  }

  /** Per-group σ-band outliers in EXACT integer arithmetic — anomaly
    * screening with zero float anywhere, so the flag set is identical
    * on every engine, layout, and merge order (a float mean/stddev is
    * an order-dependent reduction; this is why naive z-score jobs are
    * unreproducible at scale). `value` must be integral (scale money
    * to cents etc. upstream).
    *
    * The test `|x − μ| > (num/den)·σ` is cleared of divisions:
    * {{{
    *   (x·n − S)²·den²  >  num²·(n·SS − S²)
    *   (μ = S/n, σ² = (n·SS − S²)/n²)
    * }}}
    * evaluated in decimal(38,0) — exact up to 10^38, which holds
    * through n·SS for cent-scaled values across any realistic group
    * (1e8-cent values, 1e9-row groups → n·SS ≈ 1e34 < 1e38). DuckDB
    * mirrors in HUGEINT (int128 ≈ 1.7e38) with the same bound.
    *
    * Returns the flagged INPUT rows (all original columns) plus
    * `(n, s)` — the group count and sum, so a reviewer can recompute
    * the band. Plan shape: one hash agg per group + a same-key join
    * back (group cardinality ≪ rows → AQE broadcasts the stats side);
    * no window, no sort.
    */
  def sigmaOutliers(df: DataFrame, groupCols: Seq[String], value: Column,
      sigmaNum: Long, sigmaDen: Long): DataFrame = {
    require(groupCols.nonEmpty, "sigmaOutliers needs at least one group column")
    require(sigmaNum > 0 && sigmaDen > 0, s"need positive sigma ratio, got $sigmaNum/$sigmaDen")
    val dec = "decimal(38,0)"
    val withV = df.withColumn("__value", value.cast("long"))
    val stats = withV.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__value")).cast(dec).as("__s"),
        sum(col("__value").cast(dec) * col("__value").cast(dec)).as("__ss"))
    val dev = col("__value").cast(dec) * col("__n") - col("__s")
    withV.join(stats, groupCols)
      .filter(dev * dev * lit(sigmaDen * sigmaDen) >
        lit(sigmaNum * sigmaNum) * (col("__n") * col("__ss") - col("__s") * col("__s")))
      .select(df.columns.map(col).toIndexedSeq :+
        col("__n").cast("long").as("n") :+ col("__s").cast("long").as("s"): _*)
  }

  /** Per-column table profile — the ANALYZE a pipeline runs on a new
    * drop before trusting it: one output row per profiled column with
    * row count, null count, EXACT distinct count, and min/max rendered
    * as strings (one schema for every column type). Null rates catch
    * broken upstream joins; ndv drift catches key-space explosions;
    * min/max catch unit changes and epoch bugs.
    *
    * Plan shape: ONE scan. All columns' aggregates run in a single
    * aggregate (the multi-distinct is planned through Spark's Expand —
    * one pass over the data expanded ×(cols+1), the standard exact-ndv
    * trade; use HLL sketches when approximate is acceptable), then the
    * 1-row result is stacked to long form driver-side — no second
    * scan, no union of per-column jobs.
    *
    * Profile float columns through an integral projection upstream
    * (cents etc.) if the output must be engine-exact: float-to-string
    * rendering differs across engines.
    */
  def tableProfile(df: DataFrame, colNames: Seq[String]): DataFrame = {
    require(colNames.nonEmpty, "tableProfile needs at least one column")
    colNames.foreach { c =>
      require(c.matches("[A-Za-z_][A-Za-z0-9_]*"), s"unsafe column name: $c")
    }
    val aggs = colNames.flatMap { c =>
      Seq(count(col(c)).as(s"__np_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = colNames
      .map(c => s"'$c', __np_$c, __nd_$c, __mn_$c, __mx_$c").mkString(", ")
    one.select(col("__n"),
        expr(s"stack(${colNames.length}, $stackArgs) AS (col_name, __np, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__np")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  /** Per-group least-squares trend in EXACT integer arithmetic — drift
    * detection ("is this segment's value climbing?") with the same
    * engine-exactness contract as [[sigmaOutliers]]: the OLS slope is
    * the rational `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`, so with integral
    * inputs the whole computation stays in decimal(38,0) (DuckDB:
    * HUGEINT) and only the final parts-per-million quotient truncates —
    * identically on both engines (`div` and `//` both truncate toward
    * zero, probed on negatives). A float covariance reduction is
    * order-dependent and unreproducible across layouts; this isn't.
    *
    * Returns one row per group: `n` and `slope_ppm` = slope ×1e6 in
    * y-units per x-unit (NULL when all x in the group are equal).
    * Magnitudes: |1e6·n·Σxy| must stay under 1e38 — holds through
    * 1e9 rows × 1e4 x-range × 1e8 y-range. One hash aggregate, no
    * window, no second pass.
    */
  def groupTrend(df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupTrend needs at least one group column")
    val dec = "decimal(38,0)"
    val v = df.select(groupCols.map(col) :+ x.cast("long").as("__x") :+ y.cast("long").as("__y"): _*)
    val st = v.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).cast(dec).as("__sx"),
        sum(col("__y")).cast(dec).as("__sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy")) * lit(1000000L).cast(dec)
    val den = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    // Truncating division on decimals: subtract the %-remainder (sign
    // of the dividend, both engines), then the division is exact.
    val slope = ((num - num % den) / den).cast("long")
    st.select(groupCols.map(col) :+ col("__n").cast("long").as("n") :+
      when(den === 0, lit(null).cast("long")).otherwise(slope).as("slope_ppm"): _*)
  }

  /** Per-group Pearson correlation STRENGTH in exact integer
    * arithmetic — the companion to [[groupTrend]]'s slope: `r²` as an
    * exact parts-per-million rational plus the correlation's sign. `r`
    * itself needs a square root (inherently inexact), but
    * {{{
    *   r² = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))
    * }}}
    * is a ratio of integers: with integral inputs everything stays in
    * decimal(38,0) (DuckDB: HUGEINT) and only the final ppm quotient
    * truncates — identically on both engines. A float `corr()` is
    * order-dependent across partitions; this is bit-stable on any
    * layout and any engine.
    *
    * Returns one row per group: `n`, `r2_ppm` ∈ [0, 1e6], and
    * `corr_sign` ∈ {−1, 0, 1} (NULL for both when either variable is
    * constant — correlation undefined). ENVELOPE (guarded loudly, not
    * assumed): |n·Σxy − Σx·Σy| ≤ 3·10¹⁵ and each denominator term
    * ≤ 3·10¹⁸, so the squared numerator ×1e6 and the denominator
    * product both stay inside decimal(38,0). That holds through ~1e6
    * rows per group at |x| ≤ 1e3, |y| ≤ 1e3 — pre-scale wider inputs
    * (the caller knows the units; a silent overflow would not be
    * exact, so out-of-envelope raises). One hash aggregate, no window,
    * no second pass.
    */
  def groupCorr(df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCorr needs at least one group column")
    val dec = "decimal(38,0)"
    val v = df.select(groupCols.map(col) :+ x.cast("long").as("__x") :+ y.cast("long").as("__y"): _*)
    val st = v.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).cast(dec).as("__sx"),
        sum(col("__y")).cast(dec).as("__sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
    val num = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val den1 = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val den2 = col("__n") * col("__syy") - col("__sy") * col("__sy")
    val numOk = abs(num) <= lit("3000000000000000").cast(dec)
    val denOk = den1 <= lit("3000000000000000000").cast(dec) &&
      den2 <= lit("3000000000000000000").cast(dec)
    val num2 = num * num * lit(1000000L).cast(dec)
    val den = den1 * den2
    // num² ≥ 0 and den > 0 where evaluated, so the %-subtraction makes
    // the division exact (the groupTrend truncation pattern).
    val r2 = ((num2 - num2 % den) / den).cast("long")
    st.select(groupCols.map(col) :+ col("__n").cast("long").as("n") :+
      when(den1 === 0 || den2 === 0, lit(null).cast("long"))
        .otherwise(when(numOk && denOk, r2)
          .otherwise(raise_error(lit(
            "groupCorr envelope exceeded (|num| <= 3e15, den terms <= 3e18): pre-scale x/y"))))
        .as("r2_ppm") :+
      when(den1 === 0 || den2 === 0, lit(null).cast("int"))
        .otherwise(signum(num).cast("int")).as("corr_sign"): _*)
  }

  /** Per-row z-score standardization against PER-GROUP population
    * stats — the feature-scaling pass of a training pipeline, emitted
    * as engine-exact integer ppm. The trick is the identity
    * {{{
    *   z = (x − μ)/σ  =  (x·n − S) / sqrt(n·SS − S²)
    * }}}
    * (population σ): numerator and radicand are EXACT integers
    * (decimal(38,0) ≡ HUGEINT), both shift-invariant — they depend on
    * the group's spread, not its magnitude — and IEEE-754 `sqrt` and
    * `/` are correctly rounded, so `z_ppm = ⌊(num/√var)·10⁶⌋` is ONE
    * fixed-order float chain from identical integers: bit-identical on
    * any engine. A float mean/stddev job is partition-order-dependent;
    * this is reproducible anywhere (the [[sigmaOutliers]] contract,
    * upgraded from a boolean flag to the standardized value itself).
    *
    * ENVELOPE (guarded with raise_error, not assumed): |x·n − S| and
    * n·SS − S² must stay ≤ 9·10¹⁵ (< 2⁵³), so their double conversions
    * are EXACT — no cross-engine rounding question at all. Both scale
    * with n²·σ², so pre-scale wide-unit inputs (the [[groupCorr]]
    * contract). Groups with zero variance yield NULL.
    *
    * Shape: one hash-agg stats pass, one group-keyed join back (stats
    * are one row per group), map-only scoring. No window.
    */
  def groupZscore(df: DataFrame, groupCols: Seq[String], idCol: String,
      value: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupZscore needs at least one group column")
    val dec = "decimal(38,0)"
    val v = df.select((groupCols :+ idCol).map(col) :+ value.cast("long").as("x"): _*)
    val st = v.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("__n"),
        sum(col("x")).cast(dec).as("__s"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("__ss"))
    val j = v.join(st, groupCols)
    val num = col("x").cast(dec) * col("__n") - col("__s")
    val varr = col("__n") * col("__ss") - col("__s") * col("__s")
    val bound = lit("9000000000000000").cast(dec)
    val z = floor(num.cast("double") / sqrt(varr.cast("double")) * 1e6).cast("long")
    j.select((groupCols :+ idCol).map(col) :+ col("x") :+
      when(varr === 0, lit(null).cast("long"))
        .otherwise(when(abs(num) <= bound && varr <= bound, z)
          .otherwise(raise_error(lit(
            "groupZscore envelope exceeded (|x·n−S|, n·SS−S² <= 9e15): pre-scale the value"))))
        .as("z_ppm"): _*)
  }

  /** Pearson chi-square statistic of association between two
    * categorical columns — the drift/independence test a pipeline runs
    * before trusting a stratification ("is `source` independent of
    * `lang`?"). Returns ONE row `(n_rows, n_a, n_b, dof, chi2_micro)`
    * with `chi2_micro = Σ_observed ⌊(o·T − r·c)²·10⁶ / (T·r·c)⌋ +
    * ⌊(T² − Σ_observed r·c)·10⁶ / T⌋`: each OBSERVED cell's χ² term is
    * the exact rational `(o − rc/T)²/(rc/T)`, floored to micro-units
    * BEFORE the order-independent BIGINT sum (the [[groupCorr]]
    * discipline — never a float reduction). Cells with `o = 0`
    * contribute `rc/T` each; they are NEVER materialized (|A|·|B| can
    * dwarf the observed set at corpus scale) — their total expected
    * mass is exact in closed form, `Σ_all r·c = (Σr)(Σc) = T²`, so one
    * extra aggregate of the observed `r·c` recovers it, floored once
    * as a single term (part of this operator's output contract, which
    * the oracle mirrors).
    *
    * ENVELOPE: `(o·T − r·c)²·10⁶` must fit decimal(38,0), and the
    * term numerator grows with `r·c` (up to T²) as well as `o·T` — so
    * the binding bound is the TOTAL: `T ≤ 5.5·10⁷` rows makes every
    * `o·T`, `r·c` ≤ T² ≈ 3·10¹⁵ and the missing-cell numerator
    * `(T² − Σ r·c)·10⁶ ≤ 3·10²¹`. Enforced with raise_error on the
    * 1-row total itself (the [[groupCorr]] guard discipline) — a
    * per-cell o·T check alone would pass while a skewed r·c overflows
    * to NULL and silently drops the term.
    *
    * Shape: one (a,b) cell count, two marginal aggs (broadcast-sized),
    * the 1-row total broadcast; joins keyed by the category values.
    */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(aCol.as("__a"), bCol.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
      .localCheckpoint(true) // feeds marginals AND the term sum
    val ra = cells.groupBy("__a").agg(sum("__o").as("__r"))
    val cb = cells.groupBy("__b").agg(sum("__o").as("__c"))
    val tRaw = sum("__o").cast(dec)
    val tot = cells.agg(
      when(tRaw <= lit("55000000").cast(dec), tRaw)
        .otherwise(raise_error(lit(
          "chiSquare envelope exceeded (T <= 5.5e7 rows: r*c terms would overflow decimal(38,0)): shard or pre-aggregate upstream")))
        .as("__t"),
      countDistinct("__a").as("__na"), countDistinct("__b").as("__nb"))
    val joined = cells.join(ra, Seq("__a")).join(cb, Seq("__b"))
      .crossJoin(broadcast(tot))
    val o = col("__o").cast(dec)
    val rc = col("__r").cast(dec) * col("__c").cast(dec)
    val num = (o * col("__t") - rc) * (o * col("__t") - rc) * lit(1000000L).cast(dec)
    val den = col("__t") * rc
    val bound = lit("3000000000000000").cast(dec)
    val term = ((num - num % den) / den).cast("long")
    val obs = joined.select(
      when(abs(o * col("__t")) <= bound, term)
        .otherwise(raise_error(lit(
          "chiSquare envelope exceeded (o·T <= 3e15)"))).as("__term"),
      rc.as("__rc"), col("__r"), col("__c"), col("__t"),
      col("__na"), col("__nb"), col("__o"))
    val obsAgg = obs.agg(sum("__o").cast("long").as("n_rows"),
      max("__na").as("n_a"), max("__nb").as("n_b"),
      max("__t").as("__t"),
      sum("__term").as("__obs_terms"), sum("__rc").as("__obs_rc"))
    // missing cells (o = 0): each contributes r·c·1e6/T; their Σ r·c
    // = (Σ_all r)·(Σ_all c) − Σ_observed r·c = T² − Σ_observed r·c.
    val missNum = (col("__t") * col("__t") - col("__obs_rc")) * lit(1000000L).cast(dec)
    val missTerm = ((missNum - missNum % col("__t")) / col("__t")).cast("long")
    obsAgg.select(col("n_rows"), col("n_a"), col("n_b"),
      ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
      (col("__obs_terms") + missTerm).as("chi2_micro"))
  }

  /** DuckDB mirror of [[tableProfile]]: one UNION ALL arm per column
    * (the oracle may rescan; Spark must not).
    */
  def tableProfileSql(table: String, colNames: Seq[String]): String =
    colNames.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** EXACT per-group percentiles by rank selection — the complement of
    * the approx-quantile sketch when the answer must be reproducible
    * bit-for-bit (quality cutoffs baked into a dataset card, filter
    * thresholds that must not drift between engine versions). For each
    * percentile `p` (percent, 0–100) the result is the group's value
    * at 1-based rank `((n − 1) · p) div 100 + 1` of the ascending sort
    * — the "lower" (type-1) estimator: always an ACTUAL data value, no
    * interpolation, so it is exact in any value type and engine ties
    * cannot diverge (equal values permute only among themselves; the
    * value at a fixed rank is well-defined). Returns
    * `(group…, p, value)`.
    *
    * Shape: one keyed window (row_number + count over the group — one
    * exchange, reused), an `explode` over the constant percentile
    * list, and a rank-match filter. Groups are the partition key, so
    * nothing concentrates; the corpus is scanned once.
    */
  def exactPercentiles(df: DataFrame, groupCols: Seq[String], value: Column,
      ps: Seq[Int]): DataFrame = {
    require(groupCols.nonEmpty, "exactPercentiles needs at least one group column")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 100),
      s"percentiles must be in [0,100], got $ps")
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.select(groupCols.map(col) :+ value.as("__v"): _*)
      .withColumn("__rk", row_number().over(wAll.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("__rk") === expr("((__n - 1) * p) div 100") + 1)
      .select(groupCols.map(col) :+ col("p") :+ col("__v").as("value"): _*)
  }

  /** Exact per-group median absolute deviation — the robust spread
    * statistic ([[sigmaOutliers]]'s σ is mean-based and one wild value
    * drags it; MAD is what quality-threshold pipelines use when the
    * value distribution is heavy-tailed). Both the median and the MAD
    * come from [[exactPercentiles]]' type-1 rank selection, so with
    * integral values the result is an actual data value / deviation,
    * bit-identical on every engine and layout. Returns
    * `(group…, median, mad)`.
    *
    * Shape: two keyed windows (rank selection per group, twice) and a
    * group-keyed join between — group cardinality ≪ rows, so AQE
    * broadcasts the 1-row-per-group median side.
    */
  def groupMad(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupMad needs at least one group column")
    val med = exactPercentiles(df, groupCols, value, Seq(50))
      .select(groupCols.map(col) :+ col("value").as("__med"): _*)
    val dev = df.select(groupCols.map(col) :+ value.as("__v"): _*)
      .join(med, groupCols)
      .select(groupCols.map(col) :+ col("__med") :+
        abs(col("__v") - col("__med")).as("__d"): _*)
    exactPercentiles(dev, groupCols, col("__d"), Seq(50))
      .select(groupCols.map(col) :+ col("value").as("mad"): _*)
      .join(med, groupCols)
      .select(groupCols.map(col) :+ col("__med").as("median") :+ col("mad"): _*)
  }

  /** Per-row ROBUST z-scores — `(x − median)·10⁶ div MAD`, the
    * heavy-tail-proof counterpart of [[groupZscore]]: a single wild
    * value drags a mean/σ z-score arbitrarily (the outlier masks
    * itself); median and MAD are 50%-breakdown estimators, so the
    * flagging stays calibrated. With integral inputs the whole
    * computation is integer rank selection + one integral division —
    * no envelope, no float, bit-exact anywhere. Rows in zero-MAD
    * groups (more than half the group at the median) get NULL —
    * deviation is unmeasurable there, the conventional contract.
    *
    * Returns `(groups…, idCol, x, robust_z_ppm)` where ±1e6 ≈ one MAD
    * from the median (divide by 1.4826·10⁶ for a σ-equivalent scale
    * under normality — a presentation constant, deliberately NOT baked
    * into the exact output). Shape: the two [[groupMad]] rank
    * selections + one group-keyed join-back, map-only scoring.
    */
  def robustZ(df: DataFrame, groupCols: Seq[String], idCol: String,
      value: Column): DataFrame = {
    require(groupCols.nonEmpty, "robustZ needs at least one group column")
    val stats = groupMad(df, groupCols, value.cast("long"))
    df.select((groupCols :+ idCol).map(col) :+ value.cast("long").as("x"): _*)
      .join(stats, groupCols)
      .select((groupCols :+ idCol).map(col) :+ col("x") :+
        when(col("mad") === 0, lit(null).cast("long"))
          .otherwise(expr("((x - median) * 1000000L) div mad")).as("robust_z_ppm"): _*)
  }

  /** Exact WEIGHTED median per group — the robust center under
    * importance weights (duplicate-collapsed corpora where a row
    * stands for `w` originals, priority-weighted quality rollups):
    * the smallest value whose running weight reaches half the total,
    * `min{ v : cumw(v) ≥ (W + 1) div 2 }` with ties on equal values
    * collapsed first (so input row order can never matter). Reduces to
    * [[exactPercentiles]]' p50 when every weight is 1 — asserted in
    * spec. All-integer: rank arithmetic + BIGINT weight sums, no
    * float, engine-exact.
    *
    * Shape: one (group, value) pre-agg (collapses duplicates and
    * bounds the window input by the DISTINCT value count), one keyed
    * window cumsum, one keyed min-struct agg. Weights must be
    * positive — raise_error otherwise (a zero/negative weight silently
    * shifts the threshold).
    */
  def weightedMedian(df: DataFrame, groupCols: Seq[String], value: Column,
      weight: Column): DataFrame = {
    require(groupCols.nonEmpty, "weightedMedian needs at least one group column")
    val v = df.select(groupCols.map(col) :+ value.cast("long").as("__v") :+
        when(weight.cast("long") > 0, weight.cast("long"))
          .otherwise(raise_error(concat(lit("weightedMedian: non-positive weight: "),
            weight.cast("string")))).as("__w"): _*)
      .groupBy((groupCols :+ "__v").map(col): _*)
      .agg(sum("__w").as("__w"))
    val byG = Window.partitionBy(groupCols.map(col): _*)
    val cum = v
      .withColumn("__cw", sum("__w").over(byG.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum("__w").over(byG))
    cum.filter(col("__cw") >= expr("(__tot + 1L) div 2L"))
      .groupBy(groupCols.map(col): _*)
      .agg(min("__v").as("weighted_median"), max("__tot").as("total_weight"))
  }

  /** Functional-dependency check `a → b` for a list of column pairs —
    * the schema-discovery/contract question ("does order key determine
    * customer? does zip determine city?") as exact counts: one row per
    * tested pair with the distinct `a`-value count, how many `a`
    * values map to MORE than one `b` (violations), the worst fan-out,
    * and the violating ROW count (rows whose `a` is ambiguous — the
    * blast radius a cleanup job would touch). `n_violating_keys = 0`
    * means the dependency HOLDS exactly.
    *
    * NULLs: rows with NULL `a` are excluded (no key to determine by);
    * NULL `b` counts as a distinct image (a missing value conflicting
    * with a present one IS a violation — the [[graft.ops.Contracts]]
    * conservative default).
    *
    * Shape: per pair one (a, b)-distinct + per-a aggregate + a 1-row
    * reduce, unioned — scans are per-pair (the oracle's UNION-ALL
    * shape; callers with many pairs over one huge table can pivot to
    * a single-scan variant, the [[tableProfile]] trade documented
    * there).
    */
  def functionalDependency(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDependency needs at least one (a, b) pair")
    pairs.map { case (a, b) =>
      val perKey = df.filter(col(a).isNotNull)
        .groupBy(col(a).as("__a"))
        .agg(countDistinct(col(b)).as("__nb"),
          sum(when(col(b).isNull, 1L).otherwise(0L)).as("__nulls"),
          count(lit(1)).as("__rows"))
        // NULL b is one extra distinct image when present
        .withColumn("__imgs",
          col("__nb") + when(col("__nulls") > 0, 1L).otherwise(0L))
      perKey.agg(count(lit(1)).as("n_keys"),
          sum(when(col("__imgs") > 1, 1L).otherwise(0L)).as("n_violating_keys"),
          max("__imgs").as("max_images"),
          sum(when(col("__imgs") > 1, col("__rows")).otherwise(0L))
            .as("n_violating_rows"))
        .select(lit(a).as("det"), lit(b).as("dep"),
          col("n_keys"), col("n_violating_keys"), col("max_images"),
          col("n_violating_rows"))
    }.reduce(_ unionByName _)
  }

  /** Per-row min-max scaling to exact ppm of the group's range —
    * `(x − min)·10⁶ div (max − min)` ∈ [0, 10⁶] — the bounded-range
    * companion of [[groupZscore]] (features that must land in a fixed
    * interval; no distributional assumption, no envelope: the
    * numerator is range-bounded by construction). Constant groups
    * (max = min) yield NULL. One stats agg + group-keyed join-back,
    * map-only scoring; all-integer.
    */
  def minMaxScale(df: DataFrame, groupCols: Seq[String], idCol: String,
      value: Column): DataFrame = {
    require(groupCols.nonEmpty, "minMaxScale needs at least one group column")
    val v = df.select((groupCols :+ idCol).map(col) :+ value.cast("long").as("x"): _*)
    val st = v.groupBy(groupCols.map(col): _*)
      .agg(min("x").as("__lo"), max("x").as("__hi"))
    v.join(st, groupCols)
      .select((groupCols :+ idCol).map(col) :+ col("x") :+
        when(col("__hi") === col("__lo"), lit(null).cast("long"))
          .otherwise(expr("((x - __lo) * 1000000L) div (__hi - __lo)"))
          .as("scaled_ppm"): _*)
  }

  /** 2-D SKYLINE (Pareto front, both dimensions MINIMIZED) — the
    * multi-objective selection a corpus-pruning pass runs ("keep
    * documents not dominated in (perplexity, repetition)"; here:
    * parts no other part beats on both price and size). A row is
    * dominated when some row is ≤ in both dimensions and < in at
    * least one; ties on the exact same (x, y) point all survive
    * (neither dominates).
    *
    * Scale shape — the window never sees the corpus: a per-x hash agg
    * keeps each x's minimum y first (distributed), the running-min
    * scan runs over DISTINCT x only (the [[kaplanMeier]]
    * bounded-by-resolution contract: x is integral and its distinct
    * count is the bound), and survivors join back by (x, y) to
    * recover id ties. All-integer comparisons — engine-exact.
    */
  def skyline2d(df: DataFrame, idCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val v = df.select(col(idCol), xCol.cast("long").as("x"), yCol.cast("long").as("y"))
    val perX = v.groupBy("x").agg(min("y").as("__my"))
    val w = Windows.pinnedOrderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = perX
      .withColumn("__best", min("__my").over(w))
      .filter(col("__best").isNull || col("__my") < col("__best"))
      .select(col("x"), col("__my").as("y"))
    v.join(front, Seq("x", "y")).select(col(idCol), col("x"), col("y"))
  }

  /** DuckDB mirror of [[exactPercentiles]] over a CTE `v(g…, val)`:
    * the identical rank arithmetic (`//` ≡ `div` on non-negatives).
    */
  def exactPercentilesSql(groupCols: Seq[String], ps: Seq[Int]): String = {
    val g = groupCols.mkString(", ")
    s"""rk AS (
       |  SELECT $g, val,
       |    row_number() OVER (PARTITION BY $g ORDER BY val) AS rk,
       |    count(*) OVER (PARTITION BY $g) AS n
       |  FROM v),
       |ps AS (SELECT unnest([${ps.mkString(", ")}]) AS p)
       |SELECT $g, p, val AS value
       |FROM rk, ps WHERE rk = ((n - 1) * p) // 100 + 1""".stripMargin
  }

  /** LAG-k AUTOCORRELATION of a regular integer time series — the
    * seasonality detector (a spike at lag 7 on a daily series is a
    * weekly cycle; the mix-drift monitors catch WHAT changed, this
    * catches WHEN it repeats). `t` must be a dense integer time index
    * and `x` an integer-valued measure, pre-scaled into the
    * [[groupCorr]] envelope (the shared contract: den terms ≤ 3e18,
    * raise_error beyond — correlation math is delegated verbatim, so
    * r² lands as exact ppm with a separate sign column).
    *
    * Shape: the series is joined to itself once per lag via a lag
    * EXPLODE (each row emits `(t + k, k, x)`; the equi-join on the
    * shifted index is keyed, never cross), then one groupCorr hash
    * agg per lag. Series length L, lag count m → m·L join rows; for
    * daily/hourly series L is tiny next to the corpus that produced
    * it, so the whole thing is dimension-sized.
    */
  def autocorr(series: DataFrame, t: Column, x: Column, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty, "autocorr needs at least one lag")
    require(lags.forall(_ >= 1), s"lags must be >= 1, got $lags")
    require(lags.distinct.length == lags.length, s"duplicate lags in $lags")
    val base = series.select(t.cast("long").as("__t"), x.cast("long").as("__x"))
    val cur = base.select(col("__t"), col("__x").as("__xc"))
    val shifted = base
      .select(explode(array(lags.map(k => lit(k)): _*)).as("lag"),
        col("__t"), col("__x"))
      .select(col("lag"), (col("__t") + col("lag")).as("__t"),
        col("__x").as("__xl"))
    val pairs = cur.join(shifted, Seq("__t"))
    groupCorr(pairs, Seq("lag"), col("__xc"), col("__xl"))
  }

  /** WEEKLY (period-`p`) SEASONAL DECOMPOSITION of a regular integer
    * series — the classical-decomposition companion to [[autocorr]]
    * (autocorr says "period 7 repeats"; this says "by HOW MUCH each
    * phase deviates"): trend is the centered `p`-point moving sum
    * floor-divided by `p` (rows without a full window are excluded —
    * no edge fudging), the detrended residual is grouped by phase
    * `t mod p`, and each phase reports its exact residual sum and
    * count (callers divide; keeping the sum exact keeps the row
    * hash-checkable and mergeable). `p` must be odd so the window
    * centers exactly.
    *
    * Shape: one ordered window over the series (series-sized, the
    * autocorr contract) and one `p`-row hash agg.
    */
  def seasonalDecompose(series: DataFrame, t: Column, x: Column, p: Int): DataFrame = {
    require(p >= 3 && p % 2 == 1, s"period must be odd and >= 3, got $p")
    val half = p / 2
    val base = series.select(t.cast("long").as("__t"), x.cast("long").as("__x"))
    val w = Windows.pinnedOrderBy(col("__t")).rangeBetween(-half, half)
    base
      .withColumn("__wn", count(lit(1)).over(w))
      .withColumn("__ws", sum(col("__x")).over(w))
      .filter(col("__wn") === p) // full centered windows only
      .select(col("__t"), (col("__x") - expr(s"__ws div $p")).as("__resid"))
      .groupBy((col("__t") % p).as("phase"))
      .agg(count(lit(1)).as("n_days"), sum("__resid").as("resid_sum"))
  }

  /** K-ANONYMITY profile over a set of quasi-identifier columns — the
    * governance pre-flight before a release: how many equivalence
    * classes (distinct quasi-identifier combinations) exist at each
    * size, and how many ROWS sit in classes smaller than `k` (those
    * rows are re-identifiable; suppression/generalization targets
    * them). Exact counts, two hash aggs, nothing driver-sided.
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[Column], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols: _*)
      .agg(count(lit(1)).as("__sz"))
      .groupBy(col("__sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("n_classes") * col("class_size"))
      .withColumn("risky", col("class_size") < k)
  }

  /** WINSORIZED group statistics — clamp-at-the-tails robustification
    * (the standard way to keep a handful of wild rows from dominating
    * a mean or a downstream weight): per group, the exact `loPct`/
    * `hiPct` order statistics (k-th smallest with
    * `k = ⌈pct·n/100⌉` — pure integer rank math, no interpolation,
    * so both engines pick the SAME element), the count clamped at
    * each tail, and the winsorized sum. All BIGINT — hash-exact.
    *
    * Shape: one group-keyed window pass (row_number + count over the
    * same partitioning — one sort), a group-sized agg for the two
    * cut values, a broadcast-sized join back, one final agg. No
    * global window anywhere.
    */
  def winsorizedStats(df: DataFrame, groupCols: Seq[String], idCol: String,
      value: Column, loPct: Int, hiPct: Int): DataFrame = {
    require(groupCols.nonEmpty, "winsorizedStats needs at least one group column")
    require(loPct >= 1 && hiPct <= 100 && loPct < hiPct,
      s"need 1 <= loPct < hiPct <= 100, got ($loPct, $hiPct)")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__v").asc, col(idCol).asc)
    val ranked = df
      .select(groupCols.map(col) :+ col(idCol) :+ value.cast("long").as("__v"): _*)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g: _*)))
    val kLo = expr(s"(__n * $loPct + 99) div 100") // integer ceil(pct·n/100)
    val kHi = expr(s"(__n * $hiPct + 99) div 100")
    val cuts = ranked.groupBy(g: _*)
      .agg(max(col("__n")).as("n"),
        max(when(col("__rk") === kLo, col("__v"))).as("lo"),
        max(when(col("__rk") === kHi, col("__v"))).as("hi"))
    ranked.join(cuts, groupCols)
      .groupBy(g: _*)
      .agg(max(col("n")).as("n"), max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("__v") < col("lo"), 1L).otherwise(0L)).as("n_clamped_lo"),
        sum(when(col("__v") > col("hi"), 1L).otherwise(0L)).as("n_clamped_hi"),
        sum(greatest(least(col("__v"), col("hi")), col("lo"))).as("sum_winsorized"))
  }

  /** REFERENTIAL-INTEGRITY profile of one foreign-key relation — the
    * data-quality pre-flight for every star-schema join: orphan child
    * rows (FK value with no parent — a join would silently drop or
    * null them), null FKs, and unreferenced parents, all as one exact
    * summary row. Two key-level hash aggs + one key-keyed outer join,
    * plus one count for the null tally — null keys can't ride the
    * full join (its null-key rows mean "no match", not "null FK").
    */
  def fkIntegrity(child: DataFrame, childKey: Column, parent: DataFrame,
      parentKey: Column, relation: String): DataFrame = {
    val ck = child.select(childKey.as("__k"))
    // Lazy 1-row null tally (null keys can't ride the full join — its
    // null-key rows mean "no match", not "null FK"); joined in below
    // so the whole profile stays one deferred plan, no eager count().
    val nullAgg = ck.agg(
      coalesce(sum(when(col("__k").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_null_fk_rows"))
    val ckeys = ck.filter(col("__k").isNotNull)
      .groupBy("__k").agg(count(lit(1)).as("__cn"))
    val pkeys = parent.select(parentKey.as("__k")).distinct()
      .withColumn("__p", lit(true))
    // Every sum coalesced to 0: on an empty child+parent input Spark's
    // sums over zero rows are NULL while the DuckDB mirror coalesces.
    ckeys.join(pkeys, Seq("__k"), "full")
      .agg(
        lit(relation).as("relation"),
        coalesce(sum(coalesce(col("__cn"), lit(0L))), lit(0L)).as("n_child_rows"),
        coalesce(sum(when(col("__p").isNull, col("__cn")).otherwise(0L)), lit(0L))
          .as("n_orphan_rows"),
        coalesce(sum(when(col("__p").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_orphan_keys"),
        coalesce(sum(when(col("__p").isNotNull && col("__cn").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_referenced_parents"),
        coalesce(sum(when(col("__cn").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_unreferenced_parents"))
      .join(broadcast(nullAgg))
      .select(col("relation"), col("n_child_rows"), col("n_null_fk_rows"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        col("n_referenced_parents"), col("n_unreferenced_parents"))
  }

  /** EXACT equi-join size forecast from per-key counts — the pre-join
    * skew diagnostic that answers "how big will this join be and
    * which key dominates" BEFORE paying for the join: `Σ cntL·cntR`
    * over shared keys is the exact inner-join cardinality, and the
    * top key's share is the straggler forecast ([[keySkew]]'s
    * companion, one step earlier in the plan). Two key aggs + one
    * key join, output one row.
    */
  def joinSizeEstimate(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, relation: String): DataFrame = {
    val dec = "decimal(38,0)"
    val la = left.groupBy(leftKey.as("__k")).agg(count(lit(1)).as("__ln"))
    val ra = right.groupBy(rightKey.as("__k")).agg(count(lit(1)).as("__rn"))
    la.join(ra, Seq("__k"))
      .select(col("__k"), (col("__ln").cast(dec) * col("__rn").cast(dec)).as("__c"))
      .agg(
        lit(relation).as("relation"),
        count(lit(1)).as("n_shared_keys"),
        sum("__c").cast("long").as("n_join_rows"),
        max(struct(col("__c"), col("__k").cast("string").as("__kk"))).as("__top"))
      .select(col("relation"), col("n_shared_keys"), col("n_join_rows"),
        col("__top.__kk").as("top_key"),
        col("__top.__c").cast("long").as("top_key_rows"),
        expr("(CAST(__top.__c AS BIGINT) * 1000000L) div n_join_rows")
          .as("top_share_ppm"))
  }

  /** EQUI-DEPTH histogram per group: every row ranked under the
    * (value, id) total order, bucket `(rank−1)·B div n` — buckets
    * hold equal row counts (±1) by construction, and the boundaries
    * are exact order statistics both engines agree on (the
    * [[winsorizedStats]] rank discipline, generalized to B cuts).
    * One group-keyed window + one hash agg.
    */
  def equiDepthHistogram(df: DataFrame, groupCols: Seq[String], idCol: String,
      value: Column, buckets: Int): DataFrame = {
    require(groupCols.nonEmpty, "equiDepthHistogram needs at least one group column")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("__v").asc, col(idCol).asc)
    df.select(groupCols.map(col) :+ col(idCol) :+ value.cast("long").as("__v"): _*)
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(g: _*)))
      .withColumn("bucket", expr(s"((__rk - 1) * $buckets) div __n"))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"), min("__v").as("lo"), max("__v").as("hi"))
  }

  /** One-sided CUSUM drift detector over a regular integer series —
    * the change-point monitor (Page 1954): `S_t = max(0, S_{t−1} +
    * x_t − slack)` ramps when the level shifts above `slack` and
    * hugs 0 otherwise. The recurrence LOOKS inherently sequential,
    * but has the exact prefix closed form
    * {{{ S_t = C_t − min(0, min_{j≤t} C_j),  C_t = Σ_{i≤t}(x_i − slack) }}}
    * so it distributes as one running sum + one running min over the
    * same ordered window — no iteration, engine-exact BIGINTs.
    * Series-sized input (the [[autocorr]] contract: the corpus that
    * produced the series is huge; the series itself is tiny), so the
    * unpartitioned ordered window is dimension-sized by construction.
    * Returns every point with its statistic and the alarm flag.
    */
  def cusum(series: DataFrame, t: Column, x: Column, slack: Long,
      threshold: Long): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val w = Windows.pinnedOrderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.select(t.cast("long").as("__t"), x.cast("long").as("__x"))
      .withColumn("__c", sum(col("__x") - slack).over(w))
      .withColumn("__m", least(min(col("__c")).over(w), lit(0L)))
      .select(col("__t").as("t"), col("__x").as("x"),
        (col("__c") - col("__m")).as("s"),
        (col("__c") - col("__m") >= threshold).as("alarm"))
  }

  /** The Benford first-digit expectation `⌊10⁶·log₁₀(1 + 1/d)⌋` —
    * Scala-computed constants shared by both engines (the ndcgGains
    * discipline). */
  def benfordExpectedPpm: Seq[Long] =
    (1 to 9).map(d => math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  /** [[benfordExpectedPpm]] as a SQL list literal. */
  def benfordExpectedPpmSql: String = benfordExpectedPpm.mkString("[", ", ", "]")

  /** BENFORD first-significant-digit profile of a positive integer
    * measure — the classic fabricated-data / unit-mixing smell test:
    * observed digit shares vs the Benford expectation, in exact ppm
    * (counts are exact; the expectation is a shared literal table).
    * Non-positive values are excluded (they have no leading digit).
    * One map-only digit extract + a 9-row agg + a 1-row broadcast.
    */
  def benfordProfile(df: DataFrame, value: Column): DataFrame = {
    val expArr = typedLit(benfordExpectedPpm)
    val digits = df.select(value.cast("long").as("__v"))
      .filter(col("__v") > 0)
      .select(substring(col("__v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    digits
      .join(broadcast(digits.agg(sum("n").as("__t"))))
      .select(col("digit"), col("n"),
        expr("(n * 1000000L) div __t").as("obs_ppm"),
        element_at(expArr, col("digit")).as("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /** L-DIVERSITY profile — [[kAnonymity]]'s companion (Machanavajjhala
    * et al., ICDE 2006): a k-anonymous class is still a disclosure if
    * everyone in it shares the SAME sensitive value, so the unit of
    * risk is the number of DISTINCT sensitive values per
    * quasi-identifier class. Output: histogram of (class_size,
    * diversity) with class/row tallies and the at-risk flag
    * (`diversity < l`). Two hash aggs over (QI..., sensitive) then
    * (QI...), nothing driver-sided — the [[kAnonymity]] shape with
    * one extra keyed level.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[Column], sensitive: Column,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    val qs = quasiCols.indices.map(i => s"__q$i")
    val keyed = df.select(
      quasiCols.zip(qs).map { case (c, n) => c.as(n) } :+ sensitive.as("__s"): _*)
    keyed
      .groupBy((qs :+ "__s").map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(qs.map(col): _*)
      .agg(sum("__n").as("__sz"), count(lit(1)).as("__div"))
      .groupBy(col("__sz").as("class_size"), col("__div").as("diversity"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("n_classes") * col("class_size"))
      .withColumn("risky", col("diversity") < l)
  }

  /** CALIBRATION (reliability) bins — "when the model says 70%, is it
    * right 70% of the time?": scores in ppm bucketed into `bins`
    * fixed-width bands, each band reporting exact n / positives /
    * score mass, with the observed positive rate and mean predicted
    * score both in exact ppm (one hash agg; rates by exact BIGINT
    * division — non-negative operands, `div` ≡ `//`).
    */
  def calibrationBins(df: DataFrame, scorePpm: Column, label: Column,
      bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    df.select(scorePpm.cast("long").as("__p"), label.cast("boolean").as("__y"))
      .withColumn("bin", least(expr(s"(__p * $bins) div 1000000"), lit(bins - 1)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum("__p").as("__sp"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000000L) div n").as("obs_pos_ppm"),
        expr("__sp div n").as("mean_score_ppm"))
      .withColumn("gap_ppm", col("obs_pos_ppm") - col("mean_score_ppm"))
  }

  /** COHEN'S KAPPA — chance-corrected agreement between two labelers
    * (Cohen 1960), the inter-annotator QA staple, in exact integer
    * arithmetic: with `n` items, observed agreement `d = Σ diag` and
    * expected agreement `e·n = Σ_c rowmarg_c·colmarg_c`,
    * {{{ κ = (n·d − Σ rm·cm) / (n² − Σ rm·cm) }}}
    * emitted in ppm via the [[groupTrend]] truncating decimal
    * division (exactly the same value on both engines, including
    * negative κ). Shape: one (a,b) cell agg, two marginal aggs from
    * the CELLS (label-cardinality-sized, broadcast), one 1-row fold.
    */
  def cohenKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(labelA.cast("string").as("__a"),
        labelB.cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
    val ra = cells.groupBy(col("__a").as("__c")).agg(sum("__n").as("__ra"))
    val cb = cells.groupBy(col("__b").as("__c")).agg(sum("__n").as("__cb"))
    val pe = ra.join(cb, Seq("__c"))
      .agg(sum(col("__ra").cast(dec) * col("__cb").cast(dec)).as("__pe"))
    val tot = cells.agg(sum("__n").cast(dec).as("__t"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L)).cast(dec)
        .as("__d"))
    val num = (col("__t") * col("__d") - col("__pe")) * lit(1000000L).cast(dec)
    val den = col("__t") * col("__t") - col("__pe")
    tot.join(broadcast(pe))
      .select(col("__t").cast("long").as("n"),
        col("__d").cast("long").as("n_agree"),
        when(den === 0, lit(null).cast("long"))
          .otherwise(((num - num % den) / den).cast("long")).as("kappa_ppm"))
  }

  /** ROC AUC — threshold-free ranking quality of a scorer against a
    * binary label (the quality-classifier / reranker eval staple),
    * EXACT via the Mann–Whitney U identity: AUC = P(s⁺ > s⁻) +
    * ½·P(s⁺ = s⁻). Computed from per-score counts, never per-row
    * ranks: group scores → (n_pos, n_neg) per distinct score, one
    * ordered cumulative window over the SUPPORT (distinct scores —
    * the caller bands scores to a bounded domain, e.g. ppm, so this
    * window is support-sized, not corpus-sized), then
    * {{{ U·2 = Σ_s n_pos(s) · (2·cumneg(<s) + n_neg(s)) }}}
    * — doubled so ties stay integral — and
    * `auc_ppm = ⌊U2·10⁶ / (2·P·N)⌋` in decimal(38,0) (holds past
    * 10¹⁵ rows/side). Null when either class is empty.
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val grouped = df.select(score.cast("long").as("__s"),
        label.cast("boolean").as("__y"))
      .groupBy("__s")
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__nn"))
    val w = Windows.pinnedOrderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val u2 = grouped
      .withColumn("__cn", coalesce(sum("__nn").over(w), lit(0L)))
      .agg(
        sum(col("__np").cast(dec) *
          (col("__cn").cast(dec) * 2 + col("__nn").cast(dec))).as("__u2"),
        sum("__np").cast(dec).as("__p"), sum("__nn").cast(dec).as("__n"))
    val num = col("__u2") * lit(1000000L).cast(dec)
    val den = col("__p") * col("__n") * 2
    u2.select(
      (col("__p") + col("__n")).cast("long").as("n"),
      col("__p").cast("long").as("n_pos"),
      col("__n").cast("long").as("n_neg"),
      when(den === 0, lit(null).cast("long"))
        .otherwise(((num - num % den) / den).cast("long")).as("auc_ppm"))
  }

  /** Two-sample Kolmogorov–Smirnov distance — "did this distribution
    * drift": D = max_v |F_a(v) − F_b(v)| over the merged support, in
    * exact floor-ppm (both engines floor the same integers, so the
    * statistic is hash-exact; the ⌊⌋ error is < 1 ppm per side).
    * Complements [[chiSquare]] (categorical) and the JSD drift row
    * (token distributions) with the ORDERED-numeric drift test.
    *
    * Scale shape: per-side hash aggs keyed by value, a full outer
    * merge of the two supports, ONE ordered cumulative window over
    * the support — the caller bands values to a bounded domain
    * (dollars, not cents; the window is support-sized, not
    * row-sized) — and a 1-row max. Ties on D broken toward the
    * smallest value (min over argmax), so `at_v` is deterministic.
    */
  def ksTest(a: DataFrame, aVal: Column, b: DataFrame, bVal: Column): DataFrame = {
    val ca = a.select(aVal.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__na"))
    val cb = b.select(bVal.cast("long").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__nb"))
    val merged = ca.join(cb, Seq("__v"), "full")
      .select(col("__v"), coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val w = Windows.pinnedOrderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("__ca", sum("__na").over(w))
      .withColumn("__cb", sum("__nb").over(w))
    val tot = cum.agg(max("__ca").as("__ta"), max("__cb").as("__tb"))
    val d = cum.crossJoin(broadcast(tot))
      .select(col("__v"),
        abs(expr("__ca * 1000000L div __ta") - expr("__cb * 1000000L div __tb"))
          .as("__d"),
        col("__ta"), col("__tb"))
    d.groupBy("__ta", "__tb").agg(max("__d").as("d_ppm"))
      .join(d.groupBy(col("__d").as("d_ppm"))
        .agg(min("__v").as("at_v")), Seq("d_ppm"))
      .select(col("__ta").as("n_a"), col("__tb").as("n_b"),
        col("d_ppm"), col("at_v"))
  }

  /** Gini concentration of a weight over keys — "is the corpus 90%
    * one domain": the data-mixing diversity gate. Exact integer form
    * over per-key totals `w₁ ≤ … ≤ w_n` (ties ranked by key —
    * deterministic):
    * {{{ G = (2·Σ i·wᵢ − (n+1)·Σ wᵢ) / (n·Σ wᵢ) }}}
    * in ppm via decimal(38,0) truncating division. 0 = perfectly
    * even, →1 = all mass on one key. Also reports the single
    * heaviest key's share. Shape: one key-hash agg, one ordered
    * window over the KEY table (bounded: distinct keys, not rows),
    * one 1-row fold.
    */
  def giniConcentration(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val k = df.select(key.cast("string").as("__k"), weight.cast("long").as("__w"))
      .groupBy("__k").agg(sum("__w").as("__w"))
    val ranked = k.withColumn("__i",
      row_number().over(Windows.pinnedOrderBy(col("__w"), col("__k"))))
    val agg = ranked.agg(
      count(lit(1)).cast(dec).as("__n"),
      sum("__w").cast(dec).as("__s"),
      sum(col("__i").cast(dec) * col("__w").cast(dec)).as("__iw"),
      max("__w").as("__mx"))
    val num = (agg("__iw") * 2 - (col("__n") + 1) * col("__s")) *
      lit(1000000L).cast(dec)
    val den = col("__n") * col("__s")
    agg.select(
      col("__n").cast("long").as("n_keys"),
      col("__s").cast("long").as("total_weight"),
      when(den === 0, lit(null).cast("long"))
        .otherwise(((num - num % den) / den).cast("long")).as("gini_ppm"),
      when(col("__s") === 0, lit(null).cast("long"))
        .otherwise({
          val mn = col("__mx").cast(dec) * lit(1000000L).cast(dec)
          ((mn - mn % col("__s")) / col("__s")).cast("long")
        }).as("top_share_ppm"))
  }

  /** Warner's randomized response (1965) — the privacy mechanism for
    * estimating a sensitive proportion WITHOUT trusting any row: each
    * row reports its boolean flipped with probability p (here a
    * deterministic md5 coin keyed by `coinKey`, so both engines flip
    * the same rows — the seeded-sampling discipline), and the
    * aggregate debiases:
    * {{{ x̄ = (obs − p) / (1 − 2p) }}}
    * in exact ppm via remainder-subtraction division (est can be
    * negative or exceed 10⁶ on small groups — that's the mechanism's
    * real sampling noise, reported truthfully, not clamped). Shape:
    * one map-only coin column + one group hash agg.
    */
  def randomizedResponse(df: DataFrame, group: Column, sensitive: Column,
      coinKey: Column, pPpm: Long): DataFrame = {
    require(pPpm > 0 && pPpm < 500000,
      s"flip probability must be in (0, 0.5) ppm, got $pPpm")
    val dec = "decimal(38,0)"
    val coin = conv(substring(md5(concat(lit("rr:"),
      coinKey.cast("string"))), 1, 15), 16, 10).cast("long") % 1000000L
    val num = (col("obs_ppm") - pPpm).cast(dec) * lit(1000000L).cast(dec)
    val den = lit(1000000L - 2 * pPpm).cast(dec)
    df.select(group.as("g"),
        (sensitive.cast("boolean") =!= (coin < pPpm)).as("__r"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__r"), 1L).otherwise(0L)).as("n_reported"))
      .select(col("g"), col("n"), col("n_reported"),
        expr("(n_reported * 1000000L) div n").as("obs_ppm"))
      .withColumn("est_ppm", ((num - num % den) / den).cast("long"))
  }

  /** T-closeness profile (Li et al. 2007) — k-anonymity's
    * distributional upgrade: per quasi-identifier class, the Earth
    * Mover's Distance between the class's SENSITIVE-value
    * distribution and the global one; a class whose sensitive mix
    * differs sharply from baseline leaks even when large and
    * diverse. For an ORDERED sensitive attribute with `m` categories,
    * {{{ EMD = Σ_j |cum_class(j) − cum_global(j)| / (m−1) }}}
    * computed in floor-ppm (each distribution's cumulative ppm is
    * exact-floored identically in both engines). Output: one row per
    * class with its size, emd_ppm, and the `risky` flag
    * (emd_ppm > tPpm).
    *
    * Shape: class×category grid built by cross join of the CLASS
    * table with the CATEGORY table (both bounded: QI classes ×
    * sensitive bands — never row-sized), counts left-joined in,
    * cumulative windows partitioned per class over ≤ m rows.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[Column], sensitive: Column,
      tPpm: Long): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs at least one quasi-identifier")
    val qs = quasiCols.indices.map(i => s"q$i")
    val keyed = df.select(
      quasiCols.zip(qs).map { case (c, n) => c.as(n) } :+
        sensitive.cast("long").as("__c"): _*)
    val cats = keyed.groupBy("__c").agg(count(lit(1)).as("__gn"))
    val gtot = cats.agg(sum("__gn").as("__gt"), count(lit(1)).as("__m"))
    val gcum = cats.crossJoin(broadcast(gtot))
      .withColumn("__gc", sum("__gn").over(Windows.pinnedOrderBy(col("__c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("__c"), expr("__gc * 1000000L div __gt").as("__gppm"),
        col("__m"))
    val cls = keyed.groupBy(qs.map(col): _*).agg(count(lit(1)).as("class_size"))
    val cnt = keyed.groupBy((qs :+ "__c").map(col): _*)
      .agg(count(lit(1)).as("__cn"))
    val grid = cls.crossJoin(gcum.select("__c", "__gppm", "__m"))
      .join(cnt, qs :+ "__c", "left")
      .withColumn("__cn", coalesce(col("__cn"), lit(0L)))
    val wc = Window.partitionBy(qs.map(col): _*).orderBy("__c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("__cc", sum("__cn").over(wc))
      .withColumn("__cppm", expr("__cc * 1000000L div class_size"))
      .groupBy((qs :+ "class_size").map(col): _*)
      .agg(sum(abs(col("__cppm") - col("__gppm"))).as("__sd"),
        max("__m").as("__m"))
      .select(qs.map(col) :+ col("class_size") :+
        expr("__sd div (__m - 1)").as("emd_ppm"): _*)
      .withColumn("risky", col("emd_ppm") > tPpm)
  }

  /** Precision / recall / F1 at a sweep of score thresholds — the
    * operating-point view of a binary scorer ([[rocAuc]] is the
    * threshold-FREE companion; this row is what picks the production
    * cutoff). All exact integer: per threshold t, predict
    * `score ≥ t`, tally the confusion quadrants in one conditional
    * hash agg, and
    * {{{ precision = tp/(tp+fp), recall = tp/(tp+fn),
    *     f1 = 2·tp/(2·tp+fp+fn) }}}
    * each as floor-ppm (the harmonic-mean F1 reduced to a single
    * division so no intermediate rounds). NULL when a denominator is
    * zero (no predicted / no actual positives), never 0-by-fiat.
    *
    * Plan shape: ONE corpus scan exploded over the bounded threshold
    * list (|thresholds| copies of each row — a literal array, not a
    * join), one |thresholds|-key hash agg. Map-side partials make the
    * shuffle |thresholds| rows per task.
    */
  def prf1(df: DataFrame, score: Column, label: Column,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "prf1 needs at least one threshold")
    df.select(score.cast("long").as("__s"),
        label.cast("boolean").as("__y"),
        explode(typedLit(thresholds.sorted)).as("threshold"))
      .groupBy("threshold")
      .agg(
        sum(when(col("__s") >= col("threshold") && col("__y"), 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("threshold") && !col("__y"), 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("threshold") && col("__y"), 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("__s") < col("threshold") && !col("__y"), 1L)
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") === 0, lit(null).cast("long"))
          .otherwise(expr("(tp * 1000000L) div (tp + fp)")).as("precision_ppm"),
        when(col("tp") + col("fn") === 0, lit(null).cast("long"))
          .otherwise(expr("(tp * 1000000L) div (tp + fn)")).as("recall_ppm"),
        when(col("tp") * 2 + col("fp") + col("fn") === 0, lit(null).cast("long"))
          .otherwise(expr("(tp * 2000000L) div (2 * tp + fp + fn)")).as("f1_ppm"))
  }

  /** McNemar's paired test — "is classifier A actually better than B
    * on the SAME rows", the right test when two models are evaluated
    * on one labelled set (a two-proportion z-test ignores the pairing
    * and wastes power). Only the discordant counts matter:
    * b = A-right/B-wrong, c = A-wrong/B-right, and the statistic
    * {{{ χ² = (b − c)² / (b + c) }}}
    * here in exact milli-units ((b−c)²·1000 div (b+c) — df 1;
    * 3841 milli ≈ p 0.05). NULL when b + c = 0 (no disagreement).
    * One scan, one conditional hash agg, a 1-row fold — nothing
    * corpus-sized past the map side.
    */
  def mcnemar(df: DataFrame, label: Column, predA: Column,
      predB: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val agg = df.select(
        (predA.cast("boolean") === label.cast("boolean")).as("__a"),
        (predB.cast("boolean") === label.cast("boolean")).as("__b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__a") && col("__b"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("__a") && !col("__b"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__a") && col("__b"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__a") && !col("__b"), 1L).otherwise(0L)).as("n_neither"))
    val num = (col("b") - col("c")).cast(dec) *
      (col("b") - col("c")).cast(dec) * 1000
    val den = (col("b") + col("c")).cast(dec)
    agg.select(col("n"), col("n_both"), col("b"), col("c"), col("n_neither"),
      when(den === 0, lit(null).cast("long"))
        .otherwise(((num - num % den) / den).cast("long")).as("chi2_milli"))
  }

  /** Stratified odds ratio with the Mantel–Haenszel pooled estimate —
    * the Simpson's-paradox-safe effect size: per stratum k the 2×2
    * table (a=exposed-outcome, b=exposed-no, c=unexposed-outcome,
    * d=unexposed-no) gives `OR_k = a·d/(b·c)`, and the pooled
    * {{{ OR_MH = Σ_k (a_k·d_k/n_k) / Σ_k (b_k·c_k/n_k) }}}
    * weighs strata by size, immune to confounding by the stratum
    * variable (Mantel & Haenszel 1959). All floor-ppm: each per-stratum
    * ratio and each MH term uses the same integer division in both
    * engines, so the output is hash-exact. Per-stratum OR is NULL when
    * b·c = 0 (degenerate table). Output: one row per stratum plus one
    * `__pooled__` row.
    *
    * Plan shape: one conditional hash agg keyed by stratum, a
    * stratum-sized projection, and a 1-row fold for the pooled terms —
    * the 2×2 grid never materializes row-wise.
    */
  def oddsRatioMH(df: DataFrame, stratum: Column, exposed: Column,
      outcome: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val tabs = df.select(stratum.cast("string").as("stratum"),
        exposed.cast("boolean").as("__e"), outcome.cast("boolean").as("__o"))
      .groupBy("stratum")
      .agg(sum(when(col("__e") && col("__o"), 1L).otherwise(0L)).as("a"),
        sum(when(col("__e") && !col("__o"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("__e") && col("__o"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("__e") && !col("__o"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
    def fdiv(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast("long"))
        .otherwise(((num - num % den) / den).cast("long"))
    val perStratum = tabs.select(col("stratum"), col("a"), col("b"),
      col("c"), col("d"),
      fdiv(col("a").cast(dec) * col("d").cast(dec) * 1000000L,
        col("b").cast(dec) * col("c").cast(dec)).as("or_ppm"))
    def tdiv(num: Column, den: Column): Column =
      (num - num % den) / den // decimal truncating division, exact
    val pooled = tabs
      .select(
        tdiv(col("a").cast(dec) * col("d").cast(dec) * 1000000L,
          col("n").cast(dec)).as("__tn"),
        tdiv(col("b").cast(dec) * col("c").cast(dec) * 1000000L,
          col("n").cast(dec)).as("__td"),
        col("a"), col("b"), col("c"), col("d"))
      .agg(sum("a").as("a"), sum("b").as("b"), sum("c").as("c"),
        sum("d").as("d"),
        sum("__tn").cast(dec).as("__sn"), sum("__td").cast(dec).as("__sd"))
      .select(lit("__pooled__").as("stratum"), col("a"), col("b"),
        col("c"), col("d"),
        fdiv(col("__sn") * 1000000L, col("__sd")).as("or_ppm"))
    perStratum.unionByName(pooled)
  }

  /** Multi-class confusion matrix with per-cell diagnostics — the
    * classifier-eval view that [[cohenKappa]] (agreement) and
    * [[prf1]] (binary operating points) don't give: WHICH classes
    * confuse with which. One row per observed (label, pred) cell with
    * the cell count, both marginals, and exact floor-ppm
    * `recall_ppm = n·10⁶ div n_label` / `precision_ppm = n·10⁶ div
    * n_pred` (meaningful on the diagonal; off-diagonal they read as
    * "share of this true class leaking into that prediction").
    *
    * Plan shape: one (label, pred) hash agg — class-cardinality²
    * cells, never row-sized — two marginal aggs FROM the cells, both
    * broadcast back. No window, no row-sized shuffle beyond the
    * first agg.
    */
  def confusionMatrix(df: DataFrame, label: Column, pred: Column): DataFrame = {
    val cells = df.select(label.cast("string").as("label"),
        pred.cast("string").as("pred"))
      .groupBy("label", "pred").agg(count(lit(1)).as("n"))
    val rowM = cells.groupBy("label").agg(sum("n").as("n_label"))
    val colM = cells.groupBy("pred").agg(sum("n").as("n_pred"))
    cells.join(broadcast(rowM), Seq("label"))
      .join(broadcast(colM), Seq("pred"))
      .select(col("label"), col("pred"), col("n"),
        col("n_label"), col("n_pred"),
        expr("n * 1000000L div n_label").as("recall_ppm"),
        expr("n * 1000000L div n_pred").as("precision_ppm"))
  }

  /** Theil–Sen robust trend per group: the MEDIAN of all pairwise
    * slopes `(x_j−x_i)/(t_j−t_i)`, i<j — immune to the outlier days
    * that wreck a least-squares line (up to ~29% contamination).
    * Slopes are exact micro-units (`Δx·10⁶ div Δt` — truncating
    * integer division, identical in Spark `div` and DuckDB `//`
    * including negatives), and the median is the LOWER median (rank
    * ⌈n/2⌉ under (slope, t_i, t_j) order — fully deterministic under
    * slope ties).
    *
    * Scale shape: the pairwise self-join is per-group over the
    * SERIES (calendar-bounded — weeks/days — never row-sized; the
    * caller aggregates raw rows to the series first), so pairs/group
    * is O(series²) regardless of corpus size; rank + count are one
    * window pass over the pairs.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], t: Column,
      x: Column): DataFrame = {
    val base = df.select(groupCols.map(col) :+ t.cast("long").as("__t")
      :+ x.cast("long").as("__x"): _*)
    val a = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"${c}_a"))
    val b = base.columns.foldLeft(base)((d, c) => d.withColumnRenamed(c, s"${c}_b"))
    val onGroup = groupCols.map(g => a(s"${g}_a") === b(s"${g}_b"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val pairs = a.join(b, onGroup && a("__t_a") < b("__t_b"))
      .select(groupCols.map(g => a(s"${g}_a").as(g))
        :+ a("__t_a") :+ b("__t_b")
        :+ expr("(__x_b - __x_a) * 1000000L div (__t_b - __t_a)").as("__s"): _*)
    val wRank = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__s"), col("__t_a"), col("__t_b"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    pairs
      .withColumn("__rk", row_number().over(wRank))
      .withColumn("__np", count(lit(1)).over(wAll))
      .filter(col("__rk") === expr("(__np + 1) div 2"))
      .select(groupCols.map(col)
        :+ col("__np").as("n_pairs") :+ col("__s").as("slope_micro"): _*)
  }

  /** Mutual information between two categorical columns in
    * micro-nats·n — the feature-redundancy / leakage probe ("does
    * this metadata column give away the label"). Decomposed into four
    * independent sums of the [[TextAnalysis.tokenEntropy]] primitive
    * `Σ ⌊c·ln(c)·10⁶⌋` (each term floored BEFORE its sum, so every
    * aggregate is order-independent and engine-exact):
    * {{{ mi_unat = Σ_cells ⌊c·ln c·10⁶⌋ + ⌊n·ln n·10⁶⌋
    *             − Σ_a ⌊c·ln c·10⁶⌋ − Σ_b ⌊c·ln c·10⁶⌋ }}}
    * ≈ n·MI·10⁶ (each floor errs < 1 µnat per term). MI in nats is
    * `mi_unat / (10⁶·n)`; 0 ⇔ independent.
    *
    * Plan shape: one (a,b) cell hash agg; marginals and the total
    * fold FROM the cells (cardinality-sized); two broadcast 1-row
    * joins. No window, no second pass over rows.
    */
  def mutualInfo(df: DataFrame, a: Column, b: Column): DataFrame = {
    def clogc(c: Column): Column =
      floor(log(c.cast("double")) * c * 1e6).cast("long")
    // eager checkpoint: three consumers (cell fold + two marginals)
    // would each re-execute the corpus-sized cell agg otherwise.
    val cells = df.select(a.cast("string").as("__a"), b.cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val cellSum = cells.agg(sum(clogc(col("__c"))).as("__hc"),
      count(lit(1)).as("n_cells"), sum("__c").as("n"))
    val aSum = cells.groupBy("__a").agg(sum("__c").as("__ca"))
      .agg(sum(clogc(col("__ca"))).as("__ha"))
    val bSum = cells.groupBy("__b").agg(sum("__c").as("__cb"))
      .agg(sum(clogc(col("__cb"))).as("__hb"))
    cellSum.join(broadcast(aSum)).join(broadcast(bSum))
      .select(col("n"), col("n_cells"),
        (col("__hc") + clogc(col("n")) - col("__ha") - col("__hb"))
          .as("mi_unat"))
  }

  /** Differentially-private histogram via the GEOMETRIC MECHANISM
    * (Ghosh–Roughgarden–Sundararajan 2009 — the discrete, utility-
    * optimal Laplace): each cell count is perturbed by
    * `noise = G₁ − G₂` where G ~ Geometric(½), giving the two-sided
    * geometric distribution that is ε-DP for counting queries at
    * ε = ln 2 per release. The geometric draws are PURELY INTEGER and
    * reproducible: G = number of trailing one-bits of a 60-bit md5
    * channel keyed by (seed, cell) — P(t trailing ones) = 2^−(t+1)
    * exactly — so the identical noise derives in any engine and the
    * release never needs RNG state (`trailing_ones(x) =
    * bit_count(x XOR (x+1)) − 1`). `dp_n` clamps at 0 (postprocessing
    * preserves DP).
    *
    * Shape: one key hash agg, then map-only noise — nothing beyond
    * the histogram itself.
    */
  def dpGeometricHistogram(df: DataFrame, key: Column, seed: String): DataFrame = {
    def chan(tag: String): Column =
      conv(substring(md5(concat(lit(seed + tag), col("key"))), 1, 15), 16, 10)
        .cast("long")
    def tOnes(c: Column): Column =
      (bit_count(c.bitwiseXOR(c + 1)) - 1).cast("long")
    df.select(key.cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .select(col("key"), col("n"),
        (tOnes(chan("a:")) - tOnes(chan("b:"))).as("noise"))
      .withColumn("dp_n", greatest(col("n") + col("noise"), lit(0L)))
  }

  /** Cross-group quantile normalization — map every group's value
    * distribution onto the POOLED per-rank profile (the batch-effect
    * remover from bioinformatics, equally at home normalizing
    * per-source document-length or score distributions before
    * mixing): rank within group by (value, id) — total order, so ties
    * are deterministic — then replace each value with the truncating
    * integer MEAN of all groups' values at that rank. Groups of
    * unequal size average over the groups that reach the rank.
    * Output: (group, id, value, norm_value).
    *
    * Shape: within-group ranks via the two-phase pattern — ONE range
    * exchange on (group, value, id) + partition-local numbering
    * ([[graft.ops.Windows.denseIdsBy]]) minus a group-keyed offset
    * (first global id per group — group-cardinality-sized, AQE
    * broadcasts it when small without a threshold-bypassing hint) —
    * so no group's row set ever sorts in a single task (a
    * `partitionBy(group)` window would bound parallelism by the group
    * count); then one rank-keyed hash agg (rank cardinality = max
    * group size) and one rank-keyed join back.
    */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
      value: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val gids = graft.ops.Windows.denseIdsBy(
      df.select(col(groupCol), col(idCol), value.cast("long").as("__v")),
      Seq(col(groupCol).asc, col("__v").asc, col(idCol).asc), "__gid")
    // No broadcast HINT on starts: one row per group is usually tiny
    // (AQE sees the runtime size and broadcasts it), but a forced
    // hint would bypass the size threshold and OOM the driver on a
    // degenerate millions-of-groups input — let the planner decide.
    val starts = gids.groupBy(groupCol).agg(min("__gid").as("__g0"))
    val ranked = gids.join(starts, Seq(groupCol))
      .withColumn("__rk", col("__gid") - col("__g0") + 1L)
      .drop("__gid", "__g0")
    val profile = ranked.groupBy("__rk")
      .agg(sum(col("__v").cast(dec)).as("__s"), count(lit(1)).cast(dec).as("__c"))
      .select(col("__rk"),
        ((col("__s") - col("__s") % col("__c")) / col("__c")).cast("long")
          .as("norm_value"))
    ranked.join(profile, Seq("__rk"))
      .select(col(groupCol), col(idCol), col("__v").as("value"),
        col("norm_value"))
  }

  /** Lorenz-curve points — the cumulative-share curve behind
    * [[giniConcentration]]'s scalar: after ranking keys by weight
    * ascending (ties → key asc, total order), emit the cumulative
    * weight share at each of `points` evenly-spaced rank quantiles.
    * Reading: `(decile 9, cum 420000)` means the bottom 90% of keys
    * hold 42% of the mass — i.e. the top decile holds 58%. The
    * curve a mixing pipeline inspects when the Gini scalar says
    * "concentrated" and someone asks "where exactly".
    *
    * Shape: one key hash agg, then rank AND cumulative weight over the
    * KEY table via [[graft.ops.Windows.orderedPrefixSum]] — one range
    * exchange + partition-local numbering/prefix-sums with driver-side
    * offsets (≤ #partitions rows collected), NOT a global unpartitioned
    * window: keys grow linearly with the corpus (customers, domains),
    * so a single-task global sort over them is only a constant factor
    * better than sorting rows. A 1-row totals broadcast closes it.
    */
  def lorenzCurve(df: DataFrame, key: Column, weight: Column,
      points: Int = 10): DataFrame = {
    require(points >= 1, s"points must be >= 1, got $points")
    val k = df.select(key.cast("string").as("__k"), weight.cast("long").as("__w"))
      .groupBy("__k").agg(sum("__w").as("__kw"))
    val ranked = graft.ops.Windows.orderedPrefixSum(
      k, Seq(col("__kw").asc, col("__k").asc), "__kw", "__rk", "__cum")
    val tot = ranked.agg(max("__rk").as("__n"), sum("__kw").as("__t"))
    val dec = "decimal(38,0)"
    val num = col("__cum").cast(dec) * lit(1000000L).cast(dec)
    val den = col("__t").cast(dec)
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile", explode(array((1 to points).map(lit): _*)))
      .filter(col("__rk") === expr(s"(__n * decile) div $points"))
      .select(col("decile").cast("long").as("decile"),
        col("__rk").as("n_keys_cum"),
        ((num - num % den) / den).cast("long").as("cum_weight_ppm"))
  }

  /** Empirical-Bayes smoothed rates — per-key success rates shrunk
    * toward a Beta(α, β) prior: `(pos + α)·10⁶ div (n + α + β)`. The
    * estimator every ranking-by-rate job needs: a 1/1 key must NOT
    * outrank a 980/1000 key, which the raw rate does and the
    * shrunk rate never does (low-n keys collapse toward the prior
    * mean α/(α+β)). Output per key: n, pos, raw and smoothed
    * floor-ppm, and the smoothed-desc rank (ties → key asc).
    *
    * Shape: one key hash agg + one key-cardinality window for the
    * rank. Nothing row-sized after the agg.
    */
  def smoothedRates(df: DataFrame, key: Column, positive: Column,
      alpha: Long, beta: Long): DataFrame = {
    require(alpha >= 0 && beta >= 0 && alpha + beta > 0,
      s"need alpha + beta > 0, got alpha=$alpha beta=$beta")
    val agg = df.select(key.cast("string").as("key"),
        positive.cast("boolean").as("__p"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__p"), 1L).otherwise(0L)).as("pos"))
      .select(col("key"), col("n"), col("pos"),
        expr("pos * 1000000L div n").as("rate_ppm"),
        expr(s"(pos + $alpha) * 1000000L div (n + ${alpha + beta})")
          .as("smoothed_ppm"))
    agg.withColumn("rank",
      row_number().over(Windows.pinnedOrderBy(col("smoothed_ppm").desc,
        col("key").asc_nulls_last)).cast("long"))
  }

  /** Seasonal-naive forecast accuracy (MASE, Hyndman & Koehler 2006):
    * forecast x̂_t = x_{t−period}, scaled by the in-sample MAE of the
    * one-step naive forecast —
    * {{{ MASE = mean|x_t − x_{t−p}| / mean|x_t − x_{t−1}| }}}
    * in exact floor-ppm via decimal cross-multiplication
    * (`s_p·n_1·10⁶ div s_1·n_p`). < 10⁶ means the seasonal pattern is
    * real (the period-p forecast beats naive); the quantitative
    * companion to [[autocorr]]'s lag spike. One ordered window over
    * the calendar-bounded series, one 1-row fold.
    */
  def seasonalNaiveMase(series: DataFrame, t: Column, x: Column,
      period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val dec = "decimal(38,0)"
    val e = series.select(t.as("__t"), x.cast("long").as("__x"))
      .withColumn("__ep", abs(col("__x") - lag(col("__x"), period).over(
        Windows.pinnedOrderBy(col("__t")))))
      .withColumn("__e1", abs(col("__x") - lag(col("__x"), 1).over(
        Windows.pinnedOrderBy(col("__t")))))
    val agg = e.agg(
      sum(when(col("__ep").isNotNull, 1L).otherwise(0L)).as("n_seasonal"),
      coalesce(sum("__ep"), lit(0L)).as("sum_abs_seasonal"),
      sum(when(col("__e1").isNotNull, 1L).otherwise(0L)).as("n_naive"),
      coalesce(sum("__e1"), lit(0L)).as("sum_abs_naive"))
    val num = col("sum_abs_seasonal").cast(dec) * col("n_naive").cast(dec) *
      lit(1000000L).cast(dec)
    val den = col("sum_abs_naive").cast(dec) * col("n_seasonal").cast(dec)
    agg.select(col("n_seasonal"), col("sum_abs_seasonal"),
      col("n_naive"), col("sum_abs_naive"),
      when(den === 0, lit(null).cast("long"))
        .otherwise(((num - num % den) / den).cast("long")).as("mase_ppm"))
  }

  /** Sample-ratio mismatch (SRM) — the first thing an experimentation
    * pipeline checks: did the variant split actually land at its
    * intended weights? Goodness-of-fit chi-square against expected
    * integer `weights`, each cell's term floored to MILLI units
    * before the (cell-bounded) sum — engine-exact:
    * {{{ term_i = ⌊(o_i·S − n·w_i)²·1000 / (n·w_i·S)⌋,  S = Σw }}}
    * (the textbook (o−e)²/e with e_i = n·wᵢ/S, cleared of the
    * fraction). df = cells − 1; compare chi2_milli against the
    * χ²(df) tail at your alert level. Missing variants count as
    * observed 0 (they still contribute their expected mass); the
    * CONVERSE — an observed assignment bucket with no expected
    * weight, itself a classic SRM cause — raises loudly (full-outer
    * join + raise_error) rather than silently dropping the bucket
    * from n and chi2, which would let the guardrail report a clean
    * split on a broken experiment.
    *
    * Shape: one variant hash agg (cardinality-sized) + a broadcast
    * 1-row total; the expected weights ride a literal array join.
    */
  def sampleRatioMismatch(df: DataFrame, variant: Column,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive, got $weights")
    val s = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val w = spark.createDataset(weights).toDF("__v", "__w")
    val obs = df.select(variant.cast("string").as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__o"))
    val cells = w.join(obs, Seq("__v"), "full")
      .select(col("__v"),
        when(col("__w").isNotNull, col("__w")).otherwise(raise_error(concat(
          lit("sampleRatioMismatch: observed variant has no expected weight: "),
          coalesce(col("__v"), lit("NULL"))))).as("__w"),
        coalesce(col("__o"), lit(0L)).as("__o"))
    val tot = cells.agg(sum("__o").as("__n"))
    val dec = "decimal(38,0)"
    cells.crossJoin(broadcast(tot))
      .select(col("__v"), col("__o"), col("__w"), col("__n"), {
        val num = (col("__o").cast(dec) * s - col("__n").cast(dec) * col("__w"))
        val num2 = num * num * 1000L
        val den = col("__n").cast(dec) * col("__w") * s
        when(den === 0, lit(0L))
          .otherwise(((num2 - num2 % den) / den).cast("long")).as("__t")
      })
      .agg(max("__n").as("n"), count(lit(1)).as("n_cells"),
        sum("__t").as("chi2_milli"))
      .select(col("n"), col("n_cells"),
        (col("n_cells") - 1).as("df"), col("chi2_milli"))
  }

  /** CUPED variance reduction (Deng et al., WSDM'13) — adjust each
    * variant's metric mean by the pooled pre-period covariate:
    * {{{ θ = cov(x,y)/var(x),   ŷ_v = μy_v − θ·(μx_v − μx) }}}
    * computed ENTIRELY in exact integer arithmetic: θ in ppm from the
    * 5-sum decimal(38,0) identities (n·Σxy − ΣxΣy over n·Σxx − Σx²,
    * truncating division), means in milli units, the adjustment as
    * `θ_ppm·Δx_milli div 10⁶`. Every division truncates toward zero
    * in a fixed order, so the output hashes identically on any
    * engine. Output: one row per variant with raw and adjusted
    * means plus the pooled theta.
    *
    * Shape: one variant hash agg carrying 5 sums + a broadcast 1-row
    * pooled fold — two passes of nothing; the corpus is scanned once.
    */
  def cuped(df: DataFrame, variant: Column, metric: Column,
      covariate: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val v = df.select(variant.cast("string").as("variant"),
      metric.cast("long").as("__y"), covariate.cast("long").as("__x"))
    val per = v.groupBy("variant").agg(count(lit(1)).as("__nv"),
      sum("__y").as("__syv"), sum("__x").as("__sxv"))
    val pooled = v.agg(count(lit(1)).cast(dec).as("__n"),
      sum(col("__x")).cast(dec).as("__sx"), sum(col("__y")).cast(dec).as("__sy"),
      sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
      sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"))
    def tdiv(num: Column, den: Column): Column = (num - num % den) / den
    val covn = col("__n") * col("__sxy") - col("__sx") * col("__sy")
    val varn = col("__n") * col("__sxx") - col("__sx") * col("__sx")
    val withTheta = pooled.select(
      when(varn === 0, lit(0L))
        .otherwise(tdiv(covn * 1000000L, varn).cast("long")).as("theta_ppm"),
      tdiv(col("__sx") * 1000L, col("__n")).cast("long").as("__mx_milli"))
    per.crossJoin(broadcast(withTheta))
      .select(col("variant"), col("__nv").as("n"), {
        val my = expr("(__syv * 1000) div __nv")
        my.as("mean_y_milli")
      }, col("theta_ppm"), {
        val my = expr("(__syv * 1000) div __nv")
        val mxv = expr("(__sxv * 1000) div __nv")
        (my - expr(s"(theta_ppm * ((__sxv * 1000) div __nv - __mx_milli)) div 1000000"))
          .as("adj_mean_y_milli")
      })
  }

  /** Linear-weighted Cohen's kappa — ordinal agreement where a
    * near-miss (4 vs 5) costs less than a gross miss (1 vs 5): with
    * distance d(a,b) = |a−b| over integer categories,
    * {{{ κ_w = 1 − Σ o_ab·d(a,b) / (Σ r_a·c_b·d(a,b) / n) }}}
    * in exact ppm via decimal(38,0): `(den − n·Σo·d)·10⁶ div den`,
    * den = Σ r_a·c_b·d. The ordinal upgrade of [[cohenKappa]] (which
    * this reduces to under 0/1 distance). Null when den = 0 (all mass
    * in one cell pair).
    *
    * Shape: one (a,b) cell agg, marginals FROM the cells, a
    * cells×cells distance fold — all label-cardinality-sized.
    */
  def weightedKappa(df: DataFrame, labelA: Column, labelB: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = df.select(labelA.cast("long").as("__a"),
        labelB.cast("long").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // three cardinality-sized consumers
    val ra = cells.groupBy(col("__a").as("__c")).agg(sum("__n").as("__ra"))
    val cb = cells.groupBy(col("__b").as("__c2")).agg(sum("__n").as("__cb"))
    val den = ra.crossJoin(cb)
      .agg(sum(col("__ra").cast(dec) * col("__cb").cast(dec) *
        abs(col("__c") - col("__c2")).cast(dec)).as("__e"))
    val obs = cells.agg(sum("__n").cast(dec).as("__t"),
      sum(col("__n").cast(dec) * abs(col("__a") - col("__b")).cast(dec))
        .as("__d"))
    val num = (col("__e") - col("__t") * col("__d")) * lit(1000000L).cast(dec)
    obs.join(broadcast(den))
      .select(col("__t").cast("long").as("n"),
        col("__d").cast("long").as("sum_dist"),
        when(col("__e") === 0, lit(null).cast("long"))
          .otherwise(((num - num % col("__e")) / col("__e")).cast("long"))
          .as("kappa_w_ppm"))
  }

  /** Information-gain feature ranking: [[mutualInfo]] of every
    * candidate feature against the label (IG(F;Y) ≡ MI(F;Y) — same
    * floor-primitive decomposition, same micro-nats·n units), in ONE
    * corpus scan: the features stack via `explode(map(...))` into
    * (feature, value, label) rows, so one hash agg builds every
    * feature's cell table simultaneously — F features never cost F
    * scans. One row per feature; rank by `mi_unat` desc to pick
    * predictors / catch label leakage (a feature with mi_unat ≈
    * n·H(Y)·10⁶ IS the label).
    */
  def infoGain(df: DataFrame, label: Column,
      features: Seq[(String, Column)]): DataFrame = {
    require(features.nonEmpty, "infoGain needs at least one feature")
    def clogc(c: Column): Column =
      floor(log(c.cast("double")) * c * 1e6).cast("long")
    val kv = map(features.flatMap { case (n, c) =>
      Seq(lit(n), c.cast("string")) }: _*)
    // eager checkpoint: three consumers (fold + two marginal chains)
    // would each re-execute the corpus-sized stacked agg otherwise.
    val cells = df.select(explode(kv).as(Seq("feature", "__v")),
        label.cast("string").as("__y"))
      .groupBy("feature", "__v", "__y").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val cs = cells.groupBy("feature").agg(sum(clogc(col("__c"))).as("__hc"),
      count(lit(1)).as("n_cells"), sum("__c").as("n"))
    val va = cells.groupBy("feature", "__v").agg(sum("__c").as("__cv"))
      .groupBy("feature").agg(sum(clogc(col("__cv"))).as("__ha"))
    val ya = cells.groupBy("feature", "__y").agg(sum("__c").as("__cy"))
      .groupBy("feature").agg(sum(clogc(col("__cy"))).as("__hb"))
    cs.join(broadcast(va), Seq("feature")).join(broadcast(ya), Seq("feature"))
      .select(col("feature"), col("n"), col("n_cells"),
        (col("__hc") + clogc(col("n")) - col("__ha") - col("__hb"))
          .as("mi_unat"))
  }
}
