package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Temporal / skew-aware join operators.
  *
  * Spark has no native as-of join (reference engines and DuckDB ship
  * one as a primitive; DuckDB's `ASOF JOIN` is the oracle for ours),
  * and a naive range join plans as a per-key cross product. Both are
  * expressed here as compositions of shuffles Spark already optimizes:
  * the as-of join is ONE union + ONE window per key (no join at all),
  * the range join is an equi-join on a derived bin key.
  */
object Joins {

  /** Backward as-of join: for each left row, attach the right row with
    * the LARGEST `rightTime <= leftTime` within the same key (ties on
    * time include the right row; `forward = true` flips to the
    * SMALLEST `rightTime >= leftTime`). Left rows with no such right
    * row keep null payload columns — i.e. `ASOF LEFT JOIN` semantics,
    * with null keys/times never matching (SQL comparison semantics).
    *
    * Contract: the right side must be UNIQUE per (key, time) — with
    * duplicates the carried row is nondeterministic; pre-aggregate
    * (e.g. `max_by`) first. Left and right time columns must be the
    * same type.
    *
    * Plan shape — the scale rationale: both sides are unioned with a
    * side tag, hash-partitioned ONCE by key, and sorted ONCE by
    * (time, side) inside each partition; the match is a running
    * `last(payload-struct, ignoreNulls)` carry-forward. That is
    * strictly cheaper than any join-based encoding (no pair blow-up,
    * no secondary shuffle) and is the same O(n log n) per key a native
    * engine pays. The payload travels as ONE struct so a legitimately
    * null payload FIELD can never mix values across right rows (per-
    * column `last(ignoreNulls)` would). Hot keys skew the single
    * window sort — salt the key upstream or pre-filter if one key
    * dominates.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      forward: Boolean = false,
      matchedTimeCol: Option[String] = None): DataFrame = {
    val leftKeys = keys.map(_._1)
    val rightKeyNames = keys.map(_._2).toSet
    val payload = right.columns.filterNot(c => rightKeyNames.contains(c) || c == rightTime)

    val leftPacked = left.select(
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l") +:
        (leftKeys.map(col) :+ col(leftTime).as("__t") :+ lit(1).as("__side")): _*)
    // Right rows with a null key or null time can never match (SQL
    // comparison semantics) — drop them before the union so they don't
    // pollute the null-key partition that unmatched left rows fall in.
    val rightPacked = right
      .filter(keys.map { case (_, r) => col(r).isNotNull }
        .foldLeft(col(rightTime).isNotNull)(_ && _))
      .select(
        struct((payload.map(col) :+ col(rightTime).as("__rt")).toIndexedSeq: _*).as("__r") +:
          (keys.map { case (l, r) => col(r).as(l) } :+
            col(rightTime).as("__t") :+ lit(0).as("__side")): _*)

    val lType = leftPacked.schema("__l").dataType.asInstanceOf[StructType]
    val rType = rightPacked.schema("__r").dataType.asInstanceOf[StructType]
    val cols = leftKeys :+ "__t" :+ "__side"
    val unioned =
      leftPacked.select((cols.map(col) :+ col("__l") :+ lit(null).cast(rType).as("__r")): _*)
        .unionByName(rightPacked.select(
          (cols.map(col) :+ lit(null).cast(lType).as("__l") :+ col("__r")): _*))

    // Right rows (side 0) sort BEFORE left rows at equal time, so a
    // tie on time is visible to the left row — matching ASOF `>=`.
    // Null-time LEFT rows must sort before every right row in both
    // directions (asc puts nulls first already; desc needs
    // desc_nulls_first) or the running carry-forward would hand them a
    // fabricated match instead of the contractual no-match.
    val order = if (forward) Seq(col("__t").desc_nulls_first, col("__side").asc)
                else Seq(col("__t").asc_nulls_first, col("__side").asc)
    val w = Window.partitionBy(leftKeys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      col("__l.*") +:
        (payload.toSeq.map(p => col(s"__m.$p").as(p)) ++
          matchedTimeCol.map(n => col("__m.__rt").as(n)).toSeq): _*)
  }

  /** Banded range join: all pairs with equal keys and
    * `|leftTime − rightTime| <= band`, for NUMERIC time columns (for
    * timestamps, pass e.g. epoch micros and a band in micros).
    *
    * Plan shape: each side gets a bin id `floor(t / band)`; the left
    * side explodes to its bin ± 1 (3 rows), then an EQUI-join on
    * (keys, bin) + the exact band predicate. Any right row within the
    * band lies in exactly one of the left row's three bins, so the
    * join is complete and duplicate-free with no `distinct`. This
    * turns what Catalyst would otherwise plan as a per-key cross
    * product into a shuffled hash join with 3× left fan-out — the
    * standard binned interval-join trick (cf. interval joins in
    * streaming engines).
    *
    * Column names must already be disjoint across the two sides apart
    * from the key/time roles (use [[graft.linkage.Suffix]]).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      band: Long): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    // Floor division in exact integer arithmetic (long `/` truncates
    // toward zero — wrong for negative times; pmod is always >= 0).
    // Column `/` is DOUBLE division, which rounds for |t/band| beyond
    // 2^53 (epoch-nanos with a small band) and would drop in-band
    // pairs; the numerator is an exact multiple of band, so decimal
    // division is exact and the long cast lossless.
    def floorDiv(t: Column): Column =
      ((t - pmod(t, lit(band))).cast("decimal(38,0)") / lit(band)).cast("long")

    val l = left
      .withColumn("__bin", explode(array(
        floorDiv(col(leftTime)) - 1, floorDiv(col(leftTime)), floorDiv(col(leftTime)) + 1)))
    val r = right.withColumn("__bin", floorDiv(col(rightTime)))
    val joinCond = keys
      .map { case (lk, rk) => l(lk) === r(rk) }
      .reduce(_ && _) && l("__bin") === r("__bin") &&
      abs(l(leftTime) - r(rightTime)) <= band
    l.join(r, joinCond).drop("__bin")
  }

  /** Salted equi-join for EXTREME key skew: when one key's rows exceed
    * what AQE skew-split can rebalance (AQE splits at map-output-block
    * granularity — see docs/SKEW_EVIDENCE_r03.md), spread the big
    * side's hot keys over `salts` sub-partitions and replicate the
    * small side to every sub-partition. Semantics-identical to
    * `big.join(small, keys, joinType)` for row-preserving join types
    * (inner / left with big on the left).
    *
    * `saltSrc` is any big-side column that varies within a key (an id
    * column is ideal); the salt is `pmod(xxhash64(saltSrc), salts)` —
    * deterministic, so plans and tests are reproducible. Cost: the
    * small side is scanned/shuffled `salts`× — keep `salts` at the
    * executor-count scale, not higher.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSrc: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val b = big.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0).cast("long"), lit(salts - 1).cast("long"))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Interval OVERLAP join: pairs where `[lStart,lEnd]` and
    * `[rStart,rEnd]` intersect (closed intervals, exact predicate
    * `lStart <= rEnd && rStart <= lEnd`), equi-keyed like
    * [[bandJoin]]. Spark would plan the raw theta-join as a per-key
    * cross product; here BOTH sides explode to the `binSize`-wide
    * bins their interval covers, equi-join on (keys, bin), and a
    * `min(bin)`-style dedup is avoided by only keeping the pair in
    * the FIRST bin both intervals share (`greatest(floor(lStart),
    * floor(rStart))` == the joined bin) — complete and
    * duplicate-free with no `distinct` shuffle.
    *
    * Pick `binSize` near the typical interval length: fan-out per row
    * is `len/binSize + 1` while per-bin population stays small. Exact
    * integer bin math (same decimal floor-div as [[bandJoin]], stable
    * past 2^53). Column names must already be disjoint across sides.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    def floorDiv(t: Column): Column =
      ((t - pmod(t, lit(binSize))).cast("decimal(38,0)") / lit(binSize)).cast("long")
    def bins(s: String, e: String): Column =
      sequence(floorDiv(col(s)), floorDiv(col(e)))
    val l = left.withColumn("__bin", explode(bins(lStart, lEnd)))
    val r = right.withColumn("__bin", explode(bins(rStart, rEnd)))
    val joinCond = keys.map { case (lk, rk) => l(lk) === r(rk) }
      .foldLeft(l("__bin") === r("__bin"))(_ && _) &&
      l(lStart) <= r(rEnd) && r(rStart) <= l(lEnd) &&
      // keep the pair only in the FIRST shared bin: both intervals
      // cover it, and every other shared bin is larger — exactly-once
      // without a distinct.
      l("__bin") === greatest(floorDiv(l(lStart)), floorDiv(r(rStart)))
    l.join(r, joinCond).drop("__bin")
  }

  /** Bloom-filter pre-filtered left-semi join: membership of `left`
    * rows in `right`'s key set, for a right side too large to
    * broadcast EXACTLY but whose Bloom filter fits on every executor
    * (1% fpp ≈ 1.2 bytes/key — 100 M keys ≈ 120 MB; an exact
    * broadcast of the same keys is ~10× that plus hash overhead).
    *
    * Result is IDENTICAL to `left SEMI JOIN right` — the Bloom pass
    * only pre-drops left rows that cannot match (no false negatives),
    * and the exact semi join afterwards removes the fpp-bounded false
    * positives. What the filter buys at scale: the big probe side is
    * cut to ~|matches| BEFORE its shuffle, so the exchange moves the
    * surviving fraction instead of the full table — the same
    * runtime-filter idea as Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter.enabled` (which only
    * fires on selective non-semi shapes), made explicit and
    * deterministic here.
    *
    * The filter is built with `DataFrameStatFunctions.bloomFilter` (a
    * treeAggregate over the right side — one pass, driver merge) and
    * broadcast once. Integral keys probe via the typed
    * `mightContainLong` path (no boxing in the per-row probe); string
    * keys via `mightContainString` — the same byte encoding
    * `stat.bloomFilter` inserts, so no false negatives either way.
    * Other key types are rejected up front: a silent wrong-typed
    * probe would drop every row. `expectedItems` sizes the filter —
    * overestimate freely (memory is linear in it; recall is
    * unaffected).
    */
  def bloomSemiJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
    val integral: Set[org.apache.spark.sql.types.DataType] =
      Set(ByteType, ShortType, IntegerType, LongType)
    val lType = left.schema(leftKey).dataType
    val rType = right.schema(rightKey).dataType
    require((integral(lType) && integral(rType)) || (lType == StringType && rType == StringType),
      s"bloomSemiJoin needs both keys integral or both string, got $lType / $rType")
    val bf = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    // Codegen probe (graft.expr.BloomMightContain): the filter ships
    // as a plan reference object (task binary is broadcast once per
    // stage — the same once-per-executor distribution the explicit
    // sc.broadcast gave the old per-row Scala UDF, without breaking
    // whole-stage codegen on the probe side).
    import org.apache.spark.sql.graftbridge.Bridge
    val keyExpr =
      if (integral(lType)) Bridge.expression(col(leftKey).cast("long"))
      else Bridge.expression(col(leftKey))
    val probe = Bridge.column(graft.expr.BloomMightContain(keyExpr, bf))
    left.filter(probe)
      .join(right, col(leftKey) === col(rightKey), "left_semi")
  }

  /** Point-in-range LOOKUP join: each `points` row matches every
    * `ranges` row whose closed interval `[startCol, endCol]` contains
    * `valueCol` (optionally under equi-`keys`) — the enrichment shape
    * behind CIDR→geo, price→bracket, and time→validity-window lookups.
    *
    * Why not [[overlapJoin]] with zero-length left intervals: the
    * asymmetry IS the scale story. Only the RANGES side explodes to
    * the `binSize`-wide bins its interval covers; the big point side
    * maps each row to exactly ONE bin — no fan-out on the 100 TB
    * side, and because a point lives in a single bin, every matching
    * (point, range) pair meets in exactly one bin: complete and
    * duplicate-free with no `distinct` and no first-shared-bin
    * bookkeeping. Bin ids use the [[bandJoin]] decimal floor-div (no
    * double rounding past 2^53). Pick `binSize` near the typical
    * range length: range fan-out is `len/binSize + 1` while bin
    * population stays balanced. Column names must already be disjoint
    * across the two sides.
    */
  def rangeLookupJoin(
      points: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      startCol: String,
      endCol: String,
      binSize: Long,
      keys: Seq[(String, String)] = Nil): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    def floorDiv(t: Column): Column =
      ((t - pmod(t, lit(binSize))).cast("decimal(38,0)") / lit(binSize)).cast("long")
    val p = points.withColumn("__bin", floorDiv(col(valueCol)))
    val r = ranges.withColumn("__bin",
      explode(sequence(floorDiv(col(startCol)), floorDiv(col(endCol)))))
    val joinCond = keys.map { case (pk, rk) => p(pk) === r(rk) }
      .foldLeft(p("__bin") === r("__bin"))(_ && _) &&
      p(valueCol) >= r(startCol) && p(valueCol) <= r(endCol)
    p.join(r, joinCond).drop("__bin")
  }

  /** WATERFALL enrichment join — match on the strongest key first,
    * fall back level by level: the identity-resolution shape ("join on
    * tax id; else on normalized email; else on phone") every CRM/KYC
    * enrichment runs. `levels` maps (left key, right key) in priority
    * order; each left row takes the FIRST level with a right match and
    * reports it in `matched_level` (1-based; NULL when nothing
    * matched — rows pass through, never dropped).
    *
    * Right payload is everything but the key columns; a right key
    * duplicated within a level would fan the row out, so key
    * uniqueness per level is REQUIRED and enforced with a loud
    * one-pass check (the silent alternative double-counts downstream
    * aggregates — the classic enrichment bug).
    *
    * Shape: one equi-join per level, each keyed on its own column —
    * but only UNMATCHED rows from level i reach level i+1, so the join
    * input shrinks monotonically (at 100 TB the first level typically
    * resolves the bulk). NULL left keys skip a level by SQL equality
    * semantics, which is exactly the fallback behavior wanted.
    */
  def waterfallJoin(
      left: DataFrame,
      right: DataFrame,
      levels: Seq[(String, String)]): DataFrame = {
    require(levels.nonEmpty, "waterfallJoin needs at least one key level")
    val rightKeyNames = levels.map(_._2).distinct
    val payload = right.columns.filterNot(rightKeyNames.contains)
    require(payload.nonEmpty, "right side needs at least one payload column")
    val clash = left.columns.toSet.intersect(payload.toSet)
    require(clash.isEmpty,
      s"waterfallJoin: right payload column(s) ${clash.mkString(", ")} already exist on the left — " +
        "rename the payload upstream (the per-level join would emit ambiguous duplicate names)")
    for ((_, rk) <- levels) {
      val dup = right.filter(col(rk).isNotNull)
        .groupBy(rk).agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      require(dup.isEmpty,
        s"waterfallJoin: right key '$rk' is not unique — a duplicate would fan out left rows")
    }
    var pending = left
    var resolved: DataFrame = null
    for (((lk, rk), i) <- levels.zipWithIndex) {
      val r = right.filter(col(rk).isNotNull)
        .select(col(rk).as("__rk") +: payload.map(col): _*)
      val joined = pending.join(r, pending(lk) === col("__rk"), "left")
      val hit = joined.filter(col("__rk").isNotNull)
        .drop("__rk").withColumn("matched_level", lit(i + 1))
      resolved = if (resolved == null) hit else resolved.unionByName(hit)
      pending = joined.filter(col("__rk").isNull)
        .select(pending.columns.map(pending(_)): _*)
    }
    val unmatched = pending
      .select(pending.columns.map(col) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast("int").as("matched_level"): _*)
    resolved.unionByName(unmatched)
  }
}
