package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed window operators: gap-based sessionization and per-group
  * top-k. Both partition every window by a key whose cardinality grows
  * with the data (users, groups), so no stage ever concentrates on a
  * single partition — the 100 TB failure mode of unpartitioned windows
  * (cf. the `row_number()` note in SURVEY.md §2.5 W1).
  */
object Windows {

  /** A global ordered window that is single-partition ON PURPOSE —
    * the greppable marker for inputs already reduced to driver scale
    * (an aggregated band table, a quantile grid, a reference-parity
    * demo path). Every intentional global-window site in this repo
    * goes through here; a bare `Window.orderBy` elsewhere is a bug.
    *
    * WindowExec's "No Partition Defined" WARN still fires at these
    * sites and is EXPECTED there: Spark 4's `EliminateWindowPartitions`
    * optimizer rule folds any constant partition spec away (and
    * `FoldablePropagation` inlines constant-aliased attributes), so a
    * `partitionBy(lit(0))` disguise is rewritten back to the
    * unpartitioned form before physical planning — there is no
    * plan-level way to keep the semantics and skip the warning, and
    * muting the logger JVM-wide would hide UNintentional sites (the
    * round-9 ADVICE item). Never use this on data that grows with
    * the corpus — that's what [[denseIds]]/[[orderedPrefixSum]] are
    * for.
    */
  def pinnedOrderBy(order: Column*): org.apache.spark.sql.expressions.WindowSpec =
    Window.orderBy(order: _*)

  /** Gap-based sessionization: assign each row a per-key `session_id`
    * (1-based, in time order) that increments whenever the gap from
    * the previous row of the same key exceeds `maxGap` (same time
    * unit as `timeCol` — the callers here use integral epoch micros,
    * which mirrors exactly into any engine with no timestamp
    * semantics in play).
    *
    * Shape: one shuffle by key, two window passes over the same
    * partitioning (lag, then running sum — Catalyst reuses the single
    * sort+exchange). Rows with equal times within a key order
    * arbitrarily, but the gap between them is 0 regardless of order,
    * so session assignment is deterministic either way.
    *
    * For unbounded streams use Structured Streaming's
    * `session_window(timestamp, gap)` instead — this is the batch
    * shape (and the cross-engine-mirrorable one: integer lag/cumsum).
    */
  def sessionize(df: DataFrame, keys: Seq[String], timeCol: String, maxGap: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    require(maxGap > 0, s"maxGap must be positive, got $maxGap")
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val prev = lag(col(timeCol), 1).over(byKey)
    // First row of a key (lag null) and any gap > maxGap start a session.
    val starts = when(prev.isNull || col(timeCol) - prev > maxGap, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(starts).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: one row per (keys, session_id) with event
    * count and the session's time span. The downstream shape most
    * pipelines want (and driver-sized enough to inspect).
    */
  def sessionSummary(df: DataFrame, keys: Seq[String], timeCol: String, maxGap: Long): DataFrame =
    sessionize(df, keys, timeCol, maxGap)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(timeCol)).as("t_start"),
        max(col(timeCol)).as("t_end"))

  /** Sequence packing (concat-and-chunk): documents are concatenated
    * in (`shardCol`, `idCol`) order and sliced into fixed
    * `budget`-token training sequences; each document is labeled with
    * the `chunk` its first token lands in and its `chunk_offset`
    * within that chunk. This is the GPT-style packing layout — the
    * assignment is what a trainer needs to build sequences, and it is
    * fully deterministic given the ordering.
    *
    * Packing is PER SHARD (language, source, date — any key whose
    * cardinality grows with the corpus): one shuffle on the shard,
    * one in-partition sort, one running sum. A global (unsharded)
    * pack would serialize the corpus through a single partition —
    * the same reason the reference's row_number shapes are keyed
    * here (SURVEY.md §2.5 W1). Chunk ids are computed with EXACT
    * integral arithmetic (pmod/decimal division, not double `/`),
    * so they are stable beyond 2^53 cumulative tokens.
    */
  def packChunks(
      df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
    val start = (sum(col(tokensCol).cast("long")).over(w) -
      col(tokensCol).cast("long")).as("__start") // tokens before this doc
    // Same exact floor-div shape as Joins.bandJoin: the numerator is an
    // exact multiple of budget, decimal division is exact, and the long
    // cast is lossless — Column `/` on longs is DOUBLE division, which
    // rounds past 2^53 cumulative tokens and can put a chunk id off by
    // one for non-power-of-two budgets.
    df.select(col(shardCol), col(idCol), col(tokensCol), start)
      .select(col(shardCol), col(idCol), col(tokensCol),
        ((col("__start") - pmod(col("__start"), lit(budget))).cast("decimal(38,0)") /
          lit(budget)).cast("long").as("chunk"),
        pmod(col("__start"), lit(budget)).as("chunk_offset"))
  }

  /** Ordered event funnel: how many users complete each prefix of
    * `stages` IN ORDER (stage k counts users with a stage-k event
    * strictly after their earliest stage-(k−1) completion time —
    * the standard product-analytics conversion funnel). Returns one
    * row per stage: `(stage, stage_idx, n_users)`.
    *
    * Shape: one filtered groupBy(min) per stage plus a per-user
    * equi-join against the previous stage's completion times — every
    * shuffle is keyed by the user, so the plan is a chain of
    * same-key hash joins/aggs that scales with users × stages, never
    * a window over the whole event stream. The K single-row counts
    * union into ONE plan (one action).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val completions: Seq[DataFrame] = stages.zipWithIndex
      .foldLeft(Vector.empty[DataFrame]) { case (acc, (stage, i)) =>
        val events = df.filter(col(typeCol) === stage)
          .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        val stageTimes =
          if (i == 0)
            events.groupBy("__u").agg(min(col("__ts")).as("__t"))
          else {
            val prev = acc.last.select(col("__u"), col("__t").as("__tprev"))
            events.join(prev, Seq("__u"))
              .filter(col("__ts") > col("__tprev"))
              .groupBy("__u").agg(min(col("__ts")).as("__t"))
          }
        acc :+ stageTimes
      }
    completions.zip(stages.zipWithIndex).map { case (c, (stage, i)) =>
      c.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), lit(i).as("stage_idx"), col("n_users"))
    }.reduce(_.unionAll(_))
  }

  /** Top-k rows per group by `order` (desc), ties broken by the
    * caller's `tiebreak` columns so results are deterministic.
    * `row_number` over a keyed window: partial top-k runs map-side
    * inside the window sort's local phase; no global sort.
    */
  def groupedTopK(df: DataFrame, groupCols: Seq[String], order: Column,
      tiebreak: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(order.desc +: tiebreak.map(_.asc): _*)
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Dense 1-based global row ids in `orderCol` order WITHOUT the
    * single-partition window (the q_synthetic_id shape is legitimate
    * only for driver-sized inputs; an unpartitioned `row_number` over
    * a corpus moves everything to one task). Standard two-phase
    * assignment: range-repartition on the order key, number rows
    * WITHIN each partition (partition-local window — sorts run in
    * parallel), then add each partition's starting offset (one
    * driver-sized count-per-partition action, ≤ #partitions rows).
    *
    * `orderCol` must be UNIQUE — ids are then a pure function of the
    * data (equal to `row_number() OVER (ORDER BY orderCol)`), no
    * matter how ranges were sampled or the input was laid out.
    */
  def denseIds(df: DataFrame, orderCol: String, idName: String = "row_id",
      numPartitions: Int = 0): DataFrame =
    denseIdsBy(df, Seq(col(orderCol).asc), idName, numPartitions)

  /** [[denseIds]] over a COMPOSITE sort order (direction-carrying sort
    * expressions, e.g. `Seq(col("cnt").desc, col("tok").asc)`) — the
    * vocabulary-builder shape: contiguous ids by descending frequency.
    * The combination must be unique.
    */
  def denseIdsBy(df: DataFrame, orderExprs: Seq[Column], idName: String = "row_id",
      numPartitions: Int = 0): DataFrame = {
    require(orderExprs.nonEmpty, "denseIdsBy needs at least one order expression")
    require(!df.columns.contains(idName), s"column $idName already exists")
    Seq("__pid", "__local", "__off").foreach(c =>
      require(!df.columns.contains(c), s"column $c is reserved by denseIdsBy"))
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, orderExprs: _*)
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint(true) // pin range boundaries: the count pass and
                             // the numbering pass must see ONE partitioning
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = (pid, acc); acc += c; o }
    // Offsets attach via a BROADCAST join of the tiny (pid → offset)
    // table — O(1) hash probe per row. (A `when`-chain literal would be
    // O(#partitions) branches per row and splinters codegen at a real
    // cluster's thousands of range partitions.)
    val offsetsDf = broadcast(
      df.sparkSession.createDataFrame(offsets.toSeq).toDF("__pid", "__off"))
    val w = Window.partitionBy("__pid").orderBy(orderExprs: _*)
    ranged.withColumn("__local", row_number().over(w).cast("long"))
      .join(offsetsDf, "__pid")
      .withColumn(idName, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** [[denseIdsBy]] plus a GLOBAL running sum of `valueCol` in the
    * same order, both via ONE range exchange — the distributed form of
    * `row_number() OVER (ORDER BY …)` + `sum(v) OVER (ORDER BY …
    * ROWS UNBOUNDED PRECEDING)` without the single-task global window
    * (the W1 discipline). Per partition the driver folds (count, sum)
    * into starting offsets (≤ #partitions rows collected), then a
    * partition-LOCAL window numbers rows and prefix-sums values; the
    * offsets make both global. `orderExprs` must be a total order.
    */
  def orderedPrefixSum(df: DataFrame, orderExprs: Seq[Column], valueCol: String,
      rankName: String = "row_id", cumName: String = "cum_value",
      numPartitions: Int = 0): DataFrame = {
    require(orderExprs.nonEmpty, "orderedPrefixSum needs at least one order expression")
    require(!df.columns.contains(rankName), s"column $rankName already exists")
    require(!df.columns.contains(cumName), s"column $cumName already exists")
    Seq("__pid", "__localn", "__locals", "__localnn", "__offn", "__offs", "__offnn")
      .foreach(c => require(!df.columns.contains(c),
        s"column $c is reserved by orderedPrefixSum"))
    // The prefix-sum offsets are folded on the driver as Longs, so the
    // value column must be integral (long-exact); a double/decimal
    // column would need different accumulator plumbing — fail loudly
    // rather than ClassCastException deep in the collect.
    val valueType = df.schema(valueCol).dataType
    val integral = valueType match { // IntegralType itself is private[sql]
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"orderedPrefixSum: value column '$valueCol' must be an integral type " +
        s"(byte/short/int/long), got ${valueType.simpleString}. Scale floats " +
        "to integer units (the entropy-primitive idiom) before prefix-summing.")
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, orderExprs: _*)
      .withColumn("__pid", org.apache.spark.sql.functions.spark_partition_id())
      .localCheckpoint(true) // pin range boundaries across the two passes
    // coalesce: a partition whose values are all NULL sums to NULL —
    // contribute 0 to downstream offsets instead of an opaque NPE. The
    // per-partition NON-NULL count (`count(valueCol)`) is carried too,
    // so cumName can reproduce the exact semantics of a global
    // `sum(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`: NULL while
    // the global frame has seen no non-NULL value yet, the running sum
    // over non-NULLs thereafter.
    val stats = ranged.groupBy("__pid")
      .agg(count(lit(1)).as("__c"),
        coalesce(sum(col(valueCol).cast("long")), lit(0L)).as("__s"),
        count(col(valueCol)).as("__nn"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var accN = 0L
    var accS = 0L
    var accNN = 0L
    val offsets = stats.map { case (pid, c, s, nn) =>
      val o = (pid, accN, accS, accNN); accN += c; accS += s; accNN += nn; o
    }
    // Broadcast (pid → offsets) join, not a per-row `when`-chain — see
    // [[denseIdsBy]]; same rationale, three offset columns here.
    val offsetsDf = broadcast(df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__offn", "__offs", "__offnn"))
    val w = Window.partitionBy("__pid").orderBy(orderExprs: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__localn", row_number().over(w).cast("long"))
      .withColumn("__locals", sum(col(valueCol)).over(run))
      .withColumn("__localnn", count(col(valueCol)).over(run))
      .join(offsetsDf, "__pid")
      .withColumn(rankName, col("__localn") + col("__offn"))
      .withColumn(cumName,
        when(col("__localnn") + col("__offnn") === 0L, lit(null).cast("long"))
          .otherwise(coalesce(col("__locals").cast("long"), lit(0L)) + col("__offs")))
      .drop("__pid", "__localn", "__locals", "__localnn", "__offn", "__offs", "__offnn")
  }

  /** SCD2 history from a change log: each (key, change-time, attrs)
    * row becomes a VERSION valid over `[valid_from, valid_to)`,
    * `valid_to` NULL for the open current version — the
    * slowly-changing-dimension build that [[graft.ops.Joins.asofJoin]]
    * then queries point-in-time. `tsCol` must be unique per key (pass
    * a tie-broken ordering column if change times can collide).
    * One keyed window (lead), partitioned on the key — no global sort.
    */
  def scdHistory(df: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scdHistory needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol).asc)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Resample an irregular per-key time series onto a regular
    * `step`-spaced grid with LOCF (last observation carried forward):
    * for every grid instant `t` (multiples of `step` inside the key's
    * observed span) emit the value of the LATEST observation at or
    * before `t` — the gap-filling step before any fixed-cadence
    * model/feature join.
    *
    * Determinism: multiple observations at one (key, ts) collapse
    * first via `max_by(value, tieCol)`, so the carried value never
    * depends on row order. Times must be non-negative integral epochs
    * (grid ids use the exact decimal floor/ceil-div — no double
    * rounding past 2^53).
    *
    * Plan shape — the scale story: NO join and NO per-pair blow-up.
    * One hash agg per key computes the span, grid instants explode
    * map-side from `sequence()`, grid rows union with observations,
    * and ONE keyed window (ordered by time with observations sorting
    * before the grid instant they tie with) runs a
    * `last(value, ignoreNulls)` carry-forward — the [[graft.ops.Joins.asofJoin]]
    * union+window encoding, reused so the grid side never shuffles
    * against the observation side. All three exchanges hash on the
    * same key. Output rows are bounded by keys × span/step, never by
    * observation pairs. Hot keys with giant spans fan out the
    * sequence explode — cap `step` accordingly.
    */
  def resampleLocf(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieCol: String, step: Long): DataFrame = {
    require(keys.nonEmpty, "resampleLocf needs at least one key column")
    require(step > 0, s"step must be positive, got $step")
    val k = keys.map(col)
    def floorDiv(t: Column): Column =
      ((t - pmod(t, lit(step))).cast("decimal(38,0)") / lit(step)).cast("long")
    // unique per (key, ts): deterministic value under ties
    val obs = df.filter(col(valCol).isNotNull)
      .groupBy(k :+ col(tsCol).as("__t"): _*)
      .agg(max_by(col(valCol), col(tieCol)).as("__v"))
    val grid = obs.groupBy(k: _*)
      .agg(min("__t").as("__lo"), max("__t").as("__hi"))
      // sequence(a, b) runs DESCENDING when a > b — a span holding no
      // grid instant must yield zero rows, not phantom ones
      .withColumn("__ga", floorDiv(col("__lo") + lit(step) - 1))
      .withColumn("__gb", floorDiv(col("__hi")))
      .filter(col("__ga") <= col("__gb"))
      .withColumn("__g", explode(sequence(col("__ga"), col("__gb"))))
      .select(k :+ (col("__g") * step).as("__t") :+
        lit(null).cast(obs.schema("__v").dataType).as("__v") :+ lit(0).as("__is_obs"): _*)
    val unioned = obs.withColumn("__is_obs", lit(1)).unionByName(grid)
    // at equal time the observation sorts FIRST so the grid row carries it
    val w = Window.partitionBy(k: _*)
      .orderBy(col("__t").asc, col("__is_obs").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__locf", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_obs") === 0)
      .select(k :+ col("__t").as("sample_ts") :+ col("__locf").as(valCol): _*)
  }

  /** Linear-interpolation resampling — the between-neighbors upgrade
    * of [[resampleLocf]] for continuous signals (prices, gauges,
    * sensor series) where carrying the last value flat misrepresents
    * the trend: each grid instant takes
    * `(v₀·(t₁−t) + v₁·(t−t₀)) div (t₁−t₀)` between its surrounding
    * observations (exact integral arithmetic — one truncating division
    * per sample, identical on both engines), and falls back to LOCF
    * past the last observation. Values must be integral (cast
    * upstream; sub-unit resolution = scale first — the exactness
    * contract).
    *
    * Same scale shape as [[resampleLocf]]: the union+window encoding —
    * observations and map-side-exploded grid instants share one keyed
    * sort; the previous observation arrives by a backward
    * last(ignoreNulls), the next by a forward first(ignoreNulls); no
    * join, no pair blow-up, per-key windows only.
    */
  def resampleLinear(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, tieCol: String, step: Long): DataFrame = {
    require(keys.nonEmpty, "resampleLinear needs at least one key column")
    require(step > 0, s"step must be positive, got $step")
    val k = keys.map(col)
    def floorDiv(t: Column): Column =
      ((t - pmod(t, lit(step))).cast("decimal(38,0)") / lit(step)).cast("long")
    val obs = df.filter(col(valCol).isNotNull)
      .groupBy(k :+ col(tsCol).as("__t"): _*)
      .agg(max_by(col(valCol).cast("long"), col(tieCol)).as("__v"))
    val grid = obs.groupBy(k: _*)
      .agg(min("__t").as("__lo"), max("__t").as("__hi"))
      .withColumn("__ga", floorDiv(col("__lo") + lit(step) - 1))
      .withColumn("__gb", floorDiv(col("__hi")))
      .filter(col("__ga") <= col("__gb"))
      .withColumn("__g", explode(sequence(col("__ga"), col("__gb"))))
      .select(k :+ (col("__g") * step).as("__t") :+
        lit(null).cast("long").as("__v") :+ lit(0).as("__is_obs"): _*)
    val unioned = obs.withColumn("__is_obs", lit(1)).unionByName(grid)
      .withColumn("__ov", when(col("__is_obs") === 1,
        struct(col("__t").as("t"), col("__v").as("v"))))
    val order = Seq(col("__t").asc, col("__is_obs").desc)
    val back = Window.partitionBy(k: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(k: _*).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("__prev", last(col("__ov"), ignoreNulls = true).over(back))
      .withColumn("__next", first(col("__ov"), ignoreNulls = true).over(fwd))
      .filter(col("__is_obs") === 0)
      .select(k :+ col("__t").as("sample_ts") :+
        when(col("__next").isNull, col("__prev.v"))
          .otherwise(expr("""(__prev.v * (__next.t - __t) + __next.v * (__t - __prev.t))
                             div (__next.t - __prev.t)"""))
          .as(valCol): _*)
  }

  /** Cohort retention triangle: users are bucketed by the period of
    * their FIRST event (`cohort = first_t div period`), then counted
    * once per `(cohort, offset)` where `offset` is how many periods
    * after the cohort period the user was active — the standard
    * product/retention analysis ("of the users who arrived in week W,
    * how many came back in week W+k"), equally the freshness profile
    * of a crawl corpus by first-seen date. Returns
    * `(cohort, offset, n_users)`.
    *
    * `timeCol` must be a NON-NEGATIVE integral epoch (the callers use
    * epoch micros): `div` truncates toward zero, which equals floor
    * only for non-negative operands — the same contract as DuckDB's
    * `//` mirror.
    *
    * Shape: one groupBy(user) min, one join back keyed on the user,
    * one (cohort, offset, user) distinct, one count agg — every
    * shuffle keyed by the user or the (small) cohort grid; no window
    * over the corpus, no driver action.
    */
  /** Rolling distinct actives (DAU/WAU/MAU family): for every window
    * END period, the number of distinct entities active in the
    * trailing `windowPeriods` periods. Exact — no sketch — via the
    * standard explode encoding: each active `(entity, period)` pair
    * contributes to the `windowPeriods` window-ends it can be seen
    * from, then a distinct count per end. Cost is `windowPeriods ×`
    * the ACTIVE-PAIR table (already deduped), not the raw event
    * stream — the explode factor is the window length, the usual
    * exact-rolling-distinct trade (use HLL partials when approximate
    * is acceptable). Window ends run to `max_period + windowPeriods −
    * 1` (trailing windows that still see activity); callers slice.
    *
    * `timeCol`: non-negative integral epoch (the [[cohortRetention]]
    * contract). Shuffles: one (entity, period) distinct, one
    * window-end hash agg — both keyed, no window function at all.
    */
  def rollingDistinct(df: DataFrame, entityCol: String, timeCol: String,
      period: Long, windowPeriods: Int): DataFrame = {
    require(period > 0, s"period must be positive, got $period")
    require(windowPeriods > 0, s"windowPeriods must be positive, got $windowPeriods")
    df.select(col(entityCol).as("__e"),
        expr(s"$timeCol div ${period}L").as("__p"))
      .distinct()
      .withColumn("__we",
        explode(sequence(col("__p"), col("__p") + lit((windowPeriods - 1).toLong))))
      .groupBy(col("__we").as("period"))
      .agg(countDistinct(col("__e")).as("n_active"))
  }

  def cohortRetention(df: DataFrame, userCol: String, timeCol: String,
      period: Long): DataFrame = {
    require(period > 0, s"period must be positive, got $period")
    val firsts = df.groupBy(col(userCol).as("__user"))
      .agg(min(col(timeCol)).as("__t0"))
      .select(col("__user"), expr(s"__t0 div ${period}L").as("__cohort"))
    df.select(col(userCol).as("__user"),
        expr(s"$timeCol div ${period}L").as("__p"))
      .join(firsts, Seq("__user"))
      .select(col("__user"), col("__cohort"),
        (col("__p") - col("__cohort")).as("__offset"))
      .distinct()
      .groupBy(col("__cohort").as("cohort"), col("__offset").as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** STATE DURATIONS — run-length encoding of a status stream: per
    * key, consecutive equal states collapse into one episode
    * `(state, t_start, t_end, n_events)` with `t_end` the LAST event
    * time inside the run (the next run's `t_start` is the transition
    * instant). The state-machine telemetry shape: how long was the
    * job RUNNING, the user active, the device degraded — and the
    * value-change variant of [[sessionize]]'s gap islands /
    * [[streaks]]' calendar islands.
    *
    * Encoding: one keyed lag to flag state changes, one keyed cumsum
    * to number episodes, one hash agg — the sessionize shuffle shape,
    * deterministic because equal-time rows order by (time, state)
    * totally; all-integer, engine-exact.
    */
  def stateDurations(df: DataFrame, keys: Seq[String], timeCol: String,
      stateCol: String): DataFrame = {
    require(keys.nonEmpty, "stateDurations needs at least one key column")
    val byKey = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col(stateCol).asc)
    val changed = when(lag(col(stateCol), 1).over(byKey).isNull ||
      lag(col(stateCol), 1).over(byKey) =!= col(stateCol), 1L).otherwise(0L)
    df.withColumn("__ep",
        sum(changed).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keys :+ "__ep").map(col): _*)
      .agg(min(col(stateCol)).as("state"),
        min(col(timeCol)).as("t_start"), max(col(timeCol)).as("t_end"),
        count(lit(1)).as("n_events"))
      .select(keys.map(col) :+ col("__ep").as("episode") :+ col("state") :+
        col("t_start") :+ col("t_end") :+ col("n_events"): _*)
  }

  /** KAPLAN–MEIER survival curve (product-limit estimator) — the
    * time-to-event analytic behind churn/retention-duration studies:
    * given per-subject `(duration, event)` rows (`event` true =
    * the thing happened at `duration`; false = censored — still alive
    * when observation ended), one row per distinct EVENT time with
    * {{{
    *   n_risk       subjects with duration ≥ t
    *   n_events     events exactly at t
    *   log_surv_unat  Σ_{t' ≤ t} ⌊ln((n_riskₜ' − n_eventsₜ')/n_riskₜ')·10⁶⌋
    * }}}
    * `S(t) = exp(log_surv_unat/10⁶)` — the survival product is carried
    * in LOG space with each factor floored to integer micro-nats
    * BEFORE the running sum, so the curve is exact BIGINT arithmetic
    * (the lmUnigramScore discipline; the textbook float product is
    * order-dependent). Each log is ONE ln of an integer-over-integer
    * division — engine-exact.
    *
    * Censored subjects leave the risk set without contributing a
    * factor (the estimator's whole point — dropping them instead
    * would bias survival downward). Shape: one per-duration hash agg
    * (distinct durations, not subjects), a global-ordered cumsum +
    * risk-set window over that SMALL table. The window is global but
    * runs over distinct durations only — bounded by the time
    * resolution, not the cohort.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: Column): DataFrame = {
    val byT = df.select(col(durationCol).cast("long").as("__t"),
        eventCol.cast("boolean").as("__e"))
      .groupBy("__t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
        count(lit(1)).as("__n"))
    val w = pinnedOrderBy(col("__t"))
    val risky = byT
      .withColumn("__later",
        coalesce(sum("__n").over(w.rowsBetween(1, Window.unboundedFollowing)), lit(0L)))
      .withColumn("n_risk", col("__n") + col("__later"))
      .filter(col("__d") > 0)
    risky
      // everyone at risk dying at t sends S to exactly 0 — ln(0) is
      // engine-divergent (−Inf casts differ), so the terminal factor
      // is the documented −1000-nat sentinel (S < 1e-434, i.e. 0).
      .withColumn("__term",
        when(col("n_risk") === col("__d"), lit(-1000000000L))
          .otherwise(floor(log((col("n_risk") - col("__d")).cast("double") /
            col("n_risk").cast("double")) * 1e6).cast("long")))
      .withColumn("log_surv_unat",
        sum("__term").over(pinnedOrderBy(col("__t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("__t").as("t"), col("n_risk"), col("__d").as("n_events"),
        col("log_surv_unat"))
  }

  /** Half-life-decayed sums — freshness-weighted scoring ("recent
    * activity counts more, halving every H"): per key,
    * `Σ value · 2^(−age/H)` with the age measured in WHOLE half-lives
    * from the table's max time (the deterministic "now" — wall clocks
    * are not reproducible; pin an explicit asOf for incremental runs).
    * Returns `(keys…, n_events, decayed_micro)` where `decayed_micro =
    * Σ v·(10⁶ div 2^Δ)`: the weight is an EXACT integer (a power-of-2
    * divisor, 0 beyond 19 half-lives where 10⁶ div 2²⁰ = 0), so the
    * whole aggregation is order-independent BIGINT arithmetic —
    * bit-identical on any engine, where a float `v·exp(−λt)` sum is
    * neither (order-dependent, and libm `exp` is not exactly specified
    * cross-engine the way `ln`-of-ratio chains used here are probed to
    * be). Exponential decay with a non-1/2 base is the same operator
    * after rescaling H — half-life is the standard parameterization.
    *
    * Step-decay semantics (whole periods, not continuous) is the price
    * of exactness and matches the common daily/weekly scoring jobs.
    *
    * Shape: one 1-row max-time agg broadcast in, one keyed hash agg.
    * No window, no join growing with the data.
    */
  def decayedSum(df: DataFrame, keys: Seq[String], timeCol: String,
      value: Column, halfLife: Long, asOf: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "decayedSum needs at least one key column")
    require(halfLife > 0, s"halfLife must be positive, got $halfLife")
    val base = df.select(keys.map(col) :+ col(timeCol).cast("long").as("__t") :+
      value.cast("long").as("__v"): _*)
    val now = asOf.fold(base.agg(max("__t").as("__now")))(n =>
      base.sparkSession.range(1).select(lit(n).as("__now")))
    base.crossJoin(broadcast(now))
      .withColumn("__d",
        greatest(expr(s"(__now - __t) div ${halfLife}L"), lit(0L)))
      .withColumn("__w",
        when(col("__d") >= 20, 0L)
          .otherwise(expr("1000000L div shiftleft(1L, cast(__d as int))")))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sum(col("__v") * col("__w")).as("decayed_micro"))
  }

  /** Activity streaks — the gaps-and-islands analytic: per key, runs of
    * CONSECUTIVE active periods (period = `timeCol div period`, the
    * [[cohortRetention]] calendar-grid contract: non-negative integral
    * epochs). Returns one row per key: `(n_active_periods, n_streaks,
    * longest_streak, longest_end)` — engagement/retention's "current
    * 7-day streak, best-ever streak" shape, and the freshness signal a
    * crawl scheduler thresholds on.
    *
    * Distinct from [[sessionize]] on purpose: sessions split raw
    * timestamps on a GAP threshold; streaks live on the calendar grid
    * and ask about run LENGTHS of distinct active units. The encoding
    * is the classic islands trick — after dedup to (key, period),
    * `period − row_number(per key, period order)` is constant exactly
    * within a consecutive run, so one keyed window + two hash aggs
    * recover every run exactly. `longest_end` (the last period of the
    * longest streak) breaks length ties by the LATEST streak — a total,
    * engine-independent order, taken as one struct-max.
    *
    * Scale shape: one distinct on (key, period), one window partitioned
    * by key (cardinality grows with the data — never a global sort),
    * two keyed aggregates. All-integer arithmetic throughout, so any
    * engine mirrors bit-exactly.
    */
  def streaks(df: DataFrame, keys: Seq[String], timeCol: String,
      period: Long): DataFrame = {
    require(keys.nonEmpty, "streaks needs at least one key column")
    require(period > 0, s"period must be positive, got $period")
    val active = df.select(keys.map(col) :+
        expr(s"$timeCol div ${period}L").as("__p"): _*)
      .distinct()
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__p"))
    val islands = active
      .withColumn("__isl", col("__p") - row_number().over(w))
      .groupBy((keys :+ "__isl").map(col): _*)
      .agg(count(lit(1)).as("__len"), max(col("__p")).as("__end"))
    islands.groupBy(keys.map(col): _*)
      .agg(sum("__len").as("n_active_periods"),
        count(lit(1)).as("n_streaks"),
        max(struct(col("__len"), col("__end"))).as("__best"))
      .select(keys.map(col) :+ col("n_active_periods") :+ col("n_streaks") :+
        col("__best.__len").as("longest_streak") :+
        col("__best.__end").as("longest_end"): _*)
  }

  /** LENGTH-SORTED BATCH PACKING — the padded-batch loader layout
    * (the alternative to [[packChunks]]' concat-and-chunk: models
    * that can't cross document boundaries pad every sequence in a
    * batch to the batch max, and sorting by length first is the
    * standard way to collapse that padding). Sequences are ordered by
    * `(length, tieCol)`, grouped into consecutive `batchSize`-row
    * batches, and each batch reports its exact padding cost:
    * `pad_waste = n_seqs·max_len − sum_tokens` — all BIGINT
    * arithmetic, so the full layout is hash-checkable.
    *
    * With `shardCols` empty the order is GLOBAL — a range
    * repartition + per-partition numbering ([[denseIdsBy]], no
    * single-partition window), which is an inherent global sort: fine
    * up to ~10⁹ sequences, but at corpus scale pass shard keys
    * (language, source, length-decile…) so each shard sorts
    * independently under a keyed window and nothing global moves.
    * `tieCol` must be unique within a shard.
    */
  def sortedBatches(df: DataFrame, lenCol: Column, tieCol: Column,
      batchSize: Int, shardCols: Seq[String] = Nil,
      sortByLength: Boolean = true): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val base = df.select(shardCols.map(col) :+ lenCol.cast("long").as("__len") :+
      tieCol.as("__tie"): _*)
    // sortByLength=false is the ARRIVAL-ORDER baseline (batch by the
    // tie key alone) — the pair of runs quantifies how much padding
    // the length sort actually removes.
    val ord = if (sortByLength) Seq(col("__len").asc, col("__tie").asc)
      else Seq(col("__tie").asc)
    val indexed =
      if (shardCols.isEmpty) denseIdsBy(base, ord, "__idx")
      else {
        val w = Window.partitionBy(shardCols.map(col): _*).orderBy(ord: _*)
        base.withColumn("__idx", row_number().over(w).cast("long"))
      }
    indexed
      .withColumn("batch_id", expr(s"(__idx - 1) div $batchSize"))
      .groupBy((shardCols :+ "batch_id").map(col): _*)
      .agg(count(lit(1)).as("n_seqs"), max("__len").as("max_len"),
        sum("__len").as("sum_tokens"))
      .withColumn("pad_waste", col("n_seqs") * col("max_len") - col("sum_tokens"))
  }

  /** Funnel time-to-convert: for every user who reached `toType`
    * AFTER first touching `fromType`, the latency between the FIRST
    * `fromType` event and the FIRST `toType` event at-or-after it —
    * the distribution product analytics reads next to the [[funnel]]
    * counts ("how many convert" vs "how long it takes"). `tsCol` is
    * an integer time (epoch micros); output
    * `(user, t_from, latency)` — feed [[Profiling.exactPercentiles]]
    * for the p50/p90/p99 view.
    *
    * Shape: two filtered per-user min-aggs and one user-keyed join —
    * all hash-partitioned on the user, no window, no ordering.
    */
  def funnelLatency(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, fromType: String, toType: String): DataFrame = {
    val first = df.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_from"))
    df.filter(col(typeCol) === toType)
      .join(first, Seq(userCol))
      .filter(col(tsCol) >= col("t_from"))
      .groupBy(col(userCol), col("t_from"))
      .agg(min(col(tsCol)).as("__t1"))
      .select(col(userCol), col("t_from"),
        (col("__t1") - col("t_from")).as("latency"))
  }

  /** Top navigation paths: sessionize, concatenate each session's
    * first `pathLen` event types in (time, tie) order, and count
    * sessions per path — "how do users actually move through the
    * product", the qualitative companion to [[funnel]]'s fixed-order
    * counts. `tieCol` (a unique event id) makes same-timestamp
    * ordering total, so the path strings are deterministic on every
    * engine and layout.
    *
    * Shape: the [[sessionize]] keyed window, one session hash agg
    * whose per-session state is ≤ session length, a path hash agg,
    * and a distributed top-K — no corpus-wide ordering.
    */
  def sessionPaths(df: DataFrame, userCol: String, typeCol: String,
      timeCol: String, tieCol: String, maxGap: Long, pathLen: Int,
      topK: Int): DataFrame = {
    require(pathLen >= 1, s"pathLen must be >= 1, got $pathLen")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val sess = sessionize(df, Seq(userCol), timeCol, maxGap)
    sess.groupBy(col(userCol), col("session_id"))
      .agg(sort_array(collect_list(struct(col(timeCol).as("t"),
        col(tieCol).as("i"), col(typeCol).as("e")))).as("__evs"))
      .select(concat_ws(">",
        slice(transform(col("__evs"), e => e.getField("e")), 1, pathLen))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc_nulls_last)
      .limit(topK)
  }

  /** Cohort lifetime value: users bucketed by first-seen week, each
    * cohort's per-week revenue accumulated over cohort AGE — the
    * "when does a cohort pay back" curve next to [[cohortRetention]]'s
    * activity view. Integer cents throughout; the cumulative window
    * runs over the (cohort, age) GRID (weeks², calendar-bounded),
    * never the events.
    */
  def cohortLtv(df: DataFrame, userCol: String, timeCol: String,
      valueCents: Column, weekMicros: Long = 7L * 86400L * 1000000L): DataFrame = {
    val t0 = df.agg(min(col(timeCol)).as("__t0"))
    val wk = df.select(col(userCol), col(timeCol), valueCents.as("__v"))
      .join(broadcast(t0))
      .select(col(userCol),
        expr(s"(${timeCol} - __t0) div $weekMicros").as("__w"), col("__v"))
    val firstW = wk.groupBy(col(userCol)).agg(min("__w").as("cohort_w"))
    val grid = wk.join(firstW, Seq(userCol))
      .groupBy(col("cohort_w"), (col("__w") - col("cohort_w")).as("age_w"))
      .agg(countDistinct(col(userCol)).as("n_users"), sum("__v").as("__cents"))
    val w = Window.partitionBy("cohort_w").orderBy("age_w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.withColumn("cum_cents", sum("__cents").over(w))
      .select(col("cohort_w"), col("age_w"), col("n_users"),
        col("__cents").as("cents"), col("cum_cents"))
  }

  /** Weekly churn: of the users active in week `w`, how many never
    * appear in week `w+1` — the retention complement
    * [[cohortRetention]] reads by cohort, read here by calendar week
    * (the "are we bleeding users right now" number). The last
    * observed week is excluded (its churn is not yet observable).
    *
    * Shape: one distinct (user, week) agg, one self-join on
    * (user, week+1) — both hash-partitioned on the user — and a
    * week-keyed fold. No windows, nothing row-sized after the
    * distinct.
    */
  def weeklyChurn(df: DataFrame, userCol: String, timeCol: String,
      weekMicros: Long = 7L * 86400L * 1000000L): DataFrame = {
    val t0 = df.agg(min(col(timeCol)).as("__t0"))
    val uw = df.select(col(userCol), col(timeCol))
      .join(broadcast(t0))
      .select(col(userCol), expr(s"($timeCol - __t0) div $weekMicros").as("w"))
      .distinct()
      .localCheckpoint(true) // probe side, shifted build side, max fold
    val nxt = uw.select(col(userCol), (col("w") - 1).as("w"),
      lit(true).as("__ret"))
    val maxW = uw.agg(max("w").as("__maxw"))
    uw.join(nxt, Seq(userCol, "w"), "left")
      .join(broadcast(maxW))
      .filter(col("w") < col("__maxw"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("__ret").isNull, 1L).otherwise(0L)).as("n_churned"))
      .select(col("w"), col("n_active"), col("n_churned"),
        expr("n_churned * 1000000L div n_active").as("churn_ppm"))
  }

  /** Trailing-`k` rolling LOWER median of an integer series — the
    * robust smoother (a single spike day moves a rolling mean by
    * spike/k but the rolling median not at all). Lower median = the
    * ⌈n/2⌉-th smallest of the ≤k frame values — an ELEMENT of the
    * input, so it stays integral and engine-exact; DuckDB's
    * `quantile_disc(0.5) OVER` picks the identical element.
    *
    * Shape: one ordered window over the SERIES (calendar-bounded —
    * the caller aggregates raw rows to the series first), sorting k
    * elements per row; no join, no second pass. Optional `keys`
    * partition the window so no global single-partition sort forms.
    */
  def rollingMedian(df: DataFrame, keys: Seq[String], orderCol: Column,
      x: Column, k: Int): DataFrame = {
    require(k >= 1, s"window size must be >= 1, got $k")
    val w0 = if (keys.isEmpty) pinnedOrderBy(orderCol)
             else Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    val w = w0.rowsBetween(-(k - 1), Window.currentRow)
    df.withColumn("__fr", array_sort(collect_list(x).over(w)))
      .withColumn("med",
        element_at(col("__fr"), expr("CAST((size(__fr) + 1) div 2 AS INT)")))
      .drop("__fr")
  }

  /** Truncated exponential moving average — EWMA with α = ½ cut off
    * after `k` lags so it stays EXACT integer arithmetic: the value
    * `i` steps back weighs `2^(k−1−i)`, and
    * `ewma_milli = 10³·Σ wᵢ·x_{t−i} div Σ wᵢ` over the lags that
    * exist (warm-up rows renormalize over the available history
    * instead of decaying a phantom zero). Truncating division is
    * engine-shared (Spark `div` ≡ DuckDB `//`, negatives included).
    * [[ewmaTruncSql]] emits the byte-identical DuckDB form.
    *
    * Shape: k `lag()` columns over ONE ordered window pass — no
    * frame materialization, no join; partition by `keys` so no
    * global single-partition sort forms when series are per-key.
    */
  def ewmaTrunc(df: DataFrame, keys: Seq[String], orderCol: Column,
      x: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 62, s"k must be in [1, 62], got $k")
    val w = if (keys.isEmpty) pinnedOrderBy(orderCol)
            else Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    val terms = (0 until k).map { i =>
      val wt = 1L << (k - 1 - i)
      val v = if (i == 0) x else lag(x, i).over(w)
      (coalesce(v * wt, lit(0L)), when(v.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    df.withColumn("__num", terms.map(_._1).reduce(_ + _))
      .withColumn("__den", terms.map(_._2).reduce(_ + _))
      .withColumn("ewma_milli", expr("(__num * 1000) div __den"))
      .drop("__num", "__den")
  }

  /** DuckDB mirror of [[ewmaTrunc]]'s `ewma_milli` as a single SELECT
    * expression (same lag weights, same warm-up renormalization,
    * same truncating division). */
  def ewmaTruncSql(xExpr: String, orderExpr: String, k: Int,
      partitionExpr: Option[String] = None): String = {
    val over = partitionExpr match {
      case Some(p) => s"OVER (PARTITION BY $p ORDER BY $orderExpr)"
      case None => s"OVER (ORDER BY $orderExpr)"
    }
    val terms = (0 until k).map { i =>
      val wt = 1L << (k - 1 - i)
      val v = if (i == 0) s"($xExpr)" else s"lag($xExpr, $i) $over"
      (s"coalesce(($v) * $wt, 0)", s"CASE WHEN ($v) IS NULL THEN 0 ELSE $wt END")
    }
    s"((${terms.map(_._1).mkString(" + ")}) * 1000) // " +
      s"(${terms.map(_._2).mkString(" + ")})"
  }
}
