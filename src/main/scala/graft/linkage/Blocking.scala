package graft.linkage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate-pair generation ("blocking"): avoid the O(|A|·|B|) cross
  * product by taking the union of cheap equi-join passes plus optional
  * predicate passes, deduplicated
  * (reference: `extract_blocks`, R/linking.R:14-38).
  *
  * Scale-first design divergences from the reference (SURVEY.md §3):
  *
  *   - The reference `collect()`s every pass to the driver and dedups
  *     in driver memory (R/linking.R:35-37) — a non-starter at 100 TB.
  *     Here the whole thing is ONE lazy plan:
  *     `passes.reduce(unionByName).dropDuplicates` — same result set,
  *     dedup runs as a distributed hash aggregate on the pair ids, and
  *     Catalyst prunes each pass's scan down to (blocking key, id).
  *
  *   - A raw predicate pass is a cross join (R/linking.R:28-29), which
  *     no optimizer can save at scale. `ComputedKeys` lets the caller
  *     express "same first initial"-style predicates as equi-joins on
  *     computed keys (e.g. `substring(col("surname"), 1, 1)`), turning
  *     O(n²) into a shuffled hash join. `Predicate` remains available
  *     for genuinely non-equi conditions; Catalyst will still turn an
  *     equality-only predicate over a cross join into an equi-join, but
  *     relying on that rewrite is fragile — prefer `ComputedKeys`.
  */
sealed trait BlockingPass

/** Equi-join pass on existing columns: left name → right name map
  * (reference: R/linking.R:21-27; `list('surname'='surname', ...)` at
  * scratch.R:23). Unsuffixed names are suffixed automatically.
  */
final case class EquiKeys(keys: Map[String, String]) extends BlockingPass
object EquiKeys {
  /** Same-name convenience: block on `v_left == v_right`. */
  def apply(vars: String*): EquiKeys = EquiKeys(vars.map(v => v -> v).toMap)
}

/** Equi-join pass on computed keys: (key name, left-side expr over the
  * suffixed left table, right-side expr over the suffixed right table).
  * The scale-path rewrite of prefix-style predicate passes
  * (reference: scratch.R:25).
  */
final case class ComputedKeys(keys: Seq[(String, Column, Column)]) extends BlockingPass

/** Arbitrary-predicate pass over the cross product — the reference's
  * `blocking_expressions` (R/linking.R:28-29). Use only for non-equi
  * predicates; O(|A|·|B|) work.
  */
final case class Predicate(condition: Column) extends BlockingPass

/** Typed blocking config (reference: S7 `blocking_rules`,
  * R/s7_classes.R:11-30).
  *
  * KEY-CARDINALITY CONTRACT: per-bucket candidate pairs grow
  * quadratically in bucket size, so a key whose distinct-value count
  * stays FIXED as the data grows makes the pair table grow
  * quadratically with the corpus. Choose keys whose cardinality scales
  * with the data (high-entropy prefixes, digests, computed keys over
  * near-unique columns); residual hot keys are split at runtime by AQE
  * skew-join handling (evidence: docs/SKEW_EVIDENCE_r03.md).
  */
final case class BlockingRules(passes: Seq[BlockingPass]) {
  override def toString: String =
    if (passes.isEmpty)
      "An empty blocking rule. Be careful! This blocking rule will return all pairs!"
    else
      s"Blocking rule with ${passes.length} blocking conditions.\n" +
        passes.map(p => s"  - $p").mkString("\n")
}

/** Top-level linkage spec (reference: S7 `ppack_spec`,
  * R/s7_classes.R:34-44).
  */
final case class LinkSpec(
    blocking: BlockingRules,
    comparators: Seq[Comparator],
    uniqueIdA: String,
    uniqueIdB: String)

object Blocking {

  /** Generate the deduplicated candidate-pair id table
    * (reference: `extract_blocks`, R/linking.R:14-38). Returns a lazy
    * DataFrame of (uniqueIdA_left, uniqueIdB_right) — one plan, no
    * driver materialization.
    *
    * `selfLinkage = true` canonicalizes SELF-linkage pairs
    * (`id_left < id_right`) inside each pass, BEFORE the union +
    * distinct — a post-hoc filter would let the distinct's exchange
    * shuffle both orientations of every pair (2× the rows it needs;
    * Catalyst cannot push a filter through `dropDuplicates` because
    * deduplication is not filter-commutative in general). Only valid
    * when A and B are the same table with comparable ids.
    *
    * SCALE CONTRACT for blocking keys: per-bucket pair count is
    * quadratic in bucket size, so keys whose CARDINALITY IS FIXED as
    * the data grows (a 125-value nation×segment key, a 2-digit
    * suffix) make the pair table grow quadratically with the corpus —
    * that is inherent to the key choice, not the operator. Pick keys
    * whose distinct-value count scales with the data (names, digests,
    * computed prefixes of high-entropy columns). Hot keys that slip
    * through are handled at runtime by AQE skew-join splitting
    * (spark.sql.adaptive.skewJoin, see docs/SKEW_EVIDENCE_r03.md) —
    * EXCEPT when the key cardinality itself is tiny (SURVEY §4's
    * first-initial case: 26 values means 26 join groups no matter how
    * many executors exist; AQE can split a skewed sort-merge
    * partition, but a 1000-node cluster still idles on a 26-way key).
    * For those passes set `hotKeySalts` ≈ the cluster's task
    * parallelism: each equi/computed pass then salts the LEFT side by
    * a hash of its id (uniform, key-independent) and replicates the
    * RIGHT side across all salts, so every hot key's pair production
    * spreads over `hotKeySalts` tasks. Output is identical (verified
    * by spec) — the salt is a conjunct equi-key that every (rowA,
    * rowB) combination satisfies exactly once — at the cost of
    * shuffling the right side `hotKeySalts`×. Leave it 0 for
    * high-cardinality keys where AQE suffices.
    */
  def extractBlocks(
      dataA: DataFrame,
      dataB: DataFrame,
      uniqueIdA: String,
      uniqueIdB: String,
      rules: BlockingRules,
      selfLinkage: Boolean = false,
      hotKeySalts: Int = 0): DataFrame = {
    val a = graft.util.Parallelism.ensure(Suffix.addSuffix(dataA, "_left"))
    val b = Suffix.addSuffix(dataB, "_right")
    val idL = Suffix.addSuffix(uniqueIdA, "_left")
    val idR = Suffix.addSuffix(uniqueIdB, "_right")
    // Same reserved-name discipline as Windows.denseIdsBy: salting
    // adds __salt_l/__salt_r working columns. Checked on the RAW
    // inputs (suffixing would rename a raw __salt_l to __salt_l_left,
    // masking the collision today — but the names are reserved
    // outright so a future refactor of the suffix order cannot turn
    // the silent rename into a silent overwrite or ambiguous join).
    if (hotKeySalts > 1)
      Seq("A" -> dataA, "B" -> dataB).foreach { case (side, df) =>
        Seq("__salt_l", "__salt_r").foreach(n =>
          require(!df.columns.contains(n),
            s"extractBlocks: input $side already has a column named '$n' — " +
              "reserved by hotKeySalts salting; rename it first"))
      }

    // Self-linkage canonicalization applied per pass: the `<` becomes a
    // join-condition conjunct (or a pre-distinct filter on the cross
    // join), halving the rows every downstream exchange — including
    // the dedup shuffle — has to carry.
    def canon(pairIds: DataFrame): DataFrame =
      if (selfLinkage) pairIds.filter(col(idL) < col(idR)) else pairIds

    // Salted equi-join for tiny-cardinality hot keys (see scale
    // contract above): left rows carry ONE uniform salt (hash of the
    // left id — independent of the blocking key, so a hot key's rows
    // spread evenly), right rows carry ALL salts; the salt equality
    // conjunct makes each (rowA, rowB) match in exactly one task.
    def saltedEqui(l: DataFrame, r: DataFrame, cond: Column): DataFrame =
      if (hotKeySalts > 1) {
        val sl = l.withColumn("__salt_l", pmod(xxhash64(col(idL)), lit(hotKeySalts)))
        val sr = r.withColumn("__salt_r",
          explode(sequence(lit(0).cast("long"), lit(hotKeySalts - 1).cast("long"))))
        sl.join(sr, cond && col("__salt_l") === col("__salt_r"), "inner")
      } else l.join(r, cond, "inner")

    val passes: Seq[DataFrame] = rules.passes.map {
      case EquiKeys(keys) =>
        // Null keys never match in an equi-join (NULL = NULL is NULL) —
        // same as the reference's SQL inner join.
        val cond = keys.map { case (l, r) =>
          a(Suffix.addSuffix(l, "_left")) === b(Suffix.addSuffix(r, "_right"))
        }.reduce(_ && _)
        canon(saltedEqui(a, b, cond).select(col(idL), col(idR)))

      case ComputedKeys(keys) =>
        // Project the computed keys on each side first so the join is a
        // plain shuffled equi-join on materialized key columns.
        val ak = keys.foldLeft(a) { case (df, (n, le, _)) => df.withColumn(s"__bk_$n", le) }
        val bk = keys.foldLeft(b) { case (df, (n, _, re)) => df.withColumn(s"__bk2_$n", re) }
        val cond = keys.map { case (n, _, _) => ak(s"__bk_$n") === bk(s"__bk2_$n") }.reduce(_ && _)
        canon(saltedEqui(ak, bk, cond).select(col(idL), col(idR)))

      case Predicate(condition) =>
        canon(a.crossJoin(b).filter(condition).select(col(idL), col(idR)))
    }

    // union-all + distinct == the reference's bind_rows + distinct
    // (R/linking.R:36-37), kept distributed. A single equi/computed-key
    // pass already yields unique pairs (each (rowA, rowB) combination
    // appears at most once in one join), so the distinct — a full
    // shuffle of the pair table — is skipped when it cannot change the
    // result.
    val singlePassUnique = rules.passes.sizeIs == 1 && (rules.passes.head match {
      case _: EquiKeys | _: ComputedKeys | _: Predicate => true
    })
    val unioned = passes.reduce(_ unionByName _)
    if (singlePassUnique) unioned else unioned.dropDuplicates(idL, idR)
  }

  /** Blocking quality metrics — the two numbers every blocking scheme
    * is judged by (Christen's record-linkage evaluation canon):
    * REDUCTION RATIO `1 − |cand|/|A×B|` (how much of the comparison
    * space the scheme avoids) and PAIRS COMPLETENESS
    * `|cand ∩ truth|/|truth|` (how many true matches survive it).
    * Tuning blocking = trading these against each other; a scheme
    * change that silently drops completeness is how a linkage
    * pipeline rots.
    *
    * `candidates` and `truth` are pair tables on (idL, idR);
    * `totalPairs` is the caller's |A×B| (e.g. nA·nB, or n(n−1)/2 for
    * self-linkage — computed from counts, never materialized). One
    * job: three counting aggregates (candidates, truth, and their
    * keyed inner join) cross-joined as 1-row broadcasts; the ratios
    * are single divisions of exact counts.
    */
  def qualityMetrics(
      candidates: DataFrame, truth: DataFrame,
      idL: String, idR: String, totalPairs: Long): DataFrame = {
    val nCand = candidates.agg(count(lit(1)).as("n_cand"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nHit = candidates.select(col(idL), col(idR))
      .join(truth.select(col(idL), col(idR)), Seq(idL, idR))
      .agg(count(lit(1)).as("n_hits"))
    nCand.crossJoin(nTruth).crossJoin(nHit)
      .withColumn("pairs_total", lit(totalPairs))
      .withColumn("reduction_ratio",
        lit(1.0) - col("n_cand").cast("double") / col("pairs_total"))
      .withColumn("pairs_completeness",
        col("n_hits").cast("double") / col("n_truth"))
  }

  /** MEASURED salt-count recommendation for a blocking pass — the
    * bridge from [[graft.ops.Profiling.joinSizeEstimate]]'s skew
    * forecast to [[extractBlocks]]' `hotKeySalts` knob, so the salt
    * count is a pre-flight computation instead of a guess.
    *
    * Model: per-key pair GENERATION work is `cntL·cntR` and a key's
    * group runs in ONE task unsalted (AQE splits partitions by size,
    * not groups — SURVEY §4). The straggler bound is therefore
    * `max_k cntL·cntR`, against an ideal per-task share of
    * `Σ_k cntL·cntR / targetParallelism`. Salting by `s` divides
    * every group `s` ways, so the smallest sufficient salt count is
    *
    * {{{ s = ceil(targetParallelism · max_k work / Σ_k work) }}}
    *
    * clamped to `[1, targetParallelism]` (salting past the task count
    * buys nothing and costs `s`× right-side replication). Returns 0
    * when s ≤ 1 — the key spreads fine, AQE suffices, skip the salt
    * cost entirely. This covers BOTH failure shapes with one formula:
    * a dominant hot key (max/Σ → 1 ⇒ s → targetParallelism) and a
    * tiny-cardinality uniform key (k uniform groups ⇒ s ≈ P/k, giving
    * k·s ≈ P work units).
    *
    * Cost: two per-key count aggs + a key join, one 1-row collect —
    * the same pre-flight job as [[graft.ops.Profiling.joinSizeEstimate]],
    * far cheaper than the pair generation it sizes. Pass the SAME key
    * expressions the blocking pass will use (left and right sides).
    * Identity of the pair set under any salt count is spec-proved
    * (LinkageSpec); this helper only picks the parallelism.
    */
  def recommendSalts(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column, targetParallelism: Int): Int = {
    require(targetParallelism > 0,
      s"targetParallelism must be positive, got $targetParallelism")
    val row = graft.ops.Profiling
      .joinSizeEstimate(left, leftKey, right, rightKey, "recommendSalts").head()
    if (row.isNullAt(row.fieldIndex("n_join_rows"))) 0 // no shared keys
    else {
      val total = row.getAs[Long]("n_join_rows")
      val top = row.getAs[Long]("top_key_rows")
      if (total <= 0) 0
      else {
        val s = math.ceil(targetParallelism.toDouble * top / total).toInt
        if (s <= 1) 0 else math.min(s, targetParallelism)
      }
    }
  }

  /** SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo 1995) — the
    * classic alternative to equi-key blocking for fuzzy keys: sort
    * the table by a sorting key and pair every record with its next
    * `w` neighbors in that order. Tolerates key typos that equi
    * blocking misses (adjacent-but-unequal keys still pair) at a
    * LINEAR pair budget `w·n` — no bucket is ever quadratic, the
    * dual failure mode of [[extractBlocks]]' key-cardinality
    * contract.
    *
    * Returns `(id_left, id_right, rank_gap)` with `rank_gap ∈ [1, w]`.
    * The sort order is made TOTAL by (sortKey, id) — ties are ordered
    * deterministically, so the pair set is a pure function of the data
    * (engine/layout/rerun-stable, mirrorable).
    *
    * Scale shape: the global order comes from
    * [[graft.ops.Windows.denseIdsBy]] (range repartition + local
    * numbering + broadcast offsets — NO single-partition window), then
    * the neighbor pairing is `w` rank-keyed self-joins expressed as
    * one explode of rank+1..rank+w (the skipgram shift trick) joined
    * back on the rank — keyed shuffles only.
    */
  def sortedNeighborhood(df: DataFrame, idCol: String, sortKey: Column,
      w: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    val ranked = graft.ops.Windows.denseIdsBy(
        df.select(col(idCol).as("__id"), sortKey.as("__k")),
        Seq(col("__k").asc, col("__id").asc), "__rank")
      .localCheckpoint(true) // probe side and build side share one numbering
    val probes = ranked.select(col("__id").as("id_left"), col("__rank"),
        explode(sequence(col("__rank") + 1, col("__rank") + w)).as("__nr"))
    probes.join(ranked.select(col("__id").as("id_right"),
        col("__rank").as("__nr")), Seq("__nr"))
      .select(col("id_left"), col("id_right"),
        (col("__nr") - col("__rank")).as("rank_gap"))
  }
}
