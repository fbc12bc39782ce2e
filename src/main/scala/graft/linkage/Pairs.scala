package graft.linkage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pair assembly + comparison-vector computation + pattern counting —
  * the reference's entry point 2 (SURVEY.md §3): one fused lazy plan
  * from candidate ids to the tiny pattern-count table.
  */
object Pairs {

  /** Join both (suffixed) source tables back onto the candidate-pair id
    * list (reference: `compute_blocked_dataset`/`compute_pairs_dataset`,
    * R/linking.R:49-60). Left joins on the id columns, exactly as the
    * reference, and Catalyst prunes each source scan to the columns
    * the downstream comparators actually read.
    *
    * At bench scale the source sides broadcast; past that the planner
    * must NOT fall back to sort-merge (round-15 SPILL_PROBE evidence:
    * SMJ sorts the pair-id stream, and at the 0.5B-pair rung that sort
    * was the measured spill crossover — 59 GB memory / 5.2 GB disk
    * spilled, 3.1M pairs/s). With `spark.sql.join.preferSortMergeJoin
    * =false` (set by Bench/probes; the guide's §9 baseline) the
    * planner picks a shuffled HASH join whose build side is the
    * per-partition slice of the SOURCE table (dimension-scale, never
    * pair-scale) and streams the pair side unsorted: with partitions
    * sized so a task holds ≲4M pairs the probe measured 11.8M pairs/s
    * and ZERO spill (shj128 variant, stable across interleaved passes;
    * docs/SPILL_PROBE_r15.json). A hard SHUFFLE_HASH hint here would
    * instead OVERRIDE the broadcast choice at small scale — the conf
    * keeps broadcast where it wins and removes only the sort
    * preference. Join results are strategy-independent; the oracle
    * rows gate that.
    */
  def computePairsDataset(
      dataA: DataFrame,
      dataB: DataFrame,
      uniqueIdA: String,
      uniqueIdB: String,
      comparisonIds: DataFrame): DataFrame = {
    val a = Suffix.addSuffix(dataA, "_left")
    val b = Suffix.addSuffix(dataB, "_right")
    val idL = Suffix.addSuffix(uniqueIdA, "_left")
    val idR = Suffix.addSuffix(uniqueIdB, "_right")
    comparisonIds
      .join(a, Seq(idL), "left")
      .join(b, Seq(idR), "left")
  }

  /** Aggregate distinct comparison vectors with their multiplicities —
    * the core scalability trick (reference: scratch.R:51-54): EM then
    * runs over ≤ ∏ field-levels rows instead of per-pair. Executes as a
    * partial+final hash aggregate; output is driver-sized by
    * construction.
    */
  def patternCounts(comparisons: DataFrame, comparators: Seq[Comparator]): DataFrame =
    comparisons.groupBy(comparators.map(c => col(c.name)): _*).agg(count(lit(1)).as("n"))

  /** Fused: ids → pairs → comparison vectors → pattern counts. */
  def patternCounts(
      dataA: DataFrame,
      dataB: DataFrame,
      uniqueIdA: String,
      uniqueIdB: String,
      comparisonIds: DataFrame,
      comparators: Seq[Comparator]): DataFrame = {
    val pairs = computePairsDataset(dataA, dataB, uniqueIdA, uniqueIdB, comparisonIds)
    patternCounts(Comparators.doComparisons(pairs, comparators), comparators)
  }
}
