package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
