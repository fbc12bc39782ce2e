package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join evidence probe (round-3 task): demonstrates that a
  * deliberately skewed blocking-style equi-join over the sf0.1 tables
  * is split at runtime by AQE's OptimizeSkewedJoin — the mechanism the
  * engine relies on when a user's blocking key turns out hot at scale.
  *
  * The fixture: lineitem (600k rows at sf0.1) with ~50% of rows
  * collapsed onto one hot key, joined to part on that key. The skew
  * thresholds are scaled DOWN from the cluster defaults (256 MB) in
  * the same ratio the local fixture is scaled down from a cluster
  * workload — the point is the plan shape (`skew=true` on the
  * SortMergeJoin), which is size-threshold-relative, not absolute.
  *
  * Usage: `sbt "runMain graft.SkewProbe /root/testdata/sf0.1"`;
  * output committed as docs/SKEW_EVIDENCE_r03.md.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      // Force the shuffled sort-merge path (skew splitting does not
      // apply to broadcast joins) and scale the skew thresholds to
      // local data volumes.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.LogManager.getLogger("org.apache.spark.sql.execution.adaptive").setLevel(org.apache.log4j.Level.DEBUG)

    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")

    // ~50% of the fact side lands on hot key 0; the dim side keeps its
    // natural (unique) key — the classic hot-blocking-key shape. The
    // fact side is replicated 8× (4.8M rows) so the hot reduce
    // partition is decisively above the scaled-down skew threshold.
    // The repartition matters for fidelity: AQE splits a skewed reduce
    // partition at MAP-OUTPUT-BLOCK granularity, and a single-file
    // local scan is ONE map task — an unsplittable single block. On a
    // real cluster the upstream stage has thousands of map tasks; 64
    // mappers here model that.
    val skewedFact = lineitem
      .withColumn("__r", explode(sequence(lit(1), lit(8))))
      .repartition(64)
      .select(
        when(col("l_partkey") % 2 === 0, lit(0L)).otherwise(col("l_partkey")).as("k"),
        col("l_orderkey"), col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
    val dim = part.select(col("p_partkey").as("k"), col("p_name"), col("p_brand"))

    val joined = skewedFact.join(dim, Seq("k"))
    // Execute THIS DataFrame's own physical plan (a `.count()` would
    // build a separate aggregate execution and leave this one
    // unfinalized) — after the action the adaptive plan is final, and
    // `skew=true` appears on the join if OptimizeSkewedJoin fired.
    val n = joined.queryExecution.toRdd.count()
    val plan = joined.queryExecution.executedPlan.toString
    println(s"[skewprobe] rows=$n")
    println(s"[skewprobe] skew_marker=${plan.contains("skew=true")}")
    println(plan)
    spark.stop()
  }
}
