package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.linkage.{Blocking, BlockingRules, ComputedKeys}

/** Measured evidence for `extractBlocks(hotKeySalts = …)` — the
  * tiny-cardinality blocking key SURVEY §4 names as the case AQE skew
  * splitting cannot fix: a key with K distinct values makes at most K
  * join groups, so a cluster with ≫ K cores idles no matter how AQE
  * splits partitions BY SIZE (every row of one group must still meet
  * every matching row, and pair GENERATION runs per group).
  *
  * Fixture: self-linkage over a `c_mktsegment`-derived key (5 values)
  * on a 30k-row slice of the sf0.1 customer table — ~90M raw pairs
  * from 5 join groups on 32 cores. A/B: `hotKeySalts = 0` (5 busy
  * tasks, 27 idle) vs `hotKeySalts = 32` (5×32 = 160 work units
  * spread over all cores; the left side is hashed over the salts, the
  * right side replicated ×32). The pair count is asserted EQUAL — the
  * salt is a pure parallelism transform (LinkageSpec proves set
  * equality; the count here guards the measured run).
  *
  * Usage: `sbt "runMain graft.SaltProbe /root/testdata/sf0.1"`;
  * output committed in docs/ROUND11_NOTES.md.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      // The probe contrasts PARALLELISM of the pair-generating join;
      // keep AQE on (the production stance) so the unsalted side gets
      // every runtime mitigation AQE can offer — the measured gap is
      // then attributable to the group-count ceiling alone. Broadcast
      // is disabled for the same reason SkewProbe disables it: at the
      // scale this models NEITHER side fits an executor (a broadcast
      // join has no group ceiling — its parallelism is the probe
      // side's partitioning — which is precisely why it is the first
      // choice when a side IS small); the shuffled path is what a
      // 100 TB self-linkage actually runs.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 8× re-keyed replication (120k rows) makes per-group pair
    // GENERATION the dominant cost (~1.4e9 raw pairs from 5 groups) —
    // at 15k rows the 5-task ceiling was invisible behind scan and
    // shuffle constants (measured 0.6 s either way).
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumn("__r", explode(sequence(lit(0), lit(7))))
      .select((col("c_custkey") + col("__r") * 15000L).as("c_custkey"),
        col("c_mktsegment"))
      .localCheckpoint(true)
    println(s"rows: ${customer.count()}")

    // 5-value key → C(24k,2)-ish pairs per segment, ~1.4e9 raw total.
    val rules = BlockingRules(Seq(ComputedKeys(Seq(
      ("seg", col("c_mktsegment_left"), col("c_mktsegment_right"))))))

    def timeRun(salts: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Blocking.extractBlocks(customer, customer, "c_custkey", "c_custkey",
          rules, selfLinkage = true, hotKeySalts = salts)
        .count()
      (n, (System.nanoTime() - t0) / 1e9)
    }

    // Warm both paths once (JIT, file-scan caches), then measure twice
    // each, interleaved, and report the min (co-tenant noise floor).
    timeRun(0); timeRun(32)
    val runs = Seq(0, 32, 0, 32).map(s => s -> timeRun(s))
    val bySalt = runs.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.map(_._2._1).distinct, rs.map(_._2._2).min)
    }
    val (n0, t0s) = bySalt(0)
    val (n32, t32s) = bySalt(32)
    require(n0 == n32, s"pair counts diverged: $n0 vs $n32")
    println(f"[salt-probe] pairs=${n0.head} unsalted=$t0s%.1f s salted(32)=$t32s%.1f s speedup=${t0s / t32s}%.2fx")

    // Scenario 2 — MEASURED skew → recommendSalts → straggler gone.
    // 90%-one-key fixture (the ADVICE/VERDICT round-12 recipe): 90% of
    // 60k rows share ONE blocking key (≈1.46e9 raw pairs — the same
    // magnitude as scenario 1, but now ALL in one join group), the
    // rest spread over 6k cold keys. recommendSalts forecasts the
    // straggler from per-key counts (top work share ≈ 99.999% ⇒
    // s = targetParallelism) and the salted run spreads it.
    val skewed = customer
      .filter(pmod(col("c_custkey"), lit(2)) === 0)
      // even keys mod 20 ∈ {0,2,…,18}: 9 of 10 values < 18 → 90% hot
      .select(col("c_custkey"), when(pmod(col("c_custkey"), lit(20)) < 18, lit("hot"))
        .otherwise(concat(lit("cold_"), col("c_custkey"))).as("k"))
      .localCheckpoint(true)
    val rec = Blocking.recommendSalts(
      skewed, col("k"), skewed, col("k"), targetParallelism = 32)
    println(s"[salt-probe] 90%-one-key fixture: recommended salts = $rec")
    val skewRules = BlockingRules(Seq(ComputedKeys(Seq(
      ("k", col("k_left"), col("k_right"))))))
    def timeSkew(salts: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Blocking.extractBlocks(skewed, skewed, "c_custkey", "c_custkey",
          skewRules, selfLinkage = true, hotKeySalts = salts)
        .count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    timeSkew(0); timeSkew(rec) // warm
    val skewRuns = Seq(0, rec, 0, rec).map(s => s -> timeSkew(s))
    val skewBySalt = skewRuns.groupBy(_._1).map { case (s, rs) =>
      s -> (rs.map(_._2._1).distinct, rs.map(_._2._2).min)
    }
    val (sn0, st0) = skewBySalt(0)
    val (snR, stR) = skewBySalt(rec)
    require(sn0 == snR, s"pair counts diverged: $sn0 vs $snR")
    println(f"[salt-probe] skew90 pairs=${sn0.head} unsalted=$st0%.1f s salted($rec)=$stR%.1f s speedup=${st0 / stR}%.2fx")
    spark.stop()
  }
}
