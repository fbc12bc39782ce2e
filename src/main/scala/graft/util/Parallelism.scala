package graft.util

import org.apache.spark.sql.DataFrame

object Parallelism {

  /** Round-robin repartition up to the session's shuffle parallelism
    * when the plan currently has fewer partitions.
    *
    * Small parquet inputs read as 1–2 partitions, and every downstream
    * compute-heavy narrow stage (shingling, hashing, pair fan-out)
    * inherits that parallelism — one task does all the work while 31
    * threads idle (observed via jstack). AQE can't fix this: its
    * coalescing is byte-based and blind to compute fan-out. At real
    * scale inputs have thousands of partitions and this is a no-op;
    * when it does fire, the shuffle it adds is of the SMALL input.
    */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Leaf file count is a cheap upper-bound proxy for scan
    // parallelism on SCAN-ROOTED plans (`df.rdd.getNumPartitions`
    // would force a separate physical plan outside AQE on every
    // call). It is only a FAST PATH: a post-join/aggregate or
    // in-memory frame reports zero input files, and unconditionally
    // repartitioning those would add a full round-robin shuffle to
    // data that is usually already shuffle-partitioned — for them,
    // fall back to the actual partition count and pay the one-off
    // planning cost.
    val files = df.inputFiles
    val current = if (files.nonEmpty) files.length else df.rdd.getNumPartitions
    if (current < target) df.repartition(target) else df
  }
}
