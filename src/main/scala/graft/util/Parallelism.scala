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
    // parallelism: `df.rdd.getNumPartitions` would force a separate
    // physical plan outside AQE on every call. Small inputs (few
    // files) get the round-robin shuffle; at real scale inputs have
    // thousands of files and this is a no-op.
    if (df.inputFiles.length < target) df.repartition(target) else df
  }
}
