package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}
import scala.util.control.NonFatal

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
    *
    * IDEMPOTENT: a plan that already carries a `repartition(>= target)`
    * anywhere (this helper is used on scan-rooted narrow frames, so a
    * found Repartition is on the data path, not a stray join branch)
    * is returned unchanged — the fact-table scan helper applies
    * `ensure` at the source, and operator-internal `ensure` calls on
    * the same frame must not stack a second full shuffle on top.
    * Only a SHUFFLING ROUND-ROBIN repartition counts as "already
    * ensured": `coalesce(n)` is a `Repartition(shuffle = false)` that
    * can only REDUCE parallelism, and a keyed
    * `RepartitionByExpression` collapses to the key's effective
    * cardinality under skew — either one sitting in the plan with
    * `numPartitions >= target` used to silently disable the guard
    * while real parallelism could be 1 (round-14 advice fix). A keyed
    * repartition counts only when it is round-robin (no partition
    * expressions — what `df.repartition(n)` lowers to on some paths).
    *
    * Scan-parallelism estimate: file COUNT alone underestimates a
    * single large file — Spark splits splittable sources into
    * `maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    * totalBytes/defaultParallelism))` chunks (FilePartition packing),
    * so a 1 GB single file already scans ~32-wide and repartitioning
    * it would pay a full-table shuffle for nothing. When the file
    * count is below target, re-estimate from the actual file sizes
    * with Spark's own split formula before deciding. (Parquet caveat:
    * splits can't cross row groups, so a pathological single-row-group
    * giant file still reads serially — default writers cap row groups
    * at 128 MB, so the estimate is right for any normal layout.)
    */
  def ensure(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val alreadyEnsured = df.queryExecution.logical.collectFirst {
      case r: Repartition if r.shuffle && r.numPartitions >= target => r
      case r: RepartitionByExpression
          if r.partitionExpressions.isEmpty &&
            r.optNumPartitions.exists(_ >= target) => r
    }.isDefined
    if (alreadyEnsured) return df
    val files = df.inputFiles
    val current =
      // No file scan under the plan (in-memory relation, range, …):
      // reuse the Dataset's OWN QueryExecution for the partition count
      // (toRdd is a lazy val on the same compiled plan the action will
      // run — df.rdd would wrap it in an extra row-conversion RDD).
      if (files.isEmpty) df.queryExecution.toRdd.getNumPartitions
      else if (files.length >= target) files.length
      else estimateScanPartitions(df, files, target)
    if (current < target) df.repartition(target) else df
  }

  /** Spark's FilePartition packing estimate from real file sizes —
    * only consulted when the file count is below target, so the
    * FileSystem listing is bounded by `target` status calls.
    */
  private def estimateScanPartitions(
      df: DataFrame, files: Array[String], target: Int): Int = {
    val spark = df.sparkSession
    try {
      val hadoopConf = spark.sparkContext.hadoopConfiguration
      val sizes = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hadoopConf).getFileStatus(p).getLen
      }
      // conf values may render as "134217728b" / "128MB" — parse with
      // Spark's own byte-string reader rather than toLong
      def bytesConf(key: String, dflt: String): Long =
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          spark.conf.get(key, dflt))
      val maxPartitionBytes = bytesConf("spark.sql.files.maxPartitionBytes", "134217728")
      val openCost = bytesConf("spark.sql.files.openCostInBytes", "4194304")
      val totalWithOpen = sizes.map(_ + openCost).sum
      val maxSplit = math.min(maxPartitionBytes,
        math.max(openCost, totalWithOpen / math.max(1, spark.sparkContext.defaultParallelism)))
      math.ceil(totalWithOpen.toDouble / math.max(1L, maxSplit)).toInt
    } catch {
      // estimate is an optimization; on any FS hiccup fall back to the
      // conservative file count (repartition fires, correctness holds).
      // NonFatal only: an OOM or interrupt mid-estimate must propagate,
      // not silently degrade to the conservative path.
      case NonFatal(_) => files.length
    }
  }
}
