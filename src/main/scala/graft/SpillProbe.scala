package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Engineering probe for the q_pattern_counts SPILL CROSSOVER
  * (round-15 VERDICT item 1): the round-14 replica curve measured
  * per-pair throughput HALVING once between 129M pairs (8 customer
  * replicas, 9.0M pairs/s) and 517M pairs (16 replicas, 4.4M pairs/s),
  * then staying flat to 2B — a join/partial-agg working set crossing
  * into spill on one box. Nothing had been tried against it; this
  * probe tries the candidate mechanisms and MEASURES, same-JVM,
  * variants interleaved round-robin so machine weather cancels the
  * way the paired bench cancels it.
  *
  * Variants (all runtime-settable SQL confs or hint-shaped plan
  * changes — each a mechanism with a story for WHY it would move a
  * sort/agg working set out of spill):
  *
  *   - `p64/p128/p256`: more shuffle partitions for the pair-table
  *     stages — the sort-merge join sorts ~pairs/partitions rows per
  *     task; smaller runs fit the radix/Tungsten buffers without
  *     spilling. (AQE coalescing may fold small stages back down —
  *     that is part of what is being measured.)
  *   - `shj`: `spark.sql.join.preferSortMergeJoin=false` — the pair
  *     assembly joins a 10⁸⁺-row pair table against a dimension-sized
  *     customer table; a shuffled HASH join never sorts the pair side
  *     at all (the spill is a sort artifact, so remove the sort).
  *   - `adv16m`: AQE advisory partition size 16m (default 64m) —
  *     post-shuffle coalesced partitions stay 4× smaller, bounding
  *     every downstream operator's working set.
  *   - combinations of the above.
  *
  * Per (variant, pass) the listener records every completed stage's
  * tasks, wall time, and — the point — `memoryBytesSpilled` /
  * `diskBytesSpilled`, so the winning mechanism is attributed to the
  * spill it removed, not just a wall-clock delta.
  *
  * Usage:
  *   runMain graft.SpillProbe [replicas=16] [passes=3] [variants=csv]
  * Prints one JSON line per (variant, pass) plus a final summary line
  * (medians, spill totals, pairs/s). Committed as
  * docs/SPILL_PROBE_r15*.json.
  */
object SpillProbe {

  private val BaseDir = "/root/testdata/sf0.1"

  /** Pairs per replica-squared unit: the sf1 probe's measured 2.02M
    * pairs at replicas=1 scales as R² (fixed-cardinality blocking
    * keys — the deliberately-quadratic SCALE_PROBE contract).
    */
  private def fixtureDir(replicas: Int) = s"/tmp/graft_scale_pairs_r$replicas"

  private def buildFixture(spark: SparkSession, replicas: Int): String = {
    val dir = fixtureDir(replicas)
    val done = new java.io.File(s"$dir/_DONE_v1")
    if (!done.exists) {
      val customer = spark.read.parquet(s"$BaseDir/customer.parquet")
      val maxCustKey = customer.agg(max("c_custkey")).head.getAs[Number](0).longValue
      require(maxCustKey < 15000L,
        s"sf0.1 customer max c_custkey $maxCustKey >= replica stride 15000")
      customer
        .withColumn("__r", explode(sequence(lit(0), lit(replicas - 1))))
        .withColumn("c_custkey", col("c_custkey") + col("__r") * 15000L)
        .drop("__r")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      done.createNewFile()
    }
    dir
  }

  private class StageLog extends SparkListener {
    case class Row(id: Int, tasks: Int, ms: Long, spillMem: Long, spillDisk: Long,
        shuffleRead: Long, shuffleWrite: Long)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val info = sc.stageInfo
      val ms = (for {s <- info.submissionTime; c <- info.completionTime} yield c - s)
        .getOrElse(0L)
      val tm = info.taskMetrics
      rows.add(Row(info.stageId, info.numTasks, ms,
        tm.memoryBytesSpilled, tm.diskBytesSpilled,
        tm.shuffleReadMetrics.totalBytesRead, tm.shuffleWriteMetrics.bytesWritten))
    }
    def drain(): Seq[Row] = {
      Thread.sleep(700)
      val out = scala.collection.mutable.ArrayBuffer[Row]()
      var r = rows.poll()
      while (r != null) { out += r; r = rows.poll() }
      out.toSeq
    }
  }

  /** Variant → session-conf overrides. Empty string value = clear back
    * to the probe default (32 partitions, AQE defaults).
    */
  private val Variants: Seq[(String, Map[String, String])] = Seq(
    "base32" -> Map.empty,
    "p64" -> Map("spark.sql.shuffle.partitions" -> "64"),
    "p128" -> Map("spark.sql.shuffle.partitions" -> "128"),
    "p256" -> Map("spark.sql.shuffle.partitions" -> "256"),
    "shj32" -> Map("spark.sql.join.preferSortMergeJoin" -> "false"),
    "shj128" -> Map(
      "spark.sql.join.preferSortMergeJoin" -> "false",
      "spark.sql.shuffle.partitions" -> "128"),
    "adv16m" -> Map(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m"),
    "p128adv16m" -> Map(
      "spark.sql.shuffle.partitions" -> "128",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m"))

  private val Defaults = Map(
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.join.preferSortMergeJoin" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64MB")

  def main(args: Array[String]): Unit = {
    val replicas = args.lift(0).map(_.toInt).getOrElse(16)
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).map(_.split(",").toSet)
    val variants = Variants.filter(v => only.forall(_.contains(v._1)))
    require(variants.nonEmpty, s"no variants match $only")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = buildFixture(spark, replicas)
    val pairs = 2.02e6 * replicas * replicas // the sf1-probe model
    val log = new StageLog
    spark.sparkContext.addSparkListener(log)

    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    val spills = scala.collection.mutable.Map[String, List[Long]]()
      .withDefaultValue(Nil)
    (1 to passes).foreach { pass =>
      // alternate direction per pass — the paired-bench first-mover
      // cancellation, within one JVM
      val order = if (pass % 2 == 1) variants else variants.reverse
      order.foreach { case (name, conf) =>
        Defaults.foreach { case (k, v) =>
          spark.conf.set(k, conf.getOrElse(k, v))
        }
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        log.drain()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries("q_pattern_counts")(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val stages = log.drain()
        val spillDisk = stages.map(_.spillDisk).sum
        val spillMem = stages.map(_.spillMem).sum
        times(name) = sec :: times(name)
        spills(name) = spillDisk :: spills(name)
        val stageJson = stages.sortBy(_.id)
          .filter(s => s.ms >= 1000 || s.spillDisk > 0)
          .map { s =>
            s"""{"id":${s.id},"tasks":${s.tasks},"sec":${s.ms / 1000.0},"spill_mem_mb":${s.spillMem >> 20},"spill_disk_mb":${s.spillDisk >> 20},"shuf_read_mb":${s.shuffleRead >> 20},"shuf_write_mb":${s.shuffleWrite >> 20}}"""
          }.mkString("[", ",", "]")
        println(f"""{"metric":"spill_probe_run","variant":"$name","pass":$pass,"sec":$sec%.1f,"rows":$n,"pairs_per_sec":${(pairs / sec).toLong},"spill_disk_mb":${spillDisk >> 20},"spill_mem_mb":${spillMem >> 20},"stages":$stageJson}""")
      }
    }
    def med(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val summary = variants.map { case (name, _) =>
      val m = med(times(name))
      f""""$name":{"median_sec":$m%.1f,"pairs_per_sec":${(pairs / m).toLong},"spill_disk_mb":${spills(name).max >> 20}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"spill_probe","replicas":$replicas,"pairs":${pairs.toLong},"passes":$passes,"variants":$summary}""")
    spark.stop()
  }
}
