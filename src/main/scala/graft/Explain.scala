package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: run one named query from [[SparkEntry.queries]],
  * print its formatted physical plan and wall time.
  *
  * Usage: `sbt "runMain graft.Explain q_ngram_jaccard /root/testdata/sf0.1"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // SPARK_GRAFT_NO_BROADCAST=1 forces the shuffled join path —
      // for inspecting the plan shape LARGE sides would take (small
      // local tables otherwise broadcast, hiding bucketing/skew
      // behavior).
      .config("spark.sql.autoBroadcastJoinThreshold",
        if (sys.env.get("SPARK_GRAFT_NO_BROADCAST").contains("1")) "-1" else "10485760")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Shuffle spill on this VM's virtio disk is burst-throttled;
      // tmpfs keeps shuffle-heavy queries off the device entirely.
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated names: run sequentially in ONE session (to
    // reproduce cross-query interactions); plan printed for the last.
    val names = name.split(",").toSeq
    names.foreach { n0 =>
      // Time construction + action together, like Bench does: eager
      // work (localCheckpoint rounds) happens at CONSTRUCTION time and
      // would silently escape an action-only timer.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n0)(spark, sfDir)
      val n = df.count()
      println(f"[explain] $n0 rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (n0 == names.last) df.explain("formatted")
    }
    spark.stop()
  }
}
