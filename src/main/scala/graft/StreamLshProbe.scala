package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale/parity probe for the streaming incremental LSH dedup sink
  * ([[graft.streaming.Streams.incrementalLshCandidates]]) beyond the
  * spec's toy corpus: the full sf-dir documents table arrives as 10
  * hash-split micro-batches; the accumulated stream output must equal
  * the one-shot batch LSH self-join over the whole corpus (no bucket
  * reaches the cap at this corpus, so the batch≡stream contract is
  * exact), with per-batch wall times showing the incremental cost
  * profile — each batch pays |batch| signature work plus state-store
  * probes, never a corpus rescan.
  *
  * Usage: `sbt "runMain graft.StreamLshProbe /root/testdata/sf0.1"`;
  * output committed in docs/ROUND11_NOTES.md.
  */
object StreamLshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"))
    val rows = docs.as[(Long, String)].collect()
    println(s"docs: ${rows.length}")
    val batches = rows.groupBy(t => math.floorMod(t._1.hashCode, 10))
      .toSeq.sortBy(_._1).map(_._2.toSeq)

    val expected = graft.ops.Dedup.minhashLshCandidates(
        docs, "doc_id", col("text"), n = 3, k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"batch self-join pairs: ${expected.size}")

    val stream = MemoryStream[(Long, String)](spark)
    val out = graft.streaming.Streams.incrementalLshCandidates(
      stream.toDF().toDF("doc_id", "text"), "doc_id", col("text"),
      n = 3, k = 8, bands = 4, maxBucketSize = 1000000L)
    val q = out.writeStream.format("memory").queryName("lsh_probe")
      .outputMode("update").start()
    try {
      var prev = 0L
      batches.zipWithIndex.foreach { case (b, i) =>
        val t0 = System.nanoTime()
        stream.addData(b)
        q.processAllAvailable()
        val emitted = spark.table("lsh_probe").count()
        println(f"[stream-lsh] batch $i%2d docs=${b.size}%5d " +
          f"new_pairs=${emitted - prev}%6d wall=${(System.nanoTime() - t0) / 1e9}%5.1f s")
        prev = emitted
      }
      val got = spark.table("lsh_probe")
        .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      require(got == expected,
        s"stream/batch diverged: stream ${got.size} vs batch ${expected.size}")
      println(s"[stream-lsh] PARITY OK: ${got.size} pairs == batch self-join")
    } finally q.stop()
    spark.stop()
  }
}
