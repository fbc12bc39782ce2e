package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Re-derive vs share for the prefix-Jaccard trio's shingle table —
  * the measured tradeoff behind SparkEntry.qMinhashRecall's design
  * note (re-deriving the codegen'd tokenize+shingle pass beat both
  * sharing mechanisms at sf0.1: 5.6 s vs 6.4 s localCheckpoint vs
  * 13.4 s columnar cache). The round-11 verdict flagged that the
  * choice may FLIP at sf1 where tokenization dominates — this probe
  * re-measures all three variants of the recall computation (exact
  * prefix pairs + LSH candidates + semi-join, the most
  * shingle-hungry query: two full consumers of the shingle table) at
  * an arbitrary scale dir, same JVM, warm, interleaved.
  *
  * Usage: `sbt "runMain graft.ShareProbe /tmp/graft_scale_sf1"`
  * Output: one line per variant with min-of-2 warm seconds.
  */
object ShareProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def recall(sh: DataFrame): Long = {
      val exact = graft.ops.Dedup
        .ngramJaccardPairsPrefixFromShingles(sh, minJaccard = 0.5)
        .select("id_a", "id_b")
      val cand = graft.ops.Dedup.minhashLshCandidatesFromShingles(
          sh, k = 8, bands = 4, maxBucketSize = Some(100L))
        .select("id_a", "id_b")
      val hit = exact.join(cand, Seq("id_a", "id_b"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .count()
    }

    def shingles(): DataFrame =
      graft.ops.Dedup.shingleSets(docs, "doc_id", col("text"), 3)

    // Variants: the shingle table consumed twice (exact + LSH) ...
    val variants: Seq[(String, () => Long)] = Seq(
      // ... recomputed per consumer (the shipped design),
      "rederive" -> (() => recall(shingles())),
      // ... materialized once via localCheckpoint (truncates lineage,
      // bypasses AQE for downstream stage sizing),
      "checkpoint" -> (() => {
        val sh = shingles().localCheckpoint(true)
        try recall(sh) finally ()
      }),
      // ... shared through the columnar cache (pays array encoding).
      "cache" -> (() => {
        val sh = shingles().cache()
        sh.count() // materialize before the consumers race
        try recall(sh) finally { sh.unpersist(true); () }
      })
    )

    // Warm each once, then two timed interleaved rounds, report min.
    variants.foreach { case (_, f) => f() }
    val timed = (1 to 2).flatMap { _ =>
      variants.map { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    timed.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, xs) =>
      println(f"[share-probe] dir=$dir variant=$name min=${xs.map(_._2).min}%.1f s runs=${xs.map(t => f"${t._2}%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
