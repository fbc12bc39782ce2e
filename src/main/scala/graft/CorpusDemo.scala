package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation demo — the pipeline a user of
  * the extension operators actually runs, wired from the same pieces
  * the oracle queries check one at a time:
  *
  *   documents
  *     → exact dedup keep-list        (Dedup.exactDuplicates)
  *     → near-dup candidates          (Dedup.minhashLshCandidates)
  *     → exact Jaccard verification   (Dedup.ngramJaccardPairs shape)
  *     → duplicate-cluster resolution (Clusters.resolveDuplicates)
  *     → quality + language filter    (TextAnalysis)
  *     → JSONL export                 (Etl.writeJsonl)
  *
  * Prints the funnel (rows surviving each stage). Every stage is a
  * lazy DataFrame plan — the funnel counts are the only actions.
  *
  * Usage: `sbt "runMain graft.CorpusDemo [sfDir]"`.
  */
object CorpusDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()

    // 1. Exact dedup: keep the minimum doc_id per content digest.
    val exactKept = graft.ops.Dedup.exactDuplicates(docs, "doc_id", col("text"))
      .filter(col("keep")).select("doc_id")
      .join(docs, Seq("doc_id"))
    val nExact = exactKept.count()

    // 2. Near-dup clusters over the exact-deduped corpus: LSH
    //    candidates → exact Jaccard >= 0.5 verification → connected
    //    components → keep cluster minima.
    val verified = graft.ops.Dedup.ngramJaccardPairs(
      exactKept, "doc_id", col("text"), n = 3, minJaccard = 0.5,
      maxBucketSize = Some(100L))
    val resolved = graft.ops.Clusters.resolveDuplicates(
      exactKept.select("doc_id"), "doc_id", verified)
    val nearKept = resolved.filter(col("keep")).select("doc_id")
      .join(exactKept, Seq("doc_id"))
    val nNear = nearKept.count()

    // 3. Quality gate: English-ish, sane stopword ratio, long enough.
    val quality = graft.ops.TextAnalysis.qualityColumns(col("text")).toMap
    val filtered = nearKept
      .withColumn("lang", graft.ops.TextAnalysis.languageId(col("text")))
      .withColumn("n_tokens", quality("n_tokens"))
      .withColumn("stopword_ratio", quality("stopword_ratio"))
      .filter(col("n_tokens") >= 50 && col("stopword_ratio") > 0.01)
    val nQuality = filtered.count()

    // 4. Export the curated corpus as JSONL.
    val out = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    graft.etl.Etl.writeJsonl(filtered.select("doc_id", "lang", "text"), out)

    println(f"[corpus] total           $total%6d")
    println(f"[corpus] exact-deduped   $nExact%6d  (-${total - nExact}%d exact dups)")
    println(f"[corpus] near-deduped    $nNear%6d  (-${nExact - nNear}%d near dups)")
    println(f"[corpus] quality-passed  $nQuality%6d  (-${nNear - nQuality}%d low quality)")
    println(s"[corpus] exported to $out")
    spark.stop()
  }
}
