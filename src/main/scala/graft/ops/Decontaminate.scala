package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag corpus documents that share word
  * n-grams with a benchmark (evaluation) set — the standard
  * contamination check a training-data pipeline runs before a corpus
  * ships (n-gram overlap against eval sets, as popularized by the
  * GPT-3/PaLM appendices and the Dolma toolkit; public knowledge).
  *
  * Scale shape: the BENCHMARK side is small by construction (eval sets
  * are 10³–10⁶ documents while the corpus is the 100 TB side), so its
  * distinct shingle set is broadcast and the corpus side stays a
  * map + broadcast-hash-semi-join + partial aggregation — the corpus
  * is scanned ONCE, never shuffled by shingle, and no corpus×corpus
  * or corpus×bench pair set ever materializes. With
  * `broadcastBench = false` the same plan falls back to a shuffled
  * hash join for oversized benchmark sets.
  */
object Decontaminate {

  /** Per-corpus-doc overlap report: documents sharing at least
    * `minOverlap` DISTINCT n-gram shingles with the union of all
    * benchmark shingles. Output: (idCol, n_shingles, n_overlap) where
    * `n_shingles` is the doc's distinct-shingle count — so
    * `n_overlap / n_shingles` is the contaminated fraction — and only
    * flagged docs (n_overlap ≥ minOverlap) are returned.
    *
    * Corpus docs with fewer than n tokens have no shingles and cannot
    * be flagged; they are dropped on the cheap token count up front
    * (same rationale as [[Dedup.shingleSets]]).
    */
  def overlapReport(
      corpus: DataFrame, idCol: String, corpusText: Column,
      bench: DataFrame, benchText: Column,
      n: Int, minOverlap: Long,
      broadcastBench: Boolean = true): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val benchShingles = {
      val b = bench
        .select(explode(array_distinct(Dedup.shingles(benchText, n))).as("sh"))
        .distinct()
      if (broadcastBench) broadcast(b) else b
    }
    val corpusShingles = Dedup.shingleSets(corpus, idCol, corpusText, n)
      .select(col("id"), size(col("sh")).cast("long").as("n_shingles"),
        explode(col("sh")).as("sh"))
    corpusShingles
      .join(benchShingles, Seq("sh"))
      .groupBy(col("id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col("id").as(idCol), col("n_shingles"), col("n_overlap"))
  }

  /** The keep side: the corpus minus every flagged document — what a
    * pipeline actually ships. One `left_anti` join against the
    * (flagged-ids-only) report; the anti side is tiny relative to the
    * corpus, so AQE plans it broadcast and the corpus still streams
    * through exactly once.
    */
  def filterClean(
      corpus: DataFrame, idCol: String, corpusText: Column,
      bench: DataFrame, benchText: Column,
      n: Int, minOverlap: Long,
      broadcastBench: Boolean = true): DataFrame = {
    val flagged = overlapReport(
      corpus, idCol, corpusText, bench, benchText, n, minOverlap, broadcastBench)
      .select(idCol)
    corpus.join(flagged, Seq(idCol), "left_anti")
  }
}
