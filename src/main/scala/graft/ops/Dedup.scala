package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * as distributed Spark plans that survive a 100 TB corpus:
  *
  *   - exact: hash-groupBy on a content digest (one shuffle on the
  *     digest, map-side combine);
  *   - n-gram Jaccard: shingle → explode → inverted-index self-join on
  *     shared shingles → per-pair intersection counts → |∩|/(|A|+|B|−|∩|).
  *     Never materializes the full pair matrix — only pairs sharing ≥1
  *     shingle, with a frequency cap to drop stop-shingles;
  *   - MinHash + LSH: k salted-MD5 min-signatures per doc, banded into
  *     b groups; candidate pairs = equi-join on (band, band digest) —
  *     the standard sub-quadratic near-dup path;
  *   - SimHash: per-token MD5 bits weighted ±1, fingerprint = sign
  *     vector; near-dups = pairs at small Hamming distance, banded by
  *     fingerprint prefix to avoid the cross join.
  *
  * Everything is hex-MD5-based so the DuckDB oracle computes identical
  * hashes (both engines emit lowercase hex MD5); minima are taken on
  * hex STRINGS, which is a valid uniform minhash (lexicographic order
  * on uniform hex = order on the underlying integer).
  */
object Dedup {

  /** Exact-duplicate summary over a content digest. */
  def exactSummary(df: DataFrame, text: Column): DataFrame =
    df.select(md5(text).as("digest"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("digest")).as("n_unique"))

  /** Word n-gram shingles over a MATERIALIZED token-array column
    * (n ≥ 1); the empty array when the document has fewer than n
    * tokens.
    *
    * `toks` must be a bound attribute, not an inline `split(...)`
    * expression: expressions referenced inside the transform lambda are
    * re-evaluated per element, turning shingling into O(tokens²) per
    * document (measured 40× on the 400-token documents corpus).
    */
  def shinglesFromTokens(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      val idx = sequence(lit(0), size(toks) - n) // 0-based subscripts
      when(size(toks) >= n,
        transform(idx, i => concat_ws(" ", (0 until n).map(j => element_at(toks, (i + j + 1).cast("int"))): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Convenience inline form — ONLY for one-shot use on small inputs;
    * pair pipelines materialize the tokens first (see above).
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(split(text, " "), n)

  /** DuckDB mirror of [[shingles]] (1-based list subscripts). */
  def shinglesSql(textExpr: String, n: Int): String = {
    val toks = s"string_split($textExpr, ' ')"
    if (n == 1) toks
    else {
      val parts = (0 until n).map(j => s"t[i + $j]").mkString(" || ' ' || ")
      s"""CASE WHEN len($toks) >= $n THEN
         |  (SELECT list_transform(generate_series(1, len(t) - ${n - 1}), i -> $parts) FROM (SELECT $toks AS t))
         |ELSE [] END""".stripMargin.replace("\n", " ")
    }
  }

  /** Distinct-shingle inverted index: (shingle, id). The `maxDocFreq`
    * cap drops shingles appearing in more than that many documents —
    * stop-shingles explode the inverted index quadratically at scale
    * (a shingle shared by f docs yields f² candidate pairs). The cap
    * is applied as a broadcast ANTI-join against the (small) list of
    * over-frequent shingles: the index itself is never window-shuffled,
    * and partial aggregation keeps the frequency count map-side.
    */
  def invertedIndex(df: DataFrame, idCol: String, shingleCol: Column,
      maxDocFreq: Option[Long] = None): DataFrame = {
    val idx = df
      .select(col(idCol), explode(array_distinct(shingleCol)).as("shingle"))
    maxDocFreq.fold(idx) { cap =>
      val hot = idx.groupBy("shingle").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > cap).select("shingle")
      // using-column joins move the key first — re-pin (id, shingle)
      // order so downstream positional renames stay correct.
      idx.join(broadcast(hot), Seq("shingle"), "left_anti")
        .select(col(idCol), col("shingle"))
    }
  }

  /** n-gram Jaccard near-duplicate pairs: only pairs sharing at least
    * one (non-capped) shingle are generated. Output:
    * (id_a, id_b, inter, size_a, size_b, jaccard) with id_a < id_b.
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, text: Column, n: Int,
      minJaccard: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    val sh = graft.util.Parallelism.ensure(df)
      .select(col(idCol).as("id"), split(text, " ").as("__toks"))
      .select(col("id"), array_distinct(shinglesFromTokens(col("__toks"), n)).as("sh"))
    // Persist the exploded index: FOUR consumers downstream (doc sizes,
    // hot-shingle list, both join sides) would otherwise re-run the
    // shingling subtree each — the single most expensive stage. This is
    // the reference's copy_to materialization (scratch.R:29) done
    // Spark-style; MEMORY_AND_DISK so a 100 TB index spills, not OOMs.
    val idx = sh.select(col("id"), explode(col("sh")).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Distinct-shingle count per doc, straight from the index (shingle
    // arrays are already distinct).
    val sizes = idx.groupBy("id").agg(count(lit(1)).as("sz"))
    val inv = maxDocFreq.fold(idx) { cap =>
      val hot = idx.groupBy("shingle").agg(count(lit(1)).as("__df"))
        .filter(col("__df") > cap).select("shingle")
      idx.join(broadcast(hot), Seq("shingle"), "left_anti")
        .select(col("id"), col("shingle"))
    }
    val a = inv.toDF("id_a", "shingle")
    val b = inv.toDF("id_b", "shingle")
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_a", "size_a"), Seq("id_a"))
      .join(sizes.toDF("id_b", "size_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("size_a") + col("size_b") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
  }

  private val MhP = 2147483647L // 2^31 − 1

  /** Base shingle hash for minhash: first 15 hex digits of MD5 (60
    * bits) reduced mod 2³¹−1. One MD5 per shingle; the k permutations
    * are cheap affine mixes of this base (universal hashing), not k
    * fresh digests — at 100 TB this is the difference between 1× and
    * k× hashing the corpus.
    */
  def shingleBaseHash(s: Column): Column =
    pmod(conv(substring(md5(s), 1, 15), 16, 10).cast("long"), lit(MhP))

  def shingleBaseHashSql(sExpr: String): String =
    s"CAST(('0x' || substr(md5($sExpr), 1, 15)) AS BIGINT) % $MhP"

  /** Per-permutation mix: (aᵢ·h + bᵢ) mod P with fixed odd multipliers;
    * products stay below 2⁶². */
  def minhashMix(h: Column, i: Int): Column =
    pmod(h * lit(2 * i + 1001L) + lit(i * 9176L + 17L), lit(MhP))

  def minhashMixSql(hExpr: String, i: Int): String =
    s"(($hExpr) * ${2 * i + 1001L} + ${i * 9176L + 17L}) % $MhP"

  /** MinHash signature columns over a PRE-HASHED shingle array
    * (array<long> of [[shingleBaseHash]] values — materialize it once
    * so the MD5 pass isn't repeated per permutation):
    * sig_i = min over hashes of mix_i(h), i = 0..k−1.
    */
  def minhashSignature(hashCol: Column, k: Int): Seq[(String, Column)] =
    (0 until k).map { i =>
      s"sig_$i" -> array_min(transform(hashCol, h => minhashMix(h, i)))
    }

  /** LSH band digests over a minhash signature: band_j = md5 of the
    * r signatures in band j joined with '|'.
    */
  def lshBands(sigCols: Seq[String], bands: Int): Seq[(String, Column)] = {
    require(sigCols.size % bands == 0, "k must be divisible by bands")
    val r = sigCols.size / bands
    (0 until bands).map { j =>
      s"band_$j" -> md5(concat_ws("|", sigCols.slice(j * r, j * r + r).map(col): _*))
    }
  }

  /** MinHash-LSH candidate pairs: docs sharing any band digest.
    * Output (id_a, id_b) distinct, id_a < id_b. The join is a plain
    * shuffled equi-join on (band index, digest) — sub-quadratic as
    * long as band buckets stay small; at 100 TB add a bucket-size cap
    * exactly like the Jaccard doc-frequency cap.
    */
  def minhashLshCandidates(
      df: DataFrame, idCol: String, text: Column, n: Int, k: Int, bands: Int): DataFrame = {
    // Filter on the CHEAP precondition (token count) before shingling:
    // a filter on size(sh) would be predicate-pushed below the shingle
    // projection, re-inlining the O(tokens²) expression into an
    // interpreted Filter (observed: one task pinned for minutes).
    val sh = graft.util.Parallelism.ensure(df.filter(size(split(text, " ")) >= n))
      .select(col(idCol).as("id"), split(text, " ").as("__toks"))
      .select(col("id"), array_distinct(shinglesFromTokens(col("__toks"), n)).as("sh"))
      .withColumn("__h", transform(col("sh"), s => shingleBaseHash(s)))
    val withSig = minhashSignature(col("__h"), k).foldLeft(sh) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    val withBands = lshBands((0 until k).map(i => s"sig_$i"), bands).foldLeft(withSig) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    val long = withBands.select(col("id"),
      explode(array((0 until bands).map(j =>
        struct(lit(j).as("band"), col(s"band_$j").as("digest"))): _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.digest").as("digest"))
    val l = long.toDF("id_a", "band", "digest")
    val r = long.toDF("id_b", "band", "digest")
    l.join(r, Seq("band", "digest"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Per-token 16-bit codes for simhash: first 4 hex digits of MD5.
    * Materialize this as a column before [[simhashFromCodes]] — the
    * fingerprint references the code array once per bit.
    */
  def tokenCodes(text: Column): Column =
    transform(split(text, " "), w => conv(substring(md5(w), 1, 4), 16, 10).cast("long"))

  /** SimHash fingerprint from a materialized code-array column: bit b
    * is set when Σ_tokens (±1 by token bit b) > 0. Folds are
    * sequential in both engines.
    */
  def simhashFromCodes(codes: Column, bits: Int = 16): Column = {
    val bitCols = (0 until bits).map { b =>
      when(aggregate(codes, lit(0L),
        (acc, x) => acc + when(shiftright(x, b) % 2 === 1, 1L).otherwise(-1L)) > 0,
        lit(1L << b)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Convenience inline form (recomputes the MD5 pass per bit — use
    * [[simhashFromCodes]] over a materialized [[tokenCodes]] column in
    * anything hot).
    */
  def simhash(text: Column, bits: Int = 16): Column =
    simhashFromCodes(tokenCodes(text), bits)

  /** DuckDB mirror of [[simhash]]. */
  def simhashSql(textExpr: String, bits: Int = 16): String = {
    val codes =
      s"list_transform(string_split($textExpr, ' '), w -> CAST(('0x' || substr(md5(w), 1, 4)) AS BIGINT))"
    val bitTerms = (0 until bits).map { b =>
      s"""(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), $codes),
         |  (acc, x) -> acc + (CASE WHEN (x >> $b) % 2 = 1 THEN 1 ELSE -1 END)) > 0
         |  THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)""".stripMargin.replace("\n", " ")
    }
    bitTerms.mkString("(", " + ", ")")
  }

  /** SimHash near-dup pairs banded by fingerprint high byte (standard
    * band trick: near-identical docs agree on every band; scanning
    * only same-band pairs avoids the cross join). Output
    * (id_a, id_b, hamming ≤ maxHamming).
    */
  def simhashNearDups(
      df: DataFrame, idCol: String, text: Column, maxHamming: Int, bits: Int = 16): DataFrame = {
    val fp = graft.util.Parallelism.ensure(df)
      .select(col(idCol).as("id"), tokenCodes(text).as("__codes"))
      .select(col("id"), simhashFromCodes(col("__codes"), bits).as("fp"))
      .withColumn("band", shiftright(col("fp"), bits / 2))
    val a = fp.toDF("id_a", "fp_a", "band")
    val b = fp.toDF("id_b", "fp_b", "band")
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
