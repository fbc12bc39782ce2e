package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the COUNT-MIN SKETCH (Cormode &
  * Muthukrishnan, J.Alg 2005): a `depth × width` grid of counters
  * where each item increments one counter per row (row-salted hash);
  * a point estimate is the MIN over the item's `depth` counters —
  * always an OVERestimate (collisions only add), within `εN` with
  * probability `1 − δ` for `width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉`.
  *
  * This complements the repo's other sketch tiers: Misra–Gries
  * (q_heavy_hitters) answers "which items are frequent", HLL
  * (q_approx_distinct) answers "how many distinct" — CMS answers
  * "how frequent is THIS item" for any item, in `depth·width`
  * counters regardless of corpus size.
  *
  * Determinism: buckets come from the repo's md5 idiom
  * ([[Sampling.hashBucket]] — hex-prefix arithmetic, row index salted
  * into the digest input), and cells are exact BIGINT sums — so the
  * whole sketch, and every estimate, is a pure function of the data,
  * identical on any engine and any layout.
  *
  * Scale shape: building is ONE corpus scan → `depth`-fold explode →
  * `(row, bucket)` hash agg with map-side partials; the finished
  * sketch is `depth·width` rows. Mergeability is the sum's
  * associativity — shard sketches add cell-wise, which is exactly
  * what the partial aggregation already does. Estimation touches only
  * the probe set and BROADCASTS the sketch (it is constant-sized by
  * construction).
  */
object Sketches {

  /** Row-`r` bucket of `key` in `[0, width)`: md5 over the row-salted
    * key string, hex-prefix → BIGINT (the [[Sampling.hashBucket]]
    * arithmetic), mod `width`. */
  def cmsBucket(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$row:"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % width

  /** DuckDB mirror of [[cmsBucket]]. */
  def cmsBucketSql(keyExpr: String, row: Int, width: Int): String =
    s"CAST(('0x' || substr(md5('cms$row:' || CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT) % $width"

  /** Build the sketch cells `(row, bucket, cnt)` over one keyed,
    * optionally weighted scan. Only non-zero cells are materialized
    * (absent = 0, the [[cmsEstimates]] join coalesces). */
  def cmsCells(df: DataFrame, key: Column, depth: Int, width: Int,
      weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val rbs = (0 until depth).map(r =>
      struct(lit(r).as("row"), cmsBucket(key, r, width).as("bucket")))
    df.select(explode(array(rbs: _*)).as("rb"), weight.cast("long").as("__w"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum("__w").as("cnt"))
  }

  /** Point estimates for a probe set: `min` over the item's `depth`
    * cells. `probes` carries `keyCol` (plus any payload columns,
    * which pass through); the sketch is broadcast — it is
    * `depth·width` rows by construction. */
  def cmsEstimates(cells: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val payload = probes.columns.filter(_ != keyCol).toSeq
    val rbs = (0 until depth).map(r =>
      struct(lit(r).as("row"), cmsBucket(col(keyCol), r, width).as("bucket")))
    probes
      .select(probes.columns.map(col) :+ explode(array(rbs: _*)).as("rb"): _*)
      .select(probes.columns.map(col) :+ col("rb.row").as("row") :+
        col("rb.bucket").as("bucket"): _*)
      .join(broadcast(cells), Seq("row", "bucket"), "left")
      .groupBy(keyCol, payload: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
  }

  // ---- bloom file-skipping index ------------------------------------

  /** Bit position `i` of `key`'s Bloom membership (of `k` probes into
    * an `m`-bit filter): the row-salted md5 arithmetic again, so the
    * index is engine- and layout-independent. */
  def bloomBit(key: Column, i: Int, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"bf$i:"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long") % mBits

  /** DuckDB mirror of [[bloomBit]]. */
  def bloomBitSql(keyExpr: String, i: Int, mBits: Int): String =
    s"CAST(('0x' || substr(md5('bf$i:' || CAST($keyExpr AS VARCHAR)), 1, 15)) AS BIGINT) % $mBits"

  /** BLOOM FILE-SKIPPING INDEX (the lakehouse column-index shape:
    * Parquet bloom filters / Delta data skipping): one `mBits`-bit
    * Bloom filter PER FILE over the file's key values, stored
    * relationally as `(file, word, bits)` 32-bit half-words (the
    * [[graft.ops.Similarity.signWord]] layout — OR-safe in every
    * engine, no sign-bit hazards). A point lookup consults the index
    * and reads only files whose filter has ALL `k` bits set — no
    * false negatives ever (a set bit is never cleared), false
    * positives at the classic `(1 − e^{−kn/m})^k` rate.
    *
    * Shape: one scan → `k`-fold explode → `(file, word)` bit_or agg
    * with map-side partials (mergeable exactly like [[cmsCells]]);
    * the finished index is `files × mBits/32` rows.
    */
  def bloomIndex(df: DataFrame, fileCol: Column, key: Column,
      mBits: Int = 1024, k: Int = 3): DataFrame = {
    require(mBits >= 32 && mBits % 32 == 0, s"mBits must be a multiple of 32, got $mBits")
    require(k >= 1, s"k must be >= 1, got $k")
    val probes = (0 until k).map { i =>
      val bit = bloomBit(key, i, mBits)
      struct(floor(bit / 32).cast("long").as("word"),
        call_function("shiftleft", lit(1L), (bit % 32).cast("int")).as("mask"))
    }
    df.select(fileCol.as("file"), explode(array(probes: _*)).as("wb"))
      .groupBy(col("file"), col("wb.word").as("word"))
      .agg(expr("bit_or(wb.mask)").as("bits"))
  }

  /** Which files MAY contain each probe key: a probe passes a file
    * iff every one of its `k` bits is set in that file's filter.
    * Returns one row per `(probe key, file)` with the verdict — the
    * skip decision a reader would make. The index is broadcast (it is
    * `files × words` rows by construction); absent words mean 0.
    */
  def bloomMaybe(index: DataFrame, probes: DataFrame, keyCol: String,
      mBits: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val files = index.select("file").distinct()
    val pb = (0 until k).map { i =>
      val bit = bloomBit(col(keyCol), i, mBits)
      struct(floor(bit / 32).cast("long").as("word"),
        call_function("shiftleft", lit(1L), (bit % 32).cast("int")).as("mask"))
    }
    probes.crossJoin(broadcast(files))
      .select(probes.columns.map(col) :+ col("file") :+
        explode(array(pb: _*)).as("wb"): _*)
      .select(probes.columns.map(col) :+ col("file") :+
        col("wb.word").as("word") :+ col("wb.mask").as("mask"): _*)
      .join(broadcast(index), Seq("file", "word"), "left")
      .withColumn("__hit",
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) === col("mask"))
          .cast("long"))
      .groupBy((probes.columns :+ "file").map(col): _*)
      .agg((sum("__hit") === k).as("maybe"))
  }
}
