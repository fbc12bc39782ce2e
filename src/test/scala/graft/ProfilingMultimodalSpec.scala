package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Profiling}

/** Round-7 profiling + multimodal additions: autocorrelation,
  * winsorized stats, and the BMP→imageio→dHash chain.
  */
class ProfilingMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("autocorr: exact 1e6 ppm at the true period of a planted cycle") {
    val series = (0L until 30L).map(t => (t, 10L * (1 + t % 3))).toDF("t", "x")
    val got = Profiling.autocorr(series, col("t"), col("x"), Seq(1, 2, 3))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getInt(3))).toMap
    assert(got(3) == (1000000L, 1))        // perfect period-3 autocorrelation
    assert(got(1)._1 < 1000000L)
    assert(got(2)._1 < 1000000L)
  }

  test("winsorizedStats matches an independent local computation") {
    val vals = (1 to 40).map(i => (i.toLong, ((i * 37) % 100 + 1).toLong))
    val df = vals.toDF("id", "v")
    val row = Profiling.winsorizedStats(
        df.withColumn("g", lit("a")), Seq("g"), "id", col("v"), 5, 95)
      .head()
    val sorted = vals.sortBy { case (id, v) => (v, id) }.map(_._2)
    val n = sorted.length
    val lo = sorted((5 * n + 99) / 100 - 1)
    val hi = sorted((95 * n + 99) / 100 - 1)
    assert(row.getLong(1) == n)
    assert(row.getLong(2) == lo && row.getLong(3) == hi)
    assert(row.getLong(4) == sorted.count(_ < lo))
    assert(row.getLong(5) == sorted.count(_ > hi))
    assert(row.getLong(6) == sorted.map(v => math.max(lo, math.min(hi, v))).sum)
  }

  test("seasonalDecompose recovers a planted additive pattern exactly") {
    val series = (0L until 70L).map(t => (t, 100L + 10L * (t % 7))).toDF("t", "x")
    val got = Profiling.seasonalDecompose(series, col("t"), col("x"), 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // any full 7-window sums to 7·100 + 10·21 → trend = 130 everywhere;
    // resid(phase) = 100 + 10·phase − 130, constant per phase.
    for (phase <- 0L until 7L) {
      val (n, sum) = got(phase)
      assert(sum == n * (100L + 10L * phase - 130L), s"phase $phase")
    }
  }

  test("kAnonymity hand golden") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2), ("b", 2), ("c", 3))
      .toDF("q1", "q2")
    val got = Profiling.kAnonymity(df, Seq(col("q1"), col("q2")), k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map(
      3L -> (1L, 3L, false), 2L -> (1L, 2L, true), 1L -> (1L, 1L, true)))
  }

  test("noveltyScores hand golden (exact dup scores 0, partial overlap 50%)") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c x"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.noveltyScores(docs, "doc_id", col("text"), 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> (2L, 2L, 1000000L), 2L -> (2L, 0L, 0L), 3L -> (2L, 1L, 500000L)))
  }

  // Independent local dHash from the ANALYTIC pixel formula — no
  // image bytes involved; the Spark path must agree through a real
  // BMP encode + javax.imageio decode.
  private def dhashLocal(id: Long): (Long, Long) = {
    val means = Array.ofDim[Long](8, 9)
    for (r <- 0 until 8; c <- 0 until 9) {
      var s = 0L
      for (y <- r * 4 until (r + 1) * 4; x <- c * 4 until (c + 1) * 4)
        s += Multimodal.synthGray(id, x, y)
      means(r)(c) = s / 16
    }
    var d0 = 0L; var d1 = 0L
    for (bit <- 0 until 64) {
      val (r, c) = (bit / 8, bit % 8)
      if (means(r)(c) > means(r)(c + 1)) {
        if (bit < 32) d0 |= 1L << bit else d1 |= 1L << (bit - 32)
      }
    }
    (d0, d1)
  }

  test("imageDhash through real BMP bytes equals the analytic hash") {
    val ids = Seq(0L, 5L, 17L, 123L, 1001L)
    val df = ids.toDF("doc_id")
    val got = Multimodal.imageDhash(Multimodal.synthImageRecords(df, "doc_id"))
      .collect().map(h => h.id -> h).toMap
    for (id <- ids) {
      val h = got(id)
      assert((h.width, h.height) == (36, 32), s"id $id decoded dims")
      assert((h.d0, h.d1) == dhashLocal(id), s"id $id hash")
    }
  }

  test("dHash is perceptual: same-base variants near, exact bytes differ") {
    val (a, b) = (0L, 5L) // same base 0, different sparse flips
    assert(!java.util.Arrays.equals(Multimodal.synthBmp(a), Multimodal.synthBmp(b)))
    val (a0, a1) = dhashLocal(a)
    val (b0, b1) = dhashLocal(b)
    val dist = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
    assert(dist <= 16, s"same-base perceptual distance was $dist")
  }

  test("imageDhash sentinel on corrupt payloads") {
    val recs = Seq(Multimodal.MediaRecord(7L, Array[Byte](1, 2, 3), "image/bmp", Map()))
      .toDS()
    val h = Multimodal.imageDhash(recs).head()
    assert((h.width, h.height, h.d0, h.d1) == (-1, -1, 0L, 0L))
  }
}
