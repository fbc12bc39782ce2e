package graft

import org.apache.spark.sql.functions._

import graft.expr.HeavyHitters
import graft.ops.Profiling

/** Misra-Gries heavy hitters: the exactness contract (verified
  * candidates ≡ plain GROUP BY HAVING) must hold under ANY
  * partitioning — the merge path is where sketch implementations
  * usually break, so the specs sweep partition counts.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: value v_k appears ~N/k times — realistic token
    * skew with a long tail, plus a deterministic shuffle so reduce
    * order is adversarial rather than sorted.
    */
  private def zipfStream(n: Int): Seq[String] = {
    val raw = (1 to n).flatMap { k =>
      Seq.fill(n / k)(s"v$k")
    }
    // deterministic pseudo-shuffle (LCG index permutation)
    val arr = raw.toArray
    val m = arr.length
    (0 until m).map(i => arr(((i * 48271L + 11) % m).toInt))
  }

  test("heavyHitters equals exact GROUP BY HAVING across partitionings and thresholds") {
    val data = zipfStream(120) // ~650 rows, top value ~120 occurrences
    for (parts <- Seq(1, 7, 32); freqDen <- Seq(10L, 40L)) {
      val df = data.toDF("v").repartition(parts)
      val got = HeavyHitters.heavyHitters(df, col("v"), capacity = 64, freqDen = freqDen)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val n = data.size
      val thresh = n / freqDen + 1
      val want = data.groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
        .filter(_._2 >= thresh).toSet
      assert(got == want, s"parts=$parts freqDen=$freqDen thresh=$thresh")
    }
  }

  test("sketch recall guarantee: every value with freq > n/(capacity+1) is a candidate") {
    val data = zipfStream(80)
    val n = data.size
    val cap = 16
    for (parts <- Seq(1, 5, 13)) {
      val df = data.toDF("v").repartition(parts)
      val cands = HeavyHitters.heavyHitters(df, col("v"), capacity = cap, freqDen = cap + 1L)
        .collect().map(_.getString(0)).toSet
      val mustHave = data.groupBy(identity)
        .collect { case (v, vs) if vs.size.toLong > n.toLong / (cap + 1) => v }.toSet
      // heavyHitters at freqDen=cap+1 keeps exactly the guaranteed band
      assert(mustHave.subsetOf(cands), s"parts=$parts missing ${mustHave.diff(cands)}")
    }
  }

  test("exactness precondition is enforced") {
    val df = Seq("a", "b").toDF("v")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, col("v"), capacity = 4, freqDen = 6L)
    }
  }

  test("heavyHittersByGroup equals per-group exact GROUP BY HAVING") {
    val a = zipfStream(60).map(("ga", _))
    val b = zipfStream(25).map(("gb", _)) // different skew profile per group
    val data = a ++ b
    for (parts <- Seq(1, 9)) {
      val df = data.toDF("g", "v").repartition(parts)
      val got = HeavyHitters.heavyHittersByGroup(df, col("g"), col("v"),
          capacity = 32, freqDen = 12L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = data.groupBy(_._1).flatMap { case (g, rows) =>
        val n = rows.size.toLong
        rows.groupBy(_._2).collect {
          case (v, vs) if vs.size.toLong >= n / 12 + 1 => (g, v, vs.size.toLong)
        }
      }.toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("bm25: rare terms outscore common ones; tf raises score; golden value") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "rare common common filler filler"),
      (2L, "rare rare common filler filler"),
      (3L, "common filler filler filler filler"),
      (4L, "filler filler filler filler filler")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, "doc_id", col("text"), Seq("rare", "common"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // doc 4 matches nothing
    assert(out(2L) > out(1L)) // extra 'rare' occurrence raises the score
    assert(out(1L) > out(3L)) // doc with the rare term beats common-only
    // golden: doc 3, term 'common' only: tf=1, len=5, N=4, df=3, avg=5
    // idf = ln(1 + (4-3+0.5)/(3+0.5)); tfpart = (1*2.2)/(1+1.2*(0.25+0.75*1))
    val idf = math.log(1 + 1.5 / 3.5)
    val expected = BigDecimal(idf * 2.2 / (1 + 1.2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(3L) - expected) < 1e-9, s"got ${out(3L)}, want $expected")
  }

  test("chunkTokens: overlap, clamped tail, empty-doc guard, reconstruction") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                   // shorter than one chunk
      (3L, "")).toDF("doc_id", "text")                 // split("") -> [""], len 1
    val out = TextAnalysis.chunkTokens(docs, "doc_id", col("text"), chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val d1 = out.filter(_._1 == 1L)
    // offsets 0,3,6,9: windows of 4 tokens, final clamped to 1
    assert(d1.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 1L))
    // consecutive chunks share chunkTokens - stride = 1 token
    assert(d1(0)._3.split(" ").last == d1(1)._3.split(" ").head)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(_._3).toSeq == Seq("a b c"))
    // empty string: whitespace split yields one empty token (both
    // engines) -> exactly one empty chunk, pinned here
    val d3 = out.filter(_._1 == 3L)
    assert(d3.map(t => (t._3, t._4)).toSeq == Seq(("", 1L)))
    // stride-covering: every token index appears in some chunk
    val covered = d1.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 10).map(i => s"t$i").toSet)
    // parameter guards
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokens(docs, "doc_id", col("text"), 4, 5)
    }
  }

  test("keySkew: exact counts, integral ppm, deterministic tie order") {
    // 3 heavy keys + tail; ties between k2 and k3 broken by key asc
    val rows = Seq.fill(50)("hot") ++ Seq.fill(20)("k2") ++ Seq.fill(20)("k3") ++
      (1 to 10).map(i => s"t$i")
    val out = Profiling.keySkew(rows.toDF("k"), col("k"), topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.size.toLong
    assert(out.toSeq == Seq(
      ("hot", 50L, 50L * 1000000L / total, 13L),
      ("k2", 20L, 20L * 1000000L / total, 13L),
      ("k3", 20L, 20L * 1000000L / total, 13L)))
  }

  test("sigmaOutliers: integer band test matches the float z-score on hand data") {
    import spark.implicits._
    // group g: values 10,10,10,10,60 — SS=4000, μ=20,
    // σ²=(5·4000−100²)/25=400, σ=20; |60−20|=40 > 1.5σ=30 (flag),
    // |10−20|=10 (keep). group h: constant → σ=0 → nothing flagged.
    val rows = Seq(("g", 1L, 10L), ("g", 2L, 10L), ("g", 3L, 10L),
      ("g", 4L, 10L), ("g", 5L, 60L),
      ("h", 6L, 7L), ("h", 7L, 7L)).toDF("grp", "id", "v")
    val got = Profiling.sigmaOutliers(rows, Seq("grp"), col("v"), 3, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("g", 5L, 60L, 5L, 100L)))
    // float cross-check on every row of g: same verdicts
    val (n, s, ss) = (5.0, 100.0, 4000.0)
    val mu = s / n; val sigma = math.sqrt(ss / n - mu * mu)
    Seq(10L, 60L).foreach { v =>
      val wantFlag = math.abs(v - mu) > 1.5 * sigma
      assert(wantFlag == (v == 60L))
    }
  }

  test("sigmaOutliers: magnitudes at the decimal(38,0) ceiling stay exact") {
    import spark.implicits._
    // cent-scale values near 1e8: SS alone (~2e19) already overflows
    // BIGINT, and the band products reach ~1e22 — far past long, well
    // inside decimal(38,0). The planted point sits far outside the
    // (itself-inflated) 3σ band; the flag set must be exactly {it}.
    val big = (1L to 2000L).map(i => ("g", i, 100000000L + (i % 7))) :+ (("g", 9999L, 100004000L))
    val got = Profiling.sigmaOutliers(big.toDF("grp", "id", "v"), Seq("grp"), col("v"), 3, 1)
      .collect().map(_.getLong(1))
    assert(got.toSeq == Seq(9999L))
  }
}
