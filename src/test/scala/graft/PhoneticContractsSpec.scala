package graft

import org.apache.spark.sql.functions._
import graft.ops.{Contracts, Phonetic, Profiling}

/** Soundex blocking codes, exact OLS trend, and data-contract
  * quarantine. Cross-engine exactness is proven by the q_soundex /
  * q_trend / q_quarantine oracle rows; these pin semantics.
  */
class PhoneticContractsSpec extends SparkSpec {
  import spark.implicits._

  test("soundex: the standard published examples") {
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",   // the classic sound-alike pair
      "Tymczak" -> "T522",                       // vowel-separated repeats survive
      "Pfister" -> "P236",                       // leading same-code pair collapses
      "Honeyman" -> "H555",
      "Smith" -> "S530", "Smyth" -> "S530",
      "a" -> "A000",                             // short → zero-padded
      "O'Brien" -> "O165",                       // punctuation stripped
      "BUILDING" -> "B435")
    val got = cases.map(_._1).toDF("w")
      .select(Phonetic.soundex(col("w")).as("c")).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"soundex($in): got $g want $want")
    }
  }

  test("soundex: no letters -> NULL; case-insensitive") {
    val rows = Seq("123", "  ", "robert", "ROBERT").toDF("w")
      .select(Phonetic.soundex(col("w"))).collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getString(0) == "R163" && rows(3).getString(0) == "R163")
  }

  test("groupTrend: exact slopes incl. the truncation-toward-zero negative case") {
    val df = Seq(
      ("up", 0L, 0L), ("up", 1L, 2L), ("up", 2L, 4L),          // slope 2
      ("frac", 0L, 0L), ("frac", 1L, 1L), ("frac", 3L, 1L),    // slope 2/7
      ("neg", 0L, 0L), ("neg", 1L, -1L), ("neg", 3L, -1L),     // slope -2/7
      ("flat_x", 5L, 1L), ("flat_x", 5L, 9L)                   // den = 0 -> NULL
    ).toDF("g", "x", "y")
    val got = Profiling.groupTrend(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got("up") == ((3L, Some(2000000L))))
    assert(got("frac") == ((3L, Some(285714L))))    // 2/7 e6 truncated
    assert(got("neg") == ((3L, Some(-285714L))))    // toward zero, NOT floor(-285715)
    assert(got("flat_x") == ((2L, None)))
  }

  test("contracts: labels in rule order, NULL counts as violation, clean+quarantine partition") {
    val df = Seq(
      (1L, Some(10L), "ok"),
      (2L, Some(-5L), "ok"),      // fails positive
      (3L, None, "ok"),           // NULL -> fails positive
      (4L, Some(-1L), "bad")      // fails both
    ).toDF("id", "v", "s")
    val rules = Seq(
      "positive" -> (col("v") > 0),
      "status_ok" -> (col("s") === "ok"))
    val labeled = Contracts.applyContract(df, rules)
      .select("id", "violated_rules").as[(Long, String)].collect().toMap
    assert(labeled == Map(1L -> "", 2L -> "positive", 3L -> "positive",
      4L -> "positive,status_ok"))
    val cleanIds = Contracts.clean(df, rules).select("id").as[Long].collect().toSet
    val quarIds = Contracts.quarantine(df, rules).select("id").as[Long].collect().toSet
    assert(cleanIds == Set(1L) && quarIds == Set(2L, 3L, 4L))
    assert(!Contracts.clean(df, rules).columns.contains("violated_rules"))
  }

  test("contracts: comma in a rule name is rejected") {
    val ex = intercept[IllegalArgumentException] {
      Contracts.violations(Seq("a,b" -> lit(true)))
    }
    assert(ex.getMessage.contains("comma-free"))
  }

  test("groupCorr: exact r² ppm — perfect, anti, partial, and undefined cases") {
    val df = Seq(
      ("pos", 0L, 0L), ("pos", 1L, 2L), ("pos", 2L, 4L),       // r = 1
      ("neg", 0L, 4L), ("neg", 1L, 2L), ("neg", 2L, 0L),       // r = -1
      ("mid", 0L, 0L), ("mid", 1L, 1L), ("mid", 2L, 0L),       // r = 0  (symmetric)
      ("part", 0L, 0L), ("part", 1L, 1L), ("part", 2L, 1L),    // r² = 3/4
      ("flat", 3L, 1L), ("flat", 3L, 9L)                       // x constant -> NULL
    ).toDF("g", "x", "y")
    val got = Profiling.groupCorr(df, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3))))).toMap
    assert(got("pos") == ((3L, Some(1000000L), Some(1))))
    assert(got("neg") == ((3L, Some(1000000L), Some(-1))))
    assert(got("mid") == ((3L, Some(0L), Some(0))))
    assert(got("part") == ((3L, Some(750000L), Some(1))))      // 3/4 exactly
    assert(got("flat") == ((2L, None, None)))
  }

  test("groupCorr: matches float corr() to ppm resolution on random data") {
    val rnd = new scala.util.Random(17)
    val rows = (1 to 500).map { _ =>
      val x = rnd.nextInt(1000).toLong
      ("g", x, x / 3 + rnd.nextInt(200).toLong)   // correlated + noise
    }
    val df = rows.toDF("g", "x", "y")
    val r2 = Profiling.groupCorr(df, Seq("g"), col("x"), col("y"))
      .collect()(0).getLong(2)
    val ref = df.agg(corr(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(r2 / 1e6 - ref * ref) < 1e-5, s"r2_ppm=$r2 vs corr²=${ref * ref}")
  }

  test("minMaxScale: exact bounds, interior ppm, constant group NULL") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 14L), ("g", 3L, 30L),
      ("c", 4L, 7L), ("c", 5L, 7L)).toDF("grp", "id", "v")
    val got = Profiling.minMaxScale(df, Seq("grp"), "id", col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(1L) == Some(0L) && got(3L) == Some(1000000L))
    assert(got(2L) == Some(4L * 1000000L / 20L)) // 200000 exactly
    assert(got(4L).isEmpty && got(5L).isEmpty)
  }

  test("skyline2d: hand Pareto front — dominated dropped, (x,y) ties survive") {
    val df = Seq(
      (1L, 1L, 9L),   // front (cheapest)
      (2L, 3L, 5L),   // front
      (3L, 3L, 7L),   // dominated by 2 (same x, bigger y)
      (4L, 5L, 5L),   // dominated by 2 (same y, bigger x)
      (5L, 6L, 2L),   // front
      (6L, 6L, 2L),   // exact tie of 5 — both survive
      (7L, 8L, 3L)    // dominated by 5
    ).toDF("id", "x", "y")
    val got = Profiling.skyline2d(df, "id", col("x"), col("y"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L, 6L), s"got $got")
  }

  test("functionalDependency: holds/violated/NULL semantics, violating-row blast radius") {
    val df = Seq(
      (1L, Some("a"), "x"), (2L, Some("a"), "x"),       // key 'a' consistent
      (3L, Some("b"), "x"), (4L, Some("b"), "y"),       // key 'b' violates
      (5L, None, "z"),                                  // NULL det: excluded
      (6L, Some("c"), "x")
    ).toDF("id", "det", "dep")
    val got = Profiling.functionalDependency(df, Seq("det" -> "dep"))
      .collect()(0)
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5)) ==
      ((3L, 1L, 2L, 2L)))  // keys a,b,c; b violates with 2 images over 2 rows
    // NULL dependent conflicts with a present value
    val nulls = Seq((1L, "k", Some("x")), (2L, "k", None)).toDF("id", "det", "dep")
    val g2 = Profiling.functionalDependency(nulls, Seq("det" -> "dep")).collect()(0)
    assert(g2.getLong(3) == 1L && g2.getLong(4) == 2L)
    // the primary-key direction holds exactly
    val g3 = Profiling.functionalDependency(df, Seq("id" -> "dep")).collect()(0)
    assert(g3.getLong(3) == 0L && g3.getLong(4) == 1L)
  }

  test("weightedMedian: threshold rank, duplicate collapse, unit-weight ≡ p50, guards") {
    val df = Seq(
      ("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L),     // weight mass at 3
      ("h", 5L, 2L), ("h", 5L, 2L), ("h", 9L, 3L),      // dup 5s collapse to w=4
      ("i", 7L, 1L)
    ).toDF("grp", "v", "w")
    val got = Profiling.weightedMedian(df, Seq("grp"), col("v"), col("w"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("g") == ((3L, 12L)))  // cum 1,2,12 vs (12+1)/2=6 → v=3
    assert(got("h") == ((5L, 7L)))   // cum 4,7 vs 4 → v=5
    assert(got("i") == ((7L, 1L)))
    // unit weights reduce to the exactPercentiles p50 contract
    val vals = Seq(("u", 1L), ("u", 2L), ("u", 3L), ("u", 4L)).toDF("grp", "v")
    val wm = Profiling.weightedMedian(vals, Seq("grp"), col("v"), lit(1L))
      .collect()(0).getLong(1)
    val p50 = Profiling.exactPercentiles(vals, Seq("grp"), col("v"), Seq(50))
      .collect()(0).getLong(2)
    assert(wm == p50 && wm == 2L)
    val ex = intercept[Exception] {
      Profiling.weightedMedian(Seq(("g", 1L, 0L)).toDF("grp", "v", "w"),
        Seq("grp"), col("v"), col("w")).collect()
    }
    assert(ex.getMessage.contains("non-positive") ||
      ex.getCause != null && ex.getCause.getMessage.contains("non-positive"))
  }

  test("robustZ: outlier flagged where mean/σ z-score would be dragged; zero-MAD NULL") {
    // group g: median 10, MAD 1; the wild 1000 gets z = 990e6 while a
    // mean/σ score of the same row would be ~sqrt(n)≈2.4 "σ" only.
    val df = Seq(
      ("g", 1L, 9L), ("g", 2L, 10L), ("g", 3L, 10L), ("g", 4L, 11L), ("g", 5L, 1000L),
      ("z", 6L, 5L), ("z", 7L, 5L), ("z", 8L, 5L)                     // MAD 0
    ).toDF("grp", "id", "v")
    val got = Profiling.robustZ(df, Seq("grp"), "id", col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(5L) == Some(990000000L))
    assert(got(2L) == Some(0L) && got(3L) == Some(0L))
    assert(got(1L) == Some(-1000000L) && got(4L) == Some(1000000L))
    assert(got(6L).isEmpty && got(7L).isEmpty && got(8L).isEmpty)
  }

  test("chiSquare: exact zero on independence, χ²=n on perfect association") {
    // perfect independence: every (a,b) cell at its expected count
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val gi = Profiling.chiSquare(ind, col("a"), col("b")).collect()(0)
    assert((gi.getLong(0), gi.getLong(1), gi.getLong(2), gi.getLong(3), gi.getLong(4)) ==
      ((20L, 2L, 2L, 1L, 0L)))
    // perfect association on the diagonal: χ² = n exactly
    val assoc = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q"))).toDF("a", "b")
    val ga = Profiling.chiSquare(assoc, col("a"), col("b")).collect()(0)
    assert(ga.getLong(3) == 1L && ga.getLong(4) == 10L * 1000000L)
    // hand 2×2 vs the float formula, to micro resolution
    val mixed = (Seq.fill(6)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(3)(("y", "p")) ++ Seq.fill(9)(("y", "q"))).toDF("a", "b")
    val gm = Profiling.chiSquare(mixed, col("a"), col("b")).collect()(0).getLong(4)
    val exp = Seq((6.0, 8.0, 9.0), (2.0, 8.0, 11.0), (3.0, 12.0, 9.0), (9.0, 12.0, 11.0))
      .map { case (o, r, c) => { val e = r * c / 20.0; (o - e) * (o - e) / e } }.sum
    assert(math.abs(gm / 1e6 - exp) < 1e-4, s"got ${gm / 1e6} vs $exp")
  }

  test("groupZscore: exact ppm values, zero-variance NULL, envelope guard") {
    val df = Seq(
      ("two", 1L, 0L), ("two", 2L, 2L),                 // z = ∓1 exactly
      ("thr", 3L, 0L), ("thr", 4L, 1L), ("thr", 5L, 2L),
      ("flat", 6L, 7L), ("flat", 7L, 7L)                // σ = 0 -> NULL
    ).toDF("g", "id", "v")
    val got = Profiling.groupZscore(df, Seq("g"), "id", col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got(1L) == Some(-1000000L) && got(2L) == Some(1000000L))
    // {0,1,2}: z(2) = (2·3−3)/sqrt(3·5−9) = 3/sqrt(6)
    val z2 = math.floor(3.0 / math.sqrt(6.0) * 1e6).toLong
    assert(got(5L) == Some(z2) && got(3L) == Some(math.floor(-3.0 / math.sqrt(6.0) * 1e6).toLong))
    assert(got(4L) == Some(0L) && got(6L).isEmpty && got(7L).isEmpty)
    // mean-centered: z of the exact mean is 0; standardization is
    // shift-invariant — adding a huge offset changes nothing
    val shifted = Profiling.groupZscore(
        df.withColumn("v", col("v") + 1000000L), Seq("g"), "id", col("v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(shifted == got)
    // envelope: wide values × many rows exceed 2^53 and must raise
    val big = (1 to 80).map(i => ("g", i.toLong, i * 60000000L)).toDF("g", "id", "v")
    val ex = intercept[Exception] {
      Profiling.groupZscore(big, Seq("g"), "id", col("v")).collect()
    }
    assert(ex.getMessage.contains("envelope") ||
      ex.getCause != null && ex.getCause.getMessage.contains("envelope"))
  }

  test("groupCorr: envelope violation raises instead of silently overflowing") {
    // x ~ 1e9 over 60 rows pushes den1 = n·Σx² − (Σx)² past 3e18.
    val big = (1 to 60).map(i => ("g", i * 100000000L, i.toLong)).toDF("g", "x", "y")
    val ex = intercept[Exception] {
      Profiling.groupCorr(big, Seq("g"), col("x"), col("y")).collect()
    }
    assert(ex.getMessage.contains("envelope") ||
      ex.getCause != null && ex.getCause.getMessage.contains("envelope"))
  }
}
