package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Decontaminate, Windows}

/** Specs for the SQL function surface (GraftFunctions/GraftExtensions)
  * and the keyed window operators (sessionize / groupedTopK).
  */
class ExtensionsWindowsSpec extends SparkSpec {
  import spark.implicits._

  test("sql surface: registered functions evaluate like the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT jaro_winkler_similarity('martha', 'marhta') AS jw,
        |       dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                   array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |       top_token_count(split('a b a c a', ' ')) AS top,
        |       token_fingerprint(split('b a b', ' ')) AS fp,
        |       word_shingles(split('a b c', ' '), 2) AS sh,
        |       minhash_signature(shingle_hashes(split('a b c d', ' ')), 4) AS sig""".stripMargin)
      .head()
    assert(math.abs(r.getAs[Double]("jw") - 0.9611111111111111) < 1e-15)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Long]("top") == 3L)
    val fpViaCol = Seq("b a b").toDF("text")
      .select(graft.ops.TextAnalysis.fingerprint(col("text"))).head().getLong(0)
    assert(r.getAs[Long]("fp") == fpViaCol)
    assert(r.getAs[scala.collection.Seq[String]]("sh").toSeq == Seq("a b", "b c"))
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length == 4)
  }

  test("sql surface: column API and SQL spelling produce identical values") {
    GraftFunctions.register(spark)
    val df = Seq(("jellyfish", "smellyfish"), ("dwayne", "duane"), ("", "x"))
      .toDF("a", "b")
    val viaCol = df.select(graft.expr.JaroWinkler.jaro_winkler(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql("SELECT jaro_winkler_similarity(a, b) FROM jw_pairs")
      .collect().map(_.getDouble(0))
    assert(viaCol.toSeq == viaSql.toSeq)
  }

  test("sql surface: extensions class injects the same function table") {
    // A fresh SparkSession over the shared context picks up extensions
    // at build time — the cluster deployment path
    // (--conf spark.sql.extensions=graft.GraftExtensions).
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = s2.sql("SELECT jaro_winkler_similarity('abc', 'abc')").head().getDouble(0)
      assert(v == 1.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("sessionize: gaps split sessions per key, first row starts one") {
    val ev = Seq(
      (1L, 0L), (1L, 100L), (1L, 2100L), (1L, 2200L), // user 1: 2 sessions (gap 2000 > 1000)
      (2L, 50L), // user 2: singleton
      (3L, 0L), (3L, 1000L), (3L, 2000L) // user 3: gap == maxGap never splits
    ).toDF("user_id", "t")
    val got = Windows.sessionize(ev, Seq("user_id"), "t", maxGap = 1000L)
      .select("user_id", "t", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 0L, 1L), (1L, 100L, 1L), (1L, 2100L, 2L), (1L, 2200L, 2L),
      (2L, 50L, 1L),
      (3L, 0L, 1L), (3L, 1000L, 1L), (3L, 2000L, 1L)))
  }

  test("sessionize: summary aggregates per session") {
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 5000L)).toDF("user_id", "t")
    val got = Windows.sessionSummary(ev, Seq("user_id"), "t", maxGap = 1000L)
      .orderBy("session_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 2L, 0L, 100L), (2L, 1L, 5000L, 5000L)))
  }

  test("groupedTopK: k per group, ordered desc, deterministic ties") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
      ("b", 5L, 1.0)
    ).toDF("g", "id", "score")
    val got = Windows.groupedTopK(df, Seq("g"), col("score"), Seq(col("id")), k = 2)
      .select("g", "id", "rnk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    // score ties (id 2 and 4 at 30.0) resolve by min id first.
    assert(got == Set(("a", 2L, 1), ("a", 4L, 2), ("b", 5L, 1)))
  }

  test("decontaminate: filterClean = corpus minus flagged, short docs kept") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // contaminated
      (2L, "totally unrelated words with no overlap at all"),
      (3L, "xy") // < n tokens: no shingles, must be KEPT
    ).toDF("doc_id", "text")
    val bench = Seq((99L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val kept = Decontaminate.filterClean(
        corpus, "doc_id", col("text"), bench, col("text"), n = 3, minOverlap = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("packChunks: chunk = concat position / budget, per shard, exact") {
    // shard A doc sizes 300, 300, 500 with budget 512:
    //   doc 1 starts at 0   -> chunk 0, offset 0
    //   doc 2 starts at 300 -> chunk 0, offset 300
    //   doc 3 starts at 600 -> chunk 1, offset 88
    // shard B restarts the concatenation.
    val docs = Seq(
      ("A", 1L, 300L), ("A", 2L, 300L), ("A", 3L, 500L),
      ("B", 9L, 1030L), ("B", 10L, 2L)
    ).toDF("shard", "doc_id", "n_tokens")
    val out = graft.ops.Windows.packChunks(docs, "shard", "doc_id", "n_tokens", 512L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(("A", 1L)) == ((0L, 0L)))
    assert(out(("A", 2L)) == ((0L, 300L)))
    assert(out(("A", 3L)) == ((1L, 88L)))
    assert(out(("B", 9L)) == ((0L, 0L)))
    assert(out(("B", 10L)) == ((2L, 6L))) // 1030 = 2*512 + 6
  }

  test("funnel: stages count only in-order completions") {
    // user 1: view(10) -> click(20) -> purchase(30): completes all 3.
    // user 2: click(5) BEFORE view(10), clicks again(15): view->click ok,
    //         purchase(12) sits between view and click -> NOT counted.
    // user 3: view only.
    // user 4: purchase/click but never a view -> counted nowhere.
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 12L), (2L, "click", 15L),
      (3L, "view", 99L),
      (4L, "click", 1L), (4L, "purchase", 2L)
    ).toDF("user_id", "event_type", "ts")
    val got = graft.ops.Windows.funnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(("view", 0, 3L), ("click", 1, 2L), ("purchase", 2, 1L)))
    // ties are NOT conversions: stage k must be strictly after k-1
    val tie = Seq((9L, "view", 10L), (9L, "click", 10L)).toDF("user_id", "event_type", "ts")
    val got2 = graft.ops.Windows.funnel(tie, "user_id", "event_type", "ts",
        Seq("view", "click"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(got2 == Set(("view", 1L), ("click", 0L)))
  }

  test("packChunks: chunk ids exact past 2^53 cumulative tokens") {
    // Mirror of JoinsSpec's 2^63-scale bandJoin bin test. doc 2 starts
    // at 9.1e18 tokens; with budget 997 the chunk-id numerator
    // 9099999999999999049 is not representable as a double (ulp at this
    // magnitude is 1024), and double division truncates to
    // 9127382146439316 — one below the exact 9127382146439317. The
    // decimal floor-div must get it right.
    val start2 = 9100000000000000000L
    val budget = 997L
    val docs = Seq(("A", 1L, start2), ("A", 2L, 41L)).toDF("shard", "doc_id", "n_tokens")
    val out = graft.ops.Windows.packChunks(docs, "shard", "doc_id", "n_tokens", budget)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(("A", 1L)) == ((0L, 0L)))
    val expOffset = start2 % budget              // 951
    val expChunk = (start2 - expOffset) / budget // 9127382146439317 (exact long math)
    assert(expChunk == 9127382146439317L)
    assert(out(("A", 2L)) == ((expChunk, expOffset)))
  }

  test("denseIds: equals global row_number, stable under layout, spans partitions") {
    import org.apache.spark.sql.functions._
    val keys = scala.util.Random.shuffle((1L to 500L).toList)
    val df = keys.map(k => (k, s"v$k")).toDF("k", "v")
    val a = graft.ops.Windows.denseIds(df, "k", numPartitions = 7)
    val got = a.select("k", "row_id").as[(Long, Long)].collect().toMap
    assert(got == (1L to 500L).map(k => k -> k).toMap) // keys are 1..500 → id == key
    // multiple partitions actually used (no single-task collapse)
    val nParts = a.select(spark_partition_id()).distinct().count()
    assert(nParts > 1, s"expected multi-partition numbering, got $nParts")
    val b = graft.ops.Windows.denseIds(df.repartition(13), "k", numPartitions = 3)
    assert(b.select("k", "row_id").as[(Long, Long)].collect().toMap == got)
  }

  test("denseIds: more partitions than rows; id column collision rejected") {
    import org.apache.spark.sql.functions._
    val tiny = Seq(10L, 20L).toDF("k")
    val got = graft.ops.Windows.denseIds(tiny, "k", numPartitions = 8)
      .select("k", "row_id").as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 1L, 20L -> 2L))
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Windows.denseIds(tiny.withColumn("row_id", lit(1)), "k")
    }
    assert(ex.getMessage.contains("already exists"))
  }

  test("denseIdsBy: composite descending order — the vocabulary shape") {
    import org.apache.spark.sql.functions._
    val counts = Seq(("the", 50L), ("a", 50L), ("of", 30L), ("zz", 10L)).toDF("tok", "cnt")
    val got = graft.ops.Windows.denseIdsBy(
        counts, Seq(col("cnt").desc, col("tok").asc), "token_id", numPartitions = 3)
      .select("tok", "token_id").as[(String, Long)].collect().toMap
    // cnt desc, tok asc: ties on 50 break alphabetically
    assert(got == Map("a" -> 1L, "the" -> 2L, "of" -> 3L, "zz" -> 4L))
  }

  test("orderedPrefixSum: equals the global ordered window, any layout") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 97L).map(i => (i, (i * 37) % 11 + 1)) // (k, w)
    val df = rows.toDF("k", "w").repartition(7)
    val got = graft.ops.Windows.orderedPrefixSum(
        df, Seq(col("w").asc, col("k").asc), "w", "rk", "cum", numPartitions = 5)
      .select("k", "rk", "cum").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // Oracle: driver-side sort by (w, k) + running sum.
    var acc = 0L
    val want = rows.sortBy { case (k, w) => (w, k) }.zipWithIndex.map {
      case ((k, w), i) => acc += w; k -> (i + 1L, acc)
    }.toMap
    assert(got == want)
  }

  test("denseIdsBy / orderedPrefixSum: parity at numPartitions = 2000 (cluster shape)") {
    // Round-9 item #8 done criterion: the broadcast (pid → offset) join
    // must hold far past toy partition counts — 2000 range partitions is
    // the thousands-of-tasks shape a real cluster produces. Most
    // partitions are empty or single-row here; offsets must still fold
    // correctly across them.
    import org.apache.spark.sql.functions._
    val rows = scala.util.Random.shuffle((1L to 5000L).toList).map(k => (k, k % 13 + 1))
    val df = rows.toDF("k", "w").repartition(64)
    val ids = graft.ops.Windows.denseIdsBy(df, Seq(col("k").asc), "row_id",
        numPartitions = 2000)
      .select("k", "row_id").as[(Long, Long)].collect().toMap
    assert(ids == (1L to 5000L).map(k => k -> k).toMap)
    val got = graft.ops.Windows.orderedPrefixSum(
        df, Seq(col("k").asc), "w", "rk", "cum", numPartitions = 2000)
      .select("k", "rk", "cum").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    var acc = 0L
    val want = rows.sortBy(_._1).zipWithIndex.map { case ((k, w), i) =>
      acc += w; k -> (i + 1L, acc)
    }.toMap
    assert(got == want)
  }

  test("orderedPrefixSum: non-integral value column fails loudly") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 0.5), (2L, 1.5)).toDF("k", "w")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Windows.orderedPrefixSum(df, Seq(col("k").asc), "w")
    }
    assert(ex.getMessage.contains("must be an integral type"))
    assert(ex.getMessage.contains("double"))
  }

  test("orderedPrefixSum: NULL values — all-NULL partitions, NULL-prefix semantics") {
    // Global-window parity for NULLs: sum(v) OVER (ORDER BY … ROWS
    // UNBOUNDED PRECEDING) is NULL while the frame has seen no non-NULL
    // value, then sums over non-NULLs. With 12 range partitions over
    // k = 1..60 and v NULL for k <= 30, several leading partitions are
    // entirely NULL — the offset fold must not NPE and rows in that
    // prefix must stay NULL, not become 0.
    import org.apache.spark.sql.functions._
    val rows = (1L to 60L).map(k => (k, if (k <= 30) None else Some(k)))
    val df = rows.toDF("k", "v").repartition(5)
    val got = graft.ops.Windows.orderedPrefixSum(
        df, Seq(col("k").asc), "v", "rk", "cum", numPartitions = 12)
      .select("k", "rk", "cum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    var acc = 0L
    val want = rows.map { case (k, v) =>
      v.foreach(acc += _)
      k -> (k, if (k <= 30) None else Some(acc))
    }.toMap
    assert(got == want)
    // Mixed NULLs inside a partition: skipped by the sum, rank still dense.
    val mixed = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L))).toDF("k", "v")
    val m = graft.ops.Windows.orderedPrefixSum(
        mixed, Seq(col("k").asc), "v", "rk", "cum", numPartitions = 2)
      .select("k", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("denseIdsBy / orderedPrefixSum: reserved temp column names rejected") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2L)).toDF("k", "w")
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.Windows.denseIdsBy(df.withColumn("__off", lit(0)), Seq(col("k").asc))
    }
    assert(e1.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Windows.orderedPrefixSum(
        df.withColumn("__locals", lit(0)), Seq(col("k").asc), "w")
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("snapshotDiff: added/removed/changed/same classification") {
    import org.apache.spark.sql.functions._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "body")
    val v2 = Seq((2L, "beta"), (3L, "gamma EDIT"), (4L, "delta")).toDF("id", "body")
    val got = graft.etl.Etl.snapshotDiff(v1, v2, "id", Seq("body"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "same", 3L -> "changed", 4L -> "added"))
  }

  test("resampleLocf: grid carry-forward, on-grid obs, tie collapse, empty spans") {
    import org.apache.spark.sql.functions._
    val obs = Seq(
      // key "a": obs at 5 (two rows — tie collapses to max event_id),
      // 20 (on-grid), 37; span 5..37, step 10 → grid 10,20,30
      ("a", 5L, 1.0, 1L), ("a", 5L, 9.0, 2L), ("a", 20L, 2.0, 3L), ("a", 37L, 3.0, 4L),
      // key "b": span 5..7 holds NO grid instant → zero rows
      ("b", 5L, 4.0, 5L), ("b", 7L, 5.0, 6L),
      // key "c": null values are gaps, not observations
      ("c", 8L, Double.NaN, 7L), ("c", 14L, 6.0, 8L), ("c", 27L, 7.0, 9L))
      .toDF("k", "t", "v", "e")
      .withColumn("v", when(isnan(col("v")), lit(null)).otherwise(col("v")))
    val got = graft.ops.Windows.resampleLocf(obs, Seq("k"), "t", "v", "e", step = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(
      ("a", 10L, 9.0), // tie at t=5 carried the max-event_id value
      ("a", 20L, 2.0), // on-grid observation carries itself
      ("a", 30L, 2.0),
      ("c", 20L, 6.0))) // grid starts at first NON-NULL obs (14 → ceil 20)
  }

  test("scdHistory: versions chain per key, open tail, keys isolated") {
    import org.apache.spark.sql.functions._
    val log = Seq(
      ("a", 1L, "new"), ("a", 5L, "active"), ("a", 9L, "churned"),
      ("b", 3L, "new")).toDF("key", "ts", "status")
    val got = graft.ops.Windows.scdHistory(log, Seq("key"), "ts")
      .select("key", "ts", "valid_from", "valid_to")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == Set(
      ("a", 1L, 1L, Some(5L)), ("a", 5L, 5L, Some(9L)), ("a", 9L, 9L, None),
      ("b", 3L, 3L, None)))
  }

  test("streaks: islands, duplicates collapse, length ties break to the latest streak") {
    // period = 10: key a active in periods {1,2,3, 5, 7,8} (multiple
    // events inside a period count once), key b in {10} only.
    val df = Seq(
      ("a", 10L), ("a", 12L), ("a", 19L),  // period 1 (duplicates)
      ("a", 20L), ("a", 30L),              // periods 2,3 -> run 1..3
      ("a", 50L),                          // period 5
      ("a", 70L), ("a", 80L),              // periods 7,8
      ("b", 100L)).toDF("k", "t")
    val got = graft.ops.Windows.streaks(df, Seq("k"), "t", 10L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") == ((6L, 3L, 3L, 3L)))   // 6 active, 3 streaks, best 1..3
    assert(got("b") == ((1L, 1L, 1L, 10L)))
    // tie: two streaks of length 2 -> longest_end is the LATER one
    val tie = Seq(("c", 10L), ("c", 20L), ("c", 50L), ("c", 60L)).toDF("k", "t")
    val gt = graft.ops.Windows.streaks(tie, Seq("k"), "t", 10L).collect()(0)
    assert((gt.getLong(1), gt.getLong(2), gt.getLong(3), gt.getLong(4)) ==
      ((4L, 2L, 2L, 6L)))
  }

  test("stateDurations: runs collapse, transitions split, singleton keys") {
    val df = Seq(
      ("u", 1L, "run"), ("u", 3L, "run"), ("u", 5L, "fail"),
      ("u", 7L, "run"),                          // back to run = NEW episode
      ("v", 2L, "idle")).toDF("k", "t", "s")
    val got = graft.ops.Windows.stateDurations(df, Seq("k"), "t", "s")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("u", 1L)) == (("run", 1L, 3L, 2L)))
    assert(got(("u", 2L)) == (("fail", 5L, 5L, 1L)))
    assert(got(("u", 3L)) == (("run", 7L, 7L, 1L)))  // NOT merged with episode 1
    assert(got(("v", 1L)) == (("idle", 2L, 2L, 1L)))
    assert(got.size == 4)
  }

  test("resampleLinear: interpolation, on-grid observations, tail LOCF, truncation") {
    // key a: obs (0, 100), (30, 160) with grid step 10: samples at
    // 0, 10, 20, 30 → 100, 120, 140, 160 exactly.
    val df = Seq(
      ("a", 0L, 100L, 1L), ("a", 30L, 160L, 2L),
      ("b", 5L, 10L, 3L), ("b", 12L, 17L, 4L), ("b", 26L, 1L, 5L)
    ).toDF("k", "t", "v", "tie")
    val got = graft.ops.Windows.resampleLinear(df, Seq("k"), "t", "v", "tie", 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("a", 0L)) == 100L && got(("a", 10L)) == 120L &&
      got(("a", 20L)) == 140L && got(("a", 30L)) == 160L)
    // key b: grid 10, 20; t=10 between (5,10) and (12,17): (10·2+17·5)/7
    assert(got(("b", 10L)) == (10L * 2 + 17L * 5) / 7)
    // t=20 between (12,17) and (26,1): (17·6 + 1·8)/14 = 110/14 = 7 (trunc)
    assert(got(("b", 20L)) == 7L)
    // tail LOCF: append an obs past the last grid instant — the grid
    // instant AT the last obs reads it exactly
    val tail = Seq(("c", 0L, 5L, 1L), ("c", 10L, 9L, 2L), ("c", 14L, 99L, 3L))
      .toDF("k", "t", "v", "tie")
    val gt = graft.ops.Windows.resampleLinear(tail, Seq("k"), "t", "v", "tie", 10L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(gt(0L) == 5L && gt(10L) == (9L * 4 + 99L * 0) / 4 + 0)
    assert(gt(10L) == 9L) // on-grid obs value carried exactly
  }

  test("kaplanMeier: textbook curve, censoring raises survival, terminal sentinel") {
    // classic toy: durations 1,2,2,3 with the 3 censored at t=2… use:
    // events at t=1 (1 of 4 at risk), t=3 (1 of 2 at risk); censored
    // at t=2 leaves the risk set without a factor.
    val df = Seq((1L, true), (2L, false), (3L, true), (3L, false))
      .toDF("dur", "event")
    val got = graft.ops.Windows.kaplanMeier(df, "dur", col("event"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def unat(x: Double) = math.floor(math.log(x) * 1e6).toLong
    assert(got(1L) == ((4L, 1L, unat(3.0 / 4.0))))
    assert(got(3L) == ((2L, 1L, unat(3.0 / 4.0) + unat(1.0 / 2.0))))
    assert(!got.contains(2L)) // censor-only times emit no row
    // a censored subject still in the risk set at t=1 RAISES S(1):
    // {1✝,3✝} gives S(1)=1/2; adding a censor at 2 gives S(1)=2/3
    val a = Seq((1L, true), (3L, true)).toDF("dur", "event")
    val b = Seq((1L, true), (3L, true), (2L, false)).toDF("dur", "event")
    def s1(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Windows.kaplanMeier(df, "dur", col("event"))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap.apply(1L)
    assert(s1(b) == unat(2.0 / 3.0) && s1(a) == unat(1.0 / 2.0) && s1(b) > s1(a))
    // terminal: everyone at risk dies -> sentinel, not an engine error
    val term = graft.ops.Windows.kaplanMeier(a, "dur", col("event"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(term(3L) <= -1000000000L)
  }

  test("decayedSum: power-of-2 weights, 19-half-life cutoff, asOf pinning") {
    val df = Seq(
      ("u", 30L, 100L), ("u", 20L, 100L), ("u", 10L, 100L), ("u", 0L, 100L),
      ("v", 30L, 7L), ("v", -170L, 7L) // Δ = 20 → weight 0
    ).toDF("k", "t", "v")
    val got = graft.ops.Windows.decayedSum(df, Seq("k"), "t", col("v"), halfLife = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // now = 30: weights 1e6, 5e5, 2.5e5, 1.25e5
    assert(got("u") == ((4L, 100L * 1875000L)))
    assert(got("v") == ((2L, 7L * 1000000L))) // old event contributes 0
    // explicit asOf: ages shift, future events clamp to weight 1e6
    val pinned = graft.ops.Windows.decayedSum(df, Seq("k"), "t", col("v"),
        halfLife = 10L, asOf = Some(20L))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // u ages: -10(→0 clamp), 0, 1, 2 → 1e6 + 1e6 + 5e5 + 2.5e5
    assert(pinned("u") == 100L * 2750000L)
  }

  test("streaks: deterministic under repartition") {
    val rnd = new scala.util.Random(9)
    val df = (1 to 400).map(_ => (rnd.nextInt(5).toString, rnd.nextInt(200).toLong))
      .toDF("k", "t")
    val a = graft.ops.Windows.streaks(df, Seq("k"), "t", 7L).collect().toSet
    val b = graft.ops.Windows.streaks(df.repartition(13), Seq("k"), "t", 7L).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
