package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.linkage._

/** End-to-end TWO-TABLE linkage at sf1 scale — the reference's
  * production shape (NCVR 2021 × 2023, scratch.R:142-156) rebuilt as
  * customer × a synthesized perturbed clone, through the full
  * pipeline: blocking → u-probs → EM → scoring → calibration. Where
  * [[LinkageDemo]] proves the algorithmics on ~800 records, this
  * proves the PIPELINE at 150k × 135k records (the sf1-equivalent
  * customer table), with per-stage wall times printed for the round
  * artifact (docs/LINKAGE_E2E_r06.md).
  *
  * Table A: sf0.1 customer replicated 10× with re-keyed custkeys and
  * names regenerated from the new key (names stay unique — replicated
  * verbatim names would plant false "full agreement" pairs across
  * replicas and corrupt the precision measurement).
  *
  * Table B: a deterministic, DISTRIBUTED perturbation of A (pure
  * Column programs on hash(rec_id) — no driver loop, no RNG state):
  *   - ~10% of rows dropped (records with no match in B);
  *   - ~30% of names get one digit substituted at position 17
  *     (outside the blocking prefix, inside the JW comparison);
  *   - ~20% of balances shifted by up to ±1.00;
  *   - ~6% of nation keys nulled (missingness → NULL comparator
  *     level, the reference's inapplicable-comparison convention).
  *
  * Blocking: two passes (name-digit prefix; nation × coarse balance
  * band) — ~14M candidate pairs from the 2.0e10-pair cross space.
  * Run: `sbt "runMain graft.LinkageE2E"` (SPARK_GRAFT_CPUS to size).
  */
object LinkageE2E {

  private def timed[T](label: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[time] $label: $sec%.1f s")
    (r, sec)
  }

  /** `repl`× re-keyed replication of the sf0.1 customer table (15k
    * base rows — repl=10 is the standing 150k shape, repl=534 the
    * NCVR-scale ~8M shape), names regenerated from the new key.
    */
  def tableA(spark: SparkSession, baseDir: String, repl: Int = 10): DataFrame =
    spark.read.parquet(s"$baseDir/customer.parquet")
      .withColumn("__r", explode(sequence(lit(0), lit(repl - 1))))
      .withColumn("rec_id", col("c_custkey") + col("__r") * 15000L)
      .select(
        col("rec_id"),
        concat(lit("Customer#"), lpad(col("rec_id").cast("string"), 9, "0")).as("name"),
        col("c_nationkey").as("nationkey"),
        col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("segment"))

  /** Deterministic perturbed clone; B ids live at +1e9 so the two id
    * spaces never collide in the pair table.
    */
  def tableB(a: DataFrame): DataFrame = {
    def h(salt: Int) = abs(hash(col("rec_id"), lit(salt)))
    a.filter(pmod(h(0), lit(10)) =!= 7) // ~10% unmatched A rows
      .select(
        (col("rec_id") + 1000000000L).as("rec_id"),
        when(pmod(h(1), lit(10)) < 3,
          concat(substring(col("name"), 1, 16),
            pmod(h(2), lit(10)).cast("string"),
            substring(col("name"), 18, 1)))
          .otherwise(col("name")).as("name"),
        when(pmod(h(3), lit(17)) === 0, lit(null))
          .otherwise(col("nationkey")).as("nationkey"),
        when(pmod(h(4), lit(5)) === 0,
          round(col("acctbal") + (pmod(h(5), lit(200)) - 100) / lit(100.0), 2))
          .otherwise(col("acctbal")).as("acctbal"),
        col("segment"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // /dev/shm is RAM-backed — right for the 150k shape's shuffle,
      // wrong for NCVR scale where checkpoint+shuffle bytes would
      // compete with the heap for the same physical RAM; big runs
      // override to real disk.
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tTotal0 = System.nanoTime()

    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // SPARK_GRAFT_E2E_REPL=534 ⇒ A ≈ 8.0M, B ≈ 7.2M — the reference's
    // NCVR production scale (scratch.R:142-156: ~8M voters × 2
    // snapshots). Default 10 keeps the standing 150k × 135k shape.
    val repl = sys.env.getOrElse("SPARK_GRAFT_E2E_REPL", "10").toInt
    val a = tableA(spark, baseDir, repl).localCheckpoint(true)
    val b = tableB(a).localCheckpoint(true)
    val (nA, nB) = (a.count(), b.count())
    println(s"A: $nA records; B: $nB records; cross space ${nA * nB} pairs")

    val truth = a.select(col("rec_id"), col("rec_id").as("cluster"))
      .union(b.select(col("rec_id"), (col("rec_id") - 1000000000L).as("cluster")))

    // 1. Blocking: name-digit prefix pass + nation×balance-band pass.
    // Per-block pair count is quadratic in block size (the extractBlocks
    // scale contract), so the key CARDINALITY must grow with the data:
    // at NCVR scale the prefix widens to 5 digits (10^5 keys → ~80
    // rows/key) and the balance band narrows to whole dollars (~275k
    // keys). Both keys stay clear of the perturbation sites (name digit
    // substitution lands at position 17, outside substring(12,5)), so
    // pass-1 recall is 100% by construction at either scale.
    val big = repl > 10
    val prefixLen = if (big) 5 else 4
    val balDiv = if (big) 1 else 10
    val rules = BlockingRules(Seq(
      ComputedKeys(Seq(
        ("name_mid", substring(col("name_left"), 12, prefixLen),
          substring(col("name_right"), 12, prefixLen)))),
      ComputedKeys(Seq(
        ("nk", col("nationkey_left"), col("nationkey_right")),
        ("bal10", floor(col("acctbal_left") / balDiv),
          floor(col("acctbal_right") / balDiv))))))
    val (ids, tBlock) = timed("blocking") {
      Blocking.extractBlocks(a, b, "rec_id", "rec_id", rules).localCheckpoint(true)
    }
    println(s"candidate pairs: ${ids.count()}")

    // 2. Comparators: JW name band, exact nation (nulls → NULL level),
    // exact segment, balance band.
    val comparators =
      Comparators.jaroWinkler(Seq("name")) ++
      Comparators.exact(Seq("nationkey", "segment")) :+
      Comparators.expression("bal_band",
        when(abs(col("acctbal_left") - col("acctbal_right")) < lit(1.5), "close")
          .otherwise("far"))

    // 3. Pattern counts over the candidate pairs.
    val (patterns, tPatterns) = timed("pattern counts") {
      EM.collectPatterns(
        Pairs.patternCounts(a, b, "rec_id", "rec_id", ids, comparators))
    }
    println(s"distinct patterns: ${patterns.size}")

    // 4. u-probabilities from random A×B pairs (not candidates).
    val (u, tU) = timed("u-probs") {
      UProbs.calculateUProbs(a, b, "rec_id", "rec_id", comparators, size = 500000L)
    }

    // 5. EM over the pattern table.
    val (em, tEm) = timed("EM") {
      EM.run(patterns, totalPairs = nA.toDouble * nB, uProbabilities = u, maxIter = 25)
    }
    println(f"lambda = ${em.lambda}%.3e")
    em.trace.foreach(t =>
      println(f"  iter ${t.iteration}%2d: dM=${t.maxDeltaM}%.2e dU=${t.maxDeltaU}%.2e lambda=${t.lambda}%.3e"))
    em.weights.foreach { case (f, ls) =>
      println(s"  $f: " + ls.map { case (l, w) => f"$l=$w%.2f" }.mkString(", "))
    }

    // 6. Score every candidate pair ONCE (assemble → compare → weight
    // → truth, materialized via localCheckpoint); evaluation and
    // calibration both read the checkpointed table — no recompute.
    val (scored, tScore) = timed("score all candidates") {
      val pairsDs = Pairs.computePairsDataset(a, b, "rec_id", "rec_id", ids)
      val values = Comparators.doComparisons(pairsDs, comparators,
        keep = Seq("rec_id_left", "rec_id_right"))
      Scoring.attachTruth(
        Scoring.score(values, em), truth, "rec_id", "cluster")
        .select("rec_id_left", "rec_id_right", "weight", "true_match")
        .localCheckpoint(true)
    }
    val ((bands, precision, recall), tEval) = timed("evaluation") {
      val top = scored.filter(col("weight") > 5.0)
      val nTop = top.count()
      val nTrueTop = top.filter(col("true_match")).count()
      (Scoring.precisionByBand(top).collect(),
        (nTrueTop, nTop),
        (nTrueTop, nB)) // every B row has exactly one true A partner
    }
    println("precision by weight band:")
    bands.foreach(r => println(f"  band=${r.getDouble(0)}%5.1f precision=${r.getDouble(1)}%.4f n=${r.getLong(2)}"))
    println(f"precision@weight>5: ${precision._1}/${precision._2} = ${precision._1.toDouble / precision._2}%.4f")
    println(f"recall@weight>5:    ${recall._1}/${recall._2} = ${recall._1.toDouble / recall._2}%.4f")

    // 7. Calibration on all scored candidates (same checkpointed table).
    val (cal, tCal) = timed("glm calibration") {
      Scoring.calibrate(scored)
    }
    println(f"glm calibration: P(match) = sigmoid(${cal.intercept}%.4f + ${cal.slope}%.4f * weight)")

    val total = (System.nanoTime() - tTotal0) / 1e9
    println(f"[time] TOTAL: $total%.1f s (block=$tBlock%.1f patterns=$tPatterns%.1f u=$tU%.1f em=$tEm%.1f score=$tScore%.1f eval=$tEval%.1f cal=$tCal%.1f)")
    spark.stop()
  }
}
