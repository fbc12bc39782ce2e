package graft

import org.apache.spark.sql.functions._

import graft.linkage._

/** Specs for the linkage core: suffixing (P1), comparators (F2-F4),
  * blocking (J1/J2/P6/U1), pair assembly (J3), pattern counts (A1).
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val people = Seq(
    (1L, "alice", "smith", "male", "AB1"),
    (2L, "alicia", "smith", "female", "AB1"),
    (3L, "bob", "jones", "male", "CD2"),
    (4L, "bob", "james", null, "CD2"),
    (5L, "carol", "smith", "other", null)
  ).toDF("id", "first_name", "surname", "gender", "postcode")

  test("Suffix: idempotent on names, columns, frames (utils.R:11-27 semantics)") {
    assert(Suffix.addSuffix("a", "_left") == "a_left")
    assert(Suffix.addSuffix("a_left", "_left") == "a_left")
    assert(Suffix.addSuffix(Seq("x", "y_right"), "_right") == Seq("x_right", "y_right"))
    val df = Suffix.addSuffix(people, "_left")
    assert(df.columns.toSeq == Seq("id_left", "first_name_left", "surname_left", "gender_left", "postcode_left"))
    assert(Suffix.addSuffix(df, "_left").columns.toSeq == df.columns.toSeq)
  }

  test("exact comparator: agree / disagree / NULL (comparators.R:18-23)") {
    val pairs = Seq(
      ("x", "x"), ("x", "y"), (null, "x"), ("x", null), (null, null)
    ).toDF("v_left", "v_right")
    val out = Comparators.doComparisons(pairs, Comparators.exact(Seq("v")))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("agree"), Some("disagree"), None, None, None))
  }

  test("jw comparator: level boundaries and NULL → no agreement (comparators.R:4-14)") {
    val pairs = Seq(
      ("martha", "martha"),   // 1.0       → full
      ("martha", "marhta"),   // 0.9611... → strong
      ("hello", "hallo"),     // 0.88      → weak
      ("crate", "trace"),     // 0.733     → none
      (null, "x"), ("x", null)
    ).toDF("v_left", "v_right")
    val out = Comparators.doComparisons(pairs, Comparators.jaroWinkler(Seq("v")))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("full agreement", "strong partial agreement",
      "weak partial agreement", "no agreement", "no agreement", "no agreement"))
  }

  test("NA-safe isin comparator matches R %in% semantics (F4 watch-out)") {
    // R: !gender %in% c('female','male') is TRUE for NA; SQL NOT IN is NULL.
    val comparator = Comparators.expression("gender_comparison",
      when(col("gender_left") === "male" && col("gender_right") === "male", "agree (male)")
        .when(col("gender_left") === "female" && col("gender_right") === "female", "agree (female)")
        .when(!coalesce(col("gender_left").isin("female", "male"), lit(false)) ||
              !coalesce(col("gender_right").isin("female", "male"), lit(false)), null)
        .otherwise("disagree"))
    val pairs = Seq(
      ("male", "male"), ("female", "female"), ("male", "female"),
      ("other", "male"), (null, "male"), (null, null)
    ).toDF("gender_left", "gender_right")
    val out = Comparators.doComparisons(pairs, Seq(comparator))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("agree (male)"), Some("agree (female)"), Some("disagree"),
      None, None, None))
  }

  test("blocking: union of passes deduplicates overlapping pairs (linking.R:36-37)") {
    // surname pass and postcode pass both produce (1,2): distinct keeps one.
    val rules = BlockingRules(Seq(EquiKeys("surname"), EquiKeys("postcode")))
    val ids = Blocking.extractBlocks(people, people, "id", "id", rules)
      .filter(col("id_left") < col("id_right"))
    val got = ids.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // surname: (1,2),(1,5),(2,5); postcode: (1,2),(3,4). NULL postcode (5) joins nothing.
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 4L)))
  }

  test("blocking: hotKeySalts produces identical pairs to the unsalted join") {
    // The tiny-cardinality skew path (first-initial keys): salting must
    // spread work without changing the pair set — exercised across
    // multi-pass union+distinct, ComputedKeys, and selfLinkage canon.
    val rules = BlockingRules(Seq(
      EquiKeys("surname"),
      ComputedKeys(Seq(
        ("s1", substring(col("surname_left"), 1, 1), substring(col("surname_right"), 1, 1))))))
    def pairsOf(salts: Int) =
      Blocking.extractBlocks(people, people, "id", "id", rules,
          selfLinkage = true, hotKeySalts = salts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairsOf(0)
    assert(plain.nonEmpty)
    assert(pairsOf(7) == plain)
    assert(pairsOf(64) == plain) // more salts than rows: replication still exact
  }

  test("blocking: recommendSalts sizes the salt from measured key skew; recommended count preserves the pair set") {
    import spark.implicits._
    // 90%-one-key fixture: 180 of 200 rows share blocking key "hot",
    // the rest spread over 20 singleton keys — the straggler shape
    // where one join group holds ~99.9% of pair-generation work.
    val skewed = (1L to 200L).map(i =>
      (i, if (i <= 180) "hot" else s"cold_$i")).toDF("id", "k")
    val rec = Blocking.recommendSalts(
      skewed, col("k"), skewed, col("k"), targetParallelism = 32)
    // max work = 180² = 32400 of Σ = 32420 → ceil(32·0.9994) = 32.
    assert(rec == 32, s"dominant hot key should recommend the full task count, got $rec")

    val rules = BlockingRules(Seq(EquiKeys("k")))
    def pairsOf(salts: Int) =
      Blocking.extractBlocks(skewed, skewed, "id", "id", rules,
          selfLinkage = true, hotKeySalts = salts)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairsOf(0)
    assert(plain.size == 180 * 179 / 2 + 0) // hot block pairs; singletons add none
    assert(pairsOf(rec) == plain)

    // Tiny-cardinality UNIFORM key (SURVEY §4's other failure shape):
    // 4 even groups of 50 → max/Σ = 1/4 → s = 32/4 = 8, giving
    // 4·8 = 32 work units.
    val uniform = (1L to 200L).map(i => (i, s"g${i % 4}")).toDF("id", "k")
    assert(Blocking.recommendSalts(
      uniform, col("k"), uniform, col("k"), targetParallelism = 32) == 8)

    // High-cardinality key that spreads fine: no salt recommended.
    val spread = (1L to 200L).map(i => (i, s"k$i")).toDF("id", "k")
    assert(Blocking.recommendSalts(
      spread, col("k"), spread, col("k"), targetParallelism = 32) == 0)

    // Disjoint key spaces: empty join forecast, no salt.
    val other = (1L to 10L).map(i => (i, s"z$i")).toDF("id", "k")
    assert(Blocking.recommendSalts(
      skewed, col("k"), other, col("k"), targetParallelism = 32) == 0)
  }

  test("blocking: recommendSalts fires on the LinkageDemo surname-initial pass and preserves its pair set") {
    // The REAL-pipeline counterpart of the synthetic fixtures above
    // (VERDICT r12 item 4): on the demo's persons fixture the
    // surname-initial key is naturally skewed (five of fourteen
    // dictionary surnames start with 'w'), so the forecast must come
    // out > 1 at the demo's parallelism — the salt path is then
    // exercised by a genuine pipeline pass, not only by rigged keys.
    val people = graft.LinkageDemo.persons(spark, nClusters = 120).drop("cluster").cache()
    val rec = Blocking.recommendSalts(
      people, substring(col("surname"), 1, 1),
      people, substring(col("surname"), 1, 1), targetParallelism = 4)
    assert(rec > 1, s"surname-initial skew should recommend salts > 1 at P=4, got $rec")

    val rules = BlockingRules(Seq(
      EquiKeys("surname"), EquiKeys("dob"),
      ComputedKeys(Seq(
        ("s1", substring(col("surname_left"), 1, 1), substring(col("surname_right"), 1, 1))))))
    def pairsOf(salts: Int) =
      Blocking.extractBlocks(people, people, "unique_id", "unique_id", rules,
          hotKeySalts = salts)
        .filter(col("unique_id_left") < col("unique_id_right"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairsOf(0)
    assert(plain.nonEmpty)
    assert(pairsOf(rec) == plain)
    people.unpersist()
  }

  test("blocking: salting refuses inputs that already carry the reserved __salt columns") {
    import spark.implicits._
    val clash = Seq((1L, "a", 0)).toDF("id", "k", "__salt_l")
    val ex = intercept[IllegalArgumentException] {
      Blocking.extractBlocks(clash, clash, "id", "id",
        BlockingRules(Seq(EquiKeys("k"))), hotKeySalts = 4)
    }
    assert(ex.getMessage.contains("__salt_l"))
    // Unsalted path is unaffected by the column.
    assert(Blocking.extractBlocks(clash, clash, "id", "id",
      BlockingRules(Seq(EquiKeys("k")))).count() == 1L)
  }

  test("blocking: ComputedKeys equals the equivalent Predicate pass (J2 rewrite)") {
    val computed = Blocking.extractBlocks(people, people, "id", "id",
      BlockingRules(Seq(ComputedKeys(Seq(
        ("s1", substring(col("surname_left"), 1, 1), substring(col("surname_right"), 1, 1)))))))
    val predicate = Blocking.extractBlocks(people, people, "id", "id",
      BlockingRules(Seq(Predicate(
        substring(col("surname_left"), 1, 1) === substring(col("surname_right"), 1, 1)))))
    val a = computed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = predicate.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("pair assembly: left joins preserve ids and suffix all columns (linking.R:49-60)") {
    val ids = Seq((1L, 2L), (3L, 4L)).toDF("id_left", "id_right")
    val pairs = Pairs.computePairsDataset(people, people, "id", "id", ids)
    assert(pairs.columns.toSet ==
      Set("id_left", "id_right",
        "first_name_left", "surname_left", "gender_left", "postcode_left",
        "first_name_right", "surname_right", "gender_right", "postcode_right"))
    val r = pairs.filter(col("id_left") === 1L).head
    assert(r.getAs[String]("first_name_left") == "alice" &&
      r.getAs[String]("first_name_right") == "alicia")
  }

  test("pattern counts: multiplicities over distinct comparison vectors (A1)") {
    val ids = Seq((1L, 2L), (1L, 5L), (2L, 5L), (3L, 4L)).toDF("id_left", "id_right")
    val comparators = Comparators.exact(Seq("surname", "postcode"))
    val counts = Pairs.patternCounts(people, people, "id", "id", ids, comparators)
    val got = counts.collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got == Set(
      (Some("agree"), Some("agree"), 1L),     // (1,2)
      (Some("agree"), None, 2L),              // (1,5),(2,5): postcode NULL on 5
      (Some("disagree"), Some("agree"), 1L))) // (3,4)
  }

  test("frequencyWeightedAgreement: surprisal on agree, 0 on disagree, NULL on missing") {
    val pop = Seq("a", "a", "a", "b").toDF("seg") // N=4: cnt(a)=3, cnt(b)=1
    val pairs = Seq(
      (1L, 2L, Some("a"), Some("a")),
      (3L, 4L, Some("b"), Some("b")),
      (5L, 6L, Some("a"), Some("b")),
      (7L, 8L, Some("a"), None)
    ).toDF("id_left", "id_right", "seg_left", "seg_right")
    val got = Comparators.frequencyWeightedAgreement(pairs, "seg", pop, "seg")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[String]("seg_agreed")),
          Option(r.getAs[Any]("seg_fw_unat")).map(_.asInstanceOf[Long])))).toMap
    def unat(n: Long, cnt: Long) = math.floor(math.log(n.toDouble / cnt) * 1e6).toLong
    assert(got(1L) == ((Some("a"), Some(unat(4, 3)))))   // common value: small weight
    assert(got(3L) == ((Some("b"), Some(unat(4, 1)))))   // rare value: ln(4) ≈ 1.386e6
    assert(got(5L) == ((None, Some(0L))))                // disagreement
    assert(got(7L) == ((None, None)))                    // missing → NULL level
    assert(unat(4, 1) > unat(4, 3))
  }

  test("sortedNeighborhood: typo neighbors pair, budget is exactly w·n − tail, ties total") {
    val df = Seq(
      (1L, "smith"), (2L, "smyth"), (3L, "smithe"),  // sort-adjacent typos
      (4L, "jones"), (5L, "zzz")).toDF("id", "name")
    val got = graft.linkage.Blocking.sortedNeighborhood(df, "id", col("name"), w = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // name order: jones(4) smith(1) smithe(3) smyth(2) zzz(5)
    assert(got == Set(
      (4L, 1L, 1L), (4L, 3L, 2L),
      (1L, 3L, 1L), (1L, 2L, 2L),
      (3L, 2L, 1L), (3L, 5L, 2L),
      (2L, 5L, 1L)), s"got $got")
    // smith–smyth (a distance-2 typo) pairs — equi-blocking on the
    // exact name would have missed it
    assert(got.exists(p => Set(p._1, p._2) == Set(1L, 2L)))
    // linear pair budget: w·n − (1+2+…+w) tail = 10 − 3 = 7
    assert(got.size == 7)
  }

  test("randIndex: hand clusterings with a known Rand value; identity = 1e6") {
    // A: {1,2},{3}; B: {1},{2,3} — of 3 pairs: (1,2) split by B,
    // (2,3) split by A, (1,3) separate in both → S=0, D=1, Rand=1/3.
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "cl")
    val b = Seq((1L, "p"), (2L, "q"), (3L, "q")).toDF("id", "cl")
    val r = graft.ops.Clusters.randIndex(a, "id", "cl", b, "id", "cl").collect()(0)
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 0L, 1L, 333333L)))
    // a clustering against itself is perfect agreement
    val self = graft.ops.Clusters.randIndex(a, "id", "cl", a, "id", "cl").collect()(0)
    assert(self.getLong(4) == 1000000L &&
      self.getLong(2) == 1L && self.getLong(3) == 2L)
  }
}
