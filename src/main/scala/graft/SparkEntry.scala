package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.linkage._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a named DataFrame program over the
  * driver's parquet tables; [[oracleSql]] carries the equivalent DuckDB
  * SQL. Column names are aligned on both sides (the driver sorts
  * columns by name before hashing). All queries are deterministic:
  * exact arithmetic (counts, integer-valued sums, single divisions)
  * only — no order-dependent float accumulation.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---- shared linkage fixtures over the TPC-H-ish tables ------------

  /** Customer self-linkage blocking: one two-key equi pass + one
    * computed-key pass (the scale rewrite of the reference's prefix
    * predicate pass, scratch.R:25).
    */
  private def customerBlocking(c: DataFrame): DataFrame = {
    val rules = BlockingRules(Seq(
      EquiKeys(Map("c_nationkey" -> "c_nationkey", "c_mktsegment" -> "c_mktsegment")),
      ComputedKeys(Seq(
        ("acctbal_r", round(col("c_acctbal_left")), round(col("c_acctbal_right")))))))
    Blocking.extractBlocks(c, c, "c_custkey", "c_custkey", rules)
      .filter(col("c_custkey_left") < col("c_custkey_right"))
  }

  private val customerBlockingOracle: String =
    """WITH ids AS (
      |  SELECT a.c_custkey AS c_custkey_left, b.c_custkey AS c_custkey_right
      |  FROM customer a JOIN customer b
      |    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
      |  UNION
      |  SELECT a.c_custkey, b.c_custkey
      |  FROM customer a JOIN customer b
      |    ON round(a.c_acctbal) = round(b.c_acctbal)
      |)
      |SELECT * FROM ids WHERE c_custkey_left < c_custkey_right""".stripMargin

  private def customerComparators: Seq[Comparator] =
    Comparators.exact(Seq("c_nationkey")) ++ Comparators.jaroWinkler(Seq("c_name"))

  private val customerComparatorsSql: String =
    """CASE WHEN a.c_nationkey = b.c_nationkey THEN 'agree'
      |     WHEN a.c_nationkey <> b.c_nationkey THEN 'disagree' END AS c_nationkey,
      |CASE WHEN jaro_winkler_similarity(a.c_name, b.c_name) = 1 THEN 'full agreement'
      |     WHEN jaro_winkler_similarity(a.c_name, b.c_name) > 0.9 THEN 'strong partial agreement'
      |     WHEN jaro_winkler_similarity(a.c_name, b.c_name) > 0.85 THEN 'weak partial agreement'
      |     ELSE 'no agreement' END AS c_name""".stripMargin

  // ---- query definitions -------------------------------------------

  private def qLineitemAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        avg(col("l_quantity")).as("avg_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))

  private def qBlockEqui(s: SparkSession, dir: String): DataFrame =
    customerBlocking(t(s, dir, "customer"))

  private def qPairsAssembly(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val ids = customerBlocking(c)
    Pairs.computePairsDataset(c, c, "c_custkey", "c_custkey", ids)
      .select("c_custkey_left", "c_custkey_right",
        "c_name_left", "c_name_right", "c_mktsegment_left", "c_mktsegment_right")
  }

  private def qPatternCounts(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    Pairs.patternCounts(c, c, "c_custkey", "c_custkey", customerBlocking(c), customerComparators)
  }

  private def qJwLevels(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val ids = Blocking.extractBlocks(p, p, "p_partkey", "p_partkey",
      BlockingRules(Seq(EquiKeys("p_brand"))))
    val pairs = Pairs.computePairsDataset(p, p, "p_partkey", "p_partkey", ids)
    Comparators.doComparisons(pairs, Comparators.jaroWinkler(Seq("p_name")))
      .groupBy("p_name").agg(count(lit(1)).as("n"))
  }

  private val uSampleSize = 100000L
  private val uSeed = 42L

  private def qUProbs(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = Suffix.addSuffix(UProbs.withSyntheticId(c, "synthetic_id", "c_custkey"), "_left")
    val b = Suffix.addSuffix(UProbs.withSyntheticId(c, "synthetic_id", "c_custkey"), "_right")
    val n = c.count()
    val pairs = UProbs.samplePairIds(s, n, n, uSampleSize, uSeed)
      .join(a, Seq("synthetic_id_left"), "left")
      .join(b, Seq("synthetic_id_right"), "left")
    UProbs.uProbsLong(pairs, customerComparators)
  }

  private def qUProbsOracle(nRowsSql: String): String =
    s"""WITH ca AS (SELECT *, row_number() OVER (ORDER BY c_custkey) AS synthetic_id FROM customer),
       |n AS (SELECT count(*) AS cnt FROM customer),
       |pairs AS (
       |  SELECT ${UProbs.lcgSql("t.i", "n.cnt", 0L, uSeed, 48271L)} AS sid_left,
       |         ${UProbs.lcgSql("t.i", "n.cnt", 1000003L, uSeed, 69621L)} AS sid_right
       |  FROM range($uSampleSize) AS t(i), n
       |),
       |compared AS (
       |  SELECT $nRowsSql
       |  FROM pairs
       |  LEFT JOIN ca a ON pairs.sid_left = a.synthetic_id
       |  LEFT JOIN ca b ON pairs.sid_right = b.synthetic_id
       |),
       |longf AS (
       |  SELECT 'c_nationkey' AS name, c_nationkey AS value FROM compared
       |  UNION ALL
       |  SELECT 'c_name', c_name FROM compared
       |)
       |SELECT name, value, count(*) AS n,
       |       count(*) / (sum(count(*)) OVER (PARTITION BY name) + 0.0) AS p
       |FROM longf WHERE value IS NOT NULL
       |GROUP BY name, value""".stripMargin

  def entry(spark: SparkSession): DataFrame =
    qPatternCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_lineitem_agg" -> (qLineitemAgg _),
    "q_block_equi" -> (qBlockEqui _),
    "q_pairs_assembly" -> (qPairsAssembly _),
    "q_pattern_counts" -> (qPatternCounts _),
    "q_jw_levels" -> (qJwLevels _),
    "q_u_probs" -> (qUProbs _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty, count(*) AS n_rows, avg(l_quantity) AS avg_qty,
        |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_block_equi" -> customerBlockingOracle,
    "q_pairs_assembly" ->
      s"""WITH ids AS ($customerBlockingOracle)
         |SELECT ids.c_custkey_left, ids.c_custkey_right,
         |  a.c_name AS c_name_left, b.c_name AS c_name_right,
         |  a.c_mktsegment AS c_mktsegment_left, b.c_mktsegment AS c_mktsegment_right
         |FROM ids
         |LEFT JOIN customer a ON ids.c_custkey_left = a.c_custkey
         |LEFT JOIN customer b ON ids.c_custkey_right = b.c_custkey""".stripMargin,
    "q_pattern_counts" ->
      s"""WITH ids AS ($customerBlockingOracle),
         |compared AS (
         |  SELECT $customerComparatorsSql
         |  FROM ids
         |  LEFT JOIN customer a ON ids.c_custkey_left = a.c_custkey
         |  LEFT JOIN customer b ON ids.c_custkey_right = b.c_custkey
         |)
         |SELECT c_nationkey, c_name, count(*) AS n FROM compared
         |GROUP BY c_nationkey, c_name""".stripMargin,
    "q_jw_levels" ->
      """WITH pairs AS (
        |  SELECT a.p_name AS p_name_left, b.p_name AS p_name_right
        |  FROM part a JOIN part b ON a.p_brand = b.p_brand
        |)
        |SELECT CASE WHEN jaro_winkler_similarity(p_name_left, p_name_right) = 1 THEN 'full agreement'
        |            WHEN jaro_winkler_similarity(p_name_left, p_name_right) > 0.9 THEN 'strong partial agreement'
        |            WHEN jaro_winkler_similarity(p_name_left, p_name_right) > 0.85 THEN 'weak partial agreement'
        |            ELSE 'no agreement' END AS p_name,
        |       count(*) AS n
        |FROM pairs GROUP BY 1""".stripMargin,
    "q_u_probs" -> qUProbsOracle(
      """CASE WHEN a.c_nationkey = b.c_nationkey THEN 'agree'
        |     WHEN a.c_nationkey <> b.c_nationkey THEN 'disagree' END AS c_nationkey,
        |CASE WHEN jaro_winkler_similarity(a.c_name, b.c_name) = 1 THEN 'full agreement'
        |     WHEN jaro_winkler_similarity(a.c_name, b.c_name) > 0.9 THEN 'strong partial agreement'
        |     WHEN jaro_winkler_similarity(a.c_name, b.c_name) > 0.85 THEN 'weak partial agreement'
        |     ELSE 'no agreement' END AS c_name""".stripMargin),
  )
}
