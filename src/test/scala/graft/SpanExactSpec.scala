package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Property proof of the exact-substring fidelity contract
  * ([[graft.ops.Dedup.removeDuplicatedSpans]] scaladoc, round-14): the
  * stride-1 k-gram coverage set equals the ARBITRARY-BOUNDARY
  * longest-match definition of Lee et al. 2022's ExactSubstr at token
  * granularity — computed here independently, via pairwise
  * longest-common-prefix over ALL suffix pairs (no shingles, no
  * hashing), on seeded corpora with planted repeats plus low-alphabet
  * noise that breeds accidental ones.
  */
class SpanExactSpec extends SparkSpec {

  import spark.implicits._

  /** Exact definition, computed the slow suffix-pair way: (doc, pos)
    * is duplicated iff it lies inside a common token run of length ≥ k
    * between two DIFFERENT suffix positions (any docs, including the
    * same one).
    */
  private def exactCoveredLcp(docs: Seq[(Long, Array[String])], k: Int): Set[(Long, Int)] = {
    val sufs = docs.flatMap { case (id, ts) => ts.indices.map(i => (id, i, ts)) }
    val out = scala.collection.mutable.Set[(Long, Int)]()
    for {
      a <- sufs.indices
      b <- (a + 1) until sufs.length
    } {
      val (ida, ia, ta) = sufs(a)
      val (idb, ib, tb) = sufs(b)
      var l = 0
      while (ia + l < ta.length && ib + l < tb.length && ta(ia + l) == tb(ib + l)) l += 1
      if (l >= k) {
        (0 until l).foreach { d => out += ((ida, ia + d)); out += ((idb, ib + d)) }
      }
    }
    out.toSet
  }

  private def maximalRuns(covered: Set[(Long, Int)]): Set[(Long, Long, Long)] =
    covered.groupBy(_._1).flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).toSeq.sorted
      val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      sorted.foreach { p =>
        if (runs.nonEmpty && runs.last._2 == p - 1)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      runs.map { case (s, e) => (id, s.toLong, e.toLong) }
    }.toSet

  private def corpus(seed: Long): Seq[(Long, Array[String])] = {
    val rnd = new scala.util.Random(seed)
    val vocabulary = Vector("a", "b", "c", "d", "e")
    val planted = Array.fill(6 + rnd.nextInt(4))(vocabulary(rnd.nextInt(5)))
    (0L until 6L).map { id =>
      val n = 15 + rnd.nextInt(15)
      val base = Array.fill(n)(vocabulary(rnd.nextInt(5)))
      // plant the shared run into some docs at a random offset
      if (id % 2 == 0 && n > planted.length) {
        val off = rnd.nextInt(n - planted.length)
        planted.indices.foreach(j => base(off + j) = planted(j))
      }
      (id, base)
    }
  }

  test("k-gram coverage == LCP exact definition; span runs are maximal and boundary-exact") {
    val k = 4
    Seq(11L, 22L, 33L, 44L).foreach { seed =>
      val docs = corpus(seed)
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val want = exactCoveredLcp(docs, k)

      // removal marks exactly the LCP-covered positions (count + text)
      val got = Dedup.removeDuplicatedSpans(df, "doc_id", col("text"), k)
        .collect().map(r => r.getLong(0) -> r).toMap
      docs.foreach { case (id, ts) =>
        val covered = ts.indices.filter(i => want((id, i)))
        val r = got(id)
        assert(r.getAs[Long]("n_tokens") == ts.length.toLong, s"seed $seed doc $id n_tokens")
        assert(r.getAs[Long]("n_dup_tokens") == covered.size.toLong,
          s"seed $seed doc $id dup count: kgram=${r.getAs[Long]("n_dup_tokens")} lcp=${covered.size}")
        val survivors = ts.indices.filterNot(i => want((id, i))).map(ts).mkString(" ")
        assert(r.getAs[String]("clean_text") == survivors, s"seed $seed doc $id clean_text")
      }

      // span runs are exactly the maximal runs of the LCP set
      val runs = Dedup.duplicatedSpanRuns(df, "doc_id", col("text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(runs == maximalRuns(want), s"seed $seed span runs diverge")
      // every reported span is ≥ k long by the contract
      runs.foreach { case (_, s, e) => assert(e - s + 1 >= k) }
    }
  }

  /** Same exact definition over BYTES: (doc, byte_pos) is duplicated
    * iff it lies inside a common UTF-8 byte run of length ≥ k between
    * two different byte-suffix positions.
    */
  private def exactCoveredLcpBytes(docs: Seq[(Long, Array[Byte])], k: Int): Set[(Long, Int)] = {
    val sufs = docs.flatMap { case (id, bs) => bs.indices.map(i => (id, i, bs)) }
    val out = scala.collection.mutable.Set[(Long, Int)]()
    for {
      a <- sufs.indices
      b <- (a + 1) until sufs.length
    } {
      val (ida, ia, ba) = sufs(a)
      val (idb, ib, bb) = sufs(b)
      var l = 0
      while (ia + l < ba.length && ib + l < bb.length && ba(ia + l) == bb(ib + l)) l += 1
      if (l >= k) {
        (0 until l).foreach { d => out += ((ida, ia + d)); out += ((idb, ib + d)) }
      }
    }
    out.toSet
  }

  /** Multi-byte code points ("é" = 2 bytes, "漢" = 3) are in the
    * alphabet so byte offsets DIVERGE from character offsets — a spec
    * passing with these proves the operator slices bytes, and that
    * repeats opening on a code point's tail byte are counted from
    * that byte (the Lee et al. 2022 semantics the scaladoc states).
    */
  private def byteCorpus(seed: Long): Seq[(Long, Array[Byte])] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = Vector("a", "b", "é", "漢", " ")
    val planted = (0 until 10 + rnd.nextInt(5))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0L until 6L).map { id =>
      val n = 12 + rnd.nextInt(10)
      val base = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val s =
        if (id % 2 == 0) {
          val off = rnd.nextInt(base.length)
          base.substring(0, off) + planted + base.substring(off)
        } else base
      (id, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  test("byte-gram coverage == byte-LCP exact definition (bytes@k, multi-byte code points)") {
    val k = 6
    Seq(17L, 28L, 39L).foreach { seed =>
      val docs = byteCorpus(seed)
      val df = docs.map { case (id, bs) =>
        (id, new String(bs, java.nio.charset.StandardCharsets.UTF_8))
      }.toDF("doc_id", "text")
      val want = exactCoveredLcpBytes(docs, k)
      val runs = Dedup.duplicatedByteSpanRuns(df, "doc_id", col("text"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(runs == maximalRuns(want), s"seed $seed byte span runs diverge")
      runs.foreach { case (_, s, e) => assert(e - s + 1 >= k) }
      assert(runs.nonEmpty, s"seed $seed planted byte repeat not found")
    }
  }
}
