package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, Sketches, Windows, Bpe}

/** Binary-signature ANN, count-min sketch, sorted batching and BPE
  * fertility — hand goldens plus the properties each operator's
  * contract names (pigeonhole recall, CMS overestimate, padding
  * accounting).
  */
class BinarySketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  // Local reference popcount over sign bits of a float vector.
  private def signBitsLocal(v: Seq[Float]): Seq[Boolean] = v.map(_ > 0f)
  private def hammingLocal(a: Seq[Float], b: Seq[Float]): Int =
    signBitsLocal(a).zip(signBitsLocal(b)).count { case (x, y) => x != y }

  test("signWord packs hand-computed bits (zero is NOT positive; two words)") {
    // dims 0..2 positive, dim 3 zero, dim 4 negative, dim 32 positive
    val v = Array.fill(64)(-1.0f)
    v(0) = 1f; v(1) = 0.5f; v(2) = 2f; v(3) = 0f; v(4) = -3f; v(32) = 7f
    val df = Seq(Tuple1(v.toSeq)).toDF("e")
      .select(col("e").cast("array<float>").as("e"))
    val row = df.select(
      Similarity.signWord(col("e"), 0, 64).as("s0"),
      Similarity.signWord(col("e"), 1, 64).as("s1")).head()
    assert(row.getLong(0) == 7L)  // bits 0,1,2
    assert(row.getLong(1) == 1L)  // bit 32 → bit 0 of word 1
  }

  test("searchHamming matches a local brute force on the corpus") {
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val got = Similarity.searchHamming(emb, Seq(0L, 3L), "vec_id", "embedding", 64, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    for (q <- Seq(0L, 3L)) {
      val expect = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, hammingLocal(vecs(q), v)) }
        .sortBy { case (id, h) => (h, id) }.take(4)
      val mine = got.filter(_._1 == q).sortBy(_._4)
        .map(t => (t._2, t._3.toInt))
      assert(mine.toSeq == expect, s"query $q")
    }
  }

  test("hammingNearDupPairs: pigeonhole full recall below the band count") {
    // base vector + a 3-bit-flipped twin: distance 3 < 8 bands, so the
    // banded join MUST surface the pair (Norouzi MIH guarantee).
    val base = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val twin = base.clone(); twin(5) *= -1; twin(17) *= -1; twin(40) *= -1
    val far = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val df = Seq((1L, base.toSeq), (2L, twin.toSeq), (3L, far.toSeq))
      .toDF("id", "e").select(col("id"), col("e").cast("array<float>").as("e"))
    val pairs = Similarity.hammingNearDupPairs(df, "id", "e", 64, maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 3L)))
  }

  test("MIH radius-1 probing over 16-bit bands = equality over 8-bit bands at maxDist 7") {
    // Both schemes are pigeonhole-complete at radius 7 (8 bands − 1 =
    // 4 bands · 2 − 1), so the verified pair sets must be IDENTICAL —
    // the equivalence that lets q_image_neardups switch to sparse
    // 16-bit buckets without touching its oracle.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sigs = Similarity.signSignatures(emb, "vec_id", "embedding", 64)
    def run(bandBits: Int, r: Int) =
      Similarity.hammingNearDupPairsSig(sigs, "vec_id", words = 2, nBits = 64,
          maxDist = 7, bandBits = bandBits, bandRadius = r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val eq8 = run(8, 0)
    val mih16 = run(16, 1)
    assert(mih16 == eq8)
  }

  test("retrievalEval hand golden: hits, MRR, NDCG in integer micro-units") {
    val system = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
        (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val truth = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 99L, 3),
        (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.retrievalEval(system, truth, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val g = Similarity.ndcgGains(3) // floor(1e6/log2(p+1))
    assert(g == Seq(1000000L, 630929L, 500000L))
    val idcg = g.sum
    // q1: hits at ranks 2,3 → dcg = g(2)+g(3); first hit rank 2.
    assert(got(1L) == (2L, 500000L, (1000000L * (g(1) + g(2))) / idcg))
    // q2: perfect → ndcg 1e6, mrr 1e6.
    assert(got(2L) == (3L, 1000000L, 1000000L))
  }

  test("CMS: overestimate always; exact when the width clears collisions") {
    val toks = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val truth = toks.groupBy("tok").agg(count(lit(1)).as("true_n"))
      .filter(col("true_n") >= 50)
    // Narrow sketch: every estimate ≥ truth, at least one collision.
    val narrow = Sketches.cmsCells(toks, col("tok"), depth = 4, width = 64)
    val estN = Sketches.cmsEstimates(narrow, truth, "tok", depth = 4, width = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(estN.nonEmpty && estN.forall { case (t, e) => e >= t })
    assert(estN.exists { case (t, e) => e > t },
      "width 64 over thousands of token types should collide somewhere")
    // Wide sketch: distinct tokens ≪ cells → every probe exact.
    val wide = Sketches.cmsCells(toks, col("tok"), depth = 4, width = 1 << 16)
    val estW = Sketches.cmsEstimates(wide, truth, "tok", depth = 4, width = 1 << 16)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(estW.forall { case (t, e) => e == t })
  }

  test("sortedBatches hand golden + sharded path parity") {
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "len")
    val got = Windows.sortedBatches(df, col("len"), col("id"), batchSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 3L, 3L, 6L, 3L), (1L, 3L, 6L, 15L, 3L),
      (2L, 3L, 9L, 24L, 3L), (3L, 1L, 10L, 10L, 0L)))
    // One-shard keyed path computes the identical layout.
    val sharded = Windows.sortedBatches(df.withColumn("shard", lit("s")),
        col("len"), col("id"), batchSize = 3, shardCols = Seq("shard"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(sharded.toSeq == got.toSeq)
  }

  test("bloomIndex/bloomMaybe: no false negatives, real pruning") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select((col("o_orderkey") % 8).as("file"), col("o_custkey"))
    val idx = Sketches.bloomIndex(o, col("file"), col("o_custkey"), 1024, 3)
    val probes = o.select(col("o_custkey").as("probe_key")).distinct().limit(50)
    val maybe = Sketches.bloomMaybe(idx, probes, "probe_key", 1024, 3)
    val actual = o.select(col("o_custkey").as("probe_key"), col("file")).distinct()
      .withColumn("actual", lit(true))
    val joined = maybe.join(actual, Seq("probe_key", "file"), "left")
      .select(col("maybe"), coalesce(col("actual"), lit(false)).as("actual"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)))
    assert(joined.forall { case (m, a) => m || !a },
      "bloom returned a false negative")
    assert(joined.exists { case (m, a) => !m && !a },
      "no pruning at all — the index is useless at these parameters")
  }

  test("fertility hand golden") {
    val seg = Seq(("ab", 10L, Seq("ab")), ("cde", 4L, Seq("cd", "e")),
        ("fg", 2L, Seq("f", "g")))
      .toDF("word", "freq", "pieces")
    val got = Bpe.fertility(seg).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> (1L, 10L, 20L),       // "ab"×10: 2 chars × 10
      2L -> (2L, 6L, 16L)))       // "cde"×4 (12) + "fg"×2 (4)
  }
}
