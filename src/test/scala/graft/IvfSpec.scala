package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("nearest_centroid expr matches a Column-algebra argmax") {
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val centDf = cents.toIndexedSeq.map(_.toIndexedSeq).zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cid", "cv")
      .select(col("cid"), col("cv").cast("array<float>").as("cv"))
    val viaSql = emb.crossJoin(centDf)
      .withColumn("cos", Similarity.cosine(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(desc("cos"), asc("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaExpr = emb.select(col("vec_id"),
        graft.expr.VectorExprs.nearest_centroid(col("embedding"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaExpr == viaSql)
  }

  test("ivfTopK with nprobe = K is exactly brute force") {
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        cents, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(ivf == bf && bf.size == 25)
  }

  test("ivfTopK partial probe: high top-k recall at a fraction of the scan") {
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val queries = emb.filter(col("vec_id") < 20)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        cents, k = 5, nprobe = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & bf).size.toDouble / bf.size
    // seed (non-k-means) centroids, half the lists probed — the bar is
    // deliberately conservative; measured ≈ the IVF literature curve
    assert(recall >= 0.5, s"recall@5 with nprobe=K/2 was $recall")
    assert(ivf.size <= bf.size)
  }

  test("kmeans refinement: inertia non-increasing, recall not worse") {
    val seed = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val j0 = Similarity.inertia(emb, "embedding", seed)
    val r1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", seed, rounds = 1)
    val j1 = Similarity.inertia(emb, "embedding", r1)
    val r3 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", r1, rounds = 2)
    val j3 = Similarity.inertia(emb, "embedding", r3)
    assert(j1 <= j0 + 1e-12 && j3 <= j1 + 1e-12, s"inertia rose: $j0 -> $j1 -> $j3")
  }

  test("semanticNearDupPairs = brute-force pairs restricted to co-assigned clusters") {
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 8)
    val got = Similarity.semanticNearDupPairs(emb, "vec_id", "embedding", cents, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val assign = emb.select(col("vec_id"),
        graft.expr.VectorExprs.nearest_centroid(col("embedding"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bf = Similarity.bruteForceNearDups(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = bf.filter { case (a, b, _) => assign(a) == assign(b) }
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    // the cluster split must not erase the near-dup signal wholesale
    assert(got.nonEmpty)
  }
}
