package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.expr.JaroWinkler
import graft.linkage.{EM, Suffix}

/** ScalaCheck properties for the pure kernels (no SparkSession):
  * similarity bounds/symmetry, suffix idempotence, logSumExp algebra,
  * EM invariants on random pattern tables.
  */
object GraftProperties extends Properties("graft") {

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  property("jw.bounds") = Prop.forAll(word, word) { (a, b) =>
    val s = JaroWinkler.similarity(a, b)
    s >= 0.0 && s <= 1.0
  }

  property("jw.symmetry") = Prop.forAll(word, word) { (a, b) =>
    JaroWinkler.similarity(a, b) == JaroWinkler.similarity(b, a)
  }

  property("jw.identity") = Prop.forAll(word) { a =>
    val s = JaroWinkler.similarity(a, a)
    if (a.isEmpty) s == 0.0 else s == 1.0 // DuckDB: empty → 0
  }

  property("suffix.idempotent") = Prop.forAll(word) { a =>
    val once = Suffix.addSuffix(a, "_left")
    Suffix.addSuffix(once, "_left") == once
  }

  private val logs: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-50.0, 50.0))

  property("logSumExp.matches-naive-in-range") = Prop.forAll(logs) { xs =>
    val naive = math.log(xs.map(math.exp).sum)
    math.abs(EM.logSumExp(xs) - naive) < 1e-9
  }

  property("logSumExp.shift-invariant") = Prop.forAll(logs, Gen.chooseNum(-700.0, 700.0)) { (xs, c) =>
    // stable even where the naive form would overflow
    val shifted = EM.logSumExp(xs.map(_ + c))
    math.abs(shifted - (EM.logSumExp(xs) + c)) < 1e-9
  }

  private val patternTable: Gen[(Seq[EM.Pattern], Map[String, Map[String, Double]])] = for {
    nLevels <- Gen.chooseNum(2, 4)
    levels = (0 until nLevels).map(i => s"l$i")
    counts <- Gen.listOfN(nLevels, Gen.chooseNum(1L, 1000L))
    uRaw <- Gen.listOfN(nLevels, Gen.chooseNum(0.01, 1.0))
  } yield {
    val patterns = levels.zip(counts).map { case (l, n) => EM.Pattern(Map("f" -> Some(l)), n) }
    val uSum = uRaw.sum
    val u = Map("f" -> levels.zip(uRaw.map(_ / uSum)).toMap)
    (patterns, u)
  }

  property("em.invariants") = Prop.forAll(patternTable) { case (patterns, u) =>
    val total = patterns.map(_.n).sum.toDouble * 10
    val res = EM.run(patterns, total, u, maxIter = 5)
    val ms = res.mProbabilities("f").values
    val us = res.uProbabilities("f").values
    res.lambda > 0 && res.lambda < 1 &&
      ms.forall(v => v >= 0 && v <= 1) && us.forall(v => v >= 0 && v <= 1) &&
      math.abs(ms.sum - 1.0) < 1e-6 && math.abs(us.sum - 1.0) < 1e-6
  }

  private val threshold: Gen[Double] = Gen.chooseNum(0.15, 0.9)

  property("lsh.recall-monotone-in-bands") = Prop.forAll(threshold, Gen.chooseNum(1, 6), Gen.chooseNum(1, 20)) { (j, r, b) =>
    import graft.ops.Dedup
    Dedup.lshRecall(j, r, b + 1) >= Dedup.lshRecall(j, r, b) &&
      Dedup.lshRecall(j, r, b) >= 0.0 && Dedup.lshRecall(j, r, b) <= 1.0
  }

  property("lsh.params-meet-recall-floor-within-budget") = Prop.forAll(threshold) { j =>
    import graft.ops.Dedup
    val (k, b) = Dedup.lshParams(j)
    k % b == 0 && k <= 32 && Dedup.lshRecall(j, k / b, b) >= 0.9
  }
}
