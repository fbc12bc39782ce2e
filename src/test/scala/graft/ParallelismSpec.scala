package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation

import graft.util.Parallelism

/** Contract of [[graft.util.Parallelism.ensure]] — the one mechanism
  * guarding compute-heavy stages against under-parallel scan layouts
  * (applied at the fact-table scan helper since r13).
  */
class ParallelismSpec extends SparkSpec {

  private def repartitions(df: DataFrame): Int =
    df.queryExecution.logical.collect { case r: RepartitionOperation => r }.size

  private def writeSingleFile(rows: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_par_spec").toString
    import spark.implicits._
    (1 to rows).map(i => (i.toLong, s"v$i" * 8)).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("ensure fires on a small single-file scan and is IDEMPOTENT (no stacked shuffles)") {
    val dir = writeSingleFile(2000)
    val df = spark.read.parquet(dir)
    val once = Parallelism.ensure(df)
    assert(repartitions(once) == 1, "under-parallel single-file scan must repartition")
    assert(once.rdd.getNumPartitions == 4)
    // Operator-internal ensure on an already-ensured frame (and on a
    // projection of one) must not stack a second full shuffle.
    assert(Parallelism.ensure(once) eq once)
    val projected = Parallelism.ensure(once.select("id"))
    assert(repartitions(projected) == 1)
  }

  test("every heavyScanQueries entry carries the repartition guard against an under-parallel layout") {
    // The registry IS the mechanism (VERDICT r12 item 7): compute-heavy
    // fact-scan queries are listed once in SparkEntry.heavyScanQueries
    // and this test asserts each one's plan carries a repartition
    // guard when built over the driver's single-file sf0.001 tables —
    // so a new heavy query without its `ensure` fails here, not in an
    // sf1 bench three rounds later. (A blanket scan-helper repartition
    // was measured and rejected: it cannot parallelize the scan itself
    // and taxes every scan→shuffle query — see the t() scaladoc.)
    val dir = "/root/testdata/sf0.001"
    val names = SparkEntry.heavyScanQueries
    assert(names.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"registry names not in queries: $unknown")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val guards = df.queryExecution.logical.collect { case r: RepartitionOperation => r }
      assert(guards.nonEmpty,
        s"$name is registered compute-heavy but its plan has no repartition guard")
    }
  }

  test("ensure is a no-op when the byte-split estimate already reaches target parallelism") {
    // A single LARGE file is not an under-parallel layout: Spark chops
    // splittable sources into maxSplitBytes pieces. Model 'large'
    // relative to a lowered openCost rather than writing a 12 MB
    // fixture: with openCost 1 KB, a ~100 KB file splits ≥ 4 ways
    // (bytes/defaultParallelism governs), so no repartition — while
    // the default 4 MB openCost makes the same file estimate as 1
    // split, so repartition fires.
    val dir = writeSingleFile(20000)
    val key = "spark.sql.files.openCostInBytes"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "1024")
      assert(repartitions(Parallelism.ensure(spark.read.parquet(dir))) == 0,
        "multi-split single file must not pay a repartition shuffle")
      spark.conf.set(key, "4194304")
      assert(repartitions(Parallelism.ensure(spark.read.parquet(dir))) == 1,
        "single-split single file must repartition")
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }
}
