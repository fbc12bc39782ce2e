package graft

import org.apache.spark.sql.functions._

import graft.etl.Etl

/** Bucketed-table layout specs: the co-located join must plan WITHOUT
  * a shuffle on either side — that is the entire point of bucketing.
  */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join: no exchange on either side, result correct") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bkt_spec").toString
    val left = (1L to 100L).map(i => (i, s"name_$i")).toDF("id", "name")
    val right = (1L to 300L).map(i => (i % 100 + 1, i)).toDF("id", "order_id")
    Etl.writeBucketed(left, "spec_bkt_left", s"$tmp/left", "id", 4, Some("id"))
    Etl.writeBucketed(right, "spec_bkt_right", s"$tmp/right", "id", 4, Some("id"))
    // Disable broadcast: tiny test tables would broadcast-join (which
    // rightly ignores bucketing); the co-location claim is about the
    // SHUFFLED join path that large-scale sides take.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Etl.readBucketed(spark, "spec_bkt_left")
        .join(Etl.readBucketed(spark, "spec_bkt_right"), Seq("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 300)
      // bucket pruning sanity: reading back preserves values
      assert(joined.filter(col("id") === 7L).count() == 3)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
