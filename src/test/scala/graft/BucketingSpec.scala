package graft

import org.apache.spark.sql.functions._

/** Bucketed-table co-location (SURVEY §4.2 / north_rule partitioning): a
  * fact table bucketed on its join key joins a same-bucketed table with NO
  * shuffle on either side — the physical property a 10^12-row transcripts ⋈
  * mentions join needs. Asserted against the physical plan.
  */
class BucketingSpec extends SparkSpecBase {

  test("same-bucketed tables join without exchange") {
    // warehouse dir is static config — default ./spark-warehouse (gitignored)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    // disable broadcast so the join strategy decision is about co-location
    val bcThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must read bucket-aligned inputs: no Exchange below it
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected sort-merge join:\n$plan")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
        !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and the result is correct
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n == li.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
    }
  }
}
