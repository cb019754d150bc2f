package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the shuffle-elimination strategy for
  * repeated fact-to-fact joins at 100 TB: write both tables bucketed by
  * the join key; Spark's bucketed scan satisfies the join's required
  * hash distribution, so the physical plan contains NO shuffle exchange
  * on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // tables land in ./spark-warehouse (gitignored); clear any leftover
    // location from an earlier aborted run too
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Seq("li_b", "o_b").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.delete(f))
      }
    }
    graft.Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    // suppress broadcast so the plan must rely on bucket distribution
    // (at real fact-fact scale neither side would be broadcastable)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = spark.table("li_b")
          .join(spark.table("o_b"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(sum("l_quantity").as("qty"))
        j.collect() // force planning + execution under the conf
        j
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (SortMergeJoin over
    // bucketed scans); the only exchange allowed is the aggregate's
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") ||
      plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join sides should be exchange-free:\n$plan")

    // and the result matches the plain (shuffled) join
    val plain = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("qty"))
    // round(,2) for the cross-plan double comparison (the repo
    // convention): the two plans feed partial sums in different
    // orders, and exact Row equality only held because l_quantity is
    // integer-valued — fractional values would flake in ulps
    def rounded(df: org.apache.spark.sql.DataFrame) = df
      .select(col("o_orderpriority"), round(col("qty"), 2).as("qty"))
      .orderBy("o_orderpriority").collect()
    assert(rounded(joined).sameElements(rounded(plain)))
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
  }
}
