package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the shuffle-elimination lever for
  * repeated large-table joins at 100 TB (SURVEY.md §1.4 / build-rules
  * "partitioning & shuffle"): two tables bucketed by the join key join
  * WITHOUT a shuffle exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_a")
    (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
      .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .saveAsTable("bkt_b")
    // disable auto-broadcast so a shuffle join would otherwise appear
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 1000)
      // control: the same join on unbucketed data DOES shuffle
      val ua = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
      val ub = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "bv")
      val control = ua.join(ub, "k").queryExecution.executedPlan.toString
      assert(control.contains("Exchange hashpartitioning"), control)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
