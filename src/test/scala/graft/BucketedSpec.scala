package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.ingest.Bucketed

/** The point of bucketing is plan-visible: a same-key same-count
  * bucketed join must run with ZERO shuffle exchanges. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }
    plan.collect { case e: ShuffleExchangeExec => e }.length
  }

  test("same-key bucketed join plans with zero shuffles and exact results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val left = (0L until 200L).map(i => (i, i % 7, s"l$i")).toDF("id", "k", "lv")
    val right = (0L until 50L).map(j => (j, j % 7, s"r$j")).toDF("rid", "k", "rv")
    Bucketed.write(left, "b_left", "k", 4, Some(s"$dir/l"), sortCols = Seq("k"))
    Bucketed.write(right, "b_right", "k", 4, Some(s"$dir/r"), sortCols = Seq("k"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Bucketed.table(spark, "b_left")
        .join(Bucketed.table(spark, "b_right"), Seq("k"))
      assert(shuffleCount(bucketed) == 0,
        s"bucketed join should not shuffle:\n${bucketed.queryExecution.executedPlan}")
      // identical rows to the plain (shuffling) join
      val plain = left.join(right, Seq("k"))
      assert(shuffleCount(plain) > 0) // the join bucketing eliminates
      assert(bucketed.count() == plain.count())
      assert(bucketed.select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        .sameElements(plain.select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted))
      // per-bucket-key aggregation also skips the exchange
      val agg = Bucketed.table(spark, "b_left").groupBy("k").count()
      assert(shuffleCount(agg) == 0,
        s"bucketed agg should not shuffle:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }
}
