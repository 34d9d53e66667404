package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analysis.Sessionize

/** Streaming guarded sequence match: O(1) state per key, batch-parity
  * on in-order streams. */
class StreamingGuardSpec extends SparkSpec {
  import spark.implicits._

  test("matches batch guardedMatch verdicts on an in-order random stream") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new Random(37)
    val types = Vector("click", "view", "purchase", "error")
    // (user, ts, id, type), ids unique, fed in (ts, id) order
    val evs = (0L until 300L).map { i =>
      (rng.nextInt(5).toLong, i * 10L + rng.nextInt(5), i, types(rng.nextInt(4)))
    }.sortBy(e => (e._2, e._3))

    val stream = MemoryStream[(Long, Long, Long, String)]
    val docs = stream.toDF().toDF("user_id", "t", "event_id", "event_type")
    val q = StreamingOps.guardedMatch(docs, "purchase", "click", "error",
        windowUs = 200L)
      .writeStream.format("memory").queryName("guard")
      .outputMode("append").start()
    try {
      val (b1, b2) = evs.splitAt(150)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("guard")
        .groupBy(col("k").as("user_id"))
        .agg(count(lit(1)).as("n_targets"),
          sum(when(col("matched"), 1L).otherwise(0L)).as("n_matched"))
        .as[(Long, Long, Long)].collect().toSet

      val batch = Sessionize.guardedMatch(
          evs.toDF("user_id", "t_us", "event_id", "event_type"),
          "purchase", "click", "error", windowUs = 200L)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === batch)
      assert(got.exists(_._3 > 0)) // the random stream produces matches
    } finally q.stop()
  }
}
