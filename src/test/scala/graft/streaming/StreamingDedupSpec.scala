package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("replays within the watermark window are dropped once") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val events = stream.toDF().toDF("t_ms", "id", "payload")
      .withColumn("event_time", timestamp_millis(col("t_ms")))

    val q = StreamingOps.dedupIds(events, Seq("id"),
        watermark = "10 seconds")
      .writeStream.format("memory").queryName("dedup_ids")
      .outputMode("append").start()
    try {
      stream.addData((1000L, 1L, "a"), (2000L, 2L, "b"))
      q.processAllAvailable()
      // replay id 1 in a later batch, still inside the watermark window
      stream.addData((3000L, 1L, "a-replay"), (4000L, 3L, "c"))
      q.processAllAvailable()
      val out = spark.table("dedup_ids")
        .select("id", "payload").as[(Long, String)].collect().sorted
      assert(out.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally q.stop()
  }
}
