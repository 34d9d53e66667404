package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.scale.TextOps

/** Streaming MOSS matching against a frozen winnow index: the array
  * projection must reproduce the batch window-function fingerprints
  * bit-for-bit, and the stream output must match the batch cross pairs
  * across micro-batches. */
class StreamingWinnowSpec extends SparkSpec {
  import spark.implicits._

  private val shared = "zeta eta theta iota kappa lambda mu nu"
  private val hist = Seq(
    (1L, s"alpha beta $shared gamma delta"),
    (2L, s"one two three $shared four"),
    (3L, "unrelated historical content sits here quietly")
  ).toDF("doc_id", "text")
  private val fresh = Seq(
    (10L, s"brand new $shared wrapping text"),
    (40L, "nothing in common with anybody else at all")
  )

  test("winnowAgainstIndex == batch cross pairs (run in batch mode)") {
    val docs = fresh.toDF("doc_id", "text")
      .withColumn("event_time", timestamp_millis(col("doc_id") * 1000))
    val got = StreamingOps.winnowAgainstIndex(docs, TextOps.winnowIndex(hist),
        minShared = 1)
      .select(col("doc_id"), col("index_id"), col("n_shared"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = TextOps.winnowPairs(
        hist.unionByName(fresh.toDF("doc_id", "text")), minShared = 1)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("n_shared")))
      .filter(p => p._2 >= 10 && p._1 < 10) // cross pairs: hist id < 10
      .map(p => (p._2, p._1, p._3)).toSet   // (new doc, index doc)
    assert(got == want && got.nonEmpty)
    assert(!got.exists(_._1 == 40L))
  }

  test("winnowAgainstIndex emits the same matches through MemoryStream micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
      .withColumn("event_time", timestamp_millis(col("doc_id") * 1000))
    val q = StreamingOps.winnowAgainstIndex(docs, TextOps.winnowIndex(hist),
        minShared = 1)
      .writeStream.format("memory").queryName("winnow_idx")
      .outputMode("append").start()
    try {
      stream.addData(fresh(0))
      q.processAllAvailable()
      stream.addData(fresh(1))
      stream.addData((10000L, "watermark flush document far ahead"))
      q.processAllAvailable()
      val got = spark.table("winnow_idx")
        .filter(col("doc_id") < 1000)
        .select("doc_id", "index_id").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L), (10L, 2L)))
    } finally q.stop()
  }
}
