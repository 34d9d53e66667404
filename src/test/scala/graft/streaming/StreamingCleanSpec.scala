package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.scale.Dedup

/** Streaming exact-substring removal against a frozen shingle index:
  * batch parity across micro-batches, and the contract that
  * within-stream duplication is NOT cleaned (defers to the next index
  * refresh). */
class StreamingCleanSpec extends SparkSpec {
  import spark.implicits._

  test("cleanAgainstIndex == batch incremental clean (withinBatch=false) across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val hist = Seq(
      (1L, "p q r s t u filler words here now"),
      (2L, "p q r s t u more filler beyond that")
    ).toDF("doc_id", "text")
    val index = Dedup.shingleIndex(hist)
    val fresh = Seq(
      (10L, "zz p q r s yy ww vv uu tt"),   // shares a history block
      (11L, "clean doc nothing shared one"),
      (12L, "clean doc nothing shared two")  // 11/12 share 3-grams
    )
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
      .withColumn("event_time", timestamp_millis(col("doc_id") * 1000))
    val q = StreamingOps.cleanAgainstIndex(docs, index)
      .writeStream.format("memory").queryName("clean_idx")
      .outputMode("append").start()
    try {
      stream.addData(fresh(0))
      q.processAllAvailable()
      stream.addData(fresh(1), fresh(2))
      // a far-future doc pushes the watermark past every real window so
      // append mode emits the finals; it is filtered out below
      stream.addData((10000L, "flush doc far in the future"))
      q.processAllAvailable()
      val got = spark.table("clean_idx")
        .filter(col("doc_id") < 1000)
        .select("doc_id", "n_tokens", "n_kept", "clean_hash")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      val want = Dedup.dupSpansRemovedIncremental(
          fresh.toDF("doc_id", "text"), index, withinBatch = false)
        .select("doc_id", "n_tokens", "n_kept", "clean_hash")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(got == want)
      // the history block was cut; within-stream duplication was not
      val kept = got.map(x => x._1 -> x._3).toMap
      assert(kept(10L) < 10 && kept(11L) == 5 && kept(12L) == 5)
    } finally q.stop()
  }

  test("cleanAgainstIndex: replayed copies collapse, a re-crawled different-text copy cleans independently") {
    implicit val sqlCtx = spark.sqlContext
    val index = Dedup.shingleIndex(
      Seq((1L, "p q r s t u")).toDF("doc_id", "text"))
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDF().toDF("doc_id", "text")
      .withColumn("event_time", timestamp_millis(col("doc_id") * 1000))
    val q = StreamingOps.cleanAgainstIndex(docs, index)
      .writeStream.format("memory").queryName("clean_dup")
      .outputMode("append").start()
    try {
      // at-least-once replay: the identical event arrives twice; plus a
      // re-crawl of doc 20 with DIFFERENT text in the same window
      stream.addData(
        (10L, "zz p q r s yy"), (10L, "zz p q r s yy"),
        (20L, "first crawl p q r tail"), (20L, "second crawl no overlap"))
      q.processAllAvailable()
      stream.addData((10000L, "flush doc far in the future"))
      q.processAllAvailable()
      val got = spark.table("clean_dup").filter(col("doc_id") < 1000)
        .select("doc_id", "n_kept").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // replayed doc 10 -> exactly ONE row, cleaned as if sent once
      assert(got.count(_._1 == 10L) == 1)
      assert(got.find(_._1 == 10L).get._2 == 2L) // "zz"+"yy" survive
      // re-crawled doc 20 -> one row PER version, each self-consistent
      val v20 = got.filter(_._1 == 20L).map(_._2).sorted
      assert(v20.toSeq == Seq(3L, 4L)) // v1 loses "p q r", v2 untouched
    } finally q.stop()
  }

  test("batch withinBatch flag: true also cleans new-new duplication, false defers it") {
    val index = Dedup.shingleIndex(
      Seq((1L, "p q r s t u")).toDF("doc_id", "text"))
    val fresh = Seq(
      (11L, "clean doc nothing shared one"),
      (12L, "clean doc nothing shared two")
    ).toDF("doc_id", "text")
    val on = Dedup.dupSpansRemovedIncremental(fresh, index)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_kept")).toMap
    val off = Dedup.dupSpansRemovedIncremental(fresh, index,
        withinBatch = false)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_kept")).toMap
    assert(on(11L) == 1 && on(12L) == 1)   // shared 4-token block cut
    assert(off(11L) == 5 && off(12L) == 5) // deferred to index refresh
  }
}
