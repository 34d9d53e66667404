package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.scale.TextOps
import graft.streaming.StreamingOps

/** Streaming NB classifier: frozen-model scoring over micro-batches
  * equals the batch classifier, windows close on watermark. */
class StreamingNbSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("en", "the cat sat on the mat"),
    ("en", "the dog ate the bone"),
    ("en", "a cat and a dog"),
    ("fr", "le chat dort sur le tapis"),
    ("fr", "le chien mange un os"),
    ("fr", "un chat et un chien")).toDF("lang", "text")

  private def model() = {
    val (tokDelta, classStats) = TextOps.naiveBayesModel(train)
    val cs = classStats.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    (tokDelta, cs)
  }

  test("streaming classify across micro-batches equals the batch classifier") {
    implicit val sqlCtx = spark.sqlContext
    val (tokDelta, cs) = model()
    val docsData = Seq(
      (1L, "the cat ate the bone", 1000L),
      (2L, "le chat mange un os", 2000L),
      (3L, "zzz qqq", 3000L),
      (4L, "le chien dort sur le tapis", 4000L))
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF().toDF("doc_id", "text", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingOps.nbClassify(docs, tokDelta, cs,
        windowDur = "10 seconds", watermark = "0 seconds")
      .writeStream.format("memory").queryName("nbc").outputMode("append").start()
    try {
      stream.addData(docsData.take(2))
      q.processAllAvailable()
      stream.addData(docsData.drop(2))
      q.processAllAvailable()
      // advance the watermark past the [0,10s) window to flush it
      stream.addData((99L, "flush", 30000L))
      q.processAllAvailable()
      val got = spark.table("nbc").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("pred"), r.getAs[Long]("score_m"),
            r.getAs[Long]("margin_m"))).toMap
      val batch = TextOps.naiveBayes(
          docsData.map(d => (d._1, d._2)).toDF("doc_id", "text"), train)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getLong(2), r.getLong(3))).toMap
      assert((1L to 4L).forall(id => got(id) == batch(id)),
        s"stream $got vs batch $batch")
      assert(!got.contains(99L), "flush doc's window is still open")
    } finally q.stop()
  }

  test("single-class model streams with margin 0") {
    implicit val sqlCtx = spark.sqlContext
    val (tokDelta0, _) = TextOps.naiveBayesModel(
      train.filter(col("lang") === "en"))
    val cs = TextOps.naiveBayesModel(train.filter(col("lang") === "en"))
      ._2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val stream = MemoryStream[(Long, String, Long)]
    val docs = stream.toDF().toDF("doc_id", "text", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingOps.nbClassify(docs, tokDelta0, cs,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("nbc1").outputMode("append").start()
    try {
      stream.addData((1L, "the cat", 1000L), (2L, "flush", 30000L))
      q.processAllAvailable()
      val rows = spark.table("nbc1").collect()
      assert(rows.length == 1 && rows.head.getAs[String]("pred") == "en" &&
        rows.head.getAs[Long]("margin_m") == 0L)
    } finally q.stop()
  }
}
