package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.scale.{Sketches, TextOps}
import graft.streaming.StreamingSketches

/** Streaming sketch twins: the windowed cell/register tables use the
  * same md5 hash families as the batch sketches, so summing cells
  * (CMS) / max-merging registers (HLL) across windows reproduces the
  * batch sketch exactly. */
class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (0L, "en", "alpha beta alpha", 1000L),
    (1L, "en", "alpha gamma", 2000L),
    (2L, "de", "delta delta epsilon", 12000L)) // second window

  private def staticTokens =
    rows.toDF("doc_id", "lang", "text", "t_ms")
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))

  test("streaming CMS cells sum across windows to the batch cell table") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Long)]
    val docs = stream.toDF().toDF("doc_id", "lang", "text", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingSketches.cmsCells(docs, "10 seconds", "0 seconds",
        depth = 2, width = 16)
      .writeStream.format("memory").queryName("cms").outputMode("update").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms")
        .groupBy("seed", "bucket").agg(sum("cell").as("cell"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      val expected = staticTokens
        .select(explode(array(lit(0), lit(1))).as("seed"), col("token"))
        .select(col("seed"),
          (Sketches.tokenHash(col("seed"), col("token")) % 16).as("bucket"))
        .groupBy("seed", "bucket").agg(count(lit(1)).as("cell"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == expected && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming HLL registers max-merge to the batch registers") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Long)]
    val docs = stream.toDF().toDF("doc_id", "lang", "text", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingSketches.hllRegisters(docs, "lang", "10 seconds", "0 seconds")
      .writeStream.format("memory").queryName("hllr").outputMode("update").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("hllr")
        .groupBy("lang", "bucket").agg(max("reg").as("reg"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      val expected = staticTokens
        .select(col("lang"), Sketches.tokenHash(lit("h"), col("token")).as("h"))
        .select(col("lang"), expr("h % 64").as("bucket"), expr("h div 64").as("rest"))
        .select(col("lang"), col("bucket"),
          when(col("rest") === 0, lit(55))
            .otherwise(bit_count(expr("(rest & -rest) - 1")) + 1).as("rho"))
        .groupBy("lang", "bucket").agg(max("rho").as("reg"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(streamed == expected && streamed.nonEmpty)
    } finally q.stop()
  }
}
