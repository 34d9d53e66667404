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

  test("streaming windowed top-k ranks per-window weight totals") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long)] // (user, weight, t_ms)
    val ev = stream.toDF().toDF("user_id", "weight", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = StreamingSketches.windowTopK(ev, k = 2,
        window = "10 seconds", watermark = "0 seconds")
      .writeStream.format("memory").queryName("wtopk")
      .outputMode("append").start()
    try {
      // window [0,10): u1=30, u2=25, u3=5 → top2 = u1, u2
      // window [10,20): u2=50, u1=10 → top2 = u2, u1
      stream.addData((1L, 10L, 1000L), (2L, 25L, 2000L), (1L, 20L, 3000L),
        (3L, 5L, 4000L), (2L, 50L, 12000L), (1L, 10L, 13000L))
      // advance the watermark past both windows so append emits them
      stream.addData((9L, 1L, 40000L))
      q.processAllAvailable()
      val got = spark.table("wtopk")
        .select(unix_millis(col("window_start")), col("rank"), col("key"),
          col("weight"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got.contains((0L, 1, 1L, 30L)) && got.contains((0L, 2, 2L, 25L)))
      assert(got.contains((10000L, 1, 2L, 50L)) &&
        got.contains((10000L, 2, 1L, 10L)))
      assert(!got.exists(r => r._1 == 0L && r._3 == 3L)) // u3 cut by k=2
    } finally q.stop()
  }

  test("windowTopK batch replay equals the row_number formulation on ties") {
    // tie-heavy: many (user, weight) pairs share the same per-window
    // total, so the ranking is decided by the heap's (w DESC, key DESC)
    // tie order — the exact convention the DuckDB oracle replays. 40
    // users x 4 windows, weights collide by construction (u % 7).
    val ev = (0 until 400).map { i =>
      (i % 40L, (i % 7L) + 1L, (i % 4) * 10000L + (i % 10) * 100L)
    }.toDF("user_id", "weight", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val got = StreamingSketches.windowTopK(ev, k = 5,
        window = "10 seconds", watermark = "0 seconds")
      .select(unix_millis(col("window_start")).as("ws"), col("rank"),
        col("key"), col("weight"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = ev
      .groupBy(window(col("event_time"), "10 seconds").as("w"),
        col("user_id").as("key"))
      .agg(sum("weight").as("wt"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("w")).orderBy(col("wt").desc, col("key").desc)))
      .filter(col("rank") <= 5)
      .select(unix_millis(col("w.start")), col("rank"), col("key"), col("wt"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected && got.size == 20) // 4 windows x top-5
  }

  test("windowedActive is batch-legal and matches its streaming run") {
    val rows = Seq((1L, 1000L), (1L, 2000L), (2L, 3000L), // win 0: 2 active
      (1L, 12000L), (3L, 13000L), (3L, 14000L),           // win 1: 2 active
      (9L, 40000L))                                       // win 3: 1 active
    // batch path (dropDuplicates branch) — this is the oracle replay
    // shape that r10 shipped broken (streaming-only API in batch plan)
    val batch = rows.toDF("user_id", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val got = graft.streaming.StreamingOps.windowedActive(
        batch, window = "10 seconds")
      .select(unix_millis(col("window_start")), col("active"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 2L, 10000L -> 2L, 40000L -> 1L))
    // streaming path (dropDuplicatesWithinWatermark branch)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val ev = stream.toDF().toDF("user_id", "t_ms")
      .withColumn("event_time", timestamp_millis(col("t_ms")))
    val q = graft.streaming.StreamingOps.windowedActive(
        ev, window = "10 seconds")
      .writeStream.format("memory").queryName("wact")
      .outputMode("append").start()
    try {
      stream.addData(rows.dropRight(1): _*)
      stream.addData(rows.last) // advances the watermark past win 0/1
      q.processAllAvailable()
      val streamed = spark.table("wact")
        .select(unix_millis(col("window_start")), col("active"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // the final window stays open in append mode; closed ones match
      assert(streamed == Map(0L -> 2L, 10000L -> 2L))
    } finally q.stop()
  }
}
