package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import graft.streaming.StreamingOps.{CdcIn, CdcOut, CdcState}

/** Streaming CDC apply: last-writer-wins per batch, tombstones emit as
  * retraction markers, stale (≤ high-water) changes are dropped and
  * counted, and idle keys expire. */
class StreamingCdcSpec extends SparkSpec {

  import org.apache.spark.api.java.Optional

  private def state(timeout: Boolean, st: Option[CdcState]): TestGroupState[CdcState] = {
    val opt = st match {
      case Some(v) => Optional.of(v)
      case None => Optional.empty[CdcState]()
    }
    TestGroupState.create[CdcState](opt,
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = timeout)
  }

  test("batch emits the post-batch winner; later batch upserts over it") {
    val live = state(timeout = false, None)
    val out = StreamingOps.cdcGroup(None)(7L, Iterator(
      CdcIn(7L, 10L, "I", 5L), CdcIn(7L, 20L, "U", 9L)), live).toList
    assert(out == List(CdcOut(7L, 20L, "U", 9L, deleted = false, n_stale = 0L)))
    assert(live.get == CdcState(20L, "U", 9L, applied = true))
    val next = StreamingOps.cdcGroup(None)(7L,
      Iterator(CdcIn(7L, 30L, "U", 11L)), live).toList
    assert(next == List(CdcOut(7L, 30L, "U", 11L, deleted = false, n_stale = 0L)))
  }

  test("tombstone emits a retraction marker and a later insert revives") {
    val live = state(timeout = false, None)
    StreamingOps.cdcGroup(None)(1L, Iterator(CdcIn(1L, 10L, "I", 1L)), live)
    val del = StreamingOps.cdcGroup(None)(1L,
      Iterator(CdcIn(1L, 20L, "D", 0L)), live).toList
    assert(del == List(CdcOut(1L, 20L, "D", 0L, deleted = true, n_stale = 0L)))
    val revive = StreamingOps.cdcGroup(None)(1L,
      Iterator(CdcIn(1L, 30L, "I", 2L)), live).toList
    assert(revive == List(CdcOut(1L, 30L, "I", 2L, deleted = false, n_stale = 0L)))
  }

  test("stale replays below the high-water mark drop and are counted") {
    val live = state(timeout = false,
      Some(CdcState(50L, "U", 4L, applied = true)))
    // below the high-water (seq, op, v) order: stale. An equal-seq row
    // with a HIGHER tie (50,U,98 > 50,U,4) wins, exactly as batch
    // applyCdc's (seq, tieCols) rule would rank it.
    val out = StreamingOps.cdcGroup(None)(2L, Iterator(
      CdcIn(2L, 40L, "U", 99L), CdcIn(2L, 50L, "U", 98L)), live).toList
    assert(out == List(CdcOut(2L, 50L, "U", 98L, deleted = false, n_stale = 1L)))
    assert(live.get == CdcState(50L, "U", 98L, applied = true))
    // an exact replay of the applied change is stale, not re-applied
    val replay = StreamingOps.cdcGroup(None)(2L,
      Iterator(CdcIn(2L, 50L, "U", 98L)), live).toList
    assert(replay == List(CdcOut(2L, 50L, "U", 98L, deleted = false, n_stale = 1L)))
    // a quiet batch for this key emits nothing
    val quiet = StreamingOps.cdcGroup(None)(2L, Iterator.empty, live).toList
    assert(quiet.isEmpty)
  }

  test("out-of-order within a batch still picks the max-seq winner") {
    // rows are seq-sorted inside the batch, so arrival order is moot
    // and neither row is stale — both applied, max-seq wins
    val live = state(timeout = false, None)
    val out = StreamingOps.cdcGroup(None)(3L, Iterator(
      CdcIn(3L, 30L, "U", 3L), CdcIn(3L, 10L, "I", 1L)), live).toList
    assert(out == List(CdcOut(3L, 30L, "U", 3L, deleted = false, n_stale = 0L)))
  }

  test("streaming end state matches the batch MergeApply") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val log = Seq(
      (1L, 10L, "I", 5L), (2L, 11L, "I", 6L), (1L, 20L, "U", 7L),
      (3L, 12L, "I", 1L), (3L, 30L, "D", 0L), (2L, 25L, "U", 9L))
    val stream = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingOps.cdcApply(
        stream.toDF().toDF("user_id", "seq", "op", "val_c"))
      .writeStream.format("memory").queryName("cdc_par")
      .outputMode("append").start()
    try {
      val (b1, b2) = log.splitAt(3)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      // live streaming state = last emitted row per key, minus deletes
      val streamed = spark.table("cdc_par").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3),
          r.getBoolean(4))))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2._1)._2).toMap
        .filter(!_._2._4)
        .map { case (k, (seq, op, v, _)) => (k, seq, op, v) }.toSet
      val batch = graft.analysis.MergeApply.applyCdc(
          log.toDF("user_id", "seq", "op", "val_c")
            .withColumn("event_id", lit(0L)),
          Seq("user_id"), "seq", Seq("event_id"), "op")
        .select("user_id", "seq", "op", "val_c")
        .as[(Long, Long, String, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("timeout removes state silently") {
    val timedOut = state(timeout = true,
      Some(CdcState(9L, "U", 1L, applied = true)))
    val out = StreamingOps.cdcGroup(Some("10 seconds"))(4L,
      Iterator.empty, timedOut).toList
    assert(out.isEmpty)
    assert(timedOut.isRemoved)
  }
}
