package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Structured Streaming counterparts of the batch analyses (SURVEY §1.4
  * noted streaming as the natural extension; pipit itself is batch-only —
  * these are graft's additions for live-trace pipelines).
  *
  * Input contract: a streaming DataFrame in canonical events shape with an
  * additional `event_time: timestamp` column (trace ns mapped onto a
  * wall-clock epoch, or real ingest time). All operators are watermarked,
  * incremental, and shuffle on the same keys as their batch twins — the
  * plan shape survives a 1000-executor deployment unchanged.
  */
object StreamingOps {

  /** Streaming comm_over_time: per-tumbling-window send volume (size and
    * count), grouped like the batch A3 but windowed on event time. */
  def commOverTime(events: DataFrame, window: String = "10 seconds",
                   watermark: String = "30 seconds"): DataFrame =
    events
      .filter(col(Name).isin(graft.analysis.CommOps.SendNames: _*))
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window))
      .agg(sum(col(AttrMsgLength)).as("volume"), count(lit(1)).as("n_messages"))
      .select(col("window.start").as("window_start"), col("volume"), col("n_messages"))

  /** Streaming comm matrix deltas: (window, sender, receiver, volume). */
  def commMatrix(events: DataFrame, window: String = "10 seconds",
                 watermark: String = "30 seconds"): DataFrame =
    events
      .filter(col(Name).isin(graft.analysis.CommOps.SendNames: _*))
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window),
        col(Process).as("sender"), col(AttrReceiver).as("receiver"))
      .agg(sum(col(AttrMsgLength)).as("volume"))
      .select(col("window.start").as("window_start"), col("sender"),
        col("receiver"), col("volume"))

  /** Streaming exact dedup for live corpus ingestion (the streaming twin
    * of [[graft.scale.Dedup.exact]]): drop any document whose content
    * hash was already admitted within the watermark horizon. State is one
    * entry per distinct content hash, expired by the engine once the
    * watermark passes its event time + delay — so memory is bounded by
    * the dedup horizon, the standard design for dedup-at-ingest (exact
    * global dedup over all history stays a batch job). */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 watermark: String = "1 hour",
                 timeCol: String = "event_time"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Curation at ingest: the streaming composition of the batch pipeline
    * — quality pre-filter (stateless, codegen'd columnar expression) then
    * exact dedup within the watermark horizon ([[exactDedup]]). The
    * filter runs BEFORE the stateful dedup so junk never enters the hash
    * state — the order that matters at firehose rates. */
  def curatedIngest(docs: DataFrame, minQuality: Double,
                    textCol: String = "text", watermark: String = "1 hour",
                    timeCol: String = "event_time"): DataFrame =
    exactDedup(
      docs.filter(graft.scale.TextOps.quality(col(textCol)) >= minQuality),
      textCol, watermark, timeCol)

  /** Gap-based session windows per process (the streaming twin of
    * [[graft.analysis.Sessionize]]) via Spark's native session_window —
    * state is managed by the engine, sessions close at watermark. */
  def sessions(events: DataFrame, keyCol: String = Process,
               gap: String = "30 minutes",
               watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(AttrMsgLength)).as("volume"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"), col("volume"))
}
