package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.scale.{Sketches, TextOps}

/** Streaming twins of [[graft.scale.Sketches]]: the sketch STATE (CMS
  * cells, distinct-count registers) is exactly what a watermarked
  * windowed aggregation keeps — fixed cells per window, associative
  * partial aggregates, engine-managed expiry. A downstream consumer
  * folds windows into running totals (cells add; registers max) —
  * both merges are lossless, the defining property of these sketches.
  * Hashes are the same md5 families as the batch ops, so a streaming
  * cell/register table is directly comparable to the batch one. */
object StreamingSketches {

  /** Per-window count–min cells over a streaming document source:
    * (window_start, seed, bucket, cell). State per window is
    * depth × width cells regardless of token volume. */
  def cmsCells(docs: DataFrame, window: String = "10 seconds",
               watermark: String = "30 seconds", depth: Int = 4,
               width: Int = 1024, textCol: String = "text",
               timeCol: String = "event_time"): DataFrame = {
    val seeds = array((0 until depth).map(lit(_)): _*)
    docs
      .select(col(timeCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col(timeCol), col("token"), explode(seeds).as("seed"))
      .select(col(timeCol), col("seed"),
        (Sketches.tokenHash(col("seed"), col("token")) % width).as("bucket"))
      .withWatermark(timeCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(timeCol), window),
        col("seed"), col("bucket"))
      .agg(count(lit(1)).as("cell"))
      .select(col("window.start").as("window_start"), col("seed"),
        col("bucket"), col("cell"))
  }

  /** Per-window distinct-count registers per group:
    * (window_start, group, bucket, reg). Merging windows (or groups)
    * is a MAX over registers — lossless, so running totals need no
    * re-scan of the stream. */
  def hllRegisters(docs: DataFrame, groupCol: String = "lang",
                   window: String = "10 seconds",
                   watermark: String = "30 seconds",
                   textCol: String = "text",
                   timeCol: String = "event_time"): DataFrame = {
    val m = 64
    docs
      .select(col(timeCol), col(groupCol),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col(timeCol), col(groupCol),
        Sketches.tokenHash(lit("h"), col("token")).as("h"))
      .select(col(timeCol), col(groupCol), expr(s"h % $m").as("bucket"),
        expr(s"h div $m").as("rest"))
      .select(col(timeCol), col(groupCol), col("bucket"),
        when(col("rest") === 0, lit(55))
          .otherwise(bit_count(expr("(rest & -rest) - 1")) + 1).as("rho"))
      .withWatermark(timeCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(timeCol), window),
        col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("reg"))
      .select(col("window.start").as("window_start"), col(groupCol),
        col("bucket"), col("reg"))
  }

  /** Per-window top-k heavy hitters by total weight — the live "what is
    * hot right now" feed (hot keys, hot links, top talkers). Two stages
    * inside ONE watermarked aggregation pipeline: a (window, key)
    * weight rollup, then the k-bounded native heap aggregate
    * [[graft.functions.TopKLongs.topK]] per window, so the state the
    * engine keeps is per-key partial sums plus ONE k-heap per in-flight
    * window — never a sorted per-window key list. Emits (window_start,
    * rank, key, weight) in rank order, largest first; weight ties break
    * by the heap's deterministic payload order. Append mode: a
    * window's ranking emits once, when the watermark closes it. */
  def windowTopK(events: DataFrame, keyCol: String = "user_id",
                 weightCol: String = "weight", k: Int = 5,
                 window: String = "10 seconds",
                 watermark: String = "30 seconds",
                 timeCol: String = "event_time"): DataFrame = {
    val win = org.apache.spark.sql.functions.window(col(timeCol), window)
    events
      .withWatermark(timeCol, watermark)
      .groupBy(win, col(keyCol).cast("long").as("key"))
      .agg(sum(col(weightCol).cast("long")).as("w"))
      // chained stateful aggs are streaming-legal post multi-stateful-op
      // support; the second stage re-windows on window_time() so its
      // state is ALSO watermark-expired (grouping the raw struct would
      // be a non-time group and leak state forever)
      .groupBy(org.apache.spark.sql.functions.window(
        window_time(col("window")), window))
      .agg(graft.functions.TopKLongs.topK(k, col("w"), col("key")).as("top"))
      .select(col("window.start").as("window_start"),
        posexplode(col("top")).as(Seq("i", "e")))
      .select(col("window_start"), (col("i") + 1).as("rank"),
        col("e.payload").as("key"), col("e.ord").as("weight"))
  }
}
