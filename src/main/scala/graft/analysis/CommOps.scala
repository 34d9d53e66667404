package graft.analysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Communication-analysis operators (SURVEY §2.4 A1–A4).
  *
  * The reference pulls `receiver` / `msg_length` out of a per-row Python
  * dict (pipit/trace.py:412-428); we consume the promoted typed columns
  * `attr_receiver` / `attr_msg_length` (SURVEY §1.4) so every operator here
  * is a pure columnar filter + aggregate — scan-only over primitive
  * columns, fully codegen'd, with map-side partial aggregation.
  *
  * Outputs are long-form; the reference's dense numpy matrices are a
  * presentation concern (`commMatrixDense` pivots at the collect boundary).
  */
object CommOps {
  val SendNames = Seq("MpiSend", "MpiIsend") // pipit/trace.py:401-404
  val RecvNames = Seq("MpiRecv", "MpiIrecv") // pipit/trace.py:475-481

  /** comm_matrix (pipit/trace.py:367-444), long form:
    * (sender, receiver, volume) where volume is Σ msg_length ("size") or
    * message count ("count"). */
  def commMatrix(events: DataFrame, output: String = "size"): DataFrame = {
    val sends = events.filter(col(Name).isin(SendNames: _*))
    val vol = if (output == "size") sum(col(AttrMsgLength)) else count(lit(1))
    sends.groupBy(col(Process).as("sender"), col(AttrReceiver).as("receiver"))
      .agg(vol.cast("long").as("volume"))
  }

  /** Time-resolved communication matrix — (sender, receiver, time-bin,
    * volume), the animated-comm-matrix / channel-timeline feed: which
    * links are hot WHEN, where [[commMatrix]] only says how much in
    * total. Sparse (only active cells), one filter + one keyed
    * aggregation; bin edges from the trace extent like
    * [[commOverTime]] (integer arithmetic — bin = (t−lo)·bins div
    * (hi−lo+1), exact in any engine). */
  def commMatrixOverTime(events: DataFrame, output: String = "size",
                         bins: Int = 20): DataFrame = {
    val extRow = events.agg(min(col(TimestampNs)), max(col(TimestampNs))).head
    require(!extRow.isNullAt(0), "comm_matrix_over_time: empty trace")
    val (lo, hi) = (extRow.getLong(0), extRow.getLong(1))
    val w = hi - lo + 1
    val vol = if (output == "size") sum(col(AttrMsgLength)) else count(lit(1))
    events.filter(col(Name).isin(SendNames: _*))
      .withColumn("bin",
        expr(s"((timestamp_ns - ${lo}L) * $bins) div ${w}L").cast("int"))
      .groupBy(col(Process).as("sender"), col(AttrReceiver).as("receiver"),
        col("bin"))
      .agg(vol.cast("long").as("volume"))
  }

  /** Dense ranks×ranks matrix, reference-shaped (driver-side; only for
    * presentation / API parity at the collect boundary). */
  def commMatrixDense(events: DataFrame, output: String = "size"): Array[Array[Long]] = {
    val maxRank = events.agg(max(col(Process))).head
    if (maxRank.isNullAt(0)) return Array.empty // empty trace: empty matrix
    val nRanks = maxRank.getInt(0) + 1
    val m = Array.fill(nRanks, nRanks)(0L)
    commMatrix(events, output).collect().foreach { r =>
      // sends lacking a receiver attribute (or with an all-null volume)
      // cannot be placed — skip rather than NPE at the collect boundary
      if (!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
        m(r.getInt(0))(r.getInt(1)) = r.getLong(2)
    }
    m
  }

  /** message_histogram (pipit/trace.py:446-455): equal-width histogram of
    * send-message sizes, numpy-histogram semantics: `bins` equal intervals
    * spanning [min, max] of the data, last bin right-closed. Long-form
    * (bin, bin_start, bin_end, count); empty bins included. */
  def messageHistogram(events: DataFrame, bins: Int = 20): DataFrame = {
    val sizes = events.filter(col(Name).isin(SendNames: _*))
      .select(col(AttrMsgLength).cast("double").as("sz"))
    // the extent is one tiny row consumed by several stages — collect it
    // once instead of re-running the aggregation per consumer; all-equal
    // sizes expand to [lo-0.5, hi+0.5] (numpy.histogram's degenerate-range
    // rule) instead of producing 0/0 = NaN bins
    val extRow = sizes.agg(min(col("sz")), max(col("sz"))).head
    require(!extRow.isNullAt(0), "message_histogram: trace has no send events")
    val (lo0, hi0) = (extRow.getDouble(0), extRow.getDouble(1))
    val (lo, hi) = if (hi0 == lo0) (lo0 - 0.5, hi0 + 0.5) else (lo0, hi0)
    val binned = sizes
      .withColumn("bin", least(
        floor((col("sz") - lo) / ((hi - lo) / bins)),
        lit(bins - 1L)).cast("int"))
      .groupBy(col("bin")).agg(count(lit(1)).as("count"))
    sizes.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * (hi - lo) / bins).as("bin_start"),
        (lit(lo) + (col("bin") + 1) * (hi - lo) / bins).as("bin_end"),
        coalesce(col("count"), lit(0L)).as("count"))
  }

  /** comm_over_time (pipit/trace.py:457-496): histogram of send/recv event
    * timestamps over `bins` equal intervals spanning the min/max timestamp
    * of the *whole* trace, weighted by msg size ("size") or unweighted
    * ("count"). */
  def commOverTime(events: DataFrame, output: String = "size",
                   messageType: String = "send", bins: Int = 50): DataFrame = {
    val names = if (messageType == "send") SendNames else RecvNames
    // trace extent collected once (one tiny row, several consumers);
    // a single-timestamp trace expands like messageHistogram's
    // degenerate range instead of dividing by zero
    val extRow = events.agg(min(col(TimestampNs)).cast("double"),
      max(col(TimestampNs)).cast("double")).head
    require(!extRow.isNullAt(0), "comm_over_time: empty trace")
    val (lo0, hi0) = (extRow.getDouble(0), extRow.getDouble(1))
    val (lo, hi) = if (hi0 == lo0) (lo0 - 0.5, hi0 + 0.5) else (lo0, hi0)
    val msgs = events.filter(col(Name).isin(names: _*))
      .select(col(TimestampNs).cast("double").as("t"), col(AttrMsgLength).as("sz"))
      .withColumn("bin", least(
        floor((col("t") - lo) / ((hi - lo) / bins)),
        lit(bins - 1L)).cast("int"))
    val vol = if (output == "size") sum(col("sz")) else count(lit(1))
    val binned = msgs.groupBy(col("bin")).agg(vol.cast("long").as("volume"))
    events.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        (lit(lo) + col("bin") * (hi - lo) / bins).as("bin_start"),
        (lit(lo) + (col("bin") + 1) * (hi - lo) / bins).as("bin_end"),
        coalesce(col("volume"), lit(0L)).as("volume"))
  }

  /** Per-time-bin structural profile of the send traffic — the input to
    * communication-pattern classification (is this phase ring/neighbor
    * exchange, an all-to-all, a hotspot/incast?): message and byte
    * totals, active-pair / sender / receiver cardinalities, the busiest
    * single pair, and the self- and ring-neighbor shares, all as exact
    * integer counts per bin (classification thresholds are a
    * presentation choice; the counts are the engine's job). Binning
    * follows [[commOverTime]] (whole-trace extent, degenerate-range
    * expansion, last bin right-closed).
    *
    * Plan: one (bin, sender, receiver) aggregation over the send scan,
    * then a per-bin rollup of that already-tiny pair table — two keyed
    * exchanges, map-side partials, no window. The trace extent and rank
    * count are one collected scalar row (same as the other extent
    * consumers here); ring distance wraps at nRanks. */
  def commStructure(events: DataFrame, bins: Int = 20): DataFrame = {
    val extRow = events.agg(min(col(TimestampNs)).cast("double"),
      max(col(TimestampNs)).cast("double"), max(col(Process))).head
    require(!extRow.isNullAt(0), "comm_structure: empty trace")
    val (lo0, hi0) = (extRow.getDouble(0), extRow.getDouble(1))
    val (lo, hi) = if (hi0 == lo0) (lo0 - 0.5, hi0 + 0.5) else (lo0, hi0)
    val nRanks = extRow.getInt(2) + 1
    val pairs = events.filter(col(Name).isin(SendNames: _*))
      .select(col(TimestampNs).cast("double").as("t"),
        col(Process).as("s"), col(AttrReceiver).as("r"),
        col(AttrMsgLength).as("sz"))
      .withColumn("bin", least(
        floor((col("t") - lo) / ((hi - lo) / bins)),
        lit(bins - 1L)).cast("int"))
      .groupBy(col("bin"), col("s"), col("r"))
      .agg(count(lit(1)).as("n"), sum(col("sz")).as("b"))
    val ringDist =
      least(abs(col("s") - col("r")), lit(nRanks) - abs(col("s") - col("r")))
    val agg = pairs.groupBy(col("bin")).agg(
      sum(col("n")).as("n_msgs"), sum(col("b")).as("bytes"),
      count(lit(1)).as("n_pairs"),
      countDistinct(col("s")).as("n_senders"),
      countDistinct(col("r")).as("n_receivers"),
      max(col("n")).as("max_pair_msgs"),
      sum(when(col("s") === col("r"), col("n")).otherwise(0L)).as("self_msgs"),
      sum(when(ringDist === 1, col("n")).otherwise(0L)).as("ring_msgs"))
    events.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
      .join(agg, Seq("bin"), "left")
      .select(col("bin") +: Seq("n_msgs", "bytes", "n_pairs", "n_senders",
        "n_receivers", "max_pair_msgs", "self_msgs", "ring_msgs")
        .map(c => coalesce(col(c), lit(0L)).as(c)): _*)
  }

  /** Send↔recv message matching (beyond the reference; the Vampir /
    * Scalasca "late sender" primitive): under MPI's non-overtaking rule,
    * the k-th send from p to q pairs with the k-th receive posted at q
    * from p. Relationally that is two ranking windows — sends ranked per
    * (src, dst), receives ranked per (dst, src) — and one equi-join on
    * (src, dst, k). Both windows and the join shuffle on the SAME
    * channel key, so the plan is one exchange per side and the work per
    * task is one channel's message stream; latency = recv_ts − send_ts
    * is then a column, and unmatched sends/recvs (dropped messages,
    * truncated traces) fall out of the inner join — count them with an
    * anti-join if needed. */
  def matchMessages(events: DataFrame,
                    latencyCol: String = "latency_ns"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sends = events.filter(col(Name).isin(SendNames: _*))
      .select(col(Process).as("src"), col(AttrReceiver).as("dst"),
        col(TimestampNs).as("send_ts"), col(EventId).as("send_event_id"))
      .withColumn("k", row_number().over(Window.partitionBy(col("src"), col("dst"))
        .orderBy(col("send_ts"), col("send_event_id"))))
    val recvs = events.filter(col(Name).isin(RecvNames: _*))
      .select(col(Process).as("dst"), col(AttrReceiver).as("src"),
        col(TimestampNs).as("recv_ts"), col(EventId).as("recv_event_id"))
      .withColumn("k", row_number().over(Window.partitionBy(col("src"), col("dst"))
        .orderBy(col("recv_ts"), col("recv_event_id"))))
    sends.join(recvs, Seq("src", "dst", "k"))
      .select(col("src"), col("dst"), col("k"),
        col("send_event_id"), col("recv_event_id"),
        col("send_ts"), col("recv_ts"),
        (col("recv_ts") - col("send_ts")).as(latencyCol))
  }

  /** Per-channel latency-vs-size linear-model sufficient statistics —
    * the LogGP-style communication cost fit (latency ≈ α + β·size, α the
    * per-message overhead, 1/β the bandwidth). Emits the EXACT integer
    * sums (n, Σx, Σy, Σxy, Σx²) per (src, dst) channel over the matched
    * messages of [[matchMessages]]; slope and intercept are presentation
    * arithmetic ((nΣxy − ΣxΣy) / (nΣx² − Σx²)). Integer sums are
    * order-free — bit-identical across engines and partition orders —
    * where a float least-squares fold would drift.
    *
    * y is the matched latency in MILLIseconds (truncating division):
    * with ns-scale epochs a single x·y product can exceed 2⁶³; ms keeps
    * Σxy within Long for ~10⁹ messages per channel at 10 GB messages.
    * Scale shape: the matchMessages window pair, one equi-join back to
    * the send rows for the size attribute, one partial-aggregated
    * rollup — every shuffle keys on the channel or the event id. */
  def latencyModel(events: DataFrame): DataFrame = {
    val sizes = events.select(col(EventId).as("send_event_id"),
      col(AttrMsgLength).as("bytes"))
    matchMessages(events)
      .withColumn("lat_ms", expr("latency_ns div 1000000"))
      .join(sizes, Seq("send_event_id"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"),
        sum(col("bytes")).as("sum_x"),
        sum(col("lat_ms")).as("sum_y"),
        sum(col("bytes") * col("lat_ms")).as("sum_xy"),
        sum(col("bytes") * col("bytes")).as("sum_x2"))
  }

  /** Wait-time attribution from the matched messages: a receive posted
    * BEFORE its send completes is a late-sender stall — the receiver
    * sat blocked for (send_ts − recv_ts). Aggregated per receiving
    * process this is the classic "who is waiting on whom" summary that
    * drives MPI imbalance hunts; one aggregation over
    * [[matchMessages]]' output. */
  def commWait(events: DataFrame): DataFrame =
    matchMessages(events)
      .select(col("dst"),
        when(col("send_ts") > col("recv_ts"), col("send_ts") - col("recv_ts"))
          .otherwise(lit(0L)).as("wait"),
        when(col("send_ts") > col("recv_ts"), 1L).otherwise(0L).as("late"))
      .groupBy(col("dst").as("process"))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("late")).as("n_late_sends"),
        sum(col("wait")).as("total_wait_ns"))

  /** Per-channel wait-state CLASSIFICATION of the matched messages —
    * the Scalasca late-sender / late-receiver split. A pair where the
    * receive was posted before the send ever started (recv_ts < send_ts)
    * is a LATE SENDER: the receiver burned (send_ts − recv_ts) ns
    * blocked. A pair where the send completed first is a LATE RECEIVER:
    * the message sat buffered/in-flight for (recv_ts − send_ts) ns —
    * rendezvous-protocol sender stall risk at large message sizes.
    * Per (src, dst) channel: pair counts and total ns in each class.
    * Scale shape: inherits [[matchMessages]]'s one-exchange-per-side
    * channel-keyed plan; the rollup is a partial-aggregated groupBy on
    * the same channel key, so no extra wide shuffle of the pair table. */
  def waitClasses(events: DataFrame): DataFrame =
    matchMessages(events)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n_matched"),
        sum(when(col("recv_ts") < col("send_ts"), 1L).otherwise(0L))
          .as("n_late_sender"),
        sum(when(col("recv_ts") < col("send_ts"),
          col("send_ts") - col("recv_ts")).otherwise(0L))
          .as("late_sender_wait_ns"),
        sum(when(col("recv_ts") >= col("send_ts"), 1L).otherwise(0L))
          .as("n_late_receiver"),
        sum(when(col("recv_ts") >= col("send_ts"),
          col("recv_ts") - col("send_ts")).otherwise(0L))
          .as("late_receiver_transit_ns"))

  /** Protocol-switch detection per channel — where does the latency
    * REGIME change as message size grows? MPI implementations switch
    * from eager (fire-and-forget, flat latency) to rendezvous
    * (handshake, latency jumps) at a size threshold; recovering that
    * threshold from a trace is the classic LogGP-calibration companion
    * to [[latencyModel]]'s single linear fit. Matched messages are
    * ordered by size within each channel and the integer CUSUM argmax
    * ([[graft.analysis.Changepoint.cusumMax]]) over their
    * millisecond latencies marks the size where the cumulative latency
    * leaves the uniform ramp — exact BIGINT cross-multiplication, no
    * float drift. The per-channel (size, seq) order is packed into one
    * orderable bucket (bytes·10⁷ + k, so ≤10⁷ messages per channel —
    * require()d), and the threshold size unpacks from the argmax.
    * Plan: the matchMessages window pair + one size join, then
    * channel-keyed windows — one exchange per side, nothing global. */
  def protocolSwitch(events: DataFrame): DataFrame = {
    val sizes = events.select(col(EventId).as("send_event_id"),
      col(AttrMsgLength).as("bytes"))
    val paired = matchMessages(events)
      .join(sizes, Seq("send_event_id"))
      .withColumn("channel", concat_ws(":", col("src"), col("dst")))
      // per-row loud failure on packing overflow, not silent misordering
      .withColumn("bucket", when(assert_true(col("k") < 10000000L,
          lit("protocolSwitch: >10^7 messages on one channel — widen the bucket packing"))
        .isNull, col("bytes") * 10000000L + col("k")))
      .withColumn("lat_ms", expr("latency_ns div 1000000"))
    graft.analysis.Changepoint.cusumMax(
        paired.select(col("channel"), col("bucket"), col("lat_ms")),
        "channel", "bucket", "lat_ms")
      .select(
        split(col("channel"), ":").getItem(0).cast("int").as("src"),
        split(col("channel"), ":").getItem(1).cast("int").as("dst"),
        expr("change_bucket div 10000000").as("threshold_bytes"),
        col("score"), col("n_buckets").as("n_msgs"),
        col("total").as("lat_ms_total"))
  }

  /** Unmatched-message audit — the anti-join complement of
    * [[matchMessages]]: per channel, how many sends never met a receive
    * and vice versa (dropped messages, truncated traces, asymmetric
    * logging). A paired matcher without this view silently hides data
    * loss. */
  def commUnmatched(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(names: Seq[String], procAs: String, peerAs: String,
               side: String) =
      events.filter(col(Name).isin(names: _*))
        .select(col(Process).as(procAs), col(AttrReceiver).as(peerAs),
          col(TimestampNs).as("ts"), col(EventId).as("eid"))
        .withColumn("k", row_number().over(
          Window.partitionBy(col("src"), col("dst"))
            .orderBy(col("ts"), col("eid"))))
        .select(col("src"), col("dst"), col("k"), lit(side).as("side"))
    val sends = ranked(SendNames, "src", "dst", "send")
    val recvs = ranked(RecvNames, "dst", "src", "recv")
    val loneSends = sends.join(recvs.select("src", "dst", "k"),
      Seq("src", "dst", "k"), "left_anti")
    val loneRecvs = recvs.join(sends.select("src", "dst", "k"),
      Seq("src", "dst", "k"), "left_anti")
    loneSends.unionByName(loneRecvs)
      .groupBy(col("src"), col("dst"), col("side"))
      .agg(count(lit(1)).as("n_unmatched"))
  }

  /** comm_by_process (pipit/trace.py:498-512): total sent/received per
    * process — two aggs over the long-form comm matrix + full outer join
    * (row/column sums of the dense matrix, without materializing it). */
  def commByProcess(events: DataFrame, output: String = "size"): DataFrame = {
    val cm = commMatrix(events, output)
    val sent = cm.groupBy(col("sender").as(Process)).agg(sum(col("volume")).as("sent"))
    val recv = cm.groupBy(col("receiver").as(Process)).agg(sum(col("volume")).as("received"))
    sent.join(recv, Seq(Process), "full_outer")
      .select(col(Process),
        coalesce(col("sent"), lit(0L)).as("sent"),
        coalesce(col("received"), lit(0L)).as("received"))
  }
}
