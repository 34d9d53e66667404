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

  /** Dense ranks×ranks matrix, reference-shaped (driver-side; only for
    * presentation / API parity at the collect boundary). */
  def commMatrixDense(events: DataFrame, output: String = "size"): Array[Array[Long]] = {
    val nRanks = events.agg(max(col(Process))).head.getInt(0) + 1
    val m = Array.fill(nRanks, nRanks)(0L)
    commMatrix(events, output).collect().foreach { r =>
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
    val ext = sizes.agg(min(col("sz")).as("lo"), max(col("sz")).as("hi"))
    val binned = sizes.crossJoin(broadcast(ext))
      .withColumn("bin", least(
        floor((col("sz") - col("lo")) / ((col("hi") - col("lo")) / bins)),
        lit(bins - 1L)).cast("int"))
      .groupBy(col("bin")).agg(count(lit(1)).as("count"))
    ext.select(explode(sequence(lit(0), lit(bins - 1))).as("bin"), col("lo"), col("hi"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        (col("lo") + col("bin") * (col("hi") - col("lo")) / bins).as("bin_start"),
        (col("lo") + (col("bin") + 1) * (col("hi") - col("lo")) / bins).as("bin_end"),
        coalesce(col("count"), lit(0L)).as("count"))
  }

  /** comm_over_time (pipit/trace.py:457-496): histogram of send/recv event
    * timestamps over `bins` equal intervals spanning the min/max timestamp
    * of the *whole* trace, weighted by msg size ("size") or unweighted
    * ("count"). */
  def commOverTime(events: DataFrame, output: String = "size",
                   messageType: String = "send", bins: Int = 50): DataFrame = {
    val names = if (messageType == "send") SendNames else RecvNames
    val ext = events.agg(min(col(TimestampNs)).cast("double").as("lo"),
                         max(col(TimestampNs)).cast("double").as("hi"))
    val msgs = events.filter(col(Name).isin(names: _*))
      .select(col(TimestampNs).cast("double").as("t"), col(AttrMsgLength).as("sz"))
      .crossJoin(broadcast(ext))
      .withColumn("bin", least(
        floor((col("t") - col("lo")) / ((col("hi") - col("lo")) / bins)),
        lit(bins - 1L)).cast("int"))
    val vol = if (output == "size") sum(col("sz")) else count(lit(1))
    val binned = msgs.groupBy(col("bin")).agg(vol.cast("long").as("volume"))
    ext.select(explode(sequence(lit(0), lit(bins - 1))).as("bin"), col("lo"), col("hi"))
      .join(binned, Seq("bin"), "left")
      .select(col("bin"),
        (col("lo") + col("bin") * (col("hi") - col("lo")) / bins).as("bin_start"),
        (col("lo") + (col("bin") + 1) * (col("hi") - col("lo")) / bins).as("bin_end"),
        coalesce(col("volume"), lit(0L)).as("volume"))
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
