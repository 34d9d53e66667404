package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.model.Schemas._

/** Promotion of `attributes` map entries to typed top-level columns
  * (SURVEY §1.4): the reference reads `Attributes["receiver"]` /
  * `["msg_length"]` with per-row Python lambdas (pipit/trace.py:412-428);
  * promoting the keys operators consume turns those reads into pure
  * columnar expressions and — crucially at scale — lets Parquet prune and
  * push down on them, which a MapType column defeats. */
object AttrPromote {

  /** Add `targetCol` = attributes[key] cast to `dataType` (null when the
    * bag or key is absent). No-op if the column already exists. */
  def promote(events: DataFrame, key: String, dataType: DataType,
              targetCol: String): DataFrame =
    if (events.columns.contains(targetCol)) events
    else if (!events.columns.contains(Attributes))
      events.withColumn(targetCol, lit(null).cast(dataType))
    else events.withColumn(targetCol,
      element_at(col(Attributes), key).cast(dataType))

  /** Promote the standard comm attributes consumed by the A1–A4 operators
    * from their reference key names. */
  def promoteCommAttrs(events: DataFrame): DataFrame = {
    var out = events
    out = promote(out, "receiver", org.apache.spark.sql.types.IntegerType, AttrReceiver)
    out = promote(out, "msg_length", org.apache.spark.sql.types.LongType, AttrMsgLength)
    out = promote(out, "From PE", org.apache.spark.sql.types.IntegerType, AttrFromPe)
    out = promote(out, "Send Time", org.apache.spark.sql.types.LongType, AttrSendTime)
    out
  }
}
