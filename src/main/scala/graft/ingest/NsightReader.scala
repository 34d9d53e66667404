package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** Nsight CSV reader (SURVEY §2.1 S5; pipit/readers/nsight_reader.py:10-111).
  *
  * Input rows carry an interval (`Start (ns)`, `End (ns)`) plus `Name`,
  * `PID`, `TID`; each row unpivots into an Enter and a Leave event
  * (nsight_reader.py:58-70). PID→Process and TID→Thread are renumbered to
  * dense 0..n-1 ids (PID globally, TID within each PID;
  * nsight_reader.py:28-56) — `dense_rank()` windows. Result is globally
  * sorted with dense event ids.
  */
object NsightReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true").csv(path)
    fromIntervals(
      raw.select(
        col("Name").as("name"),
        col("Start (ns)").cast(LongType).as("start_ns"),
        col("End (ns)").cast(LongType).as("end_ns"),
        col("PID").cast(LongType).as("pid"),
        col("TID").cast(LongType).as("tid")))
  }

  /** Core unpivot: interval rows (name, start_ns, end_ns, pid, tid) →
    * canonical Enter/Leave events. Exposed separately so any interval-shaped
    * DataFrame (not just Nsight CSV exports) can be lifted into a trace. */
  def fromIntervals(intervals: DataFrame): DataFrame = {
    val renumbered = intervals
      .withColumn(Process,
        (dense_rank().over(Window.orderBy(col("pid"))) - 1).cast(IntegerType))
      .withColumn(Thread,
        (dense_rank().over(Window.partitionBy(col("pid")).orderBy(col("tid"))) - 1)
          .cast(IntegerType))

    val unpivoted = renumbered.select(
      col("name"), col(Process), col(Thread),
      explode(array(
        struct(lit(Enter).as(EventType), col("start_ns").as(TimestampNs)),
        struct(lit(Leave).as(EventType), col("end_ns").as(TimestampNs)))).as("e"))
      .select(col("e." + TimestampNs).as(TimestampNs),
        col("e." + EventType).as(EventType),
        col("name").as(Name), col(Process), col(Thread))

    unpivoted
      .withColumn(EventId,
        row_number().over(Window.orderBy(col(TimestampNs), col(EventType).desc, col(Name)))
          .cast(LongType) - 1)
      .select(col(EventId), col(TimestampNs), col(EventType), col(Name),
        col(Process), col(Thread))
  }
}
