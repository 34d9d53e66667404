package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** Nsight CSV reader (SURVEY §2.1 S5; pipit/readers/nsight_reader.py:10-111).
  *
  * Input rows carry an interval (`Start (ns)`, `End (ns)`) plus `Name`,
  * `PID`, `TID`; each row unpivots into an Enter and a Leave event
  * (nsight_reader.py:58-70). PID→Process and TID→Thread are renumbered to
  * dense 0..n-1 ids (PID globally, TID within each PID;
  * nsight_reader.py:28-56). The distinct (pid, tid) set is tiny (ranks ×
  * threads), so the renumbering is a driver-side map + broadcast join —
  * not an unpartitioned `dense_rank` window, which would funnel all rows
  * through one task.
  *
  * Tie-break at equal timestamps: Enter before Leave (`event_type` asc),
  * then name. The reference's unstable pandas sort leaves this
  * unspecified; Enter-first keeps zero-duration intervals matchable
  * (a Leave ordered before its own Enter would leave both unmatched).
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
    val spark = intervals.sparkSession
    import spark.implicits._

    // dense pid→Process (global) and tid→Thread (within pid) renumbering:
    // the distinct id set is bounded by #ranks × #threads — collect once,
    // map on the driver, broadcast-join back (no global window).
    val idPairs = intervals.select(col("pid"), col("tid")).distinct()
      .as[(Long, Long)].collect()
    val pidRank: Map[Long, Int] =
      idPairs.map(_._1).distinct.sorted.zipWithIndex.toMap
    val mapping = idPairs.groupBy(_._1).toSeq.flatMap { case (pid, pairs) =>
      pairs.map(_._2).distinct.sorted.zipWithIndex.map { case (tid, tIdx) =>
        (pid, tid, pidRank(pid), tIdx)
      }
    }.toDF("pid", "tid", Process, Thread)

    val renumbered = intervals.join(broadcast(mapping), Seq("pid", "tid"))

    val unpivoted = renumbered.select(
      col("name"), col(Process), col(Thread),
      explode(array(
        struct(lit(Enter).as(EventType), col("start_ns").as(TimestampNs)),
        struct(lit(Leave).as(EventType), col("end_ns").as(TimestampNs)))).as("e"))
      .select(col("e." + TimestampNs).as(TimestampNs),
        col("e." + EventType).as(EventType),
        col("name").as(Name), col(Process), col(Thread))

    // (process, thread) completes the total order: same-named events on
    // two ranks at one timestamp must still get deterministic ids
    Ingest.assignDenseIds(unpivoted, EventId,
        col(TimestampNs), col(EventType), col(Name), col(Process), col(Thread))
      .select(col(EventId), col(TimestampNs), col(EventType), col(Name),
        col(Process), col(Thread))
  }
}
