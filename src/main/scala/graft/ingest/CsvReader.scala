package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** CSV trace reader (SURVEY §2.1 S1; pipit/trace.py:69-97 `Trace.from_csv`).
  *
  * Input format: header `Timestamp (s)|Timestamp (ns), Event Type, Name,
  * Process` (+ optional extra numeric metric columns), values possibly
  * space-padded. Seconds are converted to ns (×1e9); rows are globally
  * sorted by timestamp and assigned dense `event_id`s.
  *
  * Tie-breaking: equal timestamps keep *input order* (the reference's
  * stable sort keeps it, trace.py:92-95). We capture it with
  * `monotonically_increasing_id()` before any shuffle — within an input
  * partition row order equals file order. For the single-file case (the
  * reference's `from_csv(filename)` signature) this is exactly file
  * order; for a multi-file directory Spark packs splits largest-first,
  * so cross-FILE tie order follows size order, not name order — still
  * deterministic for a fixed input set, but callers needing a specific
  * cross-file order should read files separately and union in order.
  */
object CsvReader {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .option("inferSchema", "false")
      .csv(path)

    val cols = raw.columns.map(_.trim)
    val renamed = raw.toDF(cols: _*)
    val hasSeconds = cols.contains("Timestamp (s)")
    val tsCol = if (hasSeconds) "Timestamp (s)" else "Timestamp (ns)"

    val ts =
      if (hasSeconds) (col(tsCol).cast(DoubleType) * 1e9).cast(LongType)
      else col(tsCol).cast(LongType)

    // optional Thread column becomes part of the execution location
    // (trace.py:121-126 branches matching on its presence); remaining
    // extra columns (metrics etc.) pass through as doubles
    val hasThread = cols.contains("Thread")
    val threadCols =
      if (hasThread) Seq(col("Thread").cast(IntegerType).as(Thread)) else Nil
    val extras = cols.filterNot(
      Seq(tsCol, "Event Type", "Name", "Process", "Thread").contains)
    // single select (a rename-then-drop pipeline would collide with Spark's
    // case-insensitive resolution: dropping "Name" also drops "name")
    val canonical = renamed
      .withColumn("__src_order", monotonically_increasing_id())
      .select(Seq(
        ts.as(TimestampNs),
        col("`Event Type`").cast(StringType).as(EventType),
        col("Name").cast(StringType).as(Name),
        col("Process").cast(IntegerType).as(Process)) ++
        threadCols ++ Seq(col("__src_order")) ++
        extras.map(c => col(s"`$c`").cast(DoubleType).as(c)): _*)

    val ordered = Seq(EventId, TimestampNs, EventType, Name, Process) ++
      (if (hasThread) Seq(Thread) else Nil) ++ extras
    Ingest.assignDenseIds(canonical, EventId, col(TimestampNs), col("__src_order"))
      .drop("__src_order")
      .select(ordered.map(col): _*)
  }
}
