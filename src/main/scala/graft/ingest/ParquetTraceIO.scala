package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Canonical Parquet persistence for traces (SURVEY §2.2 K2 + the S2/OTF2
  * landing path).
  *
  * OTF2 archives are written by Score-P through the OTF2 library; the
  * reference reads them via that library's Python bindings
  * (pipit/readers/otf2_reader.py:13-524). A JVM OTF2 decoder isn't in
  * scope here (zero-egress container, no OTF2 jar), so the supported
  * ingestion path is SURVEY §2.1-S2's first option: an offline
  * otf2→Parquet converter (a ~40-line pipit/otf2 script on the trace
  * producer's side) writing this canonical schema, which then scales
  * natively — partition pruning by `process`, column pruning, predicate
  * pushdown all come from the Parquet source.
  *
  * `write` partitions by process so per-location operators (the matcher's
  * repartition) read co-located data; `read` validates the canonical
  * column contract up front instead of failing deep inside an operator.
  */
object ParquetTraceIO {

  val requiredColumns: Seq[String] = Seq(EventId, TimestampNs, EventType, Name, Process)

  def write(events: DataFrame, path: String): Unit =
    events.write.mode("overwrite").partitionBy(Process).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val missing = requiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"not a canonical trace: missing columns ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    // partitionBy writes the partition column last and as a directory key —
    // restore canonical column order and type
    df.select(
      (requiredColumns.map(c =>
        if (c == Process) col(c).cast("int").as(c) else col(c)) ++
        df.columns.filterNot(requiredColumns.contains).map(col)): _*)
  }
}
