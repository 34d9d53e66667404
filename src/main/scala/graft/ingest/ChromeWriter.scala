package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas._

/** Chrome Tracing JSON sink (SURVEY §2.2 K1; pipit/writers/chrome_writer.py:4-50).
  *
  * Projects events to the Trace Event Format: `name`, `ph` (Enter→"B",
  * Leave→"E", Instant→"i"), `ts` (ns→µs, double), `pid`, `tid`, plus
  * `args` from the event attribute bag when the trace carries one
  * (chrome_writer.py:44-46 copies `Attributes` into `args`). The
  * projection is a pure columnar select — usable as a DataFrame (for tests
  * and oracles) or written as JSON lines.
  */
object ChromeWriter {

  def project(events: DataFrame): DataFrame = {
    val tid = if (events.columns.contains(Thread)) col(Thread) else col(Process)
    val base = Seq(
      col(Name).as("name"),
      when(col(EventType) === Enter, "B")
        .when(col(EventType) === Leave, "E")
        .otherwise("i").as("ph"),
      (col(TimestampNs).cast("double") / 1000.0).as("ts"),
      col(Process).as("pid"),
      tid.as("tid"))
    val cols = if (events.columns.contains(Attributes))
      base :+ col(Attributes).as("args") else base
    events.select(cols: _*)
  }

  /** Write as a JSON-lines directory (Spark-native). For a single
    * Perfetto-openable file, coalesce(1) or post-concatenate.
    * `codec` (e.g. `Some("gzip")`) compresses each part file — Chrome
    * trace JSON is highly redundant text (~10x with gzip), so the codec
    * is what makes the export viable as a stored interchange artifact at
    * scale; Perfetto/Chrome and [[ChromeReader]] both ingest .json.gz
    * directly (Spark decompresses by file extension). */
  def write(events: DataFrame, path: String,
            codec: Option[String] = None): Unit = {
    val w = project(events).write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }
}
