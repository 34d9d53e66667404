package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas._

/** Chrome Trace Event Format source — the inverse of [[ChromeWriter]]
  * and a real-world ingest path: PyTorch/TensorFlow profilers, Perfetto
  * exports, and Chromium itself all emit this JSON. The reference only
  * writes the format; reading it back closes the round trip so a trace
  * exported for a viewer can re-enter the engine.
  *
  * Handles the phases that carry timing semantics:
  *  - `B`/`E` duration events → canonical Enter/Leave rows;
  *  - `i` (and legacy `I`) instants → Instant rows;
  *  - `X` complete events (begin + `dur` in one record — what the ML
  *    profilers actually emit) → an Enter at `ts` and a Leave at
  *    `ts + dur`, expanded columnar via explode, never per-row driver
  *    logic;
  *  - metadata/counter/flow phases (`M`, `C`, `s`/`t`/`f`, …) are
  *    dropped — they have no canonical-schema equivalent.
  *
  * Timestamps are Chrome µs doubles → ns Longs (the writer's inverse;
  * sub-µs fractions from tools that emit them survive via the ×1000
  * before the cast). `pid`→process, `tid`→thread. Scale shape: a JSON
  * scan partitions by file blocks; the expansion is a generated-column
  * explode; id assignment reuses the readers' shared distributed
  * [[Ingest.assignDenseIds]] — no global window.
  */
object ChromeReader {

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("ph", StringType),
    StructField("ts", DoubleType),
    StructField("dur", DoubleType),
    StructField("pid", LongType),
    StructField("tid", LongType)))

  /** Read a Chrome-trace JSON-lines directory/file (as [[ChromeWriter.write]]
    * or a profiler emits — gzip part files decompress by extension).
    * `assignIds = false` skips the dense-id sort (a full-data sort +
    * cache) for consumers that key on (process, timestamp_ns). */
  def read(spark: SparkSession, path: String,
           assignIds: Boolean = true): DataFrame = {
    val records = spark.read.schema(schema).json(path)
    if (assignIds) fromRecords(records) else normalize(records)
  }

  /** Streaming ingest of a Chrome-trace JSON-lines directory — live
    * profiler output tailed as it lands. Same phase normalization as
    * the batch path, WITHOUT dense event ids: a global dense ordering
    * is a batch concept (it needs the whole dataset); streaming
    * consumers ([[graft.streaming.StreamingMatcher]], windowed aggs)
    * key on (process, timestamp_ns) instead. */
  def readStream(spark: SparkSession, path: String): DataFrame =
    normalize(spark.readStream.schema(schema).json(path))

  /** Parse a Dataset/DataFrame with one JSON record string per row in
    * `jsonCol` — the no-filesystem variant for streams and tests.
    * `assignIds = false` skips the dense-id sort (a full-data sort +
    * cache) for consumers that key on (process, timestamp_ns) — e.g. a
    * fidelity check or a hand-off to the streaming matcher. */
  def parseLines(lines: DataFrame, jsonCol: String = "value",
                 assignIds: Boolean = true): DataFrame = {
    val records = lines
      .select(from_json(col(jsonCol), schema).as("r"))
      .select("r.*")
    if (assignIds) fromRecords(records) else normalize(records)
  }

  private def fromRecords(raw: DataFrame): DataFrame = {
    val events = normalize(raw)
    // At equal ts the event_type sort key puts Enter before Leave
    // (lexicographic, as 'B' < 'E' in the source format) — a zero-length
    // X span still opens before it closes.
    Ingest.assignDenseIds(events, EventId,
      col(TimestampNs), col(EventType), col(Name), col(Process))
  }

  /** Phase normalization (streaming-safe: filter/select/explode only).
    * ONE pass over the parsed records: a branch-per-phase union would
    * re-run the from_json parse — the dominant cost — once per branch
    * (measured 2× the JSON work on the round-trip query); instead every
    * surviving record explodes a conditional 1- or 2-element array. */
  private def normalize(raw: DataFrame): DataFrame = {
    // round, don't truncate: µs doubles carry ~2⁻⁵² relative error from
    // the writer's ns→µs division, so a plain cast could lose 1 ns
    def toNs(c: Column): Column = round(c * 1000.0).cast(LongType)
    raw.filter(col("ph").isin("B", "E", "i", "I", "X"))
      .select(explode(when(col("ph") === "X", array(
          struct(lit(Enter).as(EventType), toNs(col("ts")).as(TimestampNs)),
          struct(lit(Leave).as(EventType),
            toNs(col("ts") + coalesce(col("dur"), lit(0.0))).as(TimestampNs))))
        .otherwise(array(struct(
          when(col("ph") === "B", Enter)
            .when(col("ph") === "E", Leave)
            .otherwise(Instant).as(EventType),
          toNs(col("ts")).as(TimestampNs))))).as("e"),
        col("name").as(Name), col("pid"), col("tid"))
      .select(col("e." + EventType).as(EventType), col(Name),
        col("e." + TimestampNs).as(TimestampNs),
        col("pid").cast(IntegerType).as(Process),
        col("tid").cast(IntegerType).as(Thread))
  }
}
