package graft.model

import org.apache.spark.sql.types._

/** Canonical column names + schemas for the events table.
  *
  * Mirrors the reference's convention-based schema (pipit/trace.py:11-30,
  * readers build the column set ad hoc; operators probe with
  * `"col" in df.columns`). We keep the same convention — operators key off
  * column *names* on a plain DataFrame — but give the canonical set fixed
  * Spark types (see FIXTURES.md §A1).
  *
  * Column-name mapping from the reference (dots are illegal-ish in Spark
  * column names, so `time.inc` → `time_inc` etc.):
  *   "Timestamp (ns)"     → timestamp_ns (LongType — trace time is relative
  *                           ns, arithmetic heavy; not TimestampType)
  *   "Event Type"         → event_type ("Enter"|"Leave"|"Instant"|...)
  *   "Name"               → name
  *   "Process"            → process
  *   "Thread"             → thread (nullable; absent semantics = all-null)
  *   "Attributes" (dict)  → attributes Map[String,String] + promoted typed
  *                           attr_* columns (SURVEY §1.4)
  *   "_matching_event"    → matching_event_id
  *   "_matching_timestamp"→ matching_ts
  *   "_depth"/"_parent"   → depth / parent_event_id
  *   "time.inc"/"time.exc"→ time_inc / time_exc
  *   pandas row index     → event_id (dense Long, assigned at ingest)
  */
object Schemas {
  // canonical event columns
  val EventId = "event_id"
  val TimestampNs = "timestamp_ns"
  val EventType = "event_type"
  val Name = "name"
  val Process = "process"
  val Thread = "thread"
  val Attributes = "attributes"

  // promoted attribute columns consumed by comm operators (SURVEY §1.4)
  val AttrReceiver = "attr_receiver"
  val AttrMsgLength = "attr_msg_length"
  val AttrFromPe = "attr_from_pe"
  val AttrSendTime = "attr_send_time"

  // enrichment columns (EventMatcher output)
  val MatchingEventId = "matching_event_id"
  val MatchingTs = "matching_ts"
  val Depth = "depth"
  val ParentEventId = "parent_event_id"
  val PathHash = "path_hash"
  val ParentPathHash = "parent_path_hash"

  // metric columns
  val TimeInc = "time_inc"
  val TimeExc = "time_exc"
  def incCol(metric: String): String =
    if (metric == TimestampNs) TimeInc else metric + "_inc"
  def excCol(metric: String): String =
    if (metric == TimestampNs) TimeExc else metric + "_exc"

  // event type values (pipit/readers/otf2_reader.py:293-297)
  val Enter = "Enter"
  val Leave = "Leave"
  val Instant = "Instant"

  /** Minimal canonical schema (thread/attributes optional by convention). */
  val eventsSchema: StructType = StructType(Seq(
    StructField(EventId, LongType, nullable = false),
    StructField(TimestampNs, LongType, nullable = false),
    StructField(EventType, StringType, nullable = false),
    StructField(Name, StringType, nullable = false),
    StructField(Process, IntegerType, nullable = false),
    StructField(Thread, IntegerType, nullable = true),
    StructField(Attributes, MapType(StringType, StringType), nullable = true)
  ))

  /** CCT node table schema (relational encoding of pipit's pointer Graph,
    * pipit/graph.py:7-98 → SURVEY §1.4). */
  val cctSchema: StructType = StructType(Seq(
    StructField("node_id", LongType, nullable = false),
    StructField("path_hash", LongType, nullable = false),
    StructField("parent_path_hash", LongType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("path", StringType, nullable = false)
  ))
}
