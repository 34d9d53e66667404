package graft

import org.apache.spark.sql.functions._

import graft.analysis.CommOps
import graft.ingest.Otf2Reader
import graft.model.Schemas._

/** Reader conformance against the reference's ping-pong OTF2 fixture
  * (goldens from /root/reference/pipit/tests/otf2-tests.py and
  * tests/trace.py:10-68, recorded in FIXTURES.md §A3). */
class Otf2Spec extends SparkSpec {
  private val fixture = "/root/reference/pipit/tests/data/ping-pong-otf2"
  private def available = new java.io.File(fixture + "/traces.def").isFile
  private lazy val events = Otf2Reader.read(spark, fixture).cache()

  test("120 events, 60 per rank, 2 processes, 1 thread each") {
    assume(available)
    assert(events.count() == 120)
    val perProc = events.groupBy(Process).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perProc == Map(0 -> 60L, 1 -> 60L))
    assert(events.select(Thread).distinct().count() == 1)
  }

  test("event types are Enter/Leave/Instant") {
    assume(available)
    val types = events.select(EventType).distinct().collect().map(_.getString(0)).toSet
    assert(types == Set(Enter, Leave, Instant))
  }

  test("11 distinct names matching the reference goldens") {
    assume(available)
    val names = events.select(Name).distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("MPI_Send", "MPI_Recv", "MpiSend", "MpiRecv", "MPI_Init",
      "MPI_Finalize", "MPI_Comm_rank", "MPI_Comm_size", "int main(int, char**)",
      "ProgramBegin", "ProgramEnd"), s"got $names")
  }

  test("comm matrix: 4,177,920 bytes / 8 messages each way, empty diagonal") {
    assume(available)
    val size = CommOps.commMatrixDense(events)
    assert(size(0)(1) == 4177920L && size(1)(0) == 4177920L)
    assert(size(0)(0) == 0L && size(1)(1) == 0L)
    val count = CommOps.commMatrixDense(events, "count")
    assert(count(0)(1) == 8L && count(1)(0) == 8L)
  }

  test("definitions table: 533 records, 17 definition types") {
    assume(available)
    val defs = Otf2Reader.definitions(spark, fixture)
    assert(defs.count() == 533)
    assert(defs.select("def_type").distinct().count() == 17)
    assert(defs.filter(col("def_type") === "Region").count() == 235)
    assert(defs.filter(col("def_type") === "String").count() == 267)
    assert(defs.filter(col("def_type") === "Location").count() == 2)
  }

  test("event attribute bags: Enter carries region, Leave null, sends typed") {
    assume(available)
    val enter = events.filter(col(EventType) === Enter).limit(1).collect()(0)
    val eattrs = enter.getMap[String, String](enter.fieldIndex(Attributes))
    assert(eattrs.keys.toSet == Set("region"))
    assert(eattrs("region").startsWith("Region "))
    assert(events.filter(col(EventType) === Leave &&
      col(Attributes).isNotNull).count() == 0)
    val send = events.filter(col(Name) === "MpiSend").limit(1).collect()(0)
    val sattrs = send.getMap[String, String](send.fieldIndex(Attributes))
    assert(sattrs("communicator").startsWith("Comm "))
    assert(sattrs.contains("msg_tag") && sattrs.contains("msg_length"))
  }

  test("definitions attributes: location/clock/region bags resolved") {
    assume(available)
    val defs = Otf2Reader.definitions(spark, fixture).cache()
    def attrsOf(r: org.apache.spark.sql.Row) =
      r.getMap[String, String](r.fieldIndex(Attributes))
    val loc0 = defs.filter(col("def_type") === "Location" && col("id") === 0)
      .collect()(0)
    assert(attrsOf(loc0) == Map("name" -> "Master thread", "type" -> "1",
      "number_of_events" -> "60", "location_group" -> "LocationGroup 0"))
    val clock = defs.filter(col("def_type") === "ClockProperties").collect()(0)
    assert(attrsOf(clock)("timer_resolution").toLong > 0)
    val main = defs.filter(col("def_type") === "Region" &&
      col("name").startsWith("int main")).collect()(0)
    assert(attrsOf(main)("name").startsWith("int main"))
    defs.unpersist()
  }

  test("chrome projection of OTF2 events carries args from attributes") {
    assume(available)
    val chrome = graft.ingest.ChromeWriter.project(events)
    assert(chrome.columns.contains("args"))
    val b = chrome.filter(col("ph") === "B").limit(1).collect()(0)
    assert(b.getMap[String, String](b.fieldIndex("args")).contains("region"))
  }

  test("timestamps strictly increasing in event order; matching clean") {
    assume(available)
    val ts = events.orderBy(col(EventId)).select(TimestampNs).collect().map(_.getLong(0))
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    val enriched = graft.enrich.EventMatcher.enrich(events)
    assert(enriched.filter(col(EventType).isin(Enter, Leave) &&
      col(MatchingEventId).isNull).count() == 0)
    // main() encloses everything per rank: depth 0, 21 enters per rank
    val mains = enriched.filter(col(Name).startsWith("int main") &&
      col(EventType) === Enter).collect()
    assert(mains.length == 2 && mains.forall(_.getAs[Int](Depth) == 0))
  }
}
