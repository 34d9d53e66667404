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
