package graft

import org.apache.spark.sql.functions._

import graft.ingest.ProjectionsReader
import graft.model.Schemas._

/** Reader conformance against the reference's ping-pong Projections fixture
  * (goldens from /root/reference/pipit/tests/projections-tests.py, recorded
  * in FIXTURES.md §A6). Skipped if the fixture directory is absent. */
class ProjectionsSpec extends SparkSpec {
  private val fixture = "/root/reference/pipit/tests/data/ping-pong-projections"

  private def available = new java.io.File(fixture).isDirectory
  private lazy val events = ProjectionsReader.read(spark, fixture).cache()

  test("processes are {0, 1}") {
    assume(available)
    val procs = events.select(Process).distinct().collect().map(_.getInt(0)).toSet
    assert(procs == Set(0, 1))
  }

  test("event types are Enter/Instant/Leave") {
    assume(available)
    val types = events.select(EventType).distinct().collect().map(_.getString(0)).toSet
    assert(types == Set(Enter, Instant, Leave))
  }

  test("22 distinct names incl. chare::entry strings and runtime events") {
    assume(available)
    val names = events.select(Name).distinct().collect().map(_.getString(0)).toSet
    assert(names.size == 22, s"got ${names.size}: $names")
    assert(names.contains("Computation"))
    assert(names.contains("Idle"))
    assert(names.contains("Pack"))
    assert(names.contains("Unpack"))
    assert(names.exists(_.contains("::")))
  }

  test("creation instants per PE: 77 on PE0, 68 on PE1") {
    assume(available)
    val sends = events
      .filter(col(EventType) === Instant &&
        col(Attributes).getItem("Entry Type") === "Create")
      .groupBy(Process).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sends == Map(0 -> 77L, 1 -> 68L), s"got $sends")
  }

  test("each PE's trace begins and ends with Computation") {
    assume(available)
    for (pe <- Seq(0, 1)) {
      val ordered = events.filter(col(Process) === pe && col(TimestampNs) >= 0)
        .orderBy(col(EventId)).select(Name, EventType).collect()
      assert(ordered.head.getString(0) == "Computation" && ordered.head.getString(1) == Enter)
      assert(ordered.last.getString(0) == "Computation" && ordered.last.getString(1) == Leave)
    }
  }

  test("sts PAPI events + BEGIN_PROCESSING perf counts and id list") {
    val sts = ProjectionsReader.parseSts(Iterator(
      "PROCESSORS 2",
      "CHARE 0 \"main\" 2",
      "ENTRY CHARE 5 \"work()\" 0",
      "TOTAL_PAPI_EVENTS 2",
      "PAPI_EVENT 0 PAPI_TOT_CYC",
      "PAPI_EVENT 1 PAPI_L2_TCM"))
    assert(sts.papiEvents == Seq("PAPI_TOT_CYC", "PAPI_L2_TCM"))
    assert(sts.dimension(5) == 2 && sts.numPerfCounts == 2)
    // type mtype entry time event pe msglen recvtime id0 id1 cpustart pc0 pc1
    val rows = ProjectionsReader.parseLine(sts, 0, 1L,
      "2 4 5 100 7 1 64 90 11 22 95 5000 42")
    val attrs = rows.head.getAs[Map[String, String]](5)
    assert(attrs("Receive Time") == "90")
    assert(attrs("ID List") == "[11, 22]")
    assert(attrs("CPU Start Time") == "95")
    assert(attrs("perf counts list") == "[5000, 42]")
    assert(rows.head.getString(4) == "main::work()")
  }

  test("timestamps non-decreasing by event id; attrs promoted") {
    assume(available)
    val ts = events.orderBy(col(EventId)).select(TimestampNs).collect().map(_.getLong(0))
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    val send = events.filter(col(Attributes).getItem("Entry Type") === "Create").head()
    assert(!send.isNullAt(send.fieldIndex(AttrMsgLength)))
    assert(!send.isNullAt(send.fieldIndex(AttrSendTime)))
  }
}
