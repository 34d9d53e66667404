package graft

import org.apache.spark.sql.functions._

import graft.ingest.HpctoolkitReader
import graft.model.Schemas._

/** Reader conformance against the reference's ping-pong HPCToolkit fixture
  * (goldens from /root/reference/pipit/tests/hpctoolkit.py, recorded in
  * FIXTURES.md §A5). Skipped if the fixture is absent. */
class HpctoolkitSpec extends SparkSpec {
  private val fixture = "/root/reference/pipit/tests/data/ping-pong-hpctoolkit"
  private def available = new java.io.File(fixture + "/meta.db").isFile
  private lazy val events = HpctoolkitReader.read(spark, fixture).cache()

  test("two ranks; 117 enters on rank 0 and 88 on rank 1") {
    assume(available)
    val enters = events.filter(col(EventType) === Enter)
      .groupBy(Process).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(enters == Map(0 -> 117L, 1 -> 88L), s"got $enters")
  }

  test("enter count equals leave count per rank") {
    assume(available)
    for (p <- Seq(0, 1)) {
      val byType = events.filter(col(Process) === p)
        .groupBy(EventType).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byType(Enter) == byType(Leave), s"rank $p: $byType")
      assert(byType.getOrElse("Loop Enter", 0L) == byType.getOrElse("Loop Leave", 0L))
    }
  }

  test("event types are Enter/Leave/Loop Enter/Loop Leave") {
    assume(available)
    val types = events.select(EventType).distinct().collect().map(_.getString(0)).toSet
    assert(types == Set(Enter, Leave, "Loop Enter", "Loop Leave"), s"got $types")
  }

  test("22 distinct names including loop, main, main thread, PMPI sends") {
    assume(available)
    val names = events.select(Name).distinct().collect().map(_.getString(0)).toSet
    assert(names.size == 22, s"got ${names.size}: $names")
    assert(names.contains("loop"))
    assert(names.contains("main"))
    assert(names.contains("main thread"))
    assert(names.exists(_.startsWith("PMPI_Send")))
    assert(names.exists(_.startsWith("PMPI_Recv")))
  }

  test("7 PMPI_Send and 7 PMPI_Recv enters per rank") {
    assume(available)
    for (p <- Seq(0, 1)) {
      val sends = events.filter(col(Process) === p && col(EventType) === Enter &&
        col(Name).startsWith("PMPI_Send")).count()
      val recvs = events.filter(col(Process) === p && col(EventType) === Enter &&
        col(Name).startsWith("PMPI_Recv")).count()
      assert(sends == 7 && recvs == 7, s"rank $p: sends=$sends recvs=$recvs")
    }
  }

  test("timestamps non-decreasing in event order and matching works") {
    assume(available)
    val ts = events.orderBy(col(EventId)).select(TimestampNs).collect().map(_.getLong(0))
    assert(ts.zip(ts.tail).forall { case (a, b) => a <= b })
    // the reconstructed stream must be fully matchable per (process, thread)
    val enriched = graft.enrich.EventMatcher.enrich(
      events.filter(col(EventType).isin(Enter, Leave)))
    assert(enriched.filter(col(MatchingEventId).isNull).count() == 0)
  }
}
