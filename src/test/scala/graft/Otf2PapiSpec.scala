package graft

import org.apache.spark.sql.functions._

import graft.enrich.Metrics
import graft.ingest.Otf2Reader
import graft.model.Schemas._

/** PAPI/metric decoding against the reference's ping-pong-otf2-papi fixture
  * (otf2_reader.py:204-275: Metric events become per-MetricMember columns
  * row-aligned with the next same-timestamp event).
  *
  * Goldens decoded independently from the fixture bytes: MetricClass 0 has
  * members [PAPI_TOT_CYC, PAPI_L2_TCM, PAPI_BR_MSP]; on rank 0 the first
  * Enter (`int main(int, char**)`) carries TOT_CYC=98850, L2_TCM=2191,
  * BR_MSP=421; the MPI_Comm_size pair spans TOT_CYC 88017448→88024200
  * (inc 6752), L2_TCM 467713→467785 (inc 72). */
class Otf2PapiSpec extends SparkSpec {
  private val fixture = "/root/reference/pipit/tests/data/ping-pong-otf2-papi"
  private def available = new java.io.File(fixture + "/traces.def").isFile
  private lazy val events = Otf2Reader.read(spark, fixture).cache()

  test("120 events with three PAPI metric columns") {
    assume(available)
    assert(events.count() == 120)
    val cols = events.columns.toSeq
    assert(cols.containsSlice(Seq("PAPI_TOT_CYC", "PAPI_L2_TCM", "PAPI_BR_MSP")))
  }

  test("first Enter on rank 0 carries the first metric sample") {
    assume(available)
    val first = events
      .filter(col(Process) === 0 && col(EventType) === Enter)
      .orderBy(col(EventId)).limit(1)
      .select(col(Name), col("PAPI_TOT_CYC"), col("PAPI_L2_TCM"), col("PAPI_BR_MSP"))
      .collect()(0)
    assert(first.getString(0) == "int main(int, char**)")
    assert(first.getDouble(1) == 98850.0)
    assert(first.getDouble(2) == 2191.0)
    assert(first.getDouble(3) == 421.0)
  }

  test("Instant events without a same-tick metric sample get NaN") {
    assume(available)
    // ProgramBegin precedes the first Metric record in the stream
    val pb = events.filter(col(Name) === "ProgramBegin" && col(Process) === 0)
      .select(col("PAPI_TOT_CYC")).collect()(0).getDouble(0)
    assert(pb.isNaN)
  }

  test("calcIncMetrics on PAPI counters matches hand-decoded golden") {
    assume(available)
    val inc = Metrics.calcIncMetrics(events,
      Seq("PAPI_TOT_CYC", "PAPI_L2_TCM"))
    val row = inc
      .filter(col(Process) === 0 && col(EventType) === Enter &&
        col(Name) === "MPI_Comm_size")
      .orderBy(col(EventId)).limit(1)
      .select(col(incCol("PAPI_TOT_CYC")), col(incCol("PAPI_L2_TCM")))
      .collect()(0)
    assert(row.getDouble(0) == 6752.0)
    assert(row.getDouble(1) == 72.0)
  }

  test("default numericMetricCols picks up the PAPI columns, not ids") {
    assume(available)
    val cols = Metrics.numericMetricCols(events)
    assert(cols.toSet == Set(TimestampNs, "PAPI_TOT_CYC", "PAPI_L2_TCM", "PAPI_BR_MSP"),
      s"got $cols")
  }
}
