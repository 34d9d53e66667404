package graft

import org.apache.spark.sql.functions._

import graft.ingest.ParquetTraceIO
import graft.model.Trace
import graft.model.Schemas._

/** Canonical-Parquet round trip (the OTF2-converter landing path): write a
  * trace partitioned by process, read it back, run the full enrichment. */
class ParquetTraceIOSpec extends SparkSpec {

  test("round trip preserves events and enrichment still works") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString
    val t = Trace.fromCsv(spark, resourcePath("foo-bar.csv"))
    ParquetTraceIO.write(t.events, dir)
    val back = ParquetTraceIO.read(spark, dir)
    assert(back.count() == 20)
    assert(back.columns.take(5).toSeq ==
      Seq(EventId, TimestampNs, EventType, Name, Process))
    val enriched = Trace(back).enriched
    val foo = enriched.events
      .filter(col(Name) === "foo()" && col(EventType) === Enter).head()
    assert(foo.getAs[Long](TimeInc) == 24L * 1000000000L)
    assert(foo.getAs[Long](TimeExc) == 12L * 1000000000L)
  }

  test("non-canonical parquet is rejected with a clear error") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bad").toString
    spark.range(5).toDF("x").write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalArgumentException](ParquetTraceIO.read(spark, dir))
    assert(e.getMessage.contains("missing columns"))
  }
}
