package graft

import org.apache.spark.sql.functions._

import graft.ingest.{ChromeReader, ChromeWriter}
import graft.model.Schemas._

class ChromeReaderSpec extends SparkSpec {
  import spark.implicits._

  test("parses B/E/i, expands X with dur, drops metadata phases") {
    val lines = Seq(
      """{"name":"foo","ph":"B","ts":10.0,"pid":0,"tid":0}""",
      """{"name":"foo","ph":"E","ts":20.0,"pid":0,"tid":0}""",
      """{"name":"tick","ph":"i","ts":12.0,"pid":0,"tid":0}""",
      """{"name":"kernel","ph":"X","ts":100.5,"dur":2.25,"pid":1,"tid":7}""",
      """{"name":"zero","ph":"X","ts":50.0,"pid":1,"tid":7}""",
      """{"name":"process_name","ph":"M","pid":1,"tid":0}"""
    ).toDF("value")
    val out = ChromeReader.parseLines(lines)
      .orderBy(EventId)
      .select(EventType, Name, TimestampNs, Process, Thread)
      .as[(String, String, Long, Int, Int)].collect()
    assert(out === Seq(
      (Enter, "foo", 10000L, 0, 0),
      (Instant, "tick", 12000L, 0, 0),
      (Leave, "foo", 20000L, 0, 0),
      (Enter, "zero", 50000L, 1, 7),
      (Leave, "zero", 50000L, 1, 7),
      (Enter, "kernel", 100500L, 1, 7),
      (Leave, "kernel", 102750L, 1, 7)))
  }

  test("round-trips the writer's projection exactly") {
    val events = Seq(
      (0L, 1000L, Enter, "a", 3),
      (1L, 1990L, Leave, "a", 3),
      (2L, 2500L, Instant, "m", 4)
    ).toDF(EventId, TimestampNs, EventType, Name, Process)
    val json = ChromeWriter.project(events)
      .select(to_json(struct(col("*"))).as("value"))
    val back = ChromeReader.parseLines(json)
      .select(TimestampNs, EventType, Name, Process)
      .orderBy(TimestampNs)
      .as[(Long, String, String, Int)].collect()
    assert(back === Seq(
      (1000L, Enter, "a", 3),
      (1990L, Leave, "a", 3),
      (2500L, Instant, "m", 4)))
  }

  test("ns fidelity survives the µs-double round trip at large ts") {
    // 6.6e12 ns with a ...990 tail — the writer emits 6600000000.990 µs;
    // truncation instead of rounding would lose a nanosecond
    val events = Seq((0L, 6600000000990L, Enter, "f", 0))
      .toDF(EventId, TimestampNs, EventType, Name, Process)
    val json = ChromeWriter.project(events)
      .select(to_json(struct(col("*"))).as("value"))
    val ts = ChromeReader.parseLines(json).select(TimestampNs).as[Long].head()
    assert(ts === 6600000000990L)
  }

  test("readStream tails a JSON-lines directory into canonical rows") {
    val dir = java.nio.file.Files.createTempDirectory("chromestream")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      ("""{"name":"k","ph":"X","ts":5.0,"dur":10.0,"pid":2,"tid":0}""" + "\n" +
       """{"name":"m","ph":"i","ts":7.5,"pid":2,"tid":0}""" + "\n")
        .getBytes("US-ASCII"))
    val q = ChromeReader.readStream(spark, dir.toString)
      .writeStream.format("memory").queryName("chrome_in").start()
    try {
      q.processAllAvailable()
      val out = spark.table("chrome_in")
        .orderBy(TimestampNs, EventType)
        .select(EventType, Name, TimestampNs, Process)
        .as[(String, String, Long, Int)].collect()
      assert(out === Seq(
        (Enter, "k", 5000L, 2),
        (Instant, "m", 7500L, 2),
        (Leave, "k", 15000L, 2)))
    } finally q.stop()
  }

  test("matcher enriches a reader-ingested X-event trace") {
    val lines = Seq(
      """{"name":"outer","ph":"X","ts":0.0,"dur":100.0,"pid":0,"tid":0}""",
      """{"name":"inner","ph":"X","ts":10.0,"dur":20.0,"pid":0,"tid":0}"""
    ).toDF("value")
    val enriched = graft.enrich.EventMatcher.enrich(
      ChromeReader.parseLines(lines))
    val inc = enriched.filter(col(EventType) === Enter)
      .select(Name, TimeInc).as[(String, Long)].collect().toMap
    assert(inc === Map("outer" -> 100000L, "inner" -> 20000L))
  }
}
