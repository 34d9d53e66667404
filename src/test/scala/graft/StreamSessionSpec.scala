package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Pins the session_window boundary rule the stream_session_endstate
  * oracle replicates: an event at EXACTLY prev + gap still MERGES into
  * the session (Spark merges when the new window's start <= the current
  * session end; only ts > prev + gap opens a new session). */
class StreamSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long, micro: Long = 0): Timestamp =
    new Timestamp(sec * 1000 + micro / 1000) // ms precision is enough here

  test("sessions: exact-gap event merges, past-gap opens a new session") {
    val gapSec = 60L
    val ev = Seq(
      ("p0", ts(0), 10L),
      ("p0", ts(30), 20L),          // 30 s later -> same session
      ("p0", ts(30 + gapSec), 5L),  // exactly gap after last -> MERGES
      ("p0", ts(30 + 2 * gapSec + 1), 7L), // 1 s past the gap -> new session
      ("p1", ts(0), 1L),
      ("p1", ts(gapSec - 1), 2L)    // inside the gap -> merges
    ).toDF("process", "event_time", "attr_msg_length")
    val r = StreamingOps.sessions(ev, gap = "60 seconds")
      .orderBy(col("process"), col("session_start")).collect()
    val p0 = r.filter(_.getAs[String]("process") == "p0")
    val p1 = r.filter(_.getAs[String]("process") == "p1")
    assert(p0.length == 2, s"got ${p0.mkString("; ")}")
    assert(p0(0).getAs[Long]("n_events") == 3) // exact-gap event merged
    assert(p0(0).getAs[Long]("volume") == 35L)
    assert(p0(1).getAs[Long]("n_events") == 1)
    assert(p1.length == 1)
    assert(p1(0).getAs[Long]("n_events") == 2)
    // session_end = last event + gap
    assert(p1(0).getAs[Timestamp]("session_end").getTime ==
      ts(gapSec - 1).getTime + gapSec * 1000)
  }
}
