package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.analysis.CommOps
import graft.ingest.Otf2Reader
import graft.model.Schemas._

/** Nonblocking-MPI decoding (MpiIsend 0x0f, MpiIrecv 0x13, completion
  * records 0x10/0x11, collectives 0x16/0x17). No public fixture carries
  * these, so the spec round-trips a synthetic archive written with the
  * same byte layout the decoder reverse-engineered from the Score-P
  * fixtures: 18-byte chunk header, `[type][len][payload]` records,
  * compressed `[n][LE bytes]` ints, raw-u64 timestamp record 0x05.
  *
  * Reference parity target: otf2_reader.py:293-302 emits every event type
  * generically, and trace.py:401-404 / 475-481 filter comm ops on
  * {MpiSend, MpiIsend} / {MpiRecv, MpiIrecv}. */
class Otf2IsendSpec extends SparkSpec {

  private def comp(v: Long): Array[Byte] = {
    if (v == 0) return Array(0)
    var n = 0
    var x = v
    while (x != 0) { n += 1; x >>>= 8 }
    val out = new Array[Byte](1 + n)
    out(0) = n.toByte
    var i = 0
    while (i < n) { out(1 + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }
  private def rec(t: Int, parts: Array[Byte]*): Array[Byte] = {
    val payload = parts.flatten.toArray
    Array(t.toByte, payload.length.toByte) ++ payload
  }
  private def tsRec(ts: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(0x05.toByte); b.putLong(ts); b.array()
  }
  private def str(ref: Long, s: String): Array[Byte] =
    rec(0x0a, comp(ref), s.getBytes("UTF-8") :+ 0.toByte)
  private def file(recs: Array[Byte]*): Array[Byte] =
    new Array[Byte](18) ++ recs.flatten

  private lazy val dir: String = {
    val d = Files.createTempDirectory("otf2-isend").toString
    Files.createDirectory(Paths.get(s"$d/traces"))
    Files.write(Paths.get(s"$d/traces.otf2"), Array[Byte]())
    Files.write(Paths.get(s"$d/traces.def"), file(
      rec(0x05, comp(1000000000L), comp(0), comp(100)), // clock: 1 tick = 1 ns
      str(1, "main"), str(2, "rank0"), str(3, "rank1"),
      rec(0x0f, comp(0), comp(1)), // region 0 named "main"
      rec(0x0e, comp(0), comp(2), Array(0.toByte), comp(4), comp(0)), // loc 0 → grp 0
      rec(0x0e, comp(1), comp(3), Array(0.toByte), comp(6), comp(1)) // loc 1 → grp 1
    ))
    Files.write(Paths.get(s"$d/traces/0.evt"), file(
      tsRec(10), rec(0x0c, comp(0)), // Enter main
      tsRec(20), rec(0x0f, comp(1), comp(0), comp(5), comp(1024), comp(7)), // Isend →1
      tsRec(30), rec(0x10, comp(7)), // IsendComplete
      tsRec(90), rec(0x0d, comp(0)) // Leave main
    ))
    Files.write(Paths.get(s"$d/traces/1.evt"), file(
      tsRec(10), rec(0x0c, comp(0)),
      tsRec(15), rec(0x11, comp(9)), // IrecvRequest
      tsRec(40), rec(0x13, comp(0), comp(0), comp(5), comp(1024), comp(9)), // Irecv ←0
      tsRec(50), rec(0x16), // CollectiveBegin
      tsRec(60), rec(0x17, Array(2.toByte), comp(0), comp(0), comp(64), comp(64)),
      tsRec(90), rec(0x0d, comp(0))
    ))
    d
  }

  private lazy val events = Otf2Reader.read(spark, dir).cache()

  test("all nonblocking + collective record types decode") {
    val names = events.select(Name).distinct().collect().map(_.getString(0)).toSet
    assert(names == Set("main", "MpiIsend", "MpiIsendComplete",
      "MpiIrecvRequest", "MpiIrecv", "MpiCollectiveBegin", "MpiCollectiveEnd"))
    assert(events.count() == 10)
  }

  test("comm matrix counts MpiIsend volume") {
    val vol = CommOps.commMatrixDense(events)
    assert(vol(0)(1) == 1024L && vol(1)(0) == 0L)
    val cnt = CommOps.commMatrixDense(events, "count")
    assert(cnt(0)(1) == 1L)
  }

  test("request ids and collective fields land in attributes") {
    val isend = events.filter(col(Name) === "MpiIsend").collect()(0)
    val attrs = isend.getMap[String, String](isend.fieldIndex(Attributes))
    assert(attrs("request_id") == "7" && attrs("receiver") == "1" &&
      attrs("msg_length") == "1024")
    val coll = events.filter(col(Name) === "MpiCollectiveEnd").collect()(0)
    val cattrs = coll.getMap[String, String](coll.fieldIndex(Attributes))
    assert(cattrs("collective_op") == "2" && cattrs("size_sent") == "64")
  }

  test("timestamps convert with the synthetic clock (1 tick = 1 ns)") {
    val ts = events.filter(col(Name) === "MpiIrecv")
      .select(col(TimestampNs)).collect()(0).getLong(0)
    assert(ts == 40L)
  }
}
