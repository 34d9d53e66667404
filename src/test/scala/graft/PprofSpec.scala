package graft

import graft.ingest.PprofReader

class PprofSpec extends SparkSpec {
  import spark.implicits._

  test("encode→decode round trip: leaf/root/depth/value per sample") {
    val blob = PprofReader.encode(Seq("main", "work", "leaf"), Seq(
      (Seq(3, 2, 1), 42L), (Seq(2, 1), 7L), (Seq(1), 1L)))
    val rows = PprofReader.decodeSamples(blob)
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(rows === Seq(
      ("leaf", "main", 3, 42L),
      ("work", "main", 2, 7L),
      ("main", "main", 1, 1L)))
    assert(PprofReader.decodeSamples(blob).map(_.getString(4)) === Seq(
      "main;work;leaf", "main;work", "main"))
  }

  test("gzip-wrapped profiles decode transparently") {
    val blob = PprofReader.encode(Seq("f"), Seq((Seq(1), 5L)), gzip = true)
    assert((blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b)
    val rows = PprofReader.decodeSamples(blob)
    assert(rows.map(r => (r.getString(0), r.getLong(3))) === Seq(("f", 5L)))
  }

  test("unknown fields are skipped by wire type (sample_type, labels)") {
    // the encoder already emits sample_type (field 1) which the decoder
    // ignores; additionally splice a varint field 9 (time_nanos) and a
    // length-delimited field 13 (comment) in front
    val base = PprofReader.encode(Seq("g"), Seq((Seq(1), 3L)))
    val extra = Array[Byte](
      (9 << 3).toByte, 0x2a,                    // field 9, varint 42
      ((13 << 3) | 2).toByte, 0x02, 0x01, 0x02) // field 13, 2 bytes
    val rows = PprofReader.decodeSamples(extra ++ base)
    assert(rows.map(r => (r.getString(0), r.getLong(3))) === Seq(("g", 3L)))
  }

  test("malformed payloads fail loudly") {
    intercept[Exception] {
      // sample references location 99 which is never defined
      val blob = PprofReader.encode(Seq("f"), Seq((Seq(99), 1L)))
      PprofReader.decodeSamples(blob)
    }
  }

  test("samples() explodes a binary column distributed, nulls drop") {
    val a = PprofReader.encode(Seq("x"), Seq((Seq(1), 2L), (Seq(1), 3L)))
    val df = Seq((1L, a), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload").repartition(3)
    val out = PprofReader.samples(df)
      .select("id", "leaf_function", "value")
      .as[(Long, String, Long)].collect().sortBy(_._3)
    assert(out.toSeq === Seq((1L, "x", 2L), (1L, "x", 3L)))
  }
}
