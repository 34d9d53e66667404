package graft

import graft.scale.Multimodal

/** The real PGM (P5) decoder: round-trip, header comments, malformed
  * payloads surface as errors. */
class PgmDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("encode -> decode round-trips dimensions and mean luma") {
    val bytes = Multimodal.encodePgm(4, 2, i => i * 10) // 0,10,...,70
    val f = Multimodal.decodePgm(bytes)
    assert(f.getInt(0) == 4 && f.getInt(1) == 2 && f.getInt(2) == 1)
    assert(math.abs(f.getDouble(3) - (280.0 / 8 / 255)) < 1e-12)
  }

  test("header comments and arbitrary whitespace are parsed") {
    val raster = Array.tabulate(6)(i => (i * 40).toByte)
    val header = "P5\n# a comment\n 3\t2 # trailing\n255\n".getBytes("US-ASCII")
    val f = Multimodal.decodePgm(header ++ raster)
    assert(f.getInt(0) == 3 && f.getInt(1) == 2)
  }

  test("malformed payloads throw instead of skewing features") {
    intercept[IllegalArgumentException](Multimodal.decodePgm(Array[Byte]()))
    intercept[IllegalArgumentException](
      Multimodal.decodePgm("P6\n2 2\n255\nXXXX".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // raster shorter than w*h
      Multimodal.decodePgm("P5\n4 4\n255\nab".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // w*h would wrap Int to 0 / negative
      Multimodal.decodePgm("P5\n65536 65536\n255\nab".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      Multimodal.decodePgm("P5\n46341 46341\n255\nab".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // payload ends right after maxval
      Multimodal.decodePgm("P5\n2 2\n255".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // CRLF after maxval: raster start
      // would shift by a byte — must fail loudly, not skew features
      Multimodal.decodePgm("P5\n2 2\n255\r\nabcd".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // trailing bytes after the raster
      Multimodal.decodePgm("P5\n2 2\n255\nabcdEXTRA".getBytes("US-ASCII")))
  }

  test("NULL payloads yield NULL features, not fabricated ones") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Multimodal.encodePgm(2, 2, _ => 10)),
      org.apache.spark.sql.Row(2L, null))
    val df = spark.createDataFrame(rows, schema)
    val out = Multimodal.extractFeatures(df, decoder = Multimodal.decodePgm)
    val byId = out.select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!byId(1L) && byId(2L))
  }

  test("zero-frame payloads sample no frames") {
    val df = Seq((1L, 0), (2L, 3)).toDF("doc_id", "n_frames")
    val m = Multimodal.sampleFrames(df, "n_frames", 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(m(1L).isEmpty && m(2L) == Seq(0, 2))
  }

  test("distributed extractFeatures with the real decoder") {
    val df = Seq((1L, Multimodal.encodePgm(2, 2, _ => 255)),
        (2L, Multimodal.encodePgm(3, 1, _ => 0)))
      .toDF("doc_id", "payload")
    val m = Multimodal.extractFeatures(df, decoder = Multimodal.decodePgm)
      .select($"doc_id", $"features.width", $"features.mean_luma")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((2, 1.0)) && m(2L) == ((3, 0.0)))
  }

  test("nearest-neighbor resize samples the exact integer grid") {
    // 4x2 gradient raster 0..7; resize to 2x2 → sx ∈ {0,2}, sy ∈ {0,1}
    val src = Multimodal.encodePgm(4, 2, i => i * 30)
    val out = Multimodal.resizePgm(2, 2)(src)
    val r = Multimodal.decodePgm(out) // parser integrity checks pass
    assert(r.getInt(0) == 2 && r.getInt(1) == 2)
    val raster = out.takeRight(4).map(_ & 0xff).toSeq
    assert(raster == Seq(0, 60, 120, 180)) // idx 0,2,4,6 × 30
    // identity resize is a byte-level no-op on the raster
    val same = Multimodal.resizePgm(4, 2)(src)
    assert(Multimodal.decodePgm(same).getDouble(3) ==
      Multimodal.decodePgm(src).getDouble(3))
    // upscale replicates pixels; mean over an even replication is exact
    val up = Multimodal.resizePgm(8, 2)(src)
    assert(Multimodal.decodePgm(up).getInt(0) == 8)
  }

  test("averageHash: exact dups and 2x upscales collide; perturbed pixels do not") {
    def img(f: Int => Int, w: Int = 8, h: Int = 8) =
      Multimodal.encodePgm(w, h, f)
    val base = img(i => (i * 37) % 256)
    val copy = img(i => (i * 37) % 256)
    assert(Multimodal.averageHashHalves(base) ==
      Multimodal.averageHashHalves(copy))
    // 2x nearest-neighbor upscale samples the SAME 8x8 grid pixels
    val up = Multimodal.resizePgm(16, 16)(base)
    assert(Multimodal.averageHashHalves(up) ==
      Multimodal.averageHashHalves(base))
    // flipping a dark sampled pixel to bright changes at least one bit
    val perturbed = img(i => if (i == 0) 255 else (i * 37) % 256)
    assert(Multimodal.averageHashHalves(perturbed) !=
      Multimodal.averageHashHalves(base))
    // halves stay within 32-bit range (SQL-replicable, no sign games)
    val (hi, lo) = Multimodal.averageHashHalves(base)
    assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
  }

  test("transformPayload passes nulls through and keeps other columns") {
    val df = Seq((1L, Multimodal.encodePgm(2, 2, _ => 10)),
        (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.transformPayload(df, Multimodal.resizePgm(1, 1))
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[Array[Byte]]("payload"))).toMap
    assert(out(2L).isEmpty)
    assert(Multimodal.decodePgm(out(1L).get).getInt(0) == 1)
  }
}
