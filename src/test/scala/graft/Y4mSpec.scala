package graft

import graft.scale.Multimodal

class Y4mSpec extends SparkSpec {

  test("encode→decode round trip with stride sampling") {
    // 4×2, 5 frames, luma = f*10 + i
    val bytes = Multimodal.encodeY4m(4, 2, 5, (f, i) => f * 10 + i)
    val r = Multimodal.decodeY4m(bytes, frameStride = 2)
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) === ((4, 2, 5, 3)))
    // sampled frames 0,2,4: Σ_i (f·10 + i) for i<8 = 8·10f + 28
    assert(r.getLong(4) === (0L + 28) + (160L + 28) + (320L + 28))
  }

  test("stride 1 sums every frame") {
    val bytes = Multimodal.encodeY4m(2, 2, 3, (_, _) => 7)
    val r = Multimodal.decodeY4m(bytes, frameStride = 1)
    assert(r.getInt(3) === 3)
    assert(r.getLong(4) === 3L * 4 * 7)
  }

  test("luma bytes are unsigned") {
    val bytes = Multimodal.encodeY4m(2, 2, 1, (_, _) => 255)
    assert(Multimodal.decodeY4m(bytes).getLong(4) === 4L * 255)
  }

  test("FRAME records may carry parameters") {
    val base = Multimodal.encodeY4m(2, 2, 1, (_, _) => 1)
    val s = new String(base, "ISO-8859-1").replace("FRAME\n", "FRAME Xfoo\n")
    val r = Multimodal.decodeY4m(s.getBytes("ISO-8859-1"))
    assert(r.getInt(2) === 1 && r.getLong(4) === 4L)
  }

  test("frameHashes: per-frame aHash equals the PGM aHash of the same " +
      "raster; head-trim keeps the surviving frames' hashes") {
    val w = 8; val h = 6
    def luma(f: Int, i: Int) = ((f * 7 + 1) * i * 3 + f * 5) % 256
    val full = Multimodal.frameHashes(
      Multimodal.encodeY4m(w, h, 4, luma), frameStride = 1)
    assert(full.length == 4 && full.distinct.length == 4)
    // frame 2's hash == the aHash of the same raster as a PGM payload
    val asPgm = Multimodal.averageHashHalves(
      Multimodal.encodePgm(w, h, i => luma(2, i)))
    assert(full(2) == asPgm)
    // a head-trimmed copy keeps exactly frames 1..3's hashes
    val trimmed = Multimodal.frameHashes(
      Multimodal.encodeY4m(w, h, 3, (f, i) => luma(f + 1, i)),
      frameStride = 1)
    assert(trimmed == full.drop(1))
    // stride skips frames deterministically
    assert(Multimodal.frameHashes(
      Multimodal.encodeY4m(w, h, 4, luma), frameStride = 2) ==
      Seq(full(0), full(2)))
    // corrupt payloads fail loudly here too
    intercept[IllegalArgumentException] {
      Multimodal.frameHashes(
        Multimodal.encodeY4m(w, h, 2, luma).dropRight(1), 1)
    }
  }

  test("corrupt payloads fail loudly") {
    val good = Multimodal.encodeY4m(2, 2, 2, (_, _) => 1)
    // truncated mid-frame
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m(good.dropRight(1))
    }
    // bad magic
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("JUNK W2 H2\n".getBytes("US-ASCII"))
    }
    // missing dims
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("YUV4MPEG2 F25:1\nFRAME\n".getBytes("US-ASCII"))
    }
    // unsupported chroma
    intercept[IllegalArgumentException] {
      Multimodal.decodeY4m("YUV4MPEG2 W2 H2 C444\nFRAME\n".getBytes("US-ASCII"))
    }
  }
}
