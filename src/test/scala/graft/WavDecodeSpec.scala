package graft

import graft.scale.Multimodal

/** The real WAV (RIFF / 16-bit PCM) decoder: round-trip, chunk walking,
  * malformed payloads surface as errors. */
class WavDecodeSpec extends SparkSpec {

  test("encode -> decode round-trips format fields and abs_sum") {
    val bytes = Multimodal.encodeWav(2, 44100, 3, i => i * 100 - 200)
    // interleaved samples: -200, -100, 0, 100, 200, 300
    val f = Multimodal.decodeWav(bytes)
    assert(f.getInt(0) == 2 && f.getInt(1) == 44100 && f.getInt(2) == 3)
    assert(f.getLong(3) == 200L + 100 + 0 + 100 + 200 + 300)
  }

  test("unknown chunks (with odd-size padding) are skipped") {
    val wav = Multimodal.encodeWav(1, 8000, 2, _ => 7)
    // splice a LIST chunk of odd size 3 (padded to 4) between WAVE and fmt
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte]('a', 'b', 'c', 0)
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    // fix the RIFF size field (not verified by the decoder, but keep honest)
    val f = Multimodal.decodeWav(spliced)
    assert(f.getInt(0) == 1 && f.getInt(2) == 2 && f.getLong(3) == 14L)
  }

  test("extreme sample values don't overflow the abs fold") {
    // Short.MinValue: |−32768| must not wrap when folded as Long
    val bytes = Multimodal.encodeWav(1, 8000, 2,
      i => if (i == 0) -32768 else 32767)
    assert(Multimodal.decodeWav(bytes).getLong(3) == 32768L + 32767L)
  }

  test("malformed payloads throw instead of skewing features") {
    val ok = Multimodal.encodeWav(1, 8000, 4, i => i)
    intercept[IllegalArgumentException](Multimodal.decodeWav(Array[Byte]()))
    intercept[IllegalArgumentException]( // wrong magic
      Multimodal.decodeWav("RIFX1234WAVE".getBytes("US-ASCII")))
    intercept[IllegalArgumentException]( // data chunk truncated mid-payload
      Multimodal.decodeWav(ok.dropRight(3)))
    // non-PCM format code (e.g. IEEE float = 3)
    val floatFmt = ok.clone(); floatFmt(20) = 3
    intercept[IllegalArgumentException](Multimodal.decodeWav(floatFmt))
    // 8-bit sample width
    val eightBit = ok.clone(); eightBit(34) = 8
    intercept[IllegalArgumentException](Multimodal.decodeWav(eightBit))
    // no data chunk at all: header only
    intercept[IllegalArgumentException](Multimodal.decodeWav(ok.take(36)))
  }

  test("audioFingerprint32: envelope drives the bits; copies collide") {
    // loud first half, quiet second half → low 16 bits set, high clear
    val halfLoud = Multimodal.encodeWav(1, 8000, 64,
      i => if (i < 32) 20000 else 100)
    val fp = Multimodal.audioFingerprint32(halfLoud)
    assert(fp == 0xffffL, f"expected low-16 bits, got $fp%x")
    // a re-encoded exact copy collides
    val copy = Multimodal.encodeWav(1, 8000, 64,
      i => if (i < 32) 20000 else 100)
    assert(Multimodal.audioFingerprint32(copy) == fp)
    // the mirrored envelope is the complementary pattern
    val mirrored = Multimodal.encodeWav(1, 8000, 64,
      i => if (i >= 32) 20000 else 100)
    assert(Multimodal.audioFingerprint32(mirrored) == (0xffffL << 16))
    // flat audio: no frame beats the overall mean → zero fingerprint
    val flat = Multimodal.encodeWav(1, 8000, 64, _ => 500)
    assert(Multimodal.audioFingerprint32(flat) == 0L)
  }
}
