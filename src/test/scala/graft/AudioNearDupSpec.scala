package graft

import org.apache.spark.sql.functions._

import graft.scale.{Dedup, Multimodal}

/** NEAR-duplicate audio dedup on the 64-bit DIFFERENCE fingerprint
  * ([[Multimodal.audioDiffFingerprint64]], Haitsma–Kalker-style
  * adjacent-frame energy comparisons): uniform gain cancels out of every
  * comparison (exact invariance, not approximate), a local edit flips
  * only the bits whose frames overlap it, and the existing Hamming-LSH
  * banding ([[Dedup.hammingBandPairs]]) applies unchanged — all through
  * the real WAV decode path. */
class AudioNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** The audio_neardup fixture: 40 recordings; magnitude stream is a
    * Knuth-hash of (seed, i); the variant adds 2500 to the samples of
    * frames [seed, seed+2] and then doubles the whole signal (gain). */
  private def payload(seed: Long, perturb: Boolean, gain: Int): Array[Byte] = {
    val n = (130 + seed % 37).toInt
    Multimodal.encodeWav(1, 8000, n, { i =>
      // Knuth multiply then TAKE HIGH BITS (>> 16) before the mod: the
      // low bits of x*c alone are a constant-step rotation in i, which
      // makes different seeds mere phase shifts of each other
      var mag = ((((seed * 1000003 + i) * 2654435761L) >> 16) % 8192).toInt
      if (perturb) {
        val f = i * 65 / n
        if (f >= seed && f <= seed + 2) mag += 2500
      }
      mag *= gain
      if (i % 2 == 0) mag else -mag
    })
  }

  private def fp(seed: Long, perturb: Boolean, gain: Int): (Long, Long) =
    Multimodal.audioDiffFingerprint64(payload(seed, perturb, gain))

  private def ham(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("uniform gain change leaves the fingerprint EXACTLY unchanged") {
    for (seed <- 0L until 40L) {
      val base = fp(seed, perturb = false, gain = 1)
      assert(fp(seed, perturb = false, gain = 2) == base,
        s"gain x2 flipped bits for seed $seed")
      assert(fp(seed, perturb = false, gain = 3) == base,
        s"gain x3 flipped bits for seed $seed")
    }
  }

  test("local perturbation flips few bits; distinct recordings stay far") {
    val bases = (0L until 40L).map(s => fp(s, perturb = false, gain = 1))
    val variants = (0L until 40L).map(s => fp(s, perturb = true, gain = 2))
    val planted = (0 until 40).map(s => ham(bases(s), variants(s)))
    // the edit spans frames [seed, seed+2], touching comparisons
    // seed-1 .. seed+2 only — at most 4 bits can flip
    assert(planted.max <= 4, s"locality violated: $planted")
    assert(planted.count(_ >= 1) >= 20,
      s"perturbation should flip bits in many groups: $planted")
    // pseudo-random magnitudes make distinct seeds ~independent 64-bit
    // patterns: every cross pair must sit far outside the query radius
    val cross = for {
      a <- 0 until 40; b <- (a + 1) until 40
    } yield ham(bases(a), bases(b))
    assert(cross.min > 6, s"cross-seed fingerprints too close: ${cross.min}")
  }

  test("banded pairs == brute force over the fixture's distinct " +
      "fingerprints (lossless radius < bands)") {
    val all = (0L until 40L).map(s => s -> fp(s, perturb = false, gain = 1)) ++
      (40L until 80L).map(id => id -> fp(id - 40, perturb = true, gain = 2))
    val uniq = all.groupBy(_._2).map { case (h, rows) =>
      (rows.map(_._1).min, h._1, h._2)
    }.toSeq
    val df = uniq.toDF("doc_id", "fp_hi", "fp_lo")
    val got = Dedup.hammingBandPairs(df, radius = 6, bands = 8,
        hiCol = "fp_hi", loCol = "fp_lo")
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    val byId = uniq.map(r => r._1 -> ((r._2, r._3))).toMap
    val ids = uniq.map(_._1).sorted
    val want = (for {
      a <- ids; b <- ids if a < b
      d = ham(byId(a), byId(b)) if d <= 6
    } yield (a, b, d)).toSet
    assert(got == want)
    assert(got.nonEmpty, "no planted pair landed within the radius")
  }

  test("streaming twin for free: the diff fingerprint feeds the generic " +
      "Hamming-LSH stream operator unchanged") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all = (0L until 40L).map(s => (s, fp(s, perturb = false, gain = 1))) ++
      (40L until 80L).map(id => (id, fp(id - 40, perturb = true, gain = 2)))
    val rows = all.map { case (id, (hi, lo)) => (id, hi, lo) }
    val stream = MemoryStream[(Long, Long, Long)]
    val q = graft.streaming.StreamingLsh.hammingCandidates(
        stream.toDF().toDF("doc_id", "fp_hi", "fp_lo"),
        radius = 6, hiCol = "fp_hi", loCol = "fp_lo")
      .writeStream.format("memory").queryName("audionear").outputMode("append")
      .start()
    try {
      // originals first, perturbed variants in a later batch: every
      // planted pair crosses the batch boundary
      stream.addData(rows.filter(_._1 < 40))
      q.processAllAvailable()
      stream.addData(rows.filter(_._1 >= 40))
      q.processAllAvailable()
      val got = spark.table("audionear").select("a", "b", "hamming")
        .distinct().as[(Long, Long, Int)].collect().toSet
      val byId = all.toMap
      val want = (for {
        a <- 0L until 80L; b <- (a + 1) until 80L
        d = ham(byId(a), byId(b)) if d <= 6
      } yield (a, b, d)).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("short recordings (fewer samples than frames) stay deterministic") {
    val p = Multimodal.encodeWav(1, 8000, 40,
      i => if (i % 3 == 0) 900 else -250)
    val h = Multimodal.audioDiffFingerprint64(p)
    assert(Multimodal.audioDiffFingerprint64(p) == h)
    // empty payload: zero fingerprint, no crash
    assert(Multimodal.audioDiffFingerprint64(
      Multimodal.encodeWav(1, 8000, 0, _ => 0)) == ((0L, 0L)))
  }

  test("the envelope fingerprint's failure mode is real — and absent " +
      "from the diff fingerprint") {
    // a loud insertion near the end shifts the GLOBAL mean, flipping
    // envelope bits everywhere; the diff fingerprint flips locally only
    val n = 640
    def base(i: Int) = ((((7L * 1000003 + i) * 2654435761L) >> 16) % 8192).toInt
    val orig = Multimodal.encodeWav(1, 8000, n, base)
    val edited = Multimodal.encodeWav(1, 8000, n,
      i => if (i * 65 / n >= 60) base(i) + 8000 else base(i))
    val dDiff = ham(Multimodal.audioDiffFingerprint64(orig),
      Multimodal.audioDiffFingerprint64(edited))
    val e1 = Multimodal.audioFingerprint32(orig)
    val e2 = Multimodal.audioFingerprint32(edited)
    val dEnv = java.lang.Long.bitCount(e1 ^ e2)
    // frames >= 60 are edited: comparisons 59..63 can flip (<= 5 bits)
    assert(dDiff <= 5, s"diff fingerprint not local: $dDiff")
    assert(dEnv > dDiff,
      s"envelope should degrade more than diff ($dEnv vs $dDiff)")
  }
}
