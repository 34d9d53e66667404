package graft.scale

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata alongside. The Spark-side shape —
  * schema, batched per-partition processing, partition sizing — is real.
  * Two decoders ship:
  *
  *  - [[decodePgm]] — a REAL binary image decoder (Netpbm P5 grayscale:
  *    magic + ASCII header + raster), pure JVM byte parsing, no codec
  *    libraries needed. Exercised end-to-end by the `image_features`
  *    driver query against an arithmetic DuckDB oracle.
  *  - [[decodeStub]] — the stand-in for codecs this container lacks
  *    (JPEG/audio/video); swap in a JNI/FFI codec or a
  *    `mapInPandas`-equivalent batch UDF without touching the pipeline.
  *
  * Scale notes: payloads are processed with `mapPartitions` so a real
  * decoder amortizes model/codec init per partition (the same reason
  * PySpark uses mapInPandas); binary columns should be stored in their own
  * parquet column chunk — metadata-only queries then never read the bytes
  * (column pruning).
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)
  ))

  /** STUB decoder: deterministic fake features from payload bytes.
    * A real implementation would decode the media here. */
  def decodeStub(payload: Array[Byte]): Row = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(i) & 0xff); i += 1 }
    new GenericRowWithSchema(Array[Any](
      640 + (n % 640), 360 + (n % 360), 1 + (n % 16),
      if (n == 0) 0.0 else sum.toDouble / n / 255.0
    ), featureSchema)
  }

  /** Encode a grayscale image as binary PGM (P5). `pixel(i)` supplies the
    * row-major raster values in [0, maxval]. */
  def encodePgm(width: Int, height: Int, pixel: Int => Int,
                maxval: Int = 255): Array[Byte] = {
    val header = s"P5\n$width $height\n$maxval\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < width * height) {
      out(header.length + i) = (pixel(i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** REAL decoder for binary PGM (P5): parses the Netpbm header (magic,
    * whitespace-separated width/height/maxval, `#` comments) and folds
    * the raster into (width, height, n_frames=1, mean_luma = mean
    * pixel / maxval). Throws on malformed input — a corrupt payload
    * should surface, not silently skew features. */
  /** Parse a P5 header: (width, height, maxval, raster offset), with the
    * whole-raster length check. Shared by [[decodePgm]]/[[resizePgm]]. */
  private def parsePgm(payload: Array[Byte]): (Int, Int, Int, Int) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad PGM: $msg")
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '5')
      fail("missing P5 magic")
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and '#' comments
      var inComment = false
      while (pos < payload.length && {
        val c = payload(pos).toChar
        if (inComment) { if (c == '\n') inComment = false; true }
        else if (c == '#') { inComment = true; true }
        else c.isWhitespace
      }) pos += 1
      val start = pos
      while (pos < payload.length && !payload(pos).toChar.isWhitespace) pos += 1
      if (pos == start) fail("truncated header")
      new String(payload, start, pos - start, "US-ASCII").toInt
    }
    val (w, h, maxval) = (nextInt(), nextInt(), nextInt())
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) fail(s"bad dims $w x $h / $maxval")
    // exactly ONE whitespace byte separates maxval from the raster (the
    // Netpbm spec); anything else (CRLF pair, comment, raster data) means
    // the header parse is off by a byte — fail loudly, a shifted raster
    // start yields silently-wrong features
    if (pos >= payload.length || !payload(pos).toChar.isWhitespace)
      fail("maxval not followed by a whitespace byte")
    pos += 1
    val n = w.toLong * h // Long: huge declared dims must not wrap the check
    // exact-length check: trailing bytes mean the declared dims don't
    // describe this raster (same silent-skew risk as a short raster)
    if (payload.length - pos != n)
      fail(s"raster length ${payload.length - pos} != $n")
    (w, h, maxval, pos)
  }

  /** 64-bit AVERAGE HASH (aHash) of the decoded grayscale raster — the
    * perceptual-dedup primitive for image corpora: sample the image on a
    * fixed 8×8 nearest-neighbor grid, threshold each sample against the
    * floor-mean of the 64 samples, pack the bits (j = y·8+x). Identical
    * images — and resized/re-encoded copies that keep the sampled grid —
    * collide exactly, so image dedup becomes the same hash-groupBy as
    * text `dedup_exact`; Hamming distance between hashes grades
    * near-misses (the [[graft.functions.VecBits]] machinery applies).
    * Returned as (hi, lo) 32-bit halves: every intermediate stays a
    * small non-negative integer, so the value is engine-replicable in
    * plain SQL with no 1<<63 sign games. */
  def averageHashHalves(payload: Array[Byte]): (Long, Long) = {
    val (w, h, _, pos) = parsePgm(payload)
    aHashRaster(w, h, i => payload(pos + i) & 0xff)
  }

  /** The 8×8 mean-threshold hash over any raster accessor — one core
    * shared by the PGM aHash above and the per-frame video hashes. */
  private def aHashRaster(w: Int, h: Int, pix: Int => Int): (Long, Long) = {
    val sampled = new Array[Long](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sx = x * w / 8; val sy = y * h / 8
        sampled(y * 8 + x) = pix(sy * w + sx).toLong
        x += 1
      }
      y += 1
    }
    val mean = sampled.sum / 64
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 64) {
      if (sampled(j) > mean) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** Per-sampled-frame 64-bit average hash of the luma plane — the
    * video-dedup primitive: a video becomes its frame-hash SEQUENCE,
    * and trim/re-encode-robust near-dup is then set overlap of frame
    * hashes — i.e. the EXISTING text-dedup joins over a "document"
    * whose tokens are frame hashes ([[graft.scale.Dedup.
    * jaccardPrefixPairs]] with shingleK = 1). Same header/frame walk
    * and loud failures as [[decodeY4m]]. */
  def frameHashes(payload: Array[Byte],
                  frameStride: Int = 2): Seq[(Long, Long)] = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad Y4M: $msg")
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < payload.length && payload(pos) != '\n') pos += 1
      if (pos >= payload.length) fail("unterminated header line")
      pos += 1
      new String(payload, start, pos - 1 - start, "US-ASCII")
    }
    val header = line().split(" ")
    if (header.head != "YUV4MPEG2") fail("missing YUV4MPEG2 magic")
    var w = -1; var h = -1; var chroma = "420"
    header.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'C' => chroma = p.substring(1)
        case _ =>
      }
    }
    if (w <= 0 || h <= 0) fail("missing W/H")
    if (!chroma.startsWith("420")) fail(s"unsupported chroma C$chroma")
    val ySize = w * h
    val frameLen = ySize + 2 * ((w / 2) * (h / 2))
    val out = Seq.newBuilder[(Long, Long)]
    var f = 0
    while (pos < payload.length) {
      val fh = line()
      if (fh != "FRAME" && !fh.startsWith("FRAME ")) fail(s"expected FRAME, got '$fh'")
      if (pos + frameLen > payload.length)
        fail(s"truncated frame $f: ${payload.length - pos} < $frameLen")
      if (f % frameStride == 0) {
        val base = pos
        out += aHashRaster(w, h, i => payload(base + i) & 0xff)
      }
      pos += frameLen
      f += 1
    }
    out.result()
  }

  def decodePgm(payload: Array[Byte]): Row = {
    val (w, h, maxval, pos) = parsePgm(payload)
    val n = w.toLong * h
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(pos + i.toInt) & 0xff); i += 1 }
    new GenericRowWithSchema(Array[Any](
      w, h, 1, sum.toDouble / n / maxval), featureSchema)
  }

  /** Nearest-neighbor PGM resize — the preprocessing normalization step
    * of every vision pipeline (fixed input resolution before feature
    * extraction), done inside the per-partition decode path like every
    * other multimodal transform here. Source index is the integral
    * truncation sx = x·w div outW, sy = y·h div outH — exactly
    * replicable in SQL, so the resized raster is oracle-checkable.
    * Output is a well-formed P5 payload (same maxval): resize composes
    * with [[decodePgm]]/[[extractFeatures]] and round-trips the parser's
    * integrity checks. */
  def resizePgm(outW: Int, outH: Int)(payload: Array[Byte]): Array[Byte] = {
    require(outW > 0 && outH > 0, s"bad target dims $outW x $outH")
    val (w, h, maxval, pos) = parsePgm(payload)
    encodePgm(outW, outH, { i =>
      val sx = (i % outW) * w / outW
      val sy = (i / outW) * h / outH
      payload(pos + sy * w + sx) & 0xff
    }, maxval)
  }

  /** Per-partition payload→payload transform (resize, transcode,
    * redact): replaces `payloadCol` in place, null payloads pass
    * through. Same batch shape as [[extractFeatures]]. */
  def transformPayload(df: DataFrame, f: Array[Byte] => Array[Byte],
                       payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
    val pIdx = schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = r.toSeq.toArray
        if (!r.isNullAt(pIdx))
          out(pIdx) = f(r.getAs[Array[Byte]](pIdx))
        new GenericRowWithSchema(out, schema): Row
      }
    }(Encoders.row(schema))
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("n_channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("abs_sum", LongType, nullable = false)
  ))

  /** Encode a 16-bit PCM WAV (RIFF/WAVE, `fmt ` + `data`). `sample(i)`
    * supplies interleaved samples in [-32768, 32767]; `i` runs over
    * frames × channels. */
  def encodeWav(channels: Int, sampleRate: Int, nFrames: Int,
                sample: Int => Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataLen = nFrames * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames * channels) { out.putShort(sample(i).toShort); i += 1 }
    out.array()
  }

  /** REAL decoder for 16-bit PCM WAV: walks the RIFF chunk list (unknown
    * chunks skipped, odd sizes padded per spec), reads `fmt `, and folds
    * the `data` samples into (n_channels, sample_rate, n_samples =
    * frames, abs_sum = Σ|sample| over all channels). abs_sum is an exact
    * integer — amplitude means are left to the caller as integral
    * divisions, keeping downstream comparisons engine-exact. Throws on
    * malformed or non-PCM-16 input — a corrupt payload should surface,
    * not silently skew features. */
  /** The RIFF chunk walk shared by [[decodeWav]] and
    * [[audioFingerprint32]]: validates fmt/data and returns (channels,
    * sampleRate, frames, buffer positioned at the data chunk's first
    * sample). One definition so the two consumers can never parse
    * differently. */
  private def wavData(payload: Array[Byte])
      : (Int, Int, Int, java.nio.ByteBuffer) = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad WAV: $msg")
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (payload.length < 12 || tag() != "RIFF") fail("missing RIFF magic")
    buf.getInt // riff size: not trusted, chunk walk is bounds-checked
    if (tag() != "WAVE") fail("not a WAVE form")
    var channels, sampleRate, blockAlign, bits = -1
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) fail(s"chunk $id overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          val fmt = buf.getShort
          if (fmt != 1) fail(s"not integer PCM (format $fmt)")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate (derived)
          blockAlign = buf.getShort
          bits = buf.getShort
          if (channels <= 0 || sampleRate <= 0) fail("bad fmt fields")
          if (bits != 16) fail(s"only 16-bit PCM supported, got $bits")
          if (blockAlign != channels * 2) fail("blockAlign != channels*2")
          buf.position(buf.position() + (size - 16) + (size & 1))
        case "data" =>
          if (channels < 0) fail("data chunk before fmt")
          if (size % blockAlign != 0) fail("data size not frame-aligned")
          return (channels, sampleRate, size / blockAlign, buf)
        case _ => // LIST/INFO/etc: skip, honoring the odd-size pad byte
          buf.position(buf.position() + size + (size & 1))
      }
    }
    fail("no data chunk")
  }

  def decodeWav(payload: Array[Byte]): Row = {
    val (channels, sampleRate, frames, buf) = wavData(payload)
    var absSum = 0L
    var i = 0
    val n = frames * channels
    while (i < n) { absSum += math.abs(buf.getShort.toLong); i += 1 }
    new GenericRowWithSchema(Array[Any](
      channels, sampleRate, frames, absSum), audioFeatureSchema)
  }

  /** 32-bit amplitude-envelope fingerprint of the decoded PCM stream —
    * the audio-dedup primitive (the coarse cousin of chromaprint, built
    * on what 16-bit PCM alone provides): split the sample stream into 32
    * equal frames, take each frame's floor-mean |amplitude|, set bit j
    * iff frame j is louder than the overall floor-mean. Re-encoded exact
    * copies collide; envelope-preserving edits mostly collide; different
    * material does not. All arithmetic is integer (sums, floor
    * divisions, comparisons), so the value replicates in plain SQL and
    * audio dedup becomes the [[graft.scale.Dedup.exact]] hash-groupBy —
    * the audio leg of the text/image/audio dedup trio. */
  def audioFingerprint32(payload: Array[Byte]): Long = {
    val (channels, _, frames, buf) = wavData(payload)
    val n = frames * channels
    if (n == 0) return 0L
    val sums = new Array[Long](32)
    val cnts = new Array[Long](32)
    var total = 0L
    var i = 0
    while (i < n) {
      val a = math.abs(buf.getShort.toLong)
      val j = (i.toLong * 32 / n).toInt
      sums(j) += a; cnts(j) += 1; total += a
      i += 1
    }
    val overall = total / n
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (cnts(j) > 0 && sums(j) / cnts(j) > overall) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** 64-bit DIFFERENCE fingerprint of the PCM stream — the NEAR-dup
    * audio primitive (Haitsma–Kalker 2002's band-energy-difference bits,
    * realized in the time domain over what 16-bit PCM alone provides).
    * The stream is split into 65 equal frames; bit j (0 ≤ j < 64) is set
    * iff frame j's mean |amplitude| exceeds frame j+1's, compared as the
    * exact rational s_j/c_j > s_{j+1}/c_{j+1} (quotient first, then the
    * cross-multiplied remainders — overflow-safe for any recording whose
    * per-frame sample count fits an Int).
    *
    * Why this beats the mean-threshold envelope ([[audioFingerprint32]])
    * for RADIUS search: each bit compares ADJACENT frames, so (a) a
    * uniform gain change scales both sides of every comparison equally —
    * zero bits flip (the re-encode/normalize case), and (b) a LOCAL edit
    * touches only the comparisons whose frames overlap it — few bits
    * flip, unlike a global-mean reference where a loud insertion shifts
    * the threshold under all 32 bits at once (the bimodality that made
    * the envelope fingerprint exact-match-only). Hamming distance over
    * this fingerprint is therefore a graded similarity, and the
    * [[graft.scale.Dedup.hammingBandPairs]] family (lossless for
    * radius < bands) applies unchanged. Returned as (hi, lo) 32-bit
    * halves like the image aHash — every intermediate is a small
    * non-negative integer, replicable in plain SQL. */
  def audioDiffFingerprint64(payload: Array[Byte]): (Long, Long) = {
    val (channels, _, frames, buf) = wavData(payload)
    val n = frames * channels
    val sums = new Array[Long](65)
    val cnts = new Array[Long](65)
    var i = 0
    while (i < n) {
      val a = math.abs(buf.getShort.toLong)
      val j = (i.toLong * 65 / n).toInt
      sums(j) += a; cnts(j) += 1
      i += 1
    }
    // exact fraction compare s1/c1 > s2/c2 without s*c overflow:
    // compare integer quotients, then cross-multiply the remainders
    // (both < their divisor, so the products stay far below 2^63)
    def louder(j: Int): Boolean = {
      val c1 = cnts(j); val c2 = cnts(j + 1)
      if (c1 == 0 || c2 == 0) return false // empty frame: never "louder"
      val q1 = sums(j) / c1; val r1 = sums(j) % c1
      val q2 = sums(j + 1) / c2; val r2 = sums(j + 1) % c2
      q1 > q2 || (q1 == q2 && r1 * c2 > r2 * c1)
    }
    var lo = 0L; var hi = 0L
    var j = 0
    while (j < 64) {
      if (louder(j)) {
        if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
      }
      j += 1
    }
    (hi, lo)
  }

  /** Attach decoded features to rows carrying a binary payload column.
    * Batched per-partition (decoder init amortization point); pass
    * [[decodePgm]] (or a real codec) as `decoder`, with the matching
    * `featSchema` ([[audioFeatureSchema]] for [[decodeWav]]). Rows with a
    * NULL payload get a NULL features struct — fabricating features for
    * missing media (or crashing the decoder on it) would silently skew
    * downstream statistics. */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload",
                      decoder: Array[Byte] => Row = decodeStub,
                      featSchema: StructType = featureSchema): DataFrame = {
    val schema = df.schema
    val outSchema = StructType(schema.fields :+
      StructField("features", featSchema, nullable = true))
    val pIdx = schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // real decoders initialize here, once per partition
      rows.map { r =>
        val features =
          if (r.isNullAt(pIdx)) null
          else decoder(r.getAs[Array[Byte]](pIdx))
        new GenericRowWithSchema((r.toSeq :+ features).toArray, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("n_sampled", IntegerType, nullable = false),
    StructField("luma_sum", LongType, nullable = false)
  ))

  /** Encode an uncompressed YUV4MPEG2 (Y4M) video — the no-container
    * raw-frame format every ffmpeg pipeline can emit, and simple enough
    * to parse with zero native libs (the same reason PGM/WAV carry the
    * image/audio paths here). C420: even dims required; `luma(f, i)`
    * supplies the Y plane, chroma planes are neutral 128. */
  def encodeY4m(width: Int, height: Int, nFrames: Int,
                luma: (Int, Int) => Int): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "C420 needs even dims")
    val ySize = width * height
    val cSize = (width / 2) * (height / 2)
    val header = s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 C420\n"
      .getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val out = java.nio.ByteBuffer.allocate(
      header.length + nFrames * (frameHdr.length + ySize + 2 * cSize))
    out.put(header)
    var f = 0
    while (f < nFrames) {
      out.put(frameHdr)
      var i = 0
      while (i < ySize) { out.put((luma(f, i) & 0xff).toByte); i += 1 }
      i = 0
      while (i < 2 * cSize) { out.put(128.toByte); i += 1 }
      f += 1
    }
    out.array()
  }

  /** REAL decoder for Y4M video: parses the stream header (W/H required,
    * C420 chroma geometry), walks FRAME records to EOF, and folds every
    * `frameStride`-th frame's luma plane into an exact integer sum —
    * (width, height, n_frames, n_sampled, luma_sum). Truncated frames or
    * trailing bytes fail loudly, like the PGM/WAV decoders: a corrupt
    * payload should surface, not skew statistics. */
  def decodeY4m(payload: Array[Byte], frameStride: Int = 2): Row = {
    def fail(msg: String) = throw new IllegalArgumentException(s"bad Y4M: $msg")
    var pos = 0
    def line(): String = {
      val start = pos
      while (pos < payload.length && payload(pos) != '\n') pos += 1
      if (pos >= payload.length) fail("unterminated header line")
      pos += 1
      new String(payload, start, pos - 1 - start, "US-ASCII")
    }
    val header = line().split(" ")
    if (header.head != "YUV4MPEG2") fail("missing YUV4MPEG2 magic")
    var w = -1; var h = -1; var chroma = "420"
    header.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'C' => chroma = p.substring(1)
        case _ => // frame rate / interlace / aspect: irrelevant to features
      }
    }
    if (w <= 0 || h <= 0) fail("missing W/H")
    if (!chroma.startsWith("420")) fail(s"unsupported chroma C$chroma")
    val ySize = w * h
    val frameLen = ySize + 2 * ((w / 2) * (h / 2))
    var nFrames = 0; var nSampled = 0; var lumaSum = 0L
    while (pos < payload.length) {
      val fh = line()
      if (fh != "FRAME" && !fh.startsWith("FRAME ")) fail(s"expected FRAME, got '$fh'")
      if (pos + frameLen > payload.length)
        fail(s"truncated frame $nFrames: ${payload.length - pos} < $frameLen")
      if (nFrames % frameStride == 0) {
        var i = 0
        while (i < ySize) { lumaSum += (payload(pos + i) & 0xff); i += 1 }
        nSampled += 1
      }
      pos += frameLen
      nFrames += 1
    }
    new GenericRowWithSchema(Array[Any](w, h, nFrames, nSampled, lumaSum),
      videoFeatureSchema)
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `stride`-th frame index — pure expression, no decode needed. */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int = 2): DataFrame =
    df.withColumn("sampled_frames",
      when(col(nFramesCol) <= 0, array().cast("array<int>"))
        .otherwise(filter(sequence(lit(0), col(nFramesCol) - 1),
          i => i % stride === 0)))
}
