package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/**
 * Multimodal-column plumbing for training-data pipelines: media payloads as
 * opaque `binary` columns with typed metadata, plus decode / feature-extract
 * / resize / frame-sample operators.
 *
 * IMAGE decode is REAL: PNG/JPEG payloads (detected by magic bytes) go
 * through the JDK's `javax.imageio` to grey-scale pixels. Audio/video
 * codecs are NOT in this container, so those payloads fall back to a
 * clearly-marked DETERMINISTIC byte-fake ([[MediaCodec]]) — either way the
 * Spark-side shape is load-bearing: binary columns survive parquet
 * round-trips, metadata lives in ordinary prunable columns, per-partition
 * batch processing goes through `mapPartitions` with an explicit output
 * schema (the Scala analogue of an Arrow-batched pandas UDF), and the
 * operators compose with the rest of the engine (dedup on frame hashes,
 * partitioning on metadata).
 */
object Multimodal {

  /**
   * Media codec: REAL grey-scale image decode for PNG/JPEG via the JDK's
   * ImageIO; a deterministic byte-fake for everything else (the ffmpeg
   * call a production audio/video path would make is absent here, so the
   * payload bytes stand in for samples — exactly reproducible by an
   * external oracle).
   */
  object MediaCodec {
    /** PNG (\x89PNG) or JPEG (\xFF\xD8\xFF) magic? Only then is an ImageIO
      * parse attempted — arbitrary payloads never pay reader setup. */
    def isImage(media: Array[Byte]): Boolean =
      (media.length >= 4 && (media(0) & 0xff) == 0x89 && media(1) == 'P' &&
        media(2) == 'N' && media(3) == 'G') ||
      (media.length >= 3 && (media(0) & 0xff) == 0xff && (media(1) & 0xff) == 0xd8 &&
        (media(2) & 0xff) == 0xff)

    /** RIFF/WAVE magic? Only then is an AudioSystem parse attempted. */
    def isWav(media: Array[Byte]): Boolean =
      media.length >= 12 && media(0) == 'R' && media(1) == 'I' &&
        media(2) == 'F' && media(3) == 'F' && media(8) == 'W' &&
        media(9) == 'A' && media(10) == 'V' && media(11) == 'E'

    /**
     * Real audio decode via the JDK's `javax.sound.sampled` (no external
     * codec deps): PCM WAV payloads (8/16-bit, signed/unsigned, any
     * channel count, either endianness) decode to one unsigned byte per
     * FRAME — channels are mixed down by integer floor-average and 16-bit
     * samples map to their top byte (`(s + 32768) >> 8`), so the output
     * stream is the same "one byte per time step" shape the grey-pixel
     * image path produces and every downstream sketch consumes. All
     * integer arithmetic: an external SQL engine replays the decode
     * byte-for-byte from the PCM samples (q226/q227's oracles do).
     * Non-PCM encodings and exotic widths return None (payload falls
     * through to the byte-fake) rather than guessing.
     */
    def decodeWav(media: Array[Byte]): Option[Array[Byte]] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      try {
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(media))
        try {
          val fmt = ais.getFormat
          val enc = fmt.getEncoding
          val bits = fmt.getSampleSizeInBits
          val ch = fmt.getChannels
          val frameBytes = fmt.getFrameSize
          val signed = enc == AudioFormat.Encoding.PCM_SIGNED
          val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
          if ((!signed && !unsigned) || (bits != 8 && bits != 16) ||
              ch < 1 || frameBytes != ch * (bits / 8)) None
          else {
            val raw = ais.readAllBytes()
            val nFrames = raw.length / frameBytes
            val out = new Array[Byte](nFrames)
            val bytesPer = bits / 8
            var f = 0
            while (f < nFrames) {
              var sum = 0L
              var c = 0
              while (c < ch) {
                val off = f * frameBytes + c * bytesPer
                val s =
                  if (bits == 8) {
                    if (unsigned) (raw(off) & 0xff) - 128 else raw(off).toInt
                  } else {
                    val u =
                      if (fmt.isBigEndian) ((raw(off) & 0xff) << 8) | (raw(off + 1) & 0xff)
                      else ((raw(off + 1) & 0xff) << 8) | (raw(off) & 0xff)
                    if (unsigned) u - 32768
                    else if (u >= 32768) u - 65536 else u
                  }
                sum += s
                c += 1
              }
              out(f) = ((Math.floorDiv(sum, ch) + (if (bits == 8) 128 else 32768)) >>
                (if (bits == 8) 0 else 8)).toByte
              f += 1
            }
            Some(out)
          }
        } finally ais.close()
      } catch { case _: Exception => None }
    }

    /** Real image decode: row-major grey-scale bytes (Rec.601 luma). */
    def decodeImage(media: Array[Byte]): Option[Array[Byte]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val out = new Array[Byte](w * h)
          var y = 0; var i = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val grey = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              out(i) = grey.toByte
              i += 1; x += 1
            }
            y += 1
          }
          Some(out)
        }
      } catch { case _: Exception => None }

    /** Decode: real pixels for decodable images, real PCM frame bytes for
      * WAV audio; identity bytes otherwise (the deterministic stand-in
      * for absent video codecs — no public JDK video decoder exists). */
    def decode(media: Array[Byte]): Array[Byte] =
      if (isWav(media)) decodeWav(media).getOrElse(media)
      else if (isImage(media)) decodeImage(media).getOrElse(media)
      else media

    /**
     * Build a PCM16LE mono WAV container around the given samples — the
     * fixture-side inverse of [[decodeWav]] (specs and the q226/q227
     * oracle queries construct payloads with it; a real pipeline's WAVs
     * come off disk). Standard 44-byte RIFF header, little-endian
     * throughout.
     */
    def wavPcm16(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)                  // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
        .putShort(2).putShort(16)                 // block align, bits
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Byte-sum "brightness" — stands in for a pixel-mean feature. */
    def byteSum(media: Array[Byte]): Long = {
      var s = 0L; var i = 0
      while (i < media.length) { s += media(i) & 0xff; i += 1 }
      s
    }

    /** "Resize": keep every stride-th byte — stands in for subsampling. */
    def resize(media: Array[Byte], stride: Int): Array[Byte] = {
      val out = new Array[Byte]((media.length + stride - 1) / stride)
      var i = 0
      while (i < out.length) { out(i) = media(i * stride); i += 1 }
      out
    }
  }

  /**
   * Attach a synthetic media payload + metadata to a text corpus: payload =
   * UTF-8 bytes of md5(text) repeated (n_chars mod 4 + 2) times; type cycles
   * image/audio/video by id. Purely deterministic — an external SQL engine
   * reproduces every byte.
   */
  def withSyntheticMedia(df: DataFrame, idCol: Column, textCol: Column,
                         nCharsCol: Column): DataFrame =
    // pmod, not %: Spark's % keeps the sign of the dividend, so negative
    // ids would index element_at(0) (an error) or produce negative dims
    df.withColumn("media",
        repeat(md5(textCol.cast("binary")), (pmod(nCharsCol, lit(4)) + 2).cast("int")).cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(idCol, lit(3)) + 1).cast("int")))
      .withColumn("media_len", length(col("media")).cast("long"))
      .withColumn("width", (pmod(nCharsCol, lit(64)) + 16).cast("int"))
      .withColumn("height", (pmod(idCol * 7, lit(48)) + 16).cast("int"))

  /**
   * Per-partition feature extraction over the binary column — the batched
   * processing shape (one decode context per partition, row-streamed).
   * Output: input columns + byte_sum + frame0_md5 (first-frame content
   * hash; frames = `frames` equal byte slices).
   */
  def extractFeatures(df: DataFrame, frames: Int): DataFrame = {
    require(frames > 0, s"extractFeatures: frames must be positive (got $frames)")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("byte_sum", LongType, nullable = false),
      StructField("frame0_md5", StringType, nullable = false)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { it =>
      // per-partition init (real codecs would open a decode context here)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        // a null payload (upstream outer join, nullable parquet) decodes to
        // an empty media, not an executor NPE
        val raw = r.getAs[Array[Byte]](mediaIdx)
        val media = if (raw == null) Array.emptyByteArray else MediaCodec.decode(raw)
        val frameLen = math.max(media.length / frames, 1)
        val frame0 = java.util.Arrays.copyOfRange(media, 0, math.min(frameLen, media.length))
        digest.reset()
        val hex = digest.digest(frame0).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq :+ MediaCodec.byteSum(media) :+ hex)
      }
    }(Encoders.row(schema))
  }

  /**
   * Explode each media payload into sampled frame rows — the video
   * training-data shape (frame extraction for vision-language batches).
   * The payload is cut into `frames` equal slices of
   * `flen = max(len/frames, 1)` bytes (tail remainder beyond
   * `frames*flen` is dropped, short payloads yield fewer frames), and
   * every `stride`-th frame (0, stride, 2·stride, …) is emitted as its
   * own row: input columns + `frame_idx` + `frame` bytes. Same
   * per-partition decode-context shape as [[extractFeatures]]; output
   * row count is bounded by `frames/stride` per input row, so the
   * explode factor is a planned constant, not data-dependent.
   */
  def sampleFrames(df: DataFrame, frames: Int, stride: Int): DataFrame = {
    require(frames > 0, s"sampleFrames: frames must be positive (got $frames)")
    require(stride > 0, s"sampleFrames: stride must be positive (got $stride)")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](mediaIdx)
        val media = if (raw == null) Array.emptyByteArray else MediaCodec.decode(raw)
        val flen = math.max(media.length / frames, 1)
        (0 until frames).iterator
          .filter(i => i % stride == 0 && i * flen < media.length)
          .map { i =>
            val frame = java.util.Arrays.copyOfRange(media, i * flen,
              math.min((i + 1) * flen, media.length))
            Row.fromSeq(r.toSeq :+ i :+ frame)
          }
      }
    }(Encoders.row(schema))
  }

  /**
   * Overlapping byte-window chunking of the media payload — the audio
   * training shape (fixed `window`, `hop` < window ⇒ consecutive chunks
   * overlap by window-hop bytes, the usual spectrogram framing). Chunk i
   * covers bytes [i·hop, min(i·hop+window, len)); chunks start while
   * i·hop < len, so the final chunk may be short and an empty payload
   * yields no rows. Output: input columns + `chunk_idx` + `chunk`.
   * Explode factor is ⌈len/hop⌉ — bounded by payload size over hop, a
   * planned constant for fixed-length media.
   */
  def chunkMedia(df: DataFrame, window: Int, hop: Int): DataFrame = {
    require(window > 0, s"chunkMedia: window must be positive (got $window)")
    require(hop > 0, s"chunkMedia: hop must be positive (got $hop)")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("chunk", BinaryType, nullable = true)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](mediaIdx)
        val media = if (raw == null) Array.emptyByteArray else MediaCodec.decode(raw)
        Iterator.from(0).takeWhile(i => i.toLong * hop < media.length).map { i =>
          val start = i * hop
          val chunk = java.util.Arrays.copyOfRange(media, start,
            math.min(start + window, media.length))
          Row.fromSeq(r.toSeq :+ i :+ chunk)
        }
      }
    }(Encoders.row(schema))
  }

  /**
   * 64-bit perceptual sketch (1-D average-hash) of the DECODED media
   * stream: the decoded bytes (real grey pixels for PNG/JPEG, the
   * deterministic byte-fake otherwise) are cut into 64 near-equal
   * segments — segment s covers byte indices [s·L/64, (s+1)·L/64) — and
   * bit s is set iff the segment's mean exceeds the stream mean. The
   * comparison is the exact integer cross-multiplication
   * `segSum·L > total·segLen` (no division, no doubles), so an external
   * SQL engine replays the sketch bit-for-bit on fake payloads. Small
   * perturbations (one pixel, slight re-encode brightness) flip few
   * segment means, so near-identical media land within a small hamming
   * distance — the classic aHash property, generalized to 1-D so the same
   * sketch covers image pixels and audio/video sample streams.
   */
  private[graft] def mediaAHash(media: Array[Byte]): Long = {
    val px = MediaCodec.decode(media)
    val l = px.length
    if (l == 0) 0L
    else {
      val segSum = new Array[Long](64)
      val segLen = new Array[Long](64)
      var total = 0L
      var i = 0
      while (i < l) {
        val s = (i.toLong * 64 / l).toInt
        val v = (px(i) & 0xff).toLong
        segSum(s) += v; segLen(s) += 1; total += v
        i += 1
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (segLen(b) > 0 && segSum(b) * l > total * segLen(b)) h |= (1L << b)
        b += 1
      }
      h
    }
  }

  /**
   * Perceptual near-duplicate media pairs: [[mediaAHash]] sketches joined
   * by the SAME pigeonhole block machinery as SimHash text dedup
   * ([[Dedup.hammingPairs]]) — exact for hamming <= blocks-1, so the
   * candidate join is bucketed (16-bit block keys), never all-pairs.
   * Output (id_a < id_b). The image twin of document near-dedup: re-encoded
   * or lightly-edited copies of an image hash within a few bits while
   * unrelated media differ in ~32.
   *
   * Scale shape: the sketch is a pure map (8 bytes/row leaves the
   * executor); the block join + popcount refine shuffles 4 short rows per
   * media item. Same knobs and bounds as SimHash.
   */
  def mediaAHashPairs(df: DataFrame, idCol: Column, mediaCol: Column,
                      maxHam: Int = 3, blocks: Int = 4): DataFrame = {
    require(64 % blocks == 0, "blocks must divide 64")
    require(maxHam <= blocks - 1,
      s"maxHam ($maxHam) must be <= blocks-1 (${blocks - 1}) or the pigeonhole " +
      "candidate generation silently misses true pairs")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val ah = udf((m: Array[Byte]) => if (m == null) 0L else mediaAHash(m))
    Dedup.hammingPairs(
      df.select(idCol.as("__id"), ah(mediaCol).as("__sim")), maxHam, blocks)
  }

  // ---- DCT perceptual hash (pHash) ----

  /** pHash geometry: the stream resamples to [[PHashN]] segments and the
    * sketch keeps the [[PHashK]] LOWEST DCT frequencies (k = 1..64 of a
    * 512-point DCT — an eighth of the spectrum, mirroring image pHash's
    * 8×8-of-32×32 proportions). Keeping only the low band is the point:
    * high-frequency perturbations (noise, dithering, re-encode artifacts)
    * that flip many [[mediaAHash]] segment-mean bits project outside the
    * kept band and leave the pHash untouched. */
  private[graft] val PHashN = 512
  private[graft] val PHashK = 64

  /** Fixed-point quarter-wave cosine table: `cosTabE6(j) =
    * round(1e6·cos(π·j/1024))`, j in [0, 1024]. The DCT-II angle is
    * π·k·(2n+1)/(2·512) = π·M/1024 with M = k(2n+1); by periodicity and
    * symmetry cos(π·M/1024) = cos(π·min(M mod 2048, 2048 − M mod 2048)
    * /1024), so this 1025-entry INTEGER-indexed table is the whole
    * transform — and the SQL oracle replays it as a literal VALUES table
    * (no trig in either engine's hot path, no cross-libm ULP risk). */
  private[graft] lazy val cosTabE6: Array[Long] =
    Array.tabulate(1025)(j => math.round(math.cos(math.Pi * j / 1024.0) * 1e6))

  private def cosE6(k: Int, n: Int): Long = {
    val m = (k * (2 * n + 1)) % 2048
    cosTabE6(math.min(m, 2048 - m))
  }

  /**
   * 64-bit DCT perceptual hash (pHash) of the decoded media stream — the
   * standard tier above [[mediaAHash]]: resample to [[PHashN]] segment
   * means (exact e6 floor division), 1-D DCT-II via [[cosTabE6]], bit
   * k−1 set iff coefficient k exceeds the LOWER MEDIAN of the kept 64
   * (the sign-of-median rule — brightness/contrast invariant and
   * balanced by construction). All integer arithmetic end-to-end, so an
   * external SQL engine replays the sketch bit-for-bit on fake payloads
   * (the q119 pattern).
   */
  private[graft] def mediaPHash(media: Array[Byte]): Long = {
    val px = MediaCodec.decode(media)
    val l = px.length
    if (l == 0) return 0L
    val segSum = new Array[Long](PHashN)
    val segLen = new Array[Long](PHashN)
    var i = 0
    while (i < l) {
      val s = (i.toLong * PHashN / l).toInt
      segSum(s) += (px(i) & 0xff).toLong; segLen(s) += 1
      i += 1
    }
    val x = new Array[Long](PHashN)
    var n = 0
    while (n < PHashN) {
      x(n) = if (segLen(n) == 0) 0L else segSum(n) * 1000000L / segLen(n)
      n += 1
    }
    val coef = new Array[Long](PHashK)
    var k = 1
    while (k <= PHashK) {
      var acc = 0L; var j = 0
      while (j < PHashN) {
        if (x(j) != 0L) acc += cosE6(k, j) * x(j)
        j += 1
      }
      coef(k - 1) = acc; k += 1
    }
    val sorted = coef.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(PHashK / 2 - 1)
    var h = 0L
    var b = 0
    while (b < PHashK) {
      if (coef(b) > med) h |= (1L << b)
      b += 1
    }
    h
  }

  /** [[mediaAHashPairs]] through the DCT hash — same pigeonhole block
    * join, same knobs and bounds; catches near-duplicates whose
    * high-frequency perturbations (noise, dither, re-encode) blow past
    * aHash's hamming budget (MultimodalSpec pins such a pair). */
  def mediaPHashPairs(df: DataFrame, idCol: Column, mediaCol: Column,
                      maxHam: Int = 3, blocks: Int = 4): DataFrame = {
    require(64 % blocks == 0, "blocks must divide 64")
    require(maxHam <= blocks - 1,
      s"maxHam ($maxHam) must be <= blocks-1 (${blocks - 1}) or the pigeonhole " +
      "candidate generation silently misses true pairs")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val ph = udf((m: Array[Byte]) => if (m == null) 0L else mediaPHash(m))
    Dedup.hammingPairs(
      df.select(idCol.as("__id"), ph(mediaCol).as("__sim")), maxHam, blocks)
  }

  /** Resize/subsample the media payload in place (stride bytes). */
  def resizeMedia(df: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"resizeMedia: stride must be positive (got $stride)")
    val schema = df.schema
    val mediaIdx = schema.fieldIndex("media")
    df.mapPartitions { it =>
      it.map { r =>
        val raw = r.getAs[Array[Byte]](mediaIdx)
        val out = r.toSeq.updated(mediaIdx,
          if (raw == null) null else MediaCodec.resize(raw, stride))
        Row.fromSeq(out)
      }
    }(Encoders.row(schema))
  }
}
