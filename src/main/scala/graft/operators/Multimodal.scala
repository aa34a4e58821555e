package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/**
 * Multimodal-column plumbing for training-data pipelines: media payloads as
 * opaque `binary` columns with typed metadata, plus decode / feature-extract
 * / resize / frame-sample operators.
 *
 * IMAGE decode is REAL (PNG/JPEG through the JDK's `javax.imageio`),
 * AUDIO decode is REAL (PCM WAV through `javax.sound.sampled`), and
 * VIDEO decode is REAL for AVI containers (public-spec RIFF walk; DIB
 * frames integer-exact, MJPEG frames through the JDK's JPEG reader).
 * Payloads with no public-JDK decode path fall back to a clearly-marked
 * DETERMINISTIC byte-fake ([[MediaCodec]]) — either way the Spark-side
 * shape is load-bearing: binary columns survive parquet round-trips,
 * metadata lives in ordinary prunable columns, per-partition batch
 * processing goes through `mapPartitions` with an explicit output schema
 * (the Scala analogue of an Arrow-batched pandas UDF), and the operators
 * compose with the rest of the engine (dedup on frame hashes,
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

    /** RIFF/AVI magic? Only then is the container walk attempted. */
    def isAvi(media: Array[Byte]): Boolean =
      media.length >= 12 && media(0) == 'R' && media(1) == 'I' &&
        media(2) == 'F' && media(3) == 'F' && media(8) == 'A' &&
        media(9) == 'V' && media(10) == 'I' && media(11) == ' '

    /**
     * Real video decode via a public-spec RIFF/AVI container walk (the
     * WAV treatment extended to video — no external codec deps): the
     * walk parses the `hdrl` stream headers to find the first `vids`
     * stream and its BITMAPINFOHEADER, then decodes that stream's
     * `##db`/`##dc` movi chunks:
     *
     *  - BI_RGB (biCompression = 0, 24-bit) — uncompressed DIB frames,
     *    bottom-up BGR rows padded to 4 bytes: decoded with the SAME
     *    integer Rec.601 luma as [[decodeImage]], all-integer, so an
     *    external SQL engine replays the decode byte-for-byte from the
     *    pixel formula (q236/q237's oracles do).
     *  - MJPEG (frames carrying JPEG magic) — each frame through the
     *    JDK's own JPEG reader ([[decodeImage]]); REAL but lossy, so
     *    this leg is pinned by MultimodalSpec's near-dup contract, not
     *    a SQL replay (JPEG entropy decode is not expressible as a
     *    formula an oracle can recompute — the documented reason the
     *    MJPEG leg is spec-pinned).
     *
     * Output: frames concatenated, top-down row-major, one grey byte
     * per pixel — the exact "one byte per step" stream shape
     * [[decodeWav]] and [[decodeImage]] produce, so every downstream
     * sketch (aHash/pHash/frame sampling/chunking) works on video
     * unchanged. Unsupported compressions, missing video streams, and
     * malformed containers return None (payload falls through to the
     * byte-fake) rather than guessing.
     */
    def decodeAvi(media: Array[Byte]): Option[Array[Byte]] = {
      if (!isAvi(media)) return None
      try {
        val bb = java.nio.ByteBuffer.wrap(media)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var vidsStream = -1
        var streamIdx = 0
        var w = 0; var h = 0; var bitCount = 0; var compression = 0
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        def fourcc(p: Int) = new String(media, p, 4, "US-ASCII")
        def walk(start: Int, end: Int): Unit = {
          var p = start
          var ok = true
          while (ok && p + 8 <= end) {
            val id = fourcc(p)
            val sz = bb.getInt(p + 4)
            if (sz < 0 || p + 8 + sz > end) ok = false
            else {
              if (id == "LIST" && sz >= 4) walk(p + 12, p + 8 + sz)
              else if (id == "strh") {
                if (sz >= 4 && fourcc(p + 8) == "vids" && vidsStream < 0)
                  vidsStream = streamIdx
                streamIdx += 1
              } else if (id == "strf") {
                if (vidsStream == streamIdx - 1 && w == 0 && sz >= 40) {
                  w = bb.getInt(p + 12); h = bb.getInt(p + 16)
                  bitCount = bb.getShort(p + 22) & 0xffff
                  compression = bb.getInt(p + 24)
                }
              } else if (vidsStream >= 0 && id.length == 4 &&
                  id.startsWith(f"$vidsStream%02d") &&
                  (id.endsWith("db") || id.endsWith("dc"))) {
                frames += ((p + 8, sz))
              }
              p += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
            }
          }
        }
        walk(12, media.length)
        val habs = math.abs(h)
        if (vidsStream < 0 || w <= 0 || habs == 0 || frames.isEmpty) return None
        // header fields are untrusted: size the output in LONG arithmetic
        // and reject implausible headers BEFORE allocating — an Int
        // overflow could yield a wrong positive size, and a multi-GB
        // allocation's OutOfMemoryError is an Error that would escape the
        // catch(_: Exception) fallback below. The container itself bounds
        // honest sizes: decoded pixels can't exceed ~media bytes for the
        // uncompressed path, and a loose 64x payload bound covers JPEG.
        val outLen = frames.length.toLong * w.toLong * habs.toLong
        if (w > (1 << 16) || habs > (1 << 16) ||
            outLen > math.max(media.length.toLong * 64L, 1L << 24) ||
            outLen > Int.MaxValue - 8) return None
        val out = new Array[Byte](outLen.toInt)
        var fi = 0
        while (fi < frames.length) {
          val (fo, sz) = frames(fi)
          val isJpeg = sz >= 3 && (media(fo) & 0xff) == 0xff &&
            (media(fo + 1) & 0xff) == 0xd8 && (media(fo + 2) & 0xff) == 0xff
          if (compression == 0 && bitCount == 24) {
            val rowBytes = ((w * 3 + 3) / 4) * 4
            if (sz < rowBytes * habs) return None
            var y = 0
            while (y < habs) {
              // positive biHeight = bottom-up storage (the BMP default)
              val srcRow = if (h > 0) habs - 1 - y else y
              var x = 0
              while (x < w) {
                val o = fo + srcRow * rowBytes + x * 3
                val grey = ((media(o + 2) & 0xff) * 299 +
                  (media(o + 1) & 0xff) * 587 + (media(o) & 0xff) * 114) / 1000
                out(fi * w * habs + y * w + x) = grey.toByte
                x += 1
              }
              y += 1
            }
          } else if (isJpeg) {
            decodeImage(java.util.Arrays.copyOfRange(media, fo, fo + sz)) match {
              case Some(px) if px.length == w * habs =>
                System.arraycopy(px, 0, out, fi * w * habs, px.length)
              case _ => return None
            }
          } else return None
          fi += 1
        }
        Some(out)
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

    /** Decode: real pixels for decodable images, real PCM frame bytes
      * for WAV audio, real per-frame grey pixels for AVI video
      * (DIB/MJPEG); identity bytes otherwise (the deterministic
      * stand-in for payloads with no public-JDK decode path). */
    def decode(media: Array[Byte]): Array[Byte] =
      if (isWav(media)) decodeWav(media).getOrElse(media)
      else if (isAvi(media)) decodeAvi(media).getOrElse(media)
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

    private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }

    private def riffList(listType: String, bodies: Array[Byte]*): Array[Byte] =
      riffChunk("LIST",
        listType.getBytes("US-ASCII") ++ bodies.flatten.toArray)

    /** Build a minimal spec-compliant AVI container (RIFF 'AVI ' with
      * hdrl avih + one vids strl and a movi list) around pre-encoded
      * frame payloads — the fixture-side inverse of [[decodeAvi]]
      * (specs and the q236/q237 oracle queries construct payloads with
      * it; a real pipeline's AVIs come off disk). `handler`/`biComp`
      * select the codec ('DIB '/0 for uncompressed, 'MJPG'/'MJPG' for
      * motion JPEG); frame chunk id is '00db'/'00dc' accordingly. */
    private def aviContainer(frameChunks: Seq[Array[Byte]], w: Int, h: Int,
                             handler: String, biComp: Int,
                             frameId: String): Array[Byte] = {
      val n = frameChunks.length
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val avih = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(40000).putInt(0).putInt(0).putInt(0)
        .putInt(n).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      val strh = java.nio.ByteBuffer.allocate(56)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .put("vids".getBytes("US-ASCII")).put(handler.getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(1).putInt(25).putInt(0).putInt(n)
        .putInt(0).putInt(0).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      val strf = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(biComp).putInt(rowBytes * h).putInt(0).putInt(0)
        .putInt(0).putInt(0)
      val hdrl = riffList("hdrl", riffChunk("avih", avih.array()),
        riffList("strl", riffChunk("strh", strh.array()),
          riffChunk("strf", strf.array())))
      val movi = riffList("movi",
        frameChunks.map(f => riffChunk(frameId, f)): _*)
      val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
      bb.array()
    }

    /** Uncompressed (BI_RGB 24-bit 'DIB ') AVI around top-down grey
      * frames: grey byte g becomes the BGR triple (g, g, g), whose
      * Rec.601 luma is exactly g — so [[decodeAvi]] round-trips the
      * input stream byte-for-byte and an external SQL engine replays
      * container + decode from the pixel formula alone. */
    def aviDib24(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h),
        s"aviDib24: every frame must be exactly $w x $h grey bytes")
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val chunks = frames.map { g =>
        val px = new Array[Byte](rowBytes * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = g(y * w + x)
            val o = (h - 1 - y) * rowBytes + x * 3 // bottom-up rows
            px(o) = v; px(o + 1) = v; px(o + 2) = v
            x += 1
          }
          y += 1
        }
        px
      }
      aviContainer(chunks, w, h, "DIB ", 0, "00db")
    }

    /** Motion-JPEG AVI around top-down grey frames, each frame through
      * the JDK's own JPEG WRITER — the lossy leg [[decodeAvi]] serves
      * via ImageIO (spec-pinned; not SQL-replayable by design). */
    def aviMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
      require(frames.nonEmpty && frames.forall(_.length == w * h),
        s"aviMjpeg: every frame must be exactly $w x $h grey bytes")
      val chunks = frames.map { g =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = g(y * w + x) & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      aviContainer(chunks, w, h, "MJPG", 0x47504A4D, "00dc")
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
