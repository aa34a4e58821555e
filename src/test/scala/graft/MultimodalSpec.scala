package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal codec: real PNG decode through the JDK ImageIO path, the
  * deterministic byte-fake for non-image payloads, and the batched
  * feature-extraction shape over both. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** 2x2 PNG: white, black, pure red, pure green. */
  private def tinyPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff); img.setRGB(1, 0, 0x000000)
    img.setRGB(0, 1, 0xff0000); img.setRGB(1, 1, 0x00ff00)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // Rec.601 integer luma of the four pixels
  private val greys = Seq(255, 0, 255 * 299 / 1000, 255 * 587 / 1000)

  test("PNG payloads decode to real grey-scale pixels") {
    val png = tinyPng()
    assert(MediaCodec.isImage(png))
    val pixels = MediaCodec.decode(png).map(_ & 0xff).toSeq
    assert(pixels == greys)
  }

  test("non-image payloads keep the deterministic identity decode") {
    val raw = "not an image".getBytes("UTF-8")
    assert(!MediaCodec.isImage(raw))
    assert(MediaCodec.decode(raw).toSeq == raw.toSeq)
  }

  test("null media and bad parameters fail safely, not in executors") {
    import spark.implicits._
    val df = Seq((1L, "x".getBytes("UTF-8")), (2L, null)).toDF("id", "media")
    // null payload -> empty-media features, not an NPE
    val r = Multimodal.extractFeatures(df, frames = 2)
      .filter(col("id") === 2L).collect()(0)
    assert(r.getAs[Long]("byte_sum") == 0L)
    assert(Multimodal.resizeMedia(df, 2).filter(col("id") === 2L)
      .collect()(0).getAs[Array[Byte]]("media") == null)
    // parameter validation is driver-side
    intercept[IllegalArgumentException] { Multimodal.extractFeatures(df, 0) }
    intercept[IllegalArgumentException] { Multimodal.resizeMedia(df, 0) }
    // negative ids cycle types instead of crashing element_at(0)
    val neg = Seq((-1L, "t", 3L), (-2L, "u", 5L)).toDF("id", "text", "n_chars")
    val types = Multimodal.withSyntheticMedia(neg, col("id"), col("text"), col("n_chars"))
      .select("media_type", "width", "height").collect()
    assert(types.forall(r => Set("image", "audio", "video")(r.getString(0)) &&
      r.getInt(1) >= 16 && r.getInt(2) >= 16))
  }

  test("extractFeatures sums real pixels for images, raw bytes otherwise") {
    import spark.implicits._
    val png = tinyPng()
    val raw = "abc".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, raw)).toDF("id", "media")
    val got = Multimodal.extractFeatures(df, frames = 1)
      .select(col("id"), col("byte_sum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) == greys.sum.toLong)
    assert(got(2L) == raw.map(_ & 0xff).sum.toLong)
  }

  test("mediaAHash: near-identical images pair up, unrelated media do not; local replay exact") {
    import spark.implicits._
    // a 16x16 gradient PNG, a one-pixel-tweaked copy, and its inverse
    def gradient(tweak: Boolean, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val g0 = (x * 16 + y) % 256
        val g = if (invert) 255 - g0 else g0
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      if (tweak) img.setRGB(7, 7, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, gradient(tweak = false, invert = false)),
      (2L, gradient(tweak = true, invert = false)),
      (3L, gradient(tweak = false, invert = true))
    ).toDF("id", "media")
    val pairs = Multimodal.mediaAHashPairs(df, col("id"), col("media"),
        maxHam = 3, blocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // the tweak flips <= 1 segment bit; the inverse flips ~all
    // byte-fake path: the UDF sketch equals a direct local replay
    val fake = "the same bytes stand in for audio samples".getBytes("UTF-8")
    val h = Multimodal.mediaAHash(fake)
    val l = fake.length
    val want = (0 until 64).map { s =>
      val seg = fake.zipWithIndex.filter { case (_, i) => i.toLong * 64 / l == s }
      val sv = seg.map(_._1 & 0xff).map(_.toLong).sum
      val tv = fake.map(_ & 0xff).map(_.toLong).sum
      if (seg.nonEmpty && sv * l > tv * seg.length) 1L << s else 0L
    }.sum
    assert(h == want)
  }

  test("mediaPHash: catches the noisy near-duplicate aHash misses; independent DCT replay") {
    import spark.implicits._
    // two renditions of the same low-frequency signal (a weak sine ramp)
    // under different high-frequency ±2 dither — the re-encode/noise
    // case: many segment means sit near the global mean, so the dither
    // flips MANY aHash bits, while the dither's period-3 harmonic (~170
    // of 512) lies far outside pHash's kept k<=64 band
    def rendition(seed: Int): Array[Byte] =
      Array.tabulate(256) { i =>
        val ramp = (40.0 * math.sin(2 * math.Pi * i / 256)).toInt / 40
        val wig = if ((i * 7 + seed) % 3 == 0) 2 else -2
        math.max(0, math.min(255, 128 + ramp + wig)).toByte
      }
    val a = rendition(0); val b = rendition(1)
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val aham = ham(Multimodal.mediaAHash(a), Multimodal.mediaAHash(b))
    val pham = ham(Multimodal.mediaPHash(a), Multimodal.mediaPHash(b))
    assert(aham > 3, s"aHash hamming $aham should blow the budget")
    assert(pham <= 3, s"pHash hamming $pham should stay within the budget")
    // the pair machinery agrees: pHash pairs them, aHash does not
    val df = Seq((1L, a), (2L, b)).toDF("id", "media")
    assert(Multimodal.mediaPHashPairs(df, col("id"), col("media")).count() == 1)
    assert(Multimodal.mediaAHashPairs(df, col("id"), col("media")).count() == 0)
    // independent local replay of the full integer DCT pipeline
    def replay(px: Array[Byte]): Long = {
      val l = px.length
      val segSum = new Array[Long](512); val segLen = new Array[Long](512)
      px.zipWithIndex.foreach { case (v, i) =>
        val s = (i.toLong * 512 / l).toInt
        segSum(s) += (v & 0xff); segLen(s) += 1
      }
      val x = Array.tabulate(512)(n =>
        if (segLen(n) == 0) 0L else segSum(n) * 1000000L / segLen(n))
      val coef = (1 to 64).map { k =>
        (0 until 512).map { n =>
          val m = (k * (2 * n + 1)) % 2048
          Multimodal.cosTabE6(math.min(m, 2048 - m)) * x(n)
        }.sum
      }
      val med = coef.sorted.apply(31)
      coef.zipWithIndex.collect { case (c, i) if c > med => 1L << i }.sum
    }
    assert(Multimodal.mediaPHash(a) == replay(a))
    assert(Multimodal.mediaPHash(b) == replay(b))
    // invariances the DCT buys: global brightness shift and contrast
    // scaling leave the sign-of-median bits unchanged
    val bright = a.map(v => math.min(255, (v & 0xff) + 30).toByte)
    assert(ham(Multimodal.mediaPHash(a), Multimodal.mediaPHash(bright)) <= 3)
  }

  test("WAV decode: real javax.sound parse — PCM16 top bytes, stereo mixdown, graceful non-PCM fallback") {
    // mono PCM16LE through the fixture builder: decoded frame byte must be
    // the exact integer (s + 32768) >> 8 — the SQL-replayable contract
    val samples = Array.tabulate(300)(i => ((i * 977) % 65536 - 32768).toShort)
    val wav = MediaCodec.wavPcm16(samples, sampleRate = 8000)
    assert(MediaCodec.isWav(wav) && !MediaCodec.isImage(wav))
    val got = MediaCodec.decode(wav)
    assert(got.length == samples.length)
    assert(got.toSeq == samples.map(s => ((s + 32768) >> 8).toByte).toSeq)
    // stereo PCM16LE (hand-built 44-byte header, 2 channels): one byte per
    // FRAME, channels floor-averaged before the top-byte map
    val l = Array[Short](1000, -32768, 500)
    val r = Array[Short](-2000, -32768, 501)
    val dataLen = 12
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(2).putInt(8000).putInt(8000 * 4)
      .putShort(4).putShort(16).put("data".getBytes("US-ASCII")).putInt(dataLen)
    l.indices.foreach { i => bb.putShort(l(i)); bb.putShort(r(i)) }
    val stereo = MediaCodec.decode(bb.array())
    val want = l.indices.map { i =>
      ((Math.floorDiv(l(i).toLong + r(i).toLong, 2) + 32768) >> 8).toByte
    }
    assert(stereo.toSeq == want)
    // a RIFF/WAVE container AudioSystem can't parse (truncated header)
    // falls back to identity bytes, not an exception
    val junk = "RIFFxxxxWAVEgarbage".getBytes("US-ASCII")
    assert(MediaCodec.isWav(junk) && MediaCodec.decode(junk).toSeq == junk.toSeq)
  }

  test("WAV near-dup: time-shifted and requantized clips pair, unrelated tone does not") {
    import spark.implicits._
    // 8-cycle low-frequency sine, 4000 samples: the segment means trace
    // the waveform (8 segments per cycle), which is what the 1-D aHash
    // sketches. Perturbations: a small time shift (8 samples = 13% of a
    // segment) and a 512-step requantization — both classic "same clip,
    // different encode" transforms; the unrelated clip is the quadrature
    // tone (cosine), whose sign pattern disagrees on ~half the segments.
    def clip(shift: Int, quant: Int, quadrature: Boolean): Array[Byte] = {
      val s = Array.tabulate(4000) { i =>
        val ph = 2 * math.Pi * 8 * (i + shift) / 4000
        val v = 12000.0 * (if (quadrature) math.cos(ph) else math.sin(ph))
        val q = (v / quant).toInt * quant
        q.toShort
      }
      MediaCodec.wavPcm16(s)
    }
    val base = clip(0, 1, quadrature = false)
    val shifted = clip(8, 1, quadrature = false)
    val requant = clip(0, 512, quadrature = false)
    val unrel = clip(0, 1, quadrature = true)
    def ham(x: Array[Byte], y: Array[Byte]): Int =
      java.lang.Long.bitCount(Multimodal.mediaAHash(x) ^ Multimodal.mediaAHash(y))
    assert(ham(base, shifted) <= 3, s"shifted clip at ${ham(base, shifted)}")
    assert(ham(base, requant) <= 3, s"requantized clip at ${ham(base, requant)}")
    assert(ham(base, unrel) > 3, s"quadrature tone at ${ham(base, unrel)}")
    // end-to-end through the pair machinery (UDF decodes the container)
    val df = Seq((1L, base), (2L, shifted), (3L, requant), (4L, unrel))
      .toDF("id", "media")
    val pairs = Multimodal.mediaAHashPairs(df, col("id"), col("media"))
      .collect().map(p => (p.getLong(0), p.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // the pHash tier agrees on real audio (low-frequency content rides
    // the kept band; the quadrature tone lands far away)
    def pham(x: Array[Byte], y: Array[Byte]): Int =
      java.lang.Long.bitCount(Multimodal.mediaPHash(x) ^ Multimodal.mediaPHash(y))
    assert(pham(base, shifted) <= 3 && pham(base, requant) <= 3)
    assert(pham(base, unrel) > 3)
  }

  test("sampleFrames: stride=1 reassembles the payload prefix; stride picks every nth") {
    import spark.implicits._
    val media = (0 until 25).map(_.toByte).toArray // 25 bytes, frames=4 -> flen=6
    val df = Seq((1L, media), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array[Byte](9, 8))).toDF("id", "media")
    val all = Multimodal.sampleFrames(df, frames = 4, stride = 1)
      .select(col("id"), col("frame_idx"), col("frame")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2)))
    // id 1: frames 0..3 cover bytes [0,24) — the tail byte 24 is dropped
    val f1 = all.filter(_._1 == 1L).sortBy(_._2)
    assert(f1.map(_._2).toSeq == Seq(0, 1, 2, 3))
    assert(f1.flatMap(_._3).toSeq == media.take(24).toSeq)
    // id 2 (null payload): no frames; id 3 (2 bytes < frames): flen=1, 2 frames
    assert(!all.exists(_._1 == 2L))
    assert(all.filter(_._1 == 3L).map(t => (t._2, t._3.toSeq)).sortBy(_._1).toSeq
      == Seq((0, Seq(9.toByte)), (1, Seq(8.toByte))))
    // stride=2 keeps exactly the even frame indexes
    val strided = Multimodal.sampleFrames(df, frames = 4, stride = 2)
      .filter(col("id") === 1L).select(col("frame_idx"))
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(strided == Seq(0, 2))
  }

  test("chunkMedia: hop<window overlaps, short tail, empty/null yield no rows") {
    import spark.implicits._
    val media = (0 until 10).map(_.toByte).toArray
    val df = Seq((1L, media), (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.emptyByteArray)).toDF("id", "media")
    val got = Multimodal.chunkMedia(df, window = 4, hop = 3)
      .select(col("id"), col("chunk_idx"), col("chunk")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    // starts 0,3,6,9 while < 10; windows clipped at the end
    assert(got.filter(_._1 == 1L).sortBy(_._2).toSeq == Seq(
      (1L, 0, Seq[Byte](0, 1, 2, 3)), (1L, 1, Seq[Byte](3, 4, 5, 6)),
      (1L, 2, Seq[Byte](6, 7, 8, 9)), (1L, 3, Seq[Byte](9))))
    assert(!got.exists(t => t._1 == 2L || t._1 == 3L))
  }

  test("AVI decode: real RIFF walk — DIB round-trips the grey stream exactly, malformed falls back") {
    import graft.operators.Multimodal.MediaCodec
    val w = 16; val h = 12
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(p => ((f * 192 + p * 7) % 256).toByte))
    val avi = MediaCodec.aviDib24(frames, w, h)
    assert(MediaCodec.isAvi(avi) && !MediaCodec.isWav(avi) && !MediaCodec.isImage(avi))
    // the container walk + BGR(g,g,g) luma decode must return the input
    // stream byte-for-byte, frames concatenated top-down row-major
    assert(MediaCodec.decode(avi).toSeq == frames.flatten.toSeq)
    // truncated container (headers intact, movi cut) -> graceful
    // identity fallback, never a throw
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - 100)
    assert(MediaCodec.decode(cut).toSeq == cut.toSeq)
    // a RIFF that is not an AVI is untouched
    val notAvi = "RIFFxxxxWAVE".getBytes("US-ASCII")
    assert(!MediaCodec.isAvi(notAvi))
  }

  test("AVI MJPEG: JDK JPEG frames decode to per-frame pixels; re-encoded twin pairs, unrelated does not") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.MediaCodec
    val w = 32; val h = 24
    // smooth gradient frames (JPEG-friendly: low-frequency content
    // survives the lossy round-trip with small per-pixel error)
    def clip(f: Int, shift: Int) = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      ((x * 4 + y * 3 + f * 5 + shift) / 2 + 20).toByte // smooth ramp, max < 256
    }
    val a = MediaCodec.aviMjpeg((0 until 3).map(clip(_, 0)), w, h)
    val b = MediaCodec.aviMjpeg((0 until 3).map(clip(_, 1)), w, h) // near-dup
    val c = MediaCodec.aviMjpeg((0 until 3).map(f =>
      Array.tabulate(w * h)(p => (((p * 37 + f * 11) % 251)).toByte)), w, h)
    val da = MediaCodec.decode(a)
    assert(da.length == 3 * w * h, "MJPEG frames must decode via ImageIO to w*h grey pixels each")
    // lossy but close: decoded pixels stay near the source gradient
    val src = (0 until 3).flatMap(clip(_, 0))
    val maxErr = da.zip(src).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max
    assert(maxErr <= 24, s"JPEG round-trip drifted too far (maxErr=$maxErr)")
    import spark.implicits._
    // aHash for the pairing contract: the ±1-pixel JPEG drift flips zero
    // segment-mean bits (measured), while the ramp fixture's near-median
    // DCT coefficients make pHash sign bits fixture-sensitive
    val df = Seq((0L, a), (1L, b), (2L, c)).toDF("id", "media")
    val pairs = Multimodal.mediaAHashPairs(df, col("id"), col("media"),
        maxHam = 3, blocks = 4)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "re-encoded near-dup clip must pair")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated clip must not pair")
  }
}
