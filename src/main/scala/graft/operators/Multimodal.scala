package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}

/**
 * Multimodal-column plumbing for training-data pipelines: media payloads as
 * opaque `binary` columns with typed metadata, plus decode / feature-extract
 * / resize / frame-sample operators.
 *
 * The image/audio codecs are NOT in this container, so the byte-level decode
 * is a clearly-marked DETERMINISTIC STUB ([[MediaCodec]]) — what is real and
 * load-bearing is the Spark-side shape: binary columns survive parquet
 * round-trips, metadata lives in ordinary prunable columns, per-partition
 * batch processing goes through `mapPartitions` with an explicit output
 * schema (the Scala analogue of an Arrow-batched pandas UDF), and the
 * operators compose with the rest of the engine (dedup on frame hashes,
 * partitioning on metadata).
 */
object Multimodal {

  /**
   * STUB CODEC — deterministic fake in place of real image/audio decoding.
   * `decode` would be the libjpeg/ffmpeg call in production; here it derives
   * pixels from the byte stream itself so every derived value is exactly
   * reproducible by an external oracle.
   */
  object MediaCodec {
    /** "Decode" = identity over the payload bytes. Real impl: ??? (jpeg/png
      * decode). Deterministic fake: the payload bytes are the pixels. */
    def decode(media: Array[Byte]): Array[Byte] = media

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
    df.withColumn("media",
        repeat(md5(textCol.cast("binary")), (nCharsCol % 4 + 2).cast("int")).cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (idCol % 3 + 1).cast("int")))
      .withColumn("media_len", length(col("media")).cast("long"))
      .withColumn("width", (nCharsCol % 64 + 16).cast("int"))
      .withColumn("height", (idCol * 7 % 48 + 16).cast("int"))

  /**
   * Per-partition feature extraction over the binary column — the batched
   * processing shape (one decode context per partition, row-streamed).
   * Output: input columns + byte_sum + frame0_md5 (first-frame content
   * hash; frames = `frames` equal byte slices).
   */
  def extractFeatures(df: DataFrame, frames: Int): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("byte_sum", LongType, nullable = false),
      StructField("frame0_md5", StringType, nullable = false)))
    val mediaIdx = df.schema.fieldIndex("media")
    df.mapPartitions { it =>
      // per-partition init (real codecs would open a decode context here)
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val media = MediaCodec.decode(r.getAs[Array[Byte]](mediaIdx))
        val frameLen = math.max(media.length / frames, 1)
        val frame0 = java.util.Arrays.copyOfRange(media, 0, math.min(frameLen, media.length))
        digest.reset()
        val hex = digest.digest(frame0).map("%02x".format(_)).mkString
        Row.fromSeq(r.toSeq :+ MediaCodec.byteSum(media) :+ hex)
      }
    }(Encoders.row(schema))
  }

  /** Resize/subsample the media payload in place (stride bytes). */
  def resizeMedia(df: DataFrame, stride: Int): DataFrame = {
    val schema = df.schema
    val mediaIdx = schema.fieldIndex("media")
    df.mapPartitions { it =>
      it.map { r =>
        val out = r.toSeq.updated(mediaIdx,
          MediaCodec.resize(r.getAs[Array[Byte]](mediaIdx), stride))
        Row.fromSeq(out)
      }
    }(Encoders.row(schema))
  }
}
