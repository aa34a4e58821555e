package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Tiny driver-side sidecar payloads (store metadata, serialized sketches)
 * written as SINGLE files through the Hadoop FileSystem API — not through
 * `spark.read`/`spark.write`. Payloads here are O(bytes..MB) scalars the
 * driver needs before planning a query; going through a Spark job for them
 * costs a job per read and (for underscore-prefixed sidecar names) trips
 * the hidden-path filter into spurious "All paths were ignored" warnings.
 * The FS API is the same abstraction Spark itself uses, so the sidecars
 * live wherever the store lives (local disk, HDFS, object store).
 */
object Sidecar {

  def writeBytes(spark: SparkSession, path: String, bytes: Array[Byte]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overwrite semantics incl. replacing a directory left by an older
    // store layout (fs.create(_, true) only overwrites FILES)
    if (fs.exists(p)) fs.delete(p, true)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  def readBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.getFileStatus(p).isDirectory)
      throw new IllegalStateException(
        s"sidecar $path is a DIRECTORY — this store was written by an older " +
        "engine version (Spark-job sidecars); rebuild the store with the " +
        "current version")
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  def writeText(spark: SparkSession, path: String, value: String): Unit =
    writeBytes(spark, path, value.getBytes("UTF-8"))

  /** Does the sidecar file exist? Lets callers distinguish a genuine miss
    * (cacheable: this path is not a store) from a transient read failure. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def readText(spark: SparkSession, path: String): String =
    new String(readBytes(spark, path), "UTF-8")

  // ---- store completion markers ----
  // Shared by every persisted store (span store, index store, IVF store):
  // a rebuild deletes the marker FIRST so a crash mid-rewrite leaves no
  // _SUCCESS over a half-rewritten layout, and writes it back LAST.

  /** Delete `<path>/_SUCCESS` if present — call before rewriting a store. */
  def invalidateMarker(spark: SparkSession, path: String): Unit = {
    val m = new Path(path, "_SUCCESS")
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(m)) fs.delete(m, false)
  }

  /** Touch `<path>/_SUCCESS` — call after all store parts are written. */
  def markComplete(spark: SparkSession, path: String): Unit = {
    val m = new Path(path, "_SUCCESS")
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(m, true).close()
  }
}
