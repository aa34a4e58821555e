package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static kernel for text-dedup hashing: MinHash signatures, LSH band buckets,
 * SimHash, hyperplane buckets for cosine LSH. All methods are static so
 * whole-stage codegen can call them directly (same pattern as [[GeoOps]]).
 *
 * Hashing is Spark's own XXH64 (the engine behind the built-in `xxhash64`),
 * so signatures are deterministic across JVMs/partitions without any extra
 * dependency. These hashes never need a SQL oracle: LSH output is always
 * refined against the exact Jaccard/cosine predicate, which *is*
 * SQL-expressible.
 */
object TextOps {

  final val SEED = 42L

  /** Hoisted separator — UTF8String is immutable, safe to share; building
    * it per row on the hot shingle path was pure allocation overhead. */
  private val SPACE = UTF8String.fromString(" ")

  def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)

  /**
   * Distinct word n-gram shingles of a single-space-tokenized text, returned
   * SORTED in UTF8 binary order (the contract [[sortedIntersectCount]]
   * relies on). ~50× faster than the equivalent
   * transform/slice/concat_ws/array_distinct built-in chain: one pass to
   * split, one StringBuilder-free join per shingle, one sort.
   */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.split(SPACE, -1)
    val count = words.length - (n - 1)
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]()
    val window = new Array[UTF8String](n) // reused; concatWs copies bytes out
    var i = 0
    while (i < count) {
      var w = 0
      while (w < n) { window(w) = words(i + w); w += 1 }
      set.add(UTF8String.concatWs(SPACE, window: _*))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /**
   * One-pass corpus-repetition statistics over a single-space-tokenized
   * text: `[n_tokens, distinct 2-grams, distinct 3-grams, max token
   * frequency]` as array<long>. Pure counting — the rational e6-scaled
   * scores stay in SQL so the external oracle reproduces them
   * bit-for-bit (see `TextAnalysis.withRepetition`). Consolidates what
   * was two shingle-set builds plus an interpreted sort-scan aggregate
   * into one tokenize + three hash passes.
   */
  def repetitionStats(text: UTF8String): ArrayData = {
    val words = text.split(SPACE, -1)
    val n = words.length
    val freq = new java.util.HashMap[UTF8String, Integer]()
    var top = 0
    var i = 0
    while (i < n) {
      val c = freq.merge(words(i), Integer.valueOf(1),
        (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue))
      if (c.intValue > top) top = c.intValue
      i += 1
    }
    def distinctGrams(g: Int): Int = {
      val cnt = n - (g - 1)
      if (cnt <= 0) return 0
      val set = new java.util.HashSet[UTF8String]()
      val window = new Array[UTF8String](g)
      var i = 0
      while (i < cnt) {
        var w = 0
        while (w < g) { window(w) = words(i + w); w += 1 }
        set.add(UTF8String.concatWs(SPACE, window: _*))
        i += 1
      }
      set.size
    }
    new GenericArrayData(Array[Any](n.toLong, distinctGrams(2).toLong,
      distinctGrams(3).toLong, top.toLong))
  }

  /**
   * The winnowing fingerprint kernel: minimum of
   * `H(i) = Σ_{j=0..4} cp(text[i+j]) · 257^(4-j)` over all character
   * 5-grams, where `cp` is the Unicode code point (so an external SQL
   * engine's `ascii()` of a 1-char substring reproduces it — see
   * `TextAnalysis.withFingerprints` for the full contract). No modulus:
   * 5 · 0x10FFFF · 257⁴ < 2⁶³, arithmetic is exact. Texts shorter than 5
   * chars Horner-hash the whole text (`acc·257 + cp`); empty → 0.
   *
   * One rolling pass over code points, codegen-called — the built-in
   * split/transform/aggregate formulation of the same formula costs
   * ~15 interpreted expression evals per character.
   */
  def rollingMinFp(text: UTF8String): Long = {
    val s = text.toString
    val len = s.length
    if (len == 0) return 0L
    var best = Long.MaxValue
    // rolling window of the last 4 code points; -1 = not yet filled
    var a = -1L; var b = -1L; var c = -1L; var d = -1L
    var horner = 0L
    var cpCount = 0
    var i = 0
    while (i < len) {
      val cp = s.codePointAt(i)
      val cur = cp.toLong
      if (a >= 0L) {
        val h = a * 4362470401L + b * 16974593L + c * 66049L + d * 257L + cur
        if (h < best) best = h
      }
      a = b; b = c; c = d; d = cur
      horner = horner * 257L + cur
      cpCount += 1
      i += Character.charCount(cp)
    }
    if (cpCount < 5) horner else best
  }

  /**
   * Unicode NFC (canonical composition) via `java.text.Normalizer`. The
   * `isNormalized` fast path returns the INPUT UTF8String untouched — for
   * ASCII (always NFC by definition) this is one linear scan with zero
   * allocation, so the common corpus pays nothing for the guarantee.
   */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** |A ∩ B| of two sorted-distinct UTF8String arrays — merge walk, no
    * allocation; exact (string equality, no hashing). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /**
   * MinHash signature of a set of string shingles: sig(h) = min over shingles
   * of XXH64(XXH64(shingle), seed=h). One base hash per shingle, then k cheap
   * long-mixes — O(|shingles| * k) with no allocation beyond the output.
   * Empty input yields an EMPTY signature (and [[bandBuckets]] of an empty
   * signature yields no buckets): an empty shingle set has no defined
   * MinHash, and any constant placeholder signature would put every
   * short/empty document into the same LSH bucket — a quadratic candidate
   * blowup on dirty corpora.
   */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val sig = Array.fill[Long](k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val base = hashUtf8(shingles.getUTF8String(j), SEED)
      var h = 0
      while (h < k) {
        val v = XXH64.hashLong(base, h.toLong)
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Collapse a MinHash signature into `nBands` band-bucket hashes
    * (bucket b = XXH64-fold of rows b*r .. b*r+r-1, r = k / nBands).
    * An empty signature (empty shingle set) yields no buckets. The
    * signature length must divide evenly into bands — r = 0 would emit
    * content-independent constant buckets and a leftover k % nBands would
    * silently ignore trailing rows, so both fail loudly instead. */
  def bandBuckets(sig: ArrayData, nBands: Int): ArrayData = {
    val k = sig.numElements()
    if (k == 0) return new GenericArrayData(Array.emptyLongArray)
    if (nBands < 1 || k % nBands != 0)
      throw new IllegalArgumentException(
        s"band_buckets: signature length $k must be a positive multiple of nBands ($nBands)")
    val r = k / nBands
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var acc = b.toLong // distinct bands never collide across b
      var i = b * r
      val end = i + r
      while (i < end) { acc = XXH64.hashLong(sig.getLong(i), acc); i += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /**
   * 64-bit SimHash over a token multiset: per bit, sum +1/-1 votes from each
   * token occurrence's hash; bit set iff the sum is positive. Repeated tokens
   * vote repeatedly — the standard frequency weighting.
   */
  def simhash64(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val h = hashUtf8(tokens.getUTF8String(j), SEED)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Per-JVM cache of derived plane matrices keyed by (tables, planes,
    * dim): the components are a pure function of the indices, so deriving
    * them per ROW (tables·planes·dim XXH64 calls each) was pure overhead.
    * One entry per distinct LSH configuration in the session — bounded. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  private def planeMatrix(tables: Int, planes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent((tables, planes, dim), { _ =>
      val m = new Array[Double](tables * planes * dim)
      var t = 0
      var idx = 0
      while (t < tables) {
        var p = 0
        while (p < planes) {
          var d = 0
          while (d < dim) {
            val h = XXH64.hashLong((t.toLong << 40) | (p.toLong << 20) | d.toLong, SEED)
            // map 64-bit hash to [-1, 1)
            m(idx) = h.toDouble / 9.223372036854776e18
            d += 1; idx += 1
          }
          p += 1
        }
        t += 1
      }
      m
    })

  /**
   * Random-hyperplane LSH buckets for cosine similarity: `tables` buckets,
   * each the sign pattern of `planes` pseudo-random hyperplane dot products.
   * Plane component (t, p, dim i) is derived from XXH64 — deterministic, no
   * stored model (cached per JVM, see [[planeMatrix]]). Uniform in [-1, 1):
   * good enough for LSH.
   */
  def hyperplaneBuckets(vec: ArrayData, tables: Int, planes: Int): ArrayData = {
    // bit-packing bounds: table id occupies bits 56-63 of the bucket (so
    // tables <= 255 keeps namespaces disjoint after the 56-bit mask),
    // sign bits must fit below it (planes <= 56), and the plane-derivation
    // key packs (t << 40 | p << 20 | d) — 20 bits per index
    if (tables < 1 || tables > 255 || planes < 1 || planes > 56)
      throw new IllegalArgumentException(
        s"hyperplane_buckets: need 1 <= tables <= 255 (got $tables) and 1 <= planes <= 56 (got $planes)")
    val dim = vec.numElements()
    if (dim >= (1 << 20))
      throw new IllegalArgumentException(
        s"hyperplane_buckets: vector dimension $dim exceeds the 2^20 derivation bound")
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = vec.getFloat(i).toDouble; i += 1 }
    val m = planeMatrix(tables, planes, dim)
    val out = new Array[Long](tables)
    var t = 0
    var idx = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var dot = 0.0
        var d = 0
        while (d < dim) {
          dot += v(d) * m(idx)
          d += 1; idx += 1
        }
        if (dot >= 0) bucket |= (1L << p)
        p += 1
      }
      // namespace buckets by table index so cross-table buckets never join
      out(t) = (t.toLong << 56) ^ (bucket & 0x00ffffffffffffffL)
      t += 1
    }
    new GenericArrayData(out)
  }
}
