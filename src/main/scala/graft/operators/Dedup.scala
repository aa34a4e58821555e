package graft.operators

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Deduplication operators for training-data pipelines. Four families:
 *
 *  - exact: hash-groupBy on a content fingerprint — one shuffle, keep min id.
 *  - n-gram Jaccard (exact): inverted-index self-join on shingles — the
 *    scalable exact algorithm (shuffle on shingle, then on pair); no O(n²).
 *  - MinHash+LSH: banded signatures prune the candidate space, then the same
 *    exact Jaccard refine — output identical to the exact operator whenever
 *    LSH recall covers the threshold (choose bands/rows accordingly).
 *  - SimHash: 64-bit sketch, pigeonhole block join for hamming ≤ maxHam.
 *  - embedding cosine: exact all-pairs (for oracle-verifiable output) and a
 *    random-hyperplane LSH variant for the 100TB path.
 *
 * All pair outputs use (id_a < id_b) canonical ordering. Jaccard thresholds
 * are rational p/q compared by integer cross-multiplication — no floating
 * point in the predicate, so external oracles match exactly.
 */
object Dedup {

  /** Exact dedup: group by md5(text), keep the smallest id per group.
    * Output: (keep_id, dup_count) one row per distinct content. */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol.cast("binary")).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_count"))

  /** (id, shingles, n_shingles) prep used by the Jaccard family. */
  private def shingled(df: DataFrame, idCol: Column, textCol: Column, n: Int): DataFrame =
    df.select(idCol.as("__id"), TextAnalysis.shingles(textCol, n).as("__sh"))
      .withColumn("__sz", size(col("__sh")))
      .filter(col("__sz") > 0)

  /**
   * Exact Jaccard refine over candidate pairs: join shingle sets back,
   * |A ∩ B| via array_intersect (sets — shingles are distinct), keep pairs
   * with jaccard >= p/q ⇔ i*q >= p*(|A|+|B|-i).
   */
  private def refineJaccard(cands: DataFrame, sh: DataFrame,
                            p: Int, q: Int): DataFrame = {
    val a = sh.select(col("__id").as("id_a"), col("__sh").as("__sh_a"), col("__sz").as("__sz_a"))
    val b = sh.select(col("__id").as("id_b"), col("__sh").as("__sh_b"), col("__sz").as("__sz_b"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("__i", size(array_intersect(col("__sh_a"), col("__sh_b"))))
      .filter(col("__i") * q >= (col("__sz_a") + col("__sz_b") - col("__i")) * p)
      .select(col("id_a"), col("id_b"))
  }

  /**
   * Exact n-gram Jaccard near-dup pairs via inverted index: explode shingles,
   * self-join on the shingle, count co-occurrences (= |A ∩ B|, shingles are
   * distinct per doc), then the integer threshold test. Scales as
   * O(sum over shingles of df(shingle)²) — the standard PPJoin-family
   * baseline; hot shingles can be pruned by df-frequency if needed.
   */
  def ngramJaccardPairs(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 3, p: Int = 4, q: Int = 5): DataFrame = {
    val sh = shingled(df, idCol, textCol, n).cache()
    val inv = sh.select(col("__id"), explode(col("__sh")).as("__s"))
    val pairs = inv.as("l").join(inv.as("r"),
        col("l.__s") === col("r.__s") && col("l.__id") < col("r.__id"))
      .groupBy(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .agg(count(lit(1)).as("__i"))
    val sizes = sh.select(col("__id"), col("__sz"))
    pairs
      .join(sizes.withColumnsRenamed(Map("__id" -> "id_a", "__sz" -> "__sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("__id" -> "id_b", "__sz" -> "__sz_b")), "id_b")
      .filter(col("__i") * q >= (col("__sz_a") + col("__sz_b") - col("__i")) * p)
      .select(col("id_a"), col("id_b"))
  }

  /**
   * MinHash + banded LSH near-dup pairs. numHashes/bands give rows-per-band
   * r = numHashes/bands; candidate probability at similarity s is
   * 1-(1-s^r)^bands (128/32 ⇒ ~1-1e-15 at s=0.9). Candidates are refined
   * with the exact Jaccard test, so false positives never escape; output
   * differs from [[ngramJaccardPairs]] only by missed-band misses.
   */
  def minhashLshPairs(df: DataFrame, idCol: Column, textCol: Column,
                      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                      p: Int = 4, q: Int = 5): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val sh = shingled(df, idCol, textCol, n).cache()
    val banded = sh.select(col("__id"),
        posexplode(stf.band_buckets(stf.minhash_sig(col("__sh"), numHashes), bands)))
      .toDF("__id", "__band", "__bucket")
    val cands = banded.as("l").join(banded.as("r"),
        col("l.__band") === col("r.__band") && col("l.__bucket") === col("r.__bucket") &&
        col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
    refineJaccard(cands, sh, p, q)
  }

  /**
   * SimHash near-dup pairs: hamming(simhash64(tokens)) <= maxHam. Pigeonhole
   * banding: split 64 bits into `blocks` equal blocks; any pair within
   * hamming <= blocks-1 matches on at least one block — an *exact* candidate
   * generator for maxHam <= blocks-1 (default 4 blocks ⇒ exact for ham<=3).
   */
  def simhashPairs(df: DataFrame, idCol: Column, textCol: Column,
                   maxHam: Int = 3, blocks: Int = 4): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    require(64 % blocks == 0, "blocks must divide 64")
    val w = 64 / blocks
    val sims = df.select(idCol.as("__id"),
      stf.simhash64(TextAnalysis.tokens(textCol)).as("__sim"))
    val banded = sims.select(col("__id"), col("__sim"),
        posexplode(array((0 until blocks).map(b =>
          shiftrightunsigned(col("__sim"), b * w).bitwiseAND(lit((1L << w) - 1))): _*)))
      .toDF("__id", "__sim", "__blk", "__val")
    banded.as("l").join(banded.as("r"),
        col("l.__blk") === col("r.__blk") && col("l.__val") === col("r.__val") &&
        col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        col("l.__sim").as("__sa"), col("r.__sim").as("__sb"))
      .distinct()
      .filter(stf.hamming(col("__sa"), col("__sb")) <= maxHam)
      .select(col("id_a"), col("id_b"))
  }

  /** Sequential-fold double cosine similarity of two float vectors — the
    * exact expression an external SQL oracle can mirror term-for-term. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /**
   * Exact embedding near-dup pairs: all pairs with cosine >= threshold.
   * O(n²) compare (broadcast-nested-loop); right for corpora small enough to
   * verify exactly — use [[cosinePairsLsh]] as the large-scale path.
   */
  def cosinePairsExact(df: DataFrame, idCol: Column, vecCol: Column,
                       threshold: Double): DataFrame = {
    val v = df.select(idCol.as("__id"), vecCol.as("__vec"))
    v.as("l").join(v.as("r"), col("l.__id") < col("r.__id"))
      .filter(cosine(col("l.__vec"), col("r.__vec")) >= threshold)
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
  }

  /**
   * Random-hyperplane LSH cosine near-dup pairs: candidates collide in at
   * least one of `tables` sign-pattern buckets, then exact-cosine refine.
   * Recall at cosine c is 1-(1-(1-acos(c)/π)^planes)^tables.
   */
  def cosinePairsLsh(df: DataFrame, idCol: Column, vecCol: Column,
                     threshold: Double, tables: Int = 8, planes: Int = 8): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    val v = df.select(idCol.as("__id"), vecCol.as("__vec"))
    val banded = v.select(col("__id"), col("__vec"),
        explode(stf.hyperplane_buckets(col("__vec"), tables, planes)).as("__bucket"))
    banded.as("l").join(banded.as("r"),
        col("l.__bucket") === col("r.__bucket") && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        col("l.__vec").as("__va"), col("r.__vec").as("__vb"))
      .distinct()
      .filter(cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }
}
