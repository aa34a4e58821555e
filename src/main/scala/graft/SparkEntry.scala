package graft

import graft.functions.stf
import graft.operators._
import graft.sources.{CellStore, IndexStore}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q6_spatial_join")(spark, "/root/testdata/sf0.001")

  // time window for the temporal filter: [2024-01-10, 2024-01-20] in epoch micros
  private val T1 = 1704844800000000L
  private val T2 = 1705708800000000L

  // q81 retrieval query — mid-frequency corpus terms; ONE definition feeds
  // both the Spark plan and the generated oracle SQL
  private val Bm25Terms = Seq("spark", "hash", "join")

  /** q194's phrase — a self-overlapping bigram ("batch batch batch"
    * counts twice) that exercises the position-intersection math. */
  private val PhraseQuery = Seq("batch", "batch")

  /** q198's query batch: overlapping term sets (both share "join") so the
    * one-pass union genuinely multiplexes postings across queries. */
  private val BatchQueries: Seq[Seq[String]] =
    Seq(Seq("spark", "hash"), Seq("join"), Seq("batch", "stream", "join"))

  /** q191's blocklist: multi-word, word-crossing ("an jo" inside
    * "scan join"), substring ("ta" inside data/table), and repeated-token
    * phrases — the shapes that exercise Aho-Corasick fail links. */
  private val BlockPhrases =
    Seq("spark", "scan", "an jo", "batch batch", "ta", "merge data r")

  /** q226/q227 WAV fixture: a REAL PCM16LE mono RIFF container around
    * deterministic pseudo-noise. Doc d carries n = 400 + ((d/2)%5)·100
    * samples s(i) = ((d/2)·7919 + i·104729 + (d%2)·3) mod 65536 − 32768,
    * so twins (2j, 2j+1) share a signal up to a +3 offset and decoded
    * frame bytes are the SQL-replayable ((d/2)·7919 + i·104729 +
    * (d%2)·3) mod 65536 div 256. */
  private val wavNoise = udf((d: Long) => {
    val n = (400 + ((d / 2) % 5) * 100).toInt
    val base = (d / 2) * 7919L
    val off = (d % 2) * 3L
    Multimodal.MediaCodec.wavPcm16(Array.tabulate(n)(i =>
      (Math.floorMod(base + i.toLong * 104729L + off, 65536L) - 32768L).toShort))
  })

  /** Shared q226/q227 oracle prelude: per-doc sample count and formula
    * parameters (the SQL twin of [[wavNoise]]'s arithmetic). */
  private val wavParSql: String =
    "WITH par AS (SELECT doc_id, 400 + ((doc_id//2) % 5) * 100 AS n, " +
    "(doc_id//2)*7919 AS base, (doc_id%2)*3 AS off " +
    "FROM documents WHERE doc_id < 40),\n"

  /** q236/q237 AVI fixture: a REAL RIFF/AVI container (24-bit BI_RGB
    * 'DIB ' frames) around deterministic pseudo-noise. Doc d carries
    * f = 3 + (d/2)%3 frames of 16×12 grey pixels; the decoded stream
    * value at global index i (frame-major, top-down row-major) is
    * v(i) = (((d/2)·7919 + i·104729 + (d%2)·3) mod 65536) div 256 —
    * the SAME top-byte pseudo-noise as the WAV fixture, so twins
    * (2j, 2j+1) differ in ~1% of pixels (the +3 rarely crosses a 256
    * boundary) and pair under both hash tiers; the container walk +
    * DIB luma decode return exactly v (grey g encodes as BGR (g,g,g),
    * whose Rec.601 luma is g). */
  private val aviNoise = udf((d: Long) => {
    val nf = (3 + (d / 2) % 3).toInt
    val base = (d / 2) * 7919L
    val off = (d % 2) * 3L
    val frames = (0 until nf).map { fi =>
      Array.tabulate(16 * 12) { p =>
        (Math.floorMod(base + (fi * 192 + p).toLong * 104729L + off, 65536L) / 256L).toByte
      }
    }
    Multimodal.MediaCodec.aviDib24(frames, 16, 12)
  })

  /** Shared q236/q237 oracle prelude: per-doc decoded-stream length and
    * formula parameters (the SQL twin of [[aviNoise]]'s arithmetic). */
  private val aviParSql: String =
    "WITH par AS (SELECT doc_id, (3 + (doc_id//2) % 3) * 192 AS n, " +
    "(doc_id//2)*7919 AS base, (doc_id%2)*3 AS off " +
    "FROM documents WHERE doc_id < 40),\n"

  // q129/q131 HLL oracle fragments: the register replay (md5 -> 16-bit
  // bucket field mod 2^10, 48-bit rho field -> per-bucket max) and the
  // exact-integer estimator at p=10 — same constants as
  // Sketches.hllRegisters/hllEstimate (alpha carried as the rational
  // 7213000·m / (10000·(1000m+1079)), sum scaled by 2^49)
  private val hllRegisterSql: String =
    "SELECT source, b, max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS rho " +
    "FROM (SELECT source, ('0x' || substr(h,1,4))::BIGINT % 1024 AS b, " +
    "('0x' || substr(h,5,12))::BIGINT AS w " +
    "FROM (SELECT source, md5(text || ':hll') AS h FROM documents)) GROUP BY source, b"

  // q163/q164 HDR-histogram counts CTE: e6-quantized event values ->
  // log-bucket ids (exact bin-length arithmetic, identical to
  // Sketches.hdrBucket) -> per (event_type, bucket) counts
  private val histCountsSql: String =
    "q AS (SELECT grp, CAST(CASE WHEN v < 64 THEN v " +
    "ELSE 64 + (length(bin(v))-7)*32 + ((v >> (length(bin(v))-6)) & 31) END AS BIGINT) AS bucket, " +
    "CAST(count(*) AS BIGINT) AS cnt " +
    "FROM (SELECT event_type AS grp, CAST(round(value*1000000) AS BIGINT) AS v FROM events) " +
    "GROUP BY 1, 2)"
  /** Raw-HLL estimate from the register mass held in column `massCol`.
    * The divisor column is a parameter so callers whose scope defines
    * another `n` (e.g. the q145 profiler's row count) can point at an
    * unambiguous name instead of relying on DuckDB's table-before-alias
    * resolution order. */
  private def hllEstimateSql(massCol: String = "n"): String = {
    val num = BigInt(1000000) * 7213000 * BigInt(1024).pow(3) * (BigInt(1) << 49)
    val d1 = 10000L * (1000L * 1024 + 1079)
    s"CAST(($num::HUGEINT) // ($d1::HUGEINT * $massCol) AS BIGINT)"
  }

  /** One q145 profiler row: the q129 register replay applied to an
    * arbitrary `events` column (cast to VARCHAR exactly like the Spark
    * side), plus row/null counts and typed-then-rendered min/max. */
  private def hllProfileColSql(c: String): String =
    s"(WITH v AS (SELECT $c AS x FROM events), " +
    "r AS (SELECT b, max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS rho " +
    "FROM (SELECT ('0x' || substr(h,1,4))::BIGINT % 1024 AS b, " +
    "('0x' || substr(h,5,12))::BIGINT AS w " +
    "FROM (SELECT md5(x::VARCHAR || ':hll') AS h FROM v WHERE x IS NOT NULL)) GROUP BY b), " +
    "a AS (SELECT count(*) AS n_registers, CAST(sum(rho) AS BIGINT) AS sum_rho, " +
    "CAST(sum((1::BIGINT) << (49 - rho)) AS HUGEINT) + " +
    "(1024 - count(*)) * ((1::BIGINT) << 49)::HUGEINT AS reg_mass FROM r) " +
    s"SELECT '$c' AS \"column\", (SELECT count(*) FROM v) AS n, " +
    "(SELECT count(*) FROM v WHERE x IS NULL) AS n_null, " +
    s"n_registers, sum_rho, ${hllEstimateSql("reg_mass")} AS est_raw_e6, " +
    "(SELECT min(x)::VARCHAR FROM v) AS min_v, " +
    "(SELECT max(x)::VARCHAR FROM v) AS max_v FROM a)"

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Generic relational baseline (Spark built-ins; SURVEY §2.5 note).
    // Sums cast to BIGINT: quantities are integral doubles, so the sum is
    // order-independent and the hash-compare is FP-safe.
    "q1_agg" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("revenue_cents"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // σ st_containedby(point, polygon) — SURVEY §2.2 `rdd.containedby`.
    "q2_filter_containedby" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      SpatialOps.containedBy(c, col("c_geo"),
          stf.st_geomfromwkt("POLYGON ((100 100, 600 100, 600 700, 100 700, 100 100))"))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // σ st_intersects with BOTH space and time — SURVEY §2.2 semantics.
    "q3_filter_intersects_time" -> ((s, dir) => {
      val e = Tables.eventPts(s, dir)
      val qry = stf.st_with_time(
        stf.st_geomfromwkt("POLYGON ((0 0, 250 0, 250 250, 0 250, 0 0))"),
        lit(T1), lit(T2))
      SpatialOps.intersects(e, col("e_geo"), qry)
        .select(col("event_id")).orderBy(col("event_id"))
    }),

    // within-distance join — SURVEY §2.2 withinDistance as a join.
    "q4_distance_join" -> ((s, dir) => {
      val sup = Tables.supplierPts(s, dir)
      val cus = Tables.customerPts(s, dir)
      SpatialJoin.distanceJoin(sup, cus, col("s_geo"), col("c_geo"),
          maxDist = 50.5, cellSize = 100.0)
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // global kNN — SURVEY §2.5 kNN family (one query covers kNN/knnTake/knnAgg).
    "q5_knn" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      KNN.knn(c, col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), 20,
          tieBreak = Seq(col("c_custkey")))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // cell-replicate spatial join — SURVEY §2.3 `join(other, CONTAINS)`.
    "q6_spatial_join" -> ((s, dir) => {
      val n = Tables.nationRects(s, dir)
      val c = Tables.customerPts(s, dir)
      SpatialJoin.join(n, c, col("n_geo"), col("c_geo"),
          JoinPredicate.Contains, cellSize = 100.0)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // kNN join (global k, deterministic ties) — SURVEY §2.3 knnJoin.
    "q7_knn_join" -> ((s, dir) => {
      val sup = Tables.supplierPts(s, dir)
      val cus = Tables.customerPts(s, dir).select("c_custkey", "c_geo")
      KNN.knnJoin(sup, cus, "s_geo", "c_geo", leftId = "s_suppkey", k = 5, tieBreak = "c_custkey")
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // 2-d skyline — SURVEY §2.5 skyline family.
    "q8_skyline" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      Skyline.skyline(c, "cx", "cy")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // ---- training-data pipeline operators (documents / embeddings) ----

    // token counting (whitespace) + type-token ratio.
    "q9_token_stats" -> ((s, dir) => {
      TextAnalysis.withTokenStats(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_tokens"), col("n_uniq_tokens"), col("ttr_e6"))
        .orderBy(col("doc_id"))
    }),

    // quality scoring: type-token ratio + stopword ratio, exact integers.
    "q10_quality" -> ((s, dir) => {
      TextAnalysis.withQuality(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_tokens"), col("n_stopwords"), col("quality_e6"))
        .orderBy(col("doc_id"))
    }),

    // language-ID by marker-word argmax.
    "q11_langid" -> ((s, dir) => {
      TextAnalysis.withLangId(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("lang_pred")).orderBy(col("doc_id"))
    }),

    // document fingerprinting: exact md5 + winnowed char-5-gram sketch.
    "q12_fingerprint" -> ((s, dir) => {
      TextAnalysis.withFingerprints(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("fp_md5"), col("fp_winnow")).orderBy(col("doc_id"))
    }),

    // exact dedup: hash-groupBy on content, keep min doc_id.
    "q13_dedup_exact" -> ((s, dir) => {
      Dedup.exact(Tables.load(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("keep_id"))
    }),

    // exact n-gram Jaccard near-dup pairs (inverted-index join), J >= 0.8.
    "q14_dedup_ngram" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, p = 4, q = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // MinHash+LSH near-dup pairs, exact-Jaccard refined — same output
    // contract as q14 (recall ~1-1e-15 at J=0.9 with 128 hashes / 32 bands).
    "q15_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashLshPairs(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, numHashes = 128, bands = 32, p = 4, q = 5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // end-to-end near-dedup: LSH pairs closed into duplicate families via
    // distributed connected components, min id survives — the full
    // dropNearDuplicates pipeline under the oracle (LSH recall ~1 at these
    // params, so families equal the exact-Jaccard transitive closure).
    "q59_drop_near_dups" -> ((s, dir) => {
      Dedup.dropNearDuplicates(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), n = 3, numHashes = 128, bands = 32, p = 4, q = 5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // Ingest gate against a frozen MinHash store: train on even doc_ids,
    // admit only the odd docs that are no one's near-duplicate.
    "q102_neardup_gate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("mhstore", dir)(p =>
        Dedup.buildMinhashStore(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p))
      Dedup.dropSeenNearDups(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), path)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // Embedding ingest gate against a frozen cosine-LSH store: train on
    // even vec_ids, admit only the odd vectors that are no stored vector's
    // cosine near-dup. tables=48/planes=3 puts the LSH miss at ~5e-7 for
    // threshold 0.42 (the q33 configuration), so the exact oracle replays.
    "q111_cosine_gate" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val path = storedOnce("clstore", dir)(p =>
        Dedup.buildCosineLshStore(embs.filter(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), p, tables = 48, planes = 3))
      Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), path, threshold = 0.42)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // AUTO-SIZED cosine-LSH gate (planes = 0 ⇒ the measured
    // dev/coslsh_sizing.scala rule becomes the default): store = even
    // vectors, batch = odd vectors (no ≥0.9 neighbor in store — all
    // kept) + perturbed copies of the stored vectors (first component
    // ×1.25 ⇒ cosine ≈ 0.9995 vs their source — all dropped), so the
    // hash pins BOTH false-drop and false-keep against the exact-cosine
    // oracle at a dedup-grade threshold — verdict identity with any
    // exact-recall explicit config, at auto-sized cost.
    "q234_coslsh_auto_gate" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val store = e.filter(col("vec_id") % 2 === 0)
      val path = storedOnce("clauto", dir)(p =>
        Dedup.buildCosineLshStore(store, col("vec_id"), col("embedding"), p,
          tables = 8, planes = 0))
      val perturbed = store.select((col("vec_id") + 100000L).as("vec_id"),
        concat(array((element_at(col("embedding"), 1) * 1.25d).cast("float")),
          slice(col("embedding"), 2, 63)).as("embedding"))
      val batch = e.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id"), col("embedding")).unionByName(perturbed)
      Dedup.dropSeenCosine(batch, col("vec_id"), col("embedding"), path,
          threshold = 0.9)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // Near-dedup keeping the best-quality representative per group
    // (score = n_chars, ties min id) — same closure as q59, different
    // survivor rule.
    "q101_drop_near_dups_best" -> ((s, dir) => {
      Dedup.dropNearDuplicatesKeepBest(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), col("n_chars"),
          n = 3, numHashes = 128, bands = 32, p = 4, q = 5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // SimHash near-dup pairs (hamming <= 3 over 64-bit sketch; pigeonhole-
    // exact candidate generation). Engine-specific hash — no SQL oracle.
    "q16_dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // embedding-cosine near-dup pairs, exact all-pairs, threshold 0.42
    // (nearest data value is 1.7e-3 away — FP-safe vs the oracle).
    "q17_dedup_cosine" -> ((s, dir) => {
      Dedup.cosinePairsExact(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.42)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // embedding-cosine near-dup pairs via random-hyperplane LSH + exact
    // refine, same output contract as q17. planes=3/tables=48 puts the
    // per-pair miss at ~5e-7 for cosine 0.42 (seeded hash => deterministic;
    // LSH==exact asserted at sf0.001/0.01/0.1 in DedupSpec). At this
    // moderate threshold LSH cannot prune (information-theoretic), so the
    // params trade throughput for a checkable result — dedup-grade
    // thresholds (>=0.9) with planes~log2(n) are the genuinely sublinear
    // 100TB configuration of the same operator.
    "q33_dedup_cosine_lsh" -> ((s, dir) => {
      Dedup.cosinePairsLsh(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.42, tables = 48, planes = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // ANN brute-force baseline: top-5 cosine neighbors for queries vec_id<10.
    "q18_ann_topk" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.bruteTopK(e, e.filter(col("vec_id") < 10),
          col("vec_id"), col("vec_id"), col("embedding"), col("embedding"), k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // signed random projection (JL sketch): 64-d embeddings -> 16-d ±1
    // projection, then exact cosine top-5 per query ON THE SKETCH — the
    // compressed-front ANN composition, replayed end-to-end by the oracle.
    "q120_random_projection" -> ((s, dir) => {
      val p = Similarity.randomProject(Tables.load(s, dir, "embeddings"),
        col("embedding"), dim = 64, outDim = 16, salt = "jl1")
      Similarity.bruteTopK(p, p.filter(col("vec_id") < 10),
          col("vec_id"), col("vec_id"), col("proj"), col("proj"), k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // hard-negative mining: for 10 query vectors, the semi-hard band
    // (ranks 3-5) of most-cosine-similar corpus vectors that are NOT
    // positives (positives = same-label rows — a stand-in for qrels).
    "q116_hard_negatives" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val positives = q.select(col("vec_id").as("qid"), col("label").as("ql"))
        .join(e.select(col("vec_id").as("pid"), col("label").as("pl")),
          col("ql") === col("pl"))
        .select(col("qid"), col("pid"))
      Similarity.hardNegatives(e, q, positives,
          col("vec_id"), col("vec_id"), col("embedding"), col("embedding"),
          col("qid"), col("pid"), skip = 2, take = 3)
        .select(col("query_id"), col("neighbor_id"), col("neg_rank").cast("long").as("neg_rank"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // kNN classification head: 50 query vectors labelled by majority vote
    // of their 5 exact nearest neighbors (the embedding-based topic/quality
    // labelling pass of corpus pipelines); deterministic tie-break.
    "q76_knn_classify" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      Similarity.knnClassify(e, e.filter(col("vec_id") < 50),
          col("vec_id"), col("vec_id"), col("embedding"), col("embedding"),
          col("label"), k = 5)
        .orderBy(col("query_id"))
    }),

    // Product-quantization ANN in its lossless degenerate (ksub covers the
    // corpus, zero Lloyd rounds): the ADC tables telescope to exact
    // euclidean distances, so the oracle is plain euclidean top-5 — the
    // same exactness pattern as q51's nprobe = nlist. Compressing configs
    // are spec-covered (DedupSpec recall assertion).
    "q79_ann_pq" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      Similarity.pqTopK(e, e.filter(col("vec_id") < 10), col("vec_id"), col("vec_id"),
          col("embedding"), col("embedding"), k = 5, m = 8, ksub = n, iters = 0,
          sampleN = n)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // The persisted PQ serving tier in the same lossless degenerate:
    // queries run against the stored CODES (vectors never re-read), and the
    // result must still equal exact euclidean top-5.
    "q80_ann_pq_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("pqstore", dir)(p =>
        Similarity.buildPqIndex(e, p, col("vec_id"), col("embedding"),
          m = 8, ksub = n, iters = 0, sampleN = n))
      Similarity.pqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // OPQ-composed PQ store (Ge et al.'s eigenvalue-allocated rotation in
    // front of the quantizer) in the lossless degenerate: the rotation is
    // orthonormal, so exact euclidean top-5 is invariant — that IS the
    // oracle (q80's pattern). Compressing-config recall wins are DedupSpec
    // territory (planted anisotropic spectrum).
    "q208_pq_opq_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("pqopqstore", dir)(p =>
        Similarity.buildPqIndex(e, p, col("vec_id"), col("embedding"),
          m = 8, ksub = n, iters = 0, sampleN = n, opq = true))
      Similarity.pqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // OPQ composed through BOTH IVF-PQ tiers (rotate → coarse-assign →
    // residual-encode; queries rotate at probe) in the everything-off
    // degenerate — still exact euclidean top-5, q87's oracle.
    "q209_ivfpq_opq_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("ivfpqopqstore", dir)(p =>
        Similarity.buildIvfPqIndex(e, p, col("vec_id"), col("embedding"),
          nlist = 8, m = 8, ksub = n, iters = 0, sampleN = n, opq = true))
      Similarity.ivfPqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // PCA-composed ANN recall invariant — the r8 attempt that was dropped
    // because the driver's synthetic embeddings are isotropic (PCA-16 keeps
    // <20% cosine-NN recall on them, correctly). Here the embedding table
    // contributes the ids/scale and the COORDINATES are planted with a
    // decaying spectrum (coordinate d ~ uniform·0.8^d, xxhash64-derived, so
    // both engines could replay the data): PCA-16 then captures >99.9% of
    // the variance and cosine-NN top-10 through the 4× compressed
    // projection must recall >= 70% of the exact top-10 (measured 0.975 at
    // sf0.01, 0.985 at sf0.1). The oracle pins the invariant row (the q92/q99 pattern).
    "q210_pca_ann_recall" -> ((s, dir) => {
      val ids = Tables.load(s, dir, "embeddings").select(col("vec_id"))
      val planted = ids.withColumn("embedding",
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(xxhash64(concat_ws(":", col("vec_id"), d, lit("spec"))), lit(2001L))
            - lit(1000L)).cast("double") / lit(1000.0)
            * pow(lit(0.8), d.cast("double"))).cast("float")))
        .localCheckpoint()
      val q = planted.filter(col("vec_id") < 20)
      def pairs(df: org.apache.spark.sql.DataFrame, v: String) =
        Similarity.bruteTopK(df, df.filter(col("vec_id") < 20),
          col("vec_id"), col("vec_id"), col(v), col(v), k = 10)
      val exact = pairs(planted, "embedding").localCheckpoint()
      val mdl = Similarity.fitPca(planted, col("vec_id"), col("embedding"), m = 16)
      val proj = Similarity.pcaProject(planted, col("embedding"), mdl)
        .select(col("vec_id"), col("pca").as("embedding"))
      val approx = pairs(proj, "embedding")
      val total = exact.count()
      val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
      val nq = q.count()
      s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(nq, 700000L, hits * 1000000L / total >= 700000L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_queries",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("recall_floor_e6",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("recall_ok",
            org.apache.spark.sql.types.BooleanType, false))))
    }),

    // OPQ's recall EDGE as a driver invariant (the compressing-config
    // claim; q208/q209 pin only the lossless degenerate): on the planted
    // decaying spectrum (q210's table — variance concentrated in the first
    // coordinates), plain PQ's axis-blocked subspaces are unbalanced
    // (subspace 0 carries almost all the variance, the rest quantize
    // noise), while the eigenvalue-allocated rotation redistributes the
    // axes. Spark computes euclidean top-10 recall vs the exact in-plan
    // anchor for BOTH stores at the same compressing config (m=8, ksub=16)
    // and pins the DIRECTIONAL claim (OPQ >= PQ) plus an OPQ recall floor
    // of 0.10; measured recall@10: 0.600 (OPQ) vs 0.235 (PQ) at sf0.01,
    // 0.145 vs 0.025 at sf0.1 (2.5x / 5.8x). The gate pins a conservative
    // 1.2x margin: loose enough that a seed/SF shift to ~1.8x still
    // passes, tight enough that a regression collapsing OPQ's measured
    // 2.5x-5.8x edge to bare parity FAILS (bare >= was too weak a floor
    // for the evidence). The exact multiplier stays telemetry.
    "q212_opq_recall" -> ((s, dir) => {
      val ids = Tables.load(s, dir, "embeddings").select(col("vec_id"))
      val planted = ids.withColumn("embedding",
        transform(sequence(lit(0), lit(63)), d =>
          ((pmod(xxhash64(concat_ws(":", col("vec_id"), d, lit("opq"))), lit(2001L))
            - lit(1000L)).cast("double") / lit(1000.0)
            * pow(lit(0.5), d.cast("double"))).cast("float")))
        .localCheckpoint()
      val q = planted.filter(col("vec_id") < 20)
      val base = java.nio.file.Files.createTempDirectory("opqrecall").toString
      def topK(tag: String, ksub: Int, iters: Int, opq: Boolean,
               sampleN: Int = 4096): Set[(Long, Long)] = {
        val p = s"$base/$tag"
        Similarity.buildPqIndex(planted, p, col("vec_id"), col("embedding"),
          m = 8, ksub = ksub, iters = iters, sampleN = sampleN, opq = opq)
        Similarity.pqTopKIndexed(q, p, col("vec_id"), col("embedding"), k = 10)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      // exact euclidean anchor: the LOSSLESS degenerate (q80's in-plan
      // pattern — ksub covers the corpus, ADC telescopes to true distances)
      val n = planted.count().toInt
      val exact = topK("exact", ksub = n, iters = 0, opq = false, sampleN = n)
      def recallE6(got: Set[(Long, Long)]): Long =
        got.intersect(exact).size.toLong * 1000000L / exact.size
      val rPq = recallE6(topK("pq", ksub = 16, iters = 3, opq = false))
      val rOpq = recallE6(topK("opq", ksub = 16, iters = 3, opq = true))
      // the measured edge, for the record (telemetry, not a gate)
      println(s"[q212_opq_recall] recall@10 e6: opq=$rOpq pq=$rPq " +
        f"ratio=${if (rPq == 0) Double.PositiveInfinity else rOpq.toDouble / rPq}%.2f")
      s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(exact.size.toLong, 100000L,
            rOpq * 10L >= rPq * 12L, rOpq >= 100000L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_exact_pairs",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("opq_floor_e6",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("opq_beats_pq",
            org.apache.spark.sql.types.BooleanType, false),
          org.apache.spark.sql.types.StructField("opq_floor_ok",
            org.apache.spark.sql.types.BooleanType, false))))
    }),

    // Distributed seeded k-means over the embedding corpus (curation
    // clustering): deterministic init (k smallest ids), 2 Lloyd iterations,
    // assignment + squared distance against the final centroids.
    "q78_kmeans" -> ((s, dir) => {
      Similarity.kmeans(Tables.load(s, dir, "embeddings"), col("vec_id"),
          col("embedding"), k = 4, iters = 2)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // BM25 top-k retrieval in the exact-integer mode: corpus stats in one
    // agg pass, per-row tf counts (no explode), TakeOrdered top-25. The
    // score is a pure integer function of (tf, df, dl, N, Σdl), so the
    // DuckDB oracle replays it bit-for-bit (TextSearch.bm25ExactOracleSql
    // is generated from the same constants).
    "q81_bm25" -> ((s, dir) => {
      TextSearch.bm25TopKExact(Tables.load(s, dir, "documents"),
        col("doc_id"), col("text"), Bm25Terms, k = 25)
    }),

    // BPE tokenizer training, first merge decision: the argmax adjacent
    // symbol pair of the char-symbol word histogram — the one training
    // round plain SQL can replay (the full loop is BpeSpec differential
    // territory). EAGER histogram pass, driver merge loop.
    "q82_bpe_first" -> ((s, dir) => {
      Bpe.learnBpe(Tables.load(s, dir, "documents"), col("text"), numMerges = 1)
    }),

    // Full BPE merge table (50 rounds). Oracle: DuckDB recursive-CTE
    // replay of the whole loop (Bpe.mergeTableOracleSql); the loop is
    // also pinned by BpeSpec's naive differential + the Sennrich fixture.
    "q83_bpe_merges" -> ((s, dir) => {
      Bpe.learnBpe(Tables.load(s, dir, "documents"), col("text"), numMerges = 50)
        .orderBy(col("merge_rank"))
    }),

    // WordPiece-style vocabulary: histogram-weighted overlapping substring
    // counts, chars guaranteed, multi-char slots by (cnt, token) — the
    // lookup-vocab twin of the BPE merge table. Integer counts end-to-end.
    "q173_wordpiece_vocab" -> ((s, dir) => {
      Wordpiece.learnVocab(Tables.load(s, dir, "documents"), col("text"),
          vocabSize = 60, maxTokenLen = 4)
        .orderBy(col("cnt").desc, col("token"))
    }),

    // optimal-MaxMatch segmentation of every distinct corpus word: the
    // fewest-token DP + longest-optimal-token walk, replayed
    // token-for-token by the oracle's recursive-CTE DP (vocabSize 60 <
    // whole-word coverage, so words genuinely fragment: 1-5 tokens).
    "q174_wordpiece_segment" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val vocab = Wordpiece.learnVocab(d, col("text"), vocabSize = 60,
          maxTokenLen = 4)
        .select(col("token")).collect().map(_.getString(0)).toSeq
      Wordpiece.segmentWords(d, col("text"), vocab, maxTokenLen = 4)
        .orderBy(col("word"))
    }),

    // tokenizer application over the corpus: per-document minimal token
    // totals (the memoized broadcast-vocab map — zero shuffle beyond the
    // learn phase's bounded histogram).
    "q175_wordpiece_tokens" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val vocab = Wordpiece.learnVocab(d, col("text"), vocabSize = 60,
        maxTokenLen = 4)
      Wordpiece.applyWordpiece(d, col("text"), vocab, maxTokenLen = 4,
          outName = "wp_tokens")
        .select(col("doc_id"), size(col("wp_tokens")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // unigram-LM (SentencePiece-style) Viterbi segmentation over the SAME
    // learned vocabulary as q174 — max-likelihood instead of fewest
    // tokens, with the integer-log2 objective the oracle replays via a
    // window-carrying recursive DP + deterministic walk (seg, n_tokens
    // AND the exact path cost are all pinned).
    "q189_unigram_segment" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val vocab = Wordpiece.learnVocab(d, col("text"), vocabSize = 60,
          maxTokenLen = 4)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      Unigram.segmentWords(d, col("text"), vocab, maxTokenLen = 4)
        .orderBy(col("word"))
    }),

    // Aho-Corasick blocklist scan: every document's DISTINCT matched
    // phrases (set semantics) in one pass over the text — the oracle
    // replays the match set with a per-phrase contains filter, so the
    // automaton's goto/fail/output construction is verified end-to-end.
    "q191_blocklist" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      TextAnalysis.flagPhrases(d, col("text"), BlockPhrases)
        .select(col("doc_id"), col("flagged_n"),
          concat_ws(",", col("flagged")).as("flagged_csv"))
        .orderBy(col("doc_id"))
    }),

    // per-doc token totals under the unigram objective, served from the
    // SHARED frozen vocab store (one store, two inference modes — q176
    // serves WordPiece from it, this serves max-likelihood).
    "q190_unigram_tokens" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val path = storedOnce("wpstore_ug", dir) { p =>
        val vocab = Wordpiece.learnVocab(d, col("text"), vocabSize = 60,
          maxTokenLen = 4)
        Wordpiece.buildVocabStore(vocab, p, maxTokenLen = 4)
      }
      Unigram.applyUnigramStored(d, col("text"), path, outName = "ug_tokens")
        .select(col("doc_id"), size(col("ug_tokens")).cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    }),

    // NATIVE unigram-LM vocabulary TRAINING (Kudo 2018 hard-EM; the r10
    // verdict's ask #3 — q189/q190 INFER from a WordPiece-selected vocab,
    // this LEARNS the vocab by the unigram objective itself): oversized
    // substring seed, then 3 rounds of E (integer-q20 Viterbi over the
    // word histogram) / M (usage re-count) / prune (top slots by usage).
    // The oracle replays every round — seed counts, per-round weights,
    // the windowed Viterbi DP, the token-emitting walk, usage sums, and
    // the prune cut — so the learned (token, cnt) table is hash-exact.
    "q228_unigram_em_learn" -> ((s, dir) => {
      Unigram.learnVocab(Tables.load(s, dir, "documents"), col("text"),
          vocabSize = 60, maxTokenLen = 4, rounds = 3, seedMultiplier = 2)
        .orderBy(col("cnt").desc, col("token"))
    }),

    // the EM-trained vocabulary through the q173-pattern store round-trip
    // (ONE persisted store format serves frequency-selected AND
    // EM-trained vocabs) and the standard max-likelihood segmentation:
    // seg, n_tokens, and the exact integer path cost all pinned.
    "q229_unigram_em_segment" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val path = storedOnce("ugemstore", dir) { p =>
        val vocab = Unigram.learnVocab(d, col("text"), vocabSize = 60,
          maxTokenLen = 4, rounds = 3, seedMultiplier = 2)
        Wordpiece.buildVocabStore(vocab, p, maxTokenLen = 4)
      }
      Unigram.segmentWordsStored(d, col("text"), path)
        .orderBy(col("word"))
    }),

    // IVF-NSW graph index (r10 verdict ask #4, the measured SHIP branch —
    // dev/hnsw_experiment.py: 2-4x fewer distance comps/query than IVF at
    // matched recall, 6.5x sequential build cost ⇒ the Spark-native form
    // is per-CELL navigable-small-world graphs under the frozen IVF
    // quantizer). This row pins the DEGENERATE EXACT contract: nprobe =
    // nlist + efSearch >= cell size means the beam never saturates and
    // walks every (connected-by-construction) cell graph completely, so
    // the result equals euclidean brute top-5 — the same oracle that pins
    // the PQ family's lossless degenerate.
    "q231_nsw_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("nswstore", dir) { p =>
        Similarity.buildNswIndex(e, p, col("vec_id"), col("embedding"),
          nlist = 8, m = 8, efC = 32)
      }
      Similarity.nswTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 8,
          efSearch = 1 << 20)
        .orderBy(col("query_id"), col("rank"))
    }),

    // the approximate configuration's invariant row (the q212 pattern):
    // recall@10 vs the in-plan euclidean brute anchor >= the floor, and
    // the beam's visited-node count — the cost the graph tier exists to
    // cap — stays under 60% of the corpus. MARGIN RATIONALE (r12,
    // measured): at sf0.01's ~60-vector cells efSearch >= cell, so the
    // walk saturates every probed cell (ef = 64/96/128 return BYTE-
    // IDENTICAL recall 0.72 / visited 51% — dev transcript) — both
    // numbers are the IVF ROUTING ceiling (mass of true top-10 in the 4
    // probed cells), not walk quality, so no tie-break or beam change
    // can move them; only a centroid-fit change could, which IS a
    // regression this row should catch. The production (large-cell)
    // regime is pinned separately: q235 + the SCALE.md "IVF-NSW
    // regimes" engine-measured table (visited 10.1% at sf1 cells).
    "q232_nsw_recall" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").localCheckpoint()
      val path = storedOnce("nswstore", dir) { p =>
        Similarity.buildNswIndex(e, p, col("vec_id"), col("embedding"),
          nlist = 8, m = 8, efC = 32)
      }
      val q = e.filter(col("vec_id") < 20)
      val approx = Similarity.nswTopKIndexed(q, path, col("vec_id"),
        col("embedding"), k = 10, nprobe = 4, efSearch = 64)
      // exact euclidean anchor, in-plan (20 queries x corpus)
      val d2 = graft.functions.stf.vec_dist2(col("q.embedding"), col("c.embedding"))
      val exact = q.as("q").crossJoin(e.as("c"))
        .filter(col("c.vec_id") =!= col("q.vec_id"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q.vec_id"))
            .orderBy(d2, col("c.vec_id"))))
        .filter(col("rank") <= 10)
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .intersect(exact).count()
      val recallE6 = hits * 1000000L / exact.count()
      val stats = Similarity.nswProbeStats(q, path, col("vec_id"),
          col("embedding"), nprobe = 4, efSearch = 64)
        .agg(avg(col("n_visited"))).collect()(0).getDouble(0)
      val n = e.count()
      println(s"[q232_nsw_recall] recall@10 e6: $recallE6 " +
        f"avg_visited=$stats%.0f corpus=$n frac=${stats / n}%.3f")
      s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(20L, recallE6 >= 700000L,
            stats <= 0.6 * n)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_queries",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("recall_ok",
            org.apache.spark.sql.types.BooleanType, false),
          org.apache.spark.sql.types.StructField("visited_capped",
            org.apache.spark.sql.types.BooleanType, false))))
    }),

    // the PRODUCTION-regime NSW pin (r11 verdict ask #2): ONE deliberate
    // big cell (nlist = 1 — the whole corpus as a single graph, the
    // closest verify-scale stand-in for sf1's ~1250-vector cells), so
    // the walk is measured as a BEAM, not a saturated cell scan. Pins
    // (a) beam quality: recall@10 >= 0.93 vs the in-plan brute anchor
    // (measured 0.995 at sf0.01, 0.955 at sf0.1 — far above q232's 0.72
    // routing ceiling; the floor clears BOTH scales), and (b) the
    // production cost claim — the beam
    // visits <= 1 + efSearch x 2m = 1025 nodes ABSOLUTE (the entry
    // node is visited before any beam expansion, then each of the
    // <= efSearch beam slots expands <= 2m neighbors), independent of
    // cell size (measured 379 at 500 vectors, 606 at 2000: sub-linear
    // in the cell, the property that makes the fraction collapse to
    // 10.1% at sf1-scale cells — SCALE.md "IVF-NSW regimes").
    "q235_nsw_bigcell" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings").localCheckpoint()
      val path = storedOnce("nswbig", dir) { p =>
        Similarity.buildNswIndex(e, p, col("vec_id"), col("embedding"),
          nlist = 1, m = 8, efC = 32)
      }
      val q = e.filter(col("vec_id") < 20)
      val approx = Similarity.nswTopKIndexed(q, path, col("vec_id"),
        col("embedding"), k = 10, nprobe = 1, efSearch = 64)
      val d2 = graft.functions.stf.vec_dist2(col("q.embedding"), col("c.embedding"))
      val exact = q.as("q").crossJoin(e.as("c"))
        .filter(col("c.vec_id") =!= col("q.vec_id"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q.vec_id"))
            .orderBy(d2, col("c.vec_id"))))
        .filter(col("rank") <= 10)
        .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"))
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .intersect(exact).count()
      val recallE6 = hits * 1000000L / exact.count()
      val maxVisited = Similarity.nswProbeStats(q, path, col("vec_id"),
          col("embedding"), nprobe = 1, efSearch = 64)
        .agg(max(col("n_visited"))).collect()(0).getLong(0)
      println(s"[q235_nsw_bigcell] recall@10 e6: $recallE6 max_visited=$maxVisited")
      s.createDataFrame(java.util.Arrays.asList(
          org.apache.spark.sql.Row(20L, recallE6 >= 930000L,
            maxVisited <= 1025L)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n_queries",
            org.apache.spark.sql.types.LongType, false),
          org.apache.spark.sql.types.StructField("recall_ok",
            org.apache.spark.sql.types.BooleanType, false),
          org.apache.spark.sql.types.StructField("beam_cost_capped",
            org.apache.spark.sql.types.BooleanType, false))))
    }),

    // streaming-shaped IVF store (the faiss train/add split): quantizer
    // trained once, corpus arrives as two batch_id partitions appended
    // under the FROZEN cells; probe-time partition discovery folds them
    // and nprobe = nlist degenerates to exact — so the accumulate path
    // itself is verified by the same brute-cosine oracle as q51.
    "q178_ivf_store_ingest" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("ivfingest", dir) { p =>
        Similarity.trainIvfCentroids(e, p, col("vec_id"), col("embedding"),
          nlist = 16)
        Similarity.appendIvfBatch(e.filter(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), p, batchId = 0L)
        Similarity.appendIvfBatch(e.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 16)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // streaming-shaped PQ store (train/add, the q178 pattern for the
    // compressed tier): codebooks trained once in the LOSSLESS degenerate
    // (ksub = n, iters = 0 — the q80 anchor), corpus appended as two
    // frozen-codebook batch partitions; discovery folds them and the ADC
    // ranking equals exact euclidean ⇒ the accumulate path is verified by
    // q80's oracle.
    "q179_pq_store_ingest" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("pqingest", dir) { p =>
        Similarity.trainPqCodebooks(e, p, col("vec_id"), col("embedding"),
          m = 8, ksub = n, iters = 0, sampleN = n)
        Similarity.appendPqBatch(e.filter(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), p, batchId = 0L)
        Similarity.appendPqBatch(e.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Similarity.pqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // incrementally-grown MinHash store (the q178 train/add pattern for
    // the text-dedup reference corpus): frozen banding params, the even
    // docs arrive as two batch_id appends, then the same gate as q102 —
    // whose oracle verifies the accumulate path.
    "q181_minhash_store_ingest" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("mhingest", dir) { p =>
        Dedup.initMinhashStore(s, p)
        Dedup.appendMinhashBatch(docs.filter(col("doc_id") % 4 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        Dedup.appendMinhashBatch(docs.filter(col("doc_id") % 4 === 2),
          col("doc_id"), col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Dedup.dropSeenNearDups(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), path)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // incrementally-grown cosine-LSH store: q111's gate over a store
    // built as two frozen-hyperplane appends.
    "q182_coslsh_store_ingest" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val path = storedOnce("clingest", dir) { p =>
        Dedup.initCosineLshStore(s, p, tables = 48, planes = 3)
        Dedup.appendCosineLshBatch(embs.filter(col("vec_id") % 4 === 0),
          col("vec_id"), col("embedding"), p, batchId = 0L)
        Dedup.appendCosineLshBatch(embs.filter(col("vec_id") % 4 === 2),
          col("vec_id"), col("embedding"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), path, threshold = 0.42)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // incrementally-grown inverted index (the Lucene segment pattern —
    // q178's train/add shape for retrieval): the corpus arrives as two
    // postings/dict/segstats segments; the query folds df and (N, Σdl)
    // across segments at read time, which under the disjoint-doc contract
    // equals the one-pass q86 statistics exactly — so q81's exact-integer
    // BM25 oracle verifies the growth path bit-for-bit.
    "q183_bm25_store_ingest" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("textseg", dir) { p =>
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextSearch.bm25TopKExactIndexed(s, path, Bm25Terms, k = 25)
    }),

    // streaming-shaped IVF-PQ store: the whole ladder's train/add
    // endpoint — frozen centroids + residual codebooks (lossless q87
    // config), two batch appends, full-probe query == exact euclidean ⇒
    // q87's oracle verifies the accumulate path end-to-end.
    "q180_ivfpq_store_ingest" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("ivfpqingest", dir) { p =>
        Similarity.trainIvfPqModel(e, p, col("vec_id"), col("embedding"),
          nlist = 8, m = 8, ksub = n, iters = 0, sampleN = n)
        Similarity.appendIvfPqBatch(e.filter(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), p, batchId = 0L)
        Similarity.appendIvfPqBatch(e.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Similarity.ivfPqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // q180's train/add split COMPOSED WITH OPQ: batches encoded under the
    // frozen rotation+centroids+codebooks fold to the one-pass store, and
    // the everything-off degenerate stays exact euclidean (the rotation is
    // orthonormal) — streaming accumulation and rotation are orthogonal.
    "q213_ivfpq_opq_ingest" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("ivfpqopqing", dir) { p =>
        Similarity.trainIvfPqModel(e, p, col("vec_id"), col("embedding"),
          nlist = 8, m = 8, ksub = n, iters = 0, sampleN = n, opq = true)
        Similarity.appendIvfPqBatch(e.filter(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), p, batchId = 0L)
        Similarity.appendIvfPqBatch(e.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Similarity.ivfPqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // DBSCAN-definition invariants for the coincident-site COLLAPSE path
    // (q20's machinery), checkable where the recursive-CTE oracle is
    // quadratic — this row runs at sf1 in minutes while q20's DuckDB
    // replay cannot. The q92/q99/q197 pattern: Spark computes each clause
    // of the definition into a boolean the oracle pins TRUE.
    //  - totality: exactly one output row per input point;
    //  - count_match: an INDEPENDENT point-level neighbor count (the
    //    uncollapsed 3×3-cell self-join — the pre-r9 kernel) equals the
    //    weighted site count the collapse substitutes for it, per point;
    //  - core_flag: is_core ⇔ point-level count >= minPts;
    //  - site_consistent: coincident points share (cluster_id, is_core);
    //  - min_core_id: every cluster id == min id of its core members,
    //    and every non-noise cluster has a core member;
    //  - core_edge: every core-core eps-pair shares a label (min AND max
    //    neighbor-core label == own label — no split components);
    //  - border_rule: every non-core point's label == min label over its
    //    core eps-neighbors, -1 (noise) when it has none.
    "q214_dbscan_invariants" -> ((s, dir) => {
      val eps = 32.0; val minPts = 5; val eps2 = eps * eps
      import org.apache.spark.sql.Column
      val c = Tables.customerPts(s, dir)
        .select(col("c_custkey").cast("long").as("id"), col("cx"), col("cy"))
        .localCheckpoint()
      val out = DBSCAN.model(c, col("id"), col("cx"), col("cy"), eps, minPts)
        .localCheckpoint()
      val nPts = c.count()
      // one aggregation pass for count + distinct-with-nulls (the old
      // count() + distinct().count() pair): distinct().count() ==
      // countDistinct (null-excluding) + 1 iff any null id exists
      val totRow = out.agg(count(lit(1)), countDistinct(col("id")),
        coalesce(max(when(col("id").isNull, 1L).otherwise(0L)), lit(0L))).head()
      val nDistinct = totRow.getLong(1) + (if (totRow.getLong(2) == 1L) 1L else 0L)
      val totalityOk = totRow.getLong(0) == nPts && nDistinct == nPts &&
        out.select(col("id")).join(c.select(col("id")), Seq("id"), "left_anti").isEmpty
      def cellK(x: Column, y: Column, dx: Int, dy: Int): Column =
        (floor(x / eps).cast("long") + dx) * 4294967296L +
          (floor(y / eps).cast("long") + dy)
      def haloCells(x: Column, y: Column): Column = array(
        (for (dx <- -1 to 1; dy <- -1 to 1) yield cellK(x, y, dx, dy)): _*)
      val d2 = (col("cx") - col("hx")) * (col("cx") - col("hx")) +
               (col("cy") - col("hy")) * (col("cy") - col("hy"))
      val owned = c.withColumn("__cell", cellK(col("cx"), col("cy"), 0, 0))
      // point-level AND weighted-site neighbor counts in ONE halo join
      // (r15, guide §1.2/§2.4 — the two joins shared the `owned` build
      // side and the same cell key, so a tagged union of the two halo
      // tables computes both counts with one shuffle + one aggregation):
      //  - tag __pt=true rows are raw points, weight 1 — their conditional
      //    count IS the old point-level recomputation (the collapse is
      //    exactly the claim it checks);
      //  - tag __pt=false rows are the collapsed (site, multiplicity)
      //    algebra, recomputed in-query as before.
      // Each tag still aggregates INDEPENDENTLY (sum over its own rows
      // only), so the invariant remains two separately-derived counts
      // compared against each other.
      val sites = c.groupBy(col("cx").as("sx"), col("cy").as("sy"))
        .agg(count(lit(1)).as("w"))
      val haloBoth = c.select(col("cx").as("hx"), col("cy").as("hy"),
          lit(1L).as("w"), lit(true).as("__pt"))
        .unionByName(sites.select(col("sx").as("hx"), col("sy").as("hy"),
          col("w"), lit(false).as("__pt")))
        .withColumn("__cell", explode(haloCells(col("hx"), col("hy"))))
      val nbrBoth = owned.join(haloBoth, "__cell").filter(d2 <= eps2)
        .groupBy(col("id")).agg(
          sum(when(col("__pt"), 1L).otherwise(0L)).as("n_point"),
          sum(when(!col("__pt"), col("w"))).as("n_site"))
      val joined = out
        .join(nbrBoth, Seq("id"), "left")
        .select(col("id"), col("x"), col("y"), col("cluster_id"), col("is_core"),
          coalesce(col("n_point"), lit(0L)).as("n_point"),
          coalesce(col("n_site"), lit(0L)).as("n_site"))
        .localCheckpoint()
      def allTrue(df: DataFrame, flag: Column): Boolean = {
        // empty set => vacuously true (e.g. at sf0.1 every point is core,
        // so the border clause quantifies over nothing); a null flag on a
        // NON-empty set is a failure, never silently ignored by min()
        val r = df.agg(min(coalesce(flag, lit(false))), count(lit(1))).head()
        r.getLong(1) == 0L || r.getBoolean(0)
      }
      // both flags in ONE scan of joined (same allTrue semantics per flag:
      // min over coalesce(flag, false), vacuously true on an empty set)
      val cmRow = joined.agg(
        min(coalesce(col("n_point") === col("n_site"), lit(false))),
        min(coalesce(col("is_core") === (col("n_point") >= minPts), lit(false))),
        count(lit(1))).head()
      val countMatchOk = cmRow.getLong(2) == 0L || cmRow.getBoolean(0)
      val coreFlagOk = cmRow.getLong(2) == 0L || cmRow.getBoolean(1)
      val siteConsistentOk = allTrue(
        joined.groupBy(col("x"), col("y"))
          .agg(countDistinct(col("cluster_id")).as("nc"),
               countDistinct(col("is_core")).as("nk")),
        col("nc") === 1 && col("nk") === 1)
      val minCoreIdOk = allTrue(
        joined.filter(col("is_core")).groupBy(col("cluster_id"))
          .agg(min(col("id")).as("mi")),
        col("mi") === col("cluster_id")) &&
        joined.filter(col("cluster_id") =!= -1L).select(col("cluster_id")).distinct()
          .join(joined.filter(col("is_core")).select(col("cluster_id")).distinct(),
            Seq("cluster_id"), "left_anti").isEmpty
      // per-point min/max label over core eps-neighbors (site-level halo —
      // labels are site-consistent, checked above)
      val coreSites = joined.filter(col("is_core"))
        .groupBy(col("x").as("hx"), col("y").as("hy"))
        .agg(min(col("cluster_id")).as("hcid"))
      val coreNbr = owned.join(
          coreSites.withColumn("__cell", explode(haloCells(col("hx"), col("hy")))),
          "__cell").filter(d2 <= eps2)
        .groupBy(col("id"))
        .agg(min(col("hcid")).as("min_cid"), max(col("hcid")).as("max_cid"))
      val flagged = joined.join(coreNbr, Seq("id"), "left")
      // both rules in ONE scan of flagged — the old pair of allTrue calls
      // re-ran the coreNbr halo join twice. Per-subset semantics preserved
      // exactly: when(pred, coalesce(flag, false)) is null off-subset (min
      // skips it), and an empty subset yields null -> coalesce(_, true)
      // restores the vacuous-true of allTrue on an empty filter
      val feRow = flagged.agg(
        coalesce(min(when(col("is_core"),
          coalesce(col("min_cid") === col("cluster_id") &&
                   col("max_cid") === col("cluster_id"), lit(false)))), lit(true)),
        coalesce(min(when(!col("is_core"),
          coalesce(col("cluster_id") === coalesce(col("min_cid"), lit(-1L)),
            lit(false)))), lit(true))).head()
      val coreEdgeOk = feRow.getBoolean(0)
      val borderRuleOk = feRow.getBoolean(1)
      import s.implicits._
      Seq((nPts, totalityOk, countMatchOk, coreFlagOk, siteConsistentOk,
          minCoreIdOk, coreEdgeOk, borderRuleOk))
        .toDF("n_points", "totality_ok", "count_match_ok", "core_flag_ok",
          "site_consistent_ok", "min_core_id_ok", "core_edge_ok", "border_rule_ok")
    }),

    // high-dim DBSCAN predict (the pivot family's model symmetry): train
    // modelVecPivot at dims=16 on the sub-400 slice, classify the
    // held-out 100 through the pivot/ring nearest-core kernel — q157's
    // contract at dims the 3^d grid cannot reach; full SQL replay.
    "q224_dbscan_highdim_predict" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val m = DBSCAN.modelVecPivot(e.filter(col("vec_id") < 400),
        col("vec_id"), col("embedding"), dims = 16, eps = 0.45, minPts = 5)
      DBSCAN.predictVecPivot(m, e.filter(col("vec_id") >= 400),
          col("vec_id"), col("embedding"), dims = 16, eps = 0.45)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // ... and through the persisted store: saveModelVec freezes
    // (dims=16, eps) and predictVecStored routes to the pivot kernel
    // above the grid cap — labels identical to the live q224 (shared
    // oracle), completing train-once/classify-many at high dims.
    "q225_dbscan_highdim_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("dbscanhd", dir) { p =>
        DBSCAN.saveModelVec(
          DBSCAN.modelVecPivot(e.filter(col("vec_id") < 400),
            col("vec_id"), col("embedding"), dims = 16, eps = 0.45, minPts = 5),
          p, dims = 16, eps = 0.45, minPts = 5)
      }
      DBSCAN.predictVecStored(s, path, e.filter(col("vec_id") >= 400),
          col("vec_id"), col("embedding"))
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // kNN-join invariants — the last collapse path without an at-scale
    // correctness row (q7's windowed-SQL oracle is quadratic at sf1):
    //  - cardinality: every left row emits exactly min(k, |right|) rows;
    //  - coincident consistency: left rows sharing a geometry share the
    //    EXACT (distance, neighbor) multiset — the collapse's claim,
    //    checked whether or not the >=4096-row gate fired;
    //  - sample exactness: for the 100 smallest supplier ids an in-plan
    //    brute-force top-k over the FULL right side (cross join + window,
    //    same distance expression and tie-break) must match the
    //    expand-radius machine's rows including distances.
    "q223_knn_join_invariants" -> ((s, dir) => {
      val k = 5
      val sup = Tables.supplierPts(s, dir)
      val cus = Tables.customerPts(s, dir).select(col("c_custkey"), col("c_geo"))
      val out = KNN.knnJoin(sup, cus, "s_geo", "c_geo", leftId = "s_suppkey",
          k = k, tieBreak = "c_custkey").localCheckpoint()
      val nLeft = sup.count(); val nRight = cus.count()
      val kk = math.min(k.toLong, nRight)
      import org.apache.spark.sql.Column
      def allTrue(df: DataFrame, flag: Column): Boolean = {
        val r = df.agg(min(coalesce(flag, lit(false))), count(lit(1))).head()
        r.getLong(1) == 0L || r.getBoolean(0)
      }
      // one aggregation pass: |distinct left| == nLeft AND every group has
      // exactly kk rows — same two facts the old count()+allTrue pair
      // established, without materializing perLeft twice (r14 optimization)
      val perLeft = out.groupBy(col("s_suppkey")).agg(count(lit(1)).as("n"))
      val cardRow = perLeft
        .agg(count(lit(1)), min(coalesce(col("n") === kk, lit(false)))).head()
      val cardinalityOk = cardRow.getLong(0) == nLeft &&
        (cardRow.getLong(0) == 0L || cardRow.getBoolean(1))
      val sig = out.groupBy(col("s_suppkey"), col("sx"), col("sy"))
        .agg(sort_array(collect_list(struct(col("knn_dist"), col("c_custkey"))))
          .as("sig"))
      val coincidentOk = allTrue(
        sig.groupBy(col("sx"), col("sy")).agg(countDistinct(col("sig")).as("nd")),
        col("nd") === 1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("s_suppkey")).orderBy(col("knn_dist"), col("c_custkey"))
      // spread the stream side: both scans arrive as ONE partition, so the
      // BNLJ + distance over 1.5M pairs ran in a single 2.1 s task — the
      // repartition moves 15k rows and parallelizes the brute refine
      // (r14 optimization, guide §2.5)
      val brute = sup.filter(col("s_suppkey") <= 100)
        .crossJoin(cus.repartition(s.sparkContext.defaultParallelism))
        .withColumn("knn_dist", stf.st_centroid_distance(col("s_geo"), col("c_geo")))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
        .select(col("s_suppkey"), col("c_custkey"), col("knn_dist"))
      val got = out.filter(col("s_suppkey") <= 100)
        .select(col("s_suppkey"), col("c_custkey"), col("knn_dist"))
      // multiset equality in ONE pass: signed multiplicities sum to zero on
      // every distinct row <=> both exceptAll directions are empty (same
      // null/NaN/-0.0 normalization — groupBy and exceptAll hash the same
      // UnsafeRow binary form). The old two-sided exceptAll evaluated the
      // brute cross-join+window TWICE (r14 optimization: 5.0 s -> one pass)
      val sampleExactOk = got.withColumn("__mw", lit(1L))
        .unionByName(brute.withColumn("__mw", lit(-1L)))
        .groupBy(col("s_suppkey"), col("c_custkey"), col("knn_dist"))
        .agg(sum(col("__mw")).as("__d"))
        .filter(col("__d") =!= 0L)
        .isEmpty
      import s.implicits._
      Seq((nLeft, kk, cardinalityOk, coincidentOk, sampleExactOk))
        .toDF("n_left", "k", "cardinality_ok", "coincident_ok", "sample_exact_ok")
    }),

    // the GPT-2 byte↔unicode table itself (Radford et al. 2019
    // encoder.py, public): 188 printable bytes self-map, the other 68 get
    // 256+n in byte order (space → Ġ, newline → Ċ). The oracle REBUILDS
    // the table from the same public rule in SQL — an independent replay
    // of the byte-level tokenizer's foundation.
    "q221_bpe_byte_table" -> ((s, dir) => {
      import s.implicits._
      Bpe.byteEncoder.zipWithIndex.toSeq
        .map { case (sym, b) => (b.toLong, sym.codePointAt(0).toLong, sym) }
        .toDF("byte_val", "code_point", "symbol")
        .orderBy(col("byte_val"))
    }),

    // byte-level BPE end-to-end through the FROZEN store (mode sidecar):
    // learn 50 merges over byte symbols, freeze byteLevel=byte, segment
    // every distinct word through applyBpeStored's mode detection. On
    // this pure-ASCII corpus the byte table is the identity on every
    // word byte, so the byte-level segmentation must EQUAL the
    // char-level one — q177's full learn+apply replay is the oracle; the
    // non-identity region of the table is pinned by q221 and the
    // non-ASCII round trip by BpeSpec.
    "q222_bpe_byte_segment" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val path = storedOnce("bpebytestore", dir)(p =>
        Bpe.buildMergeStore(
          Bpe.learnBpe(d, col("text"), numMerges = 50, byteLevel = true),
          p, byteLevel = true))
      require(Bpe.storedBpeMode(s, path) == "byte")
      Bpe.segmentWords(d, col("text"), Bpe.loadMergeStore(s, path),
          byteLevel = true)
        .orderBy(col("word"))
    }),

    // DCT perceptual hash (pHash — the standard tier above q119's aHash):
    // 512-segment resample, integer fixed-point DCT-II via the shared
    // quarter-wave cosine table, sign-of-lower-median bits over the 64
    // lowest frequencies, then the same pigeonhole hamming join. The
    // oracle replays the WHOLE transform (the cosine table rides the SQL
    // as a 1025-literal VALUES table — no trig in either engine).
    "q220_media_phash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").withColumn("media",
        repeat(md5(pmod(col("doc_id"), lit(50)).cast("string").cast("binary")),
          (pmod(col("n_chars"), lit(4)) + 2).cast("int")).cast("binary"))
      Multimodal.mediaPHashPairs(docs, col("doc_id"), col("media"),
          maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // REAL audio decode end-to-end (r10 verdict ask #2): each payload is a
    // genuine PCM16LE mono WAV container (44-byte RIFF header + samples)
    // built around a deterministic pseudo-noise signal; Spark decodes it
    // through javax.sound.sampled (MediaCodec.decodeWav — real JDK audio
    // parsing, one unsigned byte per frame) and sketches the SAMPLES. The
    // oracle never sees the container: it recomputes the hash from the
    // generating formula directly, so row equality proves the whole
    // container→AudioSystem→frame-byte chain is lossless and exact.
    // Twin structure: docs 2j and 2j+1 share a signal up to a +3 DC
    // offset (a requantization-sized perturbation that moves ~1% of
    // sample bytes by one step), so twins pair at small hamming while
    // unrelated signals sit ~32 bits apart.
    "q226_wav_ahash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 40)
        .withColumn("media", wavNoise(col("doc_id")))
      Multimodal.mediaAHashPairs(docs, col("doc_id"), col("media"),
          maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the same WAV fixtures through the DCT pHash tier (q220's kernel on
    // real decoded audio samples): full integer DCT replay from the
    // sample formula, literal cosine table in the SQL
    "q227_wav_phash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 40)
        .withColumn("media", wavNoise(col("doc_id")))
      Multimodal.mediaPHashPairs(docs, col("doc_id"), col("media"),
          maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // REAL VIDEO DECODE (the multimodal family's last fake, retired):
    // q226's chain over AVI containers — RIFF walk → per-frame 24-bit
    // DIB decode (integer Rec.601 luma) → the same 1-D aHash kernel;
    // the oracle replays container+decode+hash from the pixel formula
    // (the MJPEG leg of the same walk is spec-pinned — JPEG entropy
    // decode has no SQL-replayable formula).
    "q236_avi_ahash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 40)
        .withColumn("media", aviNoise(col("doc_id")))
      Multimodal.mediaAHashPairs(docs, col("doc_id"), col("media"),
          maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the AVI fixtures through the DCT pHash tier (q227's kernel on
    // real decoded video frames): full integer DCT replay from the
    // pixel formula, literal cosine table in the SQL
    "q237_avi_phash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 40)
        .withColumn("media", aviNoise(col("doc_id")))
      Multimodal.mediaPHashPairs(docs, col("doc_id"), col("media"),
          maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // frame extraction over REAL decoded video (the vision-language
    // training shape on actual containers, not synthetic bytes):
    // sampleFrames cuts the container-walked DIB stream into 4 slices,
    // keeps every 2nd, and each kept slice is sketched with the aHash
    // kernel — slice boundaries, stride arithmetic, and the per-frame
    // sketch all replay from the pixel formula.
    "q238_avi_frame_stats" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 40)
        .withColumn("media", aviNoise(col("doc_id")))
        .select(col("doc_id"), col("media"))
      val ah = udf((m: Array[Byte]) =>
        if (m == null) 0L else Multimodal.mediaAHash(m))
      Multimodal.sampleFrames(docs, frames = 4, stride = 2)
        .select(col("doc_id"), col("frame_idx"),
          ah(col("frame")).as("frame_sim"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // trigram stupid-backoff fluency, live self-scored (Brants et al.
    // 2007; the KenLM-style next order above q88's bigram LM): exact
    // e6-integer branch scores, full SQL replay. Self-scoring always hits
    // the seen branch; q218 exercises the backoff branches on held-out
    // text.
    "q217_fluency3" -> ((s, dir) => {
      TextAnalysis.withTrigramFluency(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"))
        .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
        .orderBy(col("doc_id"))
    }),

    // trigram fluency from a SEGMENTED store, scored on HELD-OUT text:
    // the model is the even half (grown as two disjoint appends — the
    // q184 shard-count-then-merge shape extended to the trigram table),
    // the scored set is the odd half, so unseen trigrams exercise the
    // 0.4·B(w2,w3)/U(w2) backoff and unseen bigrams the 0.16·U(w3)/N
    // floor — the oracle replays every branch.
    "q218_fluency3_store" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("lm3seg", dir) { p =>
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 4 === 0),
          col("text"), p, batchId = 0L)
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 4 === 2),
          col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextAnalysis.withTrigramFluencyIndexed(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), path)
        .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
        .orderBy(col("doc_id"))
    }),

    // trigram-store takedown: %8==0 docs are forgotten via negative
    // trigram/bigram/unigram segments; held-out scoring must equal a
    // model built over the REMAINING even docs — which is exactly what
    // the oracle replays (the q186 pattern at order 3).
    "q219_fluency3_forget" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("lm3forget", dir) { p =>
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 4 === 0),
          col("text"), p, batchId = 0L)
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 4 === 2),
          col("text"), p, batchId = 1L)
        TextAnalysis.deleteFromLmStore(docs.filter(col("doc_id") % 8 === 0),
          col("text"), p, batchId = 0L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextAnalysis.withTrigramFluencyIndexed(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), path)
        .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
        .orderBy(col("doc_id"))
    }),

    // HIGH-DIMENSIONAL exact DBSCAN (the r9 verdict's dims-cap decision:
    // lifted, not dismissed) — 16 of the embedding table's 64 dims
    // through the pivot/triangle-inequality kernel (Voronoi cells over 16
    // deterministic pivots, radius+eps replication, pivot-vector
    // prefilter, exact vec_dist2 refine). The oracle replays the FULL
    // clustering with the q156 recursive-CTE pattern at dims=16 — labels
    // hash-exact, not an invariant row.
    "q216_dbscan_highdim" -> ((s, dir) => {
      DBSCAN.clusterVecPivot(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), dims = 16, eps = 0.45, minPts = 5,
          numPivots = 16)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // the pivot kernel at the FULL embedding width (r10 verdict ask #6 —
    // q216 replays at dims=16, this pins dims=64, the realistic width):
    // eps=1.17 sits in the concentration shoulder where every DBSCAN role
    // is populated (144 cores in 7 components, 229 border, 127 noise at
    // sf0.01), so the full recursive label replay exercises core-edge,
    // border-min-cid, and noise rules under real high-dim geometry.
    "q230_dbscan_dims64" -> ((s, dir) => {
      DBSCAN.clusterVecPivot(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), dims = 64, eps = 1.17, minPts = 5,
          numPivots = 16)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // connected-components invariants for q195's site-collapsed proximity
    // CC — the same sf1 story: the min-label-closure oracle is quadratic,
    // so the definition is checked clause by clause at scale instead.
    //  - totality: one component per customer;
    //  - label_is_min_member: each component id == min member id (which
    //    also makes the label a member of its own component);
    //  - edge_consistent: every (point, site) pair within the proximity
    //    distance agrees on the component — point-level left side, so the
    //    site collapse's "site connectivity == point connectivity" claim
    //    is what the check exercises (coincident points are covered by
    //    the d=0 pair against their own site).
    "q215_cc_invariants" -> ((s, dir) => {
      val maxD = 25.0; val d2max = maxD * maxD
      import org.apache.spark.sql.Column
      val c = Tables.customerPts(s, dir)
        .select(col("c_custkey").cast("long").as("id"), col("cx"), col("cy"))
        .localCheckpoint()
      val sites = c.groupBy(col("cx").as("sx"), col("cy").as("sy"))
        .agg(min(col("id")).as("site_key"))
        .withColumn("s_geo", stf.st_point(col("sx"), col("sy")))
        .localCheckpoint()
      val pairs = SpatialJoin.distanceJoin(
          sites.select(col("site_key").as("a_key"), col("s_geo").as("a_geo")),
          sites.select(col("site_key"), col("s_geo")),
          col("a_geo"), col("s_geo"), maxDist = maxD, cellSize = 100.0)
        .select(col("a_key").as("__a"), col("site_key").as("__b"))
      val comps = ConnectedComponents.run(pairs)
      val siteComp = sites.join(comps, col("site_key") === col("__id"))
        .select(col("sx"), col("sy"), col("__comp"))
      val labeled = c.join(siteComp,
          col("cx") <=> col("sx") && col("cy") <=> col("sy"))
        .select(col("id"), col("cx"), col("cy"), col("__comp").as("component"))
        .localCheckpoint()
      val nPts = c.count()
      val totalityOk = labeled.count() == nPts &&
        labeled.select(col("id")).distinct().count() == nPts
      def allTrue(df: DataFrame, flag: Column): Boolean = {
        // empty set => vacuously true (e.g. at sf0.1 every point is core,
        // so the border clause quantifies over nothing); a null flag on a
        // NON-empty set is a failure, never silently ignored by min()
        val r = df.agg(min(coalesce(flag, lit(false))), count(lit(1))).head()
        r.getLong(1) == 0L || r.getBoolean(0)
      }
      val labelMinOk = allTrue(
        labeled.groupBy(col("component")).agg(min(col("id")).as("mi")),
        col("mi") === col("component"))
      // independent point-level edge check on the SAME exact predicate
      // (d² <= maxD², integral coordinates): comp(point) == comp(site)
      // for every in-range (point, site) pair
      def cellK(x: Column, y: Column, dx: Int, dy: Int): Column =
        (floor(x / maxD).cast("long") + dx) * 4294967296L +
          (floor(y / maxD).cast("long") + dy)
      val haloSites = siteComp
        .select(col("sx").as("hx"), col("sy").as("hy"), col("__comp").as("hcomp"))
        .withColumn("__cell", explode(array(
          (for (dx <- -1 to 1; dy <- -1 to 1)
            yield cellK(col("hx"), col("hy"), dx, dy)): _*)))
      val edgeOk = allTrue(
        labeled.withColumn("__cell", cellK(col("cx"), col("cy"), 0, 0))
          .join(haloSites, "__cell")
          .filter((col("cx") - col("hx")) * (col("cx") - col("hx")) +
                  (col("cy") - col("hy")) * (col("cy") - col("hy")) <= d2max),
        col("component") === col("hcomp"))
      import s.implicits._
      Seq((nPts, totalityOk, labelMinOk, edgeOk))
        .toDF("n_points", "totality_ok", "label_is_min_member_ok",
          "edge_consistent_ok")
    }),

    // frozen WordPiece vocabulary store: segmentation from the store must
    // equal the live q174 path token-for-token (the stored vocab IS the
    // learned vocab; maxTokenLen rides the sidecar) — shares q174's
    // full-replay oracle.
    "q176_wordpiece_store" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val path = storedOnce("wpstore", dir)(p =>
        Wordpiece.buildVocabStore(
          Wordpiece.learnVocab(d, col("text"), vocabSize = 60, maxTokenLen = 4),
          p, maxTokenLen = 4))
      Wordpiece.segmentWordsStored(d, col("text"), path).orderBy(col("word"))
    }),

    // frozen BPE merge store + the APPLICATION rule's first driver-row
    // verification: segment every distinct word from the stored 50-merge
    // table; the oracle replays learning AND the GPT-2 inference loop
    // (lowest-rank merge present, all occurrences, repeat to fixpoint).
    "q177_bpe_segment_store" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val path = storedOnce("bpestore", dir)(p =>
        Bpe.buildMergeStore(Bpe.learnBpe(d, col("text"), numMerges = 50), p))
      Bpe.segmentWords(d, col("text"), Bpe.loadMergeStore(s, path))
        .orderBy(col("word"))
    }),

    // BM25 from the persisted inverted index: the query reads only its
    // terms' postings (pushed IN over the sorted term column) and the
    // stats sidecar — the corpus is never touched. Same integer formula ⇒
    // same oracle as q81.
    "q86_bm25_store" -> ((s, dir) => {
      val path = storedOnce("textindex", dir)(p =>
        TextSearch.buildTextIndex(Tables.load(s, dir, "documents"), p,
          col("doc_id"), col("text")))
      TextSearch.bm25TopKExactIndexed(s, path, Bm25Terms, k = 25)
    }),

    // IVF-PQ in the everything-off degenerate (nprobe = nlist, lossless
    // residual codebook): cell pruning and code compression both verify
    // against plain euclidean top-5 — the composed twin of q51 (IVF) and
    // q79 (PQ). Compressing configs are DedupSpec recall territory.
    "q85_ann_ivfpq" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      Similarity.ivfPqTopK(e, e.filter(col("vec_id") < 10), col("vec_id"), col("vec_id"),
          col("embedding"), col("embedding"), k = 5, nlist = 8, nprobe = 8,
          m = 8, ksub = n, iters = 0, sampleN = n)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Angular-partitioned skyline (reference skylineAngular): atan2-slice
    // repartition, then the same local-frontier-merge — results must equal
    // the plain skyline, so it shares q8's dominance oracle.
    "q91_skyline_angular" -> ((s, dir) => {
      Skyline.skylineAngular(Tables.customerPts(s, dir), "cx", "cy", buckets = 16)
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // Temporal range partitioner as an invariant query: after the
    // repartitionByRange, per-partition [min,max] time ranges must be
    // pairwise disjoint and no row may vanish. The disjointness is
    // computed Spark-side into a column the oracle pins to literal true —
    // a false would hash-mismatch the round.
    "q92_temporal_partition" -> ((s, dir) => {
      val parted = Partitioners.temporalRangePartition(
        Tables.load(s, dir, "events"), expr("ts div 1000"), numPartitions = 8)
      val ranges = parted
        .groupBy(spark_partition_id().as("__pid"))
        .agg(min(expr("ts div 1000")).as("__lo"), max(expr("ts div 1000")).as("__hi"),
          count(lit(1)).as("__n"))
        .collect().sortBy(_.getAs[Long]("__lo"))
      val disjoint = ranges.sliding(2).forall {
        case Array(a, b) => a.getAs[Long]("__hi") <= b.getAs[Long]("__lo")
        case _ => true
      }
      val total = ranges.map(_.getAs[Long]("__n")).sum
      import s.implicits._
      Seq((total, disjoint)).toDF("n_rows", "ranges_disjoint")
    }),

    // Spatio-temporal composite partitioner: (spatial cell, time bucket)
    // histogram — both key parts are closed-form, so the oracle replays
    // them exactly (q27's cell formula × a day bucket on micros).
    "q93_st_partition" -> ((s, dir) => {
      Partitioners.spatioTemporalPartition(Tables.eventPts(s, dir), col("e_geo"),
          expr("ts div 1000"), cellSize = 100.0, timeBucket = 86400000000L,
          numPartitions = 8)
        .groupBy(col("part_cell"), col("part_tbucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("part_cell"), col("part_tbucket"))
    }),

    // σ coveredby with a BOX left side — the predicate whose name-swap bug
    // the reference carries (fixed here, SpatialOps.scala cites it); for
    // boxes the semantics differ visibly from containedby's interior rule.
    "q94_filter_coveredby" -> ((s, dir) => {
      SpatialOps.coveredBy(Tables.nationRects(s, dir), col("n_geo"),
          stf.st_box(lit(100.0), lit(100.0), lit(700.0), lit(700.0)))
        .select(col("n_nationkey")).orderBy(col("n_nationkey"))
    }),

    // Broadcast nested-loop spatial join (reference broadcastJoin): same
    // contains pairs as the cell join, no shuffle of the big side.
    "q95_broadcast_join" -> ((s, dir) => {
      SpatialJoin.broadcastJoin(Tables.customerPts(s, dir), Tables.nationRects(s, dir),
          col("n_geo"), col("c_geo"), JoinPredicate.Contains)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // Broadcast join through the per-task STRtree (reference
    // broadcastJoinWithIndex): build once per task over the broadcast
    // side, envelope probe, exact refine — same pairs again.
    "q96_broadcast_join_indexed" -> ((s, dir) => {
      SpatialJoin.broadcastJoinIndexed(Tables.customerPts(s, dir),
          Tables.nationRects(s, dir), "c_geo", "n_geo", JoinPredicate.ContainedBy)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // Raster countValue + hasValue (SMA-prefiltered pixel scan) over the
    // rasterized events grid, pixel value 1.
    "q97_count_value" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
      Raster.countValue(tiles, 1L)
        .withColumn("has_v", lit(Raster.hasValue(tiles, 1L)))
    }),

    // Fluency from the persisted LM store: counts joined from frozen
    // parquet tables instead of recounted — scoring the training corpus
    // itself must reproduce the live q88 exactly (⇒ same oracle).
    "q100_fluency_store" -> ((s, dir) => {
      val path = storedOnce("lmstore", dir)(p =>
        TextAnalysis.buildLmStore(Tables.load(s, dir, "documents"), p, col("text")))
      TextAnalysis.withBigramFluencyIndexed(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), path)
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
        .orderBy(col("doc_id"))
    }),

    // incrementally-grown LM store (the q183 segment pattern for the
    // fluency model — KenLM's shard-count-then-merge): unigram/bigram
    // counts arrive as two disjoint-document segments, scorers fold them
    // at read time to exactly the one-pass counts ⇒ q100's full fluency
    // replay verifies the growth path bit-for-bit.
    "q184_lm_store_ingest" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("lmseg", dir) { p =>
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 0),
          col("text"), p, batchId = 0L)
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 1),
          col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextAnalysis.withBigramFluencyIndexed(docs,
          col("doc_id"), col("text"), path)
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
        .orderBy(col("doc_id"))
    }),

    // takedown WITHOUT a rebuild (right-to-be-forgotten): a segmented
    // index grows over the full corpus, then one-seventh of it is
    // deleted — tombstones anti-join the postings, negative dict/stats
    // segments cancel the deleted statistics in the read-time fold — and
    // serving must be bit-identical to an index built over the REMAINING
    // corpus, which is exactly what the oracle replays.
    "q185_text_index_forget" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("textforget", dir) { p =>
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), p, batchId = 1L)
        TextSearch.deleteFromTextIndex(
          docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
          col("doc_id"), p, batchId = 0L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextSearch.bm25TopKExactIndexed(s, path, Bm25Terms, k = 25)
    }),

    // LM-store takedown: the deleted docs' n-gram counts arrive as
    // negative segments, zero-count tokens drop out of the model and the
    // vocabulary — scoring the remaining corpus must equal a one-pass
    // model built without the deleted docs (the oracle trains and scores
    // on the filtered table).
    "q186_lm_forget" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("lmforget", dir) { p =>
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 0),
          col("text"), p, batchId = 0L)
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 1),
          col("text"), p, batchId = 1L)
        TextAnalysis.deleteFromLmStore(docs.filter(col("doc_id") % 7 === 3),
          col("text"), p, batchId = 0L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextAnalysis.withBigramFluencyIndexed(
          docs.filter(col("doc_id") % 7 =!= 3), col("doc_id"), col("text"), path)
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
        .orderBy(col("doc_id"))
    }),

    // counting Bloom (deletable membership): the q168 benchmark set grown
    // as two count segments, then half of it FORGOTTEN by a negative
    // segment — the gate must flag against exactly the remaining keys'
    // live cells, which the oracle replays from the md5 positions.
    "q201_counting_bloom" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("cbloom", dir) { p =>
        Sketches.initCountingBloomStore(s, p, BloomM, BloomK)
        Sketches.appendCountingBloomBatch(
          docs.filter(col("doc_id") % 20 === 0), col("text"), p, batchId = 0L)
        Sketches.appendCountingBloomBatch(
          docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0),
          col("text"), p, batchId = 1L)
        Sketches.deleteFromCountingBloom(
          docs.filter(col("doc_id") % 20 === 0), col("text"), p, batchId = 0L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Sketches.countingBloomMightContain(docs, col("text"), path)
        .select(col("doc_id"), col("might_contain"))
        .orderBy(col("doc_id"))
    }),

    // compaction twins for the two newest store families: the q201 and
    // q187 builds compacted to one reserved-id segment — serving must be
    // bit-identical, so they share those queries' oracles.
    "q202_cbloom_compact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("cbloomcmp", dir) { p =>
        Sketches.initCountingBloomStore(s, p, BloomM, BloomK)
        Sketches.appendCountingBloomBatch(
          docs.filter(col("doc_id") % 20 === 0), col("text"), p, batchId = 0L)
        Sketches.appendCountingBloomBatch(
          docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 20 =!= 0),
          col("text"), p, batchId = 1L)
        Sketches.deleteFromCountingBloom(
          docs.filter(col("doc_id") % 20 === 0), col("text"), p, batchId = 0L)
        Sketches.compactCountingBloom(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Sketches.countingBloomMightContain(docs, col("text"), path)
        .select(col("doc_id"), col("might_contain"))
        .orderBy(col("doc_id"))
    }),

    "q203_minhash_compact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("mhcmp", dir) { p =>
        Dedup.initMinhashStore(s, p)
        Dedup.appendMinhashBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        Dedup.deleteFromMinhashStore(
          docs.filter(col("doc_id") % 8 === 0).select(col("doc_id")),
          col("doc_id"), p, batchId = 0L)
        Dedup.compactMinhashStore(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Dedup.dropSeenNearDups(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), path)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // ANN compaction: q188's grown-then-forgotten IVF store folded to
    // one cell-sorted reserved-id segment (tombstones gone, centroids
    // carried) — the full-probe serve must still equal brute cosine over
    // the remaining vectors, so q188's oracle pins it.
    "q206_ann_compact" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("ivfcmp", dir) { p =>
        Similarity.buildIvfIndex(e, p, col("vec_id"), col("embedding"), nlist = 16)
        Similarity.deleteFromAnnStore(
          e.filter(col("vec_id") % 9 === 4).select(col("vec_id")),
          col("vec_id"), p, batchId = 0L)
        Similarity.compactAnnStore(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 16)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    "q205_coslsh_compact" -> ((s, dir) => {
      val embs = Tables.load(s, dir, "embeddings")
      val path = storedOnce("clcmp_q205", dir) { p =>
        Dedup.initCosineLshStore(s, p, tables = 48, planes = 3)
        Dedup.appendCosineLshBatch(embs.filter(col("vec_id") % 2 === 0),
          col("vec_id"), col("embedding"), p, batchId = 0L)
        Dedup.deleteFromCosineLshStore(
          embs.filter(col("vec_id") % 8 === 0).select(col("vec_id")),
          col("vec_id"), p, batchId = 0L)
        Dedup.compactCosineLshStore(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Dedup.dropSeenCosine(embs.filter(col("vec_id") % 2 === 1),
          col("vec_id"), col("embedding"), path, threshold = 0.42)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    // the full segment-store LIFECYCLE under stress (grow → forget →
    // compact → grow again → forget again), serving after every phase
    // from the same entry point: the store ends holding (evens ∪ odds)
    // minus %7=3 (pre-compact delete) minus %5=1 (post-compact delete,
    // including re-deleting already-gone docs — a no-op by contract) plus
    // the late third batch; the oracle replays BM25 over exactly that
    // remaining corpus.
    "q200_text_lifecycle" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("textlife", dir) { p =>
        TextSearch.appendTextBatch(
          docs.filter(col("doc_id") % 2 === 0 && col("doc_id") % 3 =!= 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        TextSearch.appendTextBatch(
          docs.filter(col("doc_id") % 2 === 1 && col("doc_id") % 3 =!= 0),
          col("doc_id"), col("text"), p, batchId = 1L)
        TextSearch.deleteFromTextIndex(
          docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
          col("doc_id"), p, batchId = 0L)
        TextSearch.compactTextIndex(s, p)
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 3 === 0),
          col("doc_id"), col("text"), p, batchId = 0L) // id reuse is safe post-compact
        TextSearch.deleteFromTextIndex(
          docs.filter(col("doc_id") % 5 === 1).select(col("doc_id")),
          col("doc_id"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextSearch.bm25TopKExactIndexed(s, path, Bm25Terms, k = 25)
    }),

    // incrementally-grown DSIR store (the q183/q184 segment pattern for
    // importance resampling): target counts frozen at init, the raw
    // corpus arrives as two count segments; readers derive the smoothed
    // integer ratios from the folded counts — exactly the one-pass
    // build's ratio table, so q115's full replay verifies the growth
    // path bit-for-bit.
    "q199_dsir_store_ingest" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("dsiringest", dir) { p =>
        Pipeline.initDsirStore(docs.filter(col("source") === "src0"),
          col("text"), 1024, p)
        Pipeline.appendDsirRawBatch(docs.filter(col("doc_id") % 2 === 0),
          col("text"), p, batchId = 0L)
        Pipeline.appendDsirRawBatch(docs.filter(col("doc_id") % 2 === 1),
          col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), path)
        .orderBy(col("dsir_score_e6").desc, col("doc_id")).limit(120)
        .select(col("doc_id"), col("dsir_score_e6"))
        .orderBy(col("doc_id"))
    }),

    // DSIR raw-side compaction: the q199 store with a delete folded to
    // one reserved-id segment — scores unchanged, so the remaining-raw
    // replay (q114's oracle restricted to the surviving docs) pins it.
    "q204_dsir_compact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("dsircmp", dir) { p =>
        // target carved from the REMAINING corpus (the oracle derives
        // target counts from the raw-filtered feature table)
        Pipeline.initDsirStore(
          docs.filter(col("source") === "src0" && col("doc_id") % 7 =!= 3),
          col("text"), 1024, p)
        Pipeline.appendDsirRawBatch(docs.filter(col("doc_id") % 2 === 0),
          col("text"), p, batchId = 0L)
        Pipeline.appendDsirRawBatch(docs.filter(col("doc_id") % 2 === 1),
          col("text"), p, batchId = 1L)
        Pipeline.deleteFromDsirRaw(docs.filter(col("doc_id") % 7 === 3),
          col("text"), p, batchId = 0L)
        Pipeline.compactDsirRaw(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Pipeline.dsirScoresIndexed(docs.filter(col("doc_id") % 7 =!= 3),
          col("doc_id"), col("text"), path)
        .orderBy(col("dsir_score_e6").desc, col("doc_id")).limit(120)
        .select(col("doc_id"), col("dsir_score_e6"))
        .orderBy(col("doc_id"))
    }),

    // batched multi-query BM25: a whole query batch scored in ONE pass
    // over the union of its terms' postings — the retrieval-eval /
    // hard-negative-mining serving shape; per-query scores identical to
    // the single-query index mode, so the oracle is a UNION ALL of
    // per-query replays.
    "q198_bm25_batch" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("textseg", dir) { p =>
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      val queries = BatchQueries.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts) }
        .toDF("query_id", "terms")
      TextSearch.bm25BatchExactIndexed(queries, col("query_id"), col("terms"),
          path, k = 10)
        .orderBy(col("query_id"), col("score_e8").desc, col("doc_id"))
    }),

    // exact phrase search from positional postings (Lucene positional
    // queries): the phrase terms' position lists intersect doc by doc —
    // the corpus text is never read — and overlapping occurrences count
    // ("batch batch batch" holds the phrase twice), which is exactly
    // what the oracle's token-array comprehension replays.
    "q194_phrase_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("textpos", dir) { p =>
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), p, batchId = 1L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextSearch.phraseSearchIndexed(s, path, PhraseQuery)
        .orderBy(col("doc_id"))
    }),

    // segment compaction (the Lucene merge step): the q185 store —
    // grown by two appends, one-seventh forgotten — is folded into ONE
    // fresh segment with the tombstone/negative history gone; serving
    // must stay bit-identical, so q185's remaining-corpus oracle
    // verifies the whole grow → delete → compact lifecycle.
    "q192_text_index_compact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("textcompact", dir) { p =>
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), p, batchId = 1L)
        TextSearch.deleteFromTextIndex(
          docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
          col("doc_id"), p, batchId = 0L)
        TextSearch.compactTextIndex(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextSearch.bm25TopKExactIndexed(s, path, Bm25Terms, k = 25)
    }),

    // the LM twin of q192: grow → forget → compact, scored against
    // q186's remaining-corpus fluency replay.
    "q193_lm_compact" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("lmcompact", dir) { p =>
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 0),
          col("text"), p, batchId = 0L)
        TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 1),
          col("text"), p, batchId = 1L)
        TextAnalysis.deleteFromLmStore(docs.filter(col("doc_id") % 7 === 3),
          col("text"), p, batchId = 0L)
        TextAnalysis.compactLmStore(s, p)
        graft.sources.Sidecar.markComplete(s, p)
      }
      TextAnalysis.withBigramFluencyIndexed(
          docs.filter(col("doc_id") % 7 =!= 3), col("doc_id"), col("text"), path)
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
        .orderBy(col("doc_id"))
    }),

    // MinHash-store takedown: tombstones anti-join the candidate (bands)
    // table, so a forgotten even doc can never flag an odd probe again —
    // the gate must match the exact-Jaccard replay over the REMAINING
    // store (evens minus every eighth).
    "q187_minhash_forget" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("mhforget", dir) { p =>
        Dedup.initMinhashStore(s, p)
        Dedup.appendMinhashBatch(docs.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"), p, batchId = 0L)
        Dedup.deleteFromMinhashStore(
          docs.filter(col("doc_id") % 8 === 0).select(col("doc_id")),
          col("doc_id"), p, batchId = 0L)
        graft.sources.Sidecar.markComplete(s, p)
      }
      Dedup.dropSeenNearDups(docs.filter(col("doc_id") % 2 === 1),
          col("doc_id"), col("text"), path)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // Raster⋈vector through the per-cell STRtree (reference join with
    // prebuilt index): same matches as the declarative q25 plan.
    "q98_raster_vector_join_indexed" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
      Raster.joinVectorIndexed(tiles, Tables.nationRects(s, dir), "n_geo",
          JoinPredicate.Intersects, cellSize = 150.0)
        .select(col("ulx").cast("long").as("ulx"), col("uly").cast("long").as("uly"),
          col("n_nationkey"))
        .orderBy(col("ulx"), col("uly"), col("n_nationkey"))
    }),

    // Cost-based BSP partitioner as an invariant query (the recursion is
    // driver-side and not SQL-replayable; its post-conditions are): every
    // row lands in a real region (part_id >= 0), no row vanishes, and no
    // region exceeds maxCost unless it is a single unsplittable cell.
    // All three computed Spark-side into columns the oracle pins.
    "q99_bsp_partition" -> ((s, dir) => {
      val parted = Partitioners.bspPartition(Tables.customerPts(s, dir),
        col("cx"), col("cy"), cellSize = 100.0, maxCost = 400L)
      val perRegion = parted.groupBy(col("part_id")).agg(count(lit(1)).as("__n"))
        .collect()
      val allAssigned = perRegion.forall(_.getInt(0) >= 0)
      val total = perRegion.map(_.getLong(1)).sum
      // cost bound: a region may only exceed maxCost when it is one cell
      // (unsplittable); check against the per-cell histogram
      val cellMax = Tables.customerPts(s, dir)
        .groupBy(floor(col("cx") / 100).cast("long").as("__cx"),
          floor(col("cy") / 100).cast("long").as("__cy"))
        .agg(count(lit(1)).as("__c"))
        .agg(max(col("__c"))).head().getLong(0)
      val costOk = perRegion.forall { r =>
        r.getLong(1) <= math.max(400L, cellMax)
      }
      import s.implicits._
      Seq((total, allAssigned, costOk)).toDF("n_rows", "all_assigned", "cost_respected")
    }),

    // Corpus report card: one row per source rolling up the curation
    // signals — doc/token volume, quality and fluency sums (exact
    // integers), and exact-duplicate document counts. The decision table a
    // pipeline reads before choosing mixing weights and gates.
    "q90_report" -> ((s, dir) => {
      // ONE materialized spread scan feeds every side (r15, guide §1.2 +
      // §2/§6, verdict item 4): the quality, fluency, exact-dup (md5) and
      // report-join sides each consume the documents scan under a
      // DIFFERENT projection, so a bare top-level repartition gets split
      // by column pruning into per-consumer scan+exchange copies — the
      // measured q90 plan carried SIX parquet scans with six RoundRobin
      // exchanges and zero ReusedExchange. An eager localCheckpoint of the
      // spread (doc_id, source, text) table costs one ~0.1 s pass and
      // hands every consumer the same 32-partition blocks: no re-scan, no
      // per-consumer exchange, kernels at session parallelism. A/B at
      // sf0.1 (3 runs each, same JVM): checkpoint 1.36/1.39 s vs bare top
      // spread 1.81/1.94 s vs r14 per-kernel spreads 1.81/1.26 s. The
      // blocks live until the caller's action completes (one text-sized
      // copy; the bench/verify harness unpersists between queries).
      val docs = Dedup.spread(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))).localCheckpoint()
      val withQ = TextAnalysis.withQuality(docs, col("text"))
      val withF = TextAnalysis.withBigramFluency(withQ, col("doc_id"), col("text"))
      val dups = docs.groupBy(md5(col("text").cast("binary")).as("__h"))
        .agg(count(lit(1)).as("__hc"))
      withF.withColumn("__h", md5(col("text").cast("binary")))
        .join(dups, "__h")
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("quality_e6")).as("sum_quality_e6"),
          sum(col("fluency_e6")).as("sum_fluency_e6"),
          sum(when(col("__hc") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
        .orderBy(col("source"))
    }),

    // Hybrid search: BM25 keyword candidates (top-50) reranked by
    // embedding cosine against a seed vector — lexical recall, semantic
    // precision, the standard two-stage retrieval composition. The rerank
    // window is unpartitioned BY CONSTRUCTION over exactly k=50 candidate
    // rows (bounded, never corpus-sized).
    "q89_hybrid" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val embs = Tables.load(s, dir, "embeddings")
      val cand = TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"), Bm25Terms, k = 50)
      val qv = embs.filter(col("vec_id") === 0)
        .select(col("embedding").as("__qv"))
      val scored = cand.join(embs, cand("doc_id") === embs("vec_id"))
        .crossJoin(broadcast(qv))
        .withColumn("__cos", stf.vec_dot(col("__qv"), col("embedding")) /
          (stf.vec_norm(col("__qv")) * stf.vec_norm(col("embedding"))))
      scored
        // global rank over the <=50-row candidate set; the partition key is
        // a NON-FOLDABLE zero (pmod of the id) — a literal would be
        // constant-folded out of the partition spec by Catalyst and trip
        // WindowExec's no-partition warning despite the bounded input
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(pmod(col("doc_id"), lit(1)))
            .orderBy(col("__cos").desc, col("doc_id"))).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("doc_id"), col("rank"))
        .orderBy(col("rank"))
    }),

    // Bigram-LM fluency scoring (the CCNet quality signal, integer-exact):
    // vocabulary-sized count tables joined per bigram instance, e6-floored
    // smoothed probabilities summed per doc.
    "q88_fluency" -> ((s, dir) => {
      TextAnalysis.withBigramFluency(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"))
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
        .orderBy(col("doc_id"))
    }),

    // The persisted IVF-PQ serving tier in the same everything-off
    // degenerate: probed cells of the stored CODES answer the query
    // (vectors never re-read), still equal to exact euclidean top-5.
    "q87_ann_ivfpq_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val path = storedOnce("ivfpqstore", dir)(p =>
        Similarity.buildIvfPqIndex(e, p, col("vec_id"), col("embedding"),
          nlist = 8, m = 8, ksub = n, iters = 0, sampleN = n))
      Similarity.ivfPqTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 8)
        .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Z-order layout round-trip: lineitem rewritten along the Morton curve
    // over (l_partkey, l_suppkey), then a two-column range filter over the
    // clustered store. Correctness = layout changes nothing; the pruning
    // property (tight per-file min/max boxes) is ZOrderSpec's assertion
    // and the reason the layout exists at 100 TB.
    "q84_zorder_scan" -> ((s, dir) => {
      val path = storedOnce("zorder_li", dir)(p =>
        ZOrder.write(Tables.load(s, dir, "lineitem"), p,
          Seq("l_partkey", "l_suppkey"), bits = 16, partitions = 16))
      s.read.parquet(path)
        .filter(col("l_partkey").between(5, 60) && col("l_suppkey").between(1, 6))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    }),

    // Point accessor over the tile struct (reference Tile.value/idxFromPos):
    // per tile, the pixel under a fixed in-frame world probe (row 4, col 2),
    // the anchor pixel, and an out-of-frame probe that must be NULL.
    "q77_tile_value" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
      def tv(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        stf.st_tile_value(col("ulx"), col("uly"), col("width"), col("height"),
          col("pixel_width"), col("data"), x, y)
      tiles.select(
          col("ulx").cast("long").as("ulx"), col("uly").cast("long").as("uly"),
          tv(col("ulx") + lit(25.0), col("uly") - lit(45.0)).as("v_probe"),
          tv(col("ulx"), col("uly")).as("v_anchor"),
          tv(col("ulx") - lit(1.0), col("uly")).as("v_out"))
        .orderBy(col("ulx"), col("uly"))
    }),

    // ANN scale path: IVF (seeded KMeans cells, nprobe probing).
    // Approximate by construction, so its driver row pins an IN-PLAN
    // invariant (the q92/q99 pattern) instead of the neighbor lists:
    // every query returns a full k, and overall recall vs the in-plan
    // q18 brute set clears a 20% floor (cross-multiplied integers;
    // measured 48-72% across sf0.001-0.1 — random embeddings swing
    // PER-QUERY recall to 0, hence the corpus-level bound). The
    // nprobe=nlist degenerate is hash-anchored exactly by q51.
    "q19_ann_ivf" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val ivf = Similarity.ivfTopK(e, q,
          col("vec_id"), col("vec_id"), col("embedding"), col("embedding"),
          k = 5, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"))
      val brute = Similarity.bruteTopK(e, q,
          col("vec_id"), col("vec_id"), col("embedding"), col("embedding"), k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val hits = ivf.join(brute, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("__h"))
      ivf.agg(count_distinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_results"))
        .crossJoin(hits) // 1-row stats x 1-row hit count
        .select(col("n_queries"), col("n_results"),
          (col("__h") * 5 >= col("n_results")).as("recall_ok"))
    }),

    // DBSCAN clustering — SURVEY §2.5 `cluster(minPts, epsilon, ...)`.
    // eps=32/minPts=5 on the integral customer lattice: 73 clusters, 499
    // noise at sf0.01; squared-distance predicate is exact.
    // reference cluster() signature parity: keyed on the GEOMETRY column,
    // centroid accessors feed the same kernel -> labels equal q20 exactly.
    "q159_dbscan_geom" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      DBSCAN.clusterGeom(c, col("c_custkey"), col("c_geo"), eps = 32.0, minPts = 5)
        .withColumnRenamed("id", "c_custkey")
        .orderBy(col("c_custkey"))
    }),

    "q20_dbscan" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      DBSCAN.cluster(c, col("c_custkey"), col("cx"), col("cy"), eps = 32.0, minPts = 5)
        .withColumnRenamed("id", "c_custkey")
        .orderBy(col("c_custkey"))
    }),

    // PCA whitening (the OPQ-style decorrelation step of the compression
    // ladder), verified by the q92/q99/q19 invariant pattern: the model
    // is approximate (power iteration), so Spark computes the checkable
    // CONTRACT into columns — orthonormal axes, descending eigenvalues,
    // per-axis corpus variance matching each eigenvalue (the sample IS
    // the corpus here), whitened variance ~1, and Parseval (projection
    // never gains energy) — and the oracle pins every flag TRUE.
    "q197_pca_whiten" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val n = e.count().toInt
      val mdl = Similarity.fitPca(e, col("vec_id"), col("embedding"),
        m = 8, iters = 200, sampleN = n)
      val dim = mdl.dim
      val ortho = (for (a <- 0 until mdl.m; b <- a until mdl.m) yield {
        val dot = (0 until dim).map(i => mdl.components(a)(i) * mdl.components(b)(i)).sum
        math.abs(dot - (if (a == b) 1.0 else 0.0))
      }).max <= 1e-4
      val desc = mdl.eigenvalues.sliding(2).forall {
        case Array(x, y) => x >= y - 1e-9 * mdl.eigenvalues(0); case _ => true
      }
      val proj = Similarity.pcaProject(e, col("embedding"), mdl).localCheckpoint()
      val varCols = (0 until mdl.m).map(k =>
        var_pop(element_at(col("pca"), k + 1)).as(s"v$k"))
      val vars = proj.agg(varCols.head, varCols.tail: _*).head()
      val varMatch = (0 until mdl.m).forall { k =>
        val v = vars.getDouble(k)
        v >= 0.98 * mdl.eigenvalues(k) && v <= 1.02 * mdl.eigenvalues(k)
      }
      val white = Similarity.pcaProject(e, col("embedding"), mdl, whiten = true,
        outName = "pcw")
      val wCols = (0 until mdl.m).map(k =>
        var_pop(element_at(col("pcw"), k + 1)).as(s"w$k"))
      val wVars = white.agg(wCols.head, wCols.tail: _*).head()
      val whiteOk = (0 until mdl.m).forall { k =>
        wVars.getDouble(k) >= 0.98 && wVars.getDouble(k) <= 1.02 }
      val bcMean = mdl.mean
      val parseval = proj.withColumn("__pc2",
          aggregate(col("pca"), lit(0.0d), (a, x) => a + x.cast("double") * x))
        .withColumn("__x2",
          aggregate(zip_with(col("embedding"),
              array(bcMean.map(lit): _*).cast("array<double>"),
              (x, mu) => (x.cast("double") - mu) * (x - mu)),
            lit(0.0d), (a, x) => a + x))
        .agg(min(col("__pc2") <= col("__x2") + lit(1e-6)).as("ok")).head().getBoolean(0)
      import s.implicits._
      Seq((mdl.m.toLong, dim.toLong, e.count(), ortho, desc, varMatch, whiteOk, parseval))
        .toDF("m", "dim", "n_vectors", "ortho_ok", "eig_desc_ok",
          "var_match_ok", "whiten_ok", "parseval_ok")
    }),

    // exact integer time-decayed counts (trending telemetry): one
    // halving per whole day of age — the staircase EWMA any SQL engine
    // replays bit-for-bit, unlike float decay scores.
    "q196_decayed_counts" -> ((s, dir) => {
      EventAnalytics.decayedCounts(Tables.load(s, dir, "events"),
          col("event_type"), col("ts"), halfLifeNs = 86400L * 1000000000L)
        .withColumnRenamed("key", "event_type")
        .orderBy(col("event_type"))
    }),

    // public connected-components surface (the distributed two-level
    // union-find that powers DBSCAN and the dedup families, exposed over
    // a user edge set): proximity graph (d <= 25 self-joined through the
    // cell-replicate distance join) -> per-node min-id component. Oracle:
    // recursive min-label closure over the same pairs.
    "q195_connected_components" -> ((s, dir) => {
      val c = Tables.customerPts(s, dir)
      // coincident customers share their entire proximity neighborhood
      // (and are trivially within d of each other), so the distance join
      // and the CC run on DISTINCT SITES keyed by each site's min custkey:
      // site connectivity == point connectivity, and the component min
      // over site min-ids IS the min custkey of the point component —
      // labels identical, edge volume Σ(sites)² instead of Σ(points)²
      // (15 coincident customers per site at sf0.1 ⇒ 225× fewer pairs).
      val sites = c.groupBy(col("cx"), col("cy"))
        .agg(min(col("c_custkey")).as("site_key"))
        .withColumn("s_geo", stf.st_point(col("cx"), col("cy")))
        .localCheckpoint()
      val pairs = SpatialJoin.distanceJoin(
          sites.select(col("site_key").as("a_key"), col("s_geo").as("a_geo")),
          sites.select(col("site_key"), col("s_geo")),
          col("a_geo"), col("s_geo"), maxDist = 25.0, cellSize = 100.0)
        .select(col("a_key").as("__a"), col("site_key").as("__b"))
      val comps = ConnectedComponents.run(pairs)
      c.join(
          sites.join(comps, col("site_key") === col("__id"))
            .select(col("cx").as("__sx"), col("cy").as("__sy"), col("__comp")),
          col("cx") <=> col("__sx") && col("cy") <=> col("__sy"))
        .select(col("c_custkey"), col("__comp").as("component"))
        .orderBy(col("c_custkey"))
    }),

    // ---- hashed-linear quality classifier (the CCNet/GPT-3 bootstrap:
    // heuristic seed labels -> linear model -> corpus-wide scoring) ----

    // train: per-feature counts + integer polarity weights; groupBy over a
    // dim-bounded key space (2^15), so the shuffle is O(tasks * dim).
    "q160_classifier_train" -> ((s, dir) => {
      Classifier.trainFromSeed(Tables.load(s, dir, "documents"), col("text"))
        .orderBy(col("feature"))
    }),

    // score: broadcast dense weights, map-side margin sum — zero shuffle.
    // τ self-calibrates to the training corpus's mean token polarity
    // (computed from the sketch-sized model, not a corpus pass); the gate
    // then splits ~52% at every sf and agrees with the seed label at
    // ~60% — the best a bag-of-words model can do on i.i.d. synthetic
    // tokens (the spec's separable corpus shows full recovery).
    "q161_classifier_score" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val model = Classifier.trainFromSeed(docs, col("text"))
      Classifier.scoreWith(docs, col("text"), model,
          tauE6 = Classifier.meanPolarityE6(model))
        .select(col("doc_id"), col("margin_e6"), col("n_tokens"), col("pred"))
        .orderBy(col("doc_id"))
    }),

    // persisted model store + gate: train once (staged write), score every
    // later batch through the loaded store.
    "q162_classifier_store" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("clfmodel_q162", dir) { p =>
        Classifier.saveModel(Classifier.trainFromSeed(docs, col("text")), p)
      }
      val model = Classifier.loadModel(s, path)
      Classifier.gate(docs, col("text"), model,
          tauE6 = Classifier.meanPolarityE6(model))
        .select(col("doc_id"), col("margin_e6"))
        .orderBy(col("doc_id"))
    }),

    // ---- raster (tile) algebra over the events grid ----
    // (pixel values serialized to CSV strings so hash-compare is type-safe)

    // vector -> raster (reference `rasterize`): 10x10-pixel tiles, pw=10.
    "q21_rasterize" -> ((s, dir) => {
      tileCsv(Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10))
    }),

    // raster filter + clip to a pixel-aligned box (reference raster filter).
    "q22_raster_clip" -> ((s, dir) => {
      tileCsv(Raster.filterClip(
        Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10),
        150.0, 150.0, 350.0, 350.0))
    }),

    // per-tile SMA stats (r_min/r_max/r_median) + zero-pixel count.
    "q23_tile_stats" -> ((s, dir) => {
      Raster.withTileStats(
          Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10))
        .select(col("ulx").cast("long").as("ulx"), col("uly").cast("long").as("uly"),
          col("t_min"), col("t_max"), col("t_median"), col("zero_pixels"))
        .orderBy(col("ulx"), col("uly"))
    }),

    // raster-wide histogram by pixel value (reference rasterHistogram).
    "q24_value_histogram" -> ((s, dir) => {
      Raster.valueHistogram(
          Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10))
        .orderBy(col("pixel_value"))
    }),

    // raster ⋈ vector via the cell-replicate spatial join on tile bounds.
    "q25_raster_vector_join" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
      Raster.joinVector(tiles, Tables.nationRects(s, dir), col("n_geo"),
          JoinPredicate.Intersects, cellSize = 150.0)
        .select(col("ulx").cast("long").as("ulx"), col("uly").cast("long").as("uly"),
          col("n_nationkey"))
        .orderBy(col("ulx"), col("uly"), col("n_nationkey"))
    }),

    // raster ⋈ raster pixel-level combine (click tiles + view tiles).
    "q26_raster_raster_join" -> ((s, dir) => {
      val e = Tables.eventPts(s, dir)
      val a = Raster.rasterize(e.filter(col("event_type") === "click"),
        col("ex"), col("ey"), 10.0, 10, 10)
      val b = Raster.rasterize(e.filter(col("event_type") === "view"),
        col("ex"), col("ey"), 10.0, 10, 10)
      tileCsv(Raster.joinRaster(a, b, (x, y) => x + y))
    }),

    // raster filter vs an ARBITRARY (non-rectangular) polygon with default
    // fill: tiles clipped to the MBR of tile ∩ triangle, pixels outside the
    // triangle get -1. Exercises the JTS clip kernel end-to-end.
    "q34_raster_filter_geom" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
      tileCsv(Raster.filterGeom(tiles,
        stf.st_geomfromwkt("POLYGON ((0 0, 375 0, 0 375, 0 0))"),
        JoinPredicate.Intersects, default = -1L))
    }),

    // general raster ⋈ raster over INTERSECTING (misaligned) tiles: the
    // view raster is shifted by a half tile, so the identical-grid equi-join
    // would match nothing — every pair here comes from the cell join +
    // intersection-frame resampling.
    "q35_raster_join_misaligned" -> ((s, dir) => {
      val e = Tables.eventPts(s, dir)
      val a = Raster.rasterize(e.filter(col("event_type") === "click"),
        col("ex"), col("ey"), 10.0, 10, 10)
      val b = Raster.rasterize(e.filter(col("event_type") === "view"),
          col("ex") + 50.0, col("ey") + 50.0, 10.0, 10, 10)
        .withColumn("ulx", col("ulx") - 50.0)
        .withColumn("uly", col("uly") - 50.0)
      tileCsv(Raster.joinRasterIntersecting(a, b, cellSize = 200.0, (x, y) => x + y))
    }),

    // equi-width bucket histogram over a varied-value raster (customer
    // density at pw=50): global min/max + bucketed counts, trailing empty
    // bucket included (reference createByteHistogram semantics).
    "q36_bucket_histogram" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.customerPts(s, dir), col("cx"), col("cy"), 50.0, 5, 5)
      Raster.bucketHistogram(tiles, buckets = 4).orderBy(col("bucket_lo"))
    }),

    // withValues(vs*): tiles containing ALL listed pixel values (SMA-style
    // min/max prefilter + exact membership).
    "q37_with_values" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.customerPts(s, dir), col("cx"), col("cy"), 50.0, 5, 5)
      tileCsv(Raster.withValues(tiles, 1L, 2L))
    }),

    // grid partitioner (SURVEY §2.10): partition-key histogram over the
    // packed cell id the partitioner shuffles on.
    "q27_grid_partition" -> ((s, dir) => {
      Partitioners.gridPartition(Tables.customerPts(s, dir), col("c_geo"),
          cellSize = 100.0, numPartitions = 8)
        .groupBy(col("part_cell")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("part_cell"))
    }),

    // STR-packing partitioner (the R-tree bulk-load leaf rule): 3x3
    // equal-count slices/runs over customer centroids, histogram of ids.
    "q41_rtree_partition" -> ((s, dir) => {
      Partitioners.strPartition(Tables.customerPts(s, dir), col("cx"), col("cy"),
          col("c_custkey"), numPartitions = 9)
        .groupBy(col("part_str")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("part_str"))
    }),

    // storage parity (SURVEY §2.1): save cell-partitioned parquet, reload
    // with load-time spatial pruning, exact-refine — rows equal the plain
    // polygon filter (the pruning itself is asserted in StorageSpec).
    "q28_store_pruned" -> ((s, dir) => {
      val path = storedOnce("store_q28", dir)(p =>
        CellStore.save(Tables.customerPts(s, dir), p, col("cx"), col("cy"), 100.0))
      val qry = "POLYGON ((150 150, 650 150, 650 450, 150 450, 150 150))"
      SpatialOps.containedBy(
          graft.sources.CellStore.loadIntersecting(s, path, qry, 100.0),
          col("c_geo"), stf.st_geomfromwkt(qry))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // Declarative store pruning (CellPruneRule): the user writes ONLY the
    // spatial predicate over a plain load; the optimizer derives the
    // envelope from the folded literal and injects the part_cx/part_cy
    // bounds, so Catalyst prunes cell directories with no explicit range
    // filter anywhere in user code (StorageSpec asserts the file counts).
    "q106_declarative_prune" -> ((s, dir) => {
      val path = storedOnce("store_q106", dir)(p =>
        CellStore.save(Tables.customerPts(s, dir), p, col("cx"), col("cy"),
          100.0, geomCol = Some("c_geo")))
      SpatialOps.containedBy(
          graft.sources.CellStore.load(s, path),
          col("c_geo"),
          stf.st_geomfromwkt("POLYGON ((200 100, 700 100, 700 500, 200 500, 200 100))"))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // Spatio-temporal store + declarative pruning: the reference's
    // SpatioTempPartitioner as a directory layout (spatial cell × day
    // bucket). The user writes ONE st_intersects against a time-carrying
    // constant over a plain load; CellPruneRule derives the cell range AND
    // the part_tb time-bucket bounds from the folded literal, so Catalyst
    // prunes both dimensions at file-listing time (asserted in StorageSpec).
    // Interval endpoints sit 500 µs off the day boundary so closed-vs-open
    // semantics can't be confused by a boundary-exact event instant.
    "q107_st_prune" -> ((s, dir) => {
      val path = storedOnce("store_q107", dir)(p =>
        CellStore.save(
          Tables.eventPts(s, dir).withColumn("et", expr("ts div 1000")),
          p, col("ex"), col("ey"), 100.0, geomCol = Some("e_geo"),
          tCol = Some(col("et")), timeBucket = 86400000000L))
      SpatialOps.intersects(
          graft.sources.CellStore.load(s, path),
          col("e_geo"),
          stf.st_with_time(
            stf.st_geomfromwkt(
              "POLYGON ((100.5 100.5, 400.5 100.5, 400.5 400.5, 100.5 400.5, 100.5 100.5))"),
            lit(1704844800000500L), lit(1705104000000500L)))
        .select(col("event_id")).orderBy(col("event_id"))
    }),

    // SemDeDup semantic dedup: k-means clusters bound the quadratic,
    // within-cluster cosine >= 0.42 groups collapse to their min id (0.42:
    // the q17-documented FP-safe threshold — nearest data value 1.7e-3
    // away). Fully deterministic, so the oracle replays Lloyd + closure.
    "q108_semantic_dedup" -> ((s, dir) => {
      Dedup.semanticDedup(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), k = 4, iters = 2, threshold = 0.42)
        .orderBy(col("id"))
    }),

    // D4-style prototypicality pruning: drop the 25% of each k-means
    // cluster closest to the centroid (most prototypical), keep the
    // diverse tail — exact integer rank gate, no window task per cluster.
    "q109_prototype_prune" -> ((s, dir) => {
      Similarity.prototypePrune(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), k = 4, iters = 2,
          keepNum = 3, keepDen = 4)
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    }),

    // leakage-safe split: every near-dup family (LSH pairs closed by CC)
    // lands in ONE split — a test doc's near-twin can't sit in train.
    "q110_family_split" -> ((s, dir) => {
      Dedup.assignSplitByFamily(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), splitSalt, splitFractions)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // reference tileFile CSV format: write + reload is the identity on the
    // rasterized event grid (oracle = the q21 rasterize SQL).
    "q38_tilefile_roundtrip" -> ((s, dir) => {
      val path = storedOnce("tilefile_q38", dir) { p =>
        val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
        graft.sources.TileStore.saveCsv(tiles, p)
      }
      tileCsv(graft.sources.TileStore.loadCsv(s, path))
    }),

    // cell-partitioned parquet tile store with load-time box pruning: only
    // tiles strictly overlapping [150,350]^2 come back (pruning itself is
    // asserted in StorageSpec).
    "q39_tile_store_pruned" -> ((s, dir) => {
      val path = storedOnce("tilestore_q39", dir) { p =>
        val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
        graft.sources.TileStore.save(tiles, p, cellSize = 100.0)
      }
      tileCsv(graft.sources.TileStore.loadIntersecting(s, path,
        150.0, 150.0, 350.0, 350.0, cellSize = 100.0, maxTileSpan = 100.0))
    }),

    // q39 through a BYTE-typed tile store (reference Tile[U],
    // raster/Tile.scala:15-18): pixels packed 1 byte each (8× smaller than
    // array<long> imagery), decoded transparently at load — the pruned read
    // must reproduce the same tiles. Counts are stored mod 97 so the values
    // genuinely fit the byte codec at every scale factor (sf0.1's hottest
    // pixel holds 200 events); the oracle replays the same mod.
    "q211_tile_store_byte" -> ((s, dir) => {
      val path = storedOnce("tilestore_q211", dir) { p =>
        val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"), 10.0, 10, 10)
          .withColumn("data", transform(col("data"), v => pmod(v, lit(97L))))
        graft.sources.TileStore.save(tiles, p, cellSize = 100.0, elementType = "byte")
      }
      tileCsv(graft.sources.TileStore.loadIntersecting(s, path,
        150.0, 150.0, 350.0, 350.0, cellSize = 100.0, maxTileSpan = 100.0))
    }),

    // multimodal plumbing: synthetic media payloads + typed metadata.
    "q29_multimodal_meta" -> ((s, dir) => {
      Multimodal.withSyntheticMedia(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), col("n_chars"))
        .select(col("doc_id"), col("media_type"), col("media_len"),
          col("width"), col("height"))
        .orderBy(col("doc_id"))
    }),

    // perceptual media near-dedup: 1-D aHash sketches of the decoded
    // payload stream, pigeonhole block join, hamming <= 3. Payloads are
    // one of 50 repeating units at varying repeat counts — the "same
    // content re-encoded at a different length" scenario the sketch is
    // built to catch (same-unit pairs land at hamming ~0 across lengths).
    "q119_media_ahash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").withColumn("media",
        repeat(md5(pmod(col("doc_id"), lit(50)).cast("string").cast("binary")),
          (pmod(col("n_chars"), lit(4)) + 2).cast("int")).cast("binary"))
      Multimodal.mediaAHashPairs(docs, col("doc_id"), col("media"),
          maxHam = 3, blocks = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // per-partition batched feature extraction over the binary column
    // (decode stub -> byte-sum feature + first-frame content hash).
    "q30_multimodal_features" -> ((s, dir) => {
      Multimodal.extractFeatures(
          Multimodal.withSyntheticMedia(Tables.load(s, dir, "documents"),
            col("doc_id"), col("text"), col("n_chars")), frames = 4)
        .select(col("doc_id"), col("byte_sum"), col("frame0_md5"))
        .orderBy(col("doc_id"))
    }),

    // frame sampling: explode video payloads into every-2nd-of-6 frame
    // rows (content-hashed so the oracle can replay the slicing).
    "q103_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
          Multimodal.withSyntheticMedia(Tables.load(s, dir, "documents"),
            col("doc_id"), col("text"), col("n_chars")), frames = 6, stride = 2)
        .select(col("doc_id"), col("frame_idx"), md5(col("frame")).as("frame_md5"),
          length(col("frame")).cast("long").as("frame_len"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // overlapping byte-window chunking (audio framing: window 40, hop 24).
    "q104_chunk_media" -> ((s, dir) => {
      Multimodal.chunkMedia(
          Multimodal.withSyntheticMedia(Tables.load(s, dir, "documents"),
            col("doc_id"), col("text"), col("n_chars")), window = 40, hop = 24)
        .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("chunk_md5"),
          length(col("chunk")).cast("long").as("chunk_len"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // token-mixture resampling: sources reweighted 3:1:2 inside a 6000-token
    // budget (integer-exact copies, hash-selected fractional copy).
    "q105_mixture" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Pipeline.mixtureSample(docs, col("source"), col("doc_id"),
          size(TextAnalysis.tokens(col("text"))), "mixq",
          Map("src0" -> 3L, "src1" -> 1L, "src2" -> 2L), budget = 6000L)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }),

    // covers join — boundary-INCLUSIVE, distinct from q6's contains.
    "q31_join_covers" -> ((s, dir) => {
      SpatialJoin.join(Tables.nationRects(s, dir), Tables.customerPts(s, dir),
          col("n_geo"), col("c_geo"), JoinPredicate.Covers, cellSize = 100.0)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // temporal interval-overlap self-join (the reference's IntervalTree use
    // case): event intervals [et, et+60s] that overlap, bucket-replicated
    // on 120s time cells with exact refine + reference-bucket dedup.
    "q42_interval_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      val a = e.select(col("event_id").as("id_a"), col("et").as("sa"),
        (col("et") + 60000000L).as("ea"))
      val b = e.select(col("event_id").as("id_b"), col("et").as("sb"),
        (col("et") + 60000000L).as("eb"))
      TemporalJoin.overlaps(a, b, col("sa"), col("ea"), col("sb"), col("eb"),
          bucket = 120000000L)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // q42 with the bucket DERIVED (bucket = -1): the typed operator's
    // auto-sizing twin of q245 — the sampled-median rule lands in the
    // same replication class as the hand-chosen 120 s for these uniform
    // 60 s intervals, and the oracle is unchanged because the bucket is
    // a replication-only knob.
    "q246_interval_join_auto" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      val a = e.select(col("event_id").as("id_a"), col("et").as("sa"),
        (col("et") + 60000000L).as("ea"))
      val b = e.select(col("event_id").as("id_b"), col("et").as("sb"),
        (col("et") + 60000000L).as("eb"))
      TemporalJoin.overlaps(a, b, col("sa"), col("ea"), col("sb"), col("eb"),
          bucket = -1L)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the SQL surface of the interval join (plans/RangeJoinRule — the
    // temporal twin of q57/q71's spatial SQL rewrites): a pure-SQL
    // overlap θ-join `ON sa <= eb AND sb <= ea` that would plan
    // nested-loop becomes the bucket-replicated HASH join with the
    // max-start report rule, under spark.graft.join.timeBucket. The
    // QueriesSpec cartesian lint doubles as the rewrite's own proof —
    // if the rule failed to fire, the plan would be a BNLJ and fail CI.
    // Conf discipline via withConf: set -> force optimizedPlan (cached
    // on the QueryExecution) -> restore, so no other query sees the
    // bucket.
    "q239_sql_interval_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      e.select(col("event_id").as("id_a"), col("et").as("sa"),
        (col("et") + 60000000L).as("ea")).createOrReplaceTempView("iv_a")
      e.select(col("event_id").as("id_b"), col("et").as("sb"),
        (col("et") + 60000000L).as("eb")).createOrReplaceTempView("iv_b")
      withConf(s, "spark.graft.join.timeBucket" -> "120000000") {
        // the dedup filter is stated in NON-inequality form: a pushed
        // `id_a < id_b` becomes a third crossing inequality inside the
        // join condition, making the interval decomposition ambiguous —
        // the rule then (correctly, loudly) declines the rewrite
        s.sql(
          "SELECT id_a, id_b FROM iv_a JOIN iv_b ON sa <= eb AND sb <= ea " +
          "WHERE least(id_a, id_b) = id_a AND id_a <> id_b " +
          "ORDER BY id_a, id_b")
      }
    }),

    // q239 with the bucket DERIVED instead of hand-tuned: timeBucket=-1
    // auto-sizes from a bounded sample of both sides' interval lengths
    // (next power of two ≥ the median span — intervals here are uniform
    // 60 s, so auto lands 2^26 μs ≈ 67 s, the same replication class as
    // the hand-chosen 120 s) — the last manual knob in the rewrite
    // family removed. Same DuckDB oracle as q42/q239: the bucket choice
    // affects replication only, never rows.
    "q245_sql_interval_auto" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      e.select(col("event_id").as("id_a"), col("et").as("sa"),
        (col("et") + 60000000L).as("ea")).createOrReplaceTempView("iv_a")
      e.select(col("event_id").as("id_b"), col("et").as("sb"),
        (col("et") + 60000000L).as("eb")).createOrReplaceTempView("iv_b")
      withConf(s, "spark.graft.join.timeBucket" -> "-1") {
        s.sql(
          "SELECT id_a, id_b FROM iv_a JOIN iv_b ON sa <= eb AND sb <= ea " +
          "WHERE least(id_a, id_b) = id_a AND id_a <> id_b " +
          "ORDER BY id_a, id_b")
      }
    }),

    // as-of join: each click pairs with the latest view at-or-before it
    // within 1h (ties by max view id) — bucket join + window rank, each
    // candidate meets in exactly one bucket.
    "q43_asof_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"), col("event_type"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("id_a"), col("et").as("ta"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("id_b"), col("et").as("tb"))
      TemporalJoin.asOf(clicks, views, leftId = "id_a", col("ta"), col("tb"),
          maxLookback = 3600000000L, tieBreak = col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"))
    }),

    // per-entity as-of join (q43 with an equality key — DuckDB ASOF
    // JOIN's default shape): each click pairs with the SAME USER's
    // latest at-or-before view within the lookback, on the keyed
    // carry-forward timeline (range-partitioned by (user, time), no
    // per-key hash skew, no lookback replication).
    "q233_asof_keyed" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("et"),
          col("event_type"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("id_a"), col("user_id").as("ua"),
          col("et").as("ta"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("id_b"), col("user_id").as("ub"),
          col("et").as("tb"))
      TemporalJoin.asOfKeyed(clicks, views, leftId = "id_a",
          col("ua"), col("ub"), col("ta"), col("tb"),
          maxLookback = 3600000000L, tieBreak = col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"))
    }),

    // SQL surface of the keyed as-of join (plans/AsOfJoinRule — the
    // third rewrite-family member after q57/q71's spatial and q239's
    // interval rewrites): the rank-and-keep-one shape a SQL user
    // actually writes — row_number() OVER (PARTITION BY left id ORDER
    // BY r.t DESC) = 1 over an inner join on key + time bounds — would
    // plan as a per-key pair EXPLOSION (candidates grow as per-key
    // density², the measured q43 pathology); under
    // spark.graft.join.asof it replans onto the carry-forward
    // union-timeline: one hash-partitioned window pass, zero join.
    // Views are pre-deduped to one per (user, instant) so the rank is
    // tie-free, which lets the oracle be DuckDB's NATIVE ASOF JOIN —
    // an independent engine's as-of semantics, not a re-statement of
    // our plan. AsOfJoinRuleSpec pins the plan shape (rewrite fired),
    // the conf-off differential, and the fire/no-fire gates.
    "q240_sql_asof_join" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("et"),
          col("event_type"))
      e.filter(col("event_type") === "click")
        .select(col("event_id").as("id_a"), col("user_id").as("ua"),
          col("et").as("ta"))
        .createOrReplaceTempView("ao_c")
      e.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("ub"), col("et").as("tb"))
        .agg(max(col("event_id")).as("id_b"))
        .createOrReplaceTempView("ao_v")
      withConf(s, "spark.graft.join.asof" -> "true") {
        s.sql(
          "SELECT id_a, id_b FROM (" +
          "SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
          "FROM ao_c c JOIN ao_v v ON v.ub = c.ua AND v.tb <= c.ta " +
          "AND v.tb > c.ta - 3600000000" +
          ") WHERE rn = 1 ORDER BY id_a, id_b")
      }
    }),

    // the LEFT OUTER SQL as-of (DuckDB `ASOF LEFT JOIN`): every click
    // survives — unmatched ones (no same-user view at-or-before, or a
    // NULL key the equality can never satisfy) carry a NULL id_b. The
    // rule's rewrite keeps the same timeline plan and turns the
    // drop-filter into a null-out; the oracle is again DuckDB's NATIVE
    // asof operator. Reuses q240's ao_c/ao_v views (Verify runs q240
    // first by map order — but don't rely on it: re-register here).
    "q241_sql_asof_left" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("et"),
          col("event_type"))
      e.filter(col("event_type") === "click")
        .select(col("event_id").as("id_a"), col("user_id").as("ua"),
          col("et").as("ta"))
        .createOrReplaceTempView("ao_c")
      e.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("ub"), col("et").as("tb"))
        .agg(max(col("event_id")).as("id_b"))
        .createOrReplaceTempView("ao_v")
      withConf(s, "spark.graft.join.asof" -> "true") {
        s.sql(
          "SELECT id_a, id_b FROM (" +
          "SELECT c.id_a, v.id_b, row_number() OVER " +
          "(PARTITION BY c.id_a ORDER BY v.tb DESC) AS rn " +
          "FROM ao_c c LEFT JOIN ao_v v ON v.ub = c.ua AND v.tb <= c.ta" +
          ") WHERE rn = 1 ORDER BY id_a")
      }
    }),

    // the typed keyed as-of in LEFT OUTER mode, WITH a lookback (the
    // combination the native-asof oracle can't express — DuckDB's
    // pushdown rejects a second inequality and a post-filter would
    // DROP unmatched rows instead of null-extending them — so the
    // oracle is the windowed LEFT JOIN replay): every click appears
    // once; an out-of-lookback latest view reads as NO match (exact by
    // the monotone argument).
    "q242_asof_keyed_left" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("et"),
          col("event_type"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("id_a"), col("user_id").as("ua"),
          col("et").as("ta"))
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("id_b"), col("user_id").as("ub"),
          col("et").as("tb"))
      TemporalJoin.asOfKeyed(clicks, views, leftId = "id_a",
          col("ua"), col("ub"), col("ta"), col("tb"),
          maxLookback = 3600000000L, tieBreak = col("id_b"), outer = true)
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"))
    }),

    // the as-of join's SECOND declarative SQL spelling: max_by over the
    // keyed time-bounded join (GROUP BY left id) — AsOfJoinRule replans
    // it onto the same carry-forward timeline as q240's rank form (the
    // struct ordering IS the rank's DESC key list). The q233 semantics
    // through a third independent surface; oracle = the windowed replay.
    "q243_sql_asof_maxby" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), expr("ts div 1000").as("et"),
          col("event_type"))
      e.filter(col("event_type") === "click")
        .select(col("event_id").as("id_a"), col("user_id").as("ua"),
          col("et").as("ta"))
        .createOrReplaceTempView("ao_c")
      e.filter(col("event_type") === "view")
        .select(col("event_id").as("id_b"), col("user_id").as("ub"),
          col("et").as("tb"))
        .createOrReplaceTempView("ao_v2")
      withConf(s, "spark.graft.join.asof" -> "true") {
        s.sql(
          "SELECT id_a, id_b FROM (" +
          "SELECT c.id_a, max_by(v.id_b, struct(v.tb, v.id_b)) AS id_b " +
          "FROM ao_c c JOIN ao_v2 v ON v.ub = c.ua AND v.tb <= c.ta " +
          "AND v.tb > c.ta - 3600000000 GROUP BY c.id_a" +
          ") ORDER BY id_a")
      }
    }),

    // STREAM-STREAM as-of enrich (streaming/EventStreams.asOfStreamStream)
    // replayed deterministically in batch Verify: clicks and views feed
    // two MemoryStreams in two in-order micro-batches split at a fixed
    // mid-corpus instant — batch 2 strictly after batch 1's max event, so
    // the 0-delay watermark admits every row and the streamed result
    // provably equals the batch asOfKeyed over the union (the
    // StreamingSpec parity theorem), making the windowed LEFT JOIN
    // replay (q242's shape) an exact oracle. Exercises the cross-batch
    // state carry: batch-2 clicks enrich from batch-1 views held in the
    // per-key right buffer. Millisecond time grain on BOTH sides
    // (java.sql.Timestamp currency of MemoryStream feeds).
    "q244_asof_stream_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val (clicks, views) = clickViewFeed(s, dir)
      val split = 1705363200000L // 2024-01-16T00:00:00Z, mid-corpus
      val lIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val rIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val out = graft.streaming.EventStreams.asOfStreamStream(
        lIn.toDF().toDF("id_a", "ua", "cts"),
        rIn.toDF().toDF("id_b", "ub", "vts"),
        "ua", "ub", "cts", "vts", maxLookbackMs = 3600000L,
        tieBreakColName = "id_b", watermarkDelay = "0 seconds", outer = true)
      // unique sink name: Bench executes each query twice in one session
      val sink = "q244_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // state partitions sized to the feed, not the core count — the conf
      // is captured when start() clones the session, restored right after
      // (r14 optimization: see streamStateParts)
      val q = withConfRun(s, "spark.sql.shuffle.partitions" ->
          streamStateParts(s, clicks.length + views.length).toString) {
        out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
      }
      try {
        // views BEFORE clicks in each feed round: the continuous trigger
        // may fire between the two addData calls, and rights arriving
        // early never changes as-of results (they wait in the buffer) —
        // lefts evaluated before their rights exist would miss them
        rIn.addData(views.filter(_._3.getTime < split).toSeq)
        lIn.addData(clicks.filter(_._3.getTime < split).toSeq)
        q.processAllAvailable()
        rIn.addData(views.filter(_._3.getTime >= split).toSeq)
        lIn.addData(clicks.filter(_._3.getTime >= split).toSeq)
        q.processAllAvailable()
      } finally q.stop()
      s.table(sink).select(col("id_a"), col("id_b")).orderBy(col("id_a"))
    }),

    // FINAL-emit stream-stream as-of under an ADVERSARIAL feed: every
    // click arrives a full batch BEFORE any view exists, yet the result
    // must equal the batch as-of exactly — emitMode = "final" holds each
    // left in state until the watermark passes its event time, so every
    // admissible right has been folded in when the left is answered
    // (eager mode would emit every click unenriched here). The watermark
    // delay covers the whole corpus so nothing is late; sentinel rows on
    // unused key −1 past max+lookback then drive the watermark over every
    // left, and the timeout flush drains the state (the standard
    // watermark-closing idiom for a finite replay). INNER mode — q240's
    // oracle shape at millisecond grain with the lookback conjunct.
    "q247_asof_stream_final" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx = s.sqlContext
      val (clicks, views) = clickViewFeed(s, dir)
      val delayMs = 60L * 24 * 3600 * 1000 // 60 days ≥ the corpus span
      val maxMs = (clicks.iterator ++ views.iterator).map(_._3.getTime).max
      val sentinel = (-1L, -1L,
        new java.sql.Timestamp(maxMs + delayMs + 3600000L + 1000L))
      val lIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val rIn = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, java.sql.Timestamp)]
      val out = graft.streaming.EventStreams.asOfStreamStream(
        lIn.toDF().toDF("id_a", "ua", "cts"),
        rIn.toDF().toDF("id_b", "ub", "vts"),
        "ua", "ub", "cts", "vts", maxLookbackMs = 3600000L,
        tieBreakColName = "id_b", watermarkDelay = s"$delayMs milliseconds",
        outer = false, emitMode = "final")
      val sink = "q247_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
      // state partitions sized to the feed, not the core count (see
      // streamStateParts — conf captured at start(), restored right after)
      val q = withConfRun(s, "spark.sql.shuffle.partitions" ->
          streamStateParts(s, clicks.length + views.length).toString) {
        out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
      }
      try {
        lIn.addData(clicks.toSeq)           // batch 1: ONLY lefts
        q.processAllAvailable()
        rIn.addData(views.toSeq)            // batch 2: ONLY rights
        q.processAllAvailable()
        lIn.addData(sentinel); rIn.addData(sentinel)
        q.processAllAvailable()
        // the timeout flush runs in the post-sentinel no-data batch —
        // poll until the sink is stable (bounded: ~30 s hard cap; 50 ms
        // cadence — the flush batch takes ~300 ms at feed-sized state
        // partitions, so a 200 ms poll only added dead time)
        var stable = 0; var last = -1L; var polls = 0
        while (stable < 3 && polls < 600) {
          q.processAllAvailable()
          val n = s.table(sink).count()
          if (n == last) stable += 1 else { stable = 0; last = n }
          polls += 1
          if (stable < 3) Thread.sleep(50)
        }
      } finally q.stop()
      s.table(sink).select(col("id_a"), col("id_b")).orderBy(col("id_a"))
    }),

    // ---- corpus-assembly pipeline primitives (operators/Pipeline.scala) ----

    // deterministic md5-prefix train/val/test split — pure map, no shuffle.
    "q44_split_assign" -> ((s, dir) => {
      Pipeline.assignSplit(Tables.load(s, dir, "documents"), col("doc_id"), splitSalt,
          splitFractions)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    // within-document repetition signals (Gopher-style quality family).
    "q47_repetition" -> ((s, dir) => {
      TextAnalysis.withRepetition(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("dup_2gram_e6"), col("dup_3gram_e6"),
          col("top_token_e6"))
        .orderBy(col("doc_id"))
    }),

    // per-source quota: first 20 docs per source by doc_id (two-phase top-n).
    "q45_source_cap" -> ((s, dir) => {
      Pipeline.capPerGroup(Tables.load(s, dir, "documents"), col("source"),
          col("doc_id"), n = 20)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // per-source TOKEN budget (training mixes are specified in tokens, not
    // docs): keep each source's doc_id-ordered prefix within 3000 chars.
    "q52_token_budget" -> ((s, dir) => {
      Pipeline.tokenBudgetPerGroup(Tables.load(s, dir, "documents"),
          col("source"), col("doc_id"), col("n_chars"), budget = 3000L)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // per-source sampling rates (epoch mixing): src0 upsampled 2.5x, src1
    // dropped, everything else halved — deterministic hash selection, copies
    // materialized with a copy index.
    "q53_sample_rates" -> ((s, dir) => {
      Pipeline.sampleByRate(Tables.load(s, dir, "documents"), col("source"),
          col("doc_id"), sampleSalt, Map("src0" -> 2.5, "src1" -> 0.0), 0.5)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }),

    // sequence packing (concat-and-chop into 1600-char context windows per
    // source): distributed prefix scan, every doc gets (bin, bin_offset).
    "q54_pack" -> ((s, dir) => {
      Pipeline.packSequences(Tables.load(s, dir, "documents"), col("source"),
          col("doc_id"), col("n_chars"), budget = 1600L)
        .select(col("doc_id"), col("source"), col("bin"), col("bin_offset"))
        .orderBy(col("doc_id"))
    }),

    // context-window chunking: 40-token windows every 30 tokens (overlap 10).
    "q55_chunk" -> ((s, dir) => {
      TextAnalysis.chunkTokens(Tables.load(s, dir, "documents"), col("text"),
          size = 40, stride = 30)
        .select(col("doc_id"), col("chunk_id"), col("chunk_text"), col("chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // deterministic epoch shuffle: exact global md5 rank, distributed
    // (range partition + per-partition rank + carry offsets — no global
    // single-task window).
    "q56_epoch_shuffle" -> ((s, dir) => {
      Pipeline.epochShuffle(Tables.load(s, dir, "documents"), col("doc_id"), "epoch0")
        .select(col("doc_id"), col("shuffle_rank"))
        .orderBy(col("doc_id"))
    }),

    // length-bucketed batching: global (ntok, id) rank via the distributed
    // prefix count, 32-row batches, per-batch padding target.
    "q113_length_batches" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      Pipeline.lengthBucketBatches(docs, col("doc_id"), col("ntok"), batchSize = 32)
        .select(col("doc_id"), col("batch_id"), col("batch_max_tokens"))
        .orderBy(col("doc_id"))
    }),

    // temperature-scaled mixture weights (alpha = 0.5 sqrt rule): one row
    // per source with its token total and e6 weight.
    "q117_temperature_mix" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      Pipeline.temperatureWeights(docs, col("source"), col("ntok"),
          sqrts = 1, groupName = "source")
        .orderBy(col("source"))
    }),

    // CCNet-style per-source perplexity buckets: bigram-fluency scores cut
    // into exact head/middle/tail tertiles within each source.
    "q118_ccnet_buckets" -> ((s, dir) => {
      val scored = TextAnalysis.withBigramFluency(
        Tables.load(s, dir, "documents"), col("doc_id"), col("text"))
      Pipeline.quantileBuckets(scored, col("source"), 3, "ppl_bucket",
          col("fluency_e6").desc, col("doc_id"))
        .select(col("doc_id"), col("source"), col("ppl_bucket"))
        .orderBy(col("doc_id"))
    }),

    // DSIR importance selection: raw = all documents, target = the 'src0'
    // subset; hashed unigram+bigram features in 1024 buckets, fixed-point
    // p/q ratio scores (e6 floor), top-120 most target-like documents.
    "q114_dsir_select" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Pipeline.dsirSelect(docs, col("doc_id"), col("text"),
          docs.filter(col("source") === "src0"), col("text"),
          buckets = 1024, n = 120)
        .select(col("doc_id"), col("dsir_score_e6"))
        .orderBy(col("doc_id"))
    }),

    // DSIR against the persisted model: build the frozen bucket-ratio store
    // once, score through the store path, same top-120 contract as q114 —
    // store==live is part of what the shared oracle pins.
    "q115_dsir_store" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("dsirstore", dir)(p =>
        Pipeline.buildDsirStore(docs, col("text"),
          docs.filter(col("source") === "src0"), col("text"), 1024, p))
      Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), path)
        .orderBy(col("dsir_score_e6").desc, col("doc_id")).limit(120)
        .select(col("doc_id"), col("dsir_score_e6"))
        .orderBy(col("doc_id"))
    }),

    // benchmark decontamination: corpus docs sharing >= 4 distinct trigram
    // shingles with an eval doc (eval set = doc_id % 17 == 0).
    "q46_decontam" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 0)
      Pipeline.contaminationPairs(docs, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"), n = 3, minOverlap = 4)
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // one-row corpus card: docs, tokens, unique contents, e6 dup rate,
    // median tokens — the summary a mix designer reads first.
    "q127_corpus_card" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      val basic = docs.agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique"))
      val med = Pipeline.groupPercentiles(docs, pmod(col("doc_id"), lit(1)),
          col("ntok"), Seq(50), groupName = "__g")
        .select(col("value").as("p50_tokens"))
      basic.crossJoin(broadcast(med))
        .withColumn("dup_rate_e6",
          ((col("n_docs") - col("n_unique")) * 1000000L -
            pmod((col("n_docs") - col("n_unique")) * 1000000L, col("n_docs")))
            / col("n_docs"))
        .select(col("n_docs"), col("n_tokens"), col("n_unique"),
          col("dup_rate_e6").cast("long").as("dup_rate_e6"), col("p50_tokens"))
    }),

    // round-robin source interleave: consecutive ranks cycle through
    // sources — batch diversity as a pure function of (corpus, salt).
    "q128_interleave" -> ((s, dir) => {
      Pipeline.interleaveBySource(Tables.load(s, dir, "documents"),
          col("doc_id"), col("source"), salt = "il1")
        .select(col("doc_id"), col("interleave_rank"))
        .orderBy(col("doc_id"))
    }),

    // mergeable-sketch telemetry: HyperLogLog distinct contents per source.
    // Register table + exact-integer raw estimate are hash-matched against
    // a full md5 replay; the corrected (linear-counting) estimate is pinned
    // within 12% of the exact distinct count — ~4σ at m=1024.
    "q129_hll_distinct" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val regs = Sketches.hllRegisters(docs, col("source"), col("text"),
        pBits = 10, salt = "hll", groupName = "source")
      val est = Sketches.hllEstimate(regs, pBits = 10, groupName = "source")
      val exact = docs.groupBy(col("source"))
        .agg(countDistinct(col("text")).as("__exact"))
      est.join(broadcast(exact), "source")
        .withColumn("est_ok", abs(col("est") / col("__exact") - 1.0) < 0.12)
        .select(col("source"), col("n_registers"), col("sum_rho"),
          col("est_raw_e6"), col("est_ok"))
        .orderBy(col("source"))
    }),

    // Count-Min heavy hitters: tokens whose depth-4 × width-2048 sketch
    // estimate reaches 100. Sound (overcount-only), and the whole counter
    // table is replayed by the oracle, so the estimates hash-match exactly.
    "q130_cms_topk" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
      val counters = Sketches.cmsCounters(toks, col("token"), lit(1L))
      Sketches.cmsHeavyHitters(counters, toks, col("token"), threshold = 100L)
        .withColumnRenamed("key", "token")
        .orderBy(col("token"))
    }),

    // pairwise source-overlap report via HLL set algebra: per source pair,
    // the UNION sketch (per-bucket max of both register sets) replayed to
    // the exact integer estimator — inclusion-exclusion overlap estimates
    // ride on these three cardinalities without any corpus self-join.
    "q135_source_overlap" -> ((s, dir) => {
      val regs = Sketches.hllRegisters(Tables.load(s, dir, "documents"),
        col("source"), col("text"), pBits = 10, salt = "hll", groupName = "source")
      Sketches.hllUnionPairs(regs, pBits = 10, groupName = "source")
        .select(col("source_a"), col("source_b"), col("n_registers"),
          col("sum_rho"), col("est_raw_e6"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // stratified exact-n holdout: each source's 5 smallest-md5 docs —
    // balanced per-source carve-outs with the q126 reproducibility rules.
    "q134_sample_per_group" -> ((s, dir) => {
      Pipeline.sampleExactPerGroup(Tables.load(s, dir, "documents"),
          col("source"), col("doc_id"), salt = "hold2", n = 5)
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),

    // fuzzy cross-corpus contamination pairs: corpus docs within n-gram
    // Jaccard >= 4/5 of an eval doc (eval set = doc_id % 17 == 0, as q46)
    // — banded MinHash candidates ACROSS tables + exact refine. Catches
    // the paraphrased leakage q46's exact-overlap rule is blind to.
    "q132_cross_minhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 0)
      Dedup.minhashCrossPairs(docs, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"))
        .select(col("id_a").as("doc_id"), col("id_b").as("bench_id"))
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // end-to-end fuzzy decontamination: kept == corpus − flagged, exactly
    // (the NOT-EXISTS oracle replays the Jaccard rule over all pairs).
    "q133_fuzzy_decontam" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 0)
      Pipeline.decontaminateFuzzy(docs, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // persisted-sketch path: HLL store built from the even half of the
    // corpus, odd half folded in by read-merge-rewrite. The merged
    // registers must equal one pass over the full corpus — which is
    // exactly what the oracle replays (merge transparency, the property
    // that makes sketch stores trustworthy for incremental ingestion).
    "q131_hll_store_merge" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val path = storedOnce("hllstore_q131", dir) { p =>
        Sketches.buildHllStore(docs.filter(col("doc_id") % 2 === 0),
          col("source"), col("text"), p, pBits = 10, salt = "hll")
        Sketches.mergeIntoHllStore(docs.filter(col("doc_id") % 2 === 1),
          col("source"), col("text"), p, pBits = 10, salt = "hll")
      }
      Sketches.hllEstimate(s.read.parquet(path), pBits = 10)
        .select(col("group").as("source"), col("n_registers"),
          col("sum_rho"), col("est_raw_e6"))
        .orderBy(col("source"))
    }),

    // HDR-style quantile histogram: per-event-type p50/p90/p99 from a
    // mergeable log-bucket histogram (≤ 1/32 relative bucket width);
    // the only window is partitioned by event_type over its own buckets.
    "q163_quantile_hist" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      Sketches.histQuantiles(
          Sketches.histCounts(ev, col("event_type"),
            round(col("value") * 1e6).cast("long")),
          Seq(50, 90, 99))
        .select(col("group").as("event_type"), col("p"), col("bucket"), col("lb_e6"))
        .orderBy(col("event_type"), col("p"))
    }),

    // collocation mining: word2vec phrase scores (discounted lift) over
    // adjacent token pairs — the phrase-aware-vocabulary pass; pair and
    // unigram counts are vocab-keyed shuffles, N is the whitelisted 1-row
    // stat cross join, top-k is TakeOrdered.
    "q165_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(Tables.load(s, dir, "documents"), col("text"),
        k = 50, minCount = 10L, discount = 5L)
    }),

    // scalar int8 quantization (faiss SQ8): per-dim affine codes from a
    // 64×(min,max) model, decode + exact cosine top-5 per query over the
    // reconstructions — the 4× compression tier measured end-to-end.
    "q166_scalar_quant" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val (mins, maxs) = Similarity.collectScalarModel(
        Similarity.scalarQuantModel(e, col("embedding")))
      Similarity.bruteTopKQuantized(e, e.filter(col("vec_id") < 10),
          col("vec_id"), col("vec_id"), col("embedding"), col("embedding"),
          k = 5, mins = mins, maxs = maxs)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // binary sign-quantized ANN: 128-bit codes (16× smaller than the 64-d
    // float vectors), Hamming pre-rank keeps 50 candidates per query, then
    // exact cosine reranks to top-5 — the corpus-wide pass reads only the
    // packed code words; the floats join back by id for candidates alone.
    "q170_binary_ann" -> ((s, dir) => {
      val e = Similarity.signQuantize(Tables.load(s, dir, "embeddings"),
        col("embedding"), dim = 64, bits = 128, salt = "sb1")
      Similarity.binaryTopK(e, e.filter(col("vec_id") < 10),
          col("vec_id"), col("vec_id"), col("code"), col("code"),
          col("embedding"), col("embedding"), k = 5, cand = 50)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // persisted binary-flat index: the SAME codes the live q170 path
    // computes, built once into a store (narrow code column + pigeonhole
    // block table + vectors for the refine); the search quantizes only
    // the query batch and scans the stored codes — row-identical to the
    // live plan, so it shares q170's full-replay oracle.
    "q171_binary_store" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("binstore", dir)(p =>
        Similarity.buildBinaryIndex(e, p, col("vec_id"), col("embedding"),
          dim = 64, bits = 128, salt = "sb1"))
      Similarity.binaryTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, cand = 50)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // exact multi-index Hamming near-dup gate: store the ODD originals'
    // sign codes, then gate an int8-RECONSTRUCTED copy of the whole
    // corpus (the q166 roundtrip — a re-encoded near-identical copy, the
    // canonical ingest-dedup case): reconstructed odds sit within
    // Hamming ≤ 3 of their stored original and are flagged; evens'
    // nearest stored code is ~30 bits away and they land. maxHamming <
    // blocks makes the pigeonhole candidate join LOSSLESS, so the flags
    // are exact semantics the oracle replays directly — no recall bound.
    "q172_hamming_gate" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("binhamstore", dir)(p =>
        Similarity.buildBinaryIndex(e.filter(col("vec_id") % 2 === 1), p,
          col("vec_id"), col("embedding"), dim = 64, bits = 128,
          salt = "sb1", blocks = 4))
      val (mins, maxs) = Similarity.collectScalarModel(
        Similarity.scalarQuantModel(e, col("embedding")))
      val batch = Similarity.scalarQuantize(e, col("embedding"), mins, maxs)
        .select(col("vec_id"),
          Similarity.scalarDecode(col("codes"), mins, maxs).as("rec"))
      val kept = Similarity.dropSeenHamming(batch, col("vec_id"), col("rec"),
          path, maxHamming = 3)
        .select(col("vec_id").as("__kept"))
      batch.select(col("vec_id"))
        .join(kept, col("vec_id") === col("__kept"), "left_outer")
        .select(col("vec_id"), col("__kept").isNull.as("is_dup"))
        .orderBy(col("vec_id"))
    }),

    // persisted histogram store: build on even event_ids, fold in the odd
    // half (crash-safe staged swap), read back the merged counters — the
    // oracle replays the FULL histogram, so the merge itself is verified.
    "q164_hist_store_merge" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val v = round(col("value") * 1e6).cast("long")
      val path = storedOnce("histstore_q164", dir) { p =>
        Sketches.buildHistStore(ev.filter(col("event_id") % 2 === 0),
          col("event_type"), v, p)
        Sketches.mergeIntoHistStore(ev.filter(col("event_id") % 2 === 1),
          col("event_type"), v, p)
      }
      Sketches.readHistStore(s, path)
        .select(col("group").as("event_type"), col("bucket"), col("cnt"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // the telemetry put to work: per-type p99 thresholds from the q164
    // store gate the raw events map-side (broadcast ≤ one row per type) —
    // "alert on above-p99 values" with the cut frozen at store-build time.
    "q167_hist_outliers" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      val v = round(col("value") * 1e6).cast("long")
      val path = storedOnce("histstore_q164", dir) { p =>
        Sketches.buildHistStore(ev.filter(col("event_id") % 2 === 0),
          col("event_type"), v, p)
        Sketches.mergeIntoHistStore(ev.filter(col("event_id") % 2 === 1),
          col("event_type"), v, p)
      }
      Sketches.histOutliers(ev, col("event_type"), v,
          Sketches.readHistStore(s, path), p = 99)
        .select(col("event_id"), col("event_type"), col("v_e6"), col("p_lb_e6"))
        .orderBy(col("event_id"))
    }),

    // Bloom decontamination probe: the eval set's (doc_id % 10 == 0) text
    // fingerprints live in a persisted fixed-size bitset (built on one
    // half, OR-merged with the other); every document is flagged by k
    // map-side broadcast bit tests — the probed corpus never shuffles.
    "q168_bloom_gate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Sketches.bloomMightContain(docs, col("text"),
          Sketches.readBloomStore(s, bloomStoreQ168(s, dir)), BloomM, BloomK)
        .select(col("doc_id"), col("might_contain"))
        .orderBy(col("doc_id"))
    }),

    // persisted Bloom store: build on half the bench set, OR-fold the
    // rest (crash-safe staged swap), read back the merged words — the
    // oracle replays the FULL bitset content (signed word values), so
    // the merge and the word-packed layout are both hash-verified.
    "q169_bloom_store_merge" -> ((s, dir) => {
      Sketches.readBloomStore(s, bloomStoreQ168(s, dir)).orderBy(col("word"))
    }),

    // curriculum ordering: 4 quality stages (longest docs first as the
    // easy tier), deterministic within-stage shuffle, dense global rank.
    "q125_curriculum" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      Pipeline.curriculumOrder(docs, col("doc_id"), col("ntok"),
          stages = 4, salt = "cur1")
        .select(col("doc_id"), col("stage"), col("curriculum_rank"))
        .orderBy(col("doc_id"))
    }),

    // deterministic exact-n global carve-out (nested-consistent holdouts).
    "q126_sample_exact" -> ((s, dir) => {
      Pipeline.sampleExact(Tables.load(s, dir, "documents"), col("doc_id"),
          salt = "holdout", n = 50)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // FLAGSHIP end-to-end curation: normalize -> exact-dedup (min id per
    // normalized content survives) -> length gate -> context-window
    // chunking, all one declarative plan; the oracle replays every stage.
    "q124_e2e_curation" -> ((s, dir) => {
      val norm = TextAnalysis.normalizeText(
        Tables.load(s, dir, "documents"), col("text"))
      val keep = Dedup.exact(norm, col("doc_id"), col("text_norm"))
        .select(col("keep_id"))
      val deduped = norm.join(keep, col("doc_id") === col("keep_id"), "left_semi")
      val gated = deduped.filter(size(split(col("text_norm"), " ")) >= 20)
      TextAnalysis.chunkTokens(gated, col("text_norm"), size = 40, stride = 40)
        .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // end-to-end decontamination: the corpus minus every doc q46 flags.
    "q121_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 17 === 0)
      Pipeline.decontaminate(docs, col("doc_id"), col("text"),
          bench, col("doc_id"), col("text"), n = 3, minOverlap = 4)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // exact per-source token-count percentiles (min/p25/median/p75/max)
    // through the distributed rank kernel — the corpus-report twin of q63.
    "q122_group_percentiles" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      Pipeline.groupPercentiles(docs, col("source"), col("ntok"),
          Seq(0, 25, 50, 75, 100), groupName = "source")
        .withColumn("percent", col("percent").cast("long"))
        .orderBy(col("source"), col("percent"))
    }),

    // Unicode-script composition counts (writing-system signal).
    "q123_scripts" -> ((s, dir) => {
      TextAnalysis.withScripts(Tables.load(s, dir, "documents"), col("text"))
        .select(col("doc_id"), col("n_latin"), col("n_cyrillic"),
          col("n_han"), col("n_digit"), col("n_len"))
        .orderBy(col("doc_id"))
    }),

    // STRtree-refined cell join: same pairs as q6 via the per-cell index
    // path (build tree over the cell's points, probe box envelopes).
    "q40_join_indexed" -> ((s, dir) => {
      SpatialJoin.joinIndexed(Tables.nationRects(s, dir), Tables.customerPts(s, dir),
          "n_geo", "c_geo", JoinPredicate.Contains, cellSize = 100.0)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // temporal containedby with an OPEN-ended container interval — the
    // reference's trickiest temporal edge case as a driver-checked query.
    "q32_temporal_containedby" -> ((s, dir) => {
      val qry = stf.st_with_open_interval(
        stf.st_geomfromwkt("POLYGON ((0 0, 400 0, 400 400, 0 400, 0 0))"), lit(T1))
      SpatialOps.containedBy(Tables.eventPts(s, dir), col("e_geo"), qry)
        .select(col("event_id")).orderBy(col("event_id"))
    }),

    // persisted per-cell R-trees (reference index() + saveAsObjectFile /
    // loadIndexed): the filter is answered from the serialized trees, no
    // index build at query time — rows equal the plain polygon filter.
    "q48_persisted_filter" -> ((s, dir) => {
      val path = persistedCustomerIndex(s, dir)
      IndexStore.filter(s, path,
          "POLYGON ((150 150, 650 150, 650 450, 150 450, 150 150))",
          JoinPredicate.ContainedBy)
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // persisted-index join: live nation rects probe the stored customer
    // trees (reference Persistent join) — pairs equal q40/q6.
    "q49_persisted_join" -> ((s, dir) => {
      val path = persistedCustomerIndex(s, dir)
      IndexStore.join(Tables.nationRects(s, dir), path, "n_geo",
          JoinPredicate.Contains)
        .select(col("n_nationkey"), col("c_custkey"))
        .orderBy(col("n_nationkey"), col("c_custkey"))
    }),

    // persisted IVF index (train-once/query-many ANN): nprobe = nlist
    // probes every cell, so results equal the exact brute-force top-k —
    // the oracle is q18's SQL. The store read is the pruned path either way.
    "q51_ann_ivf_store" -> ((s, dir) => {
      val path = storedOnce("ivfstore_q51c", dir) { p =>
        val e = Tables.load(s, dir, "embeddings")
        Similarity.buildIvfIndex(e, p, col("vec_id"), col("embedding"), nlist = 16)
      }
      val q = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 10)
      Similarity.ivfTopKIndexed(q, path, col("vec_id"), col("embedding"),
          k = 5, nprobe = 16)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // ANN takedown: one-ninth of the corpus is forgotten from the IVF
    // store by id tombstones — no rebuild, no retrain (the coarse
    // quantizer is a corpus statistic, not per-row state) — and the
    // full-probe serve must equal brute-force cosine over the REMAINING
    // vectors, which the oracle replays exactly.
    "q188_ann_forget" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val path = storedOnce("ivfforget", dir) { p =>
        Similarity.buildIvfIndex(e, p, col("vec_id"), col("embedding"), nlist = 16)
        Similarity.deleteFromAnnStore(
          e.filter(col("vec_id") % 9 === 4).select(col("vec_id")),
          col("vec_id"), p, batchId = 0L)
      }
      Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 10), path,
          col("vec_id"), col("embedding"), k = 5, nprobe = 16)
        .select(col("query_id"), col("neighbor_id"))
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    // visualization sink's distributed half: per-pixel point counts on a
    // 32x32 grid over [0,512)^2 (power-of-two scale => exact float math);
    // the PNG painter consumes exactly this histogram (VisualizeSpec).
    "q60_viz_bins" -> ((s, dir) => {
      Visualize.bins(Tables.eventPts(s, dir), col("ex"), col("ey"),
          0.0, 0.0, 512.0, 512.0, 32, 32)
        .orderBy(col("px"), col("py"))
    }),

    // visualization sink, geometry half: outline rasterization of the
    // nation rectangles on a 100x100 canvas over [0,1000)^2. Bresenham on
    // the axis-aligned box edges inks exactly the pixel-rect border between
    // the floor-mapped corners, which the SQL oracle reproduces with
    // generate_series (all coords are integers, so floor(v/10) is exact).
    "q68_viz_geom" -> ((s, dir) => {
      Visualize.geomBins(Tables.nationRects(s, dir), col("n_geo"),
          0.0, 0.0, 1000.0, 1000.0, 100, 100)
        .orderBy(col("px"), col("py"))
    }),

    // C4-style global first-occurrence dedup, demonstrated at token
    // granularity (sep = " "): each distinct token survives only at its
    // first (doc_id, position); documents reassemble from survivors.
    "q72_dedup_lines" -> ((s, dir) => {
      Dedup.dedupLines(Tables.load(s, dir, "documents"), col("doc_id"), col("text"),
          sep = " ")
        .select(col("doc_id"), col("text_dedup")).orderBy(col("doc_id"))
    }),

    // PII redaction: the corpus text is clean word soup, so PII-bearing
    // text is CONSTRUCTED deterministically from doc_id (both engines build
    // the identical string, then apply the identical pattern chain) — the
    // oracle therefore exercises every pattern + the documented order on
    // every row, not just the no-op path.
    "q73_redact_pii" -> ((s, dir) => {
      val raw = concat(
        substring(col("text"), 1, 40),
        lit(" mail user"), col("doc_id").cast("string"),
        lit("@mail.example.com ip 10.1.2."),
        pmod(col("doc_id"), lit(250)).cast("string"),
        lit(" tel +1 555-123-4567 card 4111111111111111 ssn 123-45-6789 end"))
      TextAnalysis.redactPii(
          Tables.load(s, dir, "documents").withColumn("raw", raw), col("raw"))
        .select(col("doc_id"), col("text_redacted")).orderBy(col("doc_id"))
    }),

    // canonical normalization: NFC composition (the probe suffix carries a
    // decomposed e + COMBINING ACUTE twice), control→space, space collapse,
    // trim, lowercase. The probe string constant is shared with the oracle
    // SQL builder, so both engines normalize byte-identical input.
    "q74_normalize" -> ((s, dir) => {
      val raw = concat(upper(substring(col("text"), 1, 30)), lit(normProbe))
      TextAnalysis.normalizeText(
          Tables.load(s, dir, "documents").withColumn("raw", raw), col("raw"))
        .select(col("doc_id"), col("text_norm")).orderBy(col("doc_id"))
    }),

    // temporal ordering + interval-stat surface (reference before/after,
    // Interval.center/length): events become closed intervals [et,
    // et + (event_id%86400)·1e6] and compare against the fixed [T1, T2] —
    // the oracle replays the interval `<` formula on the raw longs.
    "q75_temporal_order" -> ((s, dir) => {
      import graft.functions.stf
      val iv = stf.st_with_time(stf.st_point(col("ex"), col("ey")),
        expr("et"), expr("et + (event_id % 86400) * 1000000"))
      val qry = stf.st_with_time(stf.st_point(lit(0.0), lit(0.0)), lit(T1), lit(T2))
      Tables.eventPts(s, dir).withColumn("et", expr("ts div 1000"))
        .withColumn("iv", iv)
        .select(col("event_id"),
          stf.st_before(col("iv"), qry).as("is_before"),
          stf.st_after(col("iv"), qry).as("is_after"),
          stf.st_tcenter(col("iv")).as("tc"),
          stf.st_tlength(col("iv")).as("tl"))
        .orderBy(col("event_id"))
    }),

    // raster visualization half: rasterize events at pixelWidth=16, then
    // bin the tile pixels onto a 32x32 canvas over [0,512)^2 — the canvas
    // grid coincides with the raster grid (pixel centers at multiples of
    // 16 plus 8, exact in doubles), so each canvas pixel holds exactly the
    // per-cell count and the oracle is the q60 histogram with v = cnt.
    "q70_viz_raster" -> ((s, dir) => {
      val tiles = Raster.rasterize(Tables.eventPts(s, dir), col("ex"), col("ey"),
        pixelWidth = 16.0, tileW = 8, tileH = 8)
      // tiles are dense (zero-filled empty pixels); the oracle histogram
      // only has occupied cells, so gate on v > 0
      Visualize.rasterBins(tiles, 0.0, 0.0, 512.0, 512.0, 32, 32)
        .filter(col("v") > 0)
        .orderBy(col("px"), col("py"))
    }),

    // 3-D point round trip: z rides the WKB through construction and the
    // accessors read back exactly the source columns — the driver-level
    // proof of the z-coordinate surface (spec covers parquet/exchange).
    "q69_z_roundtrip" -> ((s, dir) => {
      import graft.functions.stf
      Tables.eventPts(s, dir)
        .withColumn("p", stf.st_point(col("ex"), col("ey"),
          expr("ts div 1000").cast("double")))
        .select(col("event_id"), stf.st_x(col("p")).as("px"),
          stf.st_y(col("p")).as("py"), stf.st_z(col("p")).as("pz"))
        .orderBy(col("event_id"))
    }),

    // cross-document duplicated 5-gram spans — the exact-substring dedup
    // signal (Lee et al.): per doc, distinct word 5-grams and how many of
    // them occur in at least one other document.
    "q61_dup_spans" -> ((s, dir) => {
      TextAnalysis.withDuplicatedSpans(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), k = 5)
        .select(col("doc_id"), col("n_spans"), col("n_dup_spans"))
        .orderBy(col("doc_id"))
    }),

    // exact-substring EXCISION (q61's destructive twin): every 5-gram span
    // occurring in >= 2 distinct docs is cut from the text everywhere; the
    // oracle replays the token-index set algebra in DuckDB SQL.
    "q112_remove_dup_spans" -> ((s, dir) => {
      TextAnalysis.removeDuplicateSpans(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), k = 5)
        .select(col("doc_id"), col("clean_text"), col("n_removed_tokens"))
        .orderBy(col("doc_id"))
    }),

    // maximal VARIABLE-LENGTH duplicated spans (Lee et al.'s exact-substring
    // regions, arXiv:2107.06499): overlapping duplicated 5-gram seeds merged
    // into per-doc islands — spans longer than k surface as ONE row with
    // their true length; q112's removed-token set is exactly their union.
    // The oracle replays the gaps-and-islands algebra over the same token
    // index sets.
    "q207_maximal_dup_spans" -> ((s, dir) => {
      TextAnalysis.maximalDuplicateSpans(Tables.load(s, dir, "documents"),
          col("doc_id"), col("text"), k = 5)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // incremental (cross-snapshot) dedup: sources 0-9 are the already-
    // ingested corpus persisted as a span store (distinct 5-gram spans +
    // Bloom sidecar, write-once); the new batch (sources 10+) drops docs
    // sharing >= 2 seen spans. Bloom prefilter + exact confirm join.
    "q62_incr_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val srcn = substring(col("source"), 4, 10).cast("int")
      val path = storedOnce("spanstore_q62b", dir)(p =>
        Dedup.buildSpanStore(docs.filter(srcn < 10), col("text"), k = 5, p))
      Dedup.dropSeenSpans(docs.filter(srcn >= 10), col("doc_id"), col("text"),
          k = 5, path, minOverlap = 2)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // batch sessionization: per-user sessions from 1-hour event-time gaps,
    // rolled up to the session table (count, bounds, duration) — the batch
    // twin of the streaming flatMapGroupsWithState sessionizer.
    "q137_sessionize" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("et", expr("ts div 1000"))
      val sess = TemporalJoin.sessionize(ev, col("user_id"), col("et"),
        col("event_id"), gap = 3600000000L)
      TemporalJoin.sessionStats(sess, col("user_id"), col("et"))
        .orderBy(col("user_id"), col("session_seq"))
    }),

    // LOCF resampling: weekly per-user grid, each instant carrying the
    // latest event_id at or before it (NULL before the first observation)
    // — one union + per-key window pass, no as-of replication.
    "q138_resample_locf" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("et", expr("ts div 1000"))
      TemporalJoin.resampleLocf(ev, col("user_id"), col("et"), col("event_id"),
          col("event_id"), step = 604800000000L)
        .orderBy(col("key"), col("grid_t"))
    }),

    // batch windowed distinct telemetry: distinct users per (event_type,
    // week) through the HLL registers — the batch twin of the streaming
    // windowedDistinctHll, sharing the same register kernel; composite
    // group = "type:weekstart" (both engines concat identically).
    "q146_windowed_distinct" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("et", expr("ts div 1000"))
        .withColumn("wk", col("et") - pmod(col("et"), lit(604800000000L)))
      val regs = Sketches.hllRegisters(ev,
        concat_ws(":", col("event_type"), col("wk")), col("user_id"))
      val est = Sketches.hllEstimate(regs)
      val exact = ev.groupBy(concat_ws(":", col("event_type"), col("wk")).as("group"))
        .agg(countDistinct(col("user_id")).as("__exact"))
      est.join(broadcast(exact), "group")
        .withColumn("est_ok", abs(col("est") / col("__exact") - 1.0) < 0.12)
        .select(col("group"), col("n_registers"), col("sum_rho"),
          col("est_raw_e6"), col("est_ok"))
        .orderBy(col("group"))
    }),

    // sketch-powered column profiler: per column, row/null counts, HLL
    // distinct-estimate replay columns, typed min/max — the DESCRIBE-grade
    // first look, one effective scan per column via parquet pruning.
    "q145_profile" -> ((s, dir) => {
      Sketches.profile(Tables.load(s, dir, "events"),
          Seq("event_type", "user_id"))
        .select(col("column"), col("n"), col("n_null"), col("n_registers"),
          col("sum_rho"), col("est_raw_e6"), col("min_v"), col("max_v"))
        .orderBy(col("column"))
    }),

    // snapshot diff: v1 = docs without the %7 slice, v2 = docs without
    // the %5 slice with every %3 doc's text revised — exercises all four
    // statuses deterministically from the one shared table.
    "q144_snapshot_diff" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val v1 = docs.filter(col("doc_id") % 7 =!= 0)
      val v2 = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      Pipeline.snapshotDiff(v1, col("doc_id"), col("text"),
          v2, col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    }),

    // semi-structured: JSON path extraction out of the props column
    // composing with aggregation — pure built-ins (get_json_object), the
    // §7 rule: generic relational surface needs zero custom code.
    "q142_json_props" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),

    // OLAP rollup: (event_type, week) counts + value sums with subtotal
    // and grand-total rows — the cube/rollup surface analytics users
    // expect, again zero custom code.
    "q143_rollup" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("et", expr("ts div 1000"))
        .withColumn("wk", col("et") - pmod(col("et"), lit(604800000000L)))
        .withColumn("value_e6", floor(col("value") * 1000000).cast("long"))
      ev.rollup(col("event_type"), col("wk"))
        .agg(count(lit(1)).as("n"), sum(col("value_e6")).as("sum_value_e6"))
        .orderBy(col("event_type").asc_nulls_first, col("wk").asc_nulls_first)
    }),

    // funnel: greedy in-order signup -> click -> purchase per user; stage
    // times are the earliest qualifying events in (time, event_id) order.
    "q139_funnel" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events").withColumn("et", expr("ts div 1000"))
      EventAnalytics.funnel(ev, col("user_id"), col("et"), col("event_id"),
          col("event_type"), Seq("signup", "click", "purchase"))
        .select(col("key").as("user_id"), col("reached"),
          expr("try_element_at(stage_times, 1)").as("t1"),
          expr("try_element_at(stage_times, 2)").as("t2"),
          expr("try_element_at(stage_times, 3)").as("t3"))
        .orderBy(col("user_id"))
    }),

    // retention cohorts: users cohorted by first-event week, each
    // (cohort, age) cell = distinct users active that many weeks later.
    "q140_retention" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events").withColumn("et", expr("ts div 1000"))
      EventAnalytics.retentionCohorts(ev, col("user_id"), col("et"),
          bucket = 604800000000L)
        .orderBy(col("cohort"), col("age"))
    }),

    // trailing-window features: per event, the user's event count and e6
    // value sum over the preceding hour (closed RANGE window) + the
    // cross-multiplied spike flag (value > 2x trailing mean).
    "q141_trailing_stats" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .withColumn("et", expr("ts div 1000"))
        .withColumn("value_e6", floor(col("value") * 1000000).cast("long"))
      EventAnalytics.withTrailingStats(ev, col("user_id"), col("et"),
          col("value_e6"), horizon = 3600000000L)
        .select(col("event_id"), col("trail_cnt"), col("trail_sum_e6"), col("spike"))
        .orderBy(col("event_id"))
    }),

    // novelty scoring vs the persisted span store (q62's store): sources
    // >= 10 scored by the fraction of their distinct 5-gram spans NOT in
    // the ingested corpus — the soft form of the drop gate.
    "q136_novelty_score" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val srcn = substring(col("source"), 4, 10).cast("int")
      val path = storedOnce("spanstore_q62b", dir)(p =>
        Dedup.buildSpanStore(docs.filter(srcn < 10), col("text"), k = 5, p))
      Dedup.scoreSeenSpans(docs.filter(srcn >= 10), col("doc_id"), col("text"),
          k = 5, path)
        .select(col("doc_id"), col("total_spans"), col("seen_spans"),
          col("novelty_e6"))
        .orderBy(col("doc_id"))
    }),

    // exact per-source quality-quantile gate: keep each source's top
    // quarter by (quality desc, doc_id) — distributed exact rank, no
    // single-task window, no approx percentile.
    "q63_quality_gate" -> ((s, dir) => {
      val q = TextAnalysis.withQuality(Tables.load(s, dir, "documents"), col("text"))
      Pipeline.quantileGate(q, col("source"), 1, 4,
          col("quality_e6").desc, col("doc_id"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // per-source duplicate-rate report over the winnowing fingerprint —
    // the corpus-health rollup (exact distinct counts, one shuffle).
    "q64_dup_rate" -> ((s, dir) => {
      val fp = TextAnalysis.withFingerprints(Tables.load(s, dir, "documents"), col("text"))
      Dedup.dupRateByGroup(fp, col("source"), col("fp_winnow"))
        .orderBy(col("grp"))
    }),

    // corpus vocabulary: top-50 tokens by count (tokenizer-training stat).
    "q65_vocab_topk" -> ((s, dir) => {
      TextAnalysis.vocabTopK(Tables.load(s, dir, "documents"), col("text"), k = 50)
        .orderBy(col("cnt").desc, col("token"))
    }),

    // adjacent-token pair counts: top-50 (the BPE merge statistic).
    "q66_pair_counts" -> ((s, dir) => {
      TextAnalysis.adjacentPairCounts(Tables.load(s, dir, "documents"), col("text"), k = 50)
        .orderBy(col("cnt").desc, col("t1"), col("t2"))
    }),

    // kNN JOIN against the persisted trees (the reference's indexed
    // knnJoin shape, true global-k): same pairs as the live q7, right
    // side never re-shuffled or re-indexed.
    "q67_knn_join_store" -> ((s, dir) => {
      val sup = Tables.supplierPts(s, dir)
      val path = persistedCustomerIndex(s, dir)
      IndexStore.knnJoin(sup, path, "s_geo", "s_suppkey", k = 5, tieBreak = "c_custkey")
        .select(col("s_suppkey"), col("c_custkey"))
        .orderBy(col("s_suppkey"), col("c_custkey"))
    }),

    // kNN answered from the persisted trees (reference indexed kNN over
    // persisted indexes): expand-box rounds read only candidate cells'
    // trees — same 20 customers as the live q5.
    "q58_knn_store" -> ((s, dir) => {
      val path = persistedCustomerIndex(s, dir)
      IndexStore.knn(s, path, 500.0, 500.0, k = 20, tieBreak = Seq("c_custkey"))
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // the pure-SQL planner path (reference StarkStrategy/STJoinExec): the
    // join is written as SQL TEXT with an st_* condition; SpatialJoinRule
    // (installed by GraftFunctions.register) rewrites it to the cell hash
    // join — same pairs as q6, but arriving through Catalyst, not the API.
    "q57_sql_join" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.nationRects(s, dir).createOrReplaceTempView("graft_nrect")
      Tables.customerPts(s, dir).createOrReplaceTempView("graft_cpts")
      s.sql("SELECT n_nationkey, c_custkey FROM graft_nrect JOIN graft_cpts " +
        "ON st_contains(n_geo, c_geo) ORDER BY n_nationkey, c_custkey")
    }),

    // the pure-SQL planner path for WITHIN-DISTANCE joins: SQL text with a
    // constant-radius st_within_distance condition; SpatialJoinRule
    // rewrites it to the radius-expanded cell hash join — same pairs as
    // q4, arriving through Catalyst.
    "q71_sql_distance_join" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.supplierPts(s, dir).createOrReplaceTempView("graft_spts")
      Tables.customerPts(s, dir).createOrReplaceTempView("graft_cpts")
      s.sql("SELECT s_suppkey, c_custkey FROM graft_spts JOIN graft_cpts " +
        "ON st_within_distance(s_geo, c_geo, 50.5) ORDER BY s_suppkey, c_custkey")
    }),

    // interval-tree live index (reference IntervalTree1 over JTS
    // SortedPackedIntervalRTree): same pairs as the declarative q42.
    "q50_interval_join_indexed" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      val a = e.select(col("event_id").as("id_a"), col("et").as("sa"),
        (col("et") + 60000000L).as("ea"))
      val b = e.select(col("event_id").as("id_b"), col("et").as("sb"),
        (col("et") + 60000000L).as("eb"))
      TemporalJoin.overlapsIndexed(a, b, "sa", "ea", "sb", "eb",
          bucket = 120000000L)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // DBScanModel.predict: classify NEW points (suppliers) against the
    // q20 clustering of customers — nearest core within eps wins, ties to
    // (cluster id, core id); unreachable points are noise. The oracle
    // replays the q20 recursive-CTE clustering plus the same rule.
    "q147_dbscan_predict" -> ((s, dir) => {
      val m = DBSCAN.model(Tables.customerPts(s, dir),
        col("c_custkey"), col("cx"), col("cy"), eps = 32.0, minPts = 5)
      DBSCAN.predict(m, Tables.supplierPts(s, dir),
          col("s_suppkey"), col("sx"), col("sy"), eps = 32.0)
        .withColumnRenamed("id", "s_suppkey")
        .orderBy(col("s_suppkey"))
    }),

    // DBScanModel summary: cluster/core/border/noise counts in ONE pass
    // over the model (reference numOfClusters plus the obvious siblings).
    "q150_dbscan_model_stats" -> ((s, dir) => {
      DBSCAN.model(Tables.customerPts(s, dir),
          col("c_custkey"), col("cx"), col("cy"), eps = 32.0, minPts = 5)
        .agg(
          count_distinct(when(col("cluster_id") =!= -1L, col("cluster_id"))).as("n_clusters"),
          sum(when(col("is_core"), 1L).otherwise(0L)).as("n_core"),
          sum(when(!col("is_core") && col("cluster_id") =!= -1L, 1L).otherwise(0L)).as("n_border"),
          sum(when(col("cluster_id") === -1L, 1L).otherwise(0L)).as("n_noise"))
    }),

    // eps tuning, reference DistanceHistogram: exact nearest-neighbor
    // distance per customer inside a 64-unit search radius, bucketed by
    // the integer-exact isqrt rule; radius misses land in overflow bucket
    // 16.
    "q148_kdist_histogram" -> ((s, dir) => {
      DBSCAN.kDistHistogram(Tables.customerPts(s, dir),
          col("c_custkey"), col("cx"), col("cy"), bucketWidth = 4L, nBuckets = 16)
        .orderBy(col("bucket"))
    }),

    // n-dimensional DBSCAN (the reference dbscan package is Vector-generic,
    // not 2-d): embeddings sliced to their first 3 dims, eps=0.05/minPts=5
    // → 8 clusters / 188 cores / 228 noise at sf0.01. vec_dist2 folds in
    // index order, so the oracle replays the predicate bit-for-bit.
    "q156_dbscan_vec" -> ((s, dir) => {
      DBSCAN.clusterVec(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), dims = 3, eps = 0.05, minPts = 5)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // n-dim DBScanModel.predict: train on the first 400 embeddings,
    // classify the held-out 100 — nearest core within eps, the q147 rule
    // in vector space.
    "q157_dbscan_vec_predict" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val m = DBSCAN.modelVec(e.filter(col("vec_id") < 400),
        col("vec_id"), col("embedding"), dims = 3, eps = 0.05, minPts = 5)
      DBSCAN.predictVec(m, e.filter(col("vec_id") >= 400),
          col("vec_id"), col("embedding"), dims = 3, eps = 0.05)
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // persisted n-dim DBSCAN model: classify the held-out vectors from
    // the parquet+sidecar store — labels must equal the live q157.
    "q158_dbscan_vec_model_store" -> ((s, dir) => {
      val path = storedOnce("dbscanvecmodel_q158", dir) { p =>
        val e = Tables.load(s, dir, "embeddings")
        DBSCAN.saveModelVec(
          DBSCAN.modelVec(e.filter(col("vec_id") < 400),
            col("vec_id"), col("embedding"), dims = 3, eps = 0.05, minPts = 5),
          p, dims = 3, eps = 0.05, minPts = 5)
      }
      DBSCAN.predictVecStored(s, path,
          Tables.load(s, dir, "embeddings").filter(col("vec_id") >= 400),
          col("vec_id"), col("embedding"))
        .withColumnRenamed("id", "vec_id")
        .orderBy(col("vec_id"))
    }),

    // the classic eps heuristic (Ester et al. 1996): the minPts-th NN
    // distance per point — k=5 matching q20's minPts; same exact isqrt
    // buckets, window partitioned per point (radius-bounded).
    "q155_kdist5_histogram" -> ((s, dir) => {
      DBSCAN.kDistHistogram(Tables.customerPts(s, dir),
          col("c_custkey"), col("cx"), col("cy"), bucketWidth = 8L,
          nBuckets = 8, k = 5)
        .orderBy(col("bucket"))
    }),

    // eps tuning, reference NeighborhoodHistogram: per-customer neighbor
    // count within eps=32 (self excluded), clamped integer buckets.
    "q149_neighborhood_histogram" -> ((s, dir) => {
      DBSCAN.neighborhoodHistogram(Tables.customerPts(s, dir),
          col("c_custkey"), col("cx"), col("cy"), eps = 32.0,
          bucketWidth = 2L, nBuckets = 8)
        .orderBy(col("bucket"))
    }),

    // persisted INTERVAL-TREE store (reference IntervalTreeConfig): the
    // temporal twin of q48/q49's R-tree live/persisted symmetry. Join
    // against the store == the live q42/q50 pairs exactly.
    "q151_interval_store_join" -> ((s, dir) => {
      val path = intervalEventStore(s, dir)
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      val a = e.select(col("event_id").as("id_a"), col("et").as("sa"),
        (col("et") + 60000000L).as("ea"))
      graft.sources.IntervalStore.overlapsJoin(a, path, "sa", "ea")
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // single-window overlap filter against the interval store: pure
    // declarative scan (pushed bucket range + exact refine + replica
    // dedup), no tree needed for one probe.
    "q152_interval_store_filter" -> ((s, dir) => {
      val path = intervalEventStore(s, dir)
      graft.sources.IntervalStore.filterOverlaps(s, path, T1, T1 + 43200000000L)
        .select(col("id_b").as("event_id"))
        .orderBy(col("event_id"))
    }),

    // persisted DBSCAN model (train-once/classify-many): predict from the
    // parquet+sidecar store must equal the live q147 classification —
    // the model/store symmetry the other operator families already have.
    "q154_dbscan_model_store" -> ((s, dir) => {
      val path = storedOnce("dbscanmodel_q154", dir) { p =>
        DBSCAN.saveModel(
          DBSCAN.model(Tables.customerPts(s, dir),
            col("c_custkey"), col("cx"), col("cy"), eps = 32.0, minPts = 5),
          p, eps = 32.0, minPts = 5)
      }
      DBSCAN.predictStored(s, path, Tables.supplierPts(s, dir),
          col("s_suppkey"), col("sx"), col("sy"))
        .withColumnRenamed("id", "s_suppkey")
        .orderBy(col("s_suppkey"))
    }),

    // persisted QUADTREE store (reference QuadTreeConfig): same stored
    // layout and query paths as the R-tree store, same result set as q48.
    "q153_quadtree_store_filter" -> ((s, dir) => {
      val path = storedOnce("qidxstore_q153", dir)(p =>
        IndexStore.saveIndexed(Tables.customerPts(s, dir), p, "c_geo",
          cellSize = 100.0, index = "quadtree"))
      IndexStore.filter(s, path,
          "POLYGON ((150 150, 650 150, 650 450, 150 450, 150 150))",
          JoinPredicate.ContainedBy)
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    })
  )

  /** Shared write-once interval store over the q42 event intervals
    * (id_b/sb/eb at bucket 120 s — the q42/q50 configuration). */
  /** Collected click/view MemoryStream feeds for the stream-stream as-of
    * replays (q244/q247): one slim (id, user, ts-ms) triple per row of
    * the events table. */
  private def clickViewFeed(s: SparkSession, dir: String)
      : (Array[(Long, Long, java.sql.Timestamp)],
         Array[(Long, Long, java.sql.Timestamp)]) = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000").as("etms"), col("event_type"))
    // bounded collect: one (long, long, long) triple per click/view row
    // of the MemoryStream feed — events is the smallest fact table
    // (~20k/side at sf0.1, ~3 MB); feeding a MemoryStream is inherently
    // driver-side (CollectBoundSpec-registered). ONE collect for both
    // sides (r14: the old per-side filters scanned events twice), split
    // in the driver — identical arrays, one Spark job
    val both = e.filter(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), col("etms"), col("event_type"))
      .collect()
    def side(t: String) = both.iterator.filter(_.getString(3) == t)
      .map(r => (r.getLong(0), r.getLong(1), new java.sql.Timestamp(r.getLong(2))))
      .toArray
    (side("click"), side("view"))
  }

  private def intervalEventStore(s: SparkSession, dir: String): String =
    storedOnce("ivstore_q151", dir) { p =>
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), expr("ts div 1000").as("et"))
      val b = e.select(col("event_id").as("id_b"), col("et").as("sb"),
        (col("et") + 60000000L).as("eb"))
      graft.sources.IntervalStore.save(b, p, "sb", "eb", bucket = 120000000L)
    }

  /** Shared write-once persisted-index store over customer points.
    * (Tag suffixes version the on-disk layout: "b" moved trees under /trees, "c" switched sidecars to plain FS files — a bump makes a stale cached store rebuild instead of half-reading.) */
  private def persistedCustomerIndex(s: SparkSession, dir: String): String =
    storedOnce("idxstore_q48c", dir)(p =>
      IndexStore.saveIndexed(Tables.customerPts(s, dir), p, "c_geo", cellSize = 100.0))

  /** Write-once store path, keyed by the dataset dir AND a fingerprint of
    * its parquet files (name/size/mtime): reruns in the same tmp space skip
    * the store write (Spark's _SUCCESS marker gates it) so bench timings
    * measure the pruned READ path, not repeated writes, while a dataset
    * regenerated in place gets a fresh store instead of silently serving
    * stale rows the oracle no longer sees.
    *
    * Writers run against a STAGING directory that is renamed into place
    * only after the whole callback returns: several stores are multi-step
    * (q131 builds an HLL store, then merge-rewrites it) and the first step
    * may legitimately commit its own _SUCCESS — without staging, a crash
    * between the steps would leave a half-built store that every later run
    * trusts as complete. An interruption anywhere in the callback leaves
    * only a stage directory the next run deletes and redoes; the final
    * path never exists in a partial state. Single-writer contract: the
    * check-then-write is not safe against two JVMs building the same store
    * concurrently (the driver runs Verify and Bench sequentially). */
  // q168/q169 Bloom parameters: m = 2^20 bits (16384 words ≈ 256 KB
  // broadcast), k = 5 — FPR (1 − e^(−k·n/m))^5 ≈ 2e-8 even at the sf1
  // bench-set size (5k docs); the oracle replays the bitset exactly, so
  // the flags stay hash-verified at ANY parameterization.
  private val BloomM = 1L << 20
  private val BloomK = 5

  /** The shared q168/q169 Bloom store: bench docs (doc_id % 10 == 0),
    * built from the % 20 half and OR-merged with the rest. */
  private def bloomStoreQ168(s: SparkSession, dir: String): String = {
    val bench = Tables.load(s, dir, "documents").filter(col("doc_id") % 10 === 0)
    storedOnce("bloomstore_q168", dir) { p =>
      Sketches.buildBloomStore(bench.filter(col("doc_id") % 20 === 0),
        col("text"), p, BloomM, BloomK)
      Sketches.mergeIntoBloomStore(bench.filter(col("doc_id") % 20 =!= 0),
        col("text"), p, BloomM, BloomK)
    }
  }

  /** Conf-gated query discipline in ONE place (the q239 lesson): set the
    * confs, FORCE the plan to optimize while they are set — plans are
    * lazy and `optimizedPlan` is cached on the QueryExecution, so forcing
    * here pins the gated rewrite into the returned frame — then restore
    * (or unset) every conf in `finally`, so no later Verify/Bench query
    * in the same session sees the gate, even when the body throws.
    * Hand-rolling this got the order wrong once; every conf-setting
    * query goes through here (spec: RangeJoinRuleSpec). */
  private[graft] def withConf(s: SparkSession, kvs: (String, String)*)
                             (body: => DataFrame): DataFrame = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val df = body
      df.queryExecution.optimizedPlan
      df
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** [[withConf]] for bodies that are not a single lazy DataFrame — e.g. a
    * micro-batch streaming run, where the conf must be live while
    * `writeStream.start()` plans the query (the stream clones the session
    * THEN, capturing spark.sql.shuffle.partitions as its state-partition
    * count for life). Same restore-in-finally discipline; the caller is
    * responsible for forcing whatever must be planned inside `body`.
    *
    * CONCURRENCY CONTRACT (r14 ADVICE): this mutates the SHARED session's
    * conf for the duration of `body` — a query planned concurrently on the
    * same SparkSession in that window would silently inherit the override.
    * Safe here because every engine surface (Verify, Bench, the driver's
    * oracle loop) executes queries strictly sequentially on one thread; a
    * concurrent caller must instead build its stream on `s.newSession()`
    * and set the conf on the clone. */
  private[graft] def withConfRun[A](s: SparkSession, kvs: (String, String)*)
                                   (body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** State-partition count for a finite MemoryStream replay: one state
    * partition per ~4k feed rows, capped at the session's shuffle
    * partitions (the production default — a real deployment sizes state
    * partitions to throughput, and the cap keeps the driver's scaling
    * bench comparable across core counts). Each HDFS-backed state-store
    * partition pays a per-BATCH file commit (measured ~50-130 ms on local
    * disk): at 32 partitions x 5 micro-batches the commits alone cost more
    * than the 40k-row feed's entire compute, so partitions must scale with
    * the data, not the core count (guide §2: partition counts derive from
    * input size). */
  private def streamStateParts(s: SparkSession, feedRows: Int): Int =
    math.max(1, math.min(
      s.conf.get("spark.sql.shuffle.partitions").toInt, feedRows / 4096 + 1))

  /** Code-version salt for [[storedOnce]]: md5 over the BYTECODE of every
    * graft class on the classpath, so editing ANY store-build kernel
    * provably invalidates the /tmp store caches (the r12
    * verification-integrity hole: input-only fingerprints let Verify
    * false-green against a store built by a pre-edit kernel until
    * someone remembered the manual `rm -rf /tmp/graft_*`). Coarse by
    * design — any main-source edit rebuilds all stores; correctness of
    * the verification loop beats cache thrift. Directory classpaths
    * (sbt target/classes — every dev and driver run) hash the class
    * files; a jar deployment falls back to the jar's identity
    * (path + length + mtime). Never silently empty: zero hashed inputs
    * is a hard error. Computed once per JVM. */
  private[graft] def codeSalt: String = codeSaltPair._1
  private[graft] def codeSaltInputs: Int = codeSaltPair._2
  private lazy val codeSaltPair: (String, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var hashed = 0
    def hashTree(f: java.io.File): Unit = {
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName).foreach(hashTree)
      else if (f.getName.endsWith(".class")) {
        md.update(java.nio.file.Files.readAllBytes(f.toPath)); hashed += 1
      }
    }
    // EVERY classpath root containing the graft package, not just the
    // first (getResource returns one URL): on a classpath where
    // test-classes precede main classes (sbt Test config) the first
    // match is test bytecode, and a main-kernel edit would not
    // invalidate the /tmp stores — a partial reopening of the r12
    // stale-store hole. Enumerate getResources and fold them all in,
    // sorted for determinism; jar roots hash by identity
    // (path + length + mtime).
    import scala.jdk.CollectionConverters._
    val urls = getClass.getClassLoader.getResources("graft").asScala.toSeq
      .sortBy(_.toString)
    require(urls.nonEmpty, "codeSalt: graft package not found on classpath")
    urls.foreach { url =>
      if (url.getProtocol == "file") hashTree(new java.io.File(url.toURI))
      else {
        // jar:file:/path/to.jar!/graft — hash the enclosing jar's identity
        val conn = url.openConnection()
        conn match {
          case j: java.net.JarURLConnection =>
            val jar = new java.io.File(j.getJarFileURL.toURI)
            md.update(s"${jar.getPath}:${jar.length()}:${jar.lastModified()}"
              .getBytes("UTF-8"))
            hashed += 1
          case _ =>
            md.update(url.toString.getBytes("UTF-8")); hashed += 1
        }
      }
    }
    require(hashed > 0, "codeSalt: no bytecode inputs hashed")
    (md.digest().take(6).map("%02x".format(_)).mkString, hashed)
  }

  private[graft] def storedOnce(tag: String, dir: String)(write: String => Unit): String = {
    val key = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val fp = java.lang.Long.toHexString(files.foldLeft(17L)((a, f) =>
      ((a * 31 + f.getName.hashCode) * 31 + f.length()) * 31 + f.lastModified()))
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${key}_${fp}_$codeSalt"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      def rmTree(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
        f.delete(); ()
      }
      val stage = new java.io.File(path + ".stage")
      rmTree(stage)                 // leftover from an interrupted build
      rmTree(new java.io.File(path)) // markerless partial from pre-staging code
      write(stage.getPath)
      require(stage.renameTo(new java.io.File(path)),
        s"storedOnce: rename ${stage.getPath} -> $path failed")
    }
    path
  }

  /** Canonical driver-checkable tile projection: integral bounds + CSV data. */
  private def tileCsv(tiles: DataFrame): DataFrame =
    tiles.select(col("ulx").cast("long").as("ulx"), col("uly").cast("long").as("uly"),
        col("width"), col("height"),
        concat_ws(",", transform(col("data"), x => x.cast("string"))).as("data_csv"))
      .orderBy(col("ulx"), col("uly"))

  // ---- shared oracles ----
  // Operator variants that must agree pairwise (live vs indexed vs
  // persisted vs SQL-text) reference ONE oracle string each, so a future
  // oracle fix cannot de-synchronize a documented "same result as" contract.

  /** q6 = q40 = q49 = q57: contains-join of nation boxes with customers. */
  private def boxJoinOracleSql: String =
    s"WITH nrect AS (${Tables.nationRectsSql}), cpts AS (${Tables.customerPtsSql}) " +
    "SELECT n_nationkey, c_custkey FROM nrect, cpts " +
    "WHERE cx > nx AND cx < nx+150 AND cy > ny AND cy < ny+150 " +
    "ORDER BY n_nationkey, c_custkey"

  /** q5 = q58: 20 nearest customers to (500, 500). */
  private def knn20OracleSql: String =
    s"WITH cpts AS (${Tables.customerPtsSql}) " +
    "SELECT c_custkey FROM (SELECT c_custkey FROM cpts " +
    "ORDER BY sqrt((cx-500)*(cx-500)+(cy-500)*(cy-500)), c_custkey LIMIT 20) " +
    "ORDER BY c_custkey"

  /** q7 = q67: global top-5 customers per supplier. */
  private def knnJoinOracleSql: String =
    s"WITH spts AS (${Tables.supplierPtsSql}), cpts AS (${Tables.customerPtsSql}) " +
    "SELECT s_suppkey, c_custkey FROM (" +
    "SELECT s_suppkey, c_custkey, row_number() OVER (PARTITION BY s_suppkey " +
    "ORDER BY sqrt((sx-cx)*(sx-cx)+(sy-cy)*(sy-cy)), c_custkey) AS rn FROM spts, cpts) " +
    "WHERE rn <= 5 ORDER BY s_suppkey, c_custkey"

  /** q42 = q50: interval-overlap self-join on 60s event windows. */
  private def intervalJoinOracleSql: String =
    s"WITH epts AS (${Tables.eventPtsSql}), " +
    "iv AS (SELECT event_id, et AS s, et + 60000000 AS e FROM epts) " +
    "SELECT a.event_id AS id_a, b.event_id AS id_b FROM iv a, iv b " +
    "WHERE a.event_id < b.event_id AND a.s <= b.e AND b.s <= a.e " +
    "ORDER BY id_a, id_b"

  /** q18 = q51 (nprobe = nlist is exact): cosine top-5 per query vector. */
  private def annTop5OracleSql: String =
    s"WITH e AS ($normedEmbSql), scored AS (" +
    "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
    s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ($dotSqlQC)/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
    "FROM (SELECT * FROM e WHERE vec_id < 10) q, e c WHERE c.vec_id != q.vec_id) " +
    "SELECT query_id, neighbor_id FROM scored WHERE rn <= 5 ORDER BY query_id, neighbor_id"

  /** q4 = q71: within-distance join pairs, radius 50.5 (the operator API
    * and the SQL-text planner path must agree exactly). */
  private def distanceJoinOracleSql: String =
    s"WITH spts AS (${Tables.supplierPtsSql}), cpts AS (${Tables.customerPtsSql}) " +
    "SELECT s_suppkey, c_custkey FROM spts, cpts " +
    "WHERE sqrt((sx-cx)*(sx-cx)+(sy-cy)*(sy-cy)) <= 50.5 " +
    "ORDER BY s_suppkey, c_custkey"

  /** q88, also embedded as the fluency CTE of q90's report: the add-one
    * bigram LM with e6 floors, replayed relationally — output
    * (doc_id, n_bigrams, fluency_e6). */
  /** Shared CTE chain of the bigram-fluency replay (also the base of the
    * q118 bucket oracle): `d` docs, `s` per-doc (ts, nb) sums. */
  private def fluencyCtesFor(src: String): String =
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $src),
      |u AS (SELECT w, CAST(count(*) AS BIGINT) AS u
      |      FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w),
      |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM u),
      |b AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
      |      FROM d, unnest(range(1, len(ws))) AS g(i)),
      |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b FROM b GROUP BY 1, 2),
      |t AS (SELECT doc_id,
      |        ((bc.b+1)*1000000 - ((bc.b+1)*1000000) % (u.u + vv.v)) // (u.u + vv.v) AS te
      |      FROM b JOIN u ON b.w1 = u.w
      |             JOIN bc ON b.w1 = bc.w1 AND b.w2 = bc.w2, vv),
      |s AS (SELECT doc_id, CAST(sum(te) AS BIGINT) AS ts,
      |             CAST(count(*) AS BIGINT) AS nb FROM t GROUP BY 1)""".stripMargin

  private val fluencyCtes: String = fluencyCtesFor("documents")

  /** The fluency replay over an arbitrary source relation — shared by
    * q88/q100/q184 (`documents`) and q186 (the post-takedown remainder):
    * model AND scored set both come from `src`. */
  private def fluencyOracleSqlFor(src: String): String =
    s"""WITH ${fluencyCtesFor(src)}
      |SELECT d.doc_id, COALESCE(nb, 0) AS n_bigrams,
      |       COALESCE((ts - ts % nb) // nb, 0) AS fluency_e6
      |FROM d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id""".stripMargin

  private val fluencyOracleSql: String = fluencyOracleSqlFor("documents")

  /** Trigram stupid-backoff replay (q217/q218/q219): model trained on the
    * `modelCond` documents, scored on the `scoreCond` documents — the
    * seen branch, the 0.4-bigram backoff and the 0.16-unigram floor all
    * replayed in one CASE with the same e6 floor arithmetic. */
  private def fluency3OracleSql(modelCond: String, scoreCond: String): String =
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |m AS (SELECT * FROM d WHERE $modelCond),
      |q AS (SELECT * FROM d WHERE $scoreCond),
      |u AS (SELECT w, CAST(count(*) AS BIGINT) AS u
      |      FROM (SELECT unnest(ws) AS w FROM m) GROUP BY w),
      |nn AS (SELECT CAST(sum(u) AS BIGINT) AS n FROM u),
      |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b FROM
      |  (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM m,
      |   unnest(range(1, len(ws))) AS g(i)) GROUP BY 1, 2),
      |tc AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS t FROM
      |  (SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3 FROM m,
      |   unnest(range(1, len(ws)-1)) AS g(i)) GROUP BY 1, 2, 3),
      |qt AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
      |       FROM q, unnest(range(1, len(ws)-1)) AS g(i)),
      |s1 AS (SELECT qt.doc_id,
      |  CASE WHEN tc.t IS NOT NULL
      |         THEN (tc.t*1000000 - (tc.t*1000000) % b12.b) // b12.b
      |       WHEN b23.b IS NOT NULL
      |         THEN (b23.b*400000 - (b23.b*400000) % u2.u) // u2.u
      |       ELSE (COALESCE(u3.u,0)*160000 - (COALESCE(u3.u,0)*160000) % nn.n) // nn.n
      |  END AS te
      |  FROM qt LEFT JOIN tc ON qt.w1=tc.w1 AND qt.w2=tc.w2 AND qt.w3=tc.w3
      |  LEFT JOIN bc b12 ON qt.w1=b12.w1 AND qt.w2=b12.w2
      |  LEFT JOIN bc b23 ON qt.w2=b23.w1 AND qt.w3=b23.w2
      |  LEFT JOIN u u2 ON qt.w2=u2.w
      |  LEFT JOIN u u3 ON qt.w3=u3.w, nn),
      |s AS (SELECT doc_id, CAST(sum(te) AS BIGINT) AS ts,
      |      CAST(count(*) AS BIGINT) AS nt FROM s1 GROUP BY 1)
      |SELECT d2.doc_id, COALESCE(nt, 0) AS n_trigrams,
      |       COALESCE((ts - ts % nt) // nt, 0) AS fluency3_e6
      |FROM (SELECT doc_id FROM documents WHERE $scoreCond) d2
      |LEFT JOIN s USING (doc_id) ORDER BY d2.doc_id""".stripMargin

  /** q25 = q98 (tree-refined path must match the declarative plan):
    * tile frames intersecting each nation rect. */
  private def rasterVectorJoinOracleSql: String =
    s"$rasterBaseSql, " +
    s"nrect AS (${Tables.nationRectsSql}) " +
    "SELECT CAST(tx*100 AS BIGINT) ulx, CAST(ty*100+100 AS BIGINT) uly, n_nationkey " +
    "FROM tiles, nrect " +
    "WHERE tx*100 <= nx+150 AND tx*100+100 >= nx AND ty*100 <= ny+150 AND ty*100+100 >= ny " +
    "ORDER BY ulx, uly, n_nationkey"

  /** q28 = q48: box filter over the pruned store equals the plain filter. */
  private def prunedBoxFilterOracleSql: String =
    s"WITH cpts AS (${Tables.customerPtsSql}) " +
    "SELECT c_custkey FROM cpts WHERE cx > 150 AND cx < 650 AND cy > 150 AND cy < 450 " +
    "ORDER BY c_custkey"

  /** q74's normalization probe, appended to each document: leading/trailing
    * junk to trim, a tab + newline + DEL to strip, double spaces to
    * collapse, uppercase to fold, and two DECOMPOSED accents (e + U+0301)
    * for NFC to compose. One Scala constant feeds both the Spark `lit` and
    * the DuckDB SQL literal, so the engines see byte-identical input
    * (Verify's JSON escaper handles the control characters). */
  private val normProbe = "  \t Cafe\u0301  \n DU  MARCHE\u0301 \u007f fin  "

  /** Winnowed fingerprint of `text` (shared by q12 and q64): min polynomial
    * hash over char 5-grams, H(i) = Σ cp(text[i+j])·257^(4-j) — the exact
    * formula TextAnalysis.rollingMinFp documents; short docs Horner-hash
    * their whole text (spelled out per length: no list_reduce dependency). */
  private def winnowFpSql: String = {
    def a(j: Int) = s"ascii(text[$j:$j])"
    "CAST(CASE WHEN text IS NULL THEN NULL " +
    "WHEN len(text) = 0 THEN 0 " +
    s"WHEN len(text) = 1 THEN ${a(1)} " +
    s"WHEN len(text) = 2 THEN ${a(1)}*257 + ${a(2)} " +
    s"WHEN len(text) = 3 THEN ${a(1)}*66049 + ${a(2)}*257 + ${a(3)} " +
    s"WHEN len(text) = 4 THEN ${a(1)}*16974593 + ${a(2)}*66049 + ${a(3)}*257 + ${a(4)} " +
    "ELSE list_min([ascii(text[i:i])*4362470401 + ascii(text[i+1:i+1])*16974593 + " +
    "ascii(text[i+2:i+2])*66049 + ascii(text[i+3:i+3])*257 + ascii(text[i+4:i+4]) " +
    "FOR i IN generate_series(1, len(text)-4)]) END AS BIGINT)"
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      ("SELECT l_returnflag, l_linestatus, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, " +
       "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents, " +
       "count(*) AS cnt FROM lineitem GROUP BY l_returnflag, l_linestatus " +
       "ORDER BY l_returnflag, l_linestatus"),

    "q2_filter_containedby" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM cpts WHERE cx > 100 AND cx < 600 AND cy > 100 AND cy < 700 " +
       "ORDER BY c_custkey"),

    "q3_filter_intersects_time" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       s"SELECT event_id FROM epts WHERE ex <= 250 AND ey <= 250 " +
       s"AND et >= $T1 AND et <= $T2 ORDER BY event_id"),

    "q4_distance_join" -> distanceJoinOracleSql,

    "q5_knn" -> knn20OracleSql,

    "q6_spatial_join" -> boxJoinOracleSql,

    "q7_knn_join" -> knnJoinOracleSql,

    "q8_skyline" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM cpts a WHERE NOT EXISTS (" +
       "SELECT 1 FROM cpts b WHERE (b.cx <= a.cx AND b.cy < a.cy) " +
       "OR (b.cx < a.cx AND b.cy <= a.cy)) ORDER BY c_custkey"),

    "q9_token_stats" ->
      ("SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens, " +
       "CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_uniq_tokens, " +
       "CAST(round(1000000.0 * len(list_distinct(string_split(text,' '))) / " +
       "len(string_split(text,' '))) AS BIGINT) AS ttr_e6 " +
       "FROM documents ORDER BY doc_id"),

    "q10_quality" ->
      ("WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents) " +
       "SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, " +
       s"CAST(len(list_filter(ws, w -> list_contains($stopListSql, w))) AS BIGINT) AS n_stopwords, " +
       "CAST(round(500000.0*len(list_distinct(ws))/len(ws) + " +
       s"500000.0*(len(ws)-len(list_filter(ws, w -> list_contains($stopListSql, w))))/len(ws)) AS BIGINT) " +
       "AS quality_e6 FROM t ORDER BY doc_id"),

    "q11_langid" ->
      ("WITH s AS (SELECT doc_id, " +
       langScoreSql.map { case (l, sql) => s"$sql AS s_$l" }.mkString(", ") +
       " FROM documents) " +
       "SELECT doc_id, CASE WHEN s_en=0 AND s_de=0 AND s_fr=0 AND s_es=0 THEN 'und' " +
       "WHEN s_en>=s_de AND s_en>=s_fr AND s_en>=s_es THEN 'en' " +
       "WHEN s_de>=s_fr AND s_de>=s_es THEN 'de' " +
       "WHEN s_fr>=s_es THEN 'fr' ELSE 'es' END AS lang_pred FROM s ORDER BY doc_id"),

    "q12_fingerprint" ->
      (s"SELECT doc_id, md5(text) AS fp_md5, $winnowFpSql AS fp_winnow " +
       "FROM documents ORDER BY doc_id"),

    "q13_dedup_exact" ->
      ("SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS dup_count " +
       "FROM documents GROUP BY md5(text) ORDER BY keep_id"),

    "q14_dedup_ngram" -> jaccardPairsSql,

    "q15_dedup_minhash" -> jaccardPairsSql,

    // full xxHash64 + SimHash replay in SQL (HUGEINT mod-2^64 arithmetic,
    // list_reduce folds); all-pairs hamming <= 3 == the pigeonhole join
    "q16_dedup_simhash" -> SimhashOracle.sql(3),

    "q114_dsir_select" -> DsirOracle.sql(1024, 120, "source = 'src0'"),

    // the store path must reproduce the live scores exactly
    "q115_dsir_store" -> DsirOracle.sql(1024, 120, "source = 'src0'"),

    // grown DSIR store folds to the one-pass ratios ⇒ q115's replay
    "q199_dsir_store_ingest" -> DsirOracle.sql(1024, 120, "source = 'src0'"),

    // compacted post-takedown DSIR: the same replay over the remaining
    // raw corpus (target carved from it too)
    "q204_dsir_compact" -> DsirOracle.sql(1024, 120, "source = 'src0'",
      rawWhere = "doc_id % 7 <> 3"),

    // lifecycle: BM25 over exactly the corpus the store should hold.
    // NOTE the %7=3 docs deleted BEFORE compaction only affect batches 0/1
    // (the %3=0 batch arrived after), while %5=1 hits everything.
    "q200_text_lifecycle" -> TextSearch.bm25ExactOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 5 <> 1 " +
      "AND NOT (doc_id % 7 = 3 AND doc_id % 3 <> 0))",
      "doc_id", "text", Bm25Terms, k = 25),

    // transitive closure of the exact-Jaccard pair graph; keep each
    // component's min id (mirrors q20's recursive-CTE pattern)
    "q59_drop_near_dups" ->
      (s"WITH RECURSIVE sh AS ($shingleSetSql), " +
       "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b WHERE a.doc_id < b.doc_id " +
       "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))), " +
       "e(a, b) AS (SELECT id_a, id_b FROM p UNION SELECT id_b, id_a FROM p " +
       "UNION SELECT doc_id, doc_id FROM documents), " +
       "reach(a, b) AS (SELECT a, b FROM e UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), " +
       "comp AS (SELECT a, min(b) AS c FROM reach GROUP BY a) " +
       "SELECT a AS doc_id FROM comp WHERE c = a ORDER BY doc_id"),

    // odd docs with no even near-dup partner (exact Jaccard >= 4/5 replays
    // the gate: LSH misses are ~1e-15 at these parameters)
    "q102_neardup_gate" -> neardupGateOracleSql,

    // the incrementally-built store holds the same bands/shingles as the
    // one-pass build ⇒ the same exact-Jaccard gate replay
    "q181_minhash_store_ingest" -> neardupGateOracleSql,

    // q59's closure, but the survivor is the max-n_chars member (tie: min id)
    "q101_drop_near_dups_best" ->
      (s"WITH RECURSIVE sh AS ($shingleSetSql), " +
       "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b WHERE a.doc_id < b.doc_id " +
       "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))), " +
       "e(a, b) AS (SELECT id_a, id_b FROM p UNION SELECT id_b, id_a FROM p " +
       "UNION SELECT doc_id, doc_id FROM documents), " +
       "reach(a, b) AS (SELECT a, b FROM e UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), " +
       "comp AS (SELECT a, min(b) AS c FROM reach GROUP BY a), " +
       "scored AS (SELECT comp.a AS id, comp.c AS c, d.n_chars AS sc " +
       "FROM comp JOIN documents d ON d.doc_id = comp.a), " +
       "best AS (SELECT c, max(sc) AS bs FROM scored GROUP BY c) " +
       "SELECT min(s.id) AS doc_id FROM scored s JOIN best ON s.c = best.c AND s.sc = best.bs " +
       "GROUP BY s.c ORDER BY doc_id"),

    "q17_dedup_cosine" ->
      (s"WITH e AS ($normedEmbSql) " +
       "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM e a, e b " +
       s"WHERE a.vec_id < b.vec_id AND ($dotSql) / (a.nrm*b.nrm) >= 0.42 " +
       "ORDER BY id_a, id_b"),

    // odd vectors with no even cosine-partner (exact cosine >= 0.42
    // replays the gate: LSH misses are ~5e-7 at 48/3)
    "q111_cosine_gate" -> cosineGateOracleSql,

    // auto-sized gate replay: exact cosine at 0.9 over the odd batch +
    // the ×1.25-perturbed stored vectors (float-rounded exactly as the
    // engine rounds, so both engines refine identical float inputs)
    "q234_coslsh_auto_gate" ->
      ("WITH sv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0), " +
       "pert AS (SELECT vec_id + 100000 AS vec_id, " +
       "list_concat([CAST(embedding[1]*1.25 AS FLOAT)], embedding[2:]) AS embedding FROM sv), " +
       "batch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1 " +
       "UNION ALL SELECT vec_id, embedding FROM pert), " +
       "bn AS (SELECT vec_id, embedding, sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN embedding])) AS nrm FROM batch), " +
       "sn AS (SELECT vec_id, embedding, sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN embedding])) AS nrm FROM sv), " +
       "hit AS (SELECT DISTINCT a.vec_id FROM bn a JOIN sn b ON " +
       "list_sum([CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE) FOR i IN generate_series(1,64)]) / (a.nrm*b.nrm) >= 0.9) " +
       "SELECT vec_id FROM batch WHERE vec_id NOT IN (SELECT vec_id FROM hit) " +
       "ORDER BY vec_id"),

    // incrementally-built cosine-LSH store == one-pass build ⇒ same replay
    "q182_coslsh_store_ingest" -> cosineGateOracleSql,

    // segmented-index BM25: per-segment df/stats fold to the one-pass
    // corpus statistics, so the q81 replay verifies the growth path
    "q183_bm25_store_ingest" -> TextSearch.bm25ExactOracleSql(
      "documents", "doc_id", "text", Bm25Terms, k = 25),

    "q33_dedup_cosine_lsh" ->
      (s"WITH e AS ($normedEmbSql) " +
       "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM e a, e b " +
       s"WHERE a.vec_id < b.vec_id AND ($dotSql) / (a.nrm*b.nrm) >= 0.42 " +
       "ORDER BY id_a, id_b"),

    "q18_ann_topk" -> annTop5OracleSql,

    // the IVF invariant row: full-k per query + the corpus-level recall
    // floor computed Spark-side into a flag the oracle pins TRUE
    "q19_ann_ivf" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_queries, " +
       "CAST(count(*)*5 AS BIGINT) AS n_results, true AS recall_ok " +
       "FROM embeddings WHERE vec_id < 10"),

    // md5-sign matrix replay -> double-accumulated projection rounded to
    // REAL once -> cosine top-5 on the 16-d sketch
    "q120_random_projection" ->
      ("WITH idx AS (SELECT i, j, CASE WHEN substr(md5(i || ':' || j || ':jl1'), 1, 1) < '8' " +
       "THEN 1.0 ELSE -1.0 END AS sg " +
       "FROM generate_series(0, 63) g1(i) CROSS JOIN generate_series(0, 15) g2(j)),\n" +
       "sgm AS (SELECT j, list(sg ORDER BY i) AS srow FROM idx GROUP BY j),\n" +
       "pj AS (SELECT vec_id, j, CAST(list_sum([CAST(embedding[i] AS DOUBLE) * srow[i] " +
       "FOR i IN generate_series(1, 64)]) AS REAL) AS pv FROM embeddings CROSS JOIN sgm),\n" +
       "pr AS (SELECT vec_id, list(pv ORDER BY j) AS proj FROM pj GROUP BY vec_id),\n" +
       "n AS (SELECT vec_id, proj, sqrt(list_sum([CAST(proj[i] AS DOUBLE)*CAST(proj[i] AS DOUBLE) " +
       "FOR i IN generate_series(1, 16)])) AS nrm FROM pr),\n" +
       "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       "list_sum([CAST(q.proj[i] AS DOUBLE)*CAST(c.proj[i] AS DOUBLE) FOR i IN generate_series(1, 16)])" +
       "/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
       "FROM (SELECT * FROM n WHERE vec_id < 10) q, n c WHERE c.vec_id != q.vec_id)\n" +
       "SELECT query_id, neighbor_id FROM scored WHERE rn <= 5 ORDER BY query_id, neighbor_id"),

    // exclusion-then-rank: negatives ranked AFTER dropping same-label
    // positives and self, band (2, 5]
    "q116_hard_negatives" ->
      (s"WITH e AS ($normedEmbSql), scored AS (" +
       "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
       s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ($dotSqlQC)/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
       "FROM (SELECT * FROM e WHERE vec_id < 10) q, e c " +
       "WHERE c.vec_id != q.vec_id AND c.label != q.label) " +
       "SELECT query_id, neighbor_id, rn AS neg_rank FROM scored " +
       "WHERE rn > 2 AND rn <= 5 ORDER BY query_id, neighbor_id"),

    // exact top-5 (same scored CTE shape as q18, 50 queries) -> label join
    // -> vote count -> deterministic argmax (votes desc, label asc)
    "q76_knn_classify" ->
      (s"WITH e AS ($normedEmbSql), scored AS (" +
       "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label, " +
       s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ($dotSqlQC)/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
       "FROM (SELECT * FROM e WHERE vec_id < 50) q, e c WHERE c.vec_id != q.vec_id), " +
       "v AS (SELECT query_id, label AS label_pred, count(*) AS votes FROM scored " +
       "WHERE rn <= 5 GROUP BY 1, 2), " +
       "r AS (SELECT query_id, label_pred, votes, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label_pred) AS arn FROM v) " +
       "SELECT query_id, label_pred, votes FROM r WHERE arn = 1 ORDER BY query_id"),

    // exact euclidean top-5 (the lossless-PQ twin), ties to lower neighbor
    "q79_ann_pq" -> euclidTop5OracleSql,

    // the stored-codes path answers from the SAME lossless codes ⇒ same
    // euclidean oracle
    "q80_ann_pq_store" -> euclidTop5OracleSql,

    // the same unrolled Lloyd recursion: init = k smallest ids, per
    // iteration argmin assignment (ties to lower cluster) + element-wise
    // mean, final assignment against the post-update centroids
    "q78_kmeans" -> kmeansOracleSql(k = 4, iters = 2),

    // integer BM25 replay generated from the operator's own constants —
    // formula drift between the Scala and SQL sides is impossible
    "q81_bm25" -> TextSearch.bm25ExactOracleSql(
      "documents", "doc_id", "text", Bm25Terms, k = 25),

    // first BPE merge: argmax pair of the initial char-symbol histogram
    "q82_bpe_first" -> Bpe.firstMergeOracleSql("documents", "text", 10000),

    // full 50-round merge table: recursive-CTE replay of the whole loop
    "q83_bpe_merges" -> Bpe.mergeTableOracleSql("documents", "text", 10000, 50),

    // WordPiece family: full integer replays (substring selection; the
    // fewest-token recursive-CTE DP; DP + longest-optimal walk)
    "q173_wordpiece_vocab" -> Wordpiece.vocabOracleSql("documents", "text", 60),
    "q174_wordpiece_segment" -> Wordpiece.segmentOracleSql("documents", "text", 60),
    "q175_wordpiece_tokens" ->
      Wordpiece.tokenCountOracleSql("documents", "doc_id", "text", 60),

    // stored vocab == learned vocab, so the store path shares q174's replay
    "q176_wordpiece_store" -> Wordpiece.segmentOracleSql("documents", "text", 60),

    // blocklist: matched-set replay via per-phrase contains
    "q191_blocklist" -> {
      val lits = BlockPhrases.map(p => s"'$p'").mkString("[", ", ", "]")
      s"""SELECT doc_id, CAST(len(lst) AS BIGINT) AS flagged_n,
         |       COALESCE(array_to_string(lst, ','), '') AS flagged_csv
         |FROM (SELECT doc_id,
         |        list_sort([p FOR p IN $lits IF contains(text, p)]) AS lst
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    // unigram Viterbi: full replay (weights + windowed DP + walk + cost)
    "q189_unigram_segment" -> Unigram.segmentOracleSql("documents", "text", 60),

    // hard-EM vocabulary training replays: the full seed → (E/M/prune)^3
    // chain, then (for q229) the final-vocab weighted segmentation
    "q228_unigram_em_learn" ->
      Unigram.learnVocabOracleSql("documents", "text", 60),
    "q229_unigram_em_segment" ->
      Unigram.emSegmentOracleSql("documents", "text", 60),

    // IVF-NSW degenerate exact (nprobe = nlist, unbounded beam) == the
    // euclidean brute top-5 the PQ family's lossless rows pin
    "q231_nsw_store" -> euclidTop5OracleSql,

    // invariant row: approximate-config recall vs the in-plan brute
    // anchor and the visited-node cost cap, both pinned TRUE
    "q232_nsw_recall" ->
      ("SELECT CAST(20 AS BIGINT) AS n_queries, TRUE AS recall_ok, " +
       "TRUE AS visited_capped"),

    // production-regime pin: beam quality + absolute beam-cost cap on
    // the deliberate single-cell store, both pinned TRUE
    "q235_nsw_bigcell" ->
      ("SELECT CAST(20 AS BIGINT) AS n_queries, TRUE AS recall_ok, " +
       "TRUE AS beam_cost_capped"),
    "q190_unigram_tokens" ->
      Unigram.tokenCountOracleSql("documents", "doc_id", "text", 60),

    // learning CTEs + the inference-loop recursive CTE (GPT-2 apply rule)
    "q177_bpe_segment_store" ->
      Bpe.segmentStoreOracleSql("documents", "text", 10000, 50),

    // lossless IVF-PQ degenerate ⇒ the same euclidean top-5 oracle
    "q85_ann_ivfpq" -> euclidTop5OracleSql,
    // the OPQ rotation is orthonormal: exact euclidean top-5 is invariant,
    // so the rotated stores share the plain stores' oracle
    "q208_pq_opq_store" -> euclidTop5OracleSql,
    "q209_ivfpq_opq_store" -> euclidTop5OracleSql,

    // invariant row: both stores' euclidean recall vs the in-plan lossless
    // anchor, the opq >= 1.2x pq margin claim and the OPQ floor pinned
    // TRUE (the exact multiplier is logged telemetry); n_exact_pairs
    // replayable (20 queries × top-10)
    "q212_opq_recall" ->
      ("SELECT CAST(count(*) * 10 AS BIGINT) AS n_exact_pairs, " +
       "CAST(100000 AS BIGINT) AS opq_floor_e6, " +
       "TRUE AS opq_beats_pq, TRUE AS opq_floor_ok " +
       "FROM embeddings WHERE vec_id < 20"),

    // invariant rows for the collapse paths (q20/q195 at sf1, where the
    // recursive label-closure oracles are quadratic): Spark computes each
    // DBSCAN/CC definition clause into a boolean, the oracle pins all TRUE
    // and replays the point count
    "q214_dbscan_invariants" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_points, TRUE AS totality_ok, " +
       "TRUE AS count_match_ok, TRUE AS core_flag_ok, " +
       "TRUE AS site_consistent_ok, TRUE AS min_core_id_ok, " +
       "TRUE AS core_edge_ok, TRUE AS border_rule_ok FROM customer"),
    "q215_cc_invariants" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_points, TRUE AS totality_ok, " +
       "TRUE AS label_is_min_member_ok, TRUE AS edge_consistent_ok " +
       "FROM customer"),

    // invariant row (the q92/q99 pattern): Spark computes the PCA-16
    // cosine-NN recall on the planted-spectrum table into recall_ok; the
    // oracle pins the claim TRUE and replays the replayable columns
    "q210_pca_ann_recall" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_queries, " +
       "CAST(700000 AS BIGINT) AS recall_floor_e6, TRUE AS recall_ok " +
       "FROM embeddings WHERE vec_id < 20"),

    // the stored postings answer with the SAME integer scores ⇒ q81's oracle
    "q86_bm25_store" -> TextSearch.bm25ExactOracleSql(
      "documents", "doc_id", "text", Bm25Terms, k = 25),

    // stored lossless IVF-PQ codes ⇒ the same euclidean top-5 oracle
    "q87_ann_ivfpq_store" -> euclidTop5OracleSql,

    // BM25 candidates as a CTE (its ORDER BY/LIMIT is load-bearing), then
    // the same sequential-fold cosine the other embedding oracles use
    "q89_hybrid" ->
      (s"WITH cand AS (${TextSearch.bm25ExactOracleSql(
            "documents", "doc_id", "text", Bm25Terms, k = 50)}), " +
       s"e AS ($normedEmbSql), qq AS (SELECT * FROM e WHERE vec_id = 0), " +
       "scored AS (SELECT cand.doc_id AS doc_id, " +
       s"row_number() OVER (ORDER BY ($dotSqlQC)/(q.nrm*c.nrm) DESC, cand.doc_id) AS rank " +
       "FROM cand JOIN e c ON cand.doc_id = c.vec_id, qq q) " +
       "SELECT doc_id, CAST(rank AS BIGINT) AS rank FROM scored " +
       "WHERE rank <= 10 ORDER BY rank"),

    // the same add-one bigram LM with e6 floors, replayed relationally
    "q88_fluency" -> fluencyOracleSql,

    // IEEE sqrt is correctly rounded in every engine — floor(1e6*sqrt(T))
    // is bit-identical (see Pipeline.temperatureWeights)
    "q117_temperature_mix" ->
      ("SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens, " +
       "CAST(floor(1000000 * sqrt(sum(len(string_split(text, ' '))))) AS BIGINT) AS weight_e6 " +
       "FROM documents GROUP BY source ORDER BY source"),

    // fluency replay + exact tertile: bucket = ((rank-1)*3) // count
    "q118_ccnet_buckets" ->
      (s"WITH $fluencyCtes,\n" +
       "fl AS (SELECT d.doc_id, COALESCE((ts - ts % nb) // nb, 0) AS fe " +
       "FROM d LEFT JOIN s USING (doc_id)),\n" +
       "j AS (SELECT fl.doc_id, documents.source, fe FROM fl JOIN documents USING (doc_id)),\n" +
       "r AS (SELECT doc_id, source, " +
       "row_number() OVER (PARTITION BY source ORDER BY fe DESC, doc_id) AS rn, " +
       "count(*) OVER (PARTITION BY source) AS cnt FROM j)\n" +
       "SELECT doc_id, source, ((rn-1)*3) // cnt AS ppl_bucket FROM r ORDER BY doc_id"),

    // the frozen-store path on its own training corpus ⇒ q88's oracle
    "q100_fluency_store" -> fluencyOracleSql,

    // segmented-LM fluency: per-segment counts fold to the one-pass
    // model, so the same full replay verifies the growth path
    "q184_lm_store_ingest" -> fluencyOracleSql,

    // takedown replays: the grown-then-forgotten stores must equal
    // one-pass builds over the REMAINING corpus — the oracles simply
    // filter the deleted docs out of the source relation
    "q185_text_index_forget" -> TextSearch.bm25ExactOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 3)",
      "doc_id", "text", Bm25Terms, k = 25),
    "q186_lm_forget" -> fluencyOracleSqlFor(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 3)"),

    // batched BM25 == UNION ALL of the per-query exact replays
    "q198_bm25_batch" -> BatchQueries.zipWithIndex.map { case (ts, i) =>
      s"SELECT CAST($i AS BIGINT) AS query_id, doc_id, score_e8 FROM (" +
        TextSearch.bm25ExactOracleSql("documents", "doc_id", "text", ts, 10) + ")"
    }.mkString("", " UNION ALL ", " ORDER BY query_id, score_e8 DESC, doc_id"),

    // phrase search: token-array comprehension replay, overlaps included
    "q194_phrase_search" -> TextSearch.phraseOracleSql(
      "documents", "doc_id", "text", PhraseQuery),

    // compaction must not change results: the q185/q186 replays verify
    // the whole grow → delete → compact lifecycle
    "q192_text_index_compact" -> TextSearch.bm25ExactOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 3)",
      "doc_id", "text", Bm25Terms, k = 25),
    "q193_lm_compact" -> fluencyOracleSqlFor(
      "(SELECT * FROM documents WHERE doc_id % 7 <> 3)"),
    // q187: the q102/q181 exact-Jaccard gate replay with every eighth
    // doc forgotten from the even-doc store
    "q187_minhash_forget" ->
      (s"WITH sh AS ($shingleSetSql), " +
       "hit AS (SELECT DISTINCT b.doc_id FROM sh b JOIN sh a " +
       "ON b.doc_id % 2 = 1 AND a.doc_id % 2 = 0 AND a.doc_id % 8 <> 0 " +
       "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))) " +
       "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 " +
       "AND doc_id NOT IN (SELECT doc_id FROM hit) ORDER BY doc_id"),

    // angular variant must equal the plain skyline ⇒ q8's dominance oracle
    "q91_skyline_angular" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM cpts a WHERE NOT EXISTS (" +
       "SELECT 1 FROM cpts b WHERE (b.cx <= a.cx AND b.cy < a.cy) " +
       "OR (b.cx < a.cx AND b.cy <= a.cy)) ORDER BY c_custkey"),

    // the partitioner invariant: Spark computes disjointness into a
    // column the oracle pins to TRUE; row count pins completeness
    "q92_temporal_partition" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS ranges_disjoint FROM events",

    // composite key replay: q27's cell formula on the event coords × a
    // one-day bucket over epoch micros
    "q93_st_partition" ->
      (s"WITH epts AS ($eventsRasterSql), " +
       "k AS (SELECT CAST(floor(ex/100) AS BIGINT)*4294967296 + CAST(floor(ey/100) AS BIGINT) AS part_cell, " +
       "CAST(floor((epoch_ns(ts)//1000)/86400000000) AS BIGINT) AS part_tbucket " +
       "FROM epts JOIN events USING (event_id)) " +
       "SELECT part_cell, part_tbucket, count(*) AS cnt FROM k " +
       "GROUP BY 1, 2 ORDER BY part_cell, part_tbucket"),

    // box-in-box coveredby: boundary-inclusive containment of the rects
    "q94_filter_coveredby" ->
      (s"WITH nr AS (${Tables.nationRectsSql}) " +
       "SELECT n_nationkey FROM nr WHERE nx >= 100 AND ny >= 100 " +
       "AND nx + 150 <= 700 AND ny + 150 <= 700 ORDER BY n_nationkey"),

    // both broadcast paths produce the cell join's pairs ⇒ q6's oracle
    "q95_broadcast_join" -> boxJoinOracleSql,
    "q96_broadcast_join_indexed" -> boxJoinOracleSql,

    // tree-refined raster⋈vector ⇒ q25's matches
    "q98_raster_vector_join_indexed" -> rasterVectorJoinOracleSql,

    // BSP post-conditions pinned: completeness + assignment + cost bound
    "q99_bsp_partition" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS all_assigned, " +
       "true AS cost_respected FROM cpts"),

    // pixels equal to 1 across the rasterized grid + existence flag
    "q97_count_value" ->
      (s"$rasterBaseSql " +
       "SELECT CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt, " +
       "sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) > 0 AS has_v FROM j"),

    // per-source rollup: quality/fluency sums are exact integers, dup
    // membership via the q13 md5 convention, fluency via q88's CTE
    "q90_report" ->
      (s"WITH fl AS (SELECT * FROM ($fluencyOracleSql)), " +
       "t AS (SELECT doc_id, source, text, string_split(text,' ') AS ws FROM documents), " +
       "q AS (SELECT doc_id, source, md5(text) AS h, CAST(len(ws) AS BIGINT) AS n_tokens, " +
       "CAST(round(500000.0*len(list_distinct(ws))/len(ws) + " +
       s"500000.0*(len(ws)-len(list_filter(ws, w -> list_contains($stopListSql, w))))/len(ws)) AS BIGINT) " +
       "AS quality_e6 FROM t), " +
       "hc AS (SELECT h, count(*) AS c FROM q GROUP BY h) " +
       "SELECT q.source, CAST(count(*) AS BIGINT) AS n_docs, " +
       "CAST(sum(q.n_tokens) AS BIGINT) AS sum_tokens, " +
       "CAST(sum(q.quality_e6) AS BIGINT) AS sum_quality_e6, " +
       "CAST(sum(fl.fluency_e6) AS BIGINT) AS sum_fluency_e6, " +
       "CAST(sum(CASE WHEN hc.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs " +
       "FROM q JOIN fl USING (doc_id) JOIN hc ON q.h = hc.h " +
       "GROUP BY q.source ORDER BY q.source"),

    // the z-ordered copy holds exactly the source rows
    "q84_zorder_scan" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem " +
       "WHERE l_partkey BETWEEN 5 AND 60 AND l_suppkey BETWEEN 1 AND 6 " +
       "ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey"),

    // probe (ulx+25, uly-45) on a 10x10/pw=10 tile is row 4, col 2 = pixel 42;
    // the anchor reads pixel 0; one probe left of the frame must be NULL
    "q77_tile_value" ->
      (s"$rasterBaseSql " +
       "SELECT CAST(tx*100 AS BIGINT) ulx, CAST(ty*100+100 AS BIGINT) uly, " +
       "max(CASE WHEN i = 42 THEN v END) AS v_probe, " +
       "max(CASE WHEN i = 0 THEN v END) AS v_anchor, " +
       "CAST(NULL AS BIGINT) AS v_out " +
       "FROM j GROUP BY tx, ty ORDER BY ulx, uly"),

    // nprobe = nlist ⇒ the persisted-IVF path is exact: same oracle as q18
    "q51_ann_ivf_store" -> annTop5OracleSql,

    // ANN takedown: brute top-5 over the corpus MINUS the forgotten ninth
    "q188_ann_forget" ->
      (s"WITH e AS ($normedEmbSql), scored AS (" +
       "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
       s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ($dotSqlQC)/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
       "FROM (SELECT * FROM e WHERE vec_id < 10) q, e c " +
       "WHERE c.vec_id != q.vec_id AND c.vec_id % 9 <> 4) " +
       "SELECT query_id, neighbor_id FROM scored WHERE rn <= 5 ORDER BY query_id, neighbor_id"),

    // two frozen-cell batch appends fold to the one-pass store ⇒ exact at
    // nprobe = nlist, same brute-cosine replay
    "q178_ivf_store_ingest" -> annTop5OracleSql,

    // two frozen-codebook appends in the lossless degenerate ⇒ the exact
    // euclidean oracle (q80's anchor)
    "q179_pq_store_ingest" -> euclidTop5OracleSql,

    // frozen-model IVF-PQ appends, lossless full-probe ⇒ q87's anchor
    "q180_ivfpq_store_ingest" -> euclidTop5OracleSql,
    "q213_ivfpq_opq_ingest" -> euclidTop5OracleSql,

    // DBSCAN: adjacency (self incl.) -> cores -> recursive closure over
    // core-core edges -> min-id cluster labels -> border = min neighboring
    // core cluster; noise = -1. Semantics identical to DBSCAN.cluster.
    "q20_dbscan" -> dbscanClusterOracleSql,

    // PCA invariants: every contract flag pinned TRUE, dims + count pinned
    "q197_pca_whiten" ->
      ("SELECT CAST(8 AS BIGINT) AS m, CAST(64 AS BIGINT) AS dim, " +
       "CAST(count(*) AS BIGINT) AS n_vectors, TRUE AS ortho_ok, " +
       "TRUE AS eig_desc_ok, TRUE AS var_match_ok, TRUE AS whiten_ok, " +
       "TRUE AS parseval_ok FROM embeddings"),

    // decayed counts: the same staircase in SQL (epoch_ns, >> halving)
    "q196_decayed_counts" ->
      ("WITH ev AS (SELECT event_type, epoch_ns(ts) AS t FROM events), " +
       "mx AS (SELECT max(t) AS now FROM ev) " +
       "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, " +
       "CAST(sum(1000000 >> least((now - t) // 86400000000000, 40)) AS BIGINT) AS decayed_e6 " +
       "FROM ev, mx GROUP BY event_type ORDER BY event_type"),

    // public CC: recursive min-label closure over the d<=25 pair graph
    // (distanceJoin emits self-pairs, so every point is its own node)
    "q195_connected_components" ->
      (s"WITH RECURSIVE cpts AS (${Tables.customerPtsSql}), " +
       "e AS (SELECT a.c_custkey AS u, b.c_custkey AS v FROM cpts a, cpts b " +
       "WHERE (a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy) <= 625.0), " +
       "reach(a, b) AS (SELECT u, u FROM e UNION " +
       "SELECT r.a, e.v FROM reach r JOIN e ON r.b = e.u) " +
       "SELECT a AS c_custkey, CAST(min(b) AS BIGINT) AS component " +
       "FROM reach GROUP BY a ORDER BY c_custkey"),

    // the geometry-keyed API must label identically (centroid accessors)
    "q159_dbscan_geom" -> dbscanClusterOracleSql,

    // hashed-linear classifier: full replay (xxh64 features via the
    // SimhashOracle chain, q10-quality seed labels, integer weights,
    // exact margin sums) — store-backed q162 shares the same algebra
    "q160_classifier_train" -> ClassifierOracle.trainSql,
    "q161_classifier_score" -> ClassifierOracle.scoreSql,
    "q162_classifier_store" -> ClassifierOracle.gateSql,

    // DBScanModel.predict replay: the q20 clustering CTEs + the
    // nearest-core rule (ties: d², then cluster id, then core id);
    // the store-backed classify must produce identical labels
    "q154_dbscan_model_store" -> dbscanPredictOracleSql,
    "q147_dbscan_predict" -> dbscanPredictOracleSql,

    // model summary: distinct clusters / core / border / noise counts
    "q150_dbscan_model_stats" ->
      (s"WITH RECURSIVE $dbscanClusterCtes " +
       "SELECT (SELECT count(DISTINCT cid) FROM clus) AS n_clusters, " +
       "(SELECT count(*) FROM core) AS n_core, " +
       "(SELECT count(*) FROM border) AS n_border, " +
       "(SELECT count(*) FROM cpts) - (SELECT count(*) FROM core) - " +
       "(SELECT count(*) FROM border) AS n_noise"),

    // k-dist histogram: exact NN distance within radius 64 (= 4*16),
    // integer-corrected isqrt bucketing, overflow bucket 16 for misses
    "q148_kdist_histogram" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}), " +
       "nn AS (SELECT a.c_custkey AS k, " +
       "min((a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy)) AS d2 " +
       "FROM cpts a JOIN cpts b ON a.c_custkey <> b.c_custkey " +
       "AND (a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy) <= 4096.0 GROUP BY 1), " +
       "s AS (SELECT p.c_custkey, nn.d2, CAST(floor(sqrt(nn.d2)) AS BIGINT) AS c0 " +
       "FROM cpts p LEFT JOIN nn ON nn.k = p.c_custkey), " +
       "b AS (SELECT CASE WHEN d2 IS NULL THEN 16 ELSE least((CASE " +
       "WHEN (c0+1)*(c0+1) <= d2 THEN c0+1 WHEN c0*c0 > d2 THEN c0-1 ELSE c0 END) // 4, 16) END AS bucket FROM s) " +
       "SELECT CAST(bucket AS BIGINT) AS bucket, CAST(bucket*4 AS BIGINT) AS bucket_lo, " +
       "count(*) AS n_points FROM b GROUP BY bucket ORDER BY bucket"),

    // 3-d vector DBSCAN replay: same recursive shape as q20's, distance =
    // the index-order double fold over the sliced embedding
    "q156_dbscan_vec" -> {
      val eps2 = 0.05 * 0.05
      val dist = "list_sum([(a.e[i]-b.e[i])*(a.e[i]-b.e[i]) FOR i IN generate_series(1,3)])"
      "WITH RECURSIVE v AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding[1:3]] AS e FROM embeddings), " +
      s"adj AS (SELECT a.vec_id AS ka, b.vec_id AS kb FROM v a, v b WHERE $dist <= $eps2), " +
      "core AS (SELECT ka AS k FROM adj GROUP BY ka HAVING count(*) >= 5), " +
      "cedge AS (SELECT ka, kb FROM adj WHERE ka IN (SELECT k FROM core) AND kb IN (SELECT k FROM core)), " +
      "reach(a, b) AS (SELECT k, k FROM core UNION SELECT r.a, e.kb FROM reach r JOIN cedge e ON r.b = e.ka), " +
      "clus AS (SELECT a AS k, min(b) AS cid FROM reach GROUP BY a), " +
      "border AS (SELECT n.ka AS k, min(c.cid) AS cid FROM adj n JOIN clus c ON n.kb = c.k " +
      "WHERE n.ka NOT IN (SELECT k FROM core) GROUP BY n.ka) " +
      "SELECT p.vec_id, COALESCE(cl.cid, b.cid, -1) AS cluster_id, " +
      "cl.k IS NOT NULL AS is_core " +
      "FROM v p LEFT JOIN clus cl ON cl.k = p.vec_id LEFT JOIN border b ON b.k = p.vec_id " +
      "ORDER BY p.vec_id"
    },

    // high-dim predict replays: q157's CTE pattern at dims=16/eps=0.45 —
    // the stored route (q225) must match the live kernel bit-for-bit
    "q224_dbscan_highdim_predict" -> dbscanVecPredictOracleSqlFor(16, 0.45, 5),
    "q225_dbscan_highdim_store" -> dbscanVecPredictOracleSqlFor(16, 0.45, 5),

    // invariant row for the kNN-join collapse at scale: cardinality +
    // coincident-answer consistency + a 100-query in-plan brute
    // differential, all pinned TRUE; n_left replayable
    "q223_knn_join_invariants" ->
      ("SELECT CAST(count(*) AS BIGINT) AS n_left, CAST(5 AS BIGINT) AS k, " +
       "TRUE AS cardinality_ok, TRUE AS coincident_ok, " +
       "TRUE AS sample_exact_ok FROM supplier"),

    // independent SQL rebuild of the GPT-2 byte↔unicode construction:
    // printable ranges self-map, the rest take 256+n by a row_number over
    // the non-printable partition in byte order
    "q221_bpe_byte_table" ->
      ("WITH m AS (SELECT i AS byte, ((i BETWEEN 33 AND 126) OR (i BETWEEN 161 AND 172) " +
       "OR (i BETWEEN 174 AND 255)) AS keep FROM generate_series(0, 255) t(i)), " +
       "mp AS (SELECT byte, CASE WHEN keep THEN byte " +
       "ELSE 255 + row_number() OVER (PARTITION BY keep ORDER BY byte) END AS cp FROM m) " +
       "SELECT CAST(byte AS BIGINT) AS byte_val, CAST(cp AS BIGINT) AS code_point, " +
       "chr(CAST(cp AS INT)) AS symbol FROM mp ORDER BY byte_val"),

    // byte-level == char-level on a pure-ASCII corpus (the table is the
    // identity there) ⇒ q177's full learn+segment replay
    "q222_bpe_byte_segment" ->
      Bpe.segmentStoreOracleSql("documents", "text", 10000, 50),

    // full replay of the DCT pHash: the q119 payload -> 512 segment
    // floor-divided means -> integer DCT through the SAME literal cosine
    // table the Scala kernel uses (folded to 1025 quarter-wave entries by
    // cos symmetry) -> sign-of-lower-median bits -> all-pairs hamming
    "q220_media_phash" -> {
      val cosTab = graft.operators.Multimodal.cosTabE6
      "WITH m AS (SELECT doc_id, repeat(md5(CAST(doc_id % 50 AS VARCHAR)), CAST(n_chars%4+2 AS INT)) AS media FROM documents),\n" +
      "seg AS (SELECT doc_id, (((i-1)*512) // len(media)) AS n, ascii(media[i:i]) AS v " +
      "FROM m, unnest(generate_series(1, len(media))) AS g(i)),\n" +
      "xs AS (SELECT doc_id, n, (sum(v)*1000000 - (sum(v)*1000000) % count(*)) // count(*) AS x " +
      "FROM seg GROUP BY 1, 2),\n" +
      "ct(j, c) AS (VALUES " +
      cosTab.zipWithIndex.map { case (c, j) => s"($j, $c)" }.mkString(", ") + "),\n" +
      "dct AS (SELECT doc_id, k, CAST(sum(c * x) AS BIGINT) AS coef " +
      "FROM xs CROSS JOIN generate_series(1, 64) t(k) " +
      "JOIN ct ON ct.j = least((k*(2*n+1)) % 2048, 2048 - (k*(2*n+1)) % 2048) " +
      "GROUP BY 1, 2),\n" +
      "med AS (SELECT doc_id, coef AS md FROM " +
      "(SELECT doc_id, coef, row_number() OVER (PARTITION BY doc_id ORDER BY coef, k) AS rn FROM dct) WHERE rn = 32),\n" +
      "p2(k, p) AS (VALUES " +
      (1 to 64).map(k => s"($k, ${BigInt(1) << (k - 1)}::HUGEINT)").mkString(", ") + "),\n" +
      "hs AS (SELECT dct.doc_id, sum(CASE WHEN coef > md THEN p ELSE 0::HUGEINT END) AS h " +
      "FROM dct JOIN med USING (doc_id) JOIN p2 USING (k) GROUP BY 1),\n" +
      s"sims AS (SELECT doc_id, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
      s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS sim FROM hs)\n" +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sims a JOIN sims b " +
      "ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY 1, 2"
    },

    // real-WAV aHash replay: the oracle recomputes the sketch from the
    // GENERATING FORMULA — Spark's row must match despite going through
    // a genuine RIFF container + javax.sound.sampled decode, which is
    // exactly the losslessness claim under test. Decoded frame byte =
    // ((d//2)*7919 + i*104729 + (d%2)*3) % 65536 // 256 (PCM16 top byte
    // re-biased to unsigned).
    "q226_wav_ahash" ->
      (wavParSql +
       "seg AS (SELECT doc_id, n AS L, ((i*64) // n) AS s, " +
       "((base + i*104729 + off) % 65536) // 256 AS v " +
       "FROM par, unnest(generate_series(0, n-1)) AS g(i)),\n" +
       "ss AS (SELECT doc_id, s, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS sl, max(L) AS L " +
       "FROM seg GROUP BY 1, 2),\n" +
       "tt AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tv FROM seg GROUP BY 1),\n" +
       "p2(s, p) AS (VALUES " +
       (0 until 64).map(s => s"($s, ${BigInt(1) << s}::HUGEINT)").mkString(", ") + "),\n" +
       "hs AS (SELECT ss.doc_id, sum(CASE WHEN sv * L > tv * sl THEN p ELSE 0::HUGEINT END) AS h " +
       "FROM ss JOIN tt USING (doc_id) JOIN p2 ON p2.s = ss.s GROUP BY 1),\n" +
       s"sims AS (SELECT doc_id, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
       s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS sim FROM hs)\n" +
       "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sims a JOIN sims b " +
       "ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY 1, 2"),

    // real-WAV pHash replay: q220's full integer-DCT tail (literal
    // quarter-wave cosine table) over the formula-derived sample bytes
    "q227_wav_phash" -> {
      val cosTab = graft.operators.Multimodal.cosTabE6
      wavParSql +
      "seg AS (SELECT doc_id, ((i*512) // n) AS sn, " +
      "((base + i*104729 + off) % 65536) // 256 AS v " +
      "FROM par, unnest(generate_series(0, n-1)) AS g(i)),\n" +
      "xs AS (SELECT doc_id, sn AS n, (sum(v)*1000000 - (sum(v)*1000000) % count(*)) // count(*) AS x " +
      "FROM seg GROUP BY 1, 2),\n" +
      "ct(j, c) AS (VALUES " +
      cosTab.zipWithIndex.map { case (c, j) => s"($j, $c)" }.mkString(", ") + "),\n" +
      "dct AS (SELECT doc_id, k, CAST(sum(c * x) AS BIGINT) AS coef " +
      "FROM xs CROSS JOIN generate_series(1, 64) t(k) " +
      "JOIN ct ON ct.j = least((k*(2*n+1)) % 2048, 2048 - (k*(2*n+1)) % 2048) " +
      "GROUP BY 1, 2),\n" +
      "med AS (SELECT doc_id, coef AS md FROM " +
      "(SELECT doc_id, coef, row_number() OVER (PARTITION BY doc_id ORDER BY coef, k) AS rn FROM dct) WHERE rn = 32),\n" +
      "p2(k, p) AS (VALUES " +
      (1 to 64).map(k => s"($k, ${BigInt(1) << (k - 1)}::HUGEINT)").mkString(", ") + "),\n" +
      "hs AS (SELECT dct.doc_id, sum(CASE WHEN coef > md THEN p ELSE 0::HUGEINT END) AS h " +
      "FROM dct JOIN med USING (doc_id) JOIN p2 USING (k) GROUP BY 1),\n" +
      s"sims AS (SELECT doc_id, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
      s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS sim FROM hs)\n" +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sims a JOIN sims b " +
      "ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY 1, 2"
    },

    // real-AVI aHash replay: q226's integer chain over the DIB pixel
    // formula (the same top-byte map, fed by the container walk)
    "q236_avi_ahash" ->
      (aviParSql +
       "seg AS (SELECT doc_id, n AS L, ((i*64) // n) AS s, " +
       "((base + i*104729 + off) % 65536) // 256 AS v " +
       "FROM par, unnest(generate_series(0, n-1)) AS g(i)),\n" +
       "ss AS (SELECT doc_id, s, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS sl, max(L) AS L " +
       "FROM seg GROUP BY 1, 2),\n" +
       "tt AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tv FROM seg GROUP BY 1),\n" +
       "p2(s, p) AS (VALUES " +
       (0 until 64).map(s => s"($s, ${BigInt(1) << s}::HUGEINT)").mkString(", ") + "),\n" +
       "hs AS (SELECT ss.doc_id, sum(CASE WHEN sv * L > tv * sl THEN p ELSE 0::HUGEINT END) AS h " +
       "FROM ss JOIN tt USING (doc_id) JOIN p2 ON p2.s = ss.s GROUP BY 1),\n" +
       s"sims AS (SELECT doc_id, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
       s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS sim FROM hs)\n" +
       "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sims a JOIN sims b " +
       "ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY 1, 2"),

    // per-frame aHash over the sampled slices of the decoded DIB
    // stream: slice f covers indices [f*flen, (f+1)*flen), flen = n/4,
    // kept for even f — q236's 64-segment integer chain per frame
    "q238_avi_frame_stats" ->
      (aviParSql +
       "fr AS (SELECT doc_id, n // 4 AS flen, base, off FROM par),\n" +
       "seg AS (SELECT doc_id, CAST(i // flen AS INTEGER) AS fidx, flen AS L, " +
       "(((i % flen)*64) // flen) AS s, " +
       "((base + i*104729 + off) % 65536) // 256 AS v " +
       "FROM fr, unnest(generate_series(0, 4*flen - 1)) AS g(i) " +
       "WHERE (i // flen) % 2 = 0),\n" +
       "ss AS (SELECT doc_id, fidx, s, CAST(sum(v) AS BIGINT) AS sv, " +
       "CAST(count(*) AS BIGINT) AS sl, max(L) AS L FROM seg GROUP BY 1, 2, 3),\n" +
       "tt AS (SELECT doc_id, fidx, CAST(sum(v) AS BIGINT) AS tv FROM seg GROUP BY 1, 2),\n" +
       "p2(s, p) AS (VALUES " +
       (0 until 64).map(s => s"($s, ${BigInt(1) << s}::HUGEINT)").mkString(", ") + "),\n" +
       "hs AS (SELECT ss.doc_id, ss.fidx, sum(CASE WHEN sv * L > tv * sl THEN p ELSE 0::HUGEINT END) AS h " +
       "FROM ss JOIN tt USING (doc_id, fidx) JOIN p2 ON p2.s = ss.s GROUP BY 1, 2)\n" +
       s"SELECT doc_id, fidx AS frame_idx, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
       s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS frame_sim " +
       "FROM hs ORDER BY doc_id, frame_idx"),

    // real-AVI pHash replay: q227's full integer-DCT tail over the DIB
    // pixel formula
    "q237_avi_phash" -> {
      val cosTab = graft.operators.Multimodal.cosTabE6
      aviParSql +
      "seg AS (SELECT doc_id, ((i*512) // n) AS sn, " +
      "((base + i*104729 + off) % 65536) // 256 AS v " +
      "FROM par, unnest(generate_series(0, n-1)) AS g(i)),\n" +
      "xs AS (SELECT doc_id, sn AS n, (sum(v)*1000000 - (sum(v)*1000000) % count(*)) // count(*) AS x " +
      "FROM seg GROUP BY 1, 2),\n" +
      "ct(j, c) AS (VALUES " +
      cosTab.zipWithIndex.map { case (c, j) => s"($j, $c)" }.mkString(", ") + "),\n" +
      "dct AS (SELECT doc_id, k, CAST(sum(c * x) AS BIGINT) AS coef " +
      "FROM xs CROSS JOIN generate_series(1, 64) t(k) " +
      "JOIN ct ON ct.j = least((k*(2*n+1)) % 2048, 2048 - (k*(2*n+1)) % 2048) " +
      "GROUP BY 1, 2),\n" +
      "med AS (SELECT doc_id, coef AS md FROM " +
      "(SELECT doc_id, coef, row_number() OVER (PARTITION BY doc_id ORDER BY coef, k) AS rn FROM dct) WHERE rn = 32),\n" +
      "p2(k, p) AS (VALUES " +
      (1 to 64).map(k => s"($k, ${BigInt(1) << (k - 1)}::HUGEINT)").mkString(", ") + "),\n" +
      "hs AS (SELECT dct.doc_id, sum(CASE WHEN coef > md THEN p ELSE 0::HUGEINT END) AS h " +
      "FROM dct JOIN med USING (doc_id) JOIN p2 USING (k) GROUP BY 1),\n" +
      s"sims AS (SELECT doc_id, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
      s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS sim FROM hs)\n" +
      "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sims a JOIN sims b " +
      "ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY 1, 2"
    },

    // trigram stupid-backoff full replays: live self-scored (every
    // instance hits the seen branch), held-out against the segmented
    // even-half model (all three branches), and post-takedown (model =
    // remaining evens — the negative segments must cancel exactly)
    "q217_fluency3" -> fluency3OracleSql("TRUE", "TRUE"),
    "q218_fluency3_store" ->
      fluency3OracleSql("doc_id % 2 = 0", "doc_id % 2 = 1"),
    "q219_fluency3_forget" ->
      fluency3OracleSql("doc_id % 2 = 0 AND doc_id % 8 <> 0", "doc_id % 2 = 1"),

    // high-dim pivot kernel: the same full recursive replay at dims=16 —
    // candidate generation differs (pivots vs 3^d grid), the label
    // algebra and the exact predicate are identical
    "q216_dbscan_highdim" -> dbscanVecFullOracleSql(16, 0.45),

    // same full recursive replay at the embedding table's native 64 dims
    "q230_dbscan_dims64" -> dbscanVecFullOracleSql(64, 1.17),

    // n-dim predict replay: q156's CTEs on the sub-400 training set + the
    // nearest-core rule over the held-out vectors; the store-backed
    // classify (q158) must produce identical labels
    "q157_dbscan_vec_predict" -> dbscanVecPredictOracleSql,
    "q158_dbscan_vec_model_store" -> dbscanVecPredictOracleSql,

    // 5th-NN distance histogram: windowed rank replay of the same
    // isqrt bucket rule, radius 64 (= 8*8), overflow bucket 8
    "q155_kdist5_histogram" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}), " +
       "nn AS (SELECT k, d2 FROM (SELECT a.c_custkey AS k, " +
       "(a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy) AS d2, " +
       "row_number() OVER (PARTITION BY a.c_custkey ORDER BY " +
       "(a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy), b.c_custkey) AS rk " +
       "FROM cpts a JOIN cpts b ON a.c_custkey <> b.c_custkey " +
       "AND (a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy) <= 4096.0) t WHERE rk = 5), " +
       "s AS (SELECT p.c_custkey, nn.d2, CAST(floor(sqrt(nn.d2)) AS BIGINT) AS c0 " +
       "FROM cpts p LEFT JOIN nn ON nn.k = p.c_custkey), " +
       "b AS (SELECT CASE WHEN d2 IS NULL THEN 8 ELSE least((CASE " +
       "WHEN (c0+1)*(c0+1) <= d2 THEN c0+1 WHEN c0*c0 > d2 THEN c0-1 ELSE c0 END) // 8, 8) END AS bucket FROM s) " +
       "SELECT CAST(bucket AS BIGINT) AS bucket, CAST(bucket*8 AS BIGINT) AS bucket_lo, " +
       "count(*) AS n_points FROM b GROUP BY bucket ORDER BY bucket"),

    // neighbor-count histogram: self excluded, clamped to bucket 7
    "q149_neighborhood_histogram" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}), " +
       "cnt AS (SELECT a.c_custkey AS k, count(*) - 1 AS n FROM cpts a JOIN cpts b " +
       "ON (a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy) <= 1024.0 GROUP BY 1), " +
       "b AS (SELECT least(n // 2, 7) AS bucket FROM cnt) " +
       "SELECT CAST(bucket AS BIGINT) AS bucket, CAST(bucket*2 AS BIGINT) AS bucket_lo, " +
       "count(*) AS n_points FROM b GROUP BY bucket ORDER BY bucket"),

    "q21_rasterize" -> s"$rasterBaseSql $tileCsvSelectSql",

    "q22_raster_clip" ->
      (s"$rasterBaseSql, " +
       "tiles2 AS (SELECT tx, ty, greatest(tx*100,150) ix0, least(tx*100+100,350) ix1, " +
       "greatest(ty*100,150) iy0, least(ty*100+100,350) iy1 FROM tiles " +
       "WHERE least(tx*100+100,350) > greatest(tx*100,150) AND least(ty*100+100,350) > greatest(ty*100,150)), " +
       "cells2 AS (SELECT t.*, (ix1-ix0)//10 nw, (iy1-iy0)//10 nh, g.i FROM tiles2 t, generate_series(0,99) g(i) " +
       "WHERE g.i < ((ix1-ix0)//10)*((iy1-iy0)//10)), " +
       "j2 AS (SELECT c2.*, COALESCE(px.c,0) v FROM cells2 c2 LEFT JOIN px " +
       "ON px.gx = c2.ix0//10 + (c2.i % c2.nw) AND px.gy = c2.iy1//10 - 1 - c2.i//c2.nw) " +
       "SELECT CAST(ix0 AS BIGINT) ulx, CAST(iy1 AS BIGINT) uly, CAST(nw AS INT) width, CAST(nh AS INT) height, " +
       "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS data_csv " +
       "FROM j2 GROUP BY ix0, iy1, nw, nh ORDER BY ulx, uly"),

    "q23_tile_stats" ->
      (s"$rasterBaseSql " +
       "SELECT CAST(tx*100 AS BIGINT) ulx, CAST(ty*100+100 AS BIGINT) uly, " +
       "min(v) t_min, max(v) t_max, list(v ORDER BY v)[(count(*)+1)//2] t_median, " +
       "count(*) FILTER (WHERE v=0) zero_pixels " +
       "FROM j GROUP BY tx, ty ORDER BY ulx, uly"),

    "q24_value_histogram" ->
      (s"$rasterBaseSql " +
       "SELECT v AS pixel_value, count(*) AS cnt FROM j GROUP BY v ORDER BY v"),

    "q25_raster_vector_join" -> rasterVectorJoinOracleSql,

    "q26_raster_raster_join" ->
      (s"WITH epts AS ($eventsRasterSql), " +
       s"${rasterSideSql("click")}, ${rasterSideSql("view")}, " +
       "both_t AS (SELECT a.tx, a.ty FROM tiles_click a JOIN tiles_view b ON a.tx=b.tx AND a.ty=b.ty), " +
       "cells AS (SELECT t.tx, t.ty, g.i FROM both_t t, generate_series(0,99) g(i)), " +
       "j AS (SELECT c.tx, c.ty, c.i, COALESCE(a.c,0)+COALESCE(b.c,0) v FROM cells c " +
       "LEFT JOIN tl_click a ON a.tx=c.tx AND a.ty=c.ty AND a.pix=c.i " +
       "LEFT JOIN tl_view b ON b.tx=c.tx AND b.ty=c.ty AND b.pix=c.i) " +
       tileCsvSelectSql),

    "q34_raster_filter_geom" ->
      (s"WITH epts AS ($eventsRasterSql), " +
       "px AS (SELECT CAST(floor(ex/10) AS BIGINT) gx, CAST(floor(ey/10) AS BIGINT) gy, count(*) c FROM epts GROUP BY 1,2), " +
       "tiles AS (SELECT DISTINCT gx//10 tx, gy//10 ty FROM px), " +
       "fr AS (SELECT tx*100 x0, ty*100 y0, tx*100+100 x1, ty*100+100 y1, " +
       "least(ty*100+100, 375-tx*100) uly, least(tx*100+100, 375-ty*100) fx1 " +
       "FROM tiles WHERE tx*100 + ty*100 < 375), " +
       "cells AS (SELECT f.*, (fx1-x0+9)//10 nw, (uly-y0+9)//10 nh, g.i " +
       "FROM fr f, generate_series(0,99) g(i) WHERE g.i < ((fx1-x0+9)//10)*((uly-y0+9)//10)), " +
       "pxo AS (SELECT c.*, x0 + (i % nw)*10 AS posx, uly - (i // nw)*10 AS posy FROM cells c), " +
       "j AS (SELECT pxo.*, CASE WHEN posx + posy - 10 <= 375 " +
       "THEN COALESCE((SELECT p.c FROM px p WHERE p.gx = x0//10 + (i % nw) AND p.gy = y1//10 - 1 - (y1-posy)//10), 0) " +
       "ELSE -1 END v FROM pxo) " +
       "SELECT CAST(x0 AS BIGINT) ulx, CAST(uly AS BIGINT) uly, CAST(nw AS INT) width, CAST(nh AS INT) height, " +
       "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS data_csv " +
       "FROM j GROUP BY x0, uly, nw, nh ORDER BY ulx, uly"),

    "q35_raster_join_misaligned" ->
      (s"WITH epts AS ($eventsRasterSql), " +
       "pxa AS (SELECT CAST(floor(ex/10) AS BIGINT) gx, CAST(floor(ey/10) AS BIGINT) gy, count(*) c " +
       "FROM epts WHERE event_type='click' GROUP BY 1,2), " +
       "pxb AS (SELECT CAST(floor((ex+50)/10) AS BIGINT) gxs, CAST(floor((ey+50)/10) AS BIGINT) gys, count(*) c " +
       "FROM epts WHERE event_type='view' GROUP BY 1,2), " +
       "ta AS (SELECT DISTINCT gx//10 tx, gy//10 ty FROM pxa), " +
       "tb AS (SELECT DISTINCT gxs//10 sx, gys//10 sy FROM pxb), " +
       "pairs AS (SELECT greatest(tx*100, sx*100-50) ix0, least(tx*100+100, sx*100+50) ix1, " +
       "greatest(ty*100, sy*100-50) iy0, least(ty*100+100, sy*100+50) iy1 FROM ta, tb " +
       "WHERE least(tx*100+100, sx*100+50) > greatest(tx*100, sx*100-50) " +
       "AND least(ty*100+100, sy*100+50) > greatest(ty*100, sy*100-50)), " +
       "cells AS (SELECT p.*, (ix1-ix0)//10 nw, (iy1-iy0)//10 nh, g.i " +
       "FROM pairs p, generate_series(0,99) g(i) WHERE g.i < ((ix1-ix0)//10)*((iy1-iy0)//10)), " +
       "px AS (SELECT c.*, ix0 + (i % nw)*10 AS posx, iy1 - (i // nw)*10 AS posy FROM cells c), " +
       "j AS (SELECT px.*, COALESCE(a.c,0)+COALESCE(b.c,0) v FROM px " +
       "LEFT JOIN pxa a ON a.gx = posx//10 AND a.gy = (posy-10)//10 " +
       "LEFT JOIN pxb b ON b.gxs = (posx+50)//10 AND b.gys = (posy-10+50)//10) " +
       "SELECT CAST(ix0 AS BIGINT) ulx, CAST(iy1 AS BIGINT) uly, CAST(nw AS INT) width, CAST(nh AS INT) height, " +
       "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS data_csv " +
       "FROM j GROUP BY ix0, iy1, nw, nh ORDER BY ulx, uly"),

    "q36_bucket_histogram" ->
      (s"$custRasterSql, " +
       "mm AS (SELECT min(v) mn, max(v) mx, (max(v)-min(v))//4 + 1 step FROM cj), " +
       "cnts AS (SELECT (v - mn)//step bi, count(*) cnt FROM cj, mm GROUP BY 1) " +
       "SELECT mn + step*g.i AS bucket_lo, least(mn + step*(g.i+1)-1, mx) AS bucket_hi, " +
       "COALESCE(cnt, 0) AS cnt FROM mm, generate_series(0,3) g(i) " +
       "LEFT JOIN cnts ON cnts.bi = g.i ORDER BY bucket_lo"),

    "q37_with_values" ->
      (s"$custRasterSql " +
       "SELECT CAST(tx*250 AS BIGINT) ulx, CAST(ty*250+250 AS BIGINT) uly, 5 AS width, 5 AS height, " +
       "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS data_csv " +
       "FROM cj GROUP BY tx, ty " +
       "HAVING count(*) FILTER (WHERE v=1) > 0 AND count(*) FILTER (WHERE v=2) > 0 " +
       "ORDER BY ulx, uly"),

    // packed cell id for positive cells: ix * 2^32 + iy
    "q27_grid_partition" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT CAST(floor(cx/100) AS BIGINT)*4294967296 + CAST(floor(cy/100) AS BIGINT) AS part_cell, " +
       "count(*) AS cnt FROM cpts GROUP BY 1 ORDER BY part_cell"),

    "q41_rtree_partition" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}), " +
       "a AS (SELECT c_custkey, cy, ntile(3) OVER (ORDER BY cx, c_custkey) - 1 AS slice FROM cpts), " +
       "b AS (SELECT slice, ntile(3) OVER (PARTITION BY slice ORDER BY cy, c_custkey) - 1 AS run FROM a) " +
       "SELECT CAST(slice*3 + run AS BIGINT) AS part_str, count(*) AS cnt " +
       "FROM b GROUP BY 1 ORDER BY part_str"),

    "q28_store_pruned" -> prunedBoxFilterOracleSql,

    // same point-in-box semantics, different box, pruning left to the rule
    "q106_declarative_prune" ->
      (s"WITH cpts AS (${Tables.customerPtsSql}) " +
       "SELECT c_custkey FROM cpts WHERE cx > 200 AND cx < 700 AND cy > 100 AND cy < 500 " +
       "ORDER BY c_custkey"),

    // point-in-box AND instant-in-closed-interval (the temporal gate of
    // st_intersects for an instant vs an interval is lo <= t <= hi)
    "q107_st_prune" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       "SELECT event_id FROM epts " +
       "WHERE ex > 100.5 AND ex < 400.5 AND ey > 100.5 AND ey < 400.5 " +
       "AND et BETWEEN 1704844800000500 AND 1705104000000500 " +
       "ORDER BY event_id"),

    // SemDeDup replay: unrolled Lloyd -> within-cluster cosine pairs ->
    // recursive closure -> min-id survivors with their cluster
    "q108_semantic_dedup" -> semanticDedupOracleSql(k = 4, iters = 2,
      threshold = 0.42, maxCluster = graft.operators.Dedup.MaxLshBucket),

    // Lloyd assignment -> per-cluster rank on distance DESC -> keep 3/4
    "q109_prototype_prune" ->
      (s"WITH ${kmeansOracleCtes(k = 4, iters = 2)}, " +
       "asg AS (SELECT vec_id, c, d FROM f WHERE rn = 1), " +
       "r AS (SELECT vec_id, c, row_number() OVER (PARTITION BY c ORDER BY d DESC, vec_id) AS rk, " +
       "count(*) OVER (PARTITION BY c) AS cnt FROM asg) " +
       "SELECT vec_id, c AS cluster FROM r WHERE rk*4 <= cnt*3 ORDER BY vec_id"),

    // exact-Jaccard closure (LSH == exact at these params) -> md5 split of
    // the component representative
    "q110_family_split" -> {
      val Seq(trainCut, valCut) =
        splitFractions.scanLeft(0.0)(_ + _._2).tail.init.map(Pipeline.hexBound)
      s"WITH RECURSIVE sh AS ($shingleSetSql), " +
      "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b WHERE a.doc_id < b.doc_id " +
      "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))), " +
      "e(a, b) AS (SELECT id_a, id_b FROM p UNION SELECT id_b, id_a FROM p " +
      "UNION SELECT doc_id, doc_id FROM documents), " +
      "reach(a, b) AS (SELECT a, b FROM e UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), " +
      "comp AS (SELECT a, min(b) AS m FROM reach GROUP BY a) " +
      s"SELECT a AS doc_id, CASE WHEN substr(md5(m || ':$splitSalt'),1,4) < '$trainCut' THEN 'train' " +
      s"WHEN substr(md5(m || ':$splitSalt'),1,4) < '$valCut' THEN 'val' ELSE 'test' END AS split " +
      "FROM comp ORDER BY doc_id"
    },

    "q38_tilefile_roundtrip" -> s"$rasterBaseSql $tileCsvSelectSql",

    "q39_tile_store_pruned" ->
      (s"$rasterBaseSql " +
       "SELECT CAST(tx*100 AS BIGINT) ulx, CAST(ty*100+100 AS BIGINT) uly, 10 AS width, 10 AS height, " +
       "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS data_csv FROM j " +
       "WHERE tx*100 < 350 AND tx*100+100 > 150 AND ty*100 < 350 AND ty*100+100 > 150 " +
       "GROUP BY tx, ty ORDER BY ulx, uly"),

    // q39's replay with the byte codec's mod-97 values — the store layout
    // changes, the pixels must not
    "q211_tile_store_byte" ->
      (s"$rasterBaseSql " +
       "SELECT CAST(tx*100 AS BIGINT) ulx, CAST(ty*100+100 AS BIGINT) uly, 10 AS width, 10 AS height, " +
       "string_agg(CAST(v%97 AS VARCHAR), ',' ORDER BY i) AS data_csv FROM j " +
       "WHERE tx*100 < 350 AND tx*100+100 > 150 AND ty*100 < 350 AND ty*100+100 > 150 " +
       "GROUP BY tx, ty ORDER BY ulx, uly"),

    "q29_multimodal_meta" ->
      ("SELECT doc_id, (['image','audio','video'])[CAST(doc_id%3+1 AS INT)] AS media_type, " +
       "CAST(32*(n_chars%4+2) AS BIGINT) AS media_len, " +
       "CAST(n_chars%64+16 AS INT) AS width, CAST(doc_id*7%48+16 AS INT) AS height " +
       "FROM documents ORDER BY doc_id"),

    // full replay of the 1-D aHash: synthetic payload bytes -> 64 segment
    // sums -> integer cross-multiplied mean bits -> signed 64-bit sketch
    // -> all-pairs hamming (stronger than the block join, equal by the
    // pigeonhole argument — same pattern as the q16 SimHash oracle)
    "q119_media_ahash" ->
      ("WITH m AS (SELECT doc_id, repeat(md5(CAST(doc_id % 50 AS VARCHAR)), CAST(n_chars%4+2 AS INT)) AS media FROM documents),\n" +
       "seg AS (SELECT doc_id, len(media) AS L, (((i-1)*64) // len(media)) AS s, ascii(media[i:i]) AS v " +
       "FROM m, unnest(generate_series(1, len(media))) AS g(i)),\n" +
       "ss AS (SELECT doc_id, s, CAST(sum(v) AS BIGINT) AS sv, CAST(count(*) AS BIGINT) AS sl, max(L) AS L " +
       "FROM seg GROUP BY 1, 2),\n" +
       "tt AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tv FROM seg GROUP BY 1),\n" +
       "p2(s, p) AS (VALUES " +
       (0 until 64).map(s => s"($s, ${BigInt(1) << s}::HUGEINT)").mkString(", ") + "),\n" +
       "hs AS (SELECT ss.doc_id, sum(CASE WHEN sv * L > tv * sl THEN p ELSE 0::HUGEINT END) AS h " +
       "FROM ss JOIN tt USING (doc_id) JOIN p2 ON p2.s = ss.s GROUP BY 1),\n" +
       s"sims AS (SELECT doc_id, CAST(CASE WHEN h >= ${BigInt(1) << 63}::HUGEINT " +
       s"THEN h - ${BigInt(1) << 64}::HUGEINT ELSE h END AS BIGINT) AS sim FROM hs)\n" +
       "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sims a JOIN sims b " +
       "ON a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3 ORDER BY 1, 2"),

    "q30_multimodal_features" ->
      ("WITH m AS (SELECT doc_id, repeat(md5(text), CAST(n_chars%4+2 AS INT)) AS media FROM documents) " +
       "SELECT doc_id, " +
       "CAST(list_sum([ascii(media[i:i]) FOR i IN generate_series(1, len(media))]) AS BIGINT) AS byte_sum, " +
       "md5(media[1:greatest(len(media)//4,1)]) AS frame0_md5 " +
       "FROM m ORDER BY doc_id"),

    // the same md5-repeat payload sliced into 6 frames, every 2nd kept
    "q103_frame_sample" ->
      ("WITH m AS (SELECT doc_id, repeat(md5(text), CAST(n_chars%4+2 AS INT)) AS media FROM documents), " +
       "s AS (SELECT doc_id, media, greatest(len(media)//6, 1) AS flen FROM m) " +
       "SELECT doc_id, CAST(i AS INT) AS frame_idx, " +
       "md5(media[i*flen+1 : least((i+1)*flen, len(media))]) AS frame_md5, " +
       "CAST(least((i+1)*flen, len(media)) - i*flen AS BIGINT) AS frame_len " +
       "FROM s, generate_series(0, 5) t(i) " +
       "WHERE i % 2 = 0 AND i*flen < len(media) " +
       "ORDER BY doc_id, frame_idx"),

    // the md5-repeat payload cut into hop-24 windows of 40 bytes
    "q104_chunk_media" ->
      ("WITH m AS (SELECT doc_id, repeat(md5(text), CAST(n_chars%4+2 AS INT)) AS media FROM documents) " +
       "SELECT doc_id, CAST(i AS INT) AS chunk_idx, " +
       "md5(media[i*24+1 : least(i*24+40, len(media))]) AS chunk_md5, " +
       "CAST(least(i*24+40, len(media)) - i*24 AS BIGINT) AS chunk_len " +
       "FROM m, generate_series(0, 63) t(i) " +
       "WHERE i*24 < len(media) ORDER BY doc_id, chunk_idx"),

    // integer replay of the mixture arithmetic: whole = (B·w)//(Σw·T),
    // extra copy iff hash·den < rem·2^16 on the 16-bit id hash
    "q105_mixture" ->
      ("WITH tk AS (SELECT source, CAST(sum(len(string_split(text,' '))) AS BIGINT) AS t " +
       "FROM documents WHERE source IN ('src0','src1','src2') GROUP BY source), " +
       "w(source, wn) AS (VALUES ('src0', 3), ('src1', 1), ('src2', 2)), " +
       "par AS (SELECT tk.source, (6000*wn) // (6*t) AS whole, " +
       "(6000*wn) % (6*t) AS rem, 6*t AS den FROM tk JOIN w USING (source)), " +
       "d AS (SELECT doc_id, source, substr(md5(doc_id || ':mixq'),1,4) AS h FROM documents), " +
       "hv AS (SELECT doc_id, source, " +
       "CAST((strpos('0123456789abcdef', h[1:1])-1)*4096 + (strpos('0123456789abcdef', h[2:2])-1)*256 + " +
       "(strpos('0123456789abcdef', h[3:3])-1)*16 + (strpos('0123456789abcdef', h[4:4])-1) AS BIGINT) AS hv " +
       "FROM d), " +
       "n AS (SELECT doc_id, hv.source, whole + CASE WHEN hv*den < rem*65536 THEN 1 ELSE 0 END AS n " +
       "FROM hv JOIN par ON hv.source = par.source) " +
       "SELECT doc_id, source, unnest(range(n)) AS copy FROM n WHERE n >= 1 " +
       "ORDER BY doc_id, copy"),

    "q31_join_covers" ->
      (s"WITH nrect AS (${Tables.nationRectsSql}), cpts AS (${Tables.customerPtsSql}) " +
       "SELECT n_nationkey, c_custkey FROM nrect, cpts " +
       "WHERE cx >= nx AND cx <= nx+150 AND cy >= ny AND cy <= ny+150 " +
       "ORDER BY n_nationkey, c_custkey"),

    "q43_asof_join" ->
      ("WITH ev AS (SELECT event_id, epoch_ns(ts)//1000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id, et FROM ev WHERE event_type='click'), " +
       "v AS (SELECT event_id, et FROM ev WHERE event_type='view'), " +
       "pairs AS (SELECT c.event_id AS id_a, v.event_id AS id_b, " +
       "row_number() OVER (PARTITION BY c.event_id ORDER BY v.et DESC, v.event_id DESC) rn " +
       "FROM c JOIN v ON v.et <= c.et AND v.et > c.et - 3600000000) " +
       "SELECT id_a, id_b FROM pairs WHERE rn = 1 ORDER BY id_a"),

    // the keyed variant: same window-ranked formulation with the user
    // equality clause added to the candidate join
    "q233_asof_keyed" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id, user_id, et FROM ev WHERE event_type='click'), " +
       "v AS (SELECT event_id, user_id, et FROM ev WHERE event_type='view'), " +
       "pairs AS (SELECT c.event_id AS id_a, v.event_id AS id_b, " +
       "row_number() OVER (PARTITION BY c.event_id ORDER BY v.et DESC, v.event_id DESC) rn " +
       "FROM c JOIN v ON v.user_id = c.user_id AND v.et <= c.et AND v.et > c.et - 3600000000) " +
       "SELECT id_a, id_b FROM pairs WHERE rn = 1 ORDER BY id_a"),

    // DuckDB's NATIVE ASOF JOIN — an independent engine's as-of
    // semantics, not a restatement of our plan. The lookback is an
    // exact post-filter (monotone in the carried time: if the latest
    // right is too old, every earlier right is older). The
    // `row_number() OVER ()` column is a pushdown BARRIER only:
    // DuckDB 1.0 pushes the outer lookback filter INTO the ASOF join,
    // where the binder rejects a second inequality ("Multiple ASOF
    // JOIN inequalities"); filters cannot push below an
    // unpartitioned window.
    "q240_sql_asof_join" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id AS id_a, user_id AS ua, et AS ta FROM ev WHERE event_type='click'), " +
       "v AS (SELECT user_id AS ub, et AS tb, max(event_id) AS id_b FROM ev WHERE event_type='view' GROUP BY 1, 2) " +
       "SELECT id_a, id_b FROM (" +
       "SELECT c.id_a, v.id_b, v.tb, c.ta, row_number() OVER () AS _b " +
       "FROM c ASOF JOIN v ON v.ub = c.ua AND v.tb <= c.ta) " +
       "WHERE tb > ta - 3600000000 ORDER BY id_a, id_b"),

    // native ASOF LEFT JOIN (no lookback, so no barrier needed)
    "q241_sql_asof_left" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id AS id_a, user_id AS ua, et AS ta FROM ev WHERE event_type='click'), " +
       "v AS (SELECT user_id AS ub, et AS tb, max(event_id) AS id_b FROM ev WHERE event_type='view' GROUP BY 1, 2) " +
       "SELECT id_a, id_b FROM c ASOF LEFT JOIN v ON v.ub = c.ua AND v.tb <= c.ta " +
       "ORDER BY id_a"),

    // outer + lookback: the windowed LEFT JOIN replay (native asof
    // cannot express an in-ON lookback, and post-filtering would drop
    // the null-extended rows this mode exists to keep)
    "q242_asof_keyed_left" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id, user_id, et FROM ev WHERE event_type='click'), " +
       "v AS (SELECT event_id, user_id, et FROM ev WHERE event_type='view'), " +
       "pairs AS (SELECT c.event_id AS id_a, v.event_id AS id_b, " +
       "row_number() OVER (PARTITION BY c.event_id ORDER BY v.et DESC, v.event_id DESC) rn " +
       "FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.et <= c.et AND v.et > c.et - 3600000000) " +
       "SELECT id_a, id_b FROM pairs WHERE rn = 1 ORDER BY id_a"),

    // the max_by spelling replays as the SAME windowed rank (the struct
    // ordering is the DESC key list) — q233's oracle shape verbatim
    "q243_sql_asof_maxby" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id, user_id, et FROM ev WHERE event_type='click'), " +
       "v AS (SELECT event_id, user_id, et FROM ev WHERE event_type='view'), " +
       "pairs AS (SELECT c.event_id AS id_a, v.event_id AS id_b, " +
       "row_number() OVER (PARTITION BY c.event_id ORDER BY v.et DESC, v.event_id DESC) rn " +
       "FROM c JOIN v ON v.user_id = c.user_id AND v.et <= c.et AND v.et > c.et - 3600000000) " +
       "SELECT id_a, id_b FROM pairs WHERE rn = 1 ORDER BY id_a"),

    // stream-stream as-of at MILLISECOND grain (the Timestamp feed
    // currency): the in-order two-batch replay equals the batch as-of,
    // so the windowed LEFT JOIN replay is exact — q242's shape at ms
    "q244_asof_stream_stream" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id, user_id, et FROM ev WHERE event_type='click'), " +
       "v AS (SELECT event_id, user_id, et FROM ev WHERE event_type='view'), " +
       "pairs AS (SELECT c.event_id AS id_a, v.event_id AS id_b, " +
       "row_number() OVER (PARTITION BY c.event_id ORDER BY v.et DESC, v.event_id DESC) rn " +
       "FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.et <= c.et AND v.et > c.et - 3600000) " +
       "SELECT id_a, id_b FROM pairs WHERE rn = 1 ORDER BY id_a"),

    // final-emit mode: the ADVERSARIAL batch placement (all clicks a
    // batch before any view) must still equal the batch as-of — INNER
    // form of the same windowed oracle at ms grain
    "q247_asof_stream_final" ->
      ("WITH ev AS (SELECT event_id, user_id, epoch_ns(ts)//1000000 AS et, event_type FROM events), " +
       "c AS (SELECT event_id, user_id, et FROM ev WHERE event_type='click'), " +
       "v AS (SELECT event_id, user_id, et FROM ev WHERE event_type='view'), " +
       "pairs AS (SELECT c.event_id AS id_a, v.event_id AS id_b, " +
       "row_number() OVER (PARTITION BY c.event_id ORDER BY v.et DESC, v.event_id DESC) rn " +
       "FROM c JOIN v ON v.user_id = c.user_id AND v.et <= c.et AND v.et > c.et - 3600000) " +
       "SELECT id_a, id_b FROM pairs WHERE rn = 1 ORDER BY id_a"),

    "q44_split_assign" -> {
      val Seq(trainCut, valCut) =
        splitFractions.scanLeft(0.0)(_ + _._2).tail.init.map(Pipeline.hexBound)
      s"SELECT doc_id, CASE WHEN substr(md5(doc_id || ':$splitSalt'),1,4) < '$trainCut' " +
      s"THEN 'train' WHEN substr(md5(doc_id || ':$splitSalt'),1,4) < '$valCut' THEN 'val' " +
      "ELSE 'test' END AS split FROM documents ORDER BY doc_id"
    },

    "q47_repetition" ->
      ("SELECT doc_id, " +
       "CASE WHEN len(ws)-1 > 0 THEN (1000000*(len(ws)-1 - " +
       "len(list_distinct([array_to_string(ws[i:i+1],' ') FOR i IN generate_series(1,len(ws)-1)])))) " +
       "// (len(ws)-1) ELSE 0 END AS dup_2gram_e6, " +
       "CASE WHEN len(ws)-2 > 0 THEN (1000000*(len(ws)-2 - " +
       "len(list_distinct([array_to_string(ws[i:i+2],' ') FOR i IN generate_series(1,len(ws)-2)])))) " +
       "// (len(ws)-2) ELSE 0 END AS dup_3gram_e6, " +
       "CASE WHEN len(ws) > 0 THEN " +
       "(1000000*list_max([len(list_filter(ws, x -> x = w)) FOR w IN list_distinct(ws)])) " +
       "// len(ws) ELSE 0 END AS top_token_e6 " +
       "FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents) ORDER BY doc_id"),

    "q45_source_cap" ->
      ("SELECT doc_id, source FROM (SELECT doc_id, source, " +
       "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM documents) " +
       "WHERE rn <= 20 ORDER BY doc_id"),

    "q52_token_budget" ->
      ("SELECT doc_id, source, n_chars FROM (SELECT doc_id, source, n_chars, " +
       "sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM documents) " +
       "WHERE s <= 3000 ORDER BY doc_id"),

    // rates: src0 -> 2.5 (cut 8000), src1 -> 0.0 (cut 0000), default 0.5
    "q53_sample_rates" ->
      ("SELECT doc_id, source, unnest(range(n)) AS copy FROM (" +
       "SELECT doc_id, source, " +
       "(CASE WHEN source='src0' THEN 2 ELSE 0 END) + " +
       "(CASE WHEN substr(md5(doc_id || ':mix'),1,4) < " +
       "(CASE WHEN source='src0' THEN '8000' WHEN source='src1' THEN '0000' ELSE '8000' END) " +
       "THEN 1 ELSE 0 END) AS n FROM documents) WHERE n >= 1 " +
       "ORDER BY doc_id, copy"),

    "q54_pack" ->
      ("SELECT doc_id, source, CAST((s - n_chars) // 1600 AS BIGINT) AS bin, " +
       "CAST((s - n_chars) % 1600 AS BIGINT) AS bin_offset FROM (" +
       "SELECT doc_id, source, n_chars, sum(n_chars) OVER (PARTITION BY source " +
       "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s " +
       "FROM documents) ORDER BY doc_id"),

    "q55_chunk" ->
      ("WITH t AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents), " +
       "s AS (SELECT doc_id, ws, unnest(range(0, len(ws), 30)) AS st FROM t) " +
       "SELECT doc_id, st // 30 AS chunk_id, " +
       "array_to_string(ws[st+1:st+40], ' ') AS chunk_text, " +
       "CAST(len(ws[st+1:st+40]) AS BIGINT) AS chunk_tokens " +
       "FROM s ORDER BY doc_id, chunk_id"),

    "q56_epoch_shuffle" ->
      ("SELECT doc_id, row_number() OVER (ORDER BY md5(doc_id || ':epoch0'), doc_id) - 1 " +
       "AS shuffle_rank FROM documents ORDER BY doc_id"),

    "q113_length_batches" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT) AS ntok FROM documents), " +
       "r AS (SELECT doc_id, ntok, row_number() OVER (ORDER BY ntok, doc_id) - 1 AS rk FROM t) " +
       "SELECT doc_id, rk // 32 AS batch_id, " +
       "max(ntok) OVER (PARTITION BY rk // 32) AS batch_max_tokens " +
       "FROM r ORDER BY doc_id"),

    "q46_decontam" ->
      (s"WITH sh AS ($shingleSetSql) " +
       "SELECT a.doc_id AS doc_id, b.doc_id AS bench_id, " +
       "len(list_intersect(a.s, b.s)) AS overlap FROM sh a, sh b " +
       "WHERE b.doc_id % 17 = 0 AND a.doc_id <> b.doc_id " +
       "AND len(list_intersect(a.s, b.s)) >= 4 ORDER BY doc_id, bench_id"),

    "q127_corpus_card" ->
      ("WITH t AS (SELECT doc_id, md5(text) AS h, " +
       "CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents), " +
       "b AS (SELECT count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens, " +
       "count(DISTINCT h) AS n_unique FROM t), " +
       "m AS (SELECT v AS p50_tokens FROM (SELECT ntok AS v, " +
       "row_number() OVER (ORDER BY ntok) AS rn, count(*) OVER () AS cnt FROM t) " +
       "WHERE rn = (50 * (cnt - 1)) // 100 + 1) " +
       "SELECT n_docs, n_tokens, n_unique, " +
       "((n_docs - n_unique) * 1000000) // n_docs AS dup_rate_e6, p50_tokens FROM b, m"),

    // within-source md5 rank, then global (within, source, id) order
    "q128_interleave" ->
      ("WITH w AS (SELECT doc_id, source, " +
       "row_number() OVER (PARTITION BY source ORDER BY md5(doc_id || ':il1'), doc_id) AS wr " +
       "FROM documents) " +
       "SELECT doc_id, row_number() OVER (ORDER BY wr, source, doc_id) - 1 " +
       "AS interleave_rank FROM w ORDER BY doc_id"),

    // full HLL replay: md5 -> (bucket, rho) -> per-bucket max -> the exact
    // 2^49-scaled integer estimator (absent buckets contribute 2^49);
    // est_ok is Spark's accuracy invariant, pinned TRUE
    "q129_hll_distinct" ->
      (s"WITH r AS ($hllRegisterSql) " +
       s"SELECT source, n_registers, sum_rho, ${hllEstimateSql()} AS est_raw_e6, " +
       "TRUE AS est_ok FROM " +
       "(SELECT source, count(*) AS n_registers, CAST(sum(rho) AS BIGINT) AS sum_rho, " +
       "CAST(sum((1::BIGINT) << (49 - rho)) AS HUGEINT) + " +
       "(1024 - count(*)) * ((1::BIGINT) << 49)::HUGEINT AS n " +
       "FROM r GROUP BY source) ORDER BY source"),

    // full Count-Min replay: per-token exact counts -> 4 md5-derived
    // counter columns -> per-cell sums -> min-over-rows estimate
    "q130_cms_topk" ->
      ("WITH tok AS (SELECT unnest(string_split(text,' ')) AS t FROM documents), " +
       "pk AS (SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY t), " +
       "ctr AS (SELECT r.range AS i, " +
       "('0x' || substr(md5(r.range || ':cms:' || pk.t),1,12))::BIGINT % 2048 AS c, " +
       "CAST(sum(pk.cnt) AS BIGINT) AS cnt FROM pk CROSS JOIN range(4) r GROUP BY 1, 2), " +
       "est AS (SELECT pk.t AS token, CAST(min(ctr.cnt) AS BIGINT) AS est " +
       "FROM pk CROSS JOIN range(4) r JOIN ctr ON ctr.i = r.range " +
       "AND ctr.c = ('0x' || substr(md5(r.range || ':cms:' || pk.t),1,12))::BIGINT % 2048 " +
       "GROUP BY pk.t) " +
       "SELECT token, est FROM est WHERE est >= 100 ORDER BY token"),

    // per-pair union registers (bucket max over both sides) -> the same
    // exact integer estimator as q129
    "q135_source_overlap" ->
      (s"WITH r AS ($hllRegisterSql), " +
       "g AS (SELECT DISTINCT source FROM r), " +
       "p AS (SELECT a.source AS ga, b.source AS gb FROM g a, g b WHERE a.source < b.source), " +
       "u AS (SELECT p.ga, p.gb, r.b, max(r.rho) AS rho " +
       "FROM p JOIN r ON r.source = p.ga OR r.source = p.gb GROUP BY 1, 2, 3), " +
       "a2 AS (SELECT ga, gb, count(*) AS n_registers, CAST(sum(rho) AS BIGINT) AS sum_rho, " +
       "CAST(sum((1::BIGINT) << (49 - rho)) AS HUGEINT) + " +
       "(1024 - count(*)) * ((1::BIGINT) << 49)::HUGEINT AS n FROM u GROUP BY ga, gb) " +
       s"SELECT ga AS source_a, gb AS source_b, n_registers, sum_rho, ${hllEstimateSql()} AS est_raw_e6 " +
       "FROM a2 ORDER BY source_a, source_b"),

    "q134_sample_per_group" ->
      ("SELECT doc_id, source FROM (SELECT doc_id, source, " +
       "row_number() OVER (PARTITION BY source " +
       "ORDER BY md5(doc_id || ':hold2'), doc_id) AS rn FROM documents) " +
       "WHERE rn <= 5 ORDER BY doc_id"),

    // exact Jaccard over all cross pairs. Banding miss at the J=0.8
    // THRESHOLD is (1-0.8^4)^32 ~ 5e-8 per pair; the fixture's matching
    // pairs sit at J ~ 0.97 where the miss is (1-0.97^4)^32 ~ 8e-31 —
    // the exact rule is the oracle because no pair sits near the edge
    "q132_cross_minhash" ->
      (s"WITH sh AS ($shingleSetSql) " +
       "SELECT a.doc_id AS doc_id, b.doc_id AS bench_id FROM sh a, sh b " +
       "WHERE b.doc_id % 17 = 0 AND a.doc_id <> b.doc_id " +
       "AND len(list_intersect(a.s, b.s)) * 5 >= " +
       "4 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) " +
       "ORDER BY doc_id, bench_id"),

    "q133_fuzzy_decontam" ->
      (s"WITH sh AS ($shingleSetSql) " +
       "SELECT d.doc_id FROM documents d WHERE NOT EXISTS (" +
       "SELECT 1 FROM sh a, sh b WHERE a.doc_id = d.doc_id " +
       "AND b.doc_id % 17 = 0 AND a.doc_id <> b.doc_id " +
       "AND len(list_intersect(a.s, b.s)) * 5 >= " +
       "4 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))) " +
       "ORDER BY doc_id"),

    // collocations: full replay — same counts, same ONE double expression
    // tree for the discounted-lift score (int->double conversions and each
    // IEEE op are correctly rounded in both engines), same top-50 cut
    "q165_collocations" ->
      ("WITH t AS (SELECT string_split(text,' ') AS ws FROM documents), " +
       "uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM " +
       "(SELECT unnest(ws) AS w FROM t) GROUP BY w), " +
       "nn AS (SELECT CAST(sum(c) AS DOUBLE) AS nd FROM uni), " +
       "pr AS (SELECT ws[pos] AS t1, ws[pos+1] AS t2 FROM " +
       "(SELECT ws, unnest(generate_series(1, len(ws)-1)) AS pos FROM t)), " +
       "pc AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS c_pair FROM pr " +
       "GROUP BY 1, 2 HAVING count(*) >= 10), " +
       "sc AS (SELECT t1, t2, c_pair, u1.c AS c1, u2.c AS c2, " +
       "CAST(round(((c_pair - 5)::DOUBLE * (SELECT nd FROM nn)) * 1000000.0 " +
       "/ (u1.c::DOUBLE * u2.c::DOUBLE)) AS BIGINT) AS score_e6 " +
       "FROM pc JOIN uni u1 ON pc.t1 = u1.w JOIN uni u2 ON pc.t2 = u2.w) " +
       "SELECT t1, t2, c_pair, c1, c2, score_e6 FROM sc " +
       "ORDER BY score_e6 DESC, t1, t2 LIMIT 50"),

    // scalar quantization: full replay — per-dim min/max model, the exact
    // encode/decode expression tree (round half-up on nonneg args matches,
    // the -127/+127 shift is exact on integer-valued doubles, FLOAT
    // downcast correctly rounded), then the q18 cosine top-5 machinery
    // over the reconstructions
    "q166_scalar_quant" ->
      ("WITH m AS (SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn, " +
       "max(CAST(embedding[i] AS DOUBLE)) AS mx " +
       "FROM embeddings, (SELECT unnest(generate_series(1,64)) AS i) GROUP BY i), " +
       "ml AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM m), " +
       "d AS (SELECT vec_id, [CAST(ml.mns[i] + (((CASE WHEN ml.mxs[i] = ml.mns[i] THEN 0.0 " +
       "ELSE round(254.0 * (CAST(embedding[i] AS DOUBLE) - ml.mns[i]) / (ml.mxs[i] - ml.mns[i])) - 127.0 END) " +
       "+ 127.0) * (ml.mxs[i] - ml.mns[i])) / 254.0 AS FLOAT) " +
       "FOR i IN generate_series(1,64)] AS e FROM embeddings, ml), " +
       "e2 AS (SELECT vec_id, e, " +
       "sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN e])) AS nrm FROM d), " +
       "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
       "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
       "list_sum([CAST(q.e[i] AS DOUBLE)*CAST(c.e[i] AS DOUBLE) FOR i IN generate_series(1,64)])" +
       "/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
       "FROM (SELECT * FROM e2 WHERE vec_id < 10) q, e2 c WHERE c.vec_id != q.vec_id) " +
       "SELECT query_id, neighbor_id FROM scored WHERE rn <= 5 " +
       "ORDER BY query_id, neighbor_id"),

    // HDR quantile histogram: full integer replay (e6 quantize, bin-length
    // log bucket, group-partitioned cumulative rank, lower-bound decode)
    "q163_quantile_hist" ->
      (s"WITH $histCountsSql, " +
       "c AS (SELECT grp, bucket, cnt, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM q), " +
       "t AS (SELECT grp, sum(cnt) AS total FROM q GROUP BY grp), " +
       "p(p) AS (VALUES (50), (90), (99)), " +
       "r AS (SELECT grp, p, (p*total + 99)//100 AS rk FROM t CROSS JOIN p), " +
       "s AS (SELECT c.grp, r.p, min(c.bucket) AS bucket FROM c JOIN r " +
       "ON c.grp = r.grp AND c.cum >= r.rk GROUP BY 1, 2) " +
       "SELECT grp AS event_type, p, bucket, " +
       "CAST(CASE WHEN bucket < 64 THEN bucket " +
       "ELSE (((bucket-64) & 31) + 32) << ((bucket-64)//32 + 1)::INT END AS BIGINT) AS lb_e6 " +
       "FROM s ORDER BY event_type, p"),

    // merge transparency: the stored-and-merged histogram must equal one
    // full-corpus pass (the q131 pattern for the SUM-merged sketch)
    "q164_hist_store_merge" ->
      (s"WITH $histCountsSql " +
       "SELECT grp AS event_type, bucket, cnt FROM q ORDER BY event_type, bucket"),

    // outlier gate: the same replay derives each type's p99 bucket lower
    // bound, then the raw events filter against it
    "q167_hist_outliers" ->
      (s"WITH $histCountsSql, " +
       "c AS (SELECT grp, bucket, cnt, sum(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM q), " +
       "t AS (SELECT grp, sum(cnt) AS total FROM q GROUP BY grp), " +
       "s AS (SELECT c.grp, min(c.bucket) AS bucket FROM c JOIN t ON c.grp = t.grp " +
       "AND c.cum >= (99*t.total + 99)//100 GROUP BY 1), " +
       "th AS (SELECT grp, CAST(CASE WHEN bucket < 64 THEN bucket " +
       "ELSE (((bucket-64) & 31) + 32) << ((bucket-64)//32 + 1)::INT END AS BIGINT) AS p_lb_e6 FROM s) " +
       "SELECT event_id, event_type, CAST(round(value*1000000) AS BIGINT) AS v_e6, p_lb_e6 " +
       "FROM events JOIN th ON events.event_type = th.grp " +
       "AND CAST(round(value*1000000) AS BIGINT) >= p_lb_e6 " +
       "ORDER BY event_id"),

    // full Bloom replay: k md5-derived bit positions per text; the bench
    // set's position set IS the bitset, and a probe is flagged iff none
    // of its positions is missing from it (exactly the k-bit-test rule)
    "q168_bloom_gate" ->
      ("WITH pos AS (SELECT doc_id, " +
       s"('0x' || substr(md5(r.range || ':bloom:' || text),1,12))::BIGINT % $BloomM AS p " +
       s"FROM documents CROSS JOIN range($BloomK) r), " +
       "bset AS (SELECT DISTINCT p FROM pos WHERE doc_id % 10 = 0), " +
       "miss AS (SELECT DISTINCT doc_id FROM pos WHERE p NOT IN (SELECT p FROM bset)) " +
       "SELECT doc_id, doc_id NOT IN (SELECT doc_id FROM miss) AS might_contain " +
       "FROM documents ORDER BY doc_id"),

    // compaction must not change verdicts: the compacted stores share
    // their builders' replays
    "q202_cbloom_compact" ->
      ("WITH pos AS (SELECT doc_id, " +
       s"('0x' || substr(md5(r.range || ':bloom:' || text),1,12))::BIGINT % $BloomM AS p " +
       s"FROM documents CROSS JOIN range($BloomK) r), " +
       "bset AS (SELECT DISTINCT p FROM pos WHERE doc_id % 10 = 0 AND doc_id % 20 <> 0), " +
       "miss AS (SELECT DISTINCT doc_id FROM pos WHERE p NOT IN (SELECT p FROM bset)) " +
       "SELECT doc_id, doc_id NOT IN (SELECT doc_id FROM miss) AS might_contain " +
       "FROM documents ORDER BY doc_id"),
    "q203_minhash_compact" ->
      (s"WITH sh AS ($shingleSetSql), " +
       "hit AS (SELECT DISTINCT b.doc_id FROM sh b JOIN sh a " +
       "ON b.doc_id % 2 = 1 AND a.doc_id % 2 = 0 AND a.doc_id % 8 <> 0 " +
       "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))) " +
       "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 " +
       "AND doc_id NOT IN (SELECT doc_id FROM hit) ORDER BY doc_id"),

    // ANN compaction shares the takedown replay: brute top-5 over the
    // corpus minus the forgotten ninth
    "q206_ann_compact" ->
      (s"WITH e AS ($normedEmbSql), scored AS (" +
       "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
       s"row_number() OVER (PARTITION BY q.vec_id ORDER BY ($dotSqlQC)/(q.nrm*c.nrm) DESC, c.vec_id) AS rn " +
       "FROM (SELECT * FROM e WHERE vec_id < 10) q, e c " +
       "WHERE c.vec_id != q.vec_id AND c.vec_id % 9 <> 4) " +
       "SELECT query_id, neighbor_id FROM scored WHERE rn <= 5 ORDER BY query_id, neighbor_id"),

    // the cosine twin of q203: exact-cosine gate replay over the
    // remaining (evens minus every eighth) store vectors
    "q205_coslsh_compact" ->
      (s"WITH e AS ($normedEmbSql), " +
       "hit AS (SELECT DISTINCT a.vec_id FROM e a JOIN e b " +
       "ON a.vec_id % 2 = 1 AND b.vec_id % 2 = 0 AND b.vec_id % 8 <> 0 " +
       s"AND ($dotSql) / (a.nrm*b.nrm) >= 0.42) " +
       "SELECT vec_id FROM e WHERE vec_id % 2 = 1 " +
       "AND vec_id NOT IN (SELECT vec_id FROM hit) ORDER BY vec_id"),

    // counting-Bloom replay: the q168 position math with the REMAINING
    // store predicate — deletion cancelled the %20=0 insertions exactly,
    // so live cells are the remaining keys' position set (a duplicate
    // text shared with a remaining key keeps its cells alive — the
    // multiset semantics the per-cell counts implement)
    "q201_counting_bloom" ->
      ("WITH pos AS (SELECT doc_id, " +
       s"('0x' || substr(md5(r.range || ':bloom:' || text),1,12))::BIGINT % $BloomM AS p " +
       s"FROM documents CROSS JOIN range($BloomK) r), " +
       "bset AS (SELECT DISTINCT p FROM pos WHERE doc_id % 10 = 0 AND doc_id % 20 <> 0), " +
       "miss AS (SELECT DISTINCT doc_id FROM pos WHERE p NOT IN (SELECT p FROM bset)) " +
       "SELECT doc_id, doc_id NOT IN (SELECT doc_id FROM miss) AS might_contain " +
       "FROM documents ORDER BY doc_id"),

    // full binary-ANN replay: the q120 md5 ±1 matrix with salt sb1 →
    // per-plane sign bits → Hamming = count of disagreeing bits →
    // 50-candidate cut (ham, id) → exact-cosine rerank (the q18 shape)
    "q170_binary_ann" -> binaryAnnReplaySql,

    // the stored index holds the same codes the live path computes, and
    // the search is row-identical — one replay verifies both
    "q171_binary_store" -> binaryAnnReplaySql,

    // exact Hamming-gate replay over PACKED signed words (the q169
    // two's-complement fold): int8-reconstruct every vector (the q166
    // model), sign-quantize reconstructions AND the odd originals, fold
    // each 128-bit code to two signed BIGINTs, then flag = any odd
    // original within bit_count(xor) Hamming 3 — the pigeonhole path is
    // lossless, so this plain semantic replay pins the gate exactly
    "q172_hamming_gate" ->
      (s"WITH $signMatrixSql,\n" +
       "m AS (SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn, " +
       "max(CAST(embedding[i] AS DOUBLE)) AS mx " +
       "FROM embeddings, (SELECT unnest(generate_series(1,64)) AS i) GROUP BY i),\n" +
       "ml AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM m),\n" +
       "d AS (SELECT vec_id, [CAST(ml.mns[i] + (((CASE WHEN ml.mxs[i] = ml.mns[i] THEN 0.0 " +
       "ELSE round(254.0 * (CAST(embedding[i] AS DOUBLE) - ml.mns[i]) / (ml.mxs[i] - ml.mns[i])) - 127.0 END) " +
       "+ 127.0) * (ml.mxs[i] - ml.mns[i])) / 254.0 AS FLOAT) " +
       "FOR i IN generate_series(1,64)] AS e FROM embeddings, ml),\n" +
       "po AS (SELECT vec_id, j, CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * srow[i] " +
       "FOR i IN generate_series(1, 64)]) > 0 THEN 1 ELSE 0 END AS sb " +
       "FROM embeddings CROSS JOIN sgm WHERE vec_id % 2 = 1),\n" +
       "pr AS (SELECT vec_id, j, CASE WHEN list_sum([CAST(e[i] AS DOUBLE) * srow[i] " +
       "FOR i IN generate_series(1, 64)]) > 0 THEN 1 ELSE 0 END AS sb " +
       "FROM d CROSS JOIN sgm),\n" +
       s"__p2(b, pw) AS (VALUES ${(0 until 64).map(b => s"($b, ${BigInt(1) << b}::HUGEINT)").mkString(", ")}),\n" +
       "wo AS (SELECT vec_id, j // 64 AS word, sum(pw) AS s FROM po " +
       "JOIN __p2 ON (j % 64) = __p2.b WHERE sb = 1 GROUP BY vec_id, j // 64),\n" +
       "co AS (SELECT base.vec_id, " +
       "COALESCE(MAX(CASE WHEN word = 0 THEN (CASE WHEN s >= 9223372036854775808::HUGEINT " +
       "THEN s - 18446744073709551616::HUGEINT ELSE s END)::BIGINT END), 0) AS w0, " +
       "COALESCE(MAX(CASE WHEN word = 1 THEN (CASE WHEN s >= 9223372036854775808::HUGEINT " +
       "THEN s - 18446744073709551616::HUGEINT ELSE s END)::BIGINT END), 0) AS w1 " +
       "FROM (SELECT vec_id FROM embeddings WHERE vec_id % 2 = 1) base " +
       "LEFT JOIN wo ON wo.vec_id = base.vec_id GROUP BY base.vec_id),\n" +
       "wr AS (SELECT vec_id, j // 64 AS word, sum(pw) AS s FROM pr " +
       "JOIN __p2 ON (j % 64) = __p2.b WHERE sb = 1 GROUP BY vec_id, j // 64),\n" +
       "cr AS (SELECT base.vec_id, " +
       "COALESCE(MAX(CASE WHEN word = 0 THEN (CASE WHEN s >= 9223372036854775808::HUGEINT " +
       "THEN s - 18446744073709551616::HUGEINT ELSE s END)::BIGINT END), 0) AS w0, " +
       "COALESCE(MAX(CASE WHEN word = 1 THEN (CASE WHEN s >= 9223372036854775808::HUGEINT " +
       "THEN s - 18446744073709551616::HUGEINT ELSE s END)::BIGINT END), 0) AS w1 " +
       "FROM (SELECT vec_id FROM embeddings) base " +
       "LEFT JOIN wr ON wr.vec_id = base.vec_id GROUP BY base.vec_id),\n" +
       "dup AS (SELECT DISTINCT q.vec_id FROM cr q JOIN co c ON " +
       "bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) <= 3)\n" +
       "SELECT e0.vec_id, e0.vec_id IN (SELECT vec_id FROM dup) AS is_dup " +
       "FROM embeddings e0 ORDER BY e0.vec_id"),

    // word-packed bitset content replay: HUGEINT mask sum over each
    // word's DISTINCT bits, then the two's-complement fold to Spark's
    // signed longs (the q16 __sims pattern)
    "q169_bloom_store_merge" ->
      ("WITH pos AS (SELECT " +
       s"('0x' || substr(md5(r.range || ':bloom:' || text),1,12))::BIGINT % $BloomM AS p " +
       s"FROM documents CROSS JOIN range($BloomK) r WHERE doc_id % 10 = 0), " +
       "dp AS (SELECT DISTINCT (p // 64) AS word, (p % 64) AS bit FROM pos), " +
       s"__p2(b, pw) AS (VALUES ${(0 until 64).map(b => s"($b, ${BigInt(1) << b}::HUGEINT)").mkString(", ")}), " +
       "w AS (SELECT word, sum(pw) AS s FROM dp JOIN __p2 ON dp.bit = __p2.b GROUP BY word) " +
       "SELECT word, (CASE WHEN s >= 9223372036854775808::HUGEINT " +
       "THEN s - 18446744073709551616::HUGEINT ELSE s END)::BIGINT AS bits " +
       "FROM w ORDER BY word"),

    // merge transparency: the stored-and-merged registers must equal one
    // full-corpus pass, so the oracle is the same replay as q129
    "q131_hll_store_merge" ->
      (s"WITH r AS ($hllRegisterSql) " +
       s"SELECT source, n_registers, sum_rho, ${hllEstimateSql()} AS est_raw_e6 FROM " +
       "(SELECT source, count(*) AS n_registers, CAST(sum(rho) AS BIGINT) AS sum_rho, " +
       "CAST(sum((1::BIGINT) << (49 - rho)) AS HUGEINT) + " +
       "(1024 - count(*)) * ((1::BIGINT) << 49)::HUGEINT AS n " +
       "FROM r GROUP BY source) ORDER BY source"),

    // stage = exact tertile arithmetic, then rank by (stage, md5, id)
    "q125_curriculum" ->
      ("WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok FROM documents), " +
       "r AS (SELECT doc_id, row_number() OVER (ORDER BY ntok DESC, doc_id) AS rn, " +
       "count(*) OVER () AS cnt FROM t), " +
       "st AS (SELECT doc_id, ((rn - 1) * 4) // cnt AS stage FROM r) " +
       "SELECT doc_id, stage, row_number() OVER (ORDER BY stage, md5(doc_id || ':cur1'), doc_id) - 1 " +
       "AS curriculum_rank FROM st ORDER BY doc_id"),

    "q126_sample_exact" ->
      ("SELECT doc_id FROM (SELECT doc_id FROM documents " +
       "ORDER BY md5(doc_id || ':holdout'), doc_id LIMIT 50) ORDER BY doc_id"),

    // every stage replayed: q74's normalize chain -> min-id dedup ->
    // length gate -> q55's chunk arithmetic
    "q124_e2e_curation" ->
      ("WITH n AS (SELECT doc_id, lower(trim(regexp_replace(regexp_replace(" +
       s"nfc_normalize(text), '${graft.operators.TextAnalysis.ControlChars}', ' ', 'g'), " +
       "' +', ' ', 'g'))) AS t FROM documents), " +
       "k AS (SELECT min(doc_id) AS doc_id, t FROM n GROUP BY t), " +
       "g AS (SELECT doc_id, string_split(t, ' ') AS ws FROM k " +
       "WHERE len(string_split(t, ' ')) >= 20), " +
       "s AS (SELECT doc_id, ws, unnest(range(0, len(ws), 40)) AS st FROM g) " +
       "SELECT doc_id, st // 40 AS chunk_id, " +
       "CAST(len(ws[st+1:st+40]) AS BIGINT) AS chunk_tokens " +
       "FROM s ORDER BY doc_id, chunk_id"),

    // NOT EXISTS over the q46 flag rule = the anti-join
    "q121_decontaminate" ->
      (s"WITH sh AS ($shingleSetSql) " +
       "SELECT a.doc_id FROM sh a WHERE NOT EXISTS (" +
       "SELECT 1 FROM sh b WHERE b.doc_id % 17 = 0 AND a.doc_id <> b.doc_id " +
       "AND len(list_intersect(a.s, b.s)) >= 4) ORDER BY doc_id"),

    // nearest-rank percentile values: rank = (p*(cnt-1))//100 + 1
    "q122_group_percentiles" ->
      ("WITH t AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v FROM documents), " +
       "r AS (SELECT source, v, row_number() OVER (PARTITION BY source ORDER BY v) AS rn, " +
       "count(*) OVER (PARTITION BY source) AS cnt FROM t), " +
       "p(pc) AS (VALUES (0), (25), (50), (75), (100)) " +
       "SELECT source, CAST(pc AS BIGINT) AS percent, v AS value FROM r, p " +
       "WHERE rn = (pc * (cnt - 1)) // 100 + 1 ORDER BY source, percent"),

    // same Unicode script classes in RE2 spelling; 'g' = global replace
    "q123_scripts" ->
      ("SELECT doc_id, " +
       "CAST(length(text) - length(regexp_replace(text, '\\p{Latin}', '', 'g')) AS BIGINT) AS n_latin, " +
       "CAST(length(text) - length(regexp_replace(text, '\\p{Cyrillic}', '', 'g')) AS BIGINT) AS n_cyrillic, " +
       "CAST(length(text) - length(regexp_replace(text, '\\p{Han}', '', 'g')) AS BIGINT) AS n_han, " +
       "CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit, " +
       "CAST(length(text) AS BIGINT) AS n_len FROM documents ORDER BY doc_id"),

    "q42_interval_join" -> intervalJoinOracleSql,

    // the SQL rewrite answers with exactly q42's pairs ⇒ shared oracle
    "q239_sql_interval_join" -> intervalJoinOracleSql,
    // auto-sized bucket: same relation, same oracle — the bucket choice
    // affects replication only
    "q245_sql_interval_auto" -> intervalJoinOracleSql,
    "q246_interval_join_auto" -> intervalJoinOracleSql,

    "q40_join_indexed" -> boxJoinOracleSql,

    "q48_persisted_filter" -> prunedBoxFilterOracleSql,

    // persisted quadtree store answers the same box filter as the R-tree
    // store — one shared oracle keeps the symmetry pinned
    "q153_quadtree_store_filter" -> prunedBoxFilterOracleSql,

    // interval store join == live q42/q50 pairs
    "q151_interval_store_join" -> intervalJoinOracleSql,

    // interval store window filter: closed-interval overlap with [T1, T1+12h]
    "q152_interval_store_filter" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       s"SELECT event_id FROM epts WHERE et <= ${T1 + 43200000000L} " +
       s"AND et + 60000000 >= $T1 ORDER BY event_id"),

    "q49_persisted_join" -> boxJoinOracleSql,

    // NB: DuckDB `//` on DOUBLE is true division (floors integers only) —
    // use explicit floor() like the raster oracle fragments
    "q60_viz_bins" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       "SELECT CAST(floor(ex/16) AS INT) AS px, CAST(floor(ey/16) AS INT) AS py, " +
       "count(*) AS cnt FROM epts WHERE ex >= 0 AND ex < 512 AND ey >= 0 AND ey < 512 " +
       "GROUP BY 1, 2 ORDER BY px, py"),

    "q68_viz_geom" ->
      ("WITH r AS (SELECT n_nationkey, " +
       "CAST(floor(((n_nationkey*37)%800)/10) AS INT) AS a0, " +
       "CAST(floor((((n_nationkey*37)%800)+150)/10) AS INT) AS a1, " +
       "CAST(floor(((n_nationkey*53)%800)/10) AS INT) AS b0, " +
       "CAST(floor((((n_nationkey*53)%800)+150)/10) AS INT) AS b1 FROM nation), " +
       "px AS (SELECT DISTINCT n_nationkey, px, py FROM (" +
       "SELECT n_nationkey, unnest(generate_series(a0, a1)) AS px, b0 AS py FROM r " +
       "UNION ALL SELECT n_nationkey, unnest(generate_series(a0, a1)) AS px, b1 AS py FROM r " +
       "UNION ALL SELECT n_nationkey, a0 AS px, unnest(generate_series(b0, b1)) AS py FROM r " +
       "UNION ALL SELECT n_nationkey, a1 AS px, unnest(generate_series(b0, b1)) AS py FROM r)) " +
       "SELECT CAST(px AS INT) AS px, CAST(py AS INT) AS py, count(*) AS cnt " +
       "FROM px GROUP BY 1, 2 ORDER BY px, py"),

    // first occurrence = min (doc_id, pos); pos < 1e6 per doc, so the
    // packed doc_id*1e6+pos key orders identically to the Spark struct min
    "q72_dedup_lines" ->
      ("WITH l AS (SELECT doc_id, unnest(generate_series(1, len(string_split(text, ' ')))) AS pos, " +
       "unnest(string_split(text, ' ')) AS line FROM documents), " +
       "f AS (SELECT line, min(doc_id*1000000 + pos) AS fk FROM l GROUP BY line), " +
       "k AS (SELECT l.doc_id, l.pos, l.line FROM l JOIN f ON l.line = f.line " +
       "AND l.doc_id*1000000 + l.pos = f.fk) " +
       "SELECT d.doc_id, COALESCE(string_agg(k.line, ' ' ORDER BY k.pos), '') AS text_dedup " +
       "FROM documents d LEFT JOIN k ON d.doc_id = k.doc_id " +
       "GROUP BY d.doc_id ORDER BY d.doc_id"),

    // the pattern strings and the application order are interpolated from
    // TextAnalysis.Pii itself — the oracle can never drift from the operator
    "q73_redact_pii" -> {
      val chain = graft.operators.TextAnalysis.Pii.Ordered.foldLeft("raw") {
        case (acc, (pat, repl)) => s"regexp_replace($acc, '$pat', '$repl', 'g')"
      }
      ("WITH r AS (SELECT doc_id, substr(text, 1, 40) || ' mail user' || " +
       "CAST(doc_id AS VARCHAR) || '@mail.example.com ip 10.1.2.' || " +
       "CAST(doc_id % 250 AS VARCHAR) || " +
       "' tel +1 555-123-4567 card 4111111111111111 ssn 123-45-6789 end' AS raw " +
       "FROM documents) " +
       s"SELECT doc_id, $chain AS text_redacted FROM r ORDER BY doc_id")
    },

    // normProbe and the control-char class are the operator's own constants;
    // DuckDB's nfc_normalize is the NFC twin
    "q74_normalize" ->
      ("WITH r AS (SELECT doc_id, upper(substr(text, 1, 30)) || " +
       s"'$normProbe' AS raw FROM documents) " +
       "SELECT doc_id, lower(trim(regexp_replace(regexp_replace(" +
       s"nfc_normalize(raw), '${graft.operators.TextAnalysis.ControlChars}', ' ', 'g'), " +
       "' +', ' ', 'g'))) AS text_norm FROM r ORDER BY doc_id"),

    // interval < over closed intervals: a.start < b.start AND a.end < b.end;
    // after swaps sides; center/length are exact integer arithmetic
    "q75_temporal_order" ->
      (s"WITH epts AS (${Tables.eventPtsSql}), " +
       "iv AS (SELECT event_id, et, et + (event_id % 86400) * 1000000 AS ee FROM epts) " +
       s"SELECT event_id, (et < $T1 AND ee < $T2) AS is_before, " +
       s"($T1 < et AND $T2 < ee) AS is_after, " +
       "et + (ee - et) // 2 AS tc, ee - et AS tl " +
       "FROM iv ORDER BY event_id"),

    // canvas grid == raster grid at these parameters, so the raster-bin
    // render is exactly the per-cell count histogram (see the query note)
    "q70_viz_raster" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       "SELECT CAST(floor(ex/16) AS INT) AS px, CAST(floor(ey/16) AS INT) AS py, " +
       "count(*) AS v FROM epts WHERE ex >= 0 AND ex < 512 AND ey >= 0 AND ey < 512 " +
       "GROUP BY 1, 2 ORDER BY px, py"),

    // micros-since-epoch < 2^53, so the double z is exact on both engines
    "q69_z_roundtrip" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       "SELECT event_id, ex AS px, ey AS py, CAST(et AS DOUBLE) AS pz " +
       "FROM epts ORDER BY event_id"),

    "q61_dup_spans" ->
      (s"WITH inst AS ($spanInstSql), " +
       "cnt AS (SELECT gram, count(*) AS tot FROM inst GROUP BY gram), " +
       "per AS (SELECT doc_id, count(*) AS n_spans, " +
       "sum(CASE WHEN tot > 1 THEN 1 ELSE 0 END) AS n_dup " +
       "FROM inst JOIN cnt USING (gram) GROUP BY doc_id) " +
       "SELECT d.doc_id, CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans, " +
       "CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_spans " +
       "FROM documents d LEFT JOIN per p USING (doc_id) ORDER BY doc_id"),

    // token-index set algebra: all 5-gram occurrences with start index ->
    // distinct-doc-frequency >= 2 spans -> covered token indexes -> anti-join
    // kept tokens -> ordered string_agg. Mirrors removeDuplicateSpans exactly
    // (docs with no duplicated span keep text verbatim; fully covered docs
    // become '').
    "q112_remove_dup_spans" ->
      ("WITH t AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM documents), " +
       "occ AS (SELECT doc_id, u.s AS s, u.g AS g FROM (SELECT doc_id, " +
       "unnest([{'s': i, 'g': array_to_string(ws[i:i+4],' ')} " +
       "FOR i IN generate_series(1, len(ws)-4)]) AS u FROM t WHERE len(ws) >= 5)), " +
       "dup AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ) GROUP BY g HAVING count(*) >= 2), " +
       "docc AS (SELECT doc_id, s FROM occ JOIN dup USING (g)), " +
       "rem AS (SELECT DISTINCT doc_id, unnest(generate_series(s, s+4)) AS i FROM docc), " +
       "toks AS (SELECT doc_id, u.i AS i, u.tok AS tok FROM (SELECT doc_id, " +
       "unnest([{'i': i, 'tok': ws[i]} FOR i IN generate_series(1, len(ws))]) AS u FROM t)), " +
       "dupdocs AS (SELECT DISTINCT doc_id FROM docc), " +
       "kept AS (SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.i) AS ct FROM " +
       "(SELECT toks.* FROM toks JOIN dupdocs USING (doc_id) " +
       "ANTI JOIN rem ON toks.doc_id = rem.doc_id AND toks.i = rem.i) k GROUP BY k.doc_id), " +
       "remc AS (SELECT doc_id, count(*) AS nrem FROM rem GROUP BY doc_id), " +
       "rw AS (SELECT dd.doc_id, COALESCE(kept.ct, '') AS ct, remc.nrem FROM dupdocs dd " +
       "LEFT JOIN kept USING (doc_id) LEFT JOIN remc USING (doc_id)) " +
       "SELECT d.doc_id, COALESCE(rw.ct, d.text) AS clean_text, " +
       "CAST(COALESCE(rw.nrem, 0) AS BIGINT) AS n_removed_tokens " +
       "FROM documents d LEFT JOIN rw USING (doc_id) ORDER BY d.doc_id"),

    // same occ/dup/rem token-index algebra as q112, then gaps-and-islands:
    // consecutive covered indexes share i - row_number, each island is one
    // maximal span; the text slice is 1-based inclusive in DuckDB
    "q207_maximal_dup_spans" ->
      ("WITH t AS (SELECT doc_id, text, string_split(text,' ') AS ws FROM documents), " +
       "occ AS (SELECT doc_id, u.s AS s, u.g AS g FROM (SELECT doc_id, " +
       "unnest([{'s': i, 'g': array_to_string(ws[i:i+4],' ')} " +
       "FOR i IN generate_series(1, len(ws)-4)]) AS u FROM t WHERE len(ws) >= 5)), " +
       "dup AS (SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ) GROUP BY g HAVING count(*) >= 2), " +
       "docc AS (SELECT doc_id, s FROM occ JOIN dup USING (g)), " +
       "rem AS (SELECT DISTINCT doc_id, unnest(generate_series(s, s+4)) AS i FROM docc), " +
       "isl AS (SELECT doc_id, i, i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp FROM rem), " +
       "sp AS (SELECT doc_id, min(i) AS st, count(*) AS len FROM isl GROUP BY doc_id, grp) " +
       "SELECT sp.doc_id, CAST(st - 1 AS BIGINT) AS span_start, CAST(len AS BIGINT) AS span_len, " +
       "array_to_string(t.ws[st:st+len-1], ' ') AS span_text " +
       "FROM sp JOIN t USING (doc_id) ORDER BY sp.doc_id, span_start"),

    "q62_incr_dedup" ->
      (s"WITH inst AS ($spanInstSql), " +
       "srcs AS (SELECT doc_id, CAST(substr(source, 4) AS INT) AS srcn FROM documents), " +
       "oldg AS (SELECT DISTINCT gram FROM inst JOIN srcs USING (doc_id) WHERE srcn < 10), " +
       "newi AS (SELECT doc_id, gram FROM inst JOIN srcs USING (doc_id) WHERE srcn >= 10), " +
       "hits AS (SELECT doc_id, count(*) AS m FROM newi JOIN oldg USING (gram) GROUP BY doc_id) " +
       "SELECT s.doc_id FROM srcs s WHERE s.srcn >= 10 " +
       "AND s.doc_id NOT IN (SELECT doc_id FROM hits WHERE m >= 2) ORDER BY doc_id"),

    // q129's register replay keyed by the concat'd (type, week) group over
    // user_id; est_ok is Spark's accuracy invariant, pinned TRUE
    "q146_windowed_distinct" ->
      ("WITH base AS (SELECT event_type || ':' || " +
       "(epoch_ns(ts)//1000 - epoch_ns(ts)//1000 % 604800000000) AS g, " +
       "md5(user_id::VARCHAR || ':hll') AS h FROM events), " +
       "r AS (SELECT g, ('0x' || substr(h,1,4))::BIGINT % 1024 AS b, " +
       "max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS rho " +
       "FROM (SELECT g, h, ('0x' || substr(h,5,12))::BIGINT AS w FROM base) GROUP BY g, b) " +
       "SELECT g AS \"group\", n_registers, sum_rho, " +
       s"${hllEstimateSql()} AS est_raw_e6, TRUE AS est_ok FROM " +
       "(SELECT g, count(*) AS n_registers, CAST(sum(rho) AS BIGINT) AS sum_rho, " +
       "CAST(sum((1::BIGINT) << (49 - rho)) AS HUGEINT) + " +
       "(1024 - count(*)) * ((1::BIGINT) << 49)::HUGEINT AS n " +
       "FROM r GROUP BY g) ORDER BY \"group\""),

    "q145_profile" ->
      (hllProfileColSql("event_type") + " UNION ALL " +
       hllProfileColSql("user_id") + " ORDER BY \"column\""),

    // presence via flags + null-safe content compare, like the operator
    "q144_snapshot_diff" ->
      ("WITH v1 AS (SELECT doc_id, md5(text) AS h, TRUE AS p FROM documents WHERE doc_id % 7 <> 0), " +
       "v2 AS (SELECT doc_id, md5(CASE WHEN doc_id % 3 = 0 THEN text || ' rev2' ELSE text END) AS h, " +
       "TRUE AS p FROM documents WHERE doc_id % 5 <> 0) " +
       "SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id, " +
       "CASE WHEN v1.p IS NULL THEN 'added' WHEN v2.p IS NULL THEN 'removed' " +
       "WHEN v1.h IS NOT DISTINCT FROM v2.h THEN 'unchanged' ELSE 'changed' END AS status " +
       "FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id ORDER BY doc_id"),

    "q142_json_props" ->
      ("SELECT event_type, count(*) AS n, " +
       "CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k, " +
       "min(json_extract(props, '$.k')::BIGINT) AS min_k, " +
       "max(json_extract(props, '$.k')::BIGINT) AS max_k " +
       "FROM events GROUP BY event_type ORDER BY event_type"),

    "q143_rollup" ->
      ("WITH e AS (SELECT event_type, epoch_ns(ts)//1000 AS et, " +
       "CAST(floor(value * 1000000) AS BIGINT) AS v6 FROM events), " +
       "b AS (SELECT event_type, et - et % 604800000000 AS wk, v6 FROM e) " +
       "SELECT event_type, wk, count(*) AS n, CAST(sum(v6) AS BIGINT) AS sum_value_e6 " +
       "FROM b GROUP BY ROLLUP(event_type, wk) " +
       "ORDER BY event_type NULLS FIRST, wk NULLS FIRST"),

    // greedy == chained first-qualifying-rank mins (rn ordered like the
    // operator's sort); stage times join back through the rank
    "q139_funnel" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS et, event_id, event_type FROM events), " +
       "ev AS (SELECT user_id AS k, et, event_type AS s, " +
       "row_number() OVER (PARTITION BY user_id ORDER BY et, event_id) AS rn " +
       "FROM e WHERE event_type IN ('signup','click','purchase')), " +
       "f1 AS (SELECT k, min(rn) AS r1 FROM ev WHERE s = 'signup' GROUP BY k), " +
       "f2 AS (SELECT ev.k, min(rn) AS r2 FROM ev JOIN f1 ON ev.k = f1.k " +
       "WHERE s = 'click' AND rn > r1 GROUP BY ev.k), " +
       "f3 AS (SELECT ev.k, min(rn) AS r3 FROM ev JOIN f2 ON ev.k = f2.k " +
       "WHERE s = 'purchase' AND rn > r2 GROUP BY ev.k) " +
       "SELECT u.k AS user_id, " +
       "CAST(CASE WHEN r3 IS NOT NULL THEN 3 WHEN r2 IS NOT NULL THEN 2 " +
       "WHEN r1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached, " +
       "e1.et AS t1, e2.et AS t2, e3.et AS t3 " +
       "FROM (SELECT DISTINCT k FROM ev) u " +
       "LEFT JOIN f1 ON u.k = f1.k LEFT JOIN f2 ON u.k = f2.k LEFT JOIN f3 ON u.k = f3.k " +
       "LEFT JOIN ev e1 ON e1.k = u.k AND e1.rn = r1 " +
       "LEFT JOIN ev e2 ON e2.k = u.k AND e2.rn = r2 " +
       "LEFT JOIN ev e3 ON e3.k = u.k AND e3.rn = r3 " +
       "ORDER BY user_id"),

    // same closed RANGE frame; floor before the e6 cast on both sides
    "q141_trailing_stats" ->
      ("WITH e AS (SELECT event_id, user_id, epoch_ns(ts)//1000 AS et, " +
       "CAST(floor(value * 1000000) AS BIGINT) AS v6 FROM events), " +
       "t AS (SELECT event_id, v6, " +
       "count(*) OVER (PARTITION BY user_id ORDER BY et " +
       "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS trail_cnt, " +
       "CAST(sum(v6) OVER (PARTITION BY user_id ORDER BY et " +
       "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS trail_sum_e6 FROM e) " +
       "SELECT event_id, trail_cnt, trail_sum_e6, " +
       "v6 * trail_cnt > 2 * trail_sum_e6 AS spike FROM t ORDER BY event_id"),

    "q140_retention" ->
      ("WITH e AS (SELECT user_id AS k, epoch_ns(ts)//1000 AS et FROM events), " +
       "b AS (SELECT k, et - et % 604800000000 AS rb FROM e), " +
       "f AS (SELECT k, min(rb) AS cohort FROM b GROUP BY k), " +
       "c AS (SELECT DISTINCT b.k, cohort, (rb - cohort) // 604800000000 AS age " +
       "FROM b JOIN f ON b.k = f.k) " +
       "SELECT cohort, age, count(*) AS n_active FROM c GROUP BY cohort, age " +
       "ORDER BY cohort, age"),

    // same union + IGNORE NULLS window; obs sorts before grid at equal t,
    // simultaneous obs ordered by the tie column (event_id) on both sides
    "q138_resample_locf" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS et, event_id FROM events), " +
       "obs AS (SELECT user_id AS k, et AS t, event_id AS tb, event_id AS v, 0 AS g FROM e), " +
       "b AS (SELECT user_id AS k, min(et) AS lo, max(et) AS hi FROM e GROUP BY 1), " +
       "grid AS (SELECT k, unnest(generate_series(lo - lo % 604800000000, hi, 604800000000)) AS t, " +
       "NULL::BIGINT AS tb, NULL::BIGINT AS v, 1 AS g FROM b), " +
       "u AS (SELECT * FROM obs UNION ALL SELECT * FROM grid), " +
       "f AS (SELECT k, t, g, last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY t, g, tb " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf FROM u) " +
       "SELECT k AS key, t AS grid_t, value_locf FROM f WHERE g = 1 ORDER BY key, grid_t"),

    // identical two-window formulation (lag -> running gap-break sum)
    "q137_sessionize" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts)//1000 AS et, event_id FROM events), " +
       "l AS (SELECT user_id, et, event_id, " +
       "lag(et) OVER (PARTITION BY user_id ORDER BY et, event_id) AS p FROM e), " +
       "s AS (SELECT user_id, et, " +
       "CAST(sum(CASE WHEN p IS NULL OR et - p > 3600000000 THEN 1 ELSE 0 END) " +
       "OVER (PARTITION BY user_id ORDER BY et, event_id) - 1 AS BIGINT) AS session_seq FROM l) " +
       "SELECT user_id, session_seq, count(*) AS n_events, " +
       "min(et) AS t_start, max(et) AS t_end, max(et) - min(et) AS duration " +
       "FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq"),

    // same store split as q62; counts from the exact instance tables
    "q136_novelty_score" ->
      (s"WITH inst AS ($spanInstSql), " +
       "srcs AS (SELECT doc_id, CAST(substr(source, 4) AS INT) AS srcn FROM documents), " +
       "oldg AS (SELECT DISTINCT gram FROM inst JOIN srcs USING (doc_id) WHERE srcn < 10), " +
       "newi AS (SELECT doc_id, gram FROM inst JOIN srcs USING (doc_id) WHERE srcn >= 10), " +
       "tot AS (SELECT doc_id, count(*) AS total_spans FROM newi GROUP BY doc_id), " +
       "sn AS (SELECT doc_id, count(*) AS seen_spans FROM newi JOIN oldg USING (gram) GROUP BY doc_id) " +
       "SELECT s.doc_id, CAST(COALESCE(t.total_spans, 0) AS BIGINT) AS total_spans, " +
       "CAST(COALESCE(x.seen_spans, 0) AS BIGINT) AS seen_spans, " +
       "CAST(CASE WHEN COALESCE(t.total_spans, 0) = 0 THEN 1000000 " +
       "ELSE 1000000 * (t.total_spans - COALESCE(x.seen_spans, 0)) // t.total_spans END AS BIGINT) AS novelty_e6 " +
       "FROM srcs s LEFT JOIN tot t USING (doc_id) LEFT JOIN sn x USING (doc_id) " +
       "WHERE s.srcn >= 10 ORDER BY doc_id"),

    "q63_quality_gate" ->
      ("WITH t AS (SELECT doc_id, source, string_split(text,' ') AS ws FROM documents), " +
       "q AS (SELECT doc_id, source, CAST(round(500000.0*len(list_distinct(ws))/len(ws) + " +
       s"500000.0*(len(ws)-len(list_filter(ws, w -> list_contains($stopListSql, w))))/len(ws)) AS BIGINT) AS q6 FROM t), " +
       "r AS (SELECT doc_id, row_number() OVER (PARTITION BY source ORDER BY q6 DESC, doc_id) AS rn, " +
       "count(*) OVER (PARTITION BY source) AS cnt FROM q) " +
       "SELECT doc_id FROM r WHERE rn*4 <= cnt ORDER BY doc_id"),

    // identical result contract to q7 — the indexed path must answer the
    // same query
    "q67_knn_join_store" -> knnJoinOracleSql,

    "q65_vocab_topk" ->
      ("SELECT token, count(*) AS cnt FROM " +
       "(SELECT unnest(string_split(text,' ')) AS token FROM documents) " +
       "GROUP BY token ORDER BY cnt DESC, token LIMIT 50"),

    "q66_pair_counts" ->
      ("WITH t AS (SELECT string_split(text,' ') AS ws FROM documents), " +
       "p AS (SELECT unnest(ws[1:len(ws)-1]) AS t1, unnest(ws[2:len(ws)]) AS t2 FROM t) " +
       "SELECT t1, t2, count(*) AS cnt FROM p GROUP BY t1, t2 " +
       "ORDER BY cnt DESC, t1, t2 LIMIT 50"),

    "q64_dup_rate" ->
      (s"WITH fp AS (SELECT source, $winnowFpSql AS fpw FROM documents) " +
       "SELECT source AS grp, count(*) AS n_docs, CAST(count(DISTINCT fpw) AS BIGINT) AS n_unique, " +
       "CAST(count(*) - count(DISTINCT fpw) AS BIGINT) AS n_dups " +
       "FROM fp GROUP BY source ORDER BY grp"),

    "q58_knn_store" -> knn20OracleSql,

    "q57_sql_join" -> boxJoinOracleSql,

    // q71 = q4: the SQL-text planner path must produce the operator API's
    // exact pair set — one shared oracle so the radius can never drift
    "q71_sql_distance_join" -> distanceJoinOracleSql,

    "q50_interval_join_indexed" -> intervalJoinOracleSql,

    // open-ended container: spatial strict-interior AND et >= T1
    "q32_temporal_containedby" ->
      (s"WITH epts AS (${Tables.eventPtsSql}) " +
       "SELECT event_id FROM epts WHERE ex > 0 AND ex < 400 AND ey > 0 AND ey < 400 " +
       s"AND et >= $T1 ORDER BY event_id")
  )

  /** Full n-dim DBSCAN label replay over the WHOLE embedding table,
    * parameterized over (dims, eps) at minPts=5 — the q216 recursive-CTE
    * pattern, shared by the dims=16 and dims=64 pivot-kernel rows. */
  private def dbscanVecFullOracleSql(dims: Int, eps: Double): String = {
    val eps2 = eps * eps
    val dist = s"list_sum([(a.e[i]-b.e[i])*(a.e[i]-b.e[i]) FOR i IN generate_series(1,$dims)])"
    s"WITH RECURSIVE v AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding[1:$dims]] AS e FROM embeddings), " +
    s"adj AS (SELECT a.vec_id AS ka, b.vec_id AS kb FROM v a, v b WHERE $dist <= $eps2), " +
    "core AS (SELECT ka AS k FROM adj GROUP BY ka HAVING count(*) >= 5), " +
    "cedge AS (SELECT ka, kb FROM adj WHERE ka IN (SELECT k FROM core) AND kb IN (SELECT k FROM core)), " +
    "reach(a, b) AS (SELECT k, k FROM core UNION SELECT r.a, e.kb FROM reach r JOIN cedge e ON r.b = e.ka), " +
    "clus AS (SELECT a AS k, min(b) AS cid FROM reach GROUP BY a), " +
    "border AS (SELECT n.ka AS k, min(c.cid) AS cid FROM adj n JOIN clus c ON n.kb = c.k " +
    "WHERE n.ka NOT IN (SELECT k FROM core) GROUP BY n.ka) " +
    "SELECT p.vec_id, COALESCE(cl.cid, b.cid, -1) AS cluster_id, " +
    "cl.k IS NOT NULL AS is_core " +
    "FROM v p LEFT JOIN clus cl ON cl.k = p.vec_id LEFT JOIN border b ON b.k = p.vec_id " +
    "ORDER BY p.vec_id"
  }

  /** n-dim DBScanModel.predict replay (q157 live == q158 store-backed):
    * the q156 clustering CTEs on the sub-400 training set + the
    * nearest-core rule over the held-out vectors. */
  /** n-dim DBSCAN predict replay, parameterized over (dims, eps, minPts):
    * q156's clustering CTEs on the sub-400 training slice + the
    * nearest-core rule (ties: d², cluster id, core id) over the held-out
    * vectors — shared by the dims=3 grid family (q157/q158) and the
    * dims=16 pivot family (q224/q225). */
  private def dbscanVecPredictOracleSqlFor(dims: Int, eps: Double,
                                           minPts: Int): String = {
    val eps2 = eps * eps
    val dist = s"list_sum([(a.e[i]-b.e[i])*(a.e[i]-b.e[i]) FOR i IN generate_series(1,$dims)])"
    val distPQ = s"list_sum([(p.e[i]-q.e[i])*(p.e[i]-q.e[i]) FOR i IN generate_series(1,$dims)])"
    s"WITH RECURSIVE v AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding[1:$dims]] AS e " +
    "FROM embeddings WHERE vec_id < 400), " +
    s"adj AS (SELECT a.vec_id AS ka, b.vec_id AS kb FROM v a, v b WHERE $dist <= $eps2), " +
    s"core AS (SELECT ka AS k FROM adj GROUP BY ka HAVING count(*) >= $minPts), " +
    "cedge AS (SELECT ka, kb FROM adj WHERE ka IN (SELECT k FROM core) AND kb IN (SELECT k FROM core)), " +
    "reach(a, b) AS (SELECT k, k FROM core UNION SELECT r.a, e.kb FROM reach r JOIN cedge e ON r.b = e.ka), " +
    "clus AS (SELECT a AS k, min(b) AS cid FROM reach GROUP BY a), " +
    s"nv AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding[1:$dims]] AS e " +
    "FROM embeddings WHERE vec_id >= 400), " +
    s"cand AS (SELECT q.vec_id, cl.cid, $distPQ AS d2, p.vec_id AS coreid " +
    "FROM nv q JOIN v p ON " +
    s"$distPQ <= $eps2 JOIN clus cl ON cl.k = p.vec_id), " +
    "best AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
    "row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid, coreid) AS rn FROM cand) t " +
    "WHERE rn = 1) " +
    "SELECT nv.vec_id, CAST(COALESCE(b.cid, -1) AS BIGINT) AS cluster_id " +
    "FROM nv LEFT JOIN best b USING (vec_id) ORDER BY nv.vec_id"
  }

  private lazy val dbscanVecPredictOracleSql: String =
    dbscanVecPredictOracleSqlFor(3, 0.05, 5)

  /** The q20 clustering replay (also anchors q159's geometry-keyed API). */
  private lazy val dbscanClusterOracleSql: String =
    s"WITH RECURSIVE $dbscanClusterCtes " +
    "SELECT p.c_custkey, COALESCE(cl.cid, b.cid, -1) AS cluster_id " +
    "FROM cpts p LEFT JOIN clus cl ON cl.k = p.c_custkey LEFT JOIN border b ON b.k = p.c_custkey " +
    "ORDER BY p.c_custkey"

  /** DBScanModel.predict replay (q147 live == q154 store-backed): the
    * shared clustering CTEs + the nearest-core rule (ties: d², then
    * cluster id, then core id). */
  private lazy val dbscanPredictOracleSql: String =
    s"WITH RECURSIVE $dbscanClusterCtes, " +
    s"spts AS (${Tables.supplierPtsSql}), " +
    "cand AS (SELECT s.s_suppkey, cl.cid, " +
    "(s.sx-p.cx)*(s.sx-p.cx)+(s.sy-p.cy)*(s.sy-p.cy) AS d2, p.c_custkey AS coreid " +
    "FROM spts s JOIN cpts p ON (s.sx-p.cx)*(s.sx-p.cx)+(s.sy-p.cy)*(s.sy-p.cy) <= 1024.0 " +
    "JOIN clus cl ON cl.k = p.c_custkey), " +
    "best AS (SELECT s_suppkey, cid FROM (SELECT s_suppkey, cid, " +
    "row_number() OVER (PARTITION BY s_suppkey ORDER BY d2, cid, coreid) AS rn FROM cand) t " +
    "WHERE rn = 1) " +
    "SELECT s.s_suppkey, CAST(COALESCE(b.cid, -1) AS BIGINT) AS cluster_id " +
    "FROM spts s LEFT JOIN best b USING (s_suppkey) ORDER BY s_suppkey"

  /** Shared DBSCAN replay (q20/q147/q150): customer-lattice clustering at
    * eps=32 (d² <= 1024), minPts=5, as recursive CTEs. Defines cpts, adj
    * (all ordered eps-pairs incl. self), core, cedge, reach, clus (core
    * key → min-core-id cluster) and border (non-core key → min neighboring
    * cluster). Callers prepend WITH RECURSIVE. */
  private val dbscanClusterCtes: String =
    s"cpts AS (${Tables.customerPtsSql}), " +
    "adj AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb FROM cpts a, cpts b " +
    "WHERE (a.cx-b.cx)*(a.cx-b.cx)+(a.cy-b.cy)*(a.cy-b.cy) <= 1024.0), " +
    "core AS (SELECT ka AS k FROM adj GROUP BY ka HAVING count(*) >= 5), " +
    "cedge AS (SELECT ka, kb FROM adj WHERE ka IN (SELECT k FROM core) AND kb IN (SELECT k FROM core)), " +
    "reach(a, b) AS (SELECT k, k FROM core UNION SELECT r.a, e.kb FROM reach r JOIN cedge e ON r.b = e.ka), " +
    "clus AS (SELECT a AS k, min(b) AS cid FROM reach GROUP BY a), " +
    "border AS (SELECT n.ka AS k, min(c.cid) AS cid FROM adj n JOIN clus c ON n.kb = c.k " +
    "WHERE n.ka NOT IN (SELECT k FROM core) GROUP BY n.ka)"

  // ---- raster oracle fragments ----

  /** events with raster coords + type (tile grid: pw=10, 10x10-pixel tiles). */
  private val eventsRasterSql: String =
    "SELECT event_id, CAST((event_id*19)%500 AS DOUBLE) AS ex, " +
    "CAST((event_id*23)%500 AS DOUBLE) AS ey, event_type FROM events"

  /** Pixel counts -> per-tile row-major pixel table j(tx, ty, i, v). */
  private val rasterBaseSql: String =
    s"WITH epts AS ($eventsRasterSql), " +
    "px AS (SELECT CAST(floor(ex/10) AS BIGINT) gx, CAST(floor(ey/10) AS BIGINT) gy, count(*) c FROM epts GROUP BY 1,2), " +
    "tl AS (SELECT gx//10 tx, gy//10 ty, (9-(gy%10))*10+(gx%10) pix, c FROM px), " +
    "tiles AS (SELECT DISTINCT tx, ty FROM tl), " +
    "cells AS (SELECT t.tx, t.ty, g.i FROM tiles t, generate_series(0,99) g(i)), " +
    "j AS (SELECT c.tx, c.ty, c.i, COALESCE(tl.c, 0) v FROM cells c " +
    "LEFT JOIN tl ON tl.tx=c.tx AND tl.ty=c.ty AND tl.pix=c.i)"

  private val tileCsvSelectSql: String =
    "SELECT CAST(tx*100 AS BIGINT) ulx, CAST(ty*100+100 AS BIGINT) uly, 10 AS width, 10 AS height, " +
    "string_agg(CAST(v AS VARCHAR), ',' ORDER BY i) AS data_csv " +
    "FROM j GROUP BY tx, ty ORDER BY ulx, uly"

  /** Customer-density raster (pw=50, 5x5-pixel tiles => world 250) as a
    * per-tile row-major pixel table cj(tx, ty, i, v). */
  private val custRasterSql: String =
    s"WITH cpts AS (${Tables.customerPtsSql}), " +
    "cpx AS (SELECT CAST(floor(cx/50) AS BIGINT) gx, CAST(floor(cy/50) AS BIGINT) gy, count(*) c FROM cpts GROUP BY 1,2), " +
    "ctl AS (SELECT gx//5 tx, gy//5 ty, (4-(gy%5))*5+(gx%5) pix, c FROM cpx), " +
    "ctiles AS (SELECT DISTINCT tx, ty FROM ctl), " +
    "ccells AS (SELECT t.tx, t.ty, g.i FROM ctiles t, generate_series(0,24) g(i)), " +
    "cj AS (SELECT c.tx, c.ty, c.i, COALESCE(ctl.c, 0) v FROM ccells c " +
    "LEFT JOIN ctl ON ctl.tx=c.tx AND ctl.ty=c.ty AND ctl.pix=c.i)"

  private def rasterSideSql(t: String): String =
    s"px_$t AS (SELECT CAST(floor(ex/10) AS BIGINT) gx, CAST(floor(ey/10) AS BIGINT) gy, count(*) c " +
    s"FROM epts WHERE event_type='$t' GROUP BY 1,2), " +
    s"tl_$t AS (SELECT gx//10 tx, gy//10 ty, (9-(gy%10))*10+(gx%10) pix, c FROM px_$t), " +
    s"tiles_$t AS (SELECT DISTINCT tx, ty FROM tl_$t)"

  // ---- shared oracle SQL fragments ----

  private def sqlList(ws: Seq[String]): String = ws.mkString("['", "','", "']")

  private val stopListSql = sqlList(operators.TextAnalysis.stopwords)

  private val langScoreSql: Seq[(String, String)] =
    operators.TextAnalysis.langMarkers.map { case (lang, markers) =>
      lang -> s"len(list_filter(string_split(text,' '), w -> list_contains(${sqlList(markers)}, w)))"
    }

  /** q44 split config — shared by the query and its oracle so the
    * md5-prefix cut literals come from one computation. */
  private val splitSalt = "graft"
  private val splitFractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val sampleSalt = "mix"

  /** Distinct 3-gram shingle set per document (docs with >= 3 words) —
    * mirrors `TextAnalysis.shingles`; parity proven by q14/q15. */
  private val shingleSetSql: String =
    "SELECT doc_id, " +
    "list_distinct([array_to_string(ws[i:i+2],' ') FOR i IN generate_series(1, len(ws)-2)]) AS s " +
    "FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents) WHERE len(ws) >= 3"

  /** Distinct 5-gram span instances (doc_id, gram) — mirrors
    * `TextAnalysis.shingles(text, 5)` exploded; docs under 5 words emit no
    * rows. Shared by the duplicated-span and incremental-dedup oracles. */
  private val spanInstSql: String =
    "SELECT doc_id, unnest(list_distinct(" +
    "[array_to_string(ws[i:i+4],' ') FOR i IN generate_series(1, len(ws)-4)])) AS gram " +
    "FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)"

  /** Exact 3-gram Jaccard >= 4/5 pairs — oracle for both the inverted-index
    * and the MinHash-LSH operators (LSH output refines to the same set). */
  private val jaccardPairsSql: String =
    s"WITH sh AS ($shingleSetSql) " +
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a, sh b WHERE a.doc_id < b.doc_id " +
    "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) " +
    "ORDER BY id_a, id_b"

  private val normedEmbSql: String =
    "SELECT vec_id, embedding, label, " +
    "sqrt(list_sum([CAST(x AS DOUBLE)*CAST(x AS DOUBLE) FOR x IN embedding])) AS nrm FROM embeddings"

  private val dotSql: String =
    "list_sum([CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE) FOR i IN generate_series(1,64)])"

  private val dotSqlQC: String =
    "list_sum([CAST(q.embedding[i] AS DOUBLE)*CAST(c.embedding[i] AS DOUBLE) FOR i IN generate_series(1,64)])"

  /** Exact-Jaccard replay of the MinHash near-dup gate (odd docs probed
    * against the even-doc store) — shared by q102 (one-pass store) and
    * q181 (incrementally appended store): the stores hold identical
    * rows, so one replay verifies both. */
  private lazy val neardupGateOracleSql: String =
    s"WITH sh AS ($shingleSetSql), " +
    "hit AS (SELECT DISTINCT b.doc_id FROM sh b JOIN sh a " +
    "ON b.doc_id % 2 = 1 AND a.doc_id % 2 = 0 " +
    "AND len(list_intersect(a.s,b.s))*5 >= 4*(len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)))) " +
    "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 " +
    "AND doc_id NOT IN (SELECT doc_id FROM hit) ORDER BY doc_id"

  /** Exact-cosine replay of the embedding near-dup gate (odd vectors
    * probed against the even-vector store at threshold 0.42; the 48/3
    * banding makes the LSH path oracle-exact) — shared by q111 and
    * q182 for the same reason. */
  private lazy val cosineGateOracleSql: String =
    s"WITH e AS ($normedEmbSql), " +
    "hit AS (SELECT DISTINCT a.vec_id FROM e a JOIN e b " +
    "ON a.vec_id % 2 = 1 AND b.vec_id % 2 = 0 " +
    s"AND ($dotSql) / (a.nrm*b.nrm) >= 0.42) " +
    "SELECT vec_id FROM e WHERE vec_id % 2 = 1 " +
    "AND vec_id NOT IN (SELECT vec_id FROM hit) ORDER BY vec_id"

  /** md5 ±1 hyperplane matrix (salt sb1, 128 planes × 64 dims) as the
    * `idx`/`sgm` CTE pair — shared by the binary-ANN replays
    * (q170/q171/q172). */
  private val signMatrixSql: String =
    "idx AS (SELECT i, j, CASE WHEN substr(md5(i || ':' || j || ':sb1'), 1, 1) < '8' " +
    "THEN 1.0 ELSE -1.0 END AS sg " +
    "FROM generate_series(0, 63) g1(i) CROSS JOIN generate_series(0, 127) g2(j)),\n" +
    "sgm AS (SELECT j, list(sg ORDER BY i) AS srow FROM idx GROUP BY j)"

  /** Full binary-ANN replay (q170 live == q171 stored): sign bits →
    * disagreement-count Hamming → 50-candidate (ham, id) cut →
    * exact-cosine rerank (the q18 shape). */
  private val binaryAnnReplaySql: String =
    s"WITH $signMatrixSql,\n" +
    "pj AS (SELECT vec_id, j, CASE WHEN list_sum([CAST(embedding[i] AS DOUBLE) * srow[i] " +
    "FOR i IN generate_series(1, 64)]) > 0 THEN 1 ELSE 0 END AS sb " +
    "FROM embeddings CROSS JOIN sgm),\n" +
    "cb AS (SELECT vec_id, list(sb ORDER BY j) AS bitsv FROM pj GROUP BY vec_id),\n" +
    "cand AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
    "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
    "list_sum([CASE WHEN q.bitsv[t] != c.bitsv[t] THEN 1 ELSE 0 END FOR t IN generate_series(1, 128)]), " +
    "c.vec_id) AS rn " +
    "FROM (SELECT * FROM cb WHERE vec_id < 10) q, cb c WHERE c.vec_id != q.vec_id),\n" +
    s"n AS ($normedEmbSql),\n" +
    "rr AS (SELECT cand.query_id, cand.neighbor_id, " +
    "row_number() OVER (PARTITION BY cand.query_id ORDER BY " +
    s"($dotSqlQC)/(q.nrm*c.nrm) DESC, cand.neighbor_id) AS rn " +
    "FROM cand JOIN n q ON q.vec_id = cand.query_id " +
    "JOIN n c ON c.vec_id = cand.neighbor_id WHERE cand.rn <= 50)\n" +
    "SELECT query_id, neighbor_id FROM rr WHERE rn <= 5 ORDER BY query_id, neighbor_id"

  /** Exact euclidean top-5 with ties to the lower neighbor id — the oracle
    * for both lossless-PQ paths (inline q79 and stored-codes q80). */
  private val euclidTop5OracleSql: String =
    "WITH v AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings), " +
    "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
    "row_number() OVER (PARTITION BY q.vec_id ORDER BY " +
    "list_sum([(q.e[i]-c.e[i])*(q.e[i]-c.e[i]) FOR i IN generate_series(1,64)]), c.vec_id) AS rn " +
    "FROM v q, v c WHERE q.vec_id < 10 AND c.vec_id != q.vec_id) " +
    "SELECT query_id, neighbor_id, rn AS rank FROM scored WHERE rn <= 5 " +
    "ORDER BY query_id, rank"

  /** Unrolled Lloyd CTEs mirroring `Similarity.kmeans` exactly: c0 from the
    * k smallest ids, then per iteration an argmin assignment (ties to the
    * lower cluster id) and an element-wise mean update; the final select is
    * the assignment against the last centroids. */
  /** The CTE body of the unrolled-Lloyd replay (no leading WITH, no final
    * select): defines `v` (vec_id, e) and `f` whose rn=1 rows are the final
    * (vec_id, c, d) assignment. Shared by [[kmeansOracleSql]] and the q108
    * SemDeDup oracle. */
  private def kmeansOracleCtes(k: Int, iters: Int): String = {
    def dist(ca: String) =
      s"list_sum([(v.e[i]-$ca.e[i])*(v.e[i]-$ca.e[i]) FOR i IN generate_series(1,64)])"
    val sb = new StringBuilder
    sb ++= "v AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS e FROM embeddings), "
    sb ++= s"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, e " +
           s"FROM (SELECT * FROM v ORDER BY vec_id LIMIT $k) s0), "
    for (t <- 1 to iters) {
      val p = s"c${t - 1}"
      sb ++= s"a$t AS (SELECT vec_id, c FROM (SELECT v.vec_id, $p.c, " +
             s"row_number() OVER (PARTITION BY v.vec_id ORDER BY ${dist(p)}, $p.c) AS rn " +
             s"FROM v CROSS JOIN $p) s WHERE rn = 1), "
      // the mean is quantized to the same 1e-6 grid as Similarity.kmeans:
      // cross-row float sums are summation-order-sensitive in the last
      // ulps, and the grid snap makes both engines' centroids bit-identical
      sb ++= s"c$t AS (SELECT c, list(m ORDER BY pos) AS e FROM " +
             s"(SELECT a$t.c, g.i AS pos, floor(avg(v.e[g.i]) * 1e6 + 0.5) / 1e6 AS m " +
             s"FROM a$t JOIN v USING (vec_id), " +
             s"generate_series(1,64) g(i) GROUP BY 1, 2) s GROUP BY c), "
    }
    sb ++= s"f AS (SELECT v.vec_id, c$iters.c, ${dist(s"c$iters")} AS d, " +
           s"row_number() OVER (PARTITION BY v.vec_id ORDER BY ${dist(s"c$iters")}, c$iters.c) AS rn " +
           s"FROM v CROSS JOIN c$iters)"
    sb.toString
  }

  /** Unrolled Lloyd CTEs mirroring `Similarity.kmeans` exactly: c0 from the
    * k smallest ids, then per iteration an argmin assignment (ties to the
    * lower cluster id) and an element-wise mean update; the final select is
    * the assignment against the last centroids. */
  private def kmeansOracleSql(k: Int, iters: Int): String =
    s"WITH ${kmeansOracleCtes(k, iters)} " +
      "SELECT vec_id, c AS cluster, d AS dist FROM f WHERE rn = 1 ORDER BY vec_id"

  /** The q108 SemDeDup oracle: Lloyd assignment → within-cluster capped
    * candidate pairs (clusters over `maxCluster` rows contribute a star to
    * their min id — Dedup.cappedBucketPairs' rule, replayed exactly) →
    * exact cosine refine → recursive closure → min id survives (with its
    * cluster). */
  private def semanticDedupOracleSql(k: Int, iters: Int, threshold: Double,
                                     maxCluster: Int): String =
    s"WITH RECURSIVE ${kmeansOracleCtes(k, iters)}, " +
      "asg AS (SELECT vec_id, c FROM f WHERE rn = 1), " +
      s"ne AS (SELECT vec_id, embedding, nrm, c FROM ($normedEmbSql) " +
      "JOIN asg USING (vec_id)), " +
      "csz AS (SELECT c, count(*) AS sz, min(vec_id) AS rep FROM asg GROUP BY c), " +
      "cand AS (" +
      "SELECT a2.vec_id AS id_a, b2.vec_id AS id_b FROM ne a2 " +
      "JOIN ne b2 ON a2.c = b2.c AND a2.vec_id < b2.vec_id " +
      s"JOIN csz ON csz.c = a2.c WHERE csz.sz <= $maxCluster " +
      "UNION " +
      "SELECT csz.rep AS id_a, b2.vec_id AS id_b FROM ne b2 " +
      s"JOIN csz ON csz.c = b2.c WHERE csz.sz > $maxCluster AND b2.vec_id <> csz.rep), " +
      "p AS (SELECT cand.id_a, cand.id_b FROM cand " +
      "JOIN ne a ON a.vec_id = cand.id_a JOIN ne b ON b.vec_id = cand.id_b " +
      s"WHERE ($dotSql) / (a.nrm*b.nrm) >= $threshold), " +
      "e(a, b) AS (SELECT id_a, id_b FROM p UNION SELECT id_b, id_a FROM p " +
      "UNION SELECT vec_id, vec_id FROM embeddings), " +
      "reach(a, b) AS (SELECT a, b FROM e UNION SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a), " +
      "comp AS (SELECT a, min(b) AS m FROM reach GROUP BY a) " +
      "SELECT CAST(comp.a AS BIGINT) AS id, asg.c AS cluster FROM comp " +
      "JOIN asg ON asg.vec_id = comp.a WHERE comp.m = comp.a ORDER BY id"
}
