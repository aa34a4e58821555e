package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 *  - [[bruteTopK]]: exact baseline — broadcast the (small) query set, score
 *    every corpus vector, per-query window top-k. One corpus scan, no
 *    shuffle of the corpus itself (ranking shuffles only n_queries × n rows
 *    of (id, id, score)).
 *  - [[ivfTopK]]: IVF — seeded k-means++ coarse quantizer (driver-side
 *    Lloyd over a bounded sample); corpus vectors are
 *    assigned to their nearest centroid cell once (materialize/persist for
 *    repeated querying), queries probe the `nprobe` nearest cells only.
 *    Recall < 1 by construction; throughput scales with nprobe/nlist.
 */
object Similarity {

  /** Exact top-k: for each query row, the k nearest corpus rows by cosine.
    * Ties broken by corpus id — fully deterministic output. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, corpusId: Column, queryId: Column,
                corpusVec: Column, queryVec: Column, k: Int): DataFrame = {
    import graft.functions.stf
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
      .withColumn("__cn", stf.vec_norm(col("__cv")))
    val q = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
      .withColumn("__qn", stf.vec_norm(col("__qv")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("__rn", rn).filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Hard cap on the scalar-quantization dimension: the per-dim (min, max)
    * model is collected to the driver and inlined as plan literals. */
  val MaxScalarQuantDim = 4096

  /**
   * Fit the scalar (per-dimension affine) int8 quantization model: each
   * dimension's corpus (min, max). One posexplode + groupBy(dim) pass —
   * the shuffle carries map-side-combined (dim, partial-min, partial-max)
   * rows, ≤ dim per task regardless of corpus size. Output:
   * (dim_idx, min_v, max_v), dim rows.
   */
  def scalarQuantModel(df: DataFrame, vecCol: Column): DataFrame =
    df.select(posexplode(vecCol).as(Seq("dim_idx", "__v")))
      .groupBy(col("dim_idx"))
      .agg(min(col("__v").cast("double")).as("min_v"),
           max(col("__v").cast("double")).as("max_v"))

  /** Collect a [[scalarQuantModel]] into dense (mins, maxs) arrays —
    * bounded by construction: the model has exactly `dim` ≤
    * [[MaxScalarQuantDim]] rows. */
  def collectScalarModel(model: DataFrame): (Array[Double], Array[Double]) = {
    val rows = model.select(col("dim_idx").cast("int"),
        col("min_v"), col("max_v")).collect()
    require(rows.length <= MaxScalarQuantDim,
      s"scalar-quant model has ${rows.length} dims > cap $MaxScalarQuantDim " +
      "(the model is inlined as plan literals; reduce dims, e.g. via randomProject)")
    val mins = new Array[Double](rows.length)
    val maxs = new Array[Double](rows.length)
    rows.foreach { r => mins(r.getInt(0)) = r.getDouble(1); maxs(r.getInt(0)) = r.getDouble(2) }
    (mins, maxs)
  }

  /**
   * Scalar int8 quantization — the 4× compression tier of the ANN stack
   * (float32 → one byte per dimension, the standard faiss `SQ8` scheme):
   *
   *   code_d = round(254 · (v_d − min_d) / (max_d − min_d)) − 127 ∈ [−127, 127]
   *   (degenerate dimension max == min ⇒ code 0)
   *
   * and decoding maps code_d back to `min_d + (code_d+127)·span_d/254`,
   * re-rounded to float32. Both directions are pure codegen'd `transform`
   * expressions over plan-literal (min, max) arrays — no UDF, no shuffle,
   * and every step (int→double conversion, each IEEE op, the float
   * downcast) is correctly rounded, so an external engine evaluating the
   * same expression tree reproduces codes and decoded vectors
   * bit-for-bit. Composes in front of brute/IVF exactly like
   * [[randomProject]]: quantize once at ingest, run every later
   * similarity pass over 1/4 the bytes.
   */
  def scalarQuantize(df: DataFrame, vecCol: Column,
                     mins: Array[Double], maxs: Array[Double]): DataFrame = {
    require(mins.length == maxs.length && mins.nonEmpty, "empty scalar-quant model")
    val mn = typedLit(mins)
    val mx = typedLit(maxs)
    df.withColumn("codes", transform(vecCol, (v, i) => {
      val lo = element_at(mn, i + 1)
      val span = element_at(mx, i + 1) - lo
      when(span === 0.0, lit(0))
        .otherwise((round(lit(254.0) * (v.cast("double") - lo) / span) - 127.0).cast("int"))
    }))
  }

  /** Decode int8 codes back to float32 vectors (the scoring-side inverse
    * of [[scalarQuantize]] — same plan-literal model, pure map). */
  def scalarDecode(codes: Column, mins: Array[Double], maxs: Array[Double]): Column = {
    val mn = typedLit(mins)
    val mx = typedLit(maxs)
    transform(codes, (c, i) => {
      val lo = element_at(mn, i + 1)
      val span = element_at(mx, i + 1) - lo
      (lo + (c.cast("double") + 127.0) * span / 254.0).cast("float")
    })
  }

  /** Exact cosine top-k over the QUANTIZED corpus: quantize + decode both
    * sides with one model, then [[bruteTopK]] on the reconstructions —
    * the accuracy/compression trade measured end-to-end (the spec pins
    * recall vs the unquantized brute top-k). */
  def bruteTopKQuantized(corpus: DataFrame, queries: DataFrame,
                         corpusId: Column, queryId: Column,
                         corpusVec: Column, queryVec: Column, k: Int,
                         mins: Array[Double], maxs: Array[Double]): DataFrame = {
    val c = scalarQuantize(corpus, corpusVec, mins, maxs)
      .withColumn("__dec", scalarDecode(col("codes"), mins, maxs))
    val q = scalarQuantize(queries, queryVec, mins, maxs)
      .withColumn("__dec", scalarDecode(col("codes"), mins, maxs))
    bruteTopK(c, q, corpusId, queryId, col("__dec"), col("__dec"), k)
  }

  /**
   * Binary sign quantization — the 1-BIT tier of the compression ladder
   * (float32 [[randomProject]] → int8 [[scalarQuantize]] → this, the
   * faiss binary-flat scheme): each of `bits` md5-derived ±1 hyperplanes
   * (the [[randomProject]] matrix with its own salt) contributes ONE bit —
   * whether the projection onto it is positive — and the bits pack 64 per
   * long into `outName` (array<long>, ceil(bits/64) words). For a 64-d
   * float corpus at bits = 128 that is 16× fewer bytes; Hamming distance
   * between codes estimates angle (P[bit differs] = θ/π, the SimHash
   * hyperplane bound), which is what makes the codes a pre-rank key.
   *
   * Deterministic without RNG state and engine-replayable: the matrix is
   * the pure md5 function, the projection is a double accumulation in
   * index order (bit-identical across engines), and the bit rule is
   * `sum > 0` — a SQL engine replays every code exactly.
   */
  def signQuantize(df: DataFrame, vec: Column, dim: Int, bits: Int,
                   salt: String, outName: String = "code"): DataFrame = {
    require(dim > 0 && bits > 0, s"dims must be positive, got $dim dim / $bits bits")
    require(!df.columns.exists(_.equalsIgnoreCase(outName)),
      s"signQuantize: input already has a column named $outName")
    // flat row-major matrix + one unboxing copy per row: Seq[Float].apply
    // boxes every element (ArraySeq is unspecialized), which made the
    // inner loop the whole operator's cost at scale (measured 6.2 s for
    // 20k × 128 × 64 at sf1; ~0.5 s unboxed)
    val m: Array[Double] = Array.tabulate(bits * dim) { k =>
      val j = k / dim
      val i = k % dim
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j:$salt".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
    val nWords = (bits + 63) / 64
    val pack = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        require(v.length == dim,
          s"signQuantize: expected $dim-d vectors, got ${v.length}")
        val x = new Array[Double](dim)
        var i0 = 0
        val it = v.iterator
        while (it.hasNext) { x(i0) = it.next().toDouble; i0 += 1 }
        val words = new Array[Long](nWords)
        var j = 0
        while (j < bits) {
          var s = 0.0
          var i = 0
          val off = j * dim
          while (i < dim) { s += x(i) * m(off + i); i += 1 }
          if (s > 0.0) words(j >> 6) |= (1L << (j & 63))
          j += 1
        }
        words
      }
    }
    df.withColumn(outName, pack(vec))
  }

  /**
   * Binary-prefilter ANN: rank the corpus per query by HAMMING distance
   * over [[signQuantize]] codes (bit_count of xor — pure codegen over the
   * packed words), keep the `cand` closest as candidates, then rerank
   * those by EXACT cosine on the original vectors and return the top k.
   *
   * The 100 TB shape this buys: the corpus-wide scan touches ONLY the
   * code column (a 16-32× smaller read than the float vectors — column
   * pruning does the rest), and the expensive exact cosine runs on
   * cand × n_queries rows, reached by an id-keyed equi-join back to the
   * vectors. Both cut and rerank break ties by neighbor id, so the
   * result is deterministic and SQL-replayable end-to-end. Recall < 1 by
   * construction (a true neighbor can lose the Hamming cut); `cand/k`
   * is the knob, same contract as IVF's nprobe.
   *
   * `corpus`/`queries` must already carry the code column ([[signQuantize]]
   * with the SAME dim/bits/salt — the codes define the bit space).
   */
  def binaryTopK(corpus: DataFrame, queries: DataFrame,
                 corpusId: Column, queryId: Column,
                 corpusCode: Column, queryCode: Column,
                 corpusVec: Column, queryVec: Column,
                 k: Int, cand: Int): DataFrame = {
    import graft.functions.stf
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // EAGER (id, code) materialization before the pre-rank join: codegen
    // DEFERS a projected expression into the nested-loop join's inner
    // loop, so an inline quantization UDF would re-run once per PAIR
    // (queries× the work — measured 3.5× on 2000×10 at sf0.1). The
    // checkpoint pins it to once per corpus row, and holding the packed
    // codes resident — 16-32× smaller than the vectors — is exactly how
    // a binary-flat index operates; stored-code callers pay one cheap
    // copy of an already-narrow projection.
    val c = corpus.select(corpusId.as("neighbor_id"), corpusCode.as("__cc"))
      .localCheckpoint()
    val cv = corpus.select(corpusId.as("__cid"), corpusVec.as("__cv"))
      .withColumn("__cn", stf.vec_norm(col("__cv")))
    binaryRank(c, cv,
      queries.select(queryId.as("query_id"), queryCode.as("__qc")),
      queries.select(queryId.as("__qid"), queryVec.as("__qv")), k, cand)
  }

  /** Shared Hamming-prerank + exact-cosine-rerank core behind
    * [[binaryTopK]] (live codes) and [[binaryTopKIndexed]] (stored codes).
    * `c` = (neighbor_id, __cc packed words) — ALREADY materialized (live:
    * localCheckpoint; store: parquet); `cv` = (__cid, __cv, __cn). */
  private def binaryRank(c: DataFrame, cv: DataFrame,
                         q: DataFrame, qv0: DataFrame,
                         k: Int, cand: Int): DataFrame = {
    import graft.functions.stf
    require(cand >= k, s"cand ($cand) must be >= k ($k)")
    val ham = aggregate(
      zip_with(col("__qc"), col("__cc"), (a, b) => bit_count(a.bitwiseXOR(b))),
      lit(0), (acc, x) => acc + x)
    val cut = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__ham"), col("neighbor_id")))
    val candidates = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("__ham", ham)
      .withColumn("__rn", cut).filter(col("__rn") <= cand)
      .select(col("query_id"), col("neighbor_id"))
    // rerank: id-keyed equi-join back to the float vectors (corpus side),
    // query vectors broadcast — exact cosine on cand × n_queries rows only
    val qv = qv0.withColumn("__qn", stf.vec_norm(col("__qv")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    candidates
      .join(cv, col("neighbor_id") === col("__cid"))
      .join(broadcast(qv), col("query_id") === col("__qid"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .withColumn("__rn", rn).filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Pigeonhole block values of a packed [[signQuantize]] code as a
    * `blocks`-element array<long> column: block `b` is the contiguous
    * bit slice [b·bpb, (b+1)·bpb) extracted by pure shift/mask codegen
    * (bpb = bits/blocks; the layout constraint bpb | 64 keeps every
    * block inside one word, and bpb ≤ 32 keeps values non-negative so
    * external engines replay them without two's-complement care). */
  private[graft] def codeBlocks(code: Column, bits: Int, blocks: Int): Column = {
    val bpb = bits / blocks
    require(blocks > 0 && bits % blocks == 0 && 64 % bpb == 0 && bpb <= 32,
      s"codeBlocks: need bits/blocks | 64 and <= 32, got $bits bits / $blocks blocks")
    val mask = (1L << bpb) - 1
    array((0 until blocks).map { b =>
      shiftrightunsigned(element_at(code, (b * bpb) / 64 + 1),
        (b * bpb) % 64).bitwiseAND(lit(mask))
    }: _*)
  }

  // ---- takedown (tombstones) ----
  // Every ANN store keys its scored rows by id (IVF `corpus`, PQ/IVF-PQ
  // `codes`, binary `codes`/`vectors`), so forgetting a vector is a pure
  // id tombstone: deletion appends a `tombstones/batch_id=` segment in
  // the reserved negative batch-id range (never collides with ingest
  // segments; replays overwrite only their own partition) and every
  // reader anti-joins before scoring — serving becomes identical to an
  // index built over the remaining corpus, with no rebuild and no
  // retrain (the frozen quantizer/codebooks are corpus statistics, not
  // per-row state). The binary GATE's id-free block table is handled by
  // semi-joining it to the remaining LIVE codes. Works on one-pass AND
  // segmented stores. CONTRACT: a deleted id must not be re-ingested
  // later (ids are exactly-once across the store's lifetime).

  /** Forget `ids` from any persisted ANN store (IVF / PQ / IVF-PQ /
    * binary) without a rebuild — see the takedown notes above. */
  def deleteFromAnnStore(ids: DataFrame, idCol: Column, path: String,
                         batchId: Long): Unit = {
    require(batchId >= 0,
      s"deleteFromAnnStore: batchId must be >= 0, got $batchId")
    ids.select(idCol.as("id")).distinct()
      .write.mode("overwrite").parquet(s"$path/tombstones/batch_id=${-batchId - 1}")
  }

  /** The store's tombstoned ids (if any deletion has happened), aliased
    * to the reader's id column name. */
  private def annTombstones(spark: org.apache.spark.sql.SparkSession,
                            path: String, idName: String): Option[DataFrame] =
    if (graft.sources.Sidecar.exists(spark, path + "/tombstones"))
      Some(spark.read.parquet(path + "/tombstones")
        .select(col("id").as(idName)).distinct())
    else None

  /** Anti-join a store table against the tombstones (no-op when nothing
    * was ever deleted). */
  private def minusTombstones(store: DataFrame, path: String,
                              idName: String): DataFrame =
    annTombstones(store.sparkSession, path, idName) match {
      case Some(t) => store.join(t, Seq(idName), "left_anti")
      case None => store
    }

  /** Remove the tombstones of a store that is being REBUILT one-pass —
    * stale tombstones must not shadow the fresh corpus's rows. */
  private def dropTombstones(spark: org.apache.spark.sql.SparkSession,
                             path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /**
   * Compact ANY persisted ANN store: fold every batch segment, apply the
   * tombstones, and rewrite each table as ONE segment at the reserved
   * compact id (Long.MinValue), tombstones cleared, model sidecars
   * (centroids / codebooks / params) carried over — the staged-swap
   * contract of every compactor. The layout is detected from the tables
   * present: IVF (`corpus`, cell-sorted), PQ / IVF-PQ (`codes`,
   * cell-sorted when a coarse cell column exists), binary (`codes` +
   * `vectors` + an id-free `blocks` table RECOMPUTED from the live codes
   * under the frozen block split). Serving is row-identical before and
   * after; works on one-pass AND segmented inputs.
   */
  def compactAnnStore(spark: org.apache.spark.sql.SparkSession,
                      path: String): Unit = {
    import graft.sources.Sidecar
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def has(d: String) = fs.exists(new org.apache.hadoop.fs.Path(s"$path/$d"))
    require(has("corpus") || has("codes"),
      s"compactAnnStore: $path holds neither an IVF corpus nor a codes table")
    val tmp = path + ".tmp"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    val seg = s"batch_id=${Long.MinValue}"
    def live(table: String, idName: String): DataFrame =
      minusTombstones(spark.read.parquet(s"$path/$table").drop("batch_id"),
        path, idName)
    if (has("corpus")) { // IVF or IVF-NSW
      val rows = live("corpus", "neighbor_id")
      val sorted =
        if (rows.columns.contains("__adj")) {
          // IVF-NSW: adjacency references tombstoned waypoints — dropping
          // rows without rebuilding would disconnect cell graphs (and
          // silently break the degenerate-exact guarantee), so the cell
          // graphs are REBUILT over the live rows under the frozen params
          val params = Sidecar
            .readText(spark, path + "/_graft_nsw_params").trim.split(" ")
          nswAssembleGraphs(rows.drop("__adj"),
              m = params(1).toInt, efC = params(3).toInt)
            .repartitionByRange(col("__cell"))
            .sortWithinPartitions(col("__cell"), col("neighbor_id"))
        } else
          rows.repartitionByRange(col("__cell")).sortWithinPartitions(col("__cell"))
      sorted.write.mode("overwrite").parquet(s"$tmp/corpus/$seg")
    } else if (!has("vectors")) { // PQ or IVF-PQ codes
      val rows = live("codes", "neighbor_id")
      val sorted =
        if (rows.columns.contains("__cell"))
          rows.repartitionByRange(col("__cell")).sortWithinPartitions(col("__cell"))
        else rows
      sorted.write.mode("overwrite").parquet(s"$tmp/codes/$seg")
    } else { // binary triple
      val params = Sidecar
        .readText(spark, path + "/_graft_binary_params").trim.split(" ")
      val (bits, blocks) = (params(1).toInt, params(3).toInt)
      val codes = live("codes", "id").localCheckpoint() // codes + blocks read it
      codes.write.mode("overwrite").parquet(s"$tmp/codes/$seg")
      codes.select(col("code"),
          posexplode(codeBlocks(col("code"), bits, blocks)).as(Seq("b", "w")))
        .select(col("b"), col("w"), col("code")).distinct()
        .repartitionByRange(col("b"), col("w"))
        .sortWithinPartitions(col("b"), col("w"))
        .write.mode("overwrite").parquet(s"$tmp/blocks/$seg")
      live("vectors", "id")
        .write.mode("overwrite").parquet(s"$tmp/vectors/$seg")
      releaseCheckpoint(codes)
    }
    // carry every model sidecar (centroids, codebooks, params) over
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(st => st.isFile && st.getPath.getName.startsWith("_graft_"))
      .foreach { st =>
        Sidecar.writeText(spark, s"$tmp/${st.getPath.getName}",
          Sidecar.readText(spark, s"$path/${st.getPath.getName}"))
      }
    Sidecar.markComplete(spark, tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)),
      s"compactAnnStore: rename $tmp -> $path failed; the compacted " +
      s"store is intact at $tmp")
  }

  /**
   * Build/overwrite a persisted binary-flat index under `path`:
   * `codes` (id, code array<long> — the narrow column every search
   * scans), `blocks` (id, b, w — one row per pigeonhole block,
   * range-laid-out by (b, w) so [[dropSeenHamming]]'s probes co-locate
   * with the dominant read order), `vectors` (id, vec, nrm) for the
   * exact-cosine refine, and a parameter sidecar so probes can't
   * silently mix hyperplane configurations. Same rebuild-crash marker
   * contract as every other store.
   *
   * The block table is the multi-index-hashing layout (Norouzi et al.,
   * "Fast Search in Hamming Space with Multi-Index Hashing"): a code
   * splits into `blocks` contiguous slices, and any pair within Hamming
   * distance r < blocks agrees EXACTLY on at least one slice
   * (pigeonhole) — so radius-r search is an equi-join on (b, w) with
   * zero recall loss, never an all-pairs scan. Block rows carry the
   * FULL code and are stored DISTINCT on (b, w, code), with no id:
   * the gate's verdict is a pure function of the code, so near-identical
   * families — the exact content a near-dup store accumulates —
   * collapse to their distinct codes instead of multiplying the probe
   * join (a 2,500-row boilerplate family that shares its codes costs
   * the same as a handful of rows; measured 20 s → ~2 s at sf1's
   * 5,000-vector hot cluster).
   */
  def buildBinaryIndex(corpus: DataFrame, path: String, corpusId: Column,
                       corpusVec: Column, dim: Int, bits: Int, salt: String,
                       blocks: Int = 4): Unit = {
    import graft.functions.stf
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Sidecar.invalidateMarker(spark, path)
    dropTombstones(spark, path) // a rebuild starts with a clean slate
    val coded = signQuantize(
        corpus.select(corpusId.as("id"), corpusVec.as("vec")),
        col("vec"), dim, bits, salt, "code")
      .localCheckpoint() // three writes below read it — warm, not racing
    coded.select(col("id"), col("code"))
      .write.mode("overwrite").parquet(path + "/codes")
    coded.select(col("code"),
        posexplode(codeBlocks(col("code"), bits, blocks)).as(Seq("b", "w")))
      .select(col("b"), col("w"), col("code")).distinct()
      .repartitionByRange(col("b"), col("w"))
      .sortWithinPartitions(col("b"), col("w"))
      .write.mode("overwrite").parquet(path + "/blocks")
    coded.select(col("id"), col("vec"), stf.vec_norm(col("vec")).as("nrm"))
      .write.mode("overwrite").parquet(path + "/vectors")
    releaseCheckpoint(coded)
    graft.sources.Sidecar.writeText(spark, path + "/_graft_binary_params",
      s"$dim $bits $salt $blocks")
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Query a [[buildBinaryIndex]] store: quantize the (broadcast-small)
    * query batch with the store's own hyperplanes, Hamming pre-rank
    * against the stored `codes` column alone — the corpus-wide pass moves
    * 16-32× fewer bytes than the floats — then exact-cosine rerank the
    * `cand` survivors through an id-keyed equi-join against the stored
    * `vectors`. Identical output to [[binaryTopK]] over the same corpus
    * and parameters (the store holds the same codes the live path
    * computes). */
  def binaryTopKIndexed(queries: DataFrame, path: String, queryId: Column,
                        queryVec: Column, k: Int, cand: Int): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val params = graft.sources.Sidecar
      .readText(spark, path + "/_graft_binary_params").trim.split(" ")
    val (dim, bits, salt) = (params(0).toInt, params(1).toInt, params(2))
    val q = signQuantize(
      queries.select(queryId.as("query_id"), queryVec.as("__qv")),
      col("__qv"), dim, bits, salt, "__qc")
    binaryRank(
      minusTombstones(spark.read.parquet(path + "/codes"), path, "id")
        .select(col("id").as("neighbor_id"), col("code").as("__cc")),
      spark.read.parquet(path + "/vectors")
        .select(col("id").as("__cid"), col("vec").as("__cv"), col("nrm").as("__cn")),
      q.select(col("query_id"), col("__qc")),
      q.select(col("query_id").as("__qid"), col("__qv")), k, cand)
  }

  /**
   * Admit only the batch rows that are NOT a binary near-duplicate
   * (Hamming distance ≤ `maxHamming` over the store's sign codes) of any
   * row in a [[buildBinaryIndex]] store — the 1-bit member of the
   * ingest-gate family next to the MinHash and cosine-LSH gates, and the
   * only one that is EXACT: `maxHamming < blocks` makes the pigeonhole
   * candidate join lossless (any within-radius pair shares a full block),
   * so the kept set equals the brute all-pairs filter while the per-batch
   * work is a (b, w) equi-join against the range-laid block table plus a
   * packed-word Hamming confirm on the collided pairs only. The batch
   * side is broadcast-small in the ingest setting; nothing accumulates
   * outside the store.
   *
   * SIZING RULE: expected collisions per batch row ≈ blocks × store /
   * 2^(bits/blocks), so `blocks` must stay small relative to code width
   * (the default 4 × 32-bit blocks keeps random collisions near zero at
   * any store size) — but larger radii need more blocks (r < blocks), so
   * radius and collision width trade off exactly as in MIH.
   *
   * HOT-FAMILY SHAPE (the adversarial case for any near-dup gate — a
   * stream full of the very duplicates it filters): the verdict is a
   * pure function of the batch row's CODE, so the probe join runs in
   * DISTINCT-code space on both sides (the store's block table is
   * already code-distinct) and verdicts rejoin the batch by code. A
   * boilerplate family collapses to its handful of distinct codes
   * instead of m × n confirm pairs.
   */
  def dropSeenHamming(batch: DataFrame, idCol: Column, vecCol: Column,
                      path: String, maxHamming: Int): DataFrame = {
    require(!batch.columns.exists(_.toLowerCase.startsWith("__bh_")),
      "dropSeenHamming: batch must not contain __bh_* columns")
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val params = graft.sources.Sidecar
      .readText(spark, path + "/_graft_binary_params").trim.split(" ")
    val (dim, bits, salt, blocks) =
      (params(0).toInt, params(1).toInt, params(2), params(3).toInt)
    require(maxHamming >= 0 && maxHamming < blocks,
      s"dropSeenHamming: pigeonhole exactness needs maxHamming < blocks " +
      s"($blocks in this store), got $maxHamming — rebuild the store with " +
      "more blocks for a larger radius")
    val q = signQuantize(batch.select(idCol.as("__bh_id"), vecCol.as("__bh_vec")),
        col("__bh_vec"), dim, bits, salt, "__bh_code")
      .select(col("__bh_id"), col("__bh_code"))
      .localCheckpoint() // distinct probe + verdict rejoin both read it
    val qCodes = q.select(col("__bh_code")).distinct()
    val probes = qCodes.select(col("__bh_code"),
      posexplode(codeBlocks(col("__bh_code"), bits, blocks)).as(Seq("__bh_b", "__bh_w")))
    val ham = aggregate(
      zip_with(col("__bh_code"), col("code"),
        (a, b) => bit_count(a.bitwiseXOR(b))),
      lit(0), (acc, x) => acc + x)
    // takedown: the block table is id-free (distinct codes), so a
    // forgotten doc disappears by keeping only codes that at least one
    // LIVE doc still carries — a semi-join against the tombstone-filtered
    // codes table, skipped entirely when nothing was ever deleted
    val storeBlocks = annTombstones(spark, path, "id") match {
      case Some(t) =>
        val live = spark.read.parquet(path + "/codes")
          .join(t, Seq("id"), "left_anti").select(col("code")).distinct()
        spark.read.parquet(path + "/blocks").join(live, Seq("code"), "left_semi")
      case None => spark.read.parquet(path + "/blocks")
    }
    val seenCodes = probes
      .join(storeBlocks,
        col("__bh_b") === col("b") && col("__bh_w") === col("w"))
      .filter(ham <= maxHamming)
      .select(col("__bh_code")).distinct()
    val seen = q.join(seenCodes, "__bh_code").select(col("__bh_id"))
    batch.join(seen, idCol === col("__bh_id"), "left_anti")
  }

  /**
   * Signed random projection — the ±1 Johnson-Lindenstrauss sketch
   * (Achlioptas 2003): project `dim`-d embeddings to `outDim` dimensions
   * through a dense ±1 matrix, preserving angles/distances within the JL
   * bound. At 100 TB this is the cheap front of the similarity stack: a
   * 1024-d float corpus shrinks 16× before brute/LSH/IVF machinery runs,
   * and the projection is a pure codegen-free map (no shuffle, no state).
   *
   * Deterministic WITHOUT RNG state: sign(i, j) = +1 iff the first hex
   * digit of md5("i:j:salt") < '8' — a pure function both engines compute,
   * so the projected vectors (double-accumulated in index order, rounded
   * to float once at the end) replay bit-for-bit in SQL. Changing `salt`
   * draws an independent matrix.
   *
   * Appends `outName` as array<float>; composes directly with
   * [[bruteTopK]] / [[cosinePairsLsh]] / IVF on the projected column.
   */
  def randomProject(df: DataFrame, vec: Column, dim: Int, outDim: Int,
                    salt: String, outName: String = "proj"): DataFrame = {
    require(dim > 0 && outDim > 0, s"dims must be positive, got $dim -> $outDim")
    require(!df.columns.exists(_.equalsIgnoreCase(outName)),
      s"randomProject: input already has a column named $outName")
    val m: Array[Array[Double]] = Array.tabulate(outDim, dim) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j:$salt".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) < 8) 1.0 else -1.0
    }
    val proj = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        require(v.length == dim,
          s"randomProject: expected $dim-d vectors, got ${v.length}")
        // one unboxing copy per row (Seq[Float].apply boxes per access —
        // the signQuantize lesson)
        val x = new Array[Double](dim)
        var i0 = 0
        val it = v.iterator
        while (it.hasNext) { x(i0) = it.next().toDouble; i0 += 1 }
        Array.tabulate(outDim) { j =>
          val row = m(j)
          var s = 0.0
          var i = 0
          while (i < dim) { s += x(i) * row(i); i += 1 }
          s.toFloat
        }
      }
    }
    df.withColumn(outName, proj(vec))
  }

  // ---- PCA / whitening (the OPQ-style decorrelation step) ----

  /** A fitted PCA model: sample mean, top-m principal axes (row-major,
    * orthonormal), their eigenvalues (variance along each axis,
    * descending). Serializable for broadcast; persisted as text sidecars
    * (the IVF-centroid convention — Double.toString round-trips). */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double]) extends Serializable {
    def dim: Int = mean.length
    def m: Int = components.length
  }

  /**
   * Fit the top-`m` principal components on a bounded deterministic
   * sample (xxhash64-ordered `limit(sampleN)` — the PQ-codebook
   * contract; the dim×dim covariance and the eigen-solve are driver
   * work, O(sampleN·dim²), never corpus-scale). Eigenpairs come from
   * power iteration with deflation — md5-seeded start vectors, a FIXED
   * iteration count, normalization in index order — so the model is a
   * pure function of (sample, m, iters, salt) and refits reproduce it
   * exactly. The decorrelation/whitening preprocessing of the
   * compression ladder (OPQ's rotation step): PCA-rotated embeddings
   * give scalar/product quantizers axis-aligned, variance-sorted
   * coordinates to cut.
   */
  def fitPca(corpus: DataFrame, idCol: Column, vecCol: Column, m: Int,
             iters: Int = 100, sampleN: Int = 4096,
             salt: String = "pca"): PcaModel = {
    require(m > 0, s"fitPca: m must be positive, got $m")
    require(iters > 0 && sampleN > 0, "fitPca: iters/sampleN must be positive")
    val sample = corpus.select(idCol.as("__id"), vecCol.as("__v"))
      .orderBy(xxhash64(col("__id"))).limit(sampleN)
      .select(col("__v")).collect().map(r => toDoubles(r.getSeq[Float](0)))
    require(sample.nonEmpty, "fitPca: corpus is empty")
    fitPcaFromSample(sample, m, iters, salt, completeBasis = false)
  }

  /** The eigen-solve behind [[fitPca]] over an already-collected sample.
    * `completeBasis = true` switches the "covariance annihilated start
    * vector" failure into a deterministic null-space completion (the
    * md5 start vector Gram-Schmidted against the settled components,
    * eigenvalue 0) — a FULL orthonormal basis is what a rotation needs
    * even when the sample is rank-deficient; plain PCA callers keep the
    * loud failure (asking for more directions than the data has is a
    * caller bug there). */
  private def fitPcaFromSample(sample: Array[Array[Double]], m: Int,
                               iters: Int, salt: String,
                               completeBasis: Boolean): PcaModel = {
    val dim = sample(0).length
    require(m <= dim, s"fitPca: m = $m exceeds dim = $dim")
    val n = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { x => var i = 0; while (i < dim) { mean(i) += x(i); i += 1 } }
    locally { var i = 0; while (i < dim) { mean(i) /= n; i += 1 } }
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { x =>
      var i = 0
      while (i < dim) {
        val xi = x(i) - mean(i)
        var j = i
        while (j < dim) { cov(i)(j) += xi * (x(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    locally { var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) { cov(i)(j) /= n; cov(j)(i) = cov(i)(j); j += 1 }
        i += 1
      } }
    def matVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += a(i)(j) * v(j); j += 1 }
        s
      }
    val comps = new Array[Array[Double]](m)
    val eigs = new Array[Double](m)
    val work = cov.map(_.clone())
    // md5-seeded start: deterministic, never the zero vector
    def mdStart(tag: String): Array[Double] = Array.tabulate(dim) { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$tag:$i".getBytes("UTF-8"))
      ((d(0) & 0xff) + 1).toDouble / 257.0
    }
    // Gram-Schmidt w against the settled components IN PLACE; returns ‖w‖
    def orthogonalize(w: Array[Double], k: Int): Double = {
      var p = 0
      while (p < k) {
        val u = comps(p)
        var d = 0.0
        locally { var i = 0; while (i < dim) { d += w(i) * u(i); i += 1 } }
        var i = 0
        while (i < dim) { w(i) -= d * u(i); i += 1 }
        p += 1
      }
      var nrm = 0.0
      locally { var i = 0; while (i < dim) { nrm += w(i) * w(i); i += 1 } }
      math.sqrt(nrm)
    }
    for (k <- 0 until m) {
      var v = mdStart(k.toString)
      var annihilated = false
      var it = 0
      while (it < iters && !annihilated) {
        val w = matVec(work, v)
        // Gram-Schmidt against the settled components every step:
        // orthogonality is STRUCTURAL (machine precision), not a
        // convergence hope — close eigenvalues converge slowly, but the
        // returned basis is orthonormal regardless
        val nrm = orthogonalize(w, k)
        if (nrm > 0) {
          locally { var i = 0; while (i < dim) { w(i) /= nrm; i += 1 } }
          v = w
          it += 1
        } else if (!completeBasis) {
          require(nrm > 0, s"fitPca: covariance annihilated start vector $k " +
            "— fewer than m significant directions; lower m")
        } else annihilated = true
      }
      if (annihilated) {
        // null-space completion: the data has < m directions, but a
        // ROTATION needs a full orthonormal basis — finish it with the
        // deterministic md5 family Gram-Schmidted against the settled
        // components (eigenvalue exactly 0: work·v = 0 ⇒ vᵀ·work·v = 0)
        var done = false
        var attempt = 0
        while (!done) {
          require(attempt < dim + 8,
            s"fitPca: basis completion failed at component $k")
          val cand = mdStart(s"$k:retry$attempt")
          val nrm = orthogonalize(cand, k)
          if (nrm > 1e-9) {
            locally { var i = 0; while (i < dim) { cand(i) /= nrm; i += 1 } }
            comps(k) = cand
            eigs(k) = 0.0
            done = true
          }
          attempt += 1
        }
      } else {
        val cv = matVec(work, v)
        var lam = 0.0
        locally { var i = 0; while (i < dim) { lam += v(i) * cv(i); i += 1 } }
        comps(k) = v
        eigs(k) = lam
        // deflate: work -= lam * v vᵀ
        locally { var i = 0
          while (i < dim) {
            var j = 0
            while (j < dim) { work(i)(j) -= lam * v(i) * v(j); j += 1 }
            i += 1
          } }
      }
    }
    // order the eigenpairs by eigenvalue DESCENDING structurally: on a
    // flat spectrum (measured at 50k near-isotropic vectors) the k-th
    // power iteration can converge to a direction marginally above the
    // (k-1)-th's estimate — sorting costs nothing, preserves
    // orthonormality and each λ = vᵀCv exactly, and makes the descent
    // contract unconditional (ties break by extraction order)
    val order = eigs.indices.sortBy(k => (-eigs(k), k))
    PcaModel(mean, order.map(comps).toArray, order.map(eigs).toArray)
  }

  /**
   * Fit the OPQ rotation for an `m`-subspace product quantizer over an
   * already-collected sample: a FULL-dim orthonormal basis (PCA with
   * deterministic null-space completion) whose rows are then permuted by
   * Ge et al.'s eigenvalue allocation (arXiv CVPR'13 "Optimized Product
   * Quantization", the parametric solution): principal directions are
   * dealt, largest first, to the subspace with the smallest running
   * log-variance product that still has capacity dim/m — balancing the
   * per-subspace variance PQ codebooks have to spend bits on.
   * Decorrelation alone would stack ALL the variance into subspace 0;
   * the allocation is what turns the rotation into a PQ win. A row
   * permutation of an orthonormal basis is still orthonormal, so
   * euclidean geometry is preserved exactly — the lossless-degenerate
   * oracles stay valid under rotation.
   */
  private[graft] def fitOpqRotation(sample: Array[Array[Double]], m: Int,
                                    iters: Int = 100,
                                    salt: String = "opq"): PcaModel = {
    val dim = sample(0).length
    require(dim % m == 0, s"opq: dim $dim is not divisible by m = $m subspaces")
    val dsub = dim / m
    val full = fitPcaFromSample(sample, dim, iters, salt, completeBasis = true)
    // greedy balanced allocation on log-eigenvalues (clamped: null-space
    // axes carry no variance, they just fill remaining capacity)
    val cap = Array.fill(m)(dsub)
    val logProd = new Array[Double](m)
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    for (k <- 0 until dim) { // eigenpairs already sorted descending
      var best = -1
      var bestLp = Double.MaxValue
      var s = 0
      while (s < m) {
        if (cap(s) > 0 && logProd(s) < bestLp) { bestLp = logProd(s); best = s }
        s += 1
      }
      buckets(best) += k
      cap(best) -= 1
      logProd(best) += math.log(math.max(full.eigenvalues(k), 1e-12))
    }
    val order = buckets.flatMap(_.toSeq)
    PcaModel(full.mean, order.map(full.components), order.map(full.eigenvalues))
  }

  /** The OPQ rotation sidecar names inside an ANN store (the [[savePca]]
    * layout minus its own completion marker — the STORE's marker governs). */
  private def writeOpqSidecars(spark: org.apache.spark.sql.SparkSession,
                               model: PcaModel, path: String): Unit = {
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pca_mean",
      model.mean.mkString(","))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pca_components",
      model.components.map(_.mkString(",")).mkString("\n"))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pca_eigenvalues",
      model.eigenvalues.mkString(","))
  }

  /** A store's OPQ rotation, if it was built with one. */
  private def storeRotation(spark: org.apache.spark.sql.SparkSession,
                            path: String): Option[PcaModel] =
    if (graft.sources.Sidecar.exists(spark, path + "/_graft_pca_mean"))
      Some(loadPca(spark, path))
    else None

  /** Rotate an id+vec frame into a model's coordinates (same float path
    * on every side: build, append, and query all encode the pcaProject
    * UDF's float rounding, so lossless-degenerate exact-match encoding
    * sees bit-identical subvectors). */
  private def rotated(c: DataFrame, model: PcaModel): DataFrame =
    pcaProject(c, col("__cv"), model, whiten = false, outName = "__rv")
      .select(col(c.columns.head), col("__rv").as("__cv"))

  /**
   * Project the embedding column onto a fitted model: appends `outName`
   * (array&lt;float&gt; of m coordinates, (x − mean)·vₖ, divided by
   * √eigenvalue when `whiten` — unit variance per axis on the fitting
   * sample). A pure broadcast map, no shuffle; composes with
   * [[bruteTopK]], the quantizers, and the LSH gates on the projected
   * column.
   */
  def pcaProject(df: DataFrame, vecCol: Column, model: PcaModel,
                 whiten: Boolean = false,
                 outName: String = "pca"): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase(outName)),
      s"pcaProject: input already has a column named $outName")
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val proj = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val mdl = bc.value
        val dim = mdl.dim
        require(v.length == dim,
          s"pcaProject: expected $dim-d vectors, got ${v.length}")
        val x = new Array[Double](dim)
        var i0 = 0
        val it = v.iterator
        while (it.hasNext) { x(i0) = it.next().toDouble - mdl.mean(i0); i0 += 1 }
        Array.tabulate(mdl.m) { k =>
          val row = mdl.components(k)
          var s = 0.0; var i = 0
          while (i < dim) { s += x(i) * row(i); i += 1 }
          if (whiten) (s / math.sqrt(math.max(mdl.eigenvalues(k), 1e-12))).toFloat
          else s.toFloat
        }
      }
    }
    df.withColumn(outName, proj(vecCol))
  }

  /** Persist a fitted [[PcaModel]] under `path` (text sidecars — the
    * centroid convention; staged-marker contract). */
  def savePca(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
              path: String): Unit = {
    graft.sources.Sidecar.invalidateMarker(spark, path)
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pca_mean",
      model.mean.mkString(","))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pca_components",
      model.components.map(_.mkString(",")).mkString("\n"))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pca_eigenvalues",
      model.eigenvalues.mkString(","))
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Read a [[savePca]] model back. */
  def loadPca(spark: org.apache.spark.sql.SparkSession, path: String): PcaModel =
    PcaModel(
      graft.sources.Sidecar.readText(spark, path + "/_graft_pca_mean")
        .split(",").map(java.lang.Double.parseDouble),
      graft.sources.Sidecar.readText(spark, path + "/_graft_pca_components")
        .split("\n").map(_.split(",").map(java.lang.Double.parseDouble)),
      graft.sources.Sidecar.readText(spark, path + "/_graft_pca_eigenvalues")
        .split(",").map(java.lang.Double.parseDouble))

  /**
   * Hard-negative mining — the training-pair generator for embedding /
   * retrieval models (DPR, sentence-transformers): for each query, the
   * most-similar corpus rows that are NOT known positives, restricted to
   * the "semi-hard" rank band (`skip`, `skip + take`]. Skipping the very
   * top ranks guards against unlabelled positives (the classic
   * false-negative trap); the next ranks are the negatives that carry
   * gradient signal. Output: `query_id`, `neighbor_id`, `neg_rank` (1-based
   * among eligible negatives — ranked AFTER exclusion, so the band is
   * always full when enough negatives exist). Ties break by neighbor id —
   * fully deterministic.
   *
   * `positives` is any (query id, positive id) pair set — labelled qrels,
   * click logs, or a same-label join. Pairs are excluded with an anti-join
   * on the pair key, so a hot query with many positives is skew-splittable.
   *
   * Scale shape: one corpus scan against the broadcast query batch (the
   * [[bruteTopK]] contract — batch must stay broadcast-small; tile bigger
   * batches), then a window partitioned by query_id over n_queries × n
   * score rows. For corpus-scale recall-then-mine, feed the candidate
   * pairs from the IVF/PQ tiers into the same exclusion + band filter.
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, positives: DataFrame,
                    corpusId: Column, queryId: Column,
                    corpusVec: Column, queryVec: Column,
                    posQueryId: Column, posId: Column,
                    skip: Int, take: Int): DataFrame = {
    require(skip >= 0, s"skip must be >= 0, got $skip")
    require(take > 0, s"take must be positive, got $take")
    import graft.functions.stf
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
      .withColumn("__cn", stf.vec_norm(col("__cv")))
    val q = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
      .withColumn("__qn", stf.vec_norm(col("__qv")))
    val p = positives.select(posQueryId.as("query_id"), posId.as("neighbor_id"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .join(p, Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("neg_rank", rn)
      .filter(col("neg_rank") > skip && col("neg_rank") <= skip + take)
      .select(col("query_id"), col("neighbor_id"), col("neg_rank"))
  }

  /**
   * Majority-vote label assignment over ANY (query_id, neighbor_id) top-k
   * pair set — the classification head of kNN search: compose with
   * [[bruteTopK]] (exact baseline), [[ivfTopK]], or `ivfTopKIndexed` (the
   * scale path) and a (id, label) table. Output: `query_id`, `label_pred`,
   * `votes`. Ties break (votes desc, label asc), so the argmax is
   * deterministic.
   *
   * Scale shape: the label join is a skew-splittable equi-join on
   * neighbor_id; the vote groupBy is map-side combined; the argmax window
   * partitions on query_id over at most min(k, #labels) rows — bounded per
   * key by construction, never a hot-key funnel.
   */
  def labelVote(pairs: DataFrame, labels: DataFrame,
                labelId: Column, labelCol: Column): DataFrame = {
    val l = labels.select(labelId.as("__lv_id"), labelCol.as("label_pred"))
    val votes = pairs.join(l, col("neighbor_id") === col("__lv_id"))
      .groupBy(col("query_id"), col("label_pred")).agg(count(lit(1)).as("votes"))
    val rn = row_number().over(Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label_pred")))
    votes.withColumn("__rn", rn).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact kNN classification: [[bruteTopK]] neighbors voted by the corpus'
    * own label column. */
  def knnClassify(corpus: DataFrame, queries: DataFrame, corpusId: Column,
                  queryId: Column, corpusVec: Column, queryVec: Column,
                  labelCol: Column, k: Int): DataFrame =
    labelVote(
      bruteTopK(corpus, queries, corpusId, queryId, corpusVec, queryVec, k),
      corpus, corpusId, labelCol)

  /** Fit the coarse quantizer: seeded k-means++ init + Lloyd iterations on
    * the driver over a bounded deterministic sample (top-N by id hash — one
    * TakeOrdered job, no full sort shuffle). This is the ONE training recipe
    * shared by the live and persisted IVF paths (they must stay in lockstep
    * or a persisted index diverges from the live plan).
    *
    * Deliberately NOT spark.ml KMeans: its kmeans|| init plus per-iteration
    * distributed passes launch ~a dozen jobs whose scheduling latency
    * dominates the fit; IVF coarse quantizers are trained on a small sample
    * anyway (sample is 20×nlist rows — bounded by config, not corpus size,
    * so the collect is 100 TB-safe). */
  /** The one squared-euclidean kernel every centroid path shares — a fix to
    * summation order or guards lands everywhere at once. */
  /** Drop a localCheckpoint's cached blocks (same helper as Dedup's). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  @inline private[graft] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Float row vector → primitive doubles (element-exact; also unboxes the
    * Seq so inner loops stay allocation-free). */
  @inline private def toDoubles(v: Seq[Float]): Array[Double] = {
    val a = new Array[Double](v.length)
    var i = 0
    while (i < a.length) { a(i) = v(i); i += 1 }
    a
  }

  private[graft] def fitCentroids(c: DataFrame, nlist: Int, seed: Long): Array[Array[Double]] = {
    val sampleN = math.max(20 * nlist, 256)
    val sample = c.orderBy(xxhash64(col("neighbor_id"))).limit(sampleN)
      .select(col("__cv")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "IVF quantizer: corpus is empty")
    val dim = sample(0).length
    def d2(a: Array[Double], b: Array[Double]): Double = sqDist(a, b)
    val rnd = new scala.util.Random(seed)
    // k-means++ seeding: next center drawn proportional to squared distance
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]](
      sample(rnd.nextInt(sample.length)).clone())
    val minD = Array.fill(sample.length)(Double.MaxValue)
    while (centers.length < math.min(nlist, sample.length)) {
      val last = centers.last
      var total = 0.0
      var i = 0
      while (i < sample.length) {
        val d = d2(sample(i), last)
        if (d < minD(i)) minD(i) = d
        total += minD(i); i += 1
      }
      var r = rnd.nextDouble() * total
      var j = 0
      while (j < sample.length - 1 && r > minD(j)) { r -= minD(j); j += 1 }
      centers += sample(j).clone()
    }
    // corpus smaller than nlist: duplicate centers (empty cells are harmless)
    while (centers.length < nlist) centers += centers(rnd.nextInt(centers.length)).clone()
    val cs = centers.toArray
    var iter = 0
    while (iter < 10) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      var i = 0
      while (i < sample.length) {
        var best = 0; var bd = Double.MaxValue; var k = 0
        while (k < nlist) { val d = d2(sample(i), cs(k)); if (d < bd) { bd = d; best = k }; k += 1 }
        val s = sums(best)
        var j = 0
        while (j < dim) { s(j) += sample(i)(j); j += 1 }
        counts(best) += 1; i += 1
      }
      var k = 0
      while (k < nlist) {
        if (counts(k) > 0) {
          var j = 0
          while (j < dim) { cs(k)(j) = sums(k)(j) / counts(k); j += 1 }
        }
        k += 1
      }
      iter += 1
    }
    cs
  }

  /** Nearest-centroid cell id for a corpus vector. */
  private def assignCellUdf(centroids: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]) =
    udf { (v: Seq[Float]) =>
      val e = toDoubles(v)
      val cs = centroids.value
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < cs.length) {
        val d = sqDist(e, cs(i))
        if (d < bd) { bd = d; best = i }
        i += 1
      }
      best
    }

  /** Per-query probe set: indexes of the `nprobe` nearest centroids. */
  private def probeCellsUdf(centroids: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
                            nprobe: Int) = udf { (qv: Seq[Float]) =>
    val e = toDoubles(qv)
    val cs = centroids.value
    val dists = cs.indices.map { i => (sqDist(e, cs(i)), i) }
    dists.sorted.take(nprobe).map(_._2).toArray
  }

  /**
   * IVF top-k: KMeans(nlist, seed) coarse cells; each query probes the
   * nprobe nearest cells. nprobe == nlist degenerates to exact search.
   * Output: (query_id, neighbor_id, rank).
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, corpusId: Column, queryId: Column,
              corpusVec: Column, queryVec: Column, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    val bc = spark.sparkContext.broadcast(fitCentroids(c, nlist, seed))
    val assigned = c.withColumn("__cell", assignCellUdf(bc)(col("__cv")))
    val probeCells = probeCellsUdf(bc, nprobe)
    val q = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
      .withColumn("__qcell", explode(probeCells(col("__qv"))))

    import graft.functions.stf
    graft.functions.GraftFunctions.register(spark)
    val scored = assigned.withColumn("__cn", stf.vec_norm(col("__cv")))
      .join(broadcast(q.withColumn("__qn", stf.vec_norm(col("__qv")))),
        col("__cell") === col("__qcell") && col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  // ---- persisted IVF index ----
  // The scale contract of IVF is train-once / assign-once / query-many:
  // at 100 TB the corpus assignment is the expensive pass, and a query
  // batch should read only its probed cells. These two methods persist
  // the assignment as parquet range-partitioned and sorted by cell id —
  // a query's probe set reaches the reader as a pushed IN filter, so
  // non-probed cells are never read — with the centroids in an
  // underscore-hidden parquet sidecar (same layout idea as
  // [[graft.sources.IndexStore]]).

  /** Train the coarse quantizer and persist the assigned corpus
    * (`__cell`, `neighbor_id`, `__cv`, `__cn`) under `<path>/corpus` plus
    * a `_graft_centroids` text sidecar (one line per centroid, cell order;
    * `Double.toString` round-trips exactly). A top-level `_SUCCESS` marker
    * is written LAST so an interrupted build is redone by write-once
    * wrappers, never half-read. */
  def buildIvfIndex(corpus: DataFrame, path: String, corpusId: Column,
                    corpusVec: Column, nlist: Int = 16, seed: Long = 42L): Unit = {
    import graft.functions.stf
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    val spark = corpus.sparkSession
    // invalidate an existing marker FIRST (same rebuild-crash contract as
    // the other stores: never leave _SUCCESS over a half-rewritten layout)
    graft.sources.Sidecar.invalidateMarker(spark, path)
    dropTombstones(spark, path) // a rebuild starts with a clean slate
    val centroids = fitCentroids(c, nlist, seed)
    val bc = spark.sparkContext.broadcast(centroids)
    c.withColumn("__cell", assignCellUdf(bc)(col("__cv")))
      .withColumn("__cn", stf.vec_norm(col("__cv")))
      .repartitionByRange(col("__cell")).sortWithinPartitions(col("__cell"))
      .write.mode("overwrite").parquet(path + "/corpus")
    graft.sources.Sidecar.writeText(spark, path + "/_graft_centroids",
      centroids.map(_.mkString(",")).mkString("\n"))
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Fit and persist ONLY the IVF coarse quantizer — the train-once seed
    * for STREAMING ingest ([[appendIvfBatch]] /
    * `EventStreams.ingestIvfStore`): centroids are fit on the (bounded,
    * deterministic) sample exactly as [[buildIvfIndex]] fits them, but no
    * corpus rows are written and no completion marker is set, so the
    * store starts empty and batches accumulate under `corpus/batch_id=`
    * partitions that [[ivfTopKIndexed]]'s partition discovery folds
    * transparently. */
  def trainIvfCentroids(seedCorpus: DataFrame, path: String, corpusId: Column,
                        corpusVec: Column, nlist: Int = 16,
                        seed: Long = 42L): Unit = {
    val spark = seedCorpus.sparkSession
    val c = seedCorpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    val centroids = fitCentroids(c, nlist, seed)
    graft.sources.Sidecar.writeText(spark, path + "/_graft_centroids",
      centroids.map(_.mkString(",")).mkString("\n"))
  }

  /** Read a store's persisted quantizer back as dense centroid rows. */
  private[graft] def readCentroids(spark: org.apache.spark.sql.SparkSession,
                                   path: String): Array[Array[Double]] =
    graft.sources.Sidecar.readText(spark, path + "/_graft_centroids")
      .split("\n").map(_.split(",").map(java.lang.Double.parseDouble))

  /** Encode one batch under a store's FROZEN quantizer: assign each
    * vector its nearest stored centroid cell and precompute the norm —
    * the exact per-row layout [[buildIvfIndex]] writes, so appended
    * batches are indistinguishable from a one-pass build to every
    * reader. */
  def encodeIvfBatch(batch: DataFrame, idCol: Column, vecCol: Column,
                     path: String): DataFrame = {
    import graft.functions.stf
    val spark = batch.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val bc = spark.sparkContext.broadcast(readCentroids(spark, path))
    batch.select(idCol.as("neighbor_id"), vecCol.as("__cv"))
      .withColumn("__cell", assignCellUdf(bc)(col("__cv")))
      .withColumn("__cn", stf.vec_norm(col("__cv")))
  }

  /** Append one encoded batch as its own `corpus/batch_id=` partition
    * (overwrite-by-batch — replay-safe: a retried batch rewrites, never
    * double-appends), rows sorted by cell within the partition so the
    * probe-time IN filter keeps pruning row groups. */
  def appendIvfBatch(batch: DataFrame, idCol: Column, vecCol: Column,
                     path: String, batchId: Long): Unit =
    encodeIvfBatch(batch, idCol, vecCol, path)
      .sortWithinPartitions(col("__cell"))
      .write.mode("overwrite").parquet(s"$path/corpus/batch_id=$batchId")

  /** Query a [[buildIvfIndex]] store: each query probes its `nprobe`
    * nearest cells; only those cells are read from the store (pushed IN
    * filter over the sorted cell column). `nprobe` ≥ nlist reads
    * everything and equals [[bruteTopK]] exactly. The query batch is
    * collected once (it is broadcast-small by contract), so its upstream
    * plan never executes twice. */
  def ivfTopKIndexed(queries: DataFrame, path: String, queryId: Column,
                     queryVec: Column, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import graft.functions.stf
    graft.functions.GraftFunctions.register(spark)
    val bc = spark.sparkContext.broadcast(readCentroids(spark, path))
    val probeCells = probeCellsUdf(bc, nprobe)
    // materialize the (small) query batch once: probe-set collection and
    // the join below must not re-run a possibly expensive upstream plan
    val qBatch = queries.select(queryId.as("query_id"), queryVec.as("__qv")).collect()
    val qSchema = queries.select(queryId.as("query_id"), queryVec.as("__qv")).schema
    val q = spark.createDataFrame(java.util.Arrays.asList(qBatch: _*), qSchema)
      .withColumn("__qcell", explode(probeCells(col("__qv"))))
      .withColumn("__qn", stf.vec_norm(col("__qv")))
    val cells = q.select(col("__qcell")).distinct().collect().map(_.getInt(0))
    val scored = minusTombstones(spark.read.parquet(path + "/corpus"),
        path, "neighbor_id")
      .filter(col("__cell").isin(cells.map(Int.box).toIndexedSeq: _*))
      .join(broadcast(q),
        col("__cell") === col("__qcell") && col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  // ---- graph ANN: IVF-NSW (per-cell navigable small worlds) ----
  //
  // The graph tier of the ANN family (r10 verdict ask #4 — the measured
  // decision in dev/hnsw_experiment.py: at matched recall a navigable-
  // small-world beam search spends 2-4x fewer distance computations per
  // query than IVF cell scans, but a SINGLE corpus-wide graph is
  // unshippable under Spark's execution model — construction is
  // sequential insertion (55M distance comps for 20k vectors, 6.5x the
  // IVF train cost, unparallelizable), and serving would need the whole
  // graph resident. The Spark-native form is IVF-NSW: the frozen coarse
  // quantizer routes vectors to cells exactly as the IVF store does, and
  // each CELL holds its own deterministic NSW graph — builds parallelize
  // per cell (sequentiality is confined to a cell, the same executor-
  // memory contract every IVF cell scan already has), queries route to
  // nprobe cells and beam-search each, and the 2-4x query-side saving
  // survives because it applies within every probed cell. This is the
  // DiskANN/faiss-HNSW sharding shape. Determinism contract: insertion
  // in ascending id order, all tie-breaks by (distance, id), entry point
  // = the cell's smallest id — so graphs, searches, and stores are total
  // functions of (corpus, params), and the degenerate configuration
  // (nprobe = nlist, efSearch >= cell size) visits every node of every
  // cell (the beam never saturates, cells are connected by construction:
  // node i always links to >= 1 earlier node), making the result EXACTLY
  // the euclidean brute top-k — which is what the driver oracle pins.

  /** Deterministic NSW adjacency over one cell (vectors sorted by id):
    * node i links to its `m` nearest among nodes 0..i−1 — exhaustive for
    * the first m nodes, beam-searched (`efC`) after — and links are
    * symmetrized under an HNSW-style deterministic degree cap: when a
    * reverse link pushes a node past 2m neighbors, the list shrinks to
    * the 2m nearest by (distance, id) — so a hub can no longer
    * accumulate O(cell) adjacency (inflating the persisted `__adj` and
    * every beam that touches it). The shrink NEVER drops a later node's
    * last incoming-from-earlier edge: every node keeps ≥ 1 such edge
    * (it gets ≥ 1 at insertion), so by induction every node stays
    * reachable from the entry node 0 and the degenerate configuration
    * (efSearch ≥ cell) still visits every node — the exactness contract
    * q231 pins. Returns per-node neighbor INDEX lists. */
  private[graft] def nswBuildLocal(ids: Array[Long], vecs: Array[Array[Double]],
                                   m: Int, efC: Int): Array[Array[Int]] = {
    val n = ids.length
    val maxDeg = 2 * m
    val adj = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    // incoming(x) = live edges y -> x with y < x (the "descent" edges the
    // reachability induction walks); maintained across shrinks
    val incoming = new Array[Int](n)
    var i = 1
    while (i < n) {
      val cand: Seq[Int] =
        if (i <= m) 0 until i
        else nswSearchLocal(ids, vecs, adj, vecs(i), efC, i)._1.map(_._2)
      cand.map(j => (sqDist(vecs(j), vecs(i)), ids(j), j))
        .sorted.take(m).foreach { case (_, _, j) =>
          if (!adj(i).contains(j)) adj(i) += j
          if (!adj(j).contains(i)) {
            adj(j) += i
            incoming(i) += 1
            if (adj(j).length > maxDeg) {
              val ordered = adj(j)
                .map(x => (sqDist(vecs(x), vecs(j)), ids(x), x)).sorted
              val keep = scala.collection.mutable.ArrayBuffer.empty[Int]
              var rank = 0
              ordered.foreach { case (_, _, x) =>
                if (rank < maxDeg || (x > j && incoming(x) == 1)) keep += x
                else if (x > j) incoming(x) -= 1
                rank += 1
              }
              adj(j).clear(); adj(j) ++= keep
            }
          }
        }
      i += 1
    }
    adj.map(_.sorted.toArray)
  }

  /** Greedy best-first beam over the first `nNodes` nodes of a cell graph,
    * entered at node 0 (the smallest id): classic HNSW SEARCH-LAYER with
    * every tie broken by id. Returns up to `ef` (distance, index) pairs,
    * ascending. With ef >= nNodes the beam never saturates and the walk
    * visits the whole (connected) graph — the exact degenerate. Returns
    * (hits, nodes visited). */
  private[graft] def nswSearchLocal(ids: Array[Long], vecs: Array[Array[Double]],
                                    adj: IndexedSeq[scala.collection.Seq[Int]],
                                    q: Array[Double], ef: Int,
                                    nNodes: Int): (Seq[(Double, Int)], Int) = {
    if (nNodes <= 0) return (Nil, 0)
    implicit val ord: Ordering[(Double, Long, Int)] = Ordering.Tuple3
    val visited = new java.util.HashSet[Integer]()
    // frontier: nearest-first; results: worst-first (bounded at ef)
    val frontier = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Int)](ord.reverse)
    val results = scala.collection.mutable.PriorityQueue.empty[(Double, Long, Int)](ord)
    val d0 = sqDist(vecs(0), q)
    visited.add(0)
    frontier.enqueue((d0, ids(0), 0))
    results.enqueue((d0, ids(0), 0))
    while (frontier.nonEmpty) {
      val (d, _, u) = frontier.dequeue()
      if (results.size >= ef && ord.compare((d, ids(u), u), results.head) > 0) {
        frontier.clear()
      } else {
        adj(u).foreach { w =>
          if (w < nNodes && !visited.contains(w)) {
            visited.add(w)
            val dw = sqDist(vecs(w), q)
            if (results.size < ef || ord.compare((dw, ids(w), w), results.head) < 0) {
              frontier.enqueue((dw, ids(w), w))
              results.enqueue((dw, ids(w), w))
              if (results.size > ef) { results.dequeue(); () }
            }
          }
        }
      }
    }
    val drained: List[(Double, Long, Int)] = results.dequeueAll.toList
    (drained.reverse.map(t => (t._1, t._3)), visited.size)
  }

  /** Per-cell NSW graph assembly over assigned corpus rows
    * (`__cell`, `neighbor_id`, `__cv`): one cell's rows are grouped
    * in-memory per executor (the IVF cell-size contract), sorted by id,
    * and the deterministic adjacency is attached as `__adj`
    * (array&lt;long&gt; of neighbor IDS — stable across compaction
    * rebuilds). Shared by [[buildNswIndex]] and [[compactAnnStore]]'s
    * NSW branch. */
  /** Stream a partition's rows cell-by-cell: rows MUST arrive clustered
    * by the cell column (sortWithinPartitions upstream — Spark's sort
    * spills, so the per-task peak is max(cell), not Σ(cells in the
    * partition); a whole-partition groupBy would hold every co-resident
    * cell in memory at once). Within a group, rows keep their arrival
    * (id-sorted) order — the determinism contract the graph build and
    * the walks rely on. */
  private def groupedByCell(it: Iterator[org.apache.spark.sql.Row],
                            cellIdx: Int): Iterator[(Int, Seq[org.apache.spark.sql.Row])] = {
    val buf = it.buffered
    new Iterator[(Int, Seq[org.apache.spark.sql.Row])] {
      override def hasNext: Boolean = buf.hasNext
      override def next(): (Int, Seq[org.apache.spark.sql.Row]) = {
        val cell = buf.head.getInt(cellIdx)
        val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        while (buf.hasNext && buf.head.getInt(cellIdx) == cell) rows += buf.next()
        (cell, rows.toSeq)
      }
    }
  }

  private def nswAssembleGraphs(assigned: DataFrame, m: Int, efC: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("__cell", IntegerType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("__cv", ArrayType(FloatType), nullable = true),
      StructField("__adj", ArrayType(LongType), nullable = false)))
    // cell-clustered, id-sorted arrival: the spillable sort replaces the
    // old in-heap whole-partition groupBy/sortBy (peak = max cell)
    val in = assigned.select(col("__cell"), col("neighbor_id"), col("__cv"))
      .repartition(col("__cell"))
      .sortWithinPartitions(col("__cell"), col("neighbor_id"))
    in.mapPartitions { it =>
      groupedByCell(it, 0).flatMap { case (cell, sorted) =>
        val ids = sorted.map(_.getLong(1)).toArray
        val vecs = sorted.map(r => toDoubles(r.getSeq[Float](2))).toArray
        val adj = nswBuildLocal(ids, vecs, m, efC)
        sorted.indices.map { i =>
          org.apache.spark.sql.Row(cell, ids(i), sorted(i).getSeq[Float](2),
            adj(i).map(ids(_)).toSeq)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Build/overwrite a persisted IVF-NSW index under `path`: the IVF
    * layout (`corpus` cell-range-sorted, `_graft_centroids` sidecar) plus
    * a per-row `__adj` adjacency column and a `_graft_nsw_params` sidecar
    * — so cell routing, pushed-IN probes, id-keyed tombstones, and the
    * staged-swap marker contract are all inherited unchanged. */
  def buildNswIndex(corpus: DataFrame, path: String, corpusId: Column,
                    corpusVec: Column, nlist: Int = 16, m: Int = 8,
                    efC: Int = 32, seed: Long = 42L): Unit = {
    require(m > 0 && efC >= m,
      s"buildNswIndex: need m > 0 and efC >= m (got m=$m efC=$efC)")
    val spark = corpus.sparkSession
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    graft.sources.Sidecar.invalidateMarker(spark, path)
    dropTombstones(spark, path)
    val centroids = fitCentroids(c, nlist, seed)
    val bc = spark.sparkContext.broadcast(centroids)
    nswAssembleGraphs(c.withColumn("__cell", assignCellUdf(bc)(col("__cv"))), m, efC)
      .repartitionByRange(col("__cell"))
      .sortWithinPartitions(col("__cell"), col("neighbor_id"))
      .write.mode("overwrite").parquet(path + "/corpus")
    graft.sources.Sidecar.writeText(spark, path + "/_graft_centroids",
      centroids.map(_.mkString(",")).mkString("\n"))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_nsw_params",
      s"m $m efc $efC")
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /**
   * Query a [[buildNswIndex]] store: each query routes to its `nprobe`
   * nearest cells (pushed IN — unprobed cells are never read), beam-
   * searches each probed cell's graph with width `efSearch`, and the
   * per-cell candidates fold through one global (distance, id) window
   * rank. Euclidean ranking, ties to the lower id (the PQ family's
   * contract). Tombstoned ids stay TRAVERSABLE (the standard HNSW
   * deleted-node semantic — dropping them would disconnect the graph)
   * but are filtered from results, so takedowns are exact without a
   * rebuild; [[compactAnnStore]] rebuilds the cell graphs over live rows.
   * nprobe >= nlist with efSearch >= max cell size degenerates to the
   * exact euclidean brute top-k.
   */
  def nswTopKIndexed(queries: DataFrame, path: String, queryId: Column,
                     queryVec: Column, k: Int, nprobe: Int = 4,
                     efSearch: Int = 64): DataFrame = {
    val cand = nswCandidates(queries, path, queryId, queryVec, nprobe, efSearch)
    val live = minusTombstones(cand, path, "neighbor_id")
      .filter(col("neighbor_id") =!= col("query_id"))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__d2"), col("neighbor_id")))
    live.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Per-query search-cost telemetry for an IVF-NSW store: `n_visited`
    * (nodes touched across the query's probed cells — the quantity the
    * graph tier exists to cap) and `n_cells`. Same deterministic walk as
    * [[nswTopKIndexed]]. */
  def nswProbeStats(queries: DataFrame, path: String, queryId: Column,
                    queryVec: Column, nprobe: Int = 4,
                    efSearch: Int = 64): DataFrame =
    nswCandidates(queries, path, queryId, queryVec, nprobe, efSearch)
      .select(col("query_id"), col("__cell"), col("__visited")).distinct()
      .groupBy(col("query_id"))
      .agg(sum(col("__visited")).as("n_visited"),
        count(col("__cell")).cast("long").as("n_cells"))

  /** Shared candidate generation for the IVF-NSW readers: route the
    * (broadcast-small, collected-once) query batch to probe cells, read
    * ONLY those cells (pushed IN), beam-search each cell's graph, emit
    * (query_id, neighbor_id, __d2, __cell, __visited) rows. Tombstones
    * are NOT applied here — deleted nodes stay traversable. */
  private def nswCandidates(queries: DataFrame, path: String, queryId: Column,
                            queryVec: Column, nprobe: Int,
                            efSearch: Int): DataFrame = {
    require(nprobe > 0 && efSearch > 0,
      s"nswCandidates: need nprobe > 0 and efSearch > 0 (got $nprobe, $efSearch)")
    val spark = queries.sparkSession
    val cents = readCentroids(spark, path)
    // ONE driver round-trip: probe cells computed locally on the collected
    // batch with the same nearest-centroids routine the IVF readers' UDF
    // wraps (no intermediate createDataFrame/collect)
    val qBatch = queries.select(queryId.as("query_id"), queryVec.as("__qv")).collect()
    val probes = qBatch.flatMap { r =>
      val qv = toDoubles(r.getSeq[Float](1))
      cents.indices.map(i => (sqDist(qv, cents(i)), i)).sorted.take(nprobe)
        .map(ci => (ci._2, (r.getLong(0), qv)))
    }
    val cells = probes.map(_._1).distinct
    val byCell = spark.sparkContext.broadcast(
      probes.groupBy(_._1).map { case (c, g) => (c, g.map(_._2)) })
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("neighbor_id", LongType, nullable = false),
      StructField("__d2", DoubleType, nullable = false),
      StructField("__cell", IntegerType, nullable = false),
      StructField("__visited", LongType, nullable = false)))
    spark.read.parquet(path + "/corpus")
      .filter(col("__cell").isin(cells.map(Int.box).toIndexedSeq: _*))
      .select(col("__cell"), col("neighbor_id"), col("__cv"), col("__adj"))
      .repartition(col("__cell"))
      .sortWithinPartitions(col("__cell"), col("neighbor_id"))
      .mapPartitions { it =>
        groupedByCell(it, 0).flatMap { case (cell, sorted) =>
          val ids = sorted.map(_.getLong(1)).toArray
          val vecs = sorted.map(r => toDoubles(r.getSeq[Float](2))).toArray
          val idx = ids.zipWithIndex.toMap
          val adj = sorted.map(_.getSeq[Long](3).flatMap(idx.get).toIndexedSeq)
            .toIndexedSeq
          byCell.value.getOrElse(cell, Array.empty[(Long, Array[Double])])
            .iterator.flatMap { case (qid, qv) =>
              val (hits, visited) =
                nswSearchLocal(ids, vecs, adj, qv, efSearch, ids.length)
              hits.map { case (d, i) =>
                org.apache.spark.sql.Row(qid, ids(i), d, cell, visited.toLong)
              }
            }
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /**
   * Product-quantization ANN — the memory tier of the ANN family (brute →
   * LSH → IVF → PQ): each vector splits into `m` subspaces, a ksub-entry
   * codebook per subspace is trained on a bounded deterministic sample
   * (same driver-side recipe as the IVF quantizer), the corpus is encoded
   * as m small codes per row, and queries score by asymmetric distance —
   * a per-query m×ksub lookup table, so scoring costs m table reads per
   * corpus row instead of dim multiplies, and a persisted corpus stores
   * m codes (bytes at ksub ≤ 256) instead of dim floats: the ~16-64×
   * compression that makes 100 TB of embeddings fit an ANN serving tier.
   *
   * Euclidean ranking, ties to the lower neighbor id. Approximate for
   * compressing configs; EXACT (lossless) when ksub covers every distinct
   * subvector and iters = 0 — the codebook then contains each subvector
   * itself, the ADC sum telescopes to the true squared distance, and the
   * driver oracle verifies that degenerate the same way q51 pins IVF with
   * nprobe = nlist. (The ADC sum groups per-subspace partials, so it can
   * differ from a flat fold in the last ulps — rankings only flip on
   * near-ties far below the distance gaps of real data.)
   *
   * Output: (query_id, neighbor_id, rank), self-pairs excluded.
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, corpusId: Column, queryId: Column,
             corpusVec: Column, queryVec: Column, k: Int, m: Int, ksub: Int,
             iters: Int = 3, sampleN: Int = 4096): DataFrame = {
    require(m >= 1 && ksub >= 1 && iters >= 0 && k >= 1,
      s"pqTopK: m=$m ksub=$ksub iters=$iters k=$k must all be positive (iters >= 0)")
    val spark = corpus.sparkSession
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    // bounded deterministic sample, id-hash order (the fitCentroids recipe)
    val sample = c.orderBy(xxhash64(col("neighbor_id"))).limit(math.max(sampleN, ksub))
      .select(col("__cv")).collect()
      .map(r => toDoubles(r.getSeq[Float](0)))
    require(sample.nonEmpty, "pqTopK: corpus is empty")
    val codebooks = fitPqCodebooks(sample, m, ksub, iters)
    val encoded = c.withColumn("__code",
      pqEncodeUdf(spark.sparkContext.broadcast(codebooks))(col("__cv"))).drop("__cv")
    pqRank(encoded, queries, queryId, queryVec, codebooks, k)
  }

  /** Train per-subspace PQ codebooks over a prepared (double) sample — the
    * ONE recipe shared by [[pqTopK]] and [[buildPqIndex]] (lockstep, like
    * fitCentroids for the two IVF paths). Init = first ksub DISTINCT
    * subvectors in sample order (deterministic; ksub >= distinct makes the
    * init lossless), then `iters` Lloyd rounds over the sample. */
  private[graft] def fitPqCodebooks(sample: Array[Array[Double]], m: Int, ksub: Int,
                                    iters: Int): Array[Array[Array[Double]]] = {
    val dim = sample(0).length
    require(dim % m == 0, s"pq: dim $dim is not divisible by m = $m subspaces")
    val dsub = dim / m
    Array.tabulate(m) { s =>
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      val seen = scala.collection.mutable.LinkedHashSet.empty[scala.collection.immutable.ArraySeq[Double]]
      subs.iterator.takeWhile(_ => seen.size < ksub)
        .foreach(v => seen += scala.collection.immutable.ArraySeq.unsafeWrapArray(v))
      val cs = seen.iterator.map(_.unsafeArray.asInstanceOf[Array[Double]]).toArray
      var it = 0
      while (it < iters) {
        val sums = Array.fill(cs.length)(new Array[Double](dsub))
        val counts = new Array[Long](cs.length)
        subs.foreach { v =>
          var best = 0; var bd = Double.MaxValue; var j = 0
          while (j < cs.length) {
            val d = sqDist(v, cs(j)); if (d < bd) { bd = d; best = j }; j += 1
          }
          val su = sums(best); var x = 0
          while (x < dsub) { su(x) += v(x); x += 1 }
          counts(best) += 1
        }
        var j = 0
        while (j < cs.length) {
          if (counts(j) > 0) {
            var x = 0
            while (x < dsub) { cs(j)(x) = sums(j)(x) / counts(j); x += 1 }
          }
          j += 1
        }
        it += 1
      }
      cs
    }
  }

  /** Per-JVM exact-match index for [[pqEncodeUdf]], keyed by broadcast id:
    * subvector → codebook position. Codebook entries are distinct by
    * construction, so an exact hit is distance 0 — the unique argmin — and
    * the fast path returns EXACTLY what the scan would. This turns the
    * lossless serving degenerate (ksub covers the corpus: codebook size n)
    * from an O(n·ksub·dsub) encode into O(n·dsub) hashing; compressing
    * configs rarely hit it and fall through to the scan. Bounded: cleared
    * past 64 broadcast generations. */
  private object PqExactIndex {
    private val cache = new java.util.concurrent.ConcurrentHashMap[
      Long, Array[java.util.HashMap[scala.collection.immutable.ArraySeq[Double], Integer]]]()
    def forCodebooks(id: Long, cbs: Array[Array[Array[Double]]]):
        Array[java.util.HashMap[scala.collection.immutable.ArraySeq[Double], Integer]] = {
      if (cache.size > 64) cache.clear()
      cache.computeIfAbsent(id, _ => cbs.map { cb =>
        val m = new java.util.HashMap[scala.collection.immutable.ArraySeq[Double], Integer](cb.length * 2)
        var j = 0
        while (j < cb.length) {
          // putIfAbsent: were entries ever non-distinct, first index wins —
          // the same tie the linear scan's strict < resolves
          m.putIfAbsent(scala.collection.immutable.ArraySeq.unsafeWrapArray(cb(j)), j)
          j += 1
        }
        m
      })
    }
  }

  /** Encode one prepared double vector as m codebook indexes: exact-hash
    * hit first, linear argmin scan otherwise. The one kernel behind the
    * flat-PQ and IVF-PQ encode UDFs. */
  private def encodeDoubles(e: Array[Double], cbs: Array[Array[Array[Double]]],
      exact: Array[java.util.HashMap[scala.collection.immutable.ArraySeq[Double], Integer]]): Array[Int] = {
    require(e.length == cbs.length * cbs(0)(0).length,
      s"pq: vector dim ${e.length} != trained dim ${cbs.length * cbs(0)(0).length}")
    val out = new Array[Int](cbs.length)
    var s = 0; var off = 0
    while (s < cbs.length) {
      val cb = cbs(s)
      val dsub = cb(0).length
      val sub = java.util.Arrays.copyOfRange(e, off, off + dsub)
      val hit = exact(s).get(scala.collection.immutable.ArraySeq.unsafeWrapArray(sub))
      if (hit != null) out(s) = hit.intValue()
      else {
        var best = 0; var bd = Double.MaxValue; var j = 0
        while (j < cb.length) {
          var d = 0.0; var x = 0
          while (x < dsub) { val diff = sub(x) - cb(j)(x); d += diff * diff; x += 1 }
          if (d < bd) { bd = d; best = j }
          j += 1
        }
        out(s) = best
      }
      off += dsub; s += 1
    }
    out
  }

  /** Encode one corpus vector as m codebook indexes — the compressed
    * representation (bytes at ksub <= 256). */
  private def pqEncodeUdf(bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]]) =
    udf { (raw: Seq[Float]) =>
      encodeDoubles(toDoubles(raw), bc.value, PqExactIndex.forCodebooks(bc.id, bc.value))
    }

  /** ADC scoring + per-query top-k over an encoded corpus: collect the
    * (broadcast-small) query batch, turn each query into its flattened
    * m×ksub lookup table, score = m table reads per corpus row.
    *
    * The tables travel as ONE `sparkContext.broadcast` and the join side
    * carries only a table INDEX per query row — routing the m×ksub array
    * through the join itself would re-materialize it (boxed) for every
    * (corpus × query) output row, which measured ~20× slower than the
    * whole remaining plan at n = 2000, ksub = n. */
  private def pqRank(encoded: DataFrame, queries: DataFrame, queryId: Column,
                     queryVec: Column, codebooks: Array[Array[Array[Double]]],
                     k: Int): DataFrame = {
    val spark = encoded.sparkSession
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val dim = m * dsub
    // per-subspace offsets: codebooks may be ragged when distinct < ksub
    val offsets = codebooks.scanLeft(0)(_ + _.length)
    val qBatch = queries.select(queryId.as("query_id"), queryVec.as("__qv")).collect()
    val tables = qBatch.map { r =>
      val q = toDoubles(r.getSeq[Float](1))
      require(q.length == dim, s"pq: query dim ${q.length} != trained dim $dim")
      val t = new Array[Double](offsets.last)
      var s = 0
      while (s < m) {
        val cb = codebooks(s); val qs = java.util.Arrays.copyOfRange(q, s * dsub, (s + 1) * dsub)
        var j = 0
        while (j < cb.length) { t(offsets(s) + j) = sqDist(qs, cb(j)); j += 1 }
        s += 1
      }
      t
    }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      queries.select(queryId.as("query_id")).schema.fields.head,
      org.apache.spark.sql.types.StructField("__qidx",
        org.apache.spark.sql.types.IntegerType, false)))
    val q = spark.createDataFrame(
      java.util.Arrays.asList(qBatch.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(r.get(0), i) }: _*), qSchema)
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTables = spark.sparkContext.broadcast(tables)
    val score = udf { (codes: Seq[Int], qidx: Int) =>
      val off = bcOff.value
      val table = bcTables.value(qidx)
      var s = 0; var d = 0.0
      while (s < codes.length) { d += table(off(s) + codes(s)); s += 1 }
      d
    }
    val scored = encoded
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("__pqd", score(col("__code"), col("__qidx")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__pqd"), col("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Delete stale OPQ rotation sidecars — a rebuild WITHOUT opq over a
    * store that had one must not leave readers rotating queries into a
    * coordinate system the codes no longer use. */
  private def dropOpqSidecars(spark: org.apache.spark.sql.SparkSession,
                              path: String): Unit =
    Seq("_graft_pca_mean", "_graft_pca_components", "_graft_pca_eigenvalues")
      .foreach { n =>
        val p = new org.apache.hadoop.fs.Path(s"$path/$n")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, false)
      }

  /** Fit the OPQ rotation on the build-time raw sample (same bounded
    * deterministic id-hash sample as the codebooks). */
  private def fitStoreRotation(c: DataFrame, m: Int, ksub: Int,
                               sampleN: Int, who: String): PcaModel = {
    val raw = c.orderBy(xxhash64(col(c.columns.head)))
      .limit(math.max(sampleN, ksub))
      .select(col("__cv")).collect()
      .map(r => toDoubles(r.getSeq[Float](0)))
    require(raw.nonEmpty, s"$who: corpus is empty")
    fitOpqRotation(raw, m)
  }

  /** Persist the PQ serving tier: train codebooks (bounded sample), write
    * the corpus as (neighbor_id, m codes) parquet — the 16-64× compressed
    * representation a 100 TB corpus is queried from — plus a codebook
    * sidecar. Same rebuild-crash contract as the IVF store.
    *
    * `opq = true` composes the [[fitOpqRotation]] step in front of the
    * quantizer (rotate at train + encode, carry the rotation sidecar,
    * rotate queries at probe — all transparent to readers): codebooks
    * then cut decorrelated, variance-balanced coordinates. Distances are
    * exactly preserved (orthonormal rotation), so the store keeps the
    * lossless-degenerate oracle and gains recall on anisotropic data in
    * compressing configs (spec-asserted). */
  def buildPqIndex(corpus: DataFrame, path: String, corpusId: Column, corpusVec: Column,
                   m: Int = 8, ksub: Int = 256, iters: Int = 3,
                   sampleN: Int = 4096, opq: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    val c0 = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    graft.sources.Sidecar.invalidateMarker(spark, path)
    dropTombstones(spark, path) // a rebuild starts with a clean slate
    dropOpqSidecars(spark, path)
    val rot = if (opq) Some(fitStoreRotation(c0, m, ksub, sampleN, "buildPqIndex"))
              else None
    val c = rot.map(rotated(c0, _)).getOrElse(c0)
    val sample = c.orderBy(xxhash64(col("neighbor_id"))).limit(math.max(sampleN, ksub))
      .select(col("__cv")).collect()
      .map(r => toDoubles(r.getSeq[Float](0)))
    require(sample.nonEmpty, "buildPqIndex: corpus is empty")
    val codebooks = fitPqCodebooks(sample, m, ksub, iters)
    c.withColumn("__code",
        pqEncodeUdf(spark.sparkContext.broadcast(codebooks))(col("__cv"))).drop("__cv")
      .write.mode("overwrite").parquet(path + "/codes")
    // one line per subspace; entries '|', dims ',' (Double.toString
    // round-trips exactly, same as the IVF centroid sidecar)
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pq_codebooks",
      codebooks.map(_.map(_.mkString(",")).mkString("|")).mkString("\n"))
    rot.foreach(writeOpqSidecars(spark, _, path))
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Fit and persist ONLY the PQ codebooks — the train-once seed for
    * STREAMING ingest ([[appendPqBatch]] / `EventStreams.ingestPqStore`),
    * the same faiss train/add split as [[trainIvfCentroids]]: codebooks
    * are fit on the bounded deterministic sample exactly as
    * [[buildPqIndex]] fits them, no codes are written, no completion
    * marker — batches accumulate under `codes/batch_id=` partitions that
    * [[pqTopKIndexed]]'s partition discovery folds transparently. */
  def trainPqCodebooks(seedCorpus: DataFrame, path: String, corpusId: Column,
                       corpusVec: Column, m: Int = 8, ksub: Int = 256,
                       iters: Int = 3, sampleN: Int = 4096,
                       opq: Boolean = false): Unit = {
    val spark = seedCorpus.sparkSession
    val c0 = seedCorpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    dropOpqSidecars(spark, path) // no stale rotation under a fresh model
    val rot = if (opq) Some(fitStoreRotation(c0, m, ksub, sampleN, "trainPqCodebooks"))
              else None
    val c = rot.map(rotated(c0, _)).getOrElse(c0)
    val sample = c.orderBy(xxhash64(col("neighbor_id"))).limit(math.max(sampleN, ksub))
      .select(col("__cv")).collect()
      .map(r => toDoubles(r.getSeq[Float](0)))
    require(sample.nonEmpty, "trainPqCodebooks: seed corpus is empty")
    val codebooks = fitPqCodebooks(sample, m, ksub, iters)
    rot.foreach(writeOpqSidecars(spark, _, path))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pq_codebooks",
      codebooks.map(_.map(_.mkString(",")).mkString("|")).mkString("\n"))
  }

  /** Read a store's persisted codebooks back. */
  private[graft] def readPqCodebooks(spark: org.apache.spark.sql.SparkSession,
                                     path: String): Array[Array[Array[Double]]] =
    graft.sources.Sidecar.readText(spark, path + "/_graft_pq_codebooks")
      .split("\n").map(_.split('|').map(_.split(',').map(java.lang.Double.parseDouble)))

  /** Encode and append one batch as its own `codes/batch_id=` partition
    * under a store's FROZEN codebooks (overwrite-by-batch — replay-safe):
    * the exact per-row layout [[buildPqIndex]] writes, so appended
    * batches are indistinguishable from a one-pass build to every
    * reader, and code ids never drift because the codebooks are frozen. */
  def appendPqBatch(batch: DataFrame, idCol: Column, vecCol: Column,
                    path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val bc = spark.sparkContext.broadcast(readPqCodebooks(spark, path))
    val c0 = batch.select(idCol.as("neighbor_id"), vecCol.as("__cv"))
    // an OPQ store's frozen rotation applies to every appended batch —
    // codes must live in the coordinates the codebooks were trained in
    val c = storeRotation(spark, path).map(rotated(c0, _)).getOrElse(c0)
    c.withColumn("__code", pqEncodeUdf(bc)(col("__cv"))).drop("__cv")
      .write.mode("overwrite").parquet(s"$path/codes/batch_id=$batchId")
  }

  /** Query a [[buildPqIndex]] store: scores the persisted CODES — the
    * original vectors are never read back. */
  def pqTopKIndexed(queries: DataFrame, path: String, queryId: Column,
                    queryVec: Column, k: Int): DataFrame = {
    val spark = queries.sparkSession
    // an OPQ store rotates queries into code coordinates at probe time
    val (q, qv) = storeRotation(spark, path) match {
      case Some(mdl) => (pcaProject(queries, queryVec, mdl, outName = "__rv"),
        col("__rv"))
      case None => (queries, queryVec)
    }
    pqRank(minusTombstones(spark.read.parquet(path + "/codes"), path, "neighbor_id"),
      q, queryId, qv, readPqCodebooks(spark, path), k)
  }

  /**
   * IVF-PQ — the two ANN tiers composed the way a serving system ships
   * them (the FAISS `IVFxx,PQyy` index): the coarse quantizer prunes WHICH
   * rows are scored (each query reads only its `nprobe` cells) and the
   * product quantizer shrinks WHAT is stored per row (m codes instead of
   * dim floats). Codes encode the RESIDUAL v − centroid(cell) — residuals
   * concentrate near zero, so one shared codebook set covers every cell.
   *
   * Scoring is per-cell asymmetric distance: for each (query, probed cell)
   * pair one m×ksub table of ‖(q−c)_s − cb_s‖² sums; the join carries only
   * a table index (the [[pqRank]] lesson), tables travel in one broadcast
   * of nq·nprobe entries.
   *
   * Exactness degenerate for the oracle: `nprobe = nlist` probes every
   * cell and `ksub` ≥ distinct residuals with `iters = 0` makes the
   * codebook lossless, so ADC evaluates ‖(q−c) − (v−c)‖² — the true
   * squared euclidean up to ulp-level rounding of the two residual
   * subtractions (q79's flat-PQ degenerate has the same caveat for its
   * per-subspace grouping). Rankings only flip on near-ties far below
   * real distance gaps; exact-duplicate vectors tie at exactly 0 residual
   * difference and break by neighbor id on both engines. Compressing
   * configs are approximate: recall is spec-asserted, not oracle-checked.
   *
   * Output: (query_id, neighbor_id, rank), self-pairs excluded, ties to
   * the lower neighbor id.
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, corpusId: Column, queryId: Column,
                corpusVec: Column, queryVec: Column, k: Int,
                nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 256,
                iters: Int = 3, sampleN: Int = 4096, seed: Long = 42L): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && m >= 1 && ksub >= 1 && iters >= 0 && k >= 1,
      s"ivfPqTopK: nlist=$nlist nprobe=$nprobe m=$m ksub=$ksub iters=$iters k=$k " +
      "must all be positive (iters >= 0)")
    val spark = corpus.sparkSession
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    val cents = fitCentroids(c, nlist, seed)
    val bcC = spark.sparkContext.broadcast(cents)
    val assigned = c.withColumn("__cell", assignCellUdf(bcC)(col("__cv")))
    // bounded residual sample, id-hash order (the shared training recipe)
    val resSample = assigned.orderBy(xxhash64(col("neighbor_id")))
      .limit(math.max(sampleN, ksub))
      .select(col("__cv"), col("__cell")).collect()
      .map { r =>
        val v = toDoubles(r.getSeq[Float](0)); val ct = cents(r.getInt(1))
        var i = 0
        while (i < v.length) { v(i) -= ct(i); i += 1 }
        v
      }
    require(resSample.nonEmpty, "ivfPqTopK: corpus is empty")
    val codebooks = fitPqCodebooks(resSample, m, ksub, iters)
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val encodeRes = udf { (raw: Seq[Float], cell: Int) =>
      val e = toDoubles(raw); val ct = bcCb.value; val cs = bcC.value(cell)
      var i = 0
      while (i < e.length) { e(i) -= cs(i); i += 1 }
      encodeDoubles(e, ct, PqExactIndex.forCodebooks(bcCb.id, ct))
    }
    val encoded = assigned
      .withColumn("__code", encodeRes(col("__cv"), col("__cell"))).drop("__cv")

    ivfPqRank(encoded, queries, queryId, queryVec, cents, codebooks, nprobe, k)
  }

  /** Shared IVF-PQ query side (live and persisted paths in lockstep):
    * collect the broadcast-small query batch, pick each query's `nprobe`
    * nearest cells, build one ADC table per (query, probed cell) — tables
    * travel in one broadcast, the join carries a table index — then
    * cell-equi join against the encoded corpus and take per-query top-k. */
  private def ivfPqRank(encoded: DataFrame, queries: DataFrame, queryId: Column,
                        queryVec: Column, cents: Array[Array[Double]],
                        codebooks: Array[Array[Array[Double]]],
                        nprobe: Int, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val dim = m * dsub
    val offsets = codebooks.scanLeft(0)(_ + _.length)
    val qBatch = queries.select(queryId.as("query_id"), queryVec.as("__qv")).collect()
    val tables = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val qRows = qBatch.flatMap { r =>
      val qv = toDoubles(r.getSeq[Float](1))
      require(qv.length == dim, s"ivfPq: query dim ${qv.length} != trained dim $dim")
      val probes = cents.indices.map(i => (sqDist(qv, cents(i)), i))
        .sorted.take(nprobe)
      probes.map { case (_, cell) =>
        val res = qv.clone()
        var i = 0
        while (i < res.length) { res(i) -= cents(cell)(i); i += 1 }
        val t = new Array[Double](offsets.last)
        var s = 0
        while (s < m) {
          val cb = codebooks(s)
          val qs = java.util.Arrays.copyOfRange(res, s * dsub, (s + 1) * dsub)
          var j = 0
          while (j < cb.length) { t(offsets(s) + j) = sqDist(qs, cb(j)); j += 1 }
          s += 1
        }
        tables += t
        org.apache.spark.sql.Row(r.get(0), tables.length - 1, cell)
      }
    }
    val qSchema = org.apache.spark.sql.types.StructType(Seq(
      queries.select(queryId.as("query_id")).schema.fields.head,
      org.apache.spark.sql.types.StructField("__qidx",
        org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("__qcell",
        org.apache.spark.sql.types.IntegerType, false)))
    val q = spark.createDataFrame(java.util.Arrays.asList(qRows.toIndexedSeq: _*), qSchema)
    // prune the corpus side to the union of probed cells BEFORE the join —
    // on the persisted path this reaches the parquet reader as a pushed IN
    // over the sorted cell column, so unprobed cells are never read
    val probed = qRows.map(_.getInt(2)).distinct.map(Int.box).toIndexedSeq
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTables = spark.sparkContext.broadcast(tables.toArray)
    val score = udf { (codes: Seq[Int], qidx: Int) =>
      val off = bcOff.value
      val table = bcTables.value(qidx)
      var s = 0; var d = 0.0
      while (s < codes.length) { d += table(off(s) + codes(s)); s += 1 }
      d
    }
    val scored = encoded.filter(col("__cell").isin(probed: _*))
      .join(broadcast(q),
        col("__cell") === col("__qcell") && col("neighbor_id") =!= col("query_id"))
      .withColumn("__pqd", score(col("__code"), col("__qidx")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__pqd"), col("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Persist the IVF-PQ serving tier: coarse-assign + residual-encode the
    * corpus ONCE into (cell, id, codes) parquet range-partitioned and
    * sorted by cell — a query batch then reads only its probed cells of
    * the compressed codes — with centroid + codebook sidecars. Same
    * rebuild-crash contract as every other store. */
  def buildIvfPqIndex(corpus: DataFrame, path: String, corpusId: Column, corpusVec: Column,
                      nlist: Int = 16, m: Int = 8, ksub: Int = 256, iters: Int = 3,
                      sampleN: Int = 4096, seed: Long = 42L,
                      opq: Boolean = false): Unit = {
    val spark = corpus.sparkSession
    graft.sources.Sidecar.invalidateMarker(spark, path)
    dropTombstones(spark, path) // a rebuild starts with a clean slate
    dropOpqSidecars(spark, path)
    val c0 = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    // OPQ composes IN FRONT of both tiers: centroids, residuals, and
    // codebooks all live in the rotated coordinates (queries rotate at
    // probe) — euclidean geometry is unchanged, so cell assignment and
    // the exactness degenerate are preserved
    val rot = if (opq) Some(fitStoreRotation(c0, m, ksub, sampleN, "buildIvfPqIndex"))
              else None
    val c = rot.map(rotated(c0, _)).getOrElse(c0)
    val cents = fitCentroids(c, nlist, seed)
    val bcC = spark.sparkContext.broadcast(cents)
    val assigned = c.withColumn("__cell", assignCellUdf(bcC)(col("__cv")))
    val resSample = assigned.orderBy(xxhash64(col("neighbor_id")))
      .limit(math.max(sampleN, ksub))
      .select(col("__cv"), col("__cell")).collect()
      .map { r =>
        val v = toDoubles(r.getSeq[Float](0)); val ct = cents(r.getInt(1))
        var i = 0
        while (i < v.length) { v(i) -= ct(i); i += 1 }
        v
      }
    require(resSample.nonEmpty, "buildIvfPqIndex: corpus is empty")
    val codebooks = fitPqCodebooks(resSample, m, ksub, iters)
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val encodeRes = udf { (raw: Seq[Float], cell: Int) =>
      val e = toDoubles(raw); val ct = bcCb.value; val cs = bcC.value(cell)
      var i = 0
      while (i < e.length) { e(i) -= cs(i); i += 1 }
      encodeDoubles(e, ct, PqExactIndex.forCodebooks(bcCb.id, ct))
    }
    assigned.withColumn("__code", encodeRes(col("__cv"), col("__cell"))).drop("__cv")
      .repartitionByRange(col("__cell")).sortWithinPartitions(col("__cell"))
      .write.mode("overwrite").parquet(path + "/codes")
    graft.sources.Sidecar.writeText(spark, path + "/_graft_centroids",
      cents.map(_.mkString(",")).mkString("\n"))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pq_codebooks",
      codebooks.map(_.map(_.mkString(",")).mkString("|")).mkString("\n"))
    rot.foreach(writeOpqSidecars(spark, _, path))
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Fit and persist ONLY the IVF-PQ model (coarse centroids + residual
    * codebooks) — the train-once seed for STREAMING ingest
    * ([[appendIvfPqBatch]] / `EventStreams.ingestIvfPqStore`), completing
    * the train/add split across the whole ANN ladder (IVF → PQ →
    * IVF-PQ). Fitting is identical to [[buildIvfPqIndex]]'s (same seed,
    * same bounded sample, residuals against the same centroids); no
    * codes are written and no completion marker is set. */
  def trainIvfPqModel(seedCorpus: DataFrame, path: String, corpusId: Column,
                      corpusVec: Column, nlist: Int = 16, m: Int = 8,
                      ksub: Int = 256, iters: Int = 3, sampleN: Int = 4096,
                      seed: Long = 42L, opq: Boolean = false): Unit = {
    val spark = seedCorpus.sparkSession
    val c0 = seedCorpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
    dropOpqSidecars(spark, path) // no stale rotation under a fresh model
    val rot = if (opq) Some(fitStoreRotation(c0, m, ksub, sampleN, "trainIvfPqModel"))
              else None
    rot.foreach(writeOpqSidecars(spark, _, path))
    val c = rot.map(rotated(c0, _)).getOrElse(c0)
    val cents = fitCentroids(c, nlist, seed)
    val bcC = spark.sparkContext.broadcast(cents)
    val assigned = c.withColumn("__cell", assignCellUdf(bcC)(col("__cv")))
    val resSample = assigned.orderBy(xxhash64(col("neighbor_id")))
      .limit(math.max(sampleN, ksub))
      .select(col("__cv"), col("__cell")).collect()
      .map { r =>
        val v = toDoubles(r.getSeq[Float](0)); val ct = cents(r.getInt(1))
        var i = 0
        while (i < v.length) { v(i) -= ct(i); i += 1 }
        v
      }
    require(resSample.nonEmpty, "trainIvfPqModel: seed corpus is empty")
    val codebooks = fitPqCodebooks(resSample, m, ksub, iters)
    graft.sources.Sidecar.writeText(spark, path + "/_graft_centroids",
      cents.map(_.mkString(",")).mkString("\n"))
    graft.sources.Sidecar.writeText(spark, path + "/_graft_pq_codebooks",
      codebooks.map(_.map(_.mkString(",")).mkString("|")).mkString("\n"))
  }

  /** Encode and append one batch as its own `codes/batch_id=` partition
    * under a store's FROZEN centroids + codebooks (overwrite-by-batch —
    * replay-safe), rows sorted by cell within the partition so probe-time
    * IN filters keep pruning row groups inside every batch. */
  def appendIvfPqBatch(batch: DataFrame, idCol: Column, vecCol: Column,
                       path: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val bcC = spark.sparkContext.broadcast(readCentroids(spark, path))
    val bcCb = spark.sparkContext.broadcast(readPqCodebooks(spark, path))
    val encodeRes = udf { (raw: Seq[Float], cell: Int) =>
      val e = toDoubles(raw); val ct = bcCb.value; val cs = bcC.value(cell)
      var i = 0
      while (i < e.length) { e(i) -= cs(i); i += 1 }
      encodeDoubles(e, ct, PqExactIndex.forCodebooks(bcCb.id, ct))
    }
    val c0 = batch.select(idCol.as("neighbor_id"), vecCol.as("__cv"))
    // an OPQ store's frozen rotation applies before cell assignment too —
    // the centroids were fit in rotated coordinates
    val c = storeRotation(spark, path).map(rotated(c0, _)).getOrElse(c0)
    c.withColumn("__cell", assignCellUdf(bcC)(col("__cv")))
      .withColumn("__code", encodeRes(col("__cv"), col("__cell"))).drop("__cv")
      .sortWithinPartitions(col("__cell"))
      .write.mode("overwrite").parquet(s"$path/codes/batch_id=$batchId")
  }

  /** Query a [[buildIvfPqIndex]] store: probed cells only (pushed IN over
    * the sorted cell column), scored against the stored CODES — original
    * vectors are never read back. `nprobe` ≥ nlist scores every cell. */
  def ivfPqTopKIndexed(queries: DataFrame, path: String, queryId: Column,
                       queryVec: Column, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val cents = graft.sources.Sidecar.readText(spark, path + "/_graft_centroids")
      .split("\n").map(_.split(",").map(java.lang.Double.parseDouble))
    val codebooks: Array[Array[Array[Double]]] =
      graft.sources.Sidecar.readText(spark, path + "/_graft_pq_codebooks")
        .split("\n").map(_.split('|').map(_.split(',').map(java.lang.Double.parseDouble)))
    // an OPQ store rotates queries into code coordinates at probe time
    val (q, qv) = storeRotation(spark, path) match {
      case Some(mdl) => (pcaProject(queries, queryVec, mdl, outName = "__rv"),
        col("__rv"))
      case None => (queries, queryVec)
    }
    ivfPqRank(minusTombstones(spark.read.parquet(path + "/codes"), path, "neighbor_id"),
      q, queryId, qv, cents, codebooks, nprobe, k)
  }

  /**
   * Distributed Lloyd's k-means over the embedding column — corpus
   * clustering for curation passes (cluster-balanced sampling, semantic
   * bucketing before per-bucket dedup).
   *
   * Fully deterministic, so an external oracle can replay it: initial
   * centroids are the k rows with the SMALLEST ids (cluster index = id
   * order), each iteration assigns by squared euclidean distance with ties
   * to the lower cluster id, and the update is the element-wise mean
   * QUANTIZED to a 1e-6 grid (floor(m*1e6 + 0.5)/1e6). The quantization is
   * part of the contract, not cosmetics: a cross-row float mean depends on
   * summation order (Spark partial aggregation vs any external engine's
   * scan order differ in the last ulps), and snapping both sides to the
   * same grid makes every later distance a sequential fold over
   * bit-identical inputs — the same engineering that keeps the cosine
   * oracles hash-exact. A cluster that loses all members drops out;
   * surviving clusters keep their original ids.
   *
   * Scale shape: per iteration one broadcast of the k×dim centroid table
   * out, one map-side-combined groupBy((cluster, dim)) mean back — the
   * driver holds k×dim doubles, never rows. The corpus is scanned
   * `iters + 1` times (cache the input for small corpora); no shuffle ever
   * carries an embedding to another row's task.
   *
   * Output: (id, cluster, dist) — dist is the squared euclidean distance
   * to the final centroid (assignment AFTER the last update).
   */
  def kmeans(df: DataFrame, idCol: Column, vecCol: Column, k: Int,
             iters: Int): DataFrame = {
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(iters >= 0, s"kmeans: iters must be >= 0, got $iters")
    val spark = df.sparkSession
    val v = df.select(idCol.as("id"), vecCol.cast("array<double>").as("__ke"))
    // (clusterId, centroid), ordered by cluster id — the UDF's in-order
    // strict-< scan makes distance ties resolve to the lower id. Collect
    // k+1 to check the determinism contract: a duplicate id inside or at
    // the boundary of the seed window would leave the seed choice to
    // partition arrival order, silently breaking oracle replay.
    val seedRows = v.orderBy(col("id")).limit(k + 1).collect()
    require(seedRows.nonEmpty, "kmeans: input is empty")
    val seedIds = seedRows.map(_.get(0))
    require(seedIds.distinct.length == seedIds.length,
      "kmeans: duplicate ids in the seed window — the k-smallest-ids seed " +
      "rule needs unique ids to stay deterministic; deduplicate or re-key")
    var cents: Array[(Int, Array[Double])] =
      seedRows.take(k).zipWithIndex.map { case (r, i) =>
        val e = r.getSeq[Double](1)
        require(e != null, s"kmeans: null embedding at seed id ${r.get(0)}")
        (i, e.toArray)
      }
    def nearest(bc: org.apache.spark.broadcast.Broadcast[Array[(Int, Array[Double])]]) =
      udf { (raw: Seq[Double]) =>
        // loud-contract guards (the repo rule: garbage in fails the job with
        // a named error, never a silent wrong clustering) + one primitive
        // copy so the hot k×dim loop never boxes through Seq.apply
        require(raw != null, "kmeans: null embedding in corpus")
        val e = raw.toArray
        val cs = bc.value
        require(e.length == cs(0)._2.length,
          s"kmeans: embedding dim ${e.length} != centroid dim ${cs(0)._2.length}")
        var best = cs(0)._1; var bd = Double.MaxValue; var i = 0
        while (i < cs.length) {
          val d = sqDist(e, cs(i)._2)
          if (d < bd) { bd = d; best = cs(i)._1 }
          i += 1
        }
        // all-NaN (or overflow-to-Inf) distances never beat MaxValue — that
        // would silently drop every such row into cluster cs(0)
        require(bd != Double.MaxValue,
          "kmeans: non-finite embedding value (NaN/Inf distance)")
        (best, bd)
      }
    var t = 0
    while (t < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // element-wise mean per cluster: the collect is k×dim rows (the
      // centroid table itself), bounded by construction
      val rows = v.select(nearest(bc)(col("__ke")).getField("_1").as("__kc"),
          posexplode(col("__ke")).as(Seq("__kp", "__kx")))
        .groupBy(col("__kc"), col("__kp")).agg(avg(col("__kx")).as("__km"))
        .collect()
      cents = rows.groupBy(_.getInt(0)).toArray.sortBy(_._1).map { case (c, ps) =>
        val dim = ps.length
        val e = new Array[Double](dim)
        ps.foreach(r => e(r.getInt(1)) = math.floor(r.getDouble(2) * 1e6 + 0.5) / 1e6)
        (c, e)
      }
      t += 1
    }
    val bc = spark.sparkContext.broadcast(cents)
    v.select(col("id"), nearest(bc)(col("__ke")).as("__ka"))
      .select(col("id"), col("__ka._1").as("cluster"), col("__ka._2").as("dist"))
  }

  /**
   * D4-style prototypicality pruning (Tirumala et al. 2023,
   * arXiv:2308.12284 — public method): cluster the corpus with the seeded
   * deterministic [[kmeans]], then within each cluster DROP the rows
   * closest to the centroid — the most prototypical, most redundant
   * examples — keeping the diverse `keepNum/keepDen` tail. The keep rule
   * is [[Pipeline.quantileGate]]'s exact integer per-group rank (distance
   * DESCENDING, ties to the lower id), so the result is deterministic and
   * SQL-replayable; the gate itself is the distributed range-partition
   * rank, never a per-cluster window task.
   *
   * Scale shape: the kmeans passes plus quantileGate's one range shuffle —
   * nothing quadratic anywhere (this is the half of D4 that needs no pair
   * join; compose with [[Dedup.semanticDedup]] for the full recipe).
   *
   * @return kept rows: (id, cluster, dist)
   */
  def prototypePrune(df: DataFrame, idCol: Column, vecCol: Column,
                     k: Int, iters: Int,
                     keepNum: Int, keepDen: Int): DataFrame =
    Pipeline.quantileGate(kmeans(df, idCol, vecCol, k, iters),
      col("cluster"), keepNum, keepDen, col("dist").desc, col("id"))
}
