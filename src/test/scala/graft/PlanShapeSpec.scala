package graft

import graft.functions.stf
import graft.operators.{JoinPredicate, Pipeline, SpatialJoin, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape regression guards: the SCALE.md shuffle counts are assertions
 * about physical plans, so pin them — a refactor that silently reintroduces
 * a window re-cluster exchange or a cartesian product fails here, not at
 * 100 TB.
 */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Count data-shuffle Exchange nodes (broadcast exchanges excluded) in
    * the formatted plan: node headers look like "(3) Exchange". */
  private def shuffleCount(df: DataFrame): Int =
    "\\(\\d+\\) Exchange\\b".r
      .findAllIn(df.queryExecution.explainString(FormattedMode)).size

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  // The distributed-rank ops checkpoint their range-partitioned input (ONE
  // exchange, paid inside the eager checkpoint so every downstream action
  // sees the same sampled boundaries); the returned plan therefore reads
  // the materialized RDD with NO further data exchange and NO window.
  test("quantileGate: no post-checkpoint exchange, no window re-cluster") {
    val q = TextAnalysis.withQuality(docs, col("text"))
    val gated = Pipeline.quantileGate(q, col("source"), 1, 4,
      col("quality_e6").desc, col("doc_id"))
    val plan = formatted(gated)
    assert(shuffleCount(gated) == 0, plan)
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("Window"), "no window operator expected")
  }

  test("packSequences: no post-checkpoint exchange, scan not window") {
    val packed = Pipeline.packSequences(docs, col("source"), col("doc_id"),
      length(col("text")), budget = 4096L)
    val plan = formatted(packed)
    assert(shuffleCount(packed) == 0, plan)
    assert(plan.contains("ExistingRDD"), plan)
    assert(!plan.contains("Window"), "no window operator expected")
  }

  test("epochShuffle: no post-checkpoint exchange") {
    val shuffled = Pipeline.epochShuffle(docs, col("doc_id"), "e0")
    val plan = formatted(shuffled)
    assert(shuffleCount(shuffled) == 0, plan)
    assert(plan.contains("ExistingRDD"), plan)
  }

  test("spatial cell join: no cartesian product, no broadcast nested loop") {
    val n = Tables.nationRects(spark, "/root/testdata/sf0.001")
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    val joined = SpatialJoin.join(n, c, col("n_geo"), col("c_geo"),
      JoinPredicate.Contains, cellSize = 100.0)
    val plan = formatted(joined)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("ngramJaccardPairs: doc frequency is groupBy+join, never a shingle-keyed window") {
    // a count(*) over (partition by shingle) funnels a hot shingle's whole
    // posting list into one window task (windows are not AQE-skew-splittable);
    // the only window allowed in the pair plan is the per-document prefix rank
    val sh = operators.Dedup.shingled(docs, col("doc_id"), col("text"), 3)
    val plan = formatted(operators.Dedup.ngramJaccardPlan(sh, 4, 5))
    val windows = "windowspecdefinition\\(__[a-z]+".r.findAllIn(plan).toList
    assert(windows.nonEmpty, "expected the per-document prefix-rank window")
    assert(windows.forall(_.endsWith("__id")),
      s"window keyed on a non-document column (shingle-skew hazard): $windows")
  }

  test("kmeans: final assignment is a pure map — no exchange carries an embedding") {
    // the iteration updates shuffle only (cluster, dim, partial-mean) rows;
    // the RETURNED plan (assignment against the broadcast final centroids)
    // must be exchange-free: a shuffle here would ship every embedding
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = operators.Similarity.kmeans(e, col("vec_id"), col("embedding"),
      k = 2, iters = 1)
    assert(shuffleCount(out) == 0, formatted(out))
  }

  test("chunkTokens: the regex split runs once below the explode, not per chunk") {
    // the token array must be a pinned column under the Generate — a
    // per-chunk slice(split(text)) re-splits the whole document for every
    // chunk row (O(n_tokens²/stride) on long documents)
    val chunked = TextAnalysis.chunkTokens(docs, col("text"), 64, 64)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"), col("chunk_tokens"))
    val plan = formatted(chunked)
    val splits = "split\\(".r.findAllIn(plan).size
    assert(splits == 1, s"expected exactly one split() in the plan, got $splits:\n$plan")
  }

  test("vocabTopK: top-k is TakeOrdered, not a global sort") {
    val v = TextAnalysis.vocabTopK(docs, col("text"), 50)
    assert(formatted(v).contains("TakeOrderedAndProject"), formatted(v))
  }

  test("bm25 live: no explode of the corpus token stream, TakeOrdered top-k") {
    // scoring counts tf inside each row's token array — a Generate here
    // would explode the corpus token stream (corpus-sized shuffle input);
    // the stats row must arrive by broadcast, the top-k by TakeOrdered
    val q = operators.TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"),
      Seq("spark", "hash"), 10)
    val plan = formatted(q)
    assert(!plan.contains("Generate"), s"corpus token explode found:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats row should broadcast:\n$plan")
  }

  test("bm25 store: term filter reaches the postings scan as a pushed filter") {
    val dir = java.nio.file.Files.createTempDirectory("bm25plan").toString
    operators.TextSearch.buildTextIndex(docs, dir, col("doc_id"), col("text"))
    val q = operators.TextSearch.bm25TopKExactIndexed(spark, dir, Seq("spark", "hash"), 10)
    val plan = formatted(q)
    // the postings (and dictionary) scans must push In(term, ...) to parquet
    assert("PushedFilters: \\[.*In\\(term".r.findFirstIn(plan).isDefined,
      s"term IN not pushed to the postings scan:\n$plan")
  }

  test("segmented bm25 store: pushed term IN survives segments and tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("bm25segplan").toString
    operators.TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), dir, batchId = 0L)
    operators.TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
      col("doc_id"), col("text"), dir, batchId = 1L)
    operators.TextSearch.deleteFromTextIndex(
      docs.filter(col("doc_id") % 7 === 3).select(col("doc_id")),
      col("doc_id"), dir, batchId = 0L)
    val q = operators.TextSearch.bm25TopKExactIndexed(spark, dir, Seq("spark", "hash"), 10)
    val plan = formatted(q)
    // the postings scan must still push In(term, ...) to parquet — the
    // tombstone anti-join sits ABOVE the scan, never blocking pushdown
    assert("PushedFilters: \\[.*In\\(term".r.findFirstIn(plan).isDefined,
      s"term IN not pushed to the segmented postings scan:\n$plan")
    assert(plan.contains("LeftAnti"), s"tombstone anti-join missing:\n$plan")
  }

  test("zorder scan: both range predicates push down to the clustered store") {
    val dir = java.nio.file.Files.createTempDirectory("zplan").toString
    operators.ZOrder.write(docs.select(col("doc_id"), col("n_chars")), dir,
      Seq("doc_id", "n_chars"), bits = 12, partitions = 4)
    val q = spark.read.parquet(dir)
      .filter(col("doc_id").between(10, 20) && col("n_chars") > 100)
    val plan = formatted(q)
    assert(plan.contains("GreaterThanOrEqual(doc_id,10)"), plan)
    assert(plan.contains("GreaterThan(n_chars,100)"), plan)
  }

  test("ivfpq store: probed-cell IN filter reaches the codes scan") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("ivfpqplan").toString
    operators.Similarity.buildIvfPqIndex(e, dir, col("vec_id"), col("embedding"),
      nlist = 8, m = 8, ksub = 16, iters = 1, sampleN = 200)
    val q = operators.Similarity.ivfPqTopKIndexed(e.filter(col("vec_id") < 3), dir,
      col("vec_id"), col("embedding"), k = 3, nprobe = 2)
    val plan = formatted(q)
    assert("PushedFilters: \\[.*In\\(__cell".r.findFirstIn(plan).isDefined,
      s"probed-cell IN not pushed to the codes scan:\n$plan")
  }

  test("interval store: bucket-range filters reach both the join and filter scans") {
    import spark.implicits._
    val iv = (0 until 100).map { i => (i.toLong, i * 50L, i * 50L + 120L) }
      .toDF("id", "s", "e")
    val dir = java.nio.file.Files.createTempDirectory("ivstoreplan").toString
    sources.IntervalStore.save(iv, dir, "s", "e", bucket = 100L)
    val joined = sources.IntervalStore.overlapsJoin(
      iv.limit(10).select(col("id").as("qid"), col("s").as("qs"), col("e").as("qe")),
      dir, "qs", "qe")
    val jPlan = formatted(joined)
    assert("PushedFilters: \\[.*GreaterThanOrEqual\\(__tb".r.findFirstIn(jPlan).isDefined,
      s"left bucket range not pushed to the store scan:\n$jPlan")
    val filtered = sources.IntervalStore.filterOverlaps(spark, dir, 200L, 900L)
    val fPlan = formatted(filtered)
    assert("PushedFilters: \\[.*GreaterThanOrEqual\\(__tb".r.findFirstIn(fPlan).isDefined &&
      fPlan.contains("LessThanOrEqual(s,"),
      s"window bounds not pushed to the store scan:\n$fPlan")
    assert(shuffleCount(filtered) == 0, s"single-window filter must not shuffle:\n$fPlan")
  }

  test("dbscan model store: the core-only predicate is pushed to the points scan") {
    import spark.implicits._
    val train = Seq((0L, 0.0, 0.0), (1L, 0.0, 1.0), (2L, 0.0, 2.0))
      .toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("dbscanstoreplan").toString
    operators.DBSCAN.saveModel(
      operators.DBSCAN.model(train, col("id"), col("x"), col("y"), 2.0, 2),
      dir, eps = 2.0, minPts = 2)
    val p = operators.DBSCAN.predictStored(spark, dir,
      Seq((9L, 0.5, 0.5)).toDF("id", "x", "y"), col("id"), col("x"), col("y"))
    val plan = formatted(p)
    assert(plan.contains("EqualTo(is_core,true)"),
      s"is_core pushdown missing from the model scan:\n$plan")
  }

  test("bigram fluency: count joins are shuffle joins on token keys, no token window") {
    val f = TextAnalysis.withBigramFluency(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("fluency_e6"))
    val plan = formatted(f)
    assert(!plan.contains("Window"), s"no window expected in the fluency plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("classifier scoring: dense-broadcast margin sum is a pure map — zero exchange") {
    val model = operators.Classifier.trainFromSeed(docs, col("text"))
    val scored = operators.Classifier.scoreWith(docs, col("text"), model)
    val plan = formatted(scored)
    assert(shuffleCount(scored) == 0, plan)
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }

  test("classifier training: one KEYED exchange, on the dim-bounded feature id") {
    val m = operators.Classifier.train(
      operators.Classifier.withSeedLabel(docs, col("text")),
      col("text"), col("label"))
    val plan = formatted(m)
    // exactly one keyed (hash) exchange — the feature-id aggregation; a
    // RoundRobin spread of the under-partitioned scan (Dedup.spread, r14)
    // is a data-free parallelism fix, not a keyed shuffle, and is allowed
    val keyed = "hashpartitioning".r.findAllIn(plan.toLowerCase).size
    assert(keyed == 1, plan)
    assert(shuffleCount(m) <= 2, plan)
    assert(plan.contains("HashAggregate"), plan) // map-side partial agg
  }

  // ---- coincident-site collapse pins (r9's scale insurance): every
  // DBSCAN-family pair kernel must aggregate points into (site,
  // multiplicity) BEFORE the self-join — a refactor reintroducing the
  // point-level m² join (the pre-r9 shape: 2000 coincident points at one
  // hot venue = 4M pairs per site) fails here, not on a 100 TB run. The
  // walk is structural: every logical Join in the kernel plan must have
  // an Aggregate below BOTH inputs.

  private def everyJoinAboveAggregates(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    val plan = df.queryExecution.optimizedPlan
    def hasAgg(p: LogicalPlan): Boolean =
      p.isInstanceOf[Aggregate] || p.children.exists(hasAgg)
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, s"expected a pair join in the kernel plan:\n$plan")
    joins.foreach { j =>
      assert(hasAgg(j.left) && hasAgg(j.right),
        s"pair join without a site aggregate below both sides (the " +
        s"point-level m² shape):\n$plan")
    }
  }

  test("dbscan 2-d pair kernel: site aggregation below the join, never a point self-join") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    everyJoinAboveAggregates(operators.DBSCAN.sitePairPlan(
      c, col("c_custkey"), col("cx"), col("cy"), eps = 32.0))
  }

  test("dbscan vec pair kernel: site aggregation below the 3^d-halo join") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    everyJoinAboveAggregates(operators.DBSCAN.sitePairPlanVec(
      e, col("vec_id"), col("embedding"), dims = 3, eps = 0.5))
  }

  test("kdist histogram: every join in the returned plan sits above the site collapse") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    everyJoinAboveAggregates(operators.DBSCAN.kDistHistogram(
      c, col("c_custkey"), col("cx"), col("cy"), bucketWidth = 8L, nBuckets = 16))
  }

  test("neighborhood histogram: every join in the returned plan sits above the site collapse") {
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    everyJoinAboveAggregates(operators.DBSCAN.neighborhoodHistogram(
      c, col("c_custkey"), col("cx"), col("cy"), eps = 32.0, bucketWidth = 2L,
      nBuckets = 16))
  }

  test("vector dbscan label expansion joins on the 8-byte site id, never the float array") {
    // r10 verdict note: the point<-site label join used the full <= 4 KB
    // vector as join key (hashed per row). Pin the fix: in every
    // modelVec/modelVecPivot/predictVec(Pivot) plan, the TOPMOST join (the
    // expansion) must not reference any array<float> column in its
    // condition — only long keys.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def topJoinIsIdKeyed(df: DataFrame): Unit = {
      val top = df.queryExecution.optimizedPlan.collectFirst { case j: Join => j }
      assert(top.nonEmpty, "expected an expansion join")
      val vecKeyed = top.get.condition.toSeq.flatMap(_.references)
        .filter(_.dataType match {
          case ArrayType(FloatType, _) => true
          case _ => false
        })
      assert(vecKeyed.isEmpty,
        s"label expansion keys on a float array: $vecKeyed\n${df.queryExecution.optimizedPlan}")
    }
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val mGrid = operators.DBSCAN.modelVec(e, col("vec_id"), col("embedding"),
      dims = 3, eps = 0.5, minPts = 3)
    val mPivot = operators.DBSCAN.modelVecPivot(e, col("vec_id"),
      col("embedding"), dims = 16, eps = 1.2, minPts = 3, numPivots = 4)
    topJoinIsIdKeyed(mGrid)
    topJoinIsIdKeyed(mPivot)
    topJoinIsIdKeyed(operators.DBSCAN.predictVec(mGrid, e, col("vec_id"),
      col("embedding"), dims = 3, eps = 0.5))
    topJoinIsIdKeyed(operators.DBSCAN.predictVecPivot(mPivot, e, col("vec_id"),
      col("embedding"), dims = 16, eps = 1.2, numPivots = 4))
  }

  test("knnJoin: duplicate-heavy left activates the site collapse; distinct left does not") {
    import spark.implicits._
    // 4500 rows over 3 distinct geometries (>25% dups, >= 4096 rows)
    val left = spark.range(4500)
      .select(col("id").as("lid"),
        stf.st_point((col("id") % 3).cast("double") * 100.0,
                     (col("id") % 3).cast("double") * 100.0).as("lgeo"))
    val right = spark.range(50)
      .select(col("id").as("rid"),
        stf.st_point(col("id").cast("double") * 7.0,
                     col("id").cast("double") * 11.0).as("rgeo"))
    val collapsed = operators.KNN.knnJoin(left, right, "lgeo", "rgeo", "lid",
      k = 3, tieBreak = "rid")
    // the returned plan is the geometry-keyed expansion join over the
    // per-site answers — its marker column is the collapse's signature
    assert(formatted(collapsed).contains("__knn_sgeo"),
      s"collapse gate did not fire on a 3-site 4500-row left:\n${formatted(collapsed)}")
    val distinctLeft = spark.range(100)
      .select(col("id").as("lid"),
        stf.st_point(col("id").cast("double"), col("id").cast("double")).as("lgeo"))
    val plain = operators.KNN.knnJoin(distinctLeft, right, "lgeo", "rgeo", "lid",
      k = 3, tieBreak = "rid")
    assert(!formatted(plain).contains("__knn_sgeo"),
      "collapse gate fired on an all-distinct small left")
  }

  test("quantile histogram: one sketch-sized exchange; percentile decode joins nothing") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val h = operators.Sketches.histCounts(ev, col("event_type"),
      round(col("value") * 1e6).cast("long"))
    assert(shuffleCount(h) == 1, formatted(h))
    val qs = operators.Sketches.histQuantiles(h, Seq(50, 99))
    val plan = formatted(qs)
    // windows + explode + rank filter all ride the single group clustering:
    // counts shuffle (1) + window re-cluster by group (1); no join at all
    assert(shuffleCount(qs) <= 2, plan)
    assert(!plan.contains("Join"), plan)
  }
}
