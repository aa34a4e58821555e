package graft

/**
 * Generates the DuckDB oracle SQL for `q114_dsir_select` — a faithful SQL
 * replay of [[graft.operators.Pipeline.dsirSelect]]:
 *
 *   1. features = whitespace unigrams ++ space-joined bigrams, per
 *      document (multiplicity kept),
 *   2. xxHash64(seed=42) of each feature's UTF-8 bytes via the shared
 *      [[SimhashOracle.hashCtes]] chain, bucketed by `h % buckets`
 *      (buckets is a power of two, so the unsigned mod equals Spark's
 *      pmod over the signed hash),
 *   3. add-one-smoothed target/raw bucket distributions, fixed-point
 *      ratio_e6 = (T+1)(RR+B) * 1e6 // ((R+1)(TT+B)),
 *   4. per-document score = sum of its feature instances' ratios,
 *   5. top-n by (score desc, doc_id).
 *
 * The target corpus is the `documents` subset satisfying `targetWhere`;
 * the raw corpus is all of `documents` (matching the registered query).
 * All arithmetic is integer; counts stay far below int64 at oracle scale.
 */
private[graft] object DsirOracle {

  /** `rawWhere` restricts the RAW corpus (and therefore the scored set —
    * both ride the same feature table), for the post-takedown replays. */
  def sql(buckets: Int, n: Int, targetWhere: String,
          rawWhere: String = "TRUE"): String = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a positive power of two, got $buckets")
    val feats =
      s"""(SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        | WHERE $rawWhere
        | UNION ALL
        | SELECT doc_id,
        |   unnest(list_transform(range(1, len(ws)), __bi -> ws[__bi] || ' ' || ws[__bi+1])) AS t
        | FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |       WHERE $rawWhere))""".stripMargin
    s"""WITH ${SimhashOracle.hashCtes(feats)},
       |__feat AS (SELECT doc_id, (h % $buckets)::BIGINT AS b FROM __hash),
       |__tot AS (SELECT
       |    (SELECT count(*) FROM __feat JOIN documents USING (doc_id) WHERE $targetWhere) AS tt,
       |    (SELECT count(*) FROM __feat) AS rr),
       |__t AS (SELECT b, count(*) AS t FROM __feat JOIN documents USING (doc_id)
       |        WHERE $targetWhere GROUP BY b),
       |__r AS (SELECT b, count(*) AS r FROM __feat GROUP BY b),
       |__ratio AS (SELECT __r.b AS b,
       |    ((COALESCE(__t.t, 0) + 1) * (rr + $buckets) * 1000000)
       |      // ((__r.r + 1) * (tt + $buckets)) AS ratio_e6
       |  FROM __r LEFT JOIN __t ON __r.b = __t.b CROSS JOIN __tot),
       |__score AS (SELECT f.doc_id, sum(ratio_e6)::BIGINT AS dsir_score_e6
       |  FROM __feat f JOIN __ratio USING (b) GROUP BY f.doc_id)
       |SELECT doc_id, dsir_score_e6 FROM __score
       |ORDER BY dsir_score_e6 DESC, doc_id LIMIT $n""".stripMargin
  }
}
