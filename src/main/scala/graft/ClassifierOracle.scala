package graft

/**
 * DuckDB oracle SQL for the hashed-linear-classifier family
 * (q160/q161/q162) — a faithful full replay of
 * [[graft.operators.Classifier]]'s whole pipeline:
 *
 *   1. whitespace tokens, xxHash64(seed 42) per token via
 *      [[SimhashOracle.hashCtes]] (the house HUGEINT replay of Spark's
 *      XXH64), feature = low 15 bits (`h % 32768` on the unsigned hash ==
 *      the operator's signed `& (dim-1)` mask),
 *   2. seed labels = the q10 quality score at a fixed 700000 cut,
 *   3. per-occurrence feature counts by label, weight
 *      `sign(p−n)·(1e6·|p−n|) // (p+n+1)` (all non-negative divisions, so
 *      DuckDB `//` == Spark `div`),
 *   4. margin = exact BIGINT sum of a document's feature weights.
 */
private[graft] object ClassifierOracle {

  val Dim = 32768
  val Threshold = 700000L

  private def stopListSql: String =
    graft.operators.TextAnalysis.stopwords.mkString("['", "','", "']")

  /** CTE chain ending in __model(feature, n_pos, n_neg, weight_e6) and
    * __feat(doc_id, feature) — per-occurrence rows. */
  private def modelCtes: String =
    s"""${SimhashOracle.hashCtes("(SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)")},
       |__feat AS (SELECT doc_id, (h % $Dim)::BIGINT AS feature FROM __hash),
       |__lab AS (
       |  SELECT doc_id,
       |    (CAST(round(500000.0*len(list_distinct(ws))/len(ws) +
       |       500000.0*(len(ws)-len(list_filter(ws, w -> list_contains($stopListSql, w))))/len(ws)) AS BIGINT)
       |     >= $Threshold) AS lab
       |  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)),
       |__model AS (
       |  SELECT feature,
       |    CAST(count(*) FILTER (WHERE lab) AS BIGINT) AS n_pos,
       |    CAST(count(*) FILTER (WHERE NOT lab) AS BIGINT) AS n_neg,
       |    CAST((CASE WHEN count(*) FILTER (WHERE lab) < count(*) FILTER (WHERE NOT lab) THEN -1 ELSE 1 END)
       |      * ((1000000 * abs(count(*) FILTER (WHERE lab) - count(*) FILTER (WHERE NOT lab)))
       |         // (count(*) + 1)) AS BIGINT) AS weight_e6
       |  FROM __feat JOIN __lab USING (doc_id) GROUP BY feature)""".stripMargin

  /** q160: the trained model table. */
  def trainSql: String =
    s"""WITH $modelCtes
       |SELECT feature, n_pos, n_neg, weight_e6 FROM __model ORDER BY feature""".stripMargin

  private def scoredCte: String =
    s"""$modelCtes,
       |__cal AS (
       |  SELECT CAST(CASE WHEN s < 0 THEN -((-s) // t) ELSE s // t END AS BIGINT) AS mean_e6
       |  FROM (SELECT sum(weight_e6*(n_pos+n_neg)) AS s, sum(n_pos+n_neg) AS t FROM __model)),
       |__scored AS (
       |  SELECT doc_id, CAST(sum(weight_e6) AS BIGINT) AS margin_e6,
       |    CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM __feat JOIN __model USING (feature) GROUP BY doc_id)""".stripMargin

  /** q161: every document's margin + the self-calibrated prediction
    * (mean token polarity ≥ the training corpus's mean, cross-multiplied
    * so the rule is integer-exact; the 1-row __cal cross join is the
    * whitelisted scalar-stat shape). */
  def scoreSql: String =
    s"""WITH $scoredCte
       |SELECT doc_id, margin_e6, n_tokens,
       |  margin_e6 >= (SELECT mean_e6 FROM __cal) * n_tokens AS pred
       |FROM __scored ORDER BY doc_id""".stripMargin

  /** q162: the gate — accepted documents only (scored through the
    * persisted model store; same algebra, so the replay is shared). */
  def gateSql: String =
    s"""WITH $scoredCte
       |SELECT doc_id, margin_e6 FROM __scored
       |WHERE margin_e6 >= (SELECT mean_e6 FROM __cal) * n_tokens ORDER BY doc_id""".stripMargin
}
