package graft.queries

/** DuckDB oracle SQL for [[ExtQueries]] — same determinism contract as
  * [[RefOracles]]: integer arithmetic wherever possible; the one float
  * pipeline (cosine) uses `list_reduce`, DuckDB's sequential left-fold,
  * which is bit-identical to Spark's `aggregate` fold. The MinHash constants
  * are the same literals as ExtQueries.MinhashA/B (interpolated below). */
object ExtOracles {

  private val P = graft.functions.GraftFunctions.IntModulus
  private def lst(xs: Seq[Long]): String = xs.mkString("[", ", ", "]")

  val sql: Map[String, String] = Map(
    "e_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |h AS (SELECT doc_id,
        |  CAST('0x'||substr(md5(text),1,15) AS BIGINT) AS content_hash FROM all_docs)
        |SELECT min(doc_id) AS doc_id, content_hash, count(*) AS n_copies
        |FROM h GROUP BY content_hash ORDER BY doc_id""".stripMargin,

    "e_text_stats" ->
      """WITH t AS (
        |  SELECT doc_id, lang, length(text) AS n_chars,
        |    regexp_split_to_array(trim(text), '\s+') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang, n_chars,
        |    len(toks) AS n_tokens,
        |    len(list_distinct(toks)) AS n_uniq,
        |    len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stop,
        |    list_sum(list_transform(toks, x -> length(x))) AS total_len
        |  FROM t)
        |SELECT doc_id, lang, n_chars, n_tokens, n_uniq, n_stop,
        |  CAST(total_len AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
        |  CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
        |  (n_tokens >= 20 AND n_tokens <= 1000
        |    AND CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.3) AS quality
        |FROM s ORDER BY doc_id""".stripMargin,

    "e_multimodal_cols" ->
      """SELECT d.doc_id,
        |  'text/plain' AS mime,
        |  octet_length(encode(d.text)) AS n_bytes,
        |  d.lang, d.source,
        |  len(e.embedding) AS dim,
        |  CAST(e.embedding[1] AS DOUBLE) AS first_coord,
        |  e.label
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |ORDER BY d.doc_id""".stripMargin,

    "e_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe,
        |    sqrt(list_reduce(list_transform(embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (acc, x) -> acc + x)) AS nq
        |  FROM embeddings WHERE vec_id < 8),
        |c AS (
        |  SELECT vec_id AS cid, embedding AS ce,
        |    sqrt(list_reduce(list_transform(embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (acc, x) -> acc + x)) AS nc
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.qid, c.cid,
        |    list_reduce(list_transform(list_zip(q.qe, c.ce),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)
        |      / (q.nq * c.nc) AS score
        |  FROM q, c WHERE c.cid <> q.qid),
        |ranked AS (
        |  SELECT qid, cid, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rank
        |  FROM scored)
        |SELECT qid, cid, score, rank FROM ranked WHERE rank <= 10
        |ORDER BY qid, rank""".stripMargin,

    "e_minhash_dedup" ->
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    array_to_string((regexp_split_to_array(trim(text), '\\s+'))[6:], ' ') AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM all_docs),
        |th AS (SELECT doc_id, t,
        |  list_transform(t, x -> CAST('0x'||substr(md5(x),1,15) AS BIGINT) % $P) AS h
        |  FROM toks),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) <= 3
        |         THEN [CAST('0x'||substr(md5(array_to_string(t, ' ')),1,15) AS BIGINT) % $P]
        |         ELSE list_transform(range(0, len(t) - 2),
        |                i -> ((h[i+1] * ${ExtQueries.ShingleC(0)}) % $P
        |                    + (h[i+2] * ${ExtQueries.ShingleC(1)}) % $P
        |                    + (h[i+3] * ${ExtQueries.ShingleC(2)}) % $P) % $P) END AS shingles
        |  FROM th),
        |shd AS (SELECT doc_id, list_distinct(shingles) AS ds FROM sh),
        |mh AS (SELECT doc_id,
        |  list_transform(range(0, ${ExtQueries.NumHashes}), i ->
        |    list_min(list_transform(ds,
        |      h -> (${lst(ExtQueries.MinhashA)}[i+1] * h
        |            + ${lst(ExtQueries.MinhashB)}[i+1]) % $P))) AS sig
        |  FROM shd),
        |bands AS (
        |  SELECT doc_id, b,
        |    array_to_string(sig[${ExtQueries.RowsPerBand}*b+1:${ExtQueries.RowsPerBand}*b+${ExtQueries.RowsPerBand}], '-') AS bsig
        |  FROM mh, (SELECT unnest(range(${ExtQueries.NumBands})) AS b)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
        |verified AS (
        |  SELECT c.doc_a, c.doc_b,
        |    len(list_intersect(sa.ds, sb.ds)) AS n_inter,
        |    len(list_distinct(list_concat(sa.ds, sb.ds))) AS n_union
        |  FROM cand c
        |  JOIN shd sa ON sa.doc_id = c.doc_a
        |  JOIN shd sb ON sb.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, n_inter, n_union FROM verified
        |WHERE 2 * n_inter >= n_union
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
