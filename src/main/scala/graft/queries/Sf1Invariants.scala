package graft.queries

/** Engine-independent INVARIANT oracles for the sf1 tier's
  * exhaustive-pairwise queries (round-8 verdict task 4).
  *
  * At the sf0.01 gate these nine queries are value-checked against
  * their full DuckDB oracles; at sf1 those oracles are quadratic
  * (exhaustive pairwise jaccard) and infeasible, so the tier recorded
  * them `rows_only`. The checks here are LINEAR (or output-sized) and
  * upgrade each to a value-verified record:
  *
  *  - pair-list queries (q13/q38/q46/q92/q436): structural checks
  *    (canonical form, no duplicates, threshold respected), EXACT
  *    value recompute of a deterministic 200-pair sample (tokenizing
  *    the corpus is linear; only all-pairs intersection is quadratic),
  *    and exact-duplicate COMPLETENESS (identical-text doc pairs are
  *    jaccard-1 pairs and must all be present — a one-sided recall
  *    witness computed from a linear text self-join).
  *  - closure queries (q53/q176/q325/q328): their expected output is
  *    an EXACT function of a pair artifact this same run produced and
  *    verified (q13's pairs for q53/q176; q436's for q325/q328) — the
  *    recursive closure / argmax / split algebra is cheap in DuckDB,
  *    so the full expected frame is re-derived from the verified pair
  *    parquet and compared with EXCEPT in both directions.
  *  - q44 (curation): linear gate invariants — kept ⊆ corpus with
  *    matching lang/source, token floor respected, no identical-text
  *    survivors, and no verified near-dup pair with BOTH endpoints
  *    kept. (The decontamination stage's absence property stays
  *    gate-scale-only: its witness is itself pairwise.)
  *
  * Contract: each SQL returns ZERO rows when all invariants hold;
  * every returned row is (chk, n) naming a violated invariant.
  * Placeholders: `{OUT}` = this query's output parquet glob,
  * `{ROOT}` = the Verify output root (for cross-artifact reads).
  * Consumed by `scripts/check_sf1_run.py` via Verify's
  * `sf1_invariants.json` dump.
  */
object Sf1Invariants {

  /** corpus + tokens + 3-gram shingle sets (the q13 kernel); optional
    * long-doc restriction (q38's envelope).
    */
  private def shingleCtes(longDocsOnly: Boolean): String = {
    val filt = if (longDocsOnly) "\n  WHERE len(toks) >= 50" else ""
    s"""corpus AS (${ExtQueries.nearDupCorpusSql}),
       |tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
       |    '[^a-z0-9]+'), t -> len(t)>0) AS toks FROM corpus),
       |sh AS (SELECT doc_id, ${ExtQueries.shinglesSql} AS sh FROM tok$filt),
       |eligible AS (SELECT c.doc_id, c.text FROM corpus c
       |  JOIN sh s ON s.doc_id = c.doc_id WHERE len(s.sh) > 0)""".stripMargin
  }

  /** Pair-list invariant: canonical form, dedup, threshold, sampled
    * exact jaccard, exact-dup completeness.
    */
  private def jaccardPairs(longDocsOnly: Boolean): String =
    s"""WITH ${shingleCtes(longDocsOnly)},
       |res AS (SELECT id_a, id_b, jaccard FROM '{OUT}'),
       |samp AS (SELECT id_a, id_b, jaccard FROM res
       |  ORDER BY (id_a * 2654435761 + id_b) % 1000003, id_a, id_b
       |  LIMIT 200),
       |sampval AS (SELECT s.id_a, s.id_b, s.jaccard,
       |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
       |      (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
       |      6) AS truth
       |  FROM samp s JOIN sh a ON a.doc_id = s.id_a
       |              JOIN sh b ON b.doc_id = s.id_b),
       |exact AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM eligible a JOIN eligible b
       |    ON a.text = b.text AND a.doc_id < b.doc_id)
       |SELECT 'not_canonical' AS chk, count(*) AS n FROM res
       |  WHERE id_a >= id_b HAVING count(*) > 0
       |UNION ALL SELECT 'duplicate_rows', count(*) FROM
       |  (SELECT id_a, id_b FROM res GROUP BY 1, 2 HAVING count(*) > 1)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'below_threshold', count(*) FROM res
       |  WHERE jaccard < 0.8 HAVING count(*) > 0
       |UNION ALL SELECT 'sample_not_resolvable',
       |  (SELECT count(*) FROM samp) - count(*) FROM sampval
       |  HAVING count(*) < (SELECT count(*) FROM samp)
       |UNION ALL SELECT 'sample_value_mismatch', count(*) FROM sampval
       |  WHERE truth IS DISTINCT FROM jaccard HAVING count(*) > 0
       |UNION ALL SELECT 'exact_dup_pair_missing', count(*)
       |  FROM exact e LEFT JOIN res r
       |    ON r.id_a = e.id_a AND r.id_b = e.id_b
       |  WHERE r.id_a IS NULL HAVING count(*) > 0""".stripMargin

  /** q436's twin on 5-gram shingles at τ = 0.6, with inter/na/nb also
    * sample-verified.
    */
  private val dupPairs5g: String =
    s"""WITH corpus AS (${ExtQueries.nearDupCorpusSql}),
       |tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text),
       |    '[^a-z0-9]+'), t -> len(t)>0) AS toks FROM corpus),
       |sh AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+4], ' ')
       |    for i in range(1, greatest(len(toks)-4, 1)+1)]) AS sh FROM tok),
       |eligible AS (SELECT c.doc_id, c.text FROM corpus c
       |  JOIN sh s ON s.doc_id = c.doc_id WHERE len(s.sh) > 0),
       |res AS (SELECT id_a, id_b, inter, na, nb, jaccard FROM '{OUT}'),
       |samp AS (SELECT * FROM res
       |  ORDER BY (id_a * 2654435761 + id_b) % 1000003, id_a, id_b
       |  LIMIT 200),
       |sampval AS (SELECT s.*,
       |    len(list_intersect(a.sh, b.sh))::BIGINT AS t_inter,
       |    len(a.sh)::BIGINT AS t_na, len(b.sh)::BIGINT AS t_nb
       |  FROM samp s JOIN sh a ON a.doc_id = s.id_a
       |              JOIN sh b ON b.doc_id = s.id_b),
       |exact AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM eligible a JOIN eligible b
       |    ON a.text = b.text AND a.doc_id < b.doc_id)
       |SELECT 'not_canonical' AS chk, count(*) AS n FROM res
       |  WHERE id_a >= id_b HAVING count(*) > 0
       |UNION ALL SELECT 'duplicate_rows', count(*) FROM
       |  (SELECT id_a, id_b FROM res GROUP BY 1, 2 HAVING count(*) > 1)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'below_threshold', count(*) FROM res
       |  WHERE 5 * inter < 3 * (na + nb - inter) HAVING count(*) > 0
       |UNION ALL SELECT 'sample_not_resolvable',
       |  (SELECT count(*) FROM samp) - count(*) FROM sampval
       |  HAVING count(*) < (SELECT count(*) FROM samp)
       |UNION ALL SELECT 'sample_value_mismatch', count(*) FROM sampval
       |  WHERE t_inter <> inter OR t_na <> na OR t_nb <> nb
       |     OR round(t_inter::DOUBLE / (t_na + t_nb - t_inter), 6)
       |        IS DISTINCT FROM jaccard
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'exact_dup_pair_missing', count(*)
       |  FROM exact e LEFT JOIN res r
       |    ON r.id_a = e.id_a AND r.id_b = e.id_b
       |  WHERE r.id_a IS NULL HAVING count(*) > 0""".stripMargin

  /** q92's asymmetric containment twin: directed pairs, τ = 0.9,
    * sampled exact recompute, identical-text pairs present BOTH ways.
    */
  private val containmentPairs: String =
    s"""WITH ${shingleCtes(longDocsOnly = false)},
       |res AS (SELECT id_a, id_b, containment FROM '{OUT}'),
       |samp AS (SELECT * FROM res
       |  ORDER BY (id_a * 2654435761 + id_b) % 1000003, id_a, id_b
       |  LIMIT 200),
       |sampval AS (SELECT s.*,
       |    round(len(list_intersect(a.sh, b.sh))::DOUBLE / len(a.sh), 6)
       |      AS truth
       |  FROM samp s JOIN sh a ON a.doc_id = s.id_a
       |              JOIN sh b ON b.doc_id = s.id_b),
       |exact AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM eligible a JOIN eligible b
       |    ON a.text = b.text AND a.doc_id <> b.doc_id)
       |SELECT 'self_pair' AS chk, count(*) AS n FROM res
       |  WHERE id_a = id_b HAVING count(*) > 0
       |UNION ALL SELECT 'duplicate_rows', count(*) FROM
       |  (SELECT id_a, id_b FROM res GROUP BY 1, 2 HAVING count(*) > 1)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'below_threshold', count(*) FROM res
       |  WHERE containment < 0.9 HAVING count(*) > 0
       |UNION ALL SELECT 'sample_not_resolvable',
       |  (SELECT count(*) FROM samp) - count(*) FROM sampval
       |  HAVING count(*) < (SELECT count(*) FROM samp)
       |UNION ALL SELECT 'sample_value_mismatch', count(*) FROM sampval
       |  WHERE truth IS DISTINCT FROM containment HAVING count(*) > 0
       |UNION ALL SELECT 'exact_dup_pair_missing', count(*)
       |  FROM exact e LEFT JOIN res r
       |    ON r.id_a = e.id_a AND r.id_b = e.id_b
       |  WHERE r.id_a IS NULL HAVING count(*) > 0""".stripMargin

  /** q53/q176: components must be consistent with the verified q13
    * pair artifact — label is the min member, members are exactly the
    * pair endpoints, no pair straddles two components. (Over-merge of
    * two truly disconnected clusters is the one defect this cannot
    * see; under-merge, membership drift and label drift are all
    * caught.)
    */
  private val componentsVsQ13: String =
    """WITH res AS (SELECT id, component FROM '{OUT}'),
      |p AS (SELECT id_a, id_b FROM '{ROOT}/q13_minhash_neardup/*.parquet'),
      |m AS (SELECT DISTINCT id FROM
      |  (SELECT id_a AS id FROM p UNION ALL SELECT id_b AS id FROM p))
      |SELECT 'label_not_min_member' AS chk, count(*) AS n FROM
      |  (SELECT component FROM res GROUP BY component
      |   HAVING min(id) <> component) HAVING count(*) > 0
      |UNION ALL SELECT 'duplicate_ids', count(*) FROM
      |  (SELECT id FROM res GROUP BY id HAVING count(*) > 1)
      |  HAVING count(*) > 0
      |UNION ALL SELECT 'pair_across_components', count(*)
      |  FROM p JOIN res a ON a.id = p.id_a JOIN res b ON b.id = p.id_b
      |  WHERE a.component <> b.component HAVING count(*) > 0
      |UNION ALL SELECT 'pair_member_missing', count(*)
      |  FROM m LEFT JOIN res r ON r.id = m.id WHERE r.id IS NULL
      |  HAVING count(*) > 0
      |UNION ALL SELECT 'member_without_pair', count(*)
      |  FROM res r LEFT JOIN m ON m.id = r.id WHERE m.id IS NULL
      |  HAVING count(*) > 0""".stripMargin

  /** Closure + quality CTEs over the VERIFIED q436 pair parquet — the
    * shared front half of the q325/q328 full-recompute checks.
    */
  private val compFromQ436: String =
    s"""p AS (SELECT id_a, id_b FROM '{ROOT}/q436_dup_pairs/*.parquet'),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |          UNION ALL SELECT id_b, id_a FROM p),
       |reach(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e2.dst, r.label FROM reach r JOIN edges e2 ON e2.src = r.id),
       |comp AS (SELECT id, min(label) AS component FROM reach GROUP BY id)""".stripMargin

  /** q325: full expected recompute (closure over q436 pairs + the
    * quantized logistic quality argmax) compared exactly both ways.
    */
  private val canonicalDedupFull: String =
    s"""WITH RECURSIVE corpus AS (${ExtQueries.nearDupCorpusSql}),
       |$compFromQ436,
       |${Wave43Queries.qualSql},
       |j AS (SELECT c.id, c.component, q.qq
       |  FROM comp c JOIN qual q ON q.doc_id = c.id),
       |ranked AS (SELECT id, component, qq,
       |    row_number() OVER (PARTITION BY component
       |      ORDER BY qq DESC, id) AS rk,
       |    CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS csize
       |  FROM j),
       |expected AS (SELECT component, csize, id AS kept_doc,
       |    round(CAST(qq AS DOUBLE) / 1000000.0e0, 6) AS kept_q
       |  FROM ranked WHERE rk = 1),
       |res AS (SELECT component, csize, kept_doc, kept_q FROM '{OUT}')
       |SELECT 'missing_expected' AS chk, count(*) AS n FROM
       |  (SELECT * FROM expected EXCEPT SELECT * FROM res)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'unexpected_rows', count(*) FROM
       |  (SELECT * FROM res EXCEPT SELECT * FROM expected)
       |  HAVING count(*) > 0""".stripMargin

  /** q328: full expected recompute of the unit split + crossing-pair
    * audit from the q436 pairs; also asserts the leakage property
    * itself (cross_pairs = 0).
    */
  private val leakageSplitFull: String =
    s"""WITH RECURSIVE corpus AS (${ExtQueries.nearDupCorpusSql}),
       |$compFromQ436,
       |assign AS (SELECT c.doc_id,
       |    coalesce(cp.component, c.doc_id) AS unit,
       |    CASE WHEN substr(md5(coalesce(cp.component, c.doc_id)::VARCHAR),
       |        1, 1) < 'd' THEN 'train' ELSE 'eval' END AS split
       |  FROM (SELECT doc_id FROM corpus) c
       |  LEFT JOIN comp cp ON cp.id = c.doc_id),
       |crossp AS (SELECT CAST(coalesce(sum(CASE WHEN a.split <> b.split
       |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS cross_pairs
       |  FROM p JOIN assign a ON a.doc_id = p.id_a
       |         JOIN assign b ON b.doc_id = p.id_b),
       |expected AS (SELECT split,
       |    CAST(count(DISTINCT unit) AS BIGINT) AS n_units,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    (SELECT cross_pairs FROM crossp) AS cross_pairs
       |  FROM assign GROUP BY split),
       |res AS (SELECT split, n_units, n_docs, cross_pairs FROM '{OUT}')
       |SELECT 'missing_expected' AS chk, count(*) AS n FROM
       |  (SELECT * FROM expected EXCEPT SELECT * FROM res)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'unexpected_rows', count(*) FROM
       |  (SELECT * FROM res EXCEPT SELECT * FROM expected)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'leakage_nonzero', count(*) FROM res
       |  WHERE cross_pairs <> 0 HAVING count(*) > 0""".stripMargin

  /** q44: linear curation-gate invariants (see object scaladoc). */
  private val curationGates: String =
    s"""WITH corp AS (SELECT * FROM (
       |    SELECT doc_id, text, lang, source FROM documents
       |    UNION ALL
       |    SELECT doc_id + 1000000 AS doc_id,
       |      array_to_string(toks[1:greatest(len(toks)-2,1)], ' ') AS text,
       |      lang, source
       |    FROM (SELECT doc_id, lang, source,
       |            list_filter(string_split_regex(lower(text),'[^a-z0-9]+'),
       |                        t -> len(t)>0) AS toks
       |          FROM documents WHERE doc_id % 10 = 0))
       |  WHERE doc_id % 17 <> 0),
       |res AS (SELECT doc_id, lang, source FROM '{OUT}'),
       |kept AS (SELECT r.doc_id, r.lang, r.source, c.text,
       |    len(list_filter(string_split_regex(lower(c.text),'[^a-z0-9]+'),
       |        t -> len(t)>0)) AS ntok
       |  FROM res r JOIN corp c ON c.doc_id = r.doc_id),
       |p AS (SELECT id_a, id_b FROM '{ROOT}/q13_minhash_neardup/*.parquet')
       |SELECT 'kept_not_in_corpus' AS chk, count(*) AS n
       |  FROM res r LEFT JOIN corp c ON c.doc_id = r.doc_id
       |    AND c.lang IS NOT DISTINCT FROM r.lang
       |    AND c.source IS NOT DISTINCT FROM r.source
       |  WHERE c.doc_id IS NULL HAVING count(*) > 0
       |UNION ALL SELECT 'kept_below_token_floor', count(*) FROM kept
       |  WHERE ntok < 10 HAVING count(*) > 0
       |UNION ALL SELECT 'identical_text_kept_twice', count(*) FROM
       |  (SELECT text FROM kept GROUP BY text HAVING count(*) > 1)
       |  HAVING count(*) > 0
       |UNION ALL SELECT 'neardup_pair_both_kept', count(*)
       |  FROM p JOIN res a ON a.doc_id = p.id_a
       |         JOIN res b ON b.doc_id = p.id_b
       |  HAVING count(*) > 0""".stripMargin

  /** Query name → violation SQL (zero rows = all invariants hold). */
  val sql: Map[String, String] = Map(
    "q13_minhash_neardup" -> jaccardPairs(longDocsOnly = false),
    "q46_hybrid_neardup" -> jaccardPairs(longDocsOnly = false),
    "q38_simhash_neardup" -> jaccardPairs(longDocsOnly = true),
    "q92_containment" -> containmentPairs,
    "q436_dup_pairs" -> dupPairs5g,
    "q53_dup_components" -> componentsVsQ13,
    "q176_cc_star" -> componentsVsQ13,
    "q325_canonical_dedup" -> canonicalDedupFull,
    "q328_leakage_split" -> leakageSplitFull,
    "q44_curation" -> curationGates)
}
