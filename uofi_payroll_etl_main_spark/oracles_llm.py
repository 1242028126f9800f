r"""DuckDB oracles for the exact LLM/windowed operators.

No oracle entries for: llm_minhash_lsh, llm_simhash, llm_ann_lsh
(approximate -- validated by recall tests against the exact tiers),
mm_features / mm_frame_sample (Pandas-UDF plumbing -- rows-only).
"""

_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

# Shared word-5-gram CTE pair (toks, g): per-doc DISTINCT 5-grams with
# the short-doc full-token fallback, mirroring llm.dedup.word_shingles.
# ONE definition so the per-operator and composed (c4/dataset-card)
# oracles can never silently diverge on tokenization.
_GRAMS5 = f"""toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), g AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                            i -> array_to_string(t[i:i+4], ' '))
                        ELSE [array_to_string(t, ' ')] END
                 )) AS gram
          FROM toks
        )"""


def _gopher_cte(w: str, m: str, carry: str = "") -> str:
    """Gopher metric CTE pair ({w}: tokenized words+lines, {m}: the
    per-doc rule metrics).  `carry` is a comma-suffixed column list
    (e.g. "doc_id," or "doc_id, source,") threaded through both CTEs.
    One definition keeps the four gopher-consuming oracles (rules,
    report, c4 funnel, dataset card) threshold-identical forever."""
    return f"""{w} AS (
          SELECT {carry}
                 CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                      ELSE regexp_split_to_array(trim(text), '\\s+') END AS words,
                 string_split(text, chr(10)) AS lines
          FROM documents
        ), {m} AS (
          SELECT {carry}
                 CAST(len(words) AS BIGINT) AS n_words,
                 CASE WHEN len(words) > 0 THEN
                   round(CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
                         / len(words), 6) ELSE 0.0 END AS mean_word_len,
                 CASE WHEN len(words) > 0 THEN
                   round(CAST(len(list_filter(words, x ->
                     contains(x, '#') OR contains(x, '...') OR contains(x, chr(8230))))
                     AS DOUBLE) / len(words), 6) ELSE 0.0 END AS symbol_ratio,
                 round(CAST(len(list_filter(lines, l ->
                   starts_with(l, '-') OR starts_with(l, '*') OR starts_with(l, chr(8226))))
                   AS DOUBLE) / len(lines), 6) AS bullet_line_frac,
                 round(CAST(len(list_filter(lines, l ->
                   ends_with(l, '...') OR ends_with(l, chr(8230))))
                   AS DOUBLE) / len(lines), 6) AS ellipsis_line_frac,
                 CASE WHEN len(words) > 0 THEN
                   round(CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))
                     AS DOUBLE) / len(words), 6) ELSE 0.0 END AS alpha_word_frac,
                 CAST(len(list_intersect(list_transform(words, x -> lower(x)),
                   ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
          FROM {w}
        )"""


# The keep predicate at the corpus-adapted min_stop_hits=1 setting.
_GOPHER_KEEP = """n_words >= 30 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND symbol_ratio <= 0.1
                AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
                AND alpha_word_frac >= 0.8 AND stop_hits >= 1"""


# Word 3-gram distinct shingles in DuckDB list algebra; mirrors
# llm.dedup.word_shingles (short docs fall back to the full token string).
_SHINGLES = rf"""
  WITH toks AS (
    SELECT doc_id,
           CASE WHEN length({_NORM}) = 0 THEN []
                ELSE string_split({_NORM}, ' ') END AS t
    FROM documents
  ), sh AS (
    SELECT doc_id,
           list_distinct(
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE [array_to_string(t, ' ')] END
           ) AS shingles
    FROM toks
  ), ex AS (
    SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
  )
"""

# Connected-component CTE over the 0.4-Jaccard edge list (shared by
# llm_dup_clusters and llm_near_dedup_corpus): cc enumerates every
# (node, reachable-label) pair; UNION dedups, so it terminates.
_CC_CTE = rf"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN []
                  ELSE string_split({_NORM}, ' ') END AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [array_to_string(t, ' ')] END
             ) AS shingles
      FROM toks
    ), ex AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle FROM sh
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)) >= 0.4
    ), bidir AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ), cc AS (
      SELECT doc_id AS node, doc_id AS label FROM documents
      UNION
      SELECT bd.b, cc.label FROM cc JOIN bidir bd ON cc.node = bd.a
    )
"""

LLM_ORACLES: dict[str, str] = {
    "llm_rep_signals": f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), grams AS (
          SELECT doc_id, n,
                 unnest(list_transform(range(1, greatest(len(t) - n + 2, 1)),
                        i -> array_to_string(t[i:i+n-1], ' '))) AS gram
          FROM toks, (VALUES (2), (3)) ns(n)
        ), counted AS (
          SELECT doc_id, n, gram, count(*) AS cnt
          FROM grams GROUP BY doc_id, n, gram
        ), per AS (
          SELECT doc_id, n, sum(cnt * length(gram)) AS tot,
                 sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END) AS dup
          FROM counted GROUP BY doc_id, n
        )
        SELECT d.doc_id,
               coalesce(max(CASE WHEN p.n = 2 THEN CAST(p.dup AS DOUBLE) / p.tot END), 0.0) AS rep_2gram_frac,
               coalesce(max(CASE WHEN p.n = 3 THEN CAST(p.dup AS DOUBLE) / p.tot END), 0.0) AS rep_3gram_frac
        FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
        GROUP BY d.doc_id
    """,
    "llm_line_dedup": f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), lined AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(len(t) + 1, 1), 3),
                        i -> array_to_string(t[i:i+2], ' ')) AS lines
          FROM toks
        ), occ AS (
          SELECT doc_id, unnest(lines) AS line,
                 unnest(range(1, len(lines) + 1)) AS lno
          FROM lined
        ), marked AS (
          SELECT doc_id, line, lno,
                 count(*) OVER (PARTITION BY line) AS cnt,
                 row_number() OVER (PARTITION BY line ORDER BY doc_id, lno) AS rk
          FROM occ
        ), kept AS (
          SELECT * FROM marked WHERE cnt <= 2 OR rk = 1
        ), reb AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY lno) AS text,
                 count(*) AS kept_n
          FROM kept GROUP BY doc_id
        )
        SELECT l.doc_id, coalesce(reb.text, '') AS text,
               CAST(len(l.lines) AS BIGINT) AS n_lines,
               CAST(len(l.lines) - coalesce(reb.kept_n, 0) AS BIGINT) AS n_dropped
        FROM lined l LEFT JOIN reb ON l.doc_id = reb.doc_id
    """,
    "llm_oov_rate": f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), ex AS (
          SELECT doc_id, unnest(t) AS tok FROM toks
        ), vocab AS (
          SELECT tok FROM (
            SELECT tok, count(*) AS c FROM ex GROUP BY tok
            ORDER BY c DESC, tok ASC LIMIT 16
          )
        ), per AS (
          SELECT e.doc_id, count(*) AS n,
                 sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS oov
          FROM ex e LEFT JOIN vocab v ON e.tok = v.tok
          GROUP BY e.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(per.n, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(per.oov, 0) AS BIGINT) AS n_oov,
               CASE WHEN coalesce(per.n, 0) > 0
                    THEN CAST(per.oov AS DOUBLE) / per.n ELSE 0.0 END AS oov_frac
        FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
    "llm_importance_sample": """
        SELECT doc_id, text, lang, source, n_chars
        FROM documents
        WHERE ((doc_id % 2147483648) * 2654435761 + 12345) % 1000000
              < least(CAST(1000000 AS BIGINT), CAST(n_chars AS BIGINT) * 1500)
    """,
    "llm_exact_dedup": """
        SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS n_dups
        FROM documents GROUP BY text
    """,
    "llm_fingerprint_dedup": f"""
        SELECT md5({_NORM}) AS fingerprint, min(doc_id) AS keeper_id, count(*) AS n_dups
        FROM documents GROUP BY md5({_NORM})
    """,
    "llm_jaccard_pairs": _SHINGLES
    + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
               count(*) / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)) AS jaccard
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)) >= 0.4
    """,
    "llm_substring_search": """
        SELECT doc_id, lang, source, n_chars
        FROM documents WHERE contains(text, 'fast merge')
    """,
    "llm_jaccard_prefix": _SHINGLES
    + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
               count(*) / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)) AS jaccard
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) / (any_value(a.n_sh) + any_value(b.n_sh) - count(*)) >= 0.4
    """,
    "llm_containment_pairs": _SHINGLES
    + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
               count(*) / any_value(a.n_sh) AS cont_a,
               count(*) / any_value(b.n_sh) AS cont_b,
               count(*) / least(any_value(a.n_sh), any_value(b.n_sh)) AS containment
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) / least(any_value(a.n_sh), any_value(b.n_sh)) >= 0.6
    """,
    "llm_containment_prefix": _SHINGLES
    + """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter,
               count(*) / any_value(a.n_sh) AS cont_a,
               count(*) / any_value(b.n_sh) AS cont_b,
               count(*) / least(any_value(a.n_sh), any_value(b.n_sh)) AS containment
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) / least(any_value(a.n_sh), any_value(b.n_sh)) >= 0.6
    """,
    "llm_token_stats": r"""
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_wordlike,
               len(regexp_extract_all(text, '(?i)\b(the|and|of|to|a|in|is|it|that|for)\b')) AS n_en_markers
        FROM documents
    """,
    "llm_language_id": r"""
        WITH t AS (
          SELECT doc_id, lang,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
                 len(regexp_extract_all(text, '(?i)\b(the|and|of|to|a|in|is|it|that|for)\b')) AS n_mark
          FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN (CASE WHEN n_tok > 0 THEN n_mark / n_tok ELSE 0.0 END) >= 0.05
                    THEN 'en' ELSE 'other' END AS lang_pred
        FROM t
    """,
    "llm_quality": r"""
        WITH t AS (
          SELECT doc_id, lang, source, n_chars AS src_n_chars, text,
                 length(text) AS n_ch,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
                 len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(list_distinct(string_split_regex(trim(text), '\s+'))) END AS n_uniq,
                 len(regexp_extract_all(text, '(?i)\b(the|and|of|to|a|in|is|it|that|for)\b')) AS n_mark
          FROM documents
        )
        SELECT doc_id, lang, source, src_n_chars AS n_chars,
               n_ch AS q_n_chars, n_tok AS q_n_tokens,
               CASE WHEN n_tok > 0
                    THEN length(regexp_replace(trim(text), '\s+', '', 'g')) / n_tok
                    ELSE 0.0 END AS q_mean_token_len,
               CASE WHEN n_ch > 0 THEN n_punct / n_ch ELSE 0.0 END AS q_punct_ratio,
               CASE WHEN n_tok > 0 THEN n_mark / n_tok ELSE 0.0 END AS q_en_marker_ratio,
               CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END AS q_unique_token_ratio,
               (n_tok >= 5
                AND (CASE WHEN n_tok > 0
                          THEN length(regexp_replace(trim(text), '\s+', '', 'g')) / n_tok
                          ELSE 0.0 END) BETWEEN 2.0 AND 15.0
                AND (CASE WHEN n_ch > 0 THEN n_punct / n_ch ELSE 0.0 END) <= 0.3) AS q_keep
        FROM t
    """,
    "llm_fingerprint": f"""
        SELECT doc_id, md5({_NORM}) AS fp FROM documents
    """,
    # Connected components over the 0.4-Jaccard edge list as a
    # recursive CTE: cc enumerates every (node, reachable-label) pair
    # (UNION dedups, so it terminates); min(label) per node is the
    # component id.  Fine at gate scale; the Spark side is the scalable
    # min-label-propagation loop.
    "llm_dup_clusters": _CC_CTE
    + """
        SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node
    """,
    # Same component computation, folded to the cleaned corpus: keep
    # only docs that are their own component minimum.
    "llm_near_dedup_corpus": _CC_CTE
    + """
        , clusters AS (
          SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d JOIN clusters c
          ON d.doc_id = c.doc_id AND c.cluster_id = d.doc_id
    """,
    "llm_near_dedup_keep_best": _CC_CTE
    + """
        , clusters AS (
          SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node
        ), keep AS (
          SELECT doc_id FROM (
            SELECT c.doc_id,
                   row_number() OVER (PARTITION BY c.cluster_id
                                      ORDER BY d.n_chars DESC, c.doc_id) AS rk
            FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
          ) WHERE rk = 1
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d SEMI JOIN keep k ON d.doc_id = k.doc_id
    """,
    "llm_quality_filter": r"""
        WITH t AS (
          SELECT doc_id, lang,
                 CASE WHEN n_tok > 0 THEN n_uniq / n_tok ELSE 0.0 END AS score
          FROM (
            SELECT doc_id, lang,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(list_distinct(string_split_regex(trim(text), '\s+'))) END AS n_uniq
            FROM documents)
        )
        SELECT doc_id, lang, score FROM (
          SELECT doc_id, lang, score,
                 percent_rank() OVER (PARTITION BY lang
                                      ORDER BY score DESC, doc_id) AS pr
          FROM t
        ) WHERE pr < 0.5
    """,
    "llm_cross_dedup": r"""
        WITH seen AS (
          SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE source IN ('src0', 'src1')
        ), rest AS (
          SELECT doc_id, lang, source, n_chars,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents WHERE source NOT IN ('src0', 'src1')
        )
        SELECT doc_id, lang, source, n_chars FROM rest ANTI JOIN seen USING (fp)
    """,
    "llm_chunk_documents": f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), c AS (
          SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS s
          FROM toks WHERE len(t) > 0
        )
        SELECT doc_id, CAST(s AS BIGINT) AS chunk_start,
               CAST(least(32, len(t) - s + 1) AS BIGINT) AS n_tokens,
               array_to_string(t[s:s+31], ' ') AS chunk_text
        FROM c
    """,
    "llm_mixture_weights": """
        WITH per AS (
          SELECT source, count(*) AS n_docs,
                 pow(CAST(count(*) AS DOUBLE), 0.7) AS p
          FROM documents GROUP BY source
        )
        SELECT source, n_docs, p / (SELECT sum(p) FROM per) AS weight
        FROM per
    """,
    "llm_redact": r"""
        WITH r AS (
          SELECT doc_id, text,
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                   '[\w.+-]+@[\w-]+\.[\w.-]+', '[EMAIL]', 'g'),
                   '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
                   '\b(?:\d[ -]?){13,16}\b', '[CARD]', 'g'),
                   '\b\+?\d{1,3}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b', '[PHONE]', 'g') AS red
          FROM documents
        )
        SELECT doc_id, CAST(length(red) AS BIGINT) AS n_chars_redacted,
               CAST(length(text) - length(red) AS BIGINT) AS n_chars_dropped
        FROM r
    """,
    # Word 5-grams (docs shorter than 5 words fall back to the full
    # token string, mirroring llm.dedup.word_shingles); benchmark =
    # doc_id % 97 == 0; anti-join away any doc sharing a gram.
    "llm_decontaminate": f"""
        WITH {_GRAMS5}, bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        ), contam AS (
          SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars
        FROM documents d ANTI JOIN contam c ON d.doc_id = c.doc_id
    """,
    "llm_contamination_overlap": f"""
        WITH {_GRAMS5}, bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
               round(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS overlap_frac
        FROM g LEFT JOIN bench b USING (gram)
        GROUP BY g.doc_id
    """,
    "llm_boilerplate": f"""
        WITH {_GRAMS5}, catalog AS (
          SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 4
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN c.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
               round(sum(CASE WHEN c.gram IS NOT NULL THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS boiler_frac
        FROM g LEFT JOIN catalog c ON g.gram = c.gram
        GROUP BY g.doc_id
    """,
    "llm_c4_pipeline": f"""
        WITH {_gopher_cte('gw', 'gm', 'doc_id,')}, gkeep AS (
          SELECT doc_id FROM gm
          WHERE {_GOPHER_KEEP}
        ), {_GRAMS5}, bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        ), overlap AS (
          SELECT g.doc_id,
                 round(sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                       / CAST(count(*) AS DOUBLE), 6) AS overlap_frac
          FROM g LEFT JOIN bench b USING (gram)
          GROUP BY g.doc_id
        ), clean AS (
          SELECT d.doc_id, d.lang, d.source, d.n_chars, o.overlap_frac,
                 md5({_NORM}) AS fp
          FROM documents d
          SEMI JOIN gkeep k ON d.doc_id = k.doc_id
          JOIN overlap o ON d.doc_id = o.doc_id AND o.overlap_frac <= 0.2
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM clean
        )
        SELECT doc_id, lang, source, n_chars, overlap_frac
        FROM ranked WHERE rn = 1
    """,
    "llm_gopher_report": f"""
        WITH {_gopher_cte('w', 'm', 'doc_id, source,')}
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN {_GOPHER_KEEP}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
               CAST(sum(CASE WHEN n_words < 30 THEN 1 ELSE 0 END) AS BIGINT) AS fail_min_words,
               CAST(sum(CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_len,
               CAST(sum(CASE WHEN symbol_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbols,
               CAST(sum(CASE WHEN alpha_word_frac < 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
               CAST(sum(CASE WHEN stop_hits < 1 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopwords
        FROM m GROUP BY source
    """,
    "llm_dataset_card": f"""
        WITH base AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(n_chars) AS DOUBLE) AS total_chars,
                 CAST(count(DISTINCT source) AS DOUBLE) AS n_sources,
                 CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs,
                 round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                       / CAST(count(*) AS DOUBLE), 6) AS pct_en,
                 round(1.0 - count(DISTINCT md5({_NORM}))
                       / CAST(count(*) AS DOUBLE), 6) AS exact_dup_rate
          FROM documents
        ), {_gopher_cte('gw', 'gm', '')}, gkeep AS (
          SELECT round(sum(CASE WHEN {_GOPHER_KEEP}
                          THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
                 AS gopher_keep_rate
          FROM gm
        ), {_GRAMS5}, bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        ), contam AS (
          SELECT CAST(count(DISTINCT g.doc_id) AS DOUBLE) AS n_contaminated
          FROM g JOIN bench USING (gram)
        )
        SELECT m.metric, m.value FROM base, gkeep, contam,
        LATERAL (VALUES
          ('n_docs', n_docs),
          ('total_chars', total_chars),
          ('n_sources', n_sources),
          ('n_langs', n_langs),
          ('pct_en', pct_en),
          ('exact_dup_rate', exact_dup_rate),
          ('gopher_keep_rate', gopher_keep_rate),
          ('contaminated_rate', round(n_contaminated / n_docs, 6))
        ) AS m(metric, value)
    """,
    "llm_span_corruption": f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), spans AS (
          SELECT doc_id, t,
                 CAST(floor(len(t) * 0.15 / 3) AS INTEGER) AS ns
          FROM toks
        ), ex AS (
          SELECT doc_id, t, ns,
                 CAST(unnest(range(0, ns)) AS INTEGER) AS span_id,
                 CAST(floor(len(t) / ns) AS INTEGER) AS seg
          FROM spans WHERE ns >= 1
        ), placed AS (
          SELECT doc_id, span_id, t,
                 CAST(span_id * seg
                      + ((((doc_id * 131 + span_id) % 2147483648) * 2654435761 + 12345)
                         % 1000000007) % greatest(1, seg - 3 + 1)
                      + 1 AS INTEGER) AS start
          FROM ex
        )
        SELECT doc_id, span_id, start,
               CAST(3 AS INTEGER) AS length,
               array_to_string(t[start:start+2], ' ') AS span_text
        FROM placed
    """,
    "llm_contamination_rate": f"""
        WITH {_GRAMS5}, bench AS (
          SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
        ), contam AS (
          SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gram)
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_contaminated,
               sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE) AS contamination_rate
        FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
        GROUP BY d.source
    """,
    "llm_stratified_sample": """
        SELECT doc_id, lang, source, n_chars
        FROM documents
        WHERE doc_id % 100 < CASE lang WHEN 'en' THEN 50
                                       WHEN 'zh' THEN 20
                                       ELSE 10 END
    """,
    "llm_split_assign": """
        SELECT doc_id, lang,
               CASE WHEN doc_id % 100 < 80 THEN 'train'
                    WHEN doc_id % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "llm_corpus_shuffle": """
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || '0'), doc_id
               ) - 1 AS BIGINT) AS shuffle_pos
        FROM documents
    """,
    "llm_shard_layout": """
        WITH p AS (
          SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || '0'), doc_id
                 ) - 1 AS BIGINT) AS pos
          FROM documents
        )
        SELECT CAST(pos % 4 AS INTEGER) AS shard,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(pos) AS min_pos,
               max(pos) AS max_pos,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_docs
        FROM p GROUP BY 1
    """,
    "llm_weighted_sample": """
        WITH pri AS (
          SELECT doc_id, source || '/' || lang AS grp, n_chars,
                 pow((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || '0'),
                                               1, 13) AS BIGINT) AS DOUBLE) + 0.5)
                     / 4503599627370496.0,
                     1.0 / n_chars) AS pr
          FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, grp, n_chars FROM (
          SELECT *, row_number() OVER (PARTITION BY grp ORDER BY pr DESC, doc_id) AS rk
          FROM pri
        ) WHERE rk <= 5
    """,
    "llm_curation_pipeline": f"""
        WITH q AS (
          SELECT * FROM documents WHERE n_chars >= 100
        ), qtoks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM q
        ), qg AS (
          SELECT doc_id,
                 unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                            i -> array_to_string(t[i:i+4], ' '))
                        ELSE [array_to_string(t, ' ')] END
                 )) AS gram
          FROM qtoks
        ), btoks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents WHERE doc_id % 97 = 0
        ), bench AS (
          SELECT DISTINCT unnest(list_distinct(
                   CASE WHEN len(t) >= 5
                        THEN list_transform(range(1, len(t) - 3),
                                            i -> array_to_string(t[i:i+4], ' '))
                        ELSE [array_to_string(t, ' ')] END
                 )) AS gram
          FROM btoks
        ), contam AS (
          SELECT DISTINCT qg.doc_id FROM qg JOIN bench USING (gram)
        ), d AS (
          SELECT q.* FROM q ANTI JOIN contam c ON q.doc_id = c.doc_id
        ), keep AS (
          SELECT min(doc_id) AS doc_id FROM d GROUP BY md5({_NORM.replace('text', 'd.text')})
        ), kept AS (
          SELECT d.* FROM d SEMI JOIN keep USING (doc_id)
        )
        SELECT doc_id, lang, source,
               CASE WHEN doc_id % 100 < 80 THEN 'train'
                    WHEN doc_id % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CAST(ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || '0'), doc_id
               ) - 1 AS BIGINT) AS shuffle_pos
        FROM kept
    """,
    "llm_corpus_stats": r"""
        SELECT source, lang,
               count(*) AS n_docs,
               sum(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END) AS total_tokens,
               sum(length(text)) AS total_chars,
               sum(length(text)) / count(*) AS mean_chars,
               count(DISTINCT md5(text)) AS n_distinct_texts,
               (count(*) - count(DISTINCT md5(text))) / count(*) AS dup_ratio
        FROM documents GROUP BY source, lang
    """,
    "llm_bigram_logprob": f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), idx AS (
          SELECT doc_id, t, unnest(range(1, len(t))) AS i
          FROM toks WHERE len(t) >= 2
        ), ex AS (
          SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg FROM idx
        ), uni AS (
          SELECT unnest(t) AS w1 FROM toks
        ), c_uni AS (
          SELECT w1, count(*) AS c_w1 FROM uni GROUP BY w1
        ), c_bg AS (
          SELECT bg, count(*) AS c_bg FROM ex GROUP BY bg
        )
        SELECT ex.doc_id, count(*) AS n_bigrams,
               round(CAST(sum(CAST(round(ln(CAST(c_bg.c_bg AS DOUBLE) / c_uni.c_w1), 9)
                                   AS DECIMAL(20,9))) / count(*) AS DOUBLE), 6) AS avg_logprob
        FROM ex JOIN c_bg USING (bg) JOIN c_uni USING (w1)
        GROUP BY ex.doc_id
    """,
    "llm_mean_embedding": """
        WITH idx AS (
          SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS i
          FROM embeddings
        ), ex AS (
          SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v FROM idx
        ), per AS (
          SELECT label, dim, round(avg(v), 6) AS mv, count(*) AS cnt
          FROM ex GROUP BY label, dim
        )
        SELECT label, max(cnt) OVER (PARTITION BY label) AS n_vecs, dim, mv
        FROM per
    """,
    "llm_fuzzy_pairs": f"""
        WITH base AS (
          SELECT doc_id AS id, substring({_NORM}, 1, 64) AS head,
                 substring({_NORM}, 1, 8) AS block
          FROM documents WHERE length(substring({_NORM}, 1, 64)) > 0
        )
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        FROM base a JOIN base b ON a.block = b.block AND a.id < b.id
        WHERE levenshtein(a.head, b.head) <= 8
    """,
    "llm_sorted_neighborhood": f"""
        WITH base AS (
          SELECT doc_id AS id, substring({_NORM}, 1, 64) AS head,
                 substring({_NORM}, 1, 16) AS key
          FROM documents WHERE length(substring({_NORM}, 1, 64)) > 0
        ), ranked AS (
          SELECT id, head, row_number() OVER (ORDER BY key, id) AS r
          FROM base
        )
        SELECT a.id AS doc_a, b.id AS doc_b,
               CAST(b.r - a.r AS BIGINT) AS gap,
               CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        FROM ranked a JOIN ranked b ON b.r - a.r BETWEEN 1 AND 4
        WHERE levenshtein(a.head, b.head) <= 8
    """,
    "llm_tfidf": f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
          FROM documents WHERE length({_NORM}) > 0
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ), dfreq AS (
          SELECT term, count(*) AS df FROM tf GROUP BY term
        ), n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf,
                 round(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS tfidf
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, tfidf, rank FROM (
          SELECT doc_id, term, tf, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term ASC) AS rank
          FROM scored
        ) WHERE rank <= 3
    """,
    "llm_soft_dedup": f"""
        WITH h AS (
          SELECT doc_id, md5({_NORM}) AS content_hash FROM documents
        )
        SELECT doc_id, content_hash,
               CAST(count(*) OVER (PARTITION BY content_hash) AS BIGINT)
                 AS cluster_size,
               round(1.0 / count(*) OVER (PARTITION BY content_hash), 6) AS weight
        FROM h
    """,
    "llm_zipf_fit": f"""
        WITH toks AS (
          SELECT unnest(CASE WHEN length({_NORM}) = 0 THEN []
                             ELSE string_split({_NORM}, ' ') END) AS tok
          FROM documents
        ), c AS (
          SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        ), r AS (
          SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
          FROM c
        ), q AS (
          SELECT cnt,
                 CAST(ln(CAST(rank AS DOUBLE)) AS DECIMAL(18,12)) AS lx,
                 CAST(ln(CAST(cnt AS DOUBLE)) AS DECIMAL(18,12)) AS ly
          FROM r
        ), a AS (
          SELECT CAST(count(*) AS BIGINT) AS n_types,
                 CAST(sum(cnt) AS BIGINT) AS n_tokens,
                 CAST(sum(lx) AS DOUBLE) AS sx, CAST(sum(ly) AS DOUBLE) AS sy,
                 CAST(sum(lx * ly) AS DOUBLE) AS sxy,
                 CAST(sum(lx * lx) AS DOUBLE) AS sxx,
                 CAST(sum(ly * ly) AS DOUBLE) AS syy,
                 CAST(count(*) AS DOUBLE) AS n
          FROM q
        )
        SELECT n_types, n_tokens,
               round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
               round((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, 6)
                 AS intercept,
               round(((sxy - sx * sy / n) * (sxy - sx * sy / n))
                     / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
        FROM a
    """,
    "llm_top_ngrams": f"""
        WITH toks AS (
          SELECT CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), g AS (
          SELECT unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i+1])) AS ngram
          FROM toks WHERE len(t) >= 2
        )
        SELECT ngram, count(*) AS cnt FROM g
        GROUP BY ngram ORDER BY cnt DESC, ngram ASC LIMIT 20
    """,
    "w_funnel": """
        WITH s1 AS (
          SELECT user_id, event_type, ts,
                 min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS step1_ts
          FROM events
        ), s2 AS (
          SELECT *, min(CASE WHEN event_type = 'click' AND ts > step1_ts THEN ts END)
                      OVER (PARTITION BY user_id) AS step2_ts
          FROM s1
        ), s3 AS (
          SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > step2_ts THEN ts END)
                      OVER (PARTITION BY user_id) AS step3_ts
          FROM s2
        )
        SELECT user_id, min(step1_ts) AS step1_ts, min(step2_ts) AS step2_ts,
               min(step3_ts) AS step3_ts,
               CAST(CASE WHEN min(step3_ts) IS NOT NULL THEN 3
                         WHEN min(step2_ts) IS NOT NULL THEN 2
                         WHEN min(step1_ts) IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS steps_completed
        FROM s3 GROUP BY user_id
    """,
    "w_cohort": """
        WITH f AS (
          SELECT user_id, date_trunc('day', min(ts)) AS cohort_day
          FROM events GROUP BY user_id
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS BIGINT) AS day_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN f USING (user_id)
        GROUP BY 1, 2
    """,
    "w_rolling": """
        SELECT event_id, user_id,
               count(*) OVER w AS n_trailing,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(epoch(ts) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    # same decimal power-sum moments as the Spark operator; strictly
    # preceding 50-row frame, n<2 or zero variance -> null score
    "w_zscore": """
        WITH m AS (
          SELECT event_id, event_type, value,
                 count(*) OVER w AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
                 CAST(sum(CAST(value AS DECIMAL(18,2))
                          * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s2
          FROM events
          WINDOW w AS (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
        ), sc AS (
          SELECT event_id, event_type, value,
                 CASE WHEN n > 1 AND (s2 - s1*s1/n) / (n-1) > 0
                      THEN (value - s1/n) / sqrt((s2 - s1*s1/n) / (n-1))
                 END AS z
          FROM m
        )
        SELECT event_id, event_type, value,
               round(z, 6) AS zscore,
               coalesce(abs(z), 0.0) > 3.0 AS is_anomaly
        FROM sc
    """,
    # bounded-frame EWMA, adjust-form; DuckDB list lambdas are 1-based
    # (newest element i = len -> weight a^0), matching the Spark fold's
    # 0-based a^(n-1-i)
    "w_ewma": """
        WITH t AS (
          SELECT event_id, event_type, value,
                 list(CAST(value AS DOUBLE)) OVER w AS vals
          FROM events
          WINDOW w AS (PARTITION BY event_type
                       ORDER BY ts, event_id
                       ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, event_type, value,
               round(
                 list_sum(list_transform(vals, (x, i) -> x * pow(0.9, len(vals) - i)))
                 / list_sum(list_transform(vals, (x, i) -> pow(0.9, len(vals) - i))),
                 6) AS ewma
        FROM t
    """,
    "llm_cosine_topk": """
        WITH pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(
                   list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
                   6) AS similarity
          FROM embeddings q CROSS JOIN embeddings c
          WHERE q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, similarity, rank FROM (
          SELECT query_id, neighbor_id, similarity,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id ASC) AS rank
          FROM pairs
        ) WHERE rank <= 5
    """,
    "llm_cosine_topk_fast": """
        WITH pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(
                   list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
                   6) AS similarity
          FROM embeddings q CROSS JOIN embeddings c
          WHERE q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, similarity, rank FROM (
          SELECT query_id, neighbor_id, similarity,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id ASC) AS rank
          FROM pairs
        ) WHERE rank <= 5
    """,
    "llm_cosine_topk_sliced": """
        WITH q AS (
          SELECT * FROM embeddings
          WHERE ((vec_id % 2147483648) * 2654435761 + 12345) % 1000000007 % 4 = 0
        ),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(
                   list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
                   6) AS similarity
          FROM q CROSS JOIN embeddings c
          WHERE q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, similarity, rank FROM (
          SELECT query_id, neighbor_id, similarity,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY similarity DESC, neighbor_id ASC) AS rank
          FROM pairs
        ) WHERE rank <= 5
    """,
    "s8_jsonl_roundtrip": """
        SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars FROM documents
    """,
    "llm_embed_dup": """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(
                 list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
                 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(
                 list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
                 6) >= 0.4
    """,
    "e17_json_extract": """
        SELECT event_id, CAST(props->>'k' AS BIGINT) AS prop_k FROM events
    """,
    "w_period_over_period": """
        WITH m AS (
          SELECT date_trunc('day', ts) AS day, event_type,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT day, event_type, n,
               CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY day)
                    AS BIGINT) AS delta,
               CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY day) > 0
                    THEN CAST(n - lag(n) OVER (PARTITION BY event_type ORDER BY day)
                              AS DOUBLE)
                         / lag(n) OVER (PARTITION BY event_type ORDER BY day)
               END AS pct_change
        FROM m
    """,
    "w_decayed_counts": """
        WITH ref AS (SELECT max(ts) AS r FROM events)
        SELECT user_id, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(round(exp(-((epoch_us(ref.r) - epoch_us(ts)) / 1000000.0)
                                       / 604800.0), 9) AS DECIMAL(18,9))) AS DOUBLE)
                 AS decayed_count
        FROM events CROSS JOIN ref
        GROUP BY user_id, event_type
    """,
    "w_sessionize": """
        WITH e AS (
          SELECT event_id, user_id, ts,
                 lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ) AS prev_us
          FROM events
        )
        SELECT event_id, user_id, ts,
               CAST(sum(CASE WHEN prev_us IS NULL
                              OR epoch_us(ts) - prev_us > 1800 * 1000000
                             THEN 1 ELSE 0 END) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM e
    """,
    "w_coverage": """
        WITH iv AS (
          SELECT user_id,
                 epoch_us(ts) AS s,
                 epoch_us(ts + INTERVAL 10 MINUTE) AS e
          FROM events
        ), clipped AS (
          SELECT user_id,
                 greatest(e - greatest(s, coalesce(max(e) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), s)), 0) AS c
          FROM iv
        )
        SELECT user_id, sum(c) / 1000000.0 AS covered_seconds
        FROM clipped GROUP BY user_id
    """,
    "w_attribution": """
        WITH purchases AS (
          SELECT event_id, user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ), clicks AS (
          SELECT user_id, ts, event_id AS click_id
          FROM events WHERE event_type = 'click'
        ), j AS (
          SELECT p.event_id, p.user_id, p.ts, p.purchase_value,
                 c.click_id, c.ts AS click_ts
          FROM purchases p
          ASOF LEFT JOIN clicks c
            ON p.user_id = c.user_id AND p.ts >= c.ts
        )
        SELECT event_id, user_id, ts, purchase_value,
               CASE WHEN click_ts IS NOT NULL
                     AND ts - click_ts <= INTERVAL 30 MINUTE
                    THEN click_id END AS attributed_click_id,
               CASE WHEN click_ts IS NOT NULL
                     AND ts - click_ts <= INTERVAL 30 MINUTE
                    THEN click_ts END AS attributed_click_ts
        FROM j
    """,
    "j10_asof_backward": """
        SELECT e.event_id, e.user_id, e.event_type,
               p.ts AS purchase_ts, p.purchase_value
        FROM events e
        ASOF LEFT JOIN (
          SELECT user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ) p ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
    "j10b_asof_forward": """
        SELECT e.event_id, e.user_id, e.event_type,
               p.ts AS purchase_ts, p.purchase_value
        FROM events e
        ASOF LEFT JOIN (
          SELECT user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ) p ON e.user_id = p.user_id AND e.ts <= p.ts
    """,
    # nearest = closest of (prior, next); equidistant ties take the
    # prior row -- same rule as the Spark operator
    "j10c_asof_nearest": """
        WITH p AS (
          SELECT user_id, ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        )
        SELECT e.event_id, e.user_id, e.event_type,
               CASE WHEN b.ts IS NOT NULL
                         AND (f.ts IS NULL OR (e.ts - b.ts) <= (f.ts - e.ts))
                    THEN b.ts ELSE f.ts END AS purchase_ts,
               CASE WHEN b.ts IS NOT NULL
                         AND (f.ts IS NULL OR (e.ts - b.ts) <= (f.ts - e.ts))
                    THEN b.purchase_value ELSE f.purchase_value END
                 AS purchase_value
        FROM events e
        ASOF LEFT JOIN p b ON e.user_id = b.user_id AND e.ts >= b.ts
        ASOF LEFT JOIN p f ON e.user_id = f.user_id AND e.ts <= f.ts
    """,
    "a11_group_stats": """
        WITH agg AS (
          SELECT event_type, count(*) AS n,
                 sum(CAST(value AS DECIMAL(18,2))) AS s1,
                 sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS s2,
                 min(CAST(value AS DOUBLE)) AS min_v,
                 max(CAST(value AS DOUBLE)) AS max_v
          FROM events GROUP BY event_type
        )
        SELECT event_type, n,
               round(CAST(s1 AS DOUBLE) / n, 6) AS mean_v,
               round(sqrt(CASE WHEN n > 1
                               THEN (CAST(s2 AS DOUBLE)
                                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                                    / (n - 1) END), 6) AS stddev_v,
               min_v, max_v
        FROM agg
    """,
    "a22_spearman": """
        WITH src AS (
          SELECT event_type, value AS x, CAST(hour(ts) AS DOUBLE) AS y
          FROM events
        ), ranked AS (
          SELECT event_type,
                 CAST(CAST(rank() OVER (PARTITION BY event_type ORDER BY x) AS DOUBLE)
                      + (CAST(count(*) OVER (PARTITION BY event_type, x) AS DOUBLE) - 1) / 2
                      AS DECIMAL(18,2)) AS rx,
                 CAST(CAST(rank() OVER (PARTITION BY event_type ORDER BY y) AS DOUBLE)
                      + (CAST(count(*) OVER (PARTITION BY event_type, y) AS DOUBLE) - 1) / 2
                      AS DECIMAL(18,2)) AS ry
          FROM src
        ), agg AS (
          SELECT event_type, count(*) AS n,
                 sum(rx) AS sx, sum(ry) AS sy, sum(rx*ry) AS sxy,
                 sum(rx*rx) AS sxx, sum(ry*ry) AS syy
          FROM ranked GROUP BY event_type
        )
        SELECT event_type, n,
               round(CASE WHEN n > 1
                           AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) > 0
                           AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n) > 0
                          THEN (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n)
                               / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n)
                                      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n))
                     END, 6) AS spearman_xy
        FROM agg
    """,
    "a13_group_corr": """
        WITH src AS (
          SELECT event_type,
                 CAST(value AS DECIMAL(18,2)) AS x,
                 CAST(CAST(hour(ts) AS DOUBLE) AS DECIMAL(18,2)) AS y
          FROM events
        ), agg AS (
          SELECT event_type, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                 sum(x*x) AS sxx, sum(y*y) AS syy
          FROM src GROUP BY event_type
        )
        SELECT event_type, n,
               round(CASE WHEN n > 1
                           AND (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n) > 0
                           AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n) > 0
                          THEN (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n)
                               / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n)
                                      * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n))
                     END, 6) AS corr_xy
        FROM agg
    """,
    "st_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "st_sliding": """
        WITH starts AS (
          SELECT unnest([date_trunc('hour', ts),
                         date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
                 event_type, value
          FROM events
        )
        SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM starts GROUP BY 1, 2, 3
    """,
    "st_session": """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
        ), sessions AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sessions GROUP BY user_id, sid
    """,
    "st_enrich": """
        WITH dim AS (
          SELECT event_type,
                 round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
                   AS type_mean
          FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, d.type_mean
        FROM events e LEFT JOIN dim d USING (event_type)
    """,
    "st_interval_join": """
        SELECT c.event_id AS click_id, c.user_id, c.ts AS click_ts,
               p.ts AS purchase_ts, p.value AS purchase_value
        FROM events c JOIN events p
          ON c.event_type = 'click' AND p.event_type = 'purchase'
         AND c.user_id = p.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    "st_interval_join_outer": """
        -- batch emulation of the watermark-drop LEFT OUTER emission:
        -- matched rows always emit; an unmatched click emits its null
        -- row only once the final watermark proves no match can still
        -- arrive.  The final watermark is the MIN over the two sides'
        -- watermark operators (each side = its own max event time minus
        -- the 2h delay), and a click is provably unmatchable when its
        -- joinable horizon (click_ts + 1h) lies below that watermark.
        WITH wm AS (
          SELECT least(
                   max(ts) FILTER (event_type = 'click'),
                   max(ts) FILTER (event_type = 'purchase')
                 ) - INTERVAL 2 HOUR AS w
          FROM events
        ),
        c AS (
          SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'
        ),
        p AS (
          SELECT user_id AS pu, ts AS purchase_ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ),
        j AS (
          SELECT c.click_id, c.user_id, c.click_ts, p.purchase_ts, p.purchase_value
          FROM c LEFT JOIN p
            ON c.user_id = p.pu
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        )
        SELECT click_id, user_id, click_ts, purchase_ts, purchase_value
        FROM j, wm
        WHERE purchase_ts IS NOT NULL OR (click_ts + INTERVAL 1 HOUR) < wm.w
    """,
    "a48_bootstrap_ci": """
        -- deterministic Poisson-bootstrap replica: identical md5-hex
        -- weight derivation, exact DECIMAL sums, one double division,
        -- integer rank selection (5th / 196th of 200 replicate means)
        WITH thresholds(t) AS (
          SELECT unnest(['5e2d58d8','bc5ab1b1','eb715e1d','fb239797',
                         'ff1025f5','ffd90f3b','fffa8b71','ffff540c','ffffed1f'])
        ),
        reps AS (SELECT unnest(generate_series(0, 199)) AS r),
        weighted AS (
          SELECT o.o_orderpriority AS g, reps.r,
                 CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
                 (SELECT count(*) FROM thresholds
                  WHERE substring(md5(CAST(o.o_orderkey AS VARCHAR) || ':' ||
                                      CAST(reps.r // 4 AS VARCHAR)),
                                  (reps.r % 4) * 8 + 1, 8) >= t) AS w
          FROM orders o CROSS JOIN reps
        ),
        rep_means AS (
          SELECT g, r,
                 round(CAST(sum(CAST(w AS DECIMAL(10,0)) * v) AS DOUBLE)
                       / CAST(sum(CAST(w AS DECIMAL(10,0))) AS DOUBLE), 6) AS m
          FROM weighted GROUP BY g, r
          HAVING sum(w) > 0
        ),
        ranked AS (
          SELECT g, m, row_number() OVER (PARTITION BY g ORDER BY m, r) AS rk
          FROM rep_means
        ),
        bounds AS (
          SELECT g,
                 max(CASE WHEN rk = 5 THEN m END) AS ci_lo,
                 max(CASE WHEN rk = 196 THEN m END) AS ci_hi
          FROM ranked GROUP BY g
        ),
        point AS (
          SELECT o_orderpriority AS g, count(*) AS n_rows,
                 round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6) AS point_mean
          FROM orders GROUP BY 1
        )
        SELECT point.g AS o_orderpriority, n_rows, point_mean, ci_lo, ci_hi
        FROM point JOIN bounds ON point.g = bounds.g
    """,
    "st_custom_source": """
        -- regenerate the deterministic stream: rows are a pure function
        -- of the offset (datasources._synth_event)
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 7 SECOND AS ts,
               (i * 2654435761) % 997 AS user_id,
               (['view', 'click', 'cart', 'purchase'])[(i * 2654435761) % 4 + 1]
                 AS event_type,
               CAST((i * 37) % 1000 AS DOUBLE) / 10.0 AS value
        FROM (SELECT unnest(generate_series(0, 1999)) AS i)
    """,
    "st_interval_join_full": """
        -- two-sided watermark-drop emulation (see st_interval_join_outer):
        -- an unmatched purchase is provably unmatchable once the final
        -- watermark passes its own event time (no earlier click remains)
        WITH wm AS (
          SELECT least(
                   max(ts) FILTER (event_type = 'click'),
                   max(ts) FILTER (event_type = 'purchase')
                 ) - INTERVAL 2 HOUR AS w
          FROM events
        ),
        c AS (
          SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'
        ),
        p AS (
          SELECT event_id AS purchase_id, user_id AS pu,
                 ts AS purchase_ts, value AS purchase_value
          FROM events WHERE event_type = 'purchase'
        ),
        j AS (
          SELECT c.click_id, coalesce(c.user_id, p.pu) AS user_id,
                 c.click_ts, p.purchase_id, p.purchase_ts, p.purchase_value
          FROM c FULL JOIN p
            ON c.user_id = p.pu
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
        )
        SELECT click_id, user_id, click_ts, purchase_id, purchase_ts, purchase_value
        FROM j, wm
        WHERE (click_id IS NOT NULL AND purchase_id IS NOT NULL)
           OR (purchase_id IS NULL AND (click_ts + INTERVAL 1 HOUR) < wm.w)
           OR (click_id IS NULL AND purchase_ts < wm.w)
    """,
    "st_dedup": """
        SELECT event_id, user_id, event_type FROM events
    """,
    "st_running_totals": """
        SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    """,
    "w_gap_linear": """
        WITH obs AS (
          SELECT date_trunc('hour', ts) AS window_start, event_type,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_obs
          FROM events GROUP BY 1, 2
        ), rng AS (
          SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window_start FROM rng
        ), groups AS (SELECT DISTINCT event_type FROM events),
        grid AS (
          SELECT s.window_start, g.event_type FROM spine s CROSS JOIN groups g
        ), j AS (
          SELECT grid.window_start, grid.event_type, o.v_obs,
                 CAST(epoch(grid.window_start) AS BIGINT) AS t
          FROM grid LEFT JOIN obs o
            ON o.window_start = grid.window_start AND o.event_type = grid.event_type
        ), w AS (
          SELECT window_start, event_type, v_obs, t,
                 last_value(v_obs IGNORE NULLS) OVER wp AS pv,
                 last_value(CASE WHEN v_obs IS NOT NULL THEN t END IGNORE NULLS) OVER wp AS pt,
                 first_value(v_obs IGNORE NULLS) OVER wn AS nv,
                 first_value(CASE WHEN v_obs IS NOT NULL THEN t END IGNORE NULLS) OVER wn AS nt
          FROM j
          WINDOW wp AS (PARTITION BY event_type ORDER BY window_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY event_type ORDER BY window_start
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT window_start, event_type,
               CASE WHEN v_obs IS NOT NULL THEN v_obs
                    WHEN pv IS NOT NULL AND nv IS NOT NULL
                    THEN pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
                    ELSE NULL END AS v_interp,
               (v_obs IS NOT NULL) AS observed
        FROM w
    """,
    "w_resample_filled": """
        WITH rng AS (
          SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
          FROM events
        ), spine AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window_start FROM rng
        ), groups AS (SELECT DISTINCT event_type FROM events),
        counts AS (
          SELECT date_trunc('hour', ts) AS window_start, event_type,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT s.window_start, g.event_type,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM spine s CROSS JOIN groups g
        LEFT JOIN counts c
          ON c.window_start = s.window_start AND c.event_type = g.event_type
    """,
    "w_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "w_sliding": """
        WITH starts AS (
          SELECT unnest([date_trunc('hour', ts),
                         date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
                 event_type, value
          FROM events
        )
        SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM starts GROUP BY 1, 2, 3
    """,
    "w_session": """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
        ), sessions AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM sessions GROUP BY user_id, sid
    """,
    # Web-curation suite (llm/web.py).  Same RE2-safe pattern text as
    # the Spark side; DuckDB needs the explicit 'g' flag where a
    # pattern must replace every occurrence (Spark is always-global).
    "llm_html_strip": r"""
        WITH wrapped AS (
          SELECT doc_id,
                 '<html><head><script type="text/javascript">var x = 1 < 2;</script>'
                 || '<style>p { color: red; }</style></head><!-- crawl '
                 || CAST(doc_id % 7 AS VARCHAR)
                 || ' --><body class="doc"><h1>Doc &amp; '
                 || CAST(doc_id % 13 AS VARCHAR)
                 || '</h1><p>' || text || '&nbsp;&lt;end&gt;</p></body></html>' AS h
          FROM documents
        ), stripped AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(h,
                     '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                     '(?s)<!--.*?-->', ' ', 'g'),
                     '<[^>]+>', ' ', 'g'),
                     '&nbsp;', ' ', 'g'),
                     '&lt;', '<', 'g'),
                     '&gt;', '>', 'g'),
                     '&quot;', '"', 'g'),
                     '&#39;', '''', 'g'),
                     '&amp;', '&', 'g'),
                     '\s+', ' ', 'g')) AS clean_text
          FROM wrapped
        )
        SELECT doc_id, clean_text,
               CAST(length(clean_text) AS BIGINT) AS n_clean_chars
        FROM stripped
    """,
    "llm_url_dedup": r"""
        WITH u AS (
          SELECT doc_id,
                 'HTTPS://WWW.m' || CAST(doc_id % 2 AS VARCHAR) || '.' || source
                 || '.COM:443/A/' || CAST(doc_id % 10 AS VARCHAR) || '/'
                 || CASE WHEN doc_id % 3 = 0
                         THEN '?href=h&utm_source=news&id=' || CAST(doc_id % 20 AS VARCHAR)
                              || '&utm_medium=m'
                         WHEN doc_id % 3 = 1
                         THEN '?id=' || CAST(doc_id % 20 AS VARCHAR)
                         ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#Sec2' ELSE '' END AS url
          FROM documents
        ), parts AS (
          SELECT doc_id,
                 lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                   '^www\.', ''), ':(443|80)$', '') AS host,
                 regexp_replace(
                   regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                   '#.*$', '') AS rest
          FROM u
        ), np AS (
          SELECT doc_id, scheme, host,
                 regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_extract(rest, '(\?.*)$', 1),
                     '(?i)([?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*', '\1', 'g'),
                   '\?&+', '?'), '&&+', '&', 'g'), '[?&]+$', '') AS query
          FROM parts
        )
        SELECT scheme || '://' || host || path || query AS norm_url,
               min(doc_id) AS keeper_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM np GROUP BY 1
    """,
    "llm_domain_stats": r"""
        WITH u AS (
          SELECT doc_id, n_chars,
                 'HTTPS://WWW.m' || CAST(doc_id % 2 AS VARCHAR) || '.' || source
                 || '.COM:443/A/' || CAST(doc_id % 10 AS VARCHAR) || '/'
                 || CASE WHEN doc_id % 3 = 0
                         THEN '?href=h&utm_source=news&id=' || CAST(doc_id % 20 AS VARCHAR)
                              || '&utm_medium=m'
                         WHEN doc_id % 3 = 1
                         THEN '?id=' || CAST(doc_id % 20 AS VARCHAR)
                         ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#Sec2' ELSE '' END AS url
          FROM documents
        ), parts AS (
          SELECT doc_id, n_chars,
                 lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                   '^www\.', ''), ':(443|80)$', '') AS host,
                 regexp_replace(
                   regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                   '#.*$', '') AS rest
          FROM u
        ), np AS (
          SELECT doc_id, n_chars, scheme, host,
                 regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
                 regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_extract(rest, '(\?.*)$', 1),
                     '(?i)([?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*', '\1', 'g'),
                   '\?&+', '?'), '&&+', '&', 'g'), '[?&]+$', '') AS query
          FROM parts
        ), per_url AS (
          SELECT domain, scheme || '://' || host || path || query AS norm_url,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_chars) AS BIGINT) AS chars
          FROM np
          WHERE domain NOT IN ('src0.com', 'src7.com')
          GROUP BY 1, 2
        )
        SELECT domain,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(chars) AS BIGINT) AS total_chars
        FROM per_url GROUP BY domain
    """,
    "llm_balanced_sample": r"""
        WITH per AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
        ), mn AS (
          SELECT min(n) AS mn FROM per
        ), rates AS (
          SELECT lang,
                 CAST(least(1000, floor(
                   1000.0 * CAST(m.mn AS DOUBLE) / CAST(p.n AS DOUBLE)
                 )) AS INTEGER) AS rate_pm
          FROM per p CROSS JOIN mn m
        )
        SELECT d.doc_id, d.lang, r.rate_pm
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13) AS BIGINT)
              % 1000 < r.rate_pm
    """,
    "llm_prefix_index": r"""
        WITH toks AS (
          SELECT CASE WHEN length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0 THEN []
                      ELSE string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') END AS t
          FROM documents
        ), g AS (
          SELECT unnest(t) AS tok FROM toks
        ), counts AS (
          SELECT substr(tok, 1, 3) AS prefix, tok, CAST(count(*) AS BIGINT) AS n
          FROM g WHERE length(tok) >= 3
          GROUP BY 1, 2
        )
        SELECT prefix, rank, tok, n FROM (
          SELECT prefix, tok, n,
                 CAST(row_number() OVER (PARTITION BY prefix
                                         ORDER BY n DESC, tok ASC) AS BIGINT) AS rank
          FROM counts
        ) WHERE rank <= 3
    """,
    "llm_mix_drift": r"""
        WITH per AS (
          SELECT source,
                 CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM documents GROUP BY source
        ), tot AS (
          SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM per
        )
        SELECT p.source, p.n_a, p.n_b,
               CAST(p.n_a AS DOUBLE) / CAST(t.ta AS DOUBLE) AS share_a,
               CAST(p.n_b AS DOUBLE) / CAST(t.tb AS DOUBLE) AS share_b,
               abs(CAST(p.n_a AS DOUBLE) / CAST(t.ta AS DOUBLE)
                   - CAST(p.n_b AS DOUBLE) / CAST(t.tb AS DOUBLE)) AS abs_drift
        FROM per p CROSS JOIN tot t
    """,
    "llm_dedup_keep_longest": r"""
        WITH fp AS (
          SELECT doc_id, n_chars,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
          FROM documents
        )
        SELECT fingerprint, doc_id AS keeper_id, n_chars FROM (
          SELECT fingerprint, doc_id, n_chars,
                 row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM fp
        ) WHERE rn = 1
    """,
    "llm_dedup_audit": r"""
        WITH fp AS (
          SELECT source,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
          FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
               CAST(count(*) - count(DISTINCT fp) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 AS dup_rate
        FROM fp GROUP BY source
    """,
    "llm_extract_spans": r"""
        WITH nums AS (
          SELECT doc_id, 'number' AS kind,
                 unnest(list_transform(regexp_extract_all(text, '\d+'),
                                       (x, i) -> struct_pack(pos := i - 1, span := x))) AS sp
          FROM documents
        ), words AS (
          SELECT doc_id, 'keyword' AS kind,
                 unnest(list_transform(
                   regexp_extract_all(text, '\b(spark|hash|join|merge)\b'),
                   (x, i) -> struct_pack(pos := i - 1, span := x))) AS sp
          FROM documents
        )
        SELECT doc_id, kind, CAST(sp.pos AS INTEGER) AS pos, sp.span AS span FROM nums
        UNION ALL
        SELECT doc_id, kind, CAST(sp.pos AS INTEGER) AS pos, sp.span AS span FROM words
    """,
    "llm_web_pipeline": r"""
        WITH wrapped AS (
          SELECT doc_id, source,
                 '<html><head><script type="text/javascript">var x = 1 < 2;</script>'
                 || '<style>p { color: red; }</style></head><!-- crawl '
                 || CAST(doc_id % 7 AS VARCHAR)
                 || ' --><body class="doc"><h1>Doc &amp; '
                 || CAST(doc_id % 13 AS VARCHAR)
                 || '</h1><p>' || text || '&nbsp;&lt;end&gt;</p></body></html>' AS h
          FROM documents
        ), cleaned AS (
          SELECT doc_id, source,
                 trim(regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(
                   regexp_replace(h,
                     '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                     '(?s)<!--.*?-->', ' ', 'g'),
                     '<[^>]+>', ' ', 'g'),
                     '&nbsp;', ' ', 'g'),
                     '&lt;', '<', 'g'),
                     '&gt;', '>', 'g'),
                     '&quot;', '"', 'g'),
                     '&#39;', '''', 'g'),
                     '&amp;', '&', 'g'),
                     '\s+', ' ', 'g')) AS text
          FROM wrapped
        ), u AS (
          SELECT doc_id,
                 'HTTPS://WWW.m' || CAST(doc_id % 2 AS VARCHAR) || '.' || source
                 || '.COM:443/A/' || CAST(doc_id % 10 AS VARCHAR) || '/'
                 || CASE WHEN doc_id % 3 = 0
                         THEN '?href=h&utm_source=news&id=' || CAST(doc_id % 20 AS VARCHAR)
                              || '&utm_medium=m'
                         WHEN doc_id % 3 = 1
                         THEN '?id=' || CAST(doc_id % 20 AS VARCHAR)
                         ELSE '' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#Sec2' ELSE '' END AS url
          FROM documents
        ), parts AS (
          SELECT doc_id,
                 lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
                   '^www\.', ''), ':(443|80)$', '') AS host,
                 regexp_replace(
                   regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
                   '#.*$', '') AS rest
          FROM u
        ), np AS (
          SELECT doc_id, scheme, host,
                 regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '') AS path,
                 regexp_replace(regexp_replace(regexp_replace(
                   regexp_replace(regexp_extract(rest, '(\?.*)$', 1),
                     '(?i)([?&])(utm_[a-z]+|gclid|fbclid|ref)=[^&#]*', '\1', 'g'),
                   '\?&+', '?'), '&&+', '&', 'g'), '[?&]+$', '') AS query
          FROM parts
        ), keepers AS (
          SELECT min(doc_id) AS doc_id
          FROM np GROUP BY scheme || '://' || host || path || query
        ), toks AS (
          SELECT c.doc_id,
                 list_filter(regexp_split_to_array(lower(c.text), '[^a-z0-9]+'),
                             t -> length(t) > 0) AS tk
          FROM cleaned c JOIN keepers k ON c.doc_id = k.doc_id
        ), scored AS (
          SELECT doc_id,
                 (CASE WHEN len(tk) > 0 THEN
                    list_reduce(
                      list_prepend(0.0, list_transform(tk, t ->
                        CAST((CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 4096)
                             % 997 AS DOUBLE) / 997.0 - 0.5)),
                      (a, b) -> a + b) / CAST(len(tk) AS DOUBLE)
                  ELSE 0.0 END) >= 0 AS keep
          FROM toks
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_raw,
               CAST(sum(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_url_kept,
               CAST(sum(CASE WHEN s.keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_quality_kept
        FROM documents d
        LEFT JOIN keepers k ON d.doc_id = k.doc_id
        LEFT JOIN scored s ON d.doc_id = s.doc_id
        GROUP BY d.source
    """,
    "llm_mixture_apply": r"""
        WITH per AS (
          SELECT source, count(*) AS n_docs,
                 CAST(round(sqrt(CAST(count(*) AS DOUBLE)), 6) AS DECIMAL(28,6)) AS s
          FROM documents GROUP BY source
        ), tot AS (
          SELECT sum(n_docs) AS total, CAST(sum(s) AS DECIMAL(38,6)) AS ssum FROM per
        ), rates AS (
          SELECT source,
                 CAST(least(1000, floor(
                   1000.0 * 0.5 * CAST(t.total AS DOUBLE) * CAST(p.s AS DOUBLE)
                   / (CAST(t.ssum AS DOUBLE) * CAST(p.n_docs AS DOUBLE))
                 )) AS INTEGER) AS rate_pm
          FROM per p CROSS JOIN tot t
        )
        SELECT d.doc_id, d.source, r.rate_pm
        FROM documents d JOIN rates r ON d.source = r.source
        WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 13) AS BIGINT) % 1000 < r.rate_pm
    """,
    "llm_index_dedup": r"""
        WITH idx AS (
          SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
                 min(doc_id) AS known_keeper_id
          FROM documents WHERE doc_id % 2 = 0
          GROUP BY 1
        ), batch AS (
          SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
                 min(doc_id) AS new_id,
                 CAST(count(*) AS BIGINT) AS n_batch_dups
          FROM documents WHERE doc_id % 2 = 1
          GROUP BY 1
        )
        SELECT b.fingerprint, b.new_id, b.n_batch_dups,
               i.known_keeper_id,
               i.known_keeper_id IS NULL AS is_new
        FROM batch b LEFT JOIN idx i USING (fingerprint)
    """,
    "llm_curriculum": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             t -> length(t) > 0) AS tk
          FROM documents
        ), scored AS (
          SELECT doc_id,
                 round(1.0 / (1.0 + exp(-4.0 * (
                   CASE WHEN len(tk) > 0 THEN
                     list_reduce(
                       list_prepend(0.0, list_transform(tk, t ->
                         CAST((CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 4096)
                              % 997 AS DOUBLE) / 997.0 - 0.5)),
                       (a, b) -> a + b) / CAST(len(tk) AS DOUBLE)
                   ELSE 0.0 END))), 6) AS score
          FROM toks
        ), ranked AS (
          SELECT doc_id, score,
                 CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) - 1
                      AS BIGINT) AS rank,
                 count(*) OVER () AS n
          FROM scored
        )
        SELECT doc_id, score, rank,
               CAST((rank * 4) // n AS INTEGER) AS shard
        FROM ranked
    """,
    "llm_vocab_coverage": r"""
        WITH toks AS (
          SELECT CASE WHEN length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0 THEN []
                      ELSE string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') END AS t
          FROM documents
        ), g AS (
          SELECT unnest(t) AS tok FROM toks
        ), counts AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY tok
        ), total AS (
          SELECT sum(cnt) AS total FROM counts
        ), top AS (
          SELECT tok, cnt FROM counts ORDER BY cnt DESC, tok ASC LIMIT 500
        )
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rank,
               tok, cnt,
               CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
               / CAST(t.total AS DOUBLE) AS cum_share
        FROM top CROSS JOIN total t
    """,
    "llm_anchor_positives": r"""
        WITH pairs AS (
          SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
                 c.vec_id AS pos_id,
                 round(
                   list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
                   6) AS similarity
          FROM embeddings q CROSS JOIN embeddings c
          WHERE q.vec_id <> c.vec_id AND q.label = c.label
        )
        SELECT anchor_id, anchor_label, pos_id, similarity FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY similarity DESC, pos_id ASC) AS rank
          FROM pairs
        ) WHERE rank <= 1
    """,
    "llm_hard_negatives": r"""
        WITH pairs AS (
          SELECT q.vec_id AS anchor_id, q.label AS anchor_label,
                 c.vec_id AS neg_id, c.label AS neg_label,
                 round(
                   list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
                   6) AS similarity
          FROM embeddings q CROSS JOIN embeddings c
          WHERE q.vec_id <> c.vec_id AND q.label <> c.label
        )
        SELECT anchor_id, anchor_label, neg_id, neg_label, similarity, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor_id
                                       ORDER BY similarity DESC, neg_id ASC) AS rank
          FROM pairs
        ) WHERE rank <= 2
    """,
    "llm_negative_pairs": r"""
        WITH n AS (SELECT max(vec_id) + 1 AS n FROM embeddings),
        cand AS (
          SELECT e.vec_id AS anchor_id, e.label AS anchor_label,
                 CAST(s.j AS INTEGER) AS slot,
                 CAST('0x' || substr(md5(CAST(e.vec_id AS VARCHAR) || '|'
                                         || CAST(s.j AS VARCHAR)), 1, 15)
                      AS BIGINT) % n.n AS cand_id
          FROM embeddings e
          CROSS JOIN n
          CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) s
        )
        SELECT c.anchor_id, c.anchor_label, c.slot,
               t.vec_id AS neg_id, t.label AS neg_label
        FROM cand c
        JOIN embeddings t ON c.cand_id = t.vec_id
        WHERE t.vec_id <> c.anchor_id AND t.label <> c.anchor_label
    """,
    "llm_robots_filter": r"""
        WITH src AS (
          SELECT DISTINCT source, CAST(substr(source, 4, 10) AS INTEGER) AS k
          FROM documents
        ), rules AS (
          SELECT source || '.com' AS domain, '/A/' AS prefix, true AS allow
          FROM src WHERE k % 2 = 1
          UNION ALL
          SELECT source || '.com', '/A/7', false FROM src
          UNION ALL
          SELECT source || '.com', '/A/3', false FROM src WHERE k % 2 = 0
          UNION ALL
          SELECT source || '.com', '/A/5', true FROM src
          UNION ALL
          SELECT source || '.com', '/A/5', false FROM src
        ), urls AS (
          SELECT doc_id, source || '.com' AS domain,
                 '/A/' || CAST(doc_id % 10 AS VARCHAR)
                 || '/p' || CAST(doc_id % 7 AS VARCHAR) AS path
          FROM documents
        ), m AS (
          SELECT u.doc_id, r.prefix, r.allow,
                 row_number() OVER (
                   PARTITION BY u.doc_id
                   ORDER BY length(r.prefix) DESC, r.allow ASC, r.prefix DESC
                 ) AS rk
          FROM urls u
          JOIN rules r ON u.domain = r.domain AND starts_with(u.path, r.prefix)
        )
        SELECT u.doc_id, u.domain, u.path,
               coalesce(m.allow, true) AS allowed,
               m.prefix AS matched_prefix
        FROM urls u
        LEFT JOIN (SELECT doc_id, prefix, allow FROM m WHERE rk = 1) m
          USING (doc_id)
    """,
    "llm_quality_classifier": r"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             t -> length(t) > 0) AS tk
          FROM documents
        ), scored AS (
          SELECT doc_id, len(tk) AS n_tokens,
                 CASE WHEN len(tk) > 0 THEN
                   list_reduce(
                     list_prepend(0.0, list_transform(tk, t ->
                       CAST((CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 4096)
                            % 997 AS DOUBLE) / 997.0 - 0.5)),
                     (a, b) -> a + b) / CAST(len(tk) AS DOUBLE)
                 ELSE 0.0 END AS margin
          FROM toks
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, margin,
               round(1.0 / (1.0 + exp(-4.0 * margin)), 6) AS score,
               margin >= 0 AS keep
        FROM scored
    """,
    "llm_gopher_rules": f"""
        WITH {_gopher_cte('w', 'm', 'doc_id,')}
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_frac,
               ellipsis_line_frac, alpha_word_frac, stop_hits,
               ({_GOPHER_KEEP}) AS keep
        FROM m
    """,
}

# Shared exact-substring-dedup CTE chain (k = 8, min_occurrences = 2,
# keep_first): window occurrences -> corpus-wide duplicate marking with
# the globally-first copy spared -> per-doc maximal-span merge.  ONE
# definition feeding both llm_substring_spans and llm_substring_strip,
# mirroring llm.dedup.substring_dup_spans.
_SUBSTR_SPANS = f"""toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), occ AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t) - 6),
                   i -> struct_pack(s := i - 1,
                                    win := array_to_string(t[i:i+7], ' ')))) AS o
          FROM toks WHERE len(t) >= 8
        ), o2 AS (
          SELECT doc_id, o.s AS start, o.win AS win FROM occ
        ), m AS (
          SELECT doc_id, start,
                 count(*) OVER (PARTITION BY win) AS n_occ,
                 row_number() OVER (PARTITION BY win ORDER BY doc_id, start) AS rn
          FROM o2
        ), dup AS (
          SELECT doc_id, start FROM m WHERE n_occ >= 2 AND rn > 1
        ), isl AS (
          SELECT doc_id, start,
                 CASE WHEN max(start + 8) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                      OR start > max(start + 8) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS brk
          FROM dup
        ), grp AS (
          SELECT doc_id, start,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY start) AS island
          FROM isl
        ), spans AS (
          SELECT doc_id, min(start) AS s, max(start) + 8 AS e
          FROM grp GROUP BY doc_id, island
        )"""

LLM_ORACLES["llm_substring_spans"] = f"""
        WITH {_SUBSTR_SPANS}
        SELECT doc_id,
               CAST(s AS BIGINT) AS span_start,
               CAST(e AS BIGINT) AS span_end,
               CAST(e - s AS BIGINT) AS n_span_tokens
        FROM spans
    """

LLM_ORACLES["llm_substring_strip"] = f"""
        WITH {_SUBSTR_SPANS}, sp AS (
          SELECT doc_id, list(struct_pack(s := s, e := e)) AS sps
          FROM spans GROUP BY doc_id
        ), kept AS (
          SELECT t.doc_id, t.t,
                 list_filter(t.t, (x, i) ->
                   len(list_filter(coalesce(sp.sps, []),
                       s2 -> (i - 1) >= s2.s AND (i - 1) < s2.e)) = 0) AS kt
          FROM toks t LEFT JOIN sp ON t.doc_id = sp.doc_id
        )
        SELECT doc_id,
               -- array_to_string([]) is NULL in DuckDB; a fully
               -- stripped doc must yield '' like Spark's concat_ws
               CASE WHEN len(kt) = 0 THEN ''
                    ELSE array_to_string(kt, ' ') END AS text_clean,
               CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(len(t) - len(kt) AS BIGINT) AS n_removed
        FROM kept
    """

LLM_ORACLES["llm_perplexity_buckets"] = f"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), idx AS (
          SELECT doc_id, t, unnest(range(1, len(t))) AS i
          FROM toks WHERE len(t) >= 2
        ), ex AS (
          SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bg FROM idx
        ), uni AS (
          SELECT unnest(t) AS w1 FROM toks
        ), c_uni AS (
          SELECT w1, count(*) AS c_w1 FROM uni GROUP BY w1
        ), c_bg AS (
          SELECT bg, count(*) AS c_bg FROM ex GROUP BY bg
        ), scored AS (
          -- add-1 (Laplace) smoothed model, matching
          -- bigram_logprob(add_k=1): V = unigram vocabulary size
          SELECT ex.doc_id, count(*) AS n_bigrams,
                 round(CAST(sum(CAST(round(ln((CAST(c_bg.c_bg AS DOUBLE) + 1.0)
                                              / (c_uni.c_w1 + 1.0 * (SELECT count(*) FROM c_uni))), 9)
                                     AS DECIMAL(20,9))) / count(*) AS DOUBLE), 6) AS avg_logprob
          FROM ex JOIN c_bg USING (bg) JOIN c_uni USING (w1)
          GROUP BY ex.doc_id
        ), j AS (
          SELECT d.doc_id, d.lang, s.n_bigrams, s.avg_logprob
          FROM documents d LEFT JOIN scored s USING (doc_id)
        ), ranked AS (
          SELECT *,
                 percent_rank() OVER (PARTITION BY lang
                                      ORDER BY avg_logprob DESC, doc_id) AS pr
          FROM j WHERE avg_logprob IS NOT NULL
        )
        SELECT doc_id, lang, n_bigrams, avg_logprob,
               CASE WHEN pr < 1.0/3 THEN 'head'
                    WHEN pr >= 1 - 1.0/3 THEN 'tail'
                    ELSE 'middle' END AS bucket
        FROM ranked
        UNION ALL
        SELECT doc_id, lang, n_bigrams, avg_logprob, 'unscored' AS bucket
        FROM j WHERE avg_logprob IS NULL
    """

LLM_ORACLES["llm_fim_transform"] = f"""
        WITH base AS (
          SELECT doc_id, {_NORM} AS s, length({_NORM}) AS ln,
                 (((doc_id * 131 + 0) % 2147483648) * 2654435761 + 12345)
                   % 1000000007 AS h0,
                 (((doc_id * 131 + 1) % 2147483648) * 2654435761 + 12345)
                   % 1000000007 AS h1,
                 (((doc_id * 131 + 2) % 2147483648) * 2654435761 + 12345)
                   % 1000000007 AS h2
          FROM documents
        ), pts AS (
          SELECT doc_id, s, ln,
                 (h0 % 1000) < 500 AS applied,
                 least(h1 % (ln + 1), h2 % (ln + 1)) AS s1,
                 greatest(h1 % (ln + 1), h2 % (ln + 1)) AS s2
          FROM base
        )
        SELECT doc_id, applied AS fim_applied,
               CASE WHEN applied THEN CAST(s1 AS BIGINT) END AS split_1,
               CASE WHEN applied THEN CAST(s2 AS BIGINT) END AS split_2,
               CASE WHEN applied THEN
                 '<PRE>' || substr(s, 1, s1) || '<SUF>'
                         || substr(s, s2 + 1, ln - s2) || '<MID>'
                         || substr(s, s1 + 1, s2 - s1)
               ELSE s END AS psm
        FROM pts
    """

# Shared chat-turn CTE: 8-token alternating-role turns, mirroring
# llm.chat.synth_conversations.
_CHAT_TOKS = f"""toks AS (
          SELECT doc_id,
                 CASE WHEN length({_NORM}) = 0 THEN []
                      ELSE string_split({_NORM}, ' ') END AS t
          FROM documents
        ), conv AS (
          SELECT doc_id, t, CAST(ceil(len(t) / 8.0) AS INT) AS n
          FROM toks
        )"""

LLM_ORACLES["llm_chat_render"] = f"""
        WITH {_CHAT_TOKS}
        SELECT doc_id,
               CAST(CASE WHEN len(t) = 0 THEN 0 ELSE n END AS BIGINT) AS n_turns,
               CASE WHEN len(t) = 0 THEN ''
                    ELSE array_to_string(list_transform(range(0, n), i ->
                      '<|im_start|>'
                      || CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
                      || chr(10)
                      || array_to_string(t[8*i+1:8*i+8], ' ')
                      || '<|im_end|>' || chr(10)), '') END AS rendered
        FROM conv
    """

LLM_ORACLES["llm_chat_stats"] = f"""
        WITH {_CHAT_TOKS}, counted AS (
          SELECT doc_id,
                 CASE WHEN len(t) = 0 THEN 0 ELSE n END AS n_turns,
                 coalesce(list_sum(list_transform(range(0, n), i ->
                   CASE WHEN i % 2 = 0 THEN len(t[8*i+1:8*i+8]) ELSE 0 END)), 0) AS nu,
                 coalesce(list_sum(list_transform(range(0, n), i ->
                   CASE WHEN i % 2 = 1 THEN len(t[8*i+1:8*i+8]) ELSE 0 END)), 0) AS na
          FROM conv
        )
        SELECT doc_id,
               CAST(n_turns AS BIGINT) AS n_turns,
               CAST(nu AS BIGINT) AS n_user_tokens,
               CAST(na AS BIGINT) AS n_assistant_tokens,
               CASE WHEN nu + na > 0 THEN round(na / (nu + na), 6) END AS assistant_share
        FROM counted
    """

LLM_ORACLES["llm_leakage_safe_split"] = _CC_CTE + """
        , lab AS (
          SELECT node AS doc_id, min(label) AS cluster_id FROM cc GROUP BY node
        ), hashed AS (
          SELECT doc_id, cluster_id,
                 (((cluster_id * 131 + 7) % 2147483648) * 2654435761 + 12345)
                   % 1000000007 % 1000 AS r
          FROM lab
        )
        SELECT doc_id, cluster_id,
               CASE WHEN r < 100 THEN 'test'
                    WHEN r < 200 THEN 'val'
                    ELSE 'train' END AS split
        FROM hashed
    """

# Closed-form EXPECTED rule set for the synthesized robots bodies in
# llm_robots_parse -- the oracle states the parse's contract instead of
# re-implementing the parser, so a symmetric parsing bug cannot cancel.
LLM_ORACLES["llm_robots_parse"] = """
        WITH src AS (
          SELECT source, count(*) AS n FROM documents GROUP BY source
        )
        SELECT source || '.example' AS domain,
               '/docs/' || source AS prefix,
               true AS allow
        FROM src
        UNION ALL
        SELECT source || '.example', '/private', false FROM src
        UNION ALL
        SELECT source || '.example', '/tmp/' || CAST(n AS VARCHAR), false FROM src
    """

LLM_ORACLES["llm_encoding_quality"] = """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(text) - length(replace(text, '\ufffd', ''))
                    AS BIGINT) AS n_replacement,
               CAST(len(regexp_extract_all(text, '(\u00c3.|\u00c2.|\u00e2\u20ac)'))
                    AS BIGINT) AS n_mojibake,
               CASE WHEN length(text) > 0
                    THEN round((length(text) - length(replace(text, '\ufffd', ''))
                                + len(regexp_extract_all(text, '(\u00c3.|\u00c2.|\u00e2\u20ac)')))
                               / length(text), 6)
                    ELSE 0.0 END AS bad_ratio
        FROM documents
    """

LLM_ORACLES["llm_bm25"] = f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN []
                  ELSE string_split({_NORM}, ' ') END AS t
      FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, sum(len(t)) AS total_len FROM toks
    ), ex AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM ex WHERE term IN ('dup', 'vector', 'hash', 'scan', 'window')
      GROUP BY 1, 2, 3
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), scored AS (
      SELECT tf.doc_id,
             CAST(count(*) AS BIGINT) AS n_terms,
             round(CAST(sum(CAST(round(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (0.25 + 0.75 * (dl / (CAST(total_len AS DOUBLE) / n_docs)))),
             9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS bm25
      FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, n_terms, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT 20
"""

LLM_ORACLES["llm_preference_pairs"] = """
    WITH comp AS (
      SELECT doc_id % 97 AS prompt_id, doc_id AS completion_id, n_chars AS score
      FROM documents WHERE n_chars IS NOT NULL
    ), ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY prompt_id
                                ORDER BY score DESC, completion_id DESC) AS rhi,
             row_number() OVER (PARTITION BY prompt_id
                                ORDER BY score ASC, completion_id ASC) AS rlo,
             count(*) OVER (PARTITION BY prompt_id) AS n
      FROM comp
    )
    SELECT prompt_id,
           max(CASE WHEN rhi = 1 THEN completion_id END) AS chosen_id,
           max(CASE WHEN rlo = 1 THEN completion_id END) AS rejected_id,
           max(CASE WHEN rhi = 1 THEN score END) AS chosen_score,
           max(CASE WHEN rlo = 1 THEN score END) AS rejected_score,
           max(CASE WHEN rhi = 1 THEN score END)
             - max(CASE WHEN rlo = 1 THEN score END) AS margin,
           CAST(max(n) AS BIGINT) AS n_completions
    FROM ranked WHERE n >= 2 GROUP BY prompt_id
"""

LLM_ORACLES["llm_length_buckets"] = r"""
    WITH n_t AS (
      SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      FROM documents
    ), b AS (
      SELECT n,
             CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32
                  WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
                  WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                  ELSE 1024 END AS bucket,
             least(n, 1024) AS kept,
             CASE WHEN n > 1024 THEN 1 ELSE 0 END AS trunc
      FROM n_t
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_tokens,
           CAST(sum(kept) AS BIGINT) AS kept_tokens,
           CAST(sum(trunc) AS BIGINT) AS n_truncated,
           round(1.0 - sum(kept) / (count(*) * bucket), 6) AS pad_frac
    FROM b GROUP BY bucket ORDER BY bucket
"""

LLM_ORACLES["llm_rrf_fusion"] = f"""
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length({_NORM}) = 0 THEN []
                  ELSE string_split({_NORM}, ' ') END AS t
      FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, sum(len(t)) AS total_len FROM toks
    ), ex AS (
      SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM toks
    ), tf AS (
      SELECT doc_id, dl, term, count(*) AS tf
      FROM ex WHERE term IN ('dup', 'vector', 'hash', 'scan', 'window')
      GROUP BY 1, 2, 3
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), bm AS (
      SELECT tf.doc_id,
             round(CAST(sum(CAST(round(
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * 2.2)
               / (tf + 1.2 * (0.25 + 0.75 * (dl / (CAST(total_len AS DOUBLE) / n_docs)))),
             9) AS DECIMAL(20,9))) AS DOUBLE), 6) AS bm25
      FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN stats
      GROUP BY tf.doc_id
    ), bm_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank
      FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 50
    ), cos AS (
      SELECT c.vec_id AS doc_id,
             round(
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))),
               6) AS similarity
      FROM embeddings q CROSS JOIN embeddings c
      WHERE q.vec_id = 0 AND c.vec_id <> 0
    ), cos_ranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY similarity DESC, doc_id ASC) AS rank
      FROM cos ORDER BY similarity DESC, doc_id ASC LIMIT 50
    ), fused AS (
      SELECT doc_id, CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(20,9)) AS t
      FROM bm_ranked
      UNION ALL
      SELECT doc_id, CAST(round(1.0 / (60 + rank), 9) AS DECIMAL(20,9)) AS t
      FROM cos_ranked
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_systems,
           round(CAST(sum(t) AS DOUBLE), 6) AS rrf_score
    FROM fused GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
"""

LLM_ORACLES["a42_group_ols"] = """
    WITH src AS (
      SELECT event_type,
             CAST(CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE)
                  AS DECIMAL(18,2)) AS x,
             CAST(value AS DECIMAL(18,2)) AS y
      FROM events
    ), agg AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
             sum(x*x) AS sxx, sum(y*y) AS syy
      FROM src GROUP BY event_type
    ), fin AS (
      SELECT event_type, n,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)/n AS cov,
             CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)/n AS vx,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n AS vy,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM agg
    )
    SELECT event_type, n,
           round(CASE WHEN n > 1 AND vx > 0 THEN cov/vx END, 6) AS slope,
           round(CASE WHEN n > 1 AND vx > 0
                      THEN (syd - (cov/vx)*sxd)/n END, 6) AS intercept,
           round(CASE WHEN n > 1 AND vx > 0 AND vy > 0
                      THEN (cov*cov)/(vx*vy) END, 6) AS r2
    FROM fin
"""

LLM_ORACLES["w_holt"] = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), ser AS (
      SELECT event_type, list(v ORDER BY d) AS vs, count(*) AS n_points
      FROM daily GROUP BY event_type
    ), folded AS (
      SELECT event_type, n_points,
             list_reduce(
               list_transform(vs, x -> [x, CAST(0.0 AS DOUBLE)]),
               (acc, e) -> [0.5*e[1] + 0.5*(acc[1] + acc[2]),
                            0.25*(0.5*(e[1] - acc[1]) + 0.5*acc[2]) + 0.75*acc[2]]
             ) AS st
      FROM ser
    )
    SELECT event_type, CAST(n_points AS BIGINT) AS n_points,
           round(st[1], 6) AS level, round(st[2], 6) AS trend,
           round(st[1] + st[2], 6) AS forecast
    FROM folded
"""

LLM_ORACLES["w_holt_winters"] = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), ser AS (
      SELECT event_type, list(v ORDER BY d) AS vs, count(*) AS n_points
      FROM daily GROUP BY event_type
    ), seeded AS (
      SELECT event_type, vs, n_points,
             list_reduce(vs[1:7], (a, b) -> a + b) / 7.0 AS mean0
      FROM ser
    ), folded AS (
      SELECT event_type, n_points,
        CASE WHEN n_points > 7 THEN
          list_reduce(
            list_prepend(
              list_concat([mean0, CAST(0.0 AS DOUBLE)],
                          list_transform(vs[1:7], x -> x - mean0)),
              list_transform(vs[8:], x -> [x])
            ),
            (acc, e) -> list_concat(
              list_concat(
                [0.5*(e[1] - acc[3]) + 0.5*(acc[1] + acc[2]),
                 0.25*((0.5*(e[1] - acc[3]) + 0.5*(acc[1] + acc[2])) - acc[1])
                   + 0.75*acc[2]],
                acc[4:9]),
              [0.5*(e[1] - (0.5*(e[1] - acc[3]) + 0.5*(acc[1] + acc[2])))
                 + 0.5*acc[3]]
            )
          )
        END AS st
      FROM seeded
    )
    SELECT event_type, CAST(n_points AS BIGINT) AS n_points,
           round(st[1], 6) AS level, round(st[2], 6) AS trend,
           round(st[3], 6) AS season_next,
           round(st[1] + st[2] + st[3], 6) AS forecast
    FROM folded
"""

LLM_ORACLES["w_cusum"] = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(count(*) AS DOUBLE)
             + CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-21'
                    THEN 50.0 ELSE 0.0 END AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), ser AS (
      SELECT event_type, list(v ORDER BY d) AS vs, count(v) AS n,
             sum(CAST(v AS DECIMAL(18,2))) AS sy,
             sum(CAST(v AS DECIMAL(18,2)) * CAST(v AS DECIMAL(18,2))) AS syy
      FROM daily GROUP BY event_type
    ), stats AS (
      SELECT event_type, vs, n,
             CAST(sy AS DOUBLE) / n AS mean,
             CASE WHEN n > 1
                   AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)/(n - 1.0) > 0
                  THEN sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)/n)/(n - 1.0))
             END AS std
      FROM ser
    ), folded AS (
      SELECT event_type, len(vs) AS n_points,
             CASE WHEN std IS NOT NULL THEN
               list_reduce(
                 list_prepend([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, 0.0]::DOUBLE[],
                              list_transform(vs, x -> [(x - mean)/std])),
                 (acc, e) -> [
                   greatest(0.0, acc[1] + e[1] - 0.5),
                   greatest(0.0, acc[2] - e[1] - 0.5),
                   greatest(acc[3], greatest(0.0, acc[1] + e[1] - 0.5)),
                   greatest(acc[4], greatest(0.0, acc[2] - e[1] - 0.5)),
                   CASE WHEN acc[5] < 0 AND greatest(0.0, acc[1] + e[1] - 0.5) > 4.0
                        THEN acc[7] + 1.0 ELSE acc[5] END,
                   CASE WHEN acc[6] < 0 AND greatest(0.0, acc[2] - e[1] - 0.5) > 4.0
                        THEN acc[7] + 1.0 ELSE acc[6] END,
                   acc[7] + 1.0
                 ])
             END AS st
      FROM stats
    )
    SELECT event_type, CAST(n_points AS BIGINT) AS n_points,
           round(st[3], 6) AS cusum_max_up,
           round(st[4], 6) AS cusum_max_down,
           CAST(CASE WHEN st[5] >= 0 THEN st[5] END AS BIGINT) AS first_alarm_up,
           CAST(CASE WHEN st[6] >= 0 THEN st[6] END AS BIGINT) AS first_alarm_down
    FROM folded
"""


from .oracles_core import CORE_ORACLES as _CORE

LLM_ORACLES["v15_monitor"] = f"""
    SELECT 'freshness_gap_days' AS metric,
           CAST(sum(CASE WHEN is_gap THEN 1 ELSE 0 END) AS DOUBLE) AS value
    FROM ({_CORE['v8_freshness']})
    UNION ALL
    SELECT 'psi_total',
           round(CAST(sum(CAST(psi_term AS DECIMAL(18,6))) AS DOUBLE), 6)
    FROM ({_CORE['v12_psi']})
    UNION ALL
    SELECT 'benford_chi2',
           round(CAST(sum(CAST(chi2_term AS DECIMAL(18,6))) AS DOUBLE), 6)
    FROM ({_CORE['v13_benford']})
    UNION ALL
    SELECT 'cusum_alarmed_types',
           CAST(sum(CASE WHEN first_alarm_up IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    FROM ({LLM_ORACLES['w_cusum']})
"""

LLM_ORACLES["w_twap"] = """
    WITH src AS (
      SELECT event_type, CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
             event_id, CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    ), led AS (
      SELECT event_type, v,
             CAST(lead(s) OVER (PARTITION BY event_type ORDER BY s, event_id) - s
                  AS DECIMAL(18,0)) AS dt
      FROM src
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           round(CASE WHEN sum(dt) > 0
                      THEN CAST(sum(v * dt) AS DOUBLE) / CAST(sum(dt) AS DOUBLE)
                 END, 6) AS twap,
           CAST(sum(dt) AS BIGINT) AS span_s
    FROM led WHERE dt IS NOT NULL
    GROUP BY event_type
"""

LLM_ORACLES["w_resample_locf"] = """
    WITH obs AS (
      SELECT date_trunc('day', ts) AS window_start, event_type,
             CAST(value AS DOUBLE) AS v,
             row_number() OVER (
               PARTITION BY date_trunc('day', ts), event_type
               ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    ), per_bucket AS (
      SELECT window_start, event_type, v FROM obs WHERE rn = 1
    ), rng AS (
      SELECT date_trunc('day', min(ts)) AS lo, date_trunc('day', max(ts)) AS hi
      FROM events
    ), spine_times AS (
      SELECT unnest(generate_series((SELECT lo FROM rng), (SELECT hi FROM rng),
                                    INTERVAL 1 DAY)) AS window_start
    ), spine AS (
      SELECT s.window_start, g.event_type
      FROM spine_times s CROSS JOIN (SELECT DISTINCT event_type FROM events) g
    )
    SELECT s.window_start, s.event_type,
           round(last_value(p.v IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.window_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value_locf
    FROM spine s LEFT JOIN per_bucket p
      ON s.window_start = p.window_start AND s.event_type = p.event_type
"""

LLM_ORACLES["a45_mann_whitney"] = """
    WITH two AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ), ranked AS (
      SELECT g, v,
             rank() OVER (ORDER BY v) AS minrank,
             count(*) OVER (PARTITION BY v) AS ties
      FROM two
    ), sums AS (
      SELECT CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             sum(CASE WHEN g = 'click'
                      THEN 2 * CAST(minrank AS DECIMAL(38,0)) + ties - 1 END) AS ra2
      FROM ranked
    ), tcorr AS (
      SELECT sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tc FROM (
        SELECT count(*) AS t FROM two GROUP BY v
      )
    )
    SELECT n_a, n_b,
           round(CAST(ra2 AS DOUBLE) / 2.0
                 - CAST(n_a AS DOUBLE) * (n_a + 1.0) / 2.0, 6) AS u_stat,
           round(CASE WHEN (CAST(n_a AS DOUBLE) * n_b / 12.0)
                           * ((n_a + n_b + 1.0)
                              - CAST(tc AS DOUBLE)
                                / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0))) > 0
                      THEN (CAST(ra2 AS DOUBLE) / 2.0
                            - CAST(n_a AS DOUBLE) * (n_a + 1.0) / 2.0
                            - CAST(n_a AS DOUBLE) * n_b / 2.0)
                           / sqrt((CAST(n_a AS DOUBLE) * n_b / 12.0)
                                  * ((n_a + n_b + 1.0)
                                     - CAST(tc AS DOUBLE)
                                       / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1.0))))
                 END, 6) AS z,
           round(1.0 - 2.0 * (CAST(n_a AS DOUBLE) * n_b
                              - (CAST(ra2 AS DOUBLE) / 2.0
                                 - CAST(n_a AS DOUBLE) * (n_a + 1.0) / 2.0))
                       / (CAST(n_a AS DOUBLE) * n_b), 6) AS r_rb
    FROM sums CROSS JOIN tcorr
"""

LLM_ORACLES["a53_kruskal_wallis"] = """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
    ), ranked AS (
      SELECT g, v,
             rank() OVER (ORDER BY v) AS minrank,
             count(*) OVER (PARTITION BY v) AS ties
      FROM base
    ), grp AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n,
             sum(2 * CAST(minrank AS DECIMAL(38,0)) + ties - 1) AS r2
      FROM ranked GROUP BY g
    ), terms AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_total,
             sum(CAST(round((CAST(r2 AS DOUBLE) / 2.0)
                            * (CAST(r2 AS DOUBLE) / 2.0)
                            / CAST(n AS DOUBLE), 3) AS DECIMAL(38,3))) AS s
      FROM grp
    ), tcorr AS (
      SELECT sum(CAST(t AS DECIMAL(38,0)) * t * t - t) AS tc FROM (
        SELECT count(*) AS t FROM base GROUP BY v
      )
    )
    SELECT n_groups, n_total,
           round(12.0 / (CAST(n_total AS DOUBLE) * (n_total + 1.0))
                 * CAST(s AS DOUBLE) - 3.0 * (n_total + 1.0), 6) AS h,
           round(CASE WHEN 1.0 - CAST(tc AS DOUBLE)
                           / (CAST(n_total AS DOUBLE) * n_total * n_total
                              - n_total) > 0
                      THEN (12.0 / (CAST(n_total AS DOUBLE) * (n_total + 1.0))
                            * CAST(s AS DOUBLE) - 3.0 * (n_total + 1.0))
                           / (1.0 - CAST(tc AS DOUBLE)
                              / (CAST(n_total AS DOUBLE) * n_total * n_total
                                 - n_total))
                 END, 6) AS h_corrected
    FROM terms CROSS JOIN tcorr
"""

LLM_ORACLES["a54_brown_forsythe"] = """
    WITH base AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL
    ), per_gv AS (
      SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, v
    ), run AS (
      SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS le
      FROM per_gv
    ), ng AS (
      SELECT g, CAST(sum(c) AS BIGINT) AS n FROM per_gv GROUP BY g
    ), med AS (
      SELECT r.g,
             (min(CASE WHEN r.le >= (ng.n + 1) // 2
                        AND r.le - r.c < (ng.n + 1) // 2 THEN r.v END)
            + min(CASE WHEN r.le >= (ng.n + 2) // 2
                        AND r.le - r.c < (ng.n + 2) // 2 THEN r.v END)) / 2.0
             AS m
      FROM run r JOIN ng ON r.g = ng.g GROUP BY r.g
    ), grp AS (
      SELECT p.g, CAST(sum(p.c) AS BIGINT) AS n,
             sum(p.c * CAST(round(abs(p.v - m.m), 6) AS DECIMAL(18,6))) AS s1,
             sum(p.c * CAST(round(abs(p.v - m.m), 6) AS DECIMAL(18,6))
                     * CAST(round(abs(p.v - m.m), 6) AS DECIMAL(18,6))) AS s2
      FROM per_gv p JOIN med m ON p.g = m.g GROUP BY p.g
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_groups,
             CAST(sum(n) AS BIGINT) AS n_total,
             sum(s1) AS t1
      FROM grp
    ), terms AS (
      SELECT n_groups, n_total,
             sum(CAST(round(CAST(n AS DOUBLE)
                            * (CAST(s1 AS DOUBLE) / n
                               - CAST(t1 AS DOUBLE) / n_total)
                            * (CAST(s1 AS DOUBLE) / n
                               - CAST(t1 AS DOUBLE) / n_total), 6)
                      AS DECIMAL(38,6))) AS b,
             sum(CAST(round(CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE)
                              * (CAST(s1 AS DOUBLE) / n), 6)
                      AS DECIMAL(38,6))) AS w
      FROM grp CROSS JOIN tot GROUP BY n_groups, n_total
    )
    SELECT n_groups, n_total,
           round(CAST(b AS DOUBLE), 6) AS between_ss,
           round(CAST(w AS DOUBLE), 6) AS within_ss,
           round(CASE WHEN n_groups > 1 AND CAST(w AS DOUBLE) > 0
                      THEN (CAST(n_total AS DOUBLE) - n_groups)
                           / (n_groups - 1.0)
                           * CAST(b AS DOUBLE) / CAST(w AS DOUBLE)
                 END, 6) AS f_bf
    FROM terms
"""

LLM_ORACLES["a55_welch_ttest"] = """
    WITH two AS (
      SELECT event_type AS g, CAST(value AS DOUBLE) AS v
      FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ), agg AS (
      SELECT
        CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        sum(CASE WHEN g = 'click' THEN CAST(v AS DECIMAL(18,6)) END) AS s1a,
        sum(CASE WHEN g = 'purchase' THEN CAST(v AS DECIMAL(18,6)) END) AS s1b,
        sum(CASE WHEN g = 'click'
                 THEN CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)) END)
          AS s2a,
        sum(CASE WHEN g = 'purchase'
                 THEN CAST(v AS DECIMAL(18,6)) * CAST(v AS DECIMAL(18,6)) END)
          AS s2b
      FROM two
    ), d AS (
      SELECT n_a, n_b,
             CAST(s1a AS DOUBLE) / n_a AS ma,
             CAST(s1b AS DOUBLE) / n_b AS mb,
             (CAST(s2a AS DOUBLE)
              - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE) / n_a)
             / (n_a - 1.0) / n_a AS sa,
             (CAST(s2b AS DOUBLE)
              - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE) / n_b)
             / (n_b - 1.0) / n_b AS sb
      FROM agg
    )
    SELECT n_a, n_b,
           round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND sa + sb > 0
                      THEN (ma - mb) / sqrt(sa + sb) END, 6) AS t_stat,
           round(CASE WHEN n_a > 1 AND n_b > 1 AND sa + sb > 0
                      THEN (sa + sb) * (sa + sb)
                           / (sa * sa / (n_a - 1.0) + sb * sb / (n_b - 1.0))
                 END, 6) AS df
    FROM d
"""

LLM_ORACLES["llm_rouge"] = """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0
                  THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS ref_id, b.doc_id AS cand_id
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ), c1 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id, unnest(t) AS g FROM toks
      ) GROUP BY doc_id, g
    ), t1 AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS tot FROM toks
    ), o1 AS (
      SELECT a.doc_id AS ref_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM c1 a JOIN c1 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
      GROUP BY a.doc_id
    ), c2 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id,
               t[CAST(i AS INTEGER)] || ' ' || t[CAST(i + 1 AS INTEGER)] AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks WHERE len(t) >= 2)
      ) GROUP BY doc_id, g
    ), t2 AS (
      SELECT doc_id, CAST(greatest(len(t) - 1, 0) AS BIGINT) AS tot FROM toks
    ), o2 AS (
      SELECT a.doc_id AS ref_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM c2 a JOIN c2 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
      GROUP BY a.doc_id
    ), raw AS (
      SELECT p.ref_id, p.cand_id, 1 AS n,
             coalesce(o1.ov, 0) AS n_overlap, tr.tot AS n_ref, tc.tot AS n_cand
      FROM pairs p
      JOIN t1 tr ON tr.doc_id = p.ref_id
      JOIN t1 tc ON tc.doc_id = p.cand_id
      LEFT JOIN o1 ON o1.ref_id = p.ref_id
      WHERE tr.tot > 0 OR tc.tot > 0
      UNION ALL
      SELECT p.ref_id, p.cand_id, 2 AS n,
             coalesce(o2.ov, 0), tr.tot, tc.tot
      FROM pairs p
      JOIN t2 tr ON tr.doc_id = p.ref_id
      JOIN t2 tc ON tc.doc_id = p.cand_id
      LEFT JOIN o2 ON o2.ref_id = p.ref_id
      WHERE tr.tot > 0 OR tc.tot > 0
    )
    SELECT ref_id, cand_id, CAST(n AS INTEGER) AS n,
           n_overlap, n_ref, n_cand,
           round(CASE WHEN n_cand > 0
                      THEN CAST(n_overlap AS DOUBLE) / n_cand END, 6) AS precision,
           round(CASE WHEN n_ref > 0
                      THEN CAST(n_overlap AS DOUBLE) / n_ref END, 6) AS recall,
           round(CASE WHEN n_ref > 0 AND n_cand > 0
                       AND CAST(n_overlap AS DOUBLE) / n_cand
                           + CAST(n_overlap AS DOUBLE) / n_ref > 0
                      THEN 2.0 * (CAST(n_overlap AS DOUBLE) / n_cand)
                               * (CAST(n_overlap AS DOUBLE) / n_ref)
                           / (CAST(n_overlap AS DOUBLE) / n_cand
                              + CAST(n_overlap AS DOUBLE) / n_ref)
                 END, 6) AS f1
    FROM raw
"""

# Shared CTE chain for the BLEU family: tokenize -> per-level gram
# counts -> adjacent-pair clipped overlaps -> per-pair raw counts.
# llm_bleu finishes per pair; llm_bleu_corpus sums the raw counts
# over all pairs first (the Papineni corpus form).
_BLEU_CHAIN = """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0
                  THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS ref_id, b.doc_id AS cand_id
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ), c1 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id, unnest(t) AS g FROM toks
      ) GROUP BY doc_id, g
    ), c2 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i+1 AS INTEGER)] AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
              FROM toks WHERE len(t) >= 2)
      ) GROUP BY doc_id, g
    ), c3 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i+1 AS INTEGER)]
                       || ' ' || t[CAST(i+2 AS INTEGER)] AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)
      ) GROUP BY doc_id, g
    ), c4 AS (
      SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT doc_id, t[CAST(i AS INTEGER)] || ' ' || t[CAST(i+1 AS INTEGER)]
                       || ' ' || t[CAST(i+2 AS INTEGER)]
                       || ' ' || t[CAST(i+3 AS INTEGER)] AS g
        FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 3)) AS i
              FROM toks WHERE len(t) >= 4)
      ) GROUP BY doc_id, g
    ), tt AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS t1,
             CAST(greatest(len(t) - 1, 0) AS BIGINT) AS t2,
             CAST(greatest(len(t) - 2, 0) AS BIGINT) AS t3,
             CAST(greatest(len(t) - 3, 0) AS BIGINT) AS t4
      FROM toks
    ), o1 AS (
      SELECT a.doc_id AS ref_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM c1 a JOIN c1 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
      GROUP BY a.doc_id
    ), o2 AS (
      SELECT a.doc_id AS ref_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM c2 a JOIN c2 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
      GROUP BY a.doc_id
    ), o3 AS (
      SELECT a.doc_id AS ref_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM c3 a JOIN c3 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
      GROUP BY a.doc_id
    ), o4 AS (
      SELECT a.doc_id AS ref_id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM c4 a JOIN c4 b ON b.doc_id = a.doc_id + 1 AND a.g = b.g
      GROUP BY a.doc_id
    ), raw AS (
      SELECT p.ref_id, p.cand_id,
             tr.t1 AS ref_len, tc.t1 AS cand_len,
             coalesce(o1.ov, 0) AS ov1, tc.t1 AS cd1,
             coalesce(o2.ov, 0) AS ov2, tc.t2 AS cd2,
             coalesce(o3.ov, 0) AS ov3, tc.t3 AS cd3,
             coalesce(o4.ov, 0) AS ov4, tc.t4 AS cd4
      FROM pairs p
      JOIN tt tr ON tr.doc_id = p.ref_id
      JOIN tt tc ON tc.doc_id = p.cand_id
      LEFT JOIN o1 ON o1.ref_id = p.ref_id
      LEFT JOIN o2 ON o2.ref_id = p.ref_id
      LEFT JOIN o3 ON o3.ref_id = p.ref_id
      LEFT JOIN o4 ON o4.ref_id = p.ref_id
      WHERE tr.t1 > 0 OR tc.t1 > 0
    )"""

LLM_ORACLES["llm_bleu"] = _BLEU_CHAIN + """, prec AS (
      SELECT ref_id, cand_id, ref_len, cand_len,
             CASE WHEN cd1 > 0 THEN CAST(ov1 AS DOUBLE) / cd1 ELSE 0.0 END AS q1,
             CASE WHEN cd2 > 0 THEN CAST(ov2 AS DOUBLE) / cd2 ELSE 0.0 END AS q2,
             CASE WHEN cd3 > 0 THEN CAST(ov3 AS DOUBLE) / cd3 ELSE 0.0 END AS q3,
             CASE WHEN cd4 > 0 THEN CAST(ov4 AS DOUBLE) / cd4 ELSE 0.0 END AS q4,
             CASE WHEN CAST(cand_len AS DOUBLE) >= CAST(ref_len AS DOUBLE)
                  THEN 1.0
                  WHEN cand_len > 0
                  THEN exp(1.0 - CAST(ref_len AS DOUBLE)
                               / CAST(cand_len AS DOUBLE)) END AS bp
      FROM raw
    )
    SELECT ref_id, cand_id, ref_len, cand_len,
           round(q1, 6) AS p1, round(q2, 6) AS p2,
           round(q3, 6) AS p3, round(q4, 6) AS p4,
           round(bp, 6) AS bp,
           round(CASE WHEN q1 > 0 AND q2 > 0 AND q3 > 0 AND q4 > 0
                      THEN bp * exp((((ln(q1) + ln(q2)) + ln(q3)) + ln(q4))
                                    / 4.0)
                      ELSE 0.0 END, 6) AS bleu
    FROM prec
"""

LLM_ORACLES["llm_bleu_corpus"] = _BLEU_CHAIN + """, corp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(ref_len) AS BIGINT) AS ref_tokens,
             CAST(sum(cand_len) AS BIGINT) AS cand_tokens,
             CAST(sum(ov1) AS BIGINT) AS s1, CAST(sum(cd1) AS BIGINT) AS d1,
             CAST(sum(ov2) AS BIGINT) AS s2, CAST(sum(cd2) AS BIGINT) AS d2,
             CAST(sum(ov3) AS BIGINT) AS s3, CAST(sum(cd3) AS BIGINT) AS d3,
             CAST(sum(ov4) AS BIGINT) AS s4, CAST(sum(cd4) AS BIGINT) AS d4
      FROM raw
    ), prec AS (
      SELECT n_pairs, ref_tokens, cand_tokens,
             CASE WHEN d1 > 0 THEN CAST(s1 AS DOUBLE) / d1 ELSE 0.0 END AS q1,
             CASE WHEN d2 > 0 THEN CAST(s2 AS DOUBLE) / d2 ELSE 0.0 END AS q2,
             CASE WHEN d3 > 0 THEN CAST(s3 AS DOUBLE) / d3 ELSE 0.0 END AS q3,
             CASE WHEN d4 > 0 THEN CAST(s4 AS DOUBLE) / d4 ELSE 0.0 END AS q4,
             CASE WHEN CAST(cand_tokens AS DOUBLE) >= CAST(ref_tokens AS DOUBLE)
                  THEN 1.0
                  WHEN cand_tokens > 0
                  THEN exp(1.0 - CAST(ref_tokens AS DOUBLE)
                               / CAST(cand_tokens AS DOUBLE)) END AS bp
      FROM corp
    )
    SELECT n_pairs, ref_tokens, cand_tokens,
           round(q1, 6) AS p1, round(q2, 6) AS p2,
           round(q3, 6) AS p3, round(q4, 6) AS p4,
           round(bp, 6) AS bp,
           round(CASE WHEN q1 > 0 AND q2 > 0 AND q3 > 0 AND q4 > 0
                      THEN bp * exp((((ln(q1) + ln(q2)) + ln(q3)) + ln(q4))
                                    / 4.0)
                      ELSE 0.0 END, 6) AS bleu
    FROM prec
"""

LLM_ORACLES["llm_rouge_l"] = """
    -- ROUGE-L replay: the LCS lattice walked cell-at-a-time by a
    -- recursive CTE (the llm_viterbi_fixed list-state pattern).  State
    -- per pair = (i, j, old, new): `old` is DP row i-1 (m+1 entries,
    -- 1-indexed, old[j+1] = dp[i-1][j]), `new` is the prefix of row i
    -- (new[j] = dp[i][j-1]).  Cell value:
    --   dp[i][j] = ra[i]=ca[j] ? dp[i-1][j-1]+1
    --                          : greatest(dp[i-1][j], dp[i][j-1])
    -- Recursion depth = max(n*m) over pairs (~9.4k); total rows = sum
    -- of n*m (~140k) -- bounded because the gate is a 50-doc slice.
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0
                  THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents WHERE doc_id < 50
    ), base AS (
      SELECT ta.doc_id AS ref_id, tb.doc_id AS cand_id,
             ta.t AS ra, tb.t AS ca,
             CAST(len(ta.t) AS BIGINT) AS n, CAST(len(tb.t) AS BIGINT) AS m
      FROM toks ta JOIN toks tb ON tb.doc_id = ta.doc_id + 1
    ), dp AS (
      SELECT ref_id, cand_id, ra, ca, n, m,
             CAST(1 AS BIGINT) AS i, CAST(1 AS BIGINT) AS j,
             list_transform(generate_series(0, CAST(m AS INTEGER)),
                            x -> CAST(0 AS BIGINT)) AS old,
             [CAST(0 AS BIGINT)] AS new
      FROM base WHERE n > 0 AND m > 0
      UNION ALL
      SELECT ref_id, cand_id, ra, ca, n, m,
             CASE WHEN j = m THEN i + 1 ELSE i END,
             CASE WHEN j = m THEN 1 ELSE j + 1 END,
             CASE WHEN j = m
                  THEN list_append(new,
                       CASE WHEN ra[CAST(i AS INTEGER)] = ca[CAST(j AS INTEGER)]
                            THEN old[CAST(j AS INTEGER)] + 1
                            ELSE greatest(old[CAST(j + 1 AS INTEGER)],
                                          new[CAST(j AS INTEGER)]) END)
                  ELSE old END,
             CASE WHEN j = m
                  THEN [CAST(0 AS BIGINT)]
                  ELSE list_append(new,
                       CASE WHEN ra[CAST(i AS INTEGER)] = ca[CAST(j AS INTEGER)]
                            THEN old[CAST(j AS INTEGER)] + 1
                            ELSE greatest(old[CAST(j + 1 AS INTEGER)],
                                          new[CAST(j AS INTEGER)]) END) END
      FROM dp WHERE NOT (i = n AND j = m) AND i <= n
    ), fin AS (
      SELECT ref_id, cand_id, n, m,
             CASE WHEN ra[CAST(i AS INTEGER)] = ca[CAST(j AS INTEGER)]
                  THEN old[CAST(j AS INTEGER)] + 1
                  ELSE greatest(old[CAST(j + 1 AS INTEGER)],
                                new[CAST(j AS INTEGER)]) END AS lcs
      FROM dp WHERE i = n AND j = m
      UNION ALL
      SELECT ref_id, cand_id, n, m, CAST(0 AS BIGINT) AS lcs
      FROM base WHERE n = 0 OR m = 0
    )
    SELECT ref_id, cand_id, lcs,
           n AS ref_len, m AS cand_len,
           round(CASE WHEN m > 0 THEN CAST(lcs AS DOUBLE) / m END, 6)
             AS precision,
           round(CASE WHEN n > 0 THEN CAST(lcs AS DOUBLE) / n END, 6)
             AS recall,
           CASE
             WHEN n = 0 OR m = 0 THEN NULL
             WHEN CAST(lcs AS DOUBLE) / m + CAST(lcs AS DOUBLE) / n > 0
               THEN round(2.0 * (CAST(lcs AS DOUBLE) / m)
                              * (CAST(lcs AS DOUBLE) / n)
                          / (CAST(lcs AS DOUBLE) / m
                             + CAST(lcs AS DOUBLE) / n), 6)
             ELSE 0.0
           END AS f1
    FROM fin
"""

LLM_ORACLES["llm_chrf"] = """
    -- chrF2: char n-grams (n=1..6) of the normalized text with spaces
    -- removed; mean clipped precision/recall over levels; F with
    -- beta=2.  Float finish mirrors the engine's fixed left-assoc
    -- expression order exactly.
    WITH s AS (
      SELECT doc_id,
             replace(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')),
                     ' ', '') AS cs
      FROM documents
    ), pairs AS (
      SELECT a.doc_id AS ref_id, b.doc_id AS cand_id
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ), lv AS (
      SELECT unnest(generate_series(1, 6)) AS n
    ), pos AS (
      SELECT s.doc_id, lv.n, s.cs,
             unnest(generate_series(1, length(s.cs) - lv.n + 1)) AS i
      FROM s, lv WHERE length(s.cs) >= lv.n
    ), cnt AS (
      SELECT doc_id, n,
             substr(cs, CAST(i AS INTEGER), CAST(n AS INTEGER)) AS g,
             CAST(count(*) AS BIGINT) AS c
      FROM pos GROUP BY doc_id, n, g
    ), tt AS (
      SELECT s.doc_id, lv.n,
             CAST(greatest(length(s.cs) - lv.n + 1, 0) AS BIGINT) AS t
      FROM s, lv
    ), ov AS (
      SELECT a.doc_id AS ref_id, a.n,
             CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
      FROM cnt a JOIN cnt b ON b.doc_id = a.doc_id + 1 AND a.n = b.n
                           AND a.g = b.g
      GROUP BY a.doc_id, a.n
    ), grid AS (
      SELECT p.ref_id, p.cand_id, lv.n FROM pairs p, lv
    ), raw AS (
      SELECT g2.ref_id, g2.cand_id, g2.n,
             coalesce(o.ov, 0) AS ov, tr.t AS tref, tc.t AS tcand
      FROM grid g2
      JOIN tt tr ON tr.doc_id = g2.ref_id AND tr.n = g2.n
      JOIN tt tc ON tc.doc_id = g2.cand_id AND tc.n = g2.n
      LEFT JOIN ov o ON o.ref_id = g2.ref_id AND o.n = g2.n
    ), lvls AS (
      SELECT ref_id, cand_id,
             max(CASE WHEN n = 1 THEN tref END) AS ref_chars,
             max(CASE WHEN n = 1 THEN tcand END) AS cand_chars,
             {pcols}
      FROM raw GROUP BY ref_id, cand_id
    ), agg AS (
      SELECT ref_id, cand_id, ref_chars, cand_chars,
             ((((((q1 + q2) + q3) + q4) + q5) + q6) / 6.0) AS chrp,
             ((((((r1 + r2) + r3) + r4) + r5) + r6) / 6.0) AS chrr
      FROM lvls
    )
    SELECT ref_id, cand_id, ref_chars, cand_chars,
           round(chrp, 6) AS chrp, round(chrr, 6) AS chrr,
           round(CASE WHEN chrp + chrr > 0
                      THEN 5.0 * chrp * chrr / (4.0 * chrp + chrr)
                      ELSE 0.0 END, 6) AS chrf
    FROM agg WHERE ref_chars > 0 OR cand_chars > 0
""".format(
    pcols=",\n             ".join(
        f"max(CASE WHEN n = {n} THEN CASE WHEN tcand > 0 "
        f"THEN CAST(ov AS DOUBLE) / tcand ELSE 0.0 END END) AS q{n},\n"
        f"             "
        f"max(CASE WHEN n = {n} THEN CASE WHEN tref > 0 "
        f"THEN CAST(ov AS DOUBLE) / tref ELSE 0.0 END END) AS r{n}"
        for n in range(1, 7)
    )
)

LLM_ORACLES["llm_js_divergence"] = """
    WITH ta AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS ca FROM (
        SELECT unnest(CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0
                           THEN []
                           ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
                      END) AS tok
        FROM documents WHERE doc_id % 2 = 0
      ) GROUP BY tok
    ), tb AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS cb FROM (
        SELECT unnest(CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0
                           THEN []
                           ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
                      END) AS tok
        FROM documents WHERE doc_id % 2 = 1
      ) GROUP BY tok
    ), pq AS (
      SELECT coalesce(ta.ca, 0) AS ca, coalesce(tb.cb, 0) AS cb
      FROM ta FULL OUTER JOIN tb ON ta.tok = tb.tok
    ), tot AS (
      SELECT CAST(sum(ca) AS BIGINT) AS t_a, CAST(sum(cb) AS BIGINT) AS t_b
      FROM pq
    ), terms AS (
      SELECT CAST(round(
               (CASE WHEN ca > 0
                     THEN 0.5 * (CAST(ca AS DOUBLE) / t_a)
                          * ln(2.0 * (CAST(ca AS DOUBLE) / t_a)
                               / (CAST(ca AS DOUBLE) / t_a
                                  + CAST(cb AS DOUBLE) / t_b))
                     ELSE 0.0 END)
             + (CASE WHEN cb > 0
                     THEN 0.5 * (CAST(cb AS DOUBLE) / t_b)
                          * ln(2.0 * (CAST(cb AS DOUBLE) / t_b)
                               / (CAST(ca AS DOUBLE) / t_a
                                  + CAST(cb AS DOUBLE) / t_b))
                     ELSE 0.0 END), 12) AS DECIMAL(28,12)) AS term,
             t_a, t_b
      FROM pq CROSS JOIN tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           CAST(max(t_a) AS BIGINT) AS n_tokens_a,
           CAST(max(t_b) AS BIGINT) AS n_tokens_b,
           round(CAST(sum(term) AS DOUBLE), 6) AS jsd_nats,
           round(CAST(sum(term) AS DOUBLE) / ln(2.0), 6) AS jsd_bits
    FROM terms
"""

LLM_ORACLES["a46_itemsets"] = """
    WITH b AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem
    ), l1 AS (
      SELECT i, CAST(count(*) AS BIGINT) AS support FROM b GROUP BY i
      HAVING count(*) >= 2
    ), pruned AS (
      SELECT b.o, b.i FROM b SEMI JOIN l1 ON b.i = l1.i
    ), l2 AS (
      SELECT x.i AS i1, y.i AS i2, CAST(count(*) AS BIGINT) AS support
      FROM pruned x JOIN pruned y ON x.o = y.o AND x.i < y.i
      GROUP BY x.i, y.i HAVING count(*) >= 2
    ), l3 AS (
      SELECT x.i AS i1, y.i AS i2, z.i AS i3, CAST(count(*) AS BIGINT) AS support
      FROM pruned x
      JOIN pruned y ON x.o = y.o AND x.i < y.i
      JOIN pruned z ON y.o = z.o AND y.i < z.i
      GROUP BY x.i, y.i, z.i HAVING count(*) >= 2
    )
    SELECT CAST(1 AS INT) AS size, [i] AS items, support FROM l1
    UNION ALL
    SELECT 2, [i1, i2], support FROM l2
    UNION ALL
    SELECT 3, [i1, i2, i3], support FROM l3
"""

LLM_ORACLES["a47_assoc_rules"] = """
    WITH b AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS i FROM lineitem
    ), l1 AS (
      SELECT i, CAST(count(*) AS BIGINT) AS s1 FROM b GROUP BY i
      HAVING count(*) >= 3
    ), pruned AS (
      SELECT b.o, b.i FROM b SEMI JOIN l1 ON b.i = l1.i
    ), l2 AS (
      SELECT x.i AS i1, y.i AS i2, CAST(count(*) AS BIGINT) AS s_xy
      FROM pruned x JOIN pruned y ON x.o = y.o AND x.i < y.i
      GROUP BY x.i, y.i HAVING count(*) >= 3
    ), dirs AS (
      SELECT i1 AS x, i2 AS y, s_xy FROM l2
      UNION ALL SELECT i2, i1, s_xy FROM l2
    ), nb AS (
      SELECT count(*) AS n FROM (SELECT DISTINCT o FROM b)
    )
    SELECT r.x AS antecedent, r.y AS consequent, r.s_xy AS support,
           round(CAST(r.s_xy AS DOUBLE) / CAST(a.s1 AS DOUBLE), 6) AS confidence,
           round(CAST(r.s_xy AS DOUBLE) / CAST(a.s1 AS DOUBLE)
                 * CAST(nb.n AS DOUBLE) / CAST(c.s1 AS DOUBLE), 6) AS lift
    FROM dirs r
    JOIN l1 a ON r.x = a.i
    JOIN l1 c ON r.y = c.i
    CROSS JOIN nb
"""

# --------------------------------------------------------------------------
# md5-register sketch oracles (register/cell SQL shared verbatim with the
# Spark implementations via aggregates.hll_*_sql / cms_cell_sql).
# --------------------------------------------------------------------------

from .aggregates import cms_cell_sql as _cms_cell_sql
from .aggregates import hll_est_sql as _hll_est_sql
from .aggregates import hll_reg_sql as _hll_reg_sql
from .aggregates import hll_rho_sql as _hll_rho_sql

_HK = "CAST(user_id AS STRING)"

LLM_ORACLES["a4_hll_distinct"] = f"""
    WITH regs AS (
      SELECT event_type, {_hll_reg_sql(_HK)} AS reg,
             MAX({_hll_rho_sql(_HK)}) AS m_j
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, {_hll_est_sql('m_j')} AS approx_distinct_user_id
    FROM regs GROUP BY event_type
"""

LLM_ORACLES["a43_sketch_overlap"] = f"""
    WITH regs AS (
      SELECT event_type AS set_name, {_hll_reg_sql(_HK)} AS reg,
             MAX({_hll_rho_sql(_HK)}) AS m_j
      FROM events GROUP BY 1, 2
    ), ests AS (
      SELECT set_name, {_hll_est_sql('m_j')} AS est
      FROM regs GROUP BY set_name
    ), pairs AS (
      SELECT a.set_name AS set_a, b.set_name AS set_b,
             a.est AS est_a, b.est AS est_b
      FROM ests a JOIN ests b ON a.set_name < b.set_name
    ), uni AS (
      SELECT p.set_a, p.set_b, r.reg, MAX(r.m_j) AS m_j
      FROM pairs p JOIN regs r
        ON r.set_name = p.set_a OR r.set_name = p.set_b
      GROUP BY 1, 2, 3
    ), uest AS (
      SELECT set_a, set_b, {_hll_est_sql('m_j')} AS union_est
      FROM uni GROUP BY set_a, set_b
    )
    SELECT p.set_a, p.set_b, p.est_a, p.est_b, u.union_est,
           greatest(p.est_a + p.est_b - u.union_est, 0) AS intersect_est,
           round(CASE WHEN u.union_est > 0 THEN
             CAST(greatest(p.est_a + p.est_b - u.union_est, 0) AS DOUBLE)
             / CAST(u.union_est AS DOUBLE) END, 6) AS jaccard_est
    FROM pairs p JOIN uest u USING (set_a, set_b)
"""

_CA44 = "\n        UNION ALL ".join(
    f"SELECT {d} AS d, {_cms_cell_sql('CAST(o_orderkey AS STRING)', d, 3)} AS cell "
    "FROM orders"
    for d in range(4)
)
_CB44 = "\n        UNION ALL ".join(
    f"SELECT {d} AS d, {_cms_cell_sql('CAST(l_orderkey AS STRING)', d, 3)} AS cell "
    "FROM lineitem"
    for d in range(4)
)

LLM_ORACLES["a44_join_size_est"] = f"""
    WITH ca AS (
      SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt FROM (
        {_CA44}
      ) GROUP BY 1, 2
    ), cb AS (
      SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt FROM (
        {_CB44}
      ) GROUP BY 1, 2
    ), prod AS (
      SELECT ca.d, SUM(ca.cnt * cb.cnt) AS dot
      FROM ca JOIN cb USING (d, cell) GROUP BY ca.d
    )
    SELECT CAST(MIN(dot) AS BIGINT) AS join_size_est FROM prod
"""

# IVF-Flat ANN, sampled-centroid mode: centroids are the 32 corpus
# vectors with the smallest md5(vec_id || ':42'); every vector joins its
# best cell (rounded cosine, cell-index tie-break), queries probe their 8
# best cells, candidates re-rank exactly.  Per-cell top-(k+1) pruning on
# the Spark side is lossless for the global top-k (any candidate outside
# its cell's top-(k+1) has k+1 better candidates in the union), so ALL
# candidates ranked here give the identical result.  Embeddings cast to
# DOUBLE[] to match NumPy's float64 math; round 6 absorbs summation-order
# ULPs (similarity.ROUND_DIGITS).
LLM_ORACLES["llm_ann_ivf"] = """
    WITH ordered AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS STRING) || ':42')
             ) AS rn
      FROM embeddings
    ), cents AS (
      SELECT rn - 1 AS cell, vec AS cvec FROM ordered WHERE rn <= 32
    ), scored AS (
      SELECT e.vec_id, e.vec, c.cell,
             round(list_cosine_similarity(e.vec, c.cvec), 6) AS s
      FROM ordered e CROSS JOIN cents c
    ), ranked AS (
      SELECT vec_id, vec, cell,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY s DESC, cell
             ) AS rnk
      FROM scored
    ), assigned AS (
      SELECT vec_id, vec, cell FROM ranked WHERE rnk = 1
    ), probes AS (
      SELECT vec_id, vec, cell FROM ranked WHERE rnk <= 8
    ), cand AS (
      SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
             round(list_cosine_similarity(p.vec, a.vec), 6) AS similarity
      FROM probes p JOIN assigned a USING (cell)
      WHERE p.vec_id <> a.vec_id
    )
    SELECT query_id, neighbor_id, similarity,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY similarity DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM cand
    QUALIFY rank <= 5
"""

# int8-quantized cosine top-k: every arithmetic step after quantization
# is INTEGER-valued (|q| <= 127, 64-dim dot <= ~1M), so summation order
# cannot matter, and sqrt/divide/round-6 are single correctly-rounded
# IEEE ops -- the whole tier is exactly SQL-derivable.  round() is
# half-away-from-zero in both engines (verified: 2.5->3, -2.5->-3).
LLM_ORACLES["llm_cosine_topk_q"] = """
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scaled AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                  THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                  ELSE 1.0 END AS s
      FROM base
    ), q AS (
      SELECT vec_id, list_transform(v, x -> round(x / s)) AS qv
      FROM scaled
    ), pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_dot_product(a.qv, b.qv)
                   / (sqrt(list_dot_product(a.qv, a.qv))
                      * sqrt(list_dot_product(b.qv, b.qv))), 6) AS similarity
      FROM q a CROSS JOIN q b
      WHERE a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, similarity,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY similarity DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 5
"""

# Verifiable MinHash-LSH: permutation minima = string MINs over md5 hex
# lanes (llm/dedup.minhash_lane_sql -- SQL text shared verbatim with the
# Spark tier), 4 bands x 4 rows, bucket = the band's concatenated
# component strings.  The oracle re-derives the exact candidate set.
from .llm.dedup import minhash_lane_sql as _mh_lane  # noqa: E402

_MH_COMPS = ",\n           ".join(
    f"min({_mh_lane('shingle', j, lane)}) AS c{j * 4 + lane}"
    for j in range(4)
    for lane in range(4)
)
_MH_BANDS = "\n      UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, c{b*4} || c{b*4+1} || c{b*4+2} || c{b*4+3} AS bucket FROM comp"
    for b in range(4)
)

LLM_ORACLES["llm_minhash_lsh_md5"] = _SHINGLES + f"""
    , comp AS (
      SELECT doc_id,
           {_MH_COMPS}
      FROM ex GROUP BY doc_id
    ), bands AS (
      {_MH_BANDS}
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
"""

# Sign-LSH embedding near-dup: the seeded Gaussian hyperplanes are
# embedded as DOUBLE literals (repr round-trips binary64 exactly, and
# DuckDB literal parsing returns the same nearest double), so bucket
# assignment and the in-bucket exact-cosine verification replay in SQL.
# Sign flips would need |dot| within ~1 ulp of 0 -- probability ~1e-13
# per (vector, plane); round-6 absorbs ULP drift in the cosines.
def _lsh_planes_sql(num_tables: int = 8, nbits: int = 6, dim: int = 64) -> str:
    from .llm.similarity import _planes

    pl = _planes(num_tables, nbits, dim)
    rows = []
    for t in range(num_tables):
        for j in range(nbits):
            arr = ", ".join(repr(float(x)) for x in pl[t, j])
            rows.append(f"({t}, {1 << j}, [{arr}]::DOUBLE[])")
    return ",\n      ".join(rows)


LLM_ORACLES["llm_embed_dup_lsh"] = f"""
    WITH planes(tbl, w, plane) AS (VALUES {_lsh_planes_sql()}),
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    buck AS (
      SELECT b.vec_id, p.tbl,
             CAST(SUM(CASE WHEN list_dot_product(b.v, p.plane) >= 0
                           THEN p.w ELSE 0 END) AS BIGINT) AS bucket,
             any_value(b.v) AS v
      FROM base b CROSS JOIN planes p
      GROUP BY b.vec_id, p.tbl
    )
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM buck a JOIN buck b
      ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
"""

# Sign-LSH ANN top-k: same literal-plane replay as llm_embed_dup_lsh
# (4 tables x 6 bits), then every co-bucketed pair re-ranks exactly.
# The Spark side's per-bucket top-k truncation is lossless for the
# global top-k (a candidate outside its bucket's top-k has k better
# candidates in the union), so ranking ALL co-bucketed pairs here gives
# the identical result.
LLM_ORACLES["llm_ann_lsh"] = f"""
    WITH planes(tbl, w, plane) AS (VALUES {_lsh_planes_sql(4, 6, 64)}),
    base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    buck AS (
      SELECT b.vec_id, p.tbl,
             CAST(SUM(CASE WHEN list_dot_product(b.v, p.plane) >= 0
                           THEN p.w ELSE 0 END) AS BIGINT) AS bucket,
             any_value(b.v) AS v
      FROM base b CROSS JOIN planes p
      GROUP BY b.vec_id, p.tbl
    ), cand AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS similarity
      FROM buck a JOIN buck b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, similarity,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY similarity DESC, neighbor_id
           ) AS BIGINT) AS rank
    FROM cand
    QUALIFY rank <= 5
"""

# Contrastive LSH miners: same literal-plane replay (16 tables x 3
# bits); positives meet inside (label, table, bucket), negatives inside
# (table, bucket) with the same-label mask as a join predicate.  The
# Spark kernel's per-bucket top-k truncation is lossless for the global
# per-anchor rank (k better candidates would be in the union), so
# ranking ALL co-bucketed candidates here matches exactly.
_LSH_MINE_PLANES = _lsh_planes_sql(16, 3, 64)

LLM_ORACLES["llm_anchor_positives_lsh"] = f"""
    WITH planes(tbl, w, plane) AS (VALUES {_LSH_MINE_PLANES}),
    base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    buck AS (
      SELECT b.vec_id, any_value(b.label) AS label, p.tbl,
             CAST(SUM(CASE WHEN list_dot_product(b.v, p.plane) >= 0
                           THEN p.w ELSE 0 END) AS BIGINT) AS bucket,
             any_value(b.v) AS v
      FROM base b CROSS JOIN planes p
      GROUP BY b.vec_id, p.tbl
    ), cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id AS cand_id,
             round(list_cosine_similarity(a.v, c.v), 6) AS similarity
      FROM buck a JOIN buck c
        ON a.tbl = c.tbl AND a.bucket = c.bucket
       AND a.label = c.label AND a.vec_id <> c.vec_id
    )
    SELECT anchor_id, anchor_label, cand_id AS pos_id, similarity
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY anchor_id ORDER BY similarity DESC, cand_id
      ) AS rk FROM cand
    ) WHERE rk <= 1
"""

LLM_ORACLES["llm_hard_negatives_lsh"] = f"""
    WITH planes(tbl, w, plane) AS (VALUES {_LSH_MINE_PLANES}),
    base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    buck AS (
      SELECT b.vec_id, any_value(b.label) AS label, p.tbl,
             CAST(SUM(CASE WHEN list_dot_product(b.v, p.plane) >= 0
                           THEN p.w ELSE 0 END) AS BIGINT) AS bucket,
             any_value(b.v) AS v
      FROM base b CROSS JOIN planes p
      GROUP BY b.vec_id, p.tbl
    ), cand AS (
      SELECT DISTINCT a.vec_id AS anchor_id, a.label AS anchor_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             round(list_cosine_similarity(a.v, c.v), 6) AS similarity
      FROM buck a JOIN buck c
        ON a.tbl = c.tbl AND a.bucket = c.bucket
       AND a.label <> c.label AND a.vec_id <> c.vec_id
    )
    SELECT anchor_id, anchor_label, cand_id AS neg_id,
           cand_label AS neg_label, similarity, CAST(rk AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY anchor_id ORDER BY similarity DESC, cand_id
      ) AS rk FROM cand
    ) WHERE rk <= 2
"""

# MMR diversification, k=5 greedy UNROLLED: five select/update rounds as
# plain CTE levels (k is a fixed parameter, so no recursion is needed).
# Scores compute in exact DECIMAL -- rel and the max-redundancy are
# 6-decimal values, so 0.7*rel - 0.3*mr is exact 7-decimal arithmetic;
# the Spark kernel mirrors this (similarity._mmr_scores_decimal) because
# double scoring lands on decimal .5 boundaries ~half the time, where
# numpy / Spark SQL / DuckDB all round differently.
def _mmr_oracle_sql(k: int = 5, pool: int = 20, cand_sql: str | None = None) -> str:
    def cos(a: str, b: str) -> str:
        return f"round(list_cosine_similarity({a}, {b}), 6)"

    def dscore(with_mr: bool) -> str:
        base = "0.7 * CAST(relevance AS DECIMAL(18,6))"
        if with_mr:
            base += " - (1 - 0.7) * CAST(mr AS DECIMAL(18,6))"
        return f"CAST(round({base}, 6) AS DOUBLE)"

    if cand_sql is None:
        # default stage 1: exact cosine top-`pool` for the %50 query slice
        cand_sql = f"""
      SELECT query_id, neighbor_id, similarity AS relevance, v FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.v AS v,
               {cos('q.v', 'c.v')} AS similarity,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {cos('q.v', 'c.v')} DESC, c.vec_id ASC) AS rk
        FROM base q JOIN base c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % 50 = 0
      ) WHERE rk <= {pool}"""
    head = f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cand AS ({cand_sql}
    )"""
    parts = [f""", sc1 AS (
      SELECT query_id, neighbor_id, v, relevance, {dscore(False)} AS score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {dscore(False)} DESC, neighbor_id ASC) AS pick
      FROM cand
    ), s1 AS (SELECT * FROM sc1 WHERE pick = 1
    ), m1 AS (
      SELECT c.query_id, c.neighbor_id, c.v, c.relevance,
             {cos('c.v', 's.v')} AS mr
      FROM cand c JOIN s1 s USING (query_id)
      WHERE c.neighbor_id <> s.neighbor_id
    )"""]
    for t in range(2, k + 1):
        prev = f"m{t - 1}"
        parts.append(f""", sc{t} AS (
      SELECT query_id, neighbor_id, v, relevance, mr, {dscore(True)} AS score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {dscore(True)} DESC, neighbor_id ASC) AS pick
      FROM {prev}
    ), s{t} AS (SELECT * FROM sc{t} WHERE pick = 1
    )""")
        if t < k:
            parts.append(f""", m{t} AS (
      SELECT c.query_id, c.neighbor_id, c.v, c.relevance,
             greatest(c.mr, {cos('c.v', 's.v')}) AS mr
      FROM {prev} c JOIN s{t} s USING (query_id)
      WHERE c.neighbor_id <> s.neighbor_id
    )""")
    final = "\n    UNION ALL\n    ".join(
        f"SELECT query_id, neighbor_id, relevance, score AS mmr_score, "
        f"CAST({t} AS BIGINT) AS rank FROM s{t}"
        for t in range(1, k + 1)
    )
    return head + "".join(parts) + "\n    " + final


LLM_ORACLES["llm_mmr_diversify"] = _mmr_oracle_sql(5, 20)

# MMR fed by the IVF ANN candidate tier: stage 1 replays ivf_topk
# (16 md5-sampled centroids, 4 probed cells, global top-20 after the
# lossless per-cell pruning) as the cand CTE; stage 2 is the same
# unrolled exact-DECIMAL greedy.  Queries = the whole corpus.
_MMR_ANN_CAND = """
      SELECT query_id, neighbor_id, relevance, v FROM (
        SELECT cd.query_id, cd.neighbor_id, cd.similarity AS relevance, nb.v,
               row_number() OVER (
                 PARTITION BY cd.query_id
                 ORDER BY cd.similarity DESC, cd.neighbor_id
               ) AS rk
        FROM (
          SELECT DISTINCT p.vec_id AS query_id, a.vec_id AS neighbor_id,
                 round(list_cosine_similarity(p.v, a.v), 6) AS similarity
          FROM (
            SELECT vec_id, v, cell FROM (
              SELECT e.vec_id, e.v, c.cell,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC,
                                c.cell
                     ) AS rnk
              FROM base e CROSS JOIN (
                SELECT rn - 1 AS cell, v AS cvec FROM (
                  SELECT vec_id, v, row_number() OVER (
                    ORDER BY md5(CAST(vec_id AS STRING) || ':42')
                  ) AS rn FROM base
                ) WHERE rn <= 16
              ) c
            ) WHERE rnk <= 4
          ) p
          JOIN (
            SELECT vec_id, v, cell FROM (
              SELECT e.vec_id, e.v, c.cell,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC,
                                c.cell
                     ) AS rnk
              FROM base e CROSS JOIN (
                SELECT rn - 1 AS cell, v AS cvec FROM (
                  SELECT vec_id, v, row_number() OVER (
                    ORDER BY md5(CAST(vec_id AS STRING) || ':42')
                  ) AS rn FROM base
                ) WHERE rn <= 16
              ) c
            ) WHERE rnk = 1
          ) a USING (cell)
          WHERE p.vec_id <> a.vec_id
        ) cd JOIN base nb ON nb.vec_id = cd.neighbor_id
      ) WHERE rk <= 20"""

LLM_ORACLES["llm_mmr_ann"] = _mmr_oracle_sql(5, 20, cand_sql=_MMR_ANN_CAND)

# Verifiable SimHash: 64 bit-majority votes with bits from md5 hex
# nibbles (llm/dedup.simhash_md5_*_sql -- text shared verbatim), four
# 16-bit chunk keys, exact Hamming verify.  All-integer arithmetic, so
# the oracle re-derives signatures, buckets, and the verified pair set.
def _simhash_md5_oracle() -> str:
    from .llm.dedup import simhash_md5_bit_sql, simhash_md5_hex_sql

    hexes = ",\n             ".join(
        f"{simhash_md5_hex_sql('tok', c)} AS h{c}" for c in range(16)
    )
    sums = ",\n             ".join(
        f"SUM({simhash_md5_bit_sql(f'h{j // 4}', j % 4)}) AS b{j}"
        for j in range(64)
    )
    chunks = ",\n             ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN 2 * b{16 * c + j} > n THEN {2 ** j} ELSE 0 END)"
            for j in range(16)
        )
        + f" AS INT) AS c{c}"
        for c in range(4)
    )
    bands = "\n      UNION ALL ".join(
        f"SELECT doc, c0, c1, c2, c3, {i} AS idx, c{i} AS key FROM sig"
        for i in range(4)
    )
    ham = " + ".join(f"bit_count(xor(a.c{i}, b.c{i}))" for i in range(4))
    return f"""
    WITH toks AS (
      SELECT doc_id AS doc,
             unnest(CASE WHEN length({_NORM}) = 0 THEN []
                         ELSE string_split({_NORM}, ' ') END) AS tok
      FROM documents
    ), hx AS (
      SELECT doc, {hexes} FROM toks
    ), agg AS (
      SELECT doc, count(*) AS n, {sums} FROM hx GROUP BY doc
    ), sig AS (
      SELECT doc, {chunks} FROM agg
    ), bands AS (
      {bands}
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
           CAST({ham} AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.idx = b.idx AND a.key = b.key AND a.doc < b.doc
    WHERE {ham} <= 3
    """


LLM_ORACLES["llm_simhash_md5"] = _simhash_md5_oracle()

# KMV bottom-k set algebra: Knuth-hash samples (query_hash_slice recipe;
# non-negative, so DuckDB's % equals Spark's pmod), k=64 smallest per
# daily audience; (k-1)*M/h_k estimates, union samples' in-both fraction
# scales to the intersection, differences by clamped subtraction.
LLM_ORACLES["a49_kmv_set_ops"] = """
    WITH hashes AS (
      SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS set_name,
             ((CAST(user_id AS BIGINT) % 2147483648) * 2654435761 + 12345)
               % 1000000007 AS h
      FROM events
    ), ranked AS (
      SELECT set_name, h,
             row_number() OVER (PARTITION BY set_name ORDER BY h) AS rn
      FROM hashes
    ), sk AS (
      SELECT set_name, h FROM ranked WHERE rn <= 64
    ), per AS (
      SELECT set_name, CAST(count(*) AS BIGINT) AS n_sk, max(h) AS h_k
      FROM sk GROUP BY 1
    ), ests AS (
      SELECT set_name,
             round(CASE WHEN n_sk < 64 THEN CAST(n_sk AS DOUBLE)
                        ELSE 63.0 * 1000000007.0 / CAST(h_k AS DOUBLE)
                   END, 4) AS est
      FROM per
    ), pairs AS (
      SELECT a.set_name AS set_a, b.set_name AS set_b,
             a.est AS est_a, b.est AS est_b
      FROM ests a JOIN ests b ON a.set_name < b.set_name
    ), ub AS (
      SELECT DISTINCT p.set_a, p.set_b, s.h
      FROM pairs p JOIN sk s
        ON s.set_name = p.set_a OR s.set_name = p.set_b
    ), usamp AS (
      SELECT set_a, set_b, h,
             row_number() OVER (PARTITION BY set_a, set_b ORDER BY h) AS rn
      FROM ub
    ), upair AS (
      SELECT u.set_a, u.set_b, CAST(count(*) AS BIGINT) AS kk,
             max(u.h) AS u_k,
             CAST(SUM(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS m
      FROM usamp u
      LEFT JOIN sk ia ON ia.set_name = u.set_a AND ia.h = u.h
      LEFT JOIN sk ib ON ib.set_name = u.set_b AND ib.h = u.h
      WHERE u.rn <= 64
      GROUP BY 1, 2
    ), f0 AS (
      SELECT p.set_a, p.set_b, p.est_a, p.est_b, u.kk, u.m,
             round(CASE WHEN u.kk < 64 THEN CAST(u.kk AS DOUBLE)
                        ELSE 63.0 * 1000000007.0 / CAST(u.u_k AS DOUBLE)
                   END, 4) AS union_est
      FROM pairs p JOIN upair u USING (set_a, set_b)
    ), f1 AS (
      SELECT *, round(CAST(m AS DOUBLE) * union_est / CAST(kk AS DOUBLE), 4)
                  AS intersect_est
      FROM f0
    )
    SELECT set_a, set_b, est_a, est_b, union_est, intersect_est,
           round(greatest(est_a - intersect_est, 0.0), 4) AS diff_ab_est,
           round(greatest(est_b - intersect_est, 0.0), 4) AS diff_ba_est
    FROM f1
"""

# Streaming bounded-state distinct: after an AvailableNow drain the
# register state is exactly the batch register table, so the per-window
# estimates re-derive from raw events (window('1 hour').start ==
# date_trunc hour).
from .aggregates import hll_est_sql as _hll_est_sql2  # noqa: E402
from .aggregates import hll_reg_sql as _hll_reg_sql2  # noqa: E402
from .aggregates import hll_rho_sql as _hll_rho_sql2  # noqa: E402

LLM_ORACLES["st_distinct_hll"] = f"""
    WITH regs AS (
      SELECT date_trunc('hour', ts) AS window_start,
             {_hll_reg_sql2(_HK)} AS reg, MAX({_hll_rho_sql2(_HK)}) AS m_j
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, {_hll_est_sql2('m_j')} AS distinct_est
    FROM regs GROUP BY window_start
"""

LLM_ORACLES["a50_skew_agg"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_members
    FROM events
    GROUP BY event_type
"""

# Greedy longest-match tokenization replayed exactly in SQL: the
# per-(word, position) longest vocab match is precomputed with a
# substr equi-join, then a recursive CTE advances every DISTINCT word
# one greedy step per iteration (the per-word loop is single-path, so
# each word yields exactly one terminal row); per-doc counts re-attach
# by word multiplicity.  Mirrors llm/text.py::tokenize_greedy
# (vocab = top-50 of vocab_coverage, subword cap 12, char-UNK).
LLM_ORACLES["llm_tokenize"] = r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0 THEN []
                  ELSE string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), words AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), counts AS (
      SELECT w AS tok, count(*) AS cnt FROM words GROUP BY w
    ), vocab AS (
      SELECT tok FROM counts ORDER BY cnt DESC, tok ASC LIMIT 50
    ), distinct_words AS (
      SELECT DISTINCT w FROM words
    ), positions AS (
      SELECT w, unnest(generate_series(1, length(w))) AS pos
      FROM distinct_words
    ), matches AS (
      SELECT p.w, p.pos, max(length(v.tok)) AS len
      FROM positions p JOIN vocab v
        ON length(v.tok) <= 12
       AND substr(p.w, p.pos, length(v.tok)) = v.tok
      GROUP BY p.w, p.pos
    ), walk AS (
      SELECT w, CAST(1 AS BIGINT) AS pos,
             CAST(0 AS BIGINT) AS subs, CAST(0 AS BIGINT) AS unk
      FROM distinct_words
      UNION ALL
      SELECT walk.w,
             walk.pos + coalesce(m.len, 1),
             walk.subs + CASE WHEN m.len IS NOT NULL THEN 1 ELSE 0 END,
             walk.unk  + CASE WHEN m.len IS NULL THEN 1 ELSE 0 END
      FROM walk LEFT JOIN matches m ON m.w = walk.w AND m.pos = walk.pos
      WHERE walk.pos <= length(walk.w)
    ), final AS (
      SELECT w, subs, unk FROM walk WHERE pos > length(w)
    ), per_doc AS (
      SELECT words.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(f.subs) AS BIGINT) AS n_subwords,
             CAST(sum(f.unk) AS BIGINT) AS n_unk
      FROM words JOIN final f ON words.w = f.w
      GROUP BY words.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_words, 0) AS n_words,
           coalesce(p.n_subwords, 0) AS n_subwords,
           coalesce(p.n_unk, 0) AS n_unk
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""

# First-fit-decreasing sequence packing replayed exactly in SQL: the
# recursive CTE advances every source group one doc per iteration in
# (n_tokens DESC, doc ASC) order, carrying the open-bin capacity
# vector as BIGINT[] state; first-fit = 1-based list_position of the
# first capacity >= n_tokens (DuckDB returns 0, not NULL, on no fit).
# Mirrors llm/curation.py::pack_sequences (budget 256, oversize
# singleton bins).
LLM_ORACLES["llm_pack_sequences"] = r"""
    WITH RECURSIVE sized AS (
      SELECT source AS grp, doc_id AS doc,
             CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
               AS n_tokens
      FROM documents
    ), ordered AS (
      SELECT grp, doc, n_tokens,
             row_number() OVER (
               PARTITION BY grp ORDER BY n_tokens DESC, doc ASC) AS rn
      FROM sized
    ), groups AS (
      SELECT DISTINCT grp FROM ordered
    ), step AS (
      SELECT grp, CAST(0 AS BIGINT) AS rn, CAST(NULL AS BIGINT) AS doc,
             CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS bin_id,
             CAST(NULL AS BOOLEAN) AS oversize, CAST([] AS BIGINT[]) AS bins
      FROM groups
      UNION ALL
      SELECT s.grp, o.rn, o.doc, o.n_tokens,
             CASE WHEN o.n_tokens > 256 THEN len(s.bins)
                  WHEN list_position(
                         list_transform(s.bins, b -> b >= o.n_tokens), true) > 0
                    THEN list_position(
                         list_transform(s.bins, b -> b >= o.n_tokens), true) - 1
                  ELSE len(s.bins) END AS bin_id,
             o.n_tokens > 256 AS oversize,
             CASE WHEN o.n_tokens > 256
                    THEN list_append(s.bins, CAST(0 AS BIGINT))
                  WHEN list_position(
                         list_transform(s.bins, b -> b >= o.n_tokens), true) > 0
                    THEN list_transform(s.bins, (b, i) ->
                           CASE WHEN i = list_position(
                                  list_transform(s.bins, b2 -> b2 >= o.n_tokens),
                                  true)
                                THEN b - o.n_tokens ELSE b END)
                  ELSE list_append(s.bins, CAST(256 AS BIGINT) - o.n_tokens)
             END AS bins
      FROM step s JOIN ordered o ON o.grp = s.grp AND o.rn = s.rn + 1
    )
    SELECT grp AS source, doc AS doc_id, n_tokens, bin_id, oversize
    FROM step WHERE rn >= 1
"""

def _bpe_stages_sql(n_merges: int) -> str:
    """Unrolled BPE-training stages (the g1-pagerank unrolled-SQL
    technique): stage k counts weighted adjacent symbol pairs over the
    distinct-word segmentation seg{k-1} (overlaps included, like the
    Spark transform/explode), picks the argmax with the (cnt DESC, l
    ASC, r ASC) tie-break gated on min_pair_count=2, and applies the
    merge as a list_reduce fold over the symbol list -- the exact
    leftmost-non-overlapping semantics of text._bpe_merge_expr (the
    fold tests only the LAST accumulated symbol, so a just-merged
    symbol never re-merges as its own left half).  chr(31) is the
    symbol separator inside the fold accumulator (never occurs in
    corpus words or the </w> marker)."""
    parts = ["""words AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT unnest(CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0 THEN []
               ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ') END) AS w
        FROM documents
      ) GROUP BY w
    ), seg0 AS MATERIALIZED (
      SELECT w, n,
             list_append(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)), '</w>') AS sym
      FROM words
    )"""]
    for k in range(1, n_merges + 1):
        parts.append(f""", pairs{k} AS MATERIALIZED (
      SELECT z[1] AS l, z[2] AS r, CAST(sum(n) AS BIGINT) AS cnt
      FROM (SELECT n, unnest(list_zip(sym, sym[2:])) AS z FROM seg{k-1})
      WHERE z[2] IS NOT NULL
      GROUP BY 1, 2
    ), best{k} AS MATERIALIZED (
      SELECT l, r, l || r AS m, cnt FROM pairs{k}
      WHERE cnt >= 2
      ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
    ), seg{k} AS MATERIALIZED (
      SELECT s.w, s.n,
             CASE WHEN b.l IS NULL THEN s.sym
                  ELSE string_split(
                    list_reduce(s.sym, (acc, x) ->
                      CASE WHEN x = b.r AND (acc = b.l OR ends_with(acc, chr(31) || b.l))
                           THEN CASE WHEN acc = b.l THEN b.m
                                ELSE substr(acc, 1, length(acc) - length(b.l) - 1)
                                     || chr(31) || b.m END
                           ELSE acc || chr(31) || x END),
                    chr(31)) END AS sym
      FROM seg{k-1} s LEFT JOIN best{k} b ON true
    )""")
    return "".join(parts)


def _bpe_merge_rows_sql(n_merges: int) -> str:
    rows = [
        f"SELECT CAST({k - 1} AS BIGINT) AS rank, l AS \"left\", r AS \"right\","
        f" m AS merged, cnt AS pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    ]
    return " UNION ALL ".join(rows)


LLM_ORACLES["llm_bpe_train"] = (
    "WITH " + _bpe_stages_sql(12) + "\n    " + _bpe_merge_rows_sql(12)
)


def _bpe_vocab_rows_sql(n_merges: int) -> str:
    return " UNION ALL ".join(
        f"SELECT m FROM best{k}" for k in range(1, n_merges + 1)
    )


# Composed train->deploy replay: the 12 unrolled BPE stages derive the
# merge vocabulary (merged symbols with </w> stripped + single chars,
# mirroring registry_llm.llm_bpe_tokenize), which feeds the SAME
# recursive greedy-walk tokenizer used by the llm_tokenize oracle.
LLM_ORACLES["llm_bpe_tokenize"] = (
    "WITH RECURSIVE " + _bpe_stages_sql(12) + r""", vocab AS (
      SELECT DISTINCT replace(m, '</w>', '') AS tok FROM (
        """ + _bpe_vocab_rows_sql(12) + r"""
      ) WHERE replace(m, '</w>', '') <> ''
      UNION
      SELECT chr(CAST(c AS INTEGER)) FROM (SELECT unnest(generate_series(97, 122)) AS c)
      UNION
      SELECT CAST(d AS VARCHAR) FROM (SELECT unnest(generate_series(0, 9)) AS d)
    ), tok_words AS (
      SELECT doc_id, unnest(
        CASE WHEN length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) = 0 THEN []
             ELSE string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')
        END) AS w
      FROM documents
    ), distinct_tok_words AS (
      SELECT DISTINCT w FROM tok_words
    ), positions AS (
      SELECT w, unnest(generate_series(1, length(w))) AS pos
      FROM distinct_tok_words
    ), matches AS (
      SELECT p.w, p.pos, max(length(v.tok)) AS len
      FROM positions p JOIN vocab v
        ON length(v.tok) <= 12
       AND substr(p.w, p.pos, length(v.tok)) = v.tok
      GROUP BY p.w, p.pos
    ), walk AS (
      SELECT w, CAST(1 AS BIGINT) AS pos,
             CAST(0 AS BIGINT) AS subs, CAST(0 AS BIGINT) AS unk
      FROM distinct_tok_words
      UNION ALL
      SELECT walk.w,
             walk.pos + coalesce(m.len, 1),
             walk.subs + CASE WHEN m.len IS NOT NULL THEN 1 ELSE 0 END,
             walk.unk  + CASE WHEN m.len IS NULL THEN 1 ELSE 0 END
      FROM walk LEFT JOIN matches m ON m.w = walk.w AND m.pos = walk.pos
      WHERE walk.pos <= length(walk.w)
    ), final AS (
      SELECT w, subs, unk FROM walk WHERE pos > length(w)
    ), per_doc AS (
      SELECT tok_words.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(f.subs) AS BIGINT) AS n_subwords,
             CAST(sum(f.unk) AS BIGINT) AS n_unk
      FROM tok_words JOIN final f ON tok_words.w = f.w
      GROUP BY tok_words.doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_words, 0) AS n_words,
           coalesce(p.n_subwords, 0) AS n_subwords,
           coalesce(p.n_unk, 0) AS n_unk
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""
)

# All-integer k-means replay: quantization per the proven
# llm_cosine_topk_q scheme, md5-ordered init per llm_ann_ivf, then the
# two Lloyd iterations UNROLLED (integer argmin assignment with
# centroid-index tie-break; floor-mean centroid updates; empty
# clusters keep the previous centroid) -- mirrors
# llm/similarity.py::kmeans_int bit-for-bit.
LLM_ORACLES["llm_kmeans_int"] = """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scaled AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                  THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                  ELSE 1.0 END AS s
      FROM base
    ), q AS MATERIALIZED (
      SELECT vec_id, list_transform(v, x -> CAST(round(x / s) AS BIGINT)) AS qv
      FROM scaled
    ), init AS (
      SELECT vec_id, qv,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS STRING) || ':42')) AS rn
      FROM q
    ), cent0 AS MATERIALIZED (
      SELECT rn - 1 AS cid, qv AS cv FROM init WHERE rn <= 8
    ), a1 AS MATERIALIZED (
      SELECT vec_id, qv, cluster_id, dist2 FROM (
        SELECT e.vec_id, e.qv, c.cid AS cluster_id,
               CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
        FROM q e CROSS JOIN cent0 c
      ) WHERE rn = 1
    ), u1 AS MATERIALIZED (
      SELECT cluster_id, list(c ORDER BY i) AS cv FROM (
        SELECT cluster_id, i, CAST(floor(sum(x) / count(*)) AS BIGINT) AS c
        FROM (
          SELECT cluster_id, z[1] AS x, z[2] AS i
          FROM (SELECT cluster_id,
                       unnest(list_zip(qv, generate_series(1, len(qv)))) AS z
                FROM a1)
        ) GROUP BY cluster_id, i
      ) GROUP BY cluster_id
    ), cent1 AS MATERIALIZED (
      SELECT p.cid, coalesce(u.cv, p.cv) AS cv
      FROM cent0 p LEFT JOIN u1 u ON u.cluster_id = p.cid
    ), a2 AS MATERIALIZED (
      SELECT vec_id, qv, cluster_id, dist2 FROM (
        SELECT e.vec_id, e.qv, c.cid AS cluster_id,
               CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
        FROM q e CROSS JOIN cent1 c
      ) WHERE rn = 1
    ), u2 AS MATERIALIZED (
      SELECT cluster_id, list(c ORDER BY i) AS cv FROM (
        SELECT cluster_id, i, CAST(floor(sum(x) / count(*)) AS BIGINT) AS c
        FROM (
          SELECT cluster_id, z[1] AS x, z[2] AS i
          FROM (SELECT cluster_id,
                       unnest(list_zip(qv, generate_series(1, len(qv)))) AS z
                FROM a2)
        ) GROUP BY cluster_id, i
      ) GROUP BY cluster_id
    ), cent2 AS MATERIALIZED (
      SELECT p.cid, coalesce(u.cv, p.cv) AS cv
      FROM cent1 p LEFT JOIN u2 u ON u.cluster_id = p.cid
    )
    SELECT e.vec_id, f.cluster_id, f.dist2 FROM (
      SELECT e.vec_id AS vid, c.cid AS cluster_id,
             CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist2,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
      FROM q e CROSS JOIN cent2 c
    ) f JOIN q e ON e.vec_id = f.vid
    WHERE f.rn = 1
"""

LLM_ORACLES["st_topk"] = """
    SELECT window_start, event_type, n_events,
           CAST(row_number() OVER (
             PARTITION BY window_start
             ORDER BY n_events DESC, event_type ASC) AS BIGINT) AS rank
    FROM (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    QUALIFY rank <= 3
"""

# Closed-form SemDeDup twin: the kmeans_int chain (same generator as
# llm_kmeans_int) plus a within-cluster (dist2, id) rank and the
# earlier-neighbor shadow self-join on quantized cosine; mirrors
# llm/similarity.py::semantic_dedup_int.
LLM_ORACLES["llm_semantic_dedup_int"] = """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scaled AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                  THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                  ELSE 1.0 END AS s
      FROM base
    ), q AS MATERIALIZED (
      SELECT vec_id, list_transform(v, x -> CAST(round(x / s) AS BIGINT)) AS qv
      FROM scaled
    ), init AS (
      SELECT vec_id, qv,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS STRING) || ':42')) AS rn
      FROM q
    ), cent0 AS MATERIALIZED (
      SELECT rn - 1 AS cid, qv AS cv FROM init WHERE rn <= 8
    ), a1 AS MATERIALIZED (
      SELECT vec_id, qv, cluster_id, dist2 FROM (
        SELECT e.vec_id, e.qv, c.cid AS cluster_id,
               CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
        FROM q e CROSS JOIN cent0 c
      ) WHERE rn = 1
    ), u1 AS MATERIALIZED (
      SELECT cluster_id, list(c ORDER BY i) AS cv FROM (
        SELECT cluster_id, i, CAST(floor(sum(x) / count(*)) AS BIGINT) AS c
        FROM (
          SELECT cluster_id, z[1] AS x, z[2] AS i
          FROM (SELECT cluster_id,
                       unnest(list_zip(qv, generate_series(1, len(qv)))) AS z
                FROM a1)
        ) GROUP BY cluster_id, i
      ) GROUP BY cluster_id
    ), cent1 AS MATERIALIZED (
      SELECT p.cid, coalesce(u.cv, p.cv) AS cv
      FROM cent0 p LEFT JOIN u1 u ON u.cluster_id = p.cid
    ), a2 AS MATERIALIZED (
      SELECT vec_id, qv, cluster_id, dist2 FROM (
        SELECT e.vec_id, e.qv, c.cid AS cluster_id,
               CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
        FROM q e CROSS JOIN cent1 c
      ) WHERE rn = 1
    ), u2 AS MATERIALIZED (
      SELECT cluster_id, list(c ORDER BY i) AS cv FROM (
        SELECT cluster_id, i, CAST(floor(sum(x) / count(*)) AS BIGINT) AS c
        FROM (
          SELECT cluster_id, z[1] AS x, z[2] AS i
          FROM (SELECT cluster_id,
                       unnest(list_zip(qv, generate_series(1, len(qv)))) AS z
                FROM a2)
        ) GROUP BY cluster_id, i
      ) GROUP BY cluster_id
    ), cent2 AS MATERIALIZED (
      SELECT p.cid, coalesce(u.cv, p.cv) AS cv
      FROM cent1 p LEFT JOIN u2 u ON u.cluster_id = p.cid
    ), afinal AS MATERIALIZED (
      SELECT vec_id, qv, cluster_id, dist2 FROM (
        SELECT e.vec_id, e.qv, c.cid AS cluster_id,
               CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS dist2,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY CAST(list_sum(list_transform(list_zip(e.qv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT), c.cid) AS rn
        FROM q e CROSS JOIN cent2 c
      ) WHERE rn = 1
    ), ranked AS MATERIALIZED (
      SELECT vec_id, cluster_id, qv,
             row_number() OVER (
               PARTITION BY cluster_id ORDER BY dist2, vec_id) AS rnk
      FROM afinal
    ), shadows AS (
      SELECT a.vec_id AS vid, arg_min(b.vec_id, b.rnk) AS exid
      FROM ranked a JOIN ranked b
        ON a.cluster_id = b.cluster_id AND b.rnk < a.rnk
      WHERE round(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])) / (sqrt(list_dot_product(CAST(a.qv AS DOUBLE[]), CAST(a.qv AS DOUBLE[]))) * sqrt(list_dot_product(CAST(b.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[])))), 6) >= 0.95
      GROUP BY a.vec_id
    )
    SELECT r.vec_id, r.cluster_id,
           s.exid IS NULL AS keep,
           coalesce(s.exid, r.vec_id) AS exemplar_id
    FROM ranked r LEFT JOIN shadows s ON s.vid = r.vec_id
"""

LLM_ORACLES["st_zonemap_ingest"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    WHERE value >= 100.0 AND value <= 200.0
    GROUP BY event_type
"""

LLM_ORACLES["st_cdc_upsert"] = """
    SELECT event_id, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY event_id DESC) = 1
"""

LLM_ORACLES["a51_heavy_hitters"] = """
    WITH tot AS (SELECT count(*) AS n FROM events WHERE event_type IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(count(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS share
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY event_type
    HAVING count(*) > 0.15 * (SELECT n FROM tot)
"""

# All-integer PQ replay: proven quantization, md5-ordered 8-row sample
# split into 4 subspace codebooks, integer-argmin codes, ADC = summed
# integer subspace distances; mirrors llm/similarity.py::ann_pq_int.
LLM_ORACLES["llm_ann_pq_int"] = """
    WITH base AS MATERIALIZED (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scaled AS (
      SELECT vec_id, v,
             CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
                  THEN list_max(list_transform(v, x -> abs(x))) / 127.0
                  ELSE 1.0 END AS s
      FROM base
    ), q AS MATERIALIZED (
      SELECT vec_id, list_transform(v, x -> CAST(round(x / s) AS BIGINT)) AS qv
      FROM scaled
    ), sample AS (
      SELECT vec_id, qv,
             row_number() OVER (
               ORDER BY md5(CAST(vec_id AS STRING) || ':42')) - 1 AS code
      FROM q QUALIFY code < 8
    ), subs AS (
      SELECT CAST(unnest(generate_series(0, 3)) AS INTEGER) AS sub
    ), cb AS MATERIALIZED (
      SELECT s.sub, i.code,
             list_slice(i.qv, s.sub*16 + 1, (s.sub+1)*16) AS cv
      FROM sample i CROSS JOIN subs s
    ), subvecs AS MATERIALIZED (
      SELECT e.vec_id, s.sub,
             list_slice(e.qv, s.sub*16 + 1, (s.sub+1)*16) AS sv
      FROM q e CROSS JOIN subs s
    ), scored AS MATERIALIZED (
      SELECT sv.vec_id, sv.sub, c.code,
             CAST(list_sum(list_transform(list_zip(sv.sv, c.cv), z -> (z[1]-z[2])*(z[1]-z[2]))) AS BIGINT) AS d2
      FROM subvecs sv JOIN cb c ON sv.sub = c.sub
    ), codes AS MATERIALIZED (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (
                 PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
        FROM scored
      ) WHERE rn = 1
    ), pairs AS (
      SELECT qd.vec_id AS query_id, n.vec_id AS neighbor_id,
             CAST(sum(qd.d2) AS BIGINT) AS adc_dist2
      FROM codes n JOIN scored qd ON qd.sub = n.sub AND qd.code = n.code
      WHERE qd.vec_id <> n.vec_id
      GROUP BY qd.vec_id, n.vec_id
    )
    SELECT query_id, neighbor_id, adc_dist2,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY adc_dist2, neighbor_id
           ) AS BIGINT) AS rank
    FROM pairs
    QUALIFY rank <= 5
"""

# Naive-Bayes train+score replay: token counts, add-1 likelihoods, and
# 9-digit-rounded DECIMAL log sums mirror llm/text.py::nb_classify
# term for term (the bigram_logprob discipline).
LLM_ORACLES["llm_nb_classifier"] = """
    WITH toks AS (
      SELECT doc_id, lang,
             CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0 THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), ex AS (
      SELECT doc_id, (lang = 'en') AS is_en, unnest(t) AS w FROM toks
    ), per_tok AS (
      SELECT w, count(*) AS c_all,
             sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS c_en
      FROM ex GROUP BY w
    ), scal AS (
      SELECT sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS t_en,
             sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS t_ot
      FROM ex
    ), voc AS (
      SELECT count(*) AS v FROM per_tok
    ), docs AS (
      SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS d_en,
             count(*) AS d_all
      FROM documents
    ), lik AS (
      SELECT w,
             CAST(round(ln(CAST(c_en + 1 AS DOUBLE) / (t_en + v)), 9)
                  AS DECIMAL(20,9)) AS ll_en,
             CAST(round(ln(CAST(c_all - c_en + 1 AS DOUBLE) / (t_ot + v)), 9)
                  AS DECIMAL(20,9)) AS ll_ot
      FROM per_tok CROSS JOIN scal CROSS JOIN voc
    ), sums AS (
      SELECT ex.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             sum(l.ll_en) AS s_en, sum(l.ll_ot) AS s_ot
      FROM ex JOIN lik l ON ex.w = l.w
      GROUP BY ex.doc_id
    ), pri AS (
      SELECT CAST(round(ln(CAST(d_en AS DOUBLE) / d_all), 9) AS DECIMAL(20,9)) AS p_en,
             CAST(round(ln(CAST(d_all - d_en AS DOUBLE) / d_all), 9) AS DECIMAL(20,9)) AS p_ot
      FROM docs
    ), fin AS (
      SELECT d.doc_id, d.lang,
             coalesce(s.n_tokens, 0) AS n_tokens,
             coalesce(s.s_en, CAST(0 AS DECIMAL(20,9))) + pri.p_en AS sc_en,
             coalesce(s.s_ot, CAST(0 AS DECIMAL(20,9))) + pri.p_ot AS sc_ot
      FROM documents d LEFT JOIN sums s ON d.doc_id = s.doc_id
      CROSS JOIN pri
    )
    SELECT doc_id, lang, n_tokens,
           CAST(sc_en AS DOUBLE) AS score_en,
           CAST(sc_ot AS DOUBLE) AS score_other,
           CASE WHEN sc_en >= sc_ot THEN 'en' ELSE 'other' END AS pred
    FROM fin
"""

LLM_ORACLES["llm_unigram_seed"] = """
    WITH toks AS (
      SELECT CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0 THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), pos AS (
      SELECT word, cnt, unnest(generate_series(1, length(word))) AS i
      FROM words
    ), grid AS (
      SELECT word, cnt, i,
             unnest(generate_series(1, least(8, length(word) - i + 1))) AS l
      FROM pos
    ), freq AS (
      SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
             sum(cnt) AS freq
      FROM grid GROUP BY 1
    ), singles AS (
      SELECT piece, freq FROM freq WHERE length(piece) = 1
    ), multi AS (
      SELECT piece, freq FROM freq
      WHERE length(piece) > 1 AND freq >= 2
      ORDER BY freq DESC, piece ASC LIMIT 300
    )
    SELECT piece, CAST(freq AS BIGINT) AS freq FROM singles
    UNION ALL
    SELECT piece, CAST(freq AS BIGINT) AS freq FROM multi
"""

LLM_ORACLES["llm_char_entropy"] = """
    WITH ex AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0
    ), per AS (
      SELECT doc_id, ch, count(*) AS c FROM ex WHERE ch <> '' GROUP BY doc_id, ch
    ), tot AS (
      SELECT doc_id, sum(c) AS n FROM per GROUP BY doc_id
    ), ent AS (
      SELECT per.doc_id, t.n,
             sum(CAST(round(-(per.c / CAST(t.n AS DOUBLE))
                            * log2(per.c / CAST(t.n AS DOUBLE)), 9)
                      AS DECIMAL(20,9))) AS e
      FROM per JOIN tot t ON per.doc_id = t.doc_id
      GROUP BY per.doc_id, t.n
    )
    SELECT d.doc_id,
           CAST(coalesce(ent.n, 0) AS BIGINT) AS n_chars_counted,
           round(coalesce(CAST(ent.e AS DOUBLE), 0.0), 6) AS entropy_bits
    FROM documents d LEFT JOIN ent ON d.doc_id = ent.doc_id
"""

# Viterbi DP replayed in SQL: seed vocab (the llm_unigram_seed
# derivation) -> floor-quantized integer log-probs -> per-(word, end
# position) candidate lists from a substr equi-join -> a recursive CTE
# advancing every distinct word one position per iteration, carrying
# the BIGINT dp score and piece-count vectors as list state; tie-break
# = (max score, longer final piece), exactly unigram.viterbi_profile_int.
LLM_ORACLES["llm_viterbi_fixed"] = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0 THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), words AS (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), pos0 AS (
      SELECT word, cnt, unnest(generate_series(1, length(word))) AS i FROM words
    ), grid AS (
      SELECT word, cnt, i,
             unnest(generate_series(1, least(8, length(word) - i + 1))) AS l
      FROM pos0
    ), freq AS (
      SELECT substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER)) AS piece,
             sum(cnt) AS freq
      FROM grid GROUP BY 1
    ), vocab0 AS (
      SELECT piece, freq FROM freq WHERE length(piece) = 1
      UNION ALL
      SELECT piece, freq FROM (
        SELECT piece, freq FROM freq WHERE length(piece) > 1 AND freq >= 2
        ORDER BY freq DESC, piece ASC LIMIT 300)
    ), tot AS (SELECT sum(freq) AS t FROM vocab0),
    vocab AS MATERIALIZED (
      SELECT piece,
             CAST(floor(ln(freq / (SELECT CAST(t AS DOUBLE) FROM tot))
                        * 1000000000) AS BIGINT) AS ll
      FROM vocab0
    ), dwords AS MATERIALIZED (SELECT DISTINCT word FROM words),
    positions AS (
      SELECT word, unnest(generate_series(1, length(word))) AS pos FROM dwords
    ), matches AS MATERIALIZED (
      SELECT p.word, p.pos, CAST(length(v.piece) AS BIGINT) AS L, v.ll
      FROM positions p JOIN vocab v
        ON length(v.piece) <= p.pos
       AND substr(p.word, CAST(p.pos - length(v.piece) + 1 AS INTEGER),
                  CAST(length(v.piece) AS INTEGER)) = v.piece
    ), cands AS MATERIALIZED (
      SELECT word, pos, list(struct_pack(L := L, ll := ll)) AS lst
      FROM matches GROUP BY word, pos
    ), walk AS (
      SELECT word, CAST(0 AS BIGINT) AS pos,
             CAST([0] AS BIGINT[]) AS scores, CAST([0] AS BIGINT[]) AS nps
      FROM dwords
      UNION ALL
      SELECT s.word, s.pos + 1,
             list_append(s.scores,
               -(list_sort(list_transform(c.lst, x -> struct_pack(
                   negsc := -(s.scores[CAST(s.pos + 2 - x.L AS INTEGER)] + x.ll),
                   j := s.pos + 1 - x.L)))[1].negsc)),
             list_append(s.nps,
               s.nps[CAST(s.pos + 2 -
                 (list_sort(list_transform(c.lst, x -> struct_pack(
                   negsc := -(s.scores[CAST(s.pos + 2 - x.L AS INTEGER)] + x.ll),
                   j := s.pos + 1 - x.L,
                   L := x.L)))[1].L) AS INTEGER)] + 1)
      FROM walk s JOIN cands c ON c.word = s.word AND c.pos = s.pos + 1
      WHERE s.pos < length(s.word)
    ), final AS (
      SELECT word, scores[length(word) + 1] AS sc, nps[length(word) + 1] AS np
      FROM walk WHERE pos = length(word)
    ), per_word AS (
      SELECT doc_id, w AS word FROM (SELECT doc_id, unnest(t) AS w FROM toks)
    ), per_doc AS (
      SELECT p.doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(f.np) AS BIGINT) AS n_pieces,
             CAST(sum(f.sc) AS BIGINT) AS score_scaled
      FROM per_word p JOIN final f ON p.word = f.word
      GROUP BY p.doc_id
    )
    SELECT d.doc_id,
           coalesce(pd.n_words, 0) AS n_words,
           coalesce(pd.n_pieces, 0) AS n_pieces,
           coalesce(pd.score_scaled, 0) AS score_scaled
    FROM documents d LEFT JOIN per_doc pd ON d.doc_id = pd.doc_id
"""

# The decode oracle never parses a byte: synth_media's image pixels are
# (mid*31 + y*7 + x*13 + c*101) % 256 at (8 + mid%9) x (6 + mid%5), and
# PPM/PNG are lossless, so the decoded stats equal the formula's.
LLM_ORACLES["mm_decode_verify"] = """
    WITH ids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(64)
      WHERE range % 3 = 0 AND (range // 3) % 4 IN (0, 1)
    ), dims AS (
      SELECT mid, 8 + mid % 9 AS w, 6 + mid % 5 AS h,
             CASE WHEN (mid // 3) % 4 = 0 THEN 'ppm' ELSE 'png' END AS codec
      FROM ids
    ), ys AS (
      SELECT mid, w, h, codec, unnest(generate_series(0, h - 1)) AS y FROM dims
    ), xs AS (
      SELECT mid, w, h, codec, y, unnest(generate_series(0, w - 1)) AS x FROM ys
    ), px AS (
      SELECT mid, w, h, codec, y, x, unnest(generate_series(0, 2)) AS c FROM xs
    ), vals AS (
      SELECT mid, w, h, codec,
             (mid * 31 + y * 7 + x * 13 + c * 101) % 256 AS v
      FROM px
    )
    SELECT mid AS media_id, codec, w AS width, h AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(min(v) AS BIGINT) AS px_min,
           CAST(max(v) AS BIGINT) AS px_max
    FROM vals
    GROUP BY mid, codec, w, h
"""

# Frame sampling: indexes are sequence math, and the opaque video
# payload is sha256(str(media_id)) by construction -- DuckDB re-derives
# even the binary column with unhex(sha256(..)).
LLM_ORACLES["mm_frame_sample"] = """
    WITH ids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(64) WHERE range % 3 = 2
    ), dims AS (
      SELECT mid, mid % 7 + 1 AS frames FROM ids
    )
    SELECT mid AS media_id,
           CAST(unnest(generate_series(0, frames - 1, 2)) AS BIGINT) AS frame_idx,
           sha256(CAST(mid AS VARCHAR)) AS payload_sha
    FROM dims
"""

# Resize replay: nearest-neighbor is pure integer index math
# (yi = y'*h//H, xi = x'*w//W) over the generator pixel formula, so the
# resized image's stats are re-derived without touching bytes.
LLM_ORACLES["mm_resize"] = """
    WITH ids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(64)
      WHERE range % 3 = 0 AND (range // 3) % 4 IN (0, 1)
    ), dims AS (
      SELECT mid, 8 + mid % 9 AS w, 6 + mid % 5 AS h FROM ids
    ), ys AS (
      SELECT mid, w, h, unnest(generate_series(0, 63)) AS yp FROM dims
    ), xs AS (
      SELECT mid, w, h, yp, unnest(generate_series(0, 63)) AS xp FROM ys
    ), px AS (
      SELECT mid, w, h, yp, xp, unnest(generate_series(0, 2)) AS c FROM xs
    ), vals AS (
      SELECT mid,
             (mid * 31 + ((yp * h) // 64) * 7 + ((xp * w) // 64) * 13
              + c * 101) % 256 AS v
      FROM px
    )
    SELECT mid AS media_id,
           CAST(64 AS BIGINT) AS width, CAST(64 AS BIGINT) AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(min(v) AS BIGINT) AS px_min,
           CAST(max(v) AS BIGINT) AS px_max
    FROM vals GROUP BY mid
"""

# Feature-vector replay over the deterministic lossless subset
# (PPM images + WAV audio, the strict-mode gate): every float in the
# 8-dim vector re-derived from the generator formulas, round-6.
# n_bytes: PPM = len('P6\\n{w} {h}\\n255\\n') + 3wh; WAV = 44-byte
# canonical stdlib header + 2n  (both asserted in pytest).
LLM_ORACLES["mm_features"] = """
    WITH iids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(64)
      WHERE range % 3 = 0 AND (range // 3) % 4 = 0
    ), idims AS (
      SELECT mid, 8 + mid % 9 AS w, 6 + mid % 5 AS h FROM iids
    ), iys AS (
      SELECT mid, w, h, unnest(generate_series(0, h - 1)) AS y FROM idims
    ), ixs AS (
      SELECT mid, w, h, y, unnest(generate_series(0, w - 1)) AS x FROM iys
    ), ipx AS (
      SELECT mid, w, h, y, x, unnest(generate_series(0, 2)) AS c FROM ixs
    ), ivals AS (
      SELECT mid, w, h, c,
             (mid * 31 + y * 7 + x * 13 + c * 101) % 256 AS v
      FROM ipx
    ), ifeat AS (
      SELECT mid, w, h,
             round(avg(CASE WHEN c = 0 THEN v / 255.0 END), 6) AS mean_r,
             round(avg(CASE WHEN c = 1 THEN v / 255.0 END), 6) AS mean_g,
             round(avg(CASE WHEN c = 2 THEN v / 255.0 END), 6) AS mean_b,
             round(stddev_pop(v / 255.0), 6) AS sd,
             round(max(v) / 255.0, 6) AS mx
      FROM ivals GROUP BY mid, w, h
    ), img AS (
      SELECT mid AS media_id, 'image' AS kind,
             CAST(3 + length(CAST(w AS VARCHAR)) + 1
                  + length(CAST(h AS VARCHAR)) + 1 + 4
                  + 3 * w * h AS BIGINT) AS n_bytes,
             [CAST(w AS DOUBLE), CAST(h AS DOUBLE), CAST(3 AS DOUBLE),
              CAST(mean_r AS DOUBLE), CAST(mean_g AS DOUBLE),
              CAST(mean_b AS DOUBLE), CAST(sd AS DOUBLE),
              CAST(mx AS DOUBLE)] AS feature
      FROM ifeat
    ), aids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(64) WHERE range % 3 = 1
    ), adims AS (
      SELECT mid, 64 + mid % 97 AS n FROM aids
    ), asamp AS (
      SELECT mid, n, unnest(generate_series(0, n - 1)) AS i FROM adims
    ), avals AS (
      SELECT mid, n, i,
             ((mid * 7 + i * 13) % 4096 - 2048) * 15 AS v
      FROM asamp
    ), alag AS (
      SELECT mid, n, v,
             lag(v) OVER (PARTITION BY mid ORDER BY i) AS pv
      FROM avals
    ), afeat AS (
      SELECT a.mid, a.n,
             round(avg(a.v / 32768.0), 6) AS mean_s,
             round(stddev_pop(a.v / 32768.0), 6) AS sd,
             round(min(a.v) / 32768.0, 6) AS mn,
             round(max(a.v) / 32768.0, 6) AS mx,
             round((SELECT avg(CASE WHEN (l.v < 0) != (l.pv < 0)
                                    THEN 1.0 ELSE 0.0 END)
                    FROM alag l WHERE l.mid = a.mid AND l.pv IS NOT NULL),
                   6) AS zc
      FROM avals a GROUP BY a.mid, a.n
    ), aud AS (
      SELECT mid AS media_id, 'audio' AS kind,
             CAST(44 + 2 * n AS BIGINT) AS n_bytes,
             [CAST(8000 AS DOUBLE), CAST(n AS DOUBLE), CAST(1 AS DOUBLE),
              CAST(mean_s AS DOUBLE), CAST(sd AS DOUBLE),
              CAST(mn AS DOUBLE), CAST(mx AS DOUBLE),
              CAST(zc AS DOUBLE)] AS feature
      FROM afeat
    )
    SELECT * FROM img UNION ALL SELECT * FROM aud
"""

LLM_ORACLES["mm_wav_verify"] = """
    WITH ids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(64) WHERE range % 3 = 1
    ), dims AS (
      SELECT mid, 64 + mid % 97 AS n FROM ids
    ), xs AS (
      SELECT mid, n, unnest(generate_series(0, n - 1)) AS i FROM dims
    ), vals AS (
      SELECT mid, n, ((mid * 7 + i * 13) % 4096 - 2048) * 15 AS v FROM xs
    )
    SELECT mid AS media_id, CAST(8000 AS BIGINT) AS rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS s_sum,
           CAST(min(v) AS BIGINT) AS s_min,
           CAST(max(v) AS BIGINT) AS s_max
    FROM vals GROUP BY mid, n
"""

LLM_ORACLES["mm_gif_verify"] = """
    WITH ids AS (
      SELECT CAST(range AS BIGINT) AS mid FROM range(40)
    ), dims AS (
      SELECT mid, 8 + mid % 9 AS w, 6 + mid % 5 AS h,
             (mid % 2 = 1) AS interlaced
      FROM ids
    ), ys AS (
      SELECT mid, w, h, interlaced, unnest(generate_series(0, h - 1)) AS y FROM dims
    ), xs AS (
      SELECT mid, w, h, interlaced, y, unnest(generate_series(0, w - 1)) AS x FROM ys
    ), px AS (
      SELECT mid, w, h, interlaced, y, x, unnest(generate_series(0, 2)) AS c FROM xs
    ), vals AS (
      SELECT mid, w, h, interlaced,
             (mid * 31 + y * 7 + x * 13 + c * 101) % 256 AS v
      FROM px
    )
    SELECT mid AS media_id, interlaced, w AS width, h AS height,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(min(v) AS BIGINT) AS px_min,
           CAST(max(v) AS BIGINT) AS px_max
    FROM vals GROUP BY mid, interlaced, w, h
"""

LLM_ORACLES["mm_image_dedup"] = """
    -- replay: synth pixels -> 9x8 nearest resample -> dHash64 ->
    -- all pairs at hamming <= 3 (banding is recall-complete there).
    -- gray comparisons use the x3 channel SUM (integer-exact: mean
    -- over 3 channels preserves order under x3).
    WITH mids AS (
      SELECT CAST(range AS BIGINT) AS m FROM range(96)
      WHERE range % 3 = 0 AND (range // 3) % 4 IN (0, 1)
    ), imgs AS (
      SELECT m AS media_id, m AS seed, 8 + m % 9 AS w, 6 + m % 5 AS h FROM mids
      UNION ALL
      SELECT m + 1000, m, 8 + m % 9, 6 + m % 5 FROM mids
    ), rows8 AS (
      SELECT media_id, seed, w, h, unnest(generate_series(0, 7)) AS r FROM imgs
    ), cells AS (
      SELECT media_id, seed, w, h, r, unnest(generate_series(0, 8)) AS cc
      FROM rows8
    ), gsum AS (
      SELECT media_id, r, cc,
             ((seed*31 + ((r*h)//8)*7 + ((cc*w)//9)*13) % 256)
           + ((seed*31 + ((r*h)//8)*7 + ((cc*w)//9)*13 + 101) % 256)
           + ((seed*31 + ((r*h)//8)*7 + ((cc*w)//9)*13 + 202) % 256) AS g3
      FROM cells
    ), bits AS (
      SELECT a.media_id, a.r, a.cc AS c,
             CASE WHEN a.g3 > b.g3 THEN 1 ELSE 0 END AS bit
      FROM gsum a
      JOIN gsum b ON a.media_id = b.media_id AND a.r = b.r
                 AND b.cc = a.cc + 1
      WHERE a.cc < 8
    ), hashes AS (
      -- MSB-first pack; the sign bit lands as -2^63 so the sum IS the
      -- signed 64-bit value Spark carries
      SELECT media_id,
             CAST(sum(CAST(bit AS BIGINT) *
                      CASE WHEN r = 0 AND c = 0
                           THEN -9223372036854775808
                           ELSE (CAST(1 AS BIGINT) << (63 - (r*8 + c)))
                      END) AS BIGINT) AS dh
      FROM bits GROUP BY media_id
    )
    SELECT a.media_id AS doc_a, b.media_id AS doc_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS INTEGER) AS hamming
    FROM hashes a
    JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dh, b.dh)) <= 3
"""

LLM_ORACLES["mm_audio_dedup"] = """
    -- replay: synth int16 samples -> 9 time slices x 8 sub-bands
    -- (double np.array_split grid, pure integer index arithmetic) ->
    -- exact int64 energy sums -> envelope dHash64 -> all pairs at
    -- hamming <= 3 (banding is recall-complete there).
    WITH mids AS (
      SELECT CAST(range AS BIGINT) AS m FROM range(32)
    ), clips AS (
      SELECT m AS media_id, m AS seed, 64 + m % 97 AS n FROM mids
      UNION ALL
      SELECT m + 1000, m, 64 + m % 97 FROM mids
    ), samp AS (
      SELECT media_id, seed, n, unnest(generate_series(0, n - 1)) AS i
      FROM clips
    ), sv AS (
      -- modulated generator formula:
      -- ((seed*7 + i*13) % 4096 - 2048) * ((seed + i//16) % 5)
      -- (operands positive, so Python % == SQL %); WAV int16 roundtrip
      -- is lossless
      SELECT media_id, n, i,
             CAST(((seed * 7 + i * 13) % 4096 - 2048)
                  * ((seed + i // 16) % 5) AS BIGINT) AS v,
             n // 9 AS q, n % 9 AS r
      FROM samp
    ), ts AS (
      -- np.array_split(x, 9): first r slices hold q+1 samples
      SELECT media_id, n, i, v, q, r,
             CASE WHEN i < r * (q + 1) THEN i // (q + 1)
                  ELSE r + (i - r * (q + 1)) // q END AS t
      FROM sv
    ), tb AS (
      SELECT media_id, t, v,
             i - (CASE WHEN t < r THEN t * (q + 1)
                       ELSE r * (q + 1) + (t - r) * q END) AS j,
             CASE WHEN t < r THEN q + 1 ELSE q END AS lt
      FROM ts
    ), bb AS (
      -- np.array_split(slice, 8): same uneven-split arithmetic again
      SELECT media_id, t,
             CASE WHEN j < (lt % 8) * (lt // 8 + 1) THEN j // (lt // 8 + 1)
                  ELSE (lt % 8) + (j - (lt % 8) * (lt // 8 + 1)) // (lt // 8)
             END AS b,
             v
      FROM tb
    ), grid AS (
      SELECT c.media_id, tt.t, bt.b
      FROM clips c,
           (SELECT unnest(generate_series(0, 8)) AS t) tt,
           (SELECT unnest(generate_series(0, 7)) AS b) bt
    ), en AS (
      -- empty sub-bands (short slices) contribute energy 0
      SELECT g.media_id, g.t, g.b,
             coalesce(sum(bb.v * bb.v), 0) AS e
      FROM grid g
      LEFT JOIN bb ON bb.media_id = g.media_id AND bb.t = g.t AND bb.b = g.b
      GROUP BY g.media_id, g.t, g.b
    ), bits AS (
      SELECT a.media_id, a.t, a.b,
             CASE WHEN nxt.e > a.e THEN 1 ELSE 0 END AS bit
      FROM en a
      JOIN en nxt ON nxt.media_id = a.media_id AND nxt.t = a.t + 1
                 AND nxt.b = a.b
      WHERE a.t < 8
    ), hashes AS (
      SELECT media_id,
             CAST(sum(CAST(bit AS BIGINT) *
                      CASE WHEN t = 0 AND b = 0
                           THEN -9223372036854775808
                           ELSE (CAST(1 AS BIGINT) << (63 - (t*8 + b)))
                      END) AS BIGINT) AS afp
      FROM bits GROUP BY media_id
    )
    SELECT a.media_id AS doc_a, b.media_id AS doc_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INTEGER) AS hamming
    FROM hashes a
    JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= 3
"""

LLM_ORACLES["mm_audio_vad"] = """
    -- replay: modulated synth samples -> 40-sample frame energies
    -- (exact int64) -> dBFS active test -> gaps-and-islands run merge.
    -- Float discipline mirrors numpy's op order: e/2^30 and /40 are
    -- exact-then-one-rounding, then sqrt, then log10; non-silent
    -- frames sit >= 0.02 dB (~0.5% relative energy) from the
    -- threshold -- ~12 orders above cross-engine float divergence,
    -- with the margin floor pytest-asserted (test_multimodal.py).
    WITH mids AS (
      SELECT CAST(range AS BIGINT) AS m FROM range(64)
    ), clips AS (
      SELECT m AS media_id, m AS seed, 400 + m % 97 AS n FROM mids
    ), fr AS (
      SELECT media_id, seed, unnest(generate_series(0, n // 40 - 1)) AS f
      FROM clips WHERE n >= 40
    ), samp AS (
      SELECT media_id, seed, f, f * 40 + unnest(generate_series(0, 39)) AS i
      FROM fr
    ), sv AS (
      SELECT media_id, f,
             CAST(((seed * 7 + i * 13) % 4096 - 2048)
                  * ((seed + i // 40) % 5) AS BIGINT) AS v
      FROM samp
    ), en AS (
      SELECT media_id, f, sum(v * v) AS e FROM sv GROUP BY media_id, f
    ), db AS (
      SELECT media_id, f,
             CASE WHEN e > 0
                  THEN 20.0 * log10(sqrt((e / 1073741824.0) / 40.0))
                  ELSE -200.0 END AS db
      FROM en
    ), act AS (
      SELECT media_id, f, db,
             f - row_number() OVER (PARTITION BY media_id ORDER BY f) AS grp
      FROM db WHERE db > -30.0
    )
    SELECT media_id,
           CAST(min(f) * 5 AS BIGINT) AS seg_start_ms,
           CAST((max(f) + 1) * 5 AS BIGINT) AS seg_end_ms,
           round(avg(db), 3) AS mean_db
    FROM act GROUP BY media_id, grp
"""

LLM_ORACLES["a52_ks_test"] = """
    WITH base AS (
      SELECT event_type AS g, value AS v FROM events
      WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
    ), per_val AS (
      SELECT v,
             sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS cb
      FROM base GROUP BY v
    ), tot AS (
      SELECT CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM base
    ), steps AS (
      SELECT sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
             sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb
      FROM per_val
    ), d AS (
      SELECT t.n_a, t.n_b,
             round(max(abs(s.fa / CAST(t.n_a AS DOUBLE)
                           - s.fb / CAST(t.n_b AS DOUBLE))), 6) AS d_stat
      FROM steps s CROSS JOIN tot t
      GROUP BY t.n_a, t.n_b
    )
    SELECT n_a, n_b, d_stat,
           round((sqrt(CAST(n_a * n_b AS DOUBLE) / (n_a + n_b)) + 0.12
                  + 0.11 / sqrt(CAST(n_a * n_b AS DOUBLE) / (n_a + n_b)))
                 * d_stat, 6) AS ks_lambda
    FROM d
"""


# Composed evaluation oracle: both tiers' own oracle SQLs run as
# subqueries (so the eval can't drift from the gates it measures),
# then one count/round row.  Python-side round() on a *.5 ppm value
# could differ from SQL round; ppm values here are integer-safe in
# practice and the row would fail loudly if not.
LLM_ORACLES["llm_lsh_eval"] = """
    WITH cands AS ({cands_sql}),
    truth AS ({truth_sql}),
    hits AS (
      SELECT c.doc_a, c.doc_b FROM cands c
      JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )
    SELECT CAST((SELECT count(*) FROM cands) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST(round(1000000.0 * (SELECT count(*) FROM hits)
                      / (SELECT count(*) FROM cands)) AS BIGINT) AS precision_ppm,
           CAST(round(1000000.0 * (SELECT count(*) FROM hits)
                      / (SELECT count(*) FROM truth)) AS BIGINT) AS recall_ppm
""".format(
    cands_sql="SELECT doc_a, doc_b FROM ("
    + LLM_ORACLES["llm_minhash_lsh_md5"]
    + ")",
    truth_sql="SELECT doc_a, doc_b FROM (" + LLM_ORACLES["llm_jaccard_pairs"] + ")",
)

# ANN recall eval: same composed-oracle pattern for the vector-search
# family -- exact cosine top-5 truth vs the IVF-Flat tier, both taken
# from their own gate oracles.  recall_ppm = 1e6*nh/ne is integer-exact
# here (ne = 500 queries x 5), so SQL round vs Python floor(x+.5) agree.
LLM_ORACLES["llm_ann_eval"] = """
    WITH exact AS ({exact_sql}),
    approx AS ({approx_sql}),
    hits AS (
      SELECT e.query_id, e.neighbor_id FROM exact e
      JOIN approx a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM approx) AS BIGINT) AS n_approx,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST(round(1000000.0 * (SELECT count(*) FROM hits)
                      / (SELECT count(*) FROM exact)) AS BIGINT) AS recall_ppm
""".format(
    exact_sql="SELECT query_id, neighbor_id FROM ("
    + LLM_ORACLES["llm_cosine_topk"]
    + ")",
    approx_sql="SELECT query_id, neighbor_id FROM ("
    + LLM_ORACLES["llm_ann_ivf"]
    + ")",
)

LLM_ORACLES["llm_ann_pq_eval"] = """
    WITH exact AS ({exact_sql}),
    approx AS ({approx_sql}),
    hits AS (
      SELECT e.query_id, e.neighbor_id FROM exact e
      JOIN approx a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM approx) AS BIGINT) AS n_approx,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST(round(1000000.0 * (SELECT count(*) FROM hits)
                      / (SELECT count(*) FROM exact)) AS BIGINT) AS recall_ppm
""".format(
    exact_sql="SELECT query_id, neighbor_id FROM ("
    + LLM_ORACLES["llm_cosine_topk"]
    + ")",
    approx_sql="SELECT query_id, neighbor_id FROM ("
    + LLM_ORACLES["llm_ann_pq_int"]
    + ")",
)

LLM_ORACLES["llm_ann_lsh_eval"] = """
    WITH exact AS ({exact_sql}),
    approx AS ({approx_sql}),
    hits AS (
      SELECT e.query_id, e.neighbor_id FROM exact e
      JOIN approx a
        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    )
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM approx) AS BIGINT) AS n_approx,
           CAST((SELECT count(*) FROM hits) AS BIGINT) AS n_hits,
           CAST(round(1000000.0 * (SELECT count(*) FROM hits)
                      / (SELECT count(*) FROM exact)) AS BIGINT) AS recall_ppm
""".format(
    exact_sql="SELECT query_id, neighbor_id FROM ("
    + LLM_ORACLES["llm_cosine_topk"]
    + ")",
    approx_sql="SELECT query_id, neighbor_id FROM ("
    + LLM_ORACLES["llm_ann_lsh"]
    + ")",
)

LLM_ORACLES["llm_winnowing"] = """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN length(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g'))) = 0 THEN []
                  ELSE string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' ')
             END AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, i AS pos,
             substring(md5(t[CAST(i AS INTEGER)] || ' ' ||
                           t[CAST(i + 1 AS INTEGER)] || ' ' ||
                           t[CAST(i + 2 AS INTEGER)]), 1, 12) AS h
      FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
            FROM toks WHERE len(t) >= 3)
    ), counts AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kgrams FROM grams GROUP BY doc_id
    ), wins AS (
      SELECT doc_id, pos,
             min(h) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
             max(pos) OVER (PARTITION BY doc_id) AS last
      FROM grams
    ), sel AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_windows,
             CAST(count(DISTINCT wmin) AS BIGINT) AS n_fingerprints
      FROM wins WHERE pos <= last - 3
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(c.n_kgrams, 0) AS n_kgrams,
           coalesce(s.n_windows, 0) AS n_windows,
           coalesce(s.n_fingerprints, 0) AS n_fingerprints
    FROM documents d
    LEFT JOIN counts c ON d.doc_id = c.doc_id
    LEFT JOIN sel s ON d.doc_id = s.doc_id
"""
