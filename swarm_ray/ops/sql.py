"""DuckDB oracle SQL for the training-data operators — each string is
the exact semantic twin of the matching query in ops/*.py (same
integer scaling, same tie-breaks, same edge-case handling)."""

from __future__ import annotations

from .dedup import JACCARD_N, JACCARD_TAU_MILLI
from .text import LANG_MARKERS, STOPWORDS


def _inlist(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


SQL_DOC_TOKEN_COUNT = f"""
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]+')) AS BIGINT) AS bpeish_tokens
FROM documents
"""

SQL_DOC_QUALITY = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w, len(text) AS nc FROM documents
), s AS (
  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
    CAST(len(list_filter(w, x -> x IN ({_inlist(STOPWORDS)}))) AS BIGINT) AS stop_count,
    nc
  FROM d
)
SELECT doc_id, n_words, stop_count,
  (1000 * stop_count) // n_words AS stop_ratio_milli,
  (1000 * (nc - n_words + 1)) // n_words AS mean_word_len_milli
FROM s
"""

SQL_DOC_FINGERPRINT = """
WITH d AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id, min(md5(array_to_string(w[CAST(t.i AS BIGINT):CAST(t.i AS BIGINT)+4], ' '))) AS fp
  FROM d, UNNEST(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
  GROUP BY doc_id
)
SELECT d.doc_id AS doc_id, COALESCE(g.fp, md5(d.text)) AS fingerprint
FROM d LEFT JOIN g USING (doc_id)
"""


def _langid_sql() -> str:
    score = {
        lang: f"len(list_filter(w, x -> x IN ({_inlist(ws)})))"
        for lang, ws in LANG_MARKERS.items()
    }
    # ascending-language strict-> tie-break, matching LangId.predict_markers
    return f"""
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), s AS (
  SELECT doc_id, lang,
    {score['de']} AS s_de, {score['en']} AS s_en,
    {score['es']} AS s_es, {score['fr']} AS s_fr
  FROM d
)
SELECT doc_id, lang,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_fr THEN 'es'
       ELSE 'fr' END AS pred_lang
FROM s
"""


SQL_DOC_LANGID = _langid_sql()

SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_md5, min(doc_id) AS keeper_doc_id,
  count(*) AS dup_count
FROM documents GROUP BY 1
"""

SQL_SIMHASH = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), words AS (
  SELECT doc_id, len(w) AS nw, unnest(w) AS word FROM d
), hashed AS (
  SELECT doc_id, nw, CAST(CONCAT('0x', substr(md5(word), 1, 8)) AS UBIGINT) AS h
  FROM words
), bits AS (
  SELECT doc_id, b.b AS b,
    SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE 0 END) AS ones,
    MAX(nw) AS nw
  FROM hashed, (SELECT unnest(range(32)) AS b) AS b
  GROUP BY doc_id, b.b
)
SELECT doc_id,
  CAST(SUM(CASE WHEN 2 * ones > nw THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""

SQL_JACCARD_PAIRS = f"""
WITH d AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS s
  FROM documents WHERE doc_id < {JACCARD_N}
), p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    (1000 * len(list_intersect(a.s, b.s))) //
      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard_milli
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard_milli FROM p
WHERE jaccard_milli >= {JACCARD_TAU_MILLI}
"""


SQL_DUP_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
{SQL_JACCARD_PAIRS.strip().rstrip()}
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
), nodes AS (
  SELECT DISTINCT a AS doc_id FROM edges
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst
)
SELECT src AS doc_id, MIN(dst) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
"""


# end-to-end near-dup dedup: clusters -> drop non-representatives ->
# per-source kept/removed counts over the full corpus
SQL_DEDUP_NEAR = f"""
WITH clusters AS (
{SQL_DUP_CLUSTERS.strip().rstrip()}
), removed AS (
  SELECT doc_id FROM clusters WHERE doc_id != cluster_id
)
SELECT d.source,
       COUNT(*) FILTER (WHERE r.doc_id IS NULL)::BIGINT AS kept,
       COUNT(*) FILTER (WHERE r.doc_id IS NOT NULL)::BIGINT AS removed
FROM documents d LEFT JOIN removed r ON d.doc_id = r.doc_id
GROUP BY d.source ORDER BY d.source
"""


# composite curation: quality gate -> exact dedup keeper -> per-lang counts
from .text import CURATION_MAX_STOP_MILLI, CURATION_MIN_WORDS  # noqa: E402

SQL_DOC_CURATION = f"""
WITH q AS (
  SELECT doc_id, text, lang,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
    CAST(len(list_filter(string_split(text, ' '),
         x -> x IN ({_inlist(STOPWORDS)}))) AS BIGINT) AS stop_count
  FROM documents
), gated AS (
  SELECT doc_id, text, lang FROM q
  WHERE n_words >= {CURATION_MIN_WORDS}
    AND (1000 * stop_count) // n_words <= {CURATION_MAX_STOP_MILLI}
), keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)
)
SELECT g.lang, COUNT(*)::BIGINT AS n_docs
FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
GROUP BY g.lang ORDER BY g.lang
"""


SQL_DOC_TOKENIZE = """
SELECT doc_id,
  list_transform(string_split(text, ' '),
    w -> CAST(CAST(CONCAT('0x', substr(md5(w), 1, 8)) AS UBIGINT) % 50257 AS INTEGER)
  ) AS tokens,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
FROM documents
"""


SQL_DOC_SPLIT = """
WITH b AS (
  SELECT lang,
    CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         AS UBIGINT) % 10 AS INTEGER) AS bucket
  FROM documents
)
SELECT CASE WHEN bucket = 8 THEN 'val'
            WHEN bucket = 9 THEN 'test'
            ELSE 'train' END AS split,
       lang, COUNT(*)::BIGINT AS n_docs
FROM b GROUP BY 1, 2
"""


# train/eval contamination: verbatim 8-gram overlap between the test
# split (md5 bucket 9) and train docs (buckets 0-7); val excluded.
# Shingle semantics match the engine: docs shorter than K words
# contribute their whole text as the single shingle.
SQL_DOC_DECON = """
WITH b AS (
  SELECT doc_id,
    CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         AS UBIGINT) % 10 AS INTEGER) AS bucket,
    string_split(text, ' ') AS words
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, bucket,
    unnest(list_transform(
      range(1, greatest(len(words) - 7, 1) + 1),
      i -> array_to_string(words[i:i+7], ' '))) AS shingle
  FROM b WHERE bucket <> 8
), t AS (
  SELECT DISTINCT shingle FROM sh WHERE bucket = 9
)
SELECT s.doc_id, COUNT(*)::BIGINT AS n_overlap
FROM sh s JOIN t USING (shingle)
WHERE s.bucket < 8
GROUP BY s.doc_id
"""


# repetition quality signals: word 2-/3-gram duplicate and top-gram
# fractions, floor-scaled to milli. Gram construction matches the
# engine: consecutive-word joins, docs shorter than n words → 0 grams.
SQL_DOC_REPETITION = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), g2 AS (
  SELECT doc_id, unnest(list_transform(
    range(1, greatest(len(words) - 1, 0) + 1),
    i -> words[i] || ' ' || words[i+1])) AS gram
  FROM w
), g3 AS (
  SELECT doc_id, unnest(list_transform(
    range(1, greatest(len(words) - 2, 0) + 1),
    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS gram
  FROM w
), s2 AS (
  SELECT doc_id, SUM(cnt) AS total, COUNT(*) AS dist, MAX(cnt) AS topc
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
  GROUP BY doc_id
), s3 AS (
  SELECT doc_id, SUM(cnt) AS total, COUNT(*) AS dist, MAX(cnt) AS topc
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT w.doc_id,
  COALESCE(s2.total, 0)::BIGINT AS n_gram2,
  COALESCE((1000 * (s2.total - s2.dist)) // s2.total, 0)::BIGINT AS dup2_milli,
  COALESCE((1000 * s2.topc) // s2.total, 0)::BIGINT AS top2_milli,
  COALESCE(s3.total, 0)::BIGINT AS n_gram3,
  COALESCE((1000 * (s3.total - s3.dist)) // s3.total, 0)::BIGINT AS dup3_milli,
  COALESCE((1000 * s3.topc) // s3.total, 0)::BIGINT AS top3_milli
FROM w LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
"""


# per-doc top-3 salient terms: tf over the doc, df over the corpus,
# full deterministic order (tf DESC, df ASC, term ASC)
SQL_DOC_TFIDF_TOP = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM w GROUP BY 1, 2
), df AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1
), r AS (
  SELECT doc_id, term, tf, df,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY tf DESC, df ASC, term ASC) AS rank
  FROM tf JOIN df USING (term)
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df
FROM r WHERE rank <= 3
"""


# incremental dedup: incoming batch (doc_id % 3 = 0) anti-joined
# against the existing corpus (the rest) on content md5; dup_of
# coalesced to -1 so the int column stays non-nullable
SQL_DEDUP_INCREMENTAL = """
WITH d AS (
  SELECT doc_id, md5(text) AS content_md5 FROM documents
), p AS (
  SELECT content_md5, MIN(doc_id) AS m FROM d
  WHERE doc_id % 3 <> 0 GROUP BY 1
)
SELECT d.doc_id,
  COALESCE(p.m, -1)::BIGINT AS dup_of,
  (CASE WHEN p.m IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_new
FROM d LEFT JOIN p USING (content_md5)
WHERE d.doc_id % 3 = 0
"""


# sliding-window chunking: C=32-word windows at stride S=24, last
# chunk clipped; md5 pins chunk content. Mirrors ops/text.py
# DOC_CHUNK_C / DOC_CHUNK_S.
SQL_DOC_CHUNKS = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
), c AS (
  SELECT doc_id, words, len(words) AS n,
    CASE WHEN len(words) <= 32 THEN 1
         ELSE 1 + (len(words) - 32 + 23) // 24 END AS k
  FROM w
), e AS (
  SELECT doc_id, words, n, unnest(range(0, k)) AS i FROM c
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
  CAST(least(i*24 + 32, n) - i*24 AS BIGINT) AS n_words,
  md5(array_to_string(words[i*24 + 1 : least(i*24 + 32, n)], ' '))
    AS chunk_md5
FROM e
"""


# common-token fraction: global top-256 words (count DESC, word ASC),
# per-doc floor-milli fraction of occurrences in that head
SQL_DOC_COMMON_FRAC = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), cnt AS (
  SELECT word, COUNT(*) AS c FROM w GROUP BY 1
), topk AS (
  SELECT word FROM cnt ORDER BY c DESC, word ASC LIMIT 256
), per AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_words,
    SUM(CASE WHEN word IN (SELECT word FROM topk) THEN 1 ELSE 0 END)
      ::BIGINT AS hit
  FROM w GROUP BY 1
)
SELECT doc_id, n_words, (1000 * hit) // n_words AS common_milli FROM per
"""


# unigram-LM familiarity: per-term corpus frequency → integer milli-log
# per term (the single float op, identical libm ln in numpy/DuckDB) →
# exact integer per-doc fold. Matches ops/text.py q_doc_lm_score.
SQL_DOC_LM_SCORE = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), ctf AS (
  SELECT term, COUNT(*)::BIGINT AS c FROM w GROUP BY 1
), llr AS (
  SELECT term, CAST(floor(1000 * ln(c) + 0.5) AS BIGINT) AS lm FROM ctf
), per AS (
  SELECT w.doc_id, COUNT(*)::BIGINT AS n_words,
         SUM(l.lm)::BIGINT AS total_lfam
  FROM w JOIN llr l USING (term) GROUP BY 1
)
SELECT doc_id, n_words, total_lfam,
       total_lfam // n_words AS fam_milli
FROM per
"""


# per-source top-half quality gate: threshold = the ceil(n/2)-th LARGEST
# stop_ratio_milli per source (ties kept). Mirrors the bounded-domain
# histogram CDF walk in ops/text.py q_doc_quality_topp.
SQL_DOC_QUALITY_TOPP = f"""
WITH s AS (
  SELECT source,
    (1000 * CAST(len(list_filter(string_split(text, ' '),
         x -> x IN ({_inlist(STOPWORDS)}))) AS BIGINT))
      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
  FROM documents
), h AS (
  SELECT source, score, COUNT(*)::BIGINT AS c FROM s GROUP BY 1, 2
), t AS (
  SELECT source, score, c,
    SUM(c) OVER (PARTITION BY source ORDER BY score DESC
                 ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(c) OVER (PARTITION BY source) AS n
  FROM h
), q AS (
  SELECT source, MAX(n)::BIGINT AS n_docs,
         MAX(score) FILTER (WHERE cum >= (n + 1) // 2) AS thr
  FROM t GROUP BY source
)
SELECT q.source, q.n_docs,
       CAST(q.thr AS BIGINT) AS threshold_milli,
       CAST(t.cum AS BIGINT) AS n_kept
FROM q JOIN t ON t.source = q.source AND t.score = q.thr
"""


# ----------------------------------------------------- span-dedup family
# semantic twins of ops/spans.py (Lee-et-al-style fixed-width substring
# dedup); SPAN_W / SPAN_MIN_DOCS are imported so a width change can
# never desynchronize engine and oracle
from .spans import (SPAN_MIN_DOCS, SPAN_W,  # noqa: E402
                    SPLIT_SALT, SPLIT_TRAIN_HEX)

_SPAN_BASE = f"""
d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
sh AS (SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
       md5(array_to_string(
           w[CAST(t.i AS BIGINT):CAST(t.i AS BIGINT)+{SPAN_W - 1}],' ')) AS g
       FROM d, UNNEST(range(1, len(w)-{SPAN_W - 2})) AS t(i)
       WHERE len(w) >= {SPAN_W}),
freq AS (SELECT g FROM sh GROUP BY g
         HAVING count(DISTINCT doc_id) >= {SPAN_MIN_DOCS}),
cov AS (SELECT doc_id, list(DISTINCT p ORDER BY p) AS ps FROM
        (SELECT sh.doc_id, CAST(t2.p AS BIGINT) AS p
         FROM sh JOIN freq USING (g),
              UNNEST(range(sh.pos, sh.pos+{SPAN_W})) AS t2(p))
        GROUP BY doc_id)
"""

SQL_DOC_DUP_SPANS = f"""
WITH {_SPAN_BASE}
SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_words,
       CAST(len(c.ps) AS BIGINT) AS covered_words,
       (1000*len(c.ps))//len(d.w) AS covered_milli
FROM d JOIN cov c USING (doc_id)
"""

SQL_DOC_DEDUP_SPANS = f"""
WITH {_SPAN_BASE},
dc AS (SELECT d.doc_id, d.w, COALESCE(c.ps, []) AS ps
       FROM d LEFT JOIN cov c USING (doc_id)),
kept AS (SELECT doc_id, list(w[CAST(t.i AS BIGINT)] ORDER BY t.i) AS kw
         FROM dc, UNNEST(range(1, len(w)+1)) AS t(i)
         WHERE NOT list_contains(ps, CAST(t.i AS BIGINT))
         GROUP BY doc_id)
SELECT doc_id, CAST(len(kw) AS BIGINT) AS n_kept,
       md5(array_to_string(kw,' ')) AS kept_md5
FROM kept
"""

SQL_DOC_SOURCE_OVERLAP = f"""
WITH d AS (SELECT doc_id, source, string_split(text,' ') AS w
           FROM documents),
sh AS (SELECT DISTINCT source,
       md5(array_to_string(
           w[CAST(t.i AS BIGINT):CAST(t.i AS BIGINT)+{SPAN_W - 1}],' ')) AS g
       FROM d, UNNEST(range(1, len(w)-{SPAN_W - 2})) AS t(i)
       WHERE len(w) >= {SPAN_W})
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*)::BIGINT AS shared_shingles
FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
GROUP BY 1, 2
"""

SQL_DOC_SPLIT_LEAKFREE = f"""
WITH clusters AS (
{SQL_DUP_CLUSTERS.strip().rstrip()}
), rep AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS r
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
)
SELECT doc_id,
  CASE WHEN substr(md5(CONCAT(CAST(r AS VARCHAR), '{SPLIT_SALT}')), 1, 4)
            < '{SPLIT_TRAIN_HEX}'
       THEN 'train' ELSE 'eval' END AS split
FROM rep
"""


SQL_DOC_QUALITY_RANK = f"""
WITH s AS (
  SELECT doc_id,
    (1000 * CAST(len(list_filter(string_split(text, ' '),
         x -> x IN ({_inlist(STOPWORDS)}))) AS BIGINT))
      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
  FROM documents
)
SELECT doc_id, score,
  CAST(RANK() OVER (ORDER BY score) AS BIGINT) AS rnk,
  CAST((1000 * (RANK() OVER (ORDER BY score) - 1))
       // GREATEST(COUNT(*) OVER () - 1, 1) AS BIGINT) AS pct_milli
FROM s
"""


SQL_DOC_SOURCE_DRIFT = f"""
WITH s AS (
  SELECT source,
    (1000 * CAST(len(list_filter(string_split(text, ' '),
         x -> x IN ({_inlist(STOPWORDS)}))) AS BIGINT))
      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
  FROM documents
), h AS (
  SELECT source, score, COUNT(*)::BIGINT AS c FROM s GROUP BY 1, 2
), dom AS (
  SELECT DISTINCT score FROM s
), srcs AS (
  SELECT source, COUNT(*)::BIGINT AS n FROM s GROUP BY 1
), gn AS (
  SELECT COUNT(*)::BIGINT AS n FROM s
), gcdf AS (
  SELECT score, CAST(SUM(c) OVER (ORDER BY score) AS BIGINT) AS gcum
  FROM (SELECT score, SUM(c) AS c FROM h GROUP BY 1)
), grid AS (
  SELECT srcs.source, srcs.n, dom.score, COALESCE(h.c, 0) AS c
  FROM srcs CROSS JOIN dom
  LEFT JOIN h ON h.source = srcs.source AND h.score = dom.score
), cdf AS (
  SELECT source, n, score,
    CAST(SUM(c) OVER (PARTITION BY source ORDER BY score) AS BIGINT) AS sc
  FROM grid
), d AS (
  SELECT cdf.source, cdf.n, cdf.score,
    ABS((1000 * cdf.sc) // cdf.n
        - (1000 * gcdf.gcum) // (SELECT n FROM gn)) AS dd
  FROM cdf JOIN gcdf USING (score)
), m AS (
  SELECT source, MAX(n) AS n_docs, MAX(dd) AS d_milli FROM d GROUP BY 1
)
SELECT m.source, CAST(m.n_docs AS BIGINT) AS n_docs,
       CAST(m.d_milli AS BIGINT) AS d_milli,
       CAST(MIN(d.score) AS BIGINT) AS drift_at
FROM m JOIN d ON d.source = m.source AND d.dd = m.d_milli
GROUP BY 1, 2, 3
"""


from .text import SOURCE_TERMS_K  # noqa: E402

SQL_DOC_SOURCE_TERMS = f"""
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
), sw AS (
  SELECT source, term, COUNT(*)::BIGINT AS c FROM w GROUP BY 1, 2
), ns AS (
  SELECT source, SUM(c)::BIGINT AS n FROM sw GROUP BY 1
), cw AS (
  SELECT term, SUM(c)::BIGINT AS cg FROM sw GROUP BY 1
), tot AS (
  SELECT SUM(c)::BIGINT AS n FROM sw
), sc AS (
  SELECT sw.source, sw.term, sw.c,
    (1000 * sw.c) // ns.n
      - (1000 * (cw.cg - sw.c))
        // GREATEST((SELECT n FROM tot) - ns.n, 1) AS lift_milli
  FROM sw JOIN ns USING (source) JOIN cw USING (term)
), r AS (
  SELECT source, term, c, lift_milli,
    ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY lift_milli DESC, term ASC) AS rn
  FROM sc
)
SELECT source, CAST(rn AS BIGINT) AS rank, term,
       CAST(c AS BIGINT) AS n_occ, CAST(lift_milli AS BIGINT) AS lift_milli
FROM r WHERE rn <= {SOURCE_TERMS_K}
"""


from .text import EXP_SCALE, WEIGHTED_K  # noqa: E402

SQL_DOC_WEIGHTED_SAMPLE = f"""
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
    (CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)
          AS DOUBLE) + 1.0) / 18446744073709551616.0 AS u
  FROM documents
), k AS (
  SELECT doc_id, w,
    CAST(FLOOR(-ln(u) * {EXP_SCALE}.0) AS BIGINT) // w AS key_scaled
  FROM d
), r AS (
  SELECT doc_id, w, key_scaled,
    ROW_NUMBER() OVER (ORDER BY key_scaled ASC, doc_id ASC) AS rank
  FROM k
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, w, key_scaled
FROM r WHERE rank <= {WEIGHTED_K}
"""


from .dedup import (PR_DAMP_MILLI, PR_ITERS, PR_SCALE,  # noqa: E402
                    PR_SHINGLE_PREFIXES)


def _pagerank_cte_chain() -> str:
    """Unroll the integer PageRank recurrence into PR_ITERS CTE pairs —
    the oracle recomputes the exact engine arithmetic (floor divisions
    on non-negative values, so DuckDB // matches numpy //)."""
    base = (1000 - PR_DAMP_MILLI) * PR_SCALE // 1000
    parts = []
    for i in range(1, PR_ITERS + 1):
        parts.append(f"""c{i} AS (
  SELECT e.t AS node, SUM(r{i - 1}.r // r{i - 1}.deg)::BIGINT AS cs
  FROM edges e JOIN r{i - 1} ON e.s = r{i - 1}.node GROUP BY 1
), r{i} AS (
  SELECT deg.node, deg.deg,
         {base} + ({PR_DAMP_MILLI} * c{i}.cs) // 1000 AS r
  FROM deg JOIN c{i} USING (node)
)""")
    return ",\n".join(parts)


_PR_PREFIX_LIST = ", ".join(f"'{p}'" for p in PR_SHINGLE_PREFIXES)

SQL_DOC_PAGERANK = f"""
WITH d0 AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
    md5(array_to_string(w[CAST(t.i AS BIGINT):CAST(t.i AS BIGINT)+4], ' ')) AS fp
  FROM d0, UNNEST(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), f AS (
  SELECT doc_id, fp FROM sh WHERE substr(fp, 1, 1) IN ({_PR_PREFIX_LIST})
), edges AS (
  SELECT DISTINCT a.doc_id AS s, b.doc_id AS t
  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id <> b.doc_id
), deg AS (
  SELECT s AS node, COUNT(*)::BIGINT AS deg FROM edges GROUP BY 1
), r0 AS (
  SELECT node, deg, {PR_SCALE}::BIGINT AS r FROM deg
),
{_pagerank_cte_chain()}
SELECT node AS doc_id, deg, CAST(r AS BIGINT) AS rank_e6 FROM r{PR_ITERS}
"""


# triangles: SAME edge derivation as PageRank (shared substrate —
# swarm_ray.ops.dedup._dup_edges), then the canonical x<y<z 3-way
# self-join; per-doc count = triangle memberships.
SQL_DOC_TRIANGLES = f"""
WITH d0 AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
    md5(array_to_string(w[CAST(t.i AS BIGINT):CAST(t.i AS BIGINT)+4], ' ')) AS fp
  FROM d0, UNNEST(range(1, len(w) - 3)) AS t(i)
  WHERE len(w) >= 5
), f AS (
  SELECT doc_id, fp FROM sh WHERE substr(fp, 1, 1) IN ({_PR_PREFIX_LIST})
), und AS (
  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
  FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT doc_id, COUNT(*)::BIGINT AS tri FROM (
  SELECT x AS doc_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
) GROUP BY 1
"""


from .dedup import SIMHASH_BANDS, SIMHASH_HAM  # noqa: E402

SQL_SIMHASH_PAIRS = f"""
WITH s AS (
{SQL_SIMHASH.strip()}
), bands AS (
  SELECT doc_id, simhash, b.b AS band,
         (simhash >> (8 * b.b)) & 255 AS bits
  FROM s, (SELECT unnest(range({SIMHASH_BANDS})) AS b) AS b
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {SIMHASH_HAM}
"""


SQL_DOC_SOURCE_ENTROPY = """
WITH w AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS term FROM documents
), c AS (
  SELECT source, term, COUNT(*)::BIGINT AS c FROM w GROUP BY 1, 2
), s AS (
  SELECT source, SUM(c)::BIGINT AS n, COUNT(*)::BIGINT AS vocab,
         SUM(c * CAST(FLOOR(1000 * ln(c) + 0.5) AS BIGINT))::BIGINT AS sl
  FROM c GROUP BY 1
)
SELECT source, n AS n_words, vocab,
  (CAST(FLOOR(1000 * ln(n) + 0.5) AS BIGINT) - sl // n)::BIGINT
    AS ent_milli
FROM s
"""
