"""DuckDB-SQL mirrors of ``functions.text`` — shared oracle fragments.

Every text operator's oracle must replicate the Spark expression
exactly (tokenization, ratios, language markers, normalization), and
several query modules compose them (``queries_llm`` per-operator,
``queries_traindata`` in the curation pipeline). They live in their own
module so query modules never import each other — cross-imports between
registry-registered modules break under direct import (the registry's
``_load_all`` runs mid-import of whichever module was imported first).
"""

from __future__ import annotations

TOKS = "string_split_regex(TRIM(text), ' +')"
TOKS_L = "string_split_regex(TRIM(LOWER(text)), ' +')"

PUNCT_RATIO = (
    "CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE "
    "(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))"
    " * 1.0 / LENGTH(text) END"
)

STOP_RATIO = (
    f"CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0 ELSE "
    f"len(list_filter({TOKS_L}, tk -> tk IN ('the','a','of','and','to','in')))"
    f" * 1.0 / len({TOKS_L}) END"
)

NORM = (
    "TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),"
    "' +', ' ', 'g'))"
)

QUALITY = (
    f"ROUND(0.5 * LEAST(LENGTH(text) / 400.0, 1.0)"
    f" + 0.3 * LEAST(({STOP_RATIO}) * 5.0, 1.0)"
    f" + 0.2 * (1.0 - ({PUNCT_RATIO})) + 5e-10, 4)"
)


def lang_sql() -> str:
    """Marker-stopword language heuristic (mirror of
    ``functions.text.language_id`` incl. its tie-break order)."""
    hits = {
        "en": "('the','and','of')",
        "es": "('el','la','los')",
        "fr": "('le','les','des')",
        "de": "('der','die','und')",
    }
    h = {
        lang: f"len(list_filter({TOKS_L}, tk -> tk IN {inlist}))"
        for lang, inlist in hits.items()
    }
    return f"""
    CASE WHEN {h['en']} >= GREATEST({h['es']}, {h['fr']}, {h['de']})
              AND {h['en']} > 0 THEN 'en'
         WHEN {h['es']} >= GREATEST({h['fr']}, {h['de']})
              AND {h['es']} > 0 THEN 'es'
         WHEN {h['fr']} >= {h['de']} AND {h['fr']} > 0 THEN 'fr'
         WHEN {h['de']} > 0 THEN 'de'
         ELSE 'und' END
    """


#: Exact n-gram (3-shingle) Jaccard near-dup pairs — the oracle for
#: both the inverted-index exact tier and the MinHash-LSH tier (recall
#: 1.0 at the fixtures' similarity gap).
JACCARD_PAIRS_SQL = """
    WITH toks AS (
      SELECT doc_id, string_split_regex(TRIM(text), ' +') AS t
      FROM documents
      WHERE text IS NOT NULL AND LENGTH(TRIM(text)) > 0
    ),
    pos AS (
      SELECT doc_id, unnest(generate_series(1, len(t) - 2)) AS i, t
      FROM toks WHERE len(t) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM pos
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT ia AS id_a, ib AS id_b,
           ROUND(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
    FROM pairs
    JOIN sizes na ON ia = na.doc_id
    JOIN sizes nb ON ib = nb.doc_id
    WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5
"""

