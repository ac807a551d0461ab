"""DuckDB oracle SQL builders for the KG pipeline queries.

Each builder returns ANSI-ish DuckDB SQL that recomputes a pipeline stage
INDEPENDENTLY from the same corpus parquet files (via ``read_parquet``) the
Ray pipeline reads: same extraction regex, a string-function re-expression of
``normalize_name``, and a recursive-CTE connected-components closure instead
of the driver union-find. Column names match the Ray outputs exactly (driver
hash-compares by sorted column name).
"""

from __future__ import annotations

from .sources.corpus import corpus_paths
from .stages.extract import TRIPLE_REGEX

# SQL re-expression of functions.text.normalize_name (lower + first-comma
# inversion + whitespace collapse)
def _norm(x: str) -> str:
    return (
        "lower(regexp_replace(trim(CASE WHEN strpos({x}, ', ') > 0 "
        "THEN substr({x}, strpos({x}, ', ') + 2) || ' ' || "
        "substr({x}, 1, strpos({x}, ', ') - 1) ELSE {x} END), ' +', ' ', 'g'))"
    ).format(x=x)


_PRED_CASE = """CASE {m}
    WHEN 'is associated with' THEN 'associated_with'
    WHEN 'is related to' THEN 'related_to'
    WHEN 'interacts with' THEN 'interacts_with'
    ELSE {m} END"""


def _extract_cte(transcripts: str) -> str:
    pat = TRIPLE_REGEX
    return f"""
raw_m AS (
  SELECT conv_id, turn_idx,
         unnest(regexp_extract_all(text, '{pat}')) AS mt
  FROM read_parquet('{transcripts}/*.parquet')
),
raw AS (
  SELECT conv_id, turn_idx,
         regexp_extract(mt, '{pat}', 1) AS subj,
         {_PRED_CASE.format(m=f"regexp_extract(mt, '{pat}', 2)")} AS pred,
         regexp_extract(mt, '{pat}', 3) AS obj
  FROM raw_m
)"""


def _linked_cte(p: dict[str, str]) -> str:
    return f"""{_extract_cte(p["transcripts"])},
lex AS (SELECT surface_norm, curie FROM read_parquet('{p["lexicon"]}')),
linked AS (
  SELECT r.conv_id, r.turn_idx, ls.curie AS subj_id,
         'PRED:' || r.pred AS pred_id, lo.curie AS obj_id
  FROM raw r
  JOIN lex ls ON ls.surface_norm = {_norm("r.subj")}
  JOIN lex lo ON lo.surface_norm = {_norm("r.obj")}
)"""


def _canon_cte(p: dict[str, str]) -> str:
    """Recursive label propagation over bridge edges; canon = min reachable
    primary CURIE — independent recomputation of gazetteer.canonical_map."""
    return f"""{_linked_cte(p)},
reach(id, lbl) AS (
  SELECT curie, curie FROM read_parquet('{p["gazetteer"]}')
  UNION
  SELECT CASE WHEN r.id = b.a THEN b.b ELSE b.a END, r.lbl
  FROM reach r JOIN read_parquet('{p["bridges"]}') b ON r.id = b.a OR r.id = b.b
),
cc AS (SELECT id, min(lbl) AS canon FROM reach GROUP BY id),
canon AS (
  SELECT l.conv_id, l.turn_idx, cs.canon AS subj_id, l.pred_id, co.canon AS obj_id
  FROM linked l
  JOIN cc cs ON cs.id = l.subj_id
  JOIN cc co ON co.id = l.obj_id
)"""


def sql_extract(tier: str) -> str:
    p = corpus_paths(tier)
    return f"WITH {_extract_cte(p['transcripts'])[1:]}\nSELECT conv_id, turn_idx, subj, pred, obj FROM raw"


def sql_linked(tier: str) -> str:
    p = corpus_paths(tier)
    return (
        f"WITH {_linked_cte(p)[1:]}\n"
        "SELECT conv_id, turn_idx, subj_id, pred_id, obj_id FROM linked"
    )


def sql_canonical(tier: str) -> str:
    p = corpus_paths(tier)
    return (
        f"WITH RECURSIVE {_canon_cte(p)[1:]}\n"
        "SELECT conv_id, turn_idx, subj_id, pred_id, obj_id FROM canon"
    )


def sql_nodes(tier: str) -> str:
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
used AS (
  SELECT DISTINCT id FROM (
    SELECT subj_id AS id FROM canon UNION ALL SELECT obj_id AS id FROM canon
  )
),
members AS (
  SELECT c.canon, g.curie, g.name, g.node_type, g.synonyms
  FROM read_parquet('{p["gazetteer"]}') g JOIN cc c ON c.id = g.curie
),
eq AS (
  SELECT canon,
         list_sort(list_distinct(flatten(list(list_append(synonyms, curie)))))
           AS equivalent_identifiers
  FROM members GROUP BY canon
)
SELECT u.id, m.name, m.node_type, eq.equivalent_identifiers
FROM used u
JOIN eq ON eq.canon = u.id
JOIN members m ON m.canon = u.id AND m.curie = u.id"""


def sql_edges(tier: str) -> str:
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]}
SELECT subj_id, pred_id, replace(pred_id, ':', '_') AS standard_label, obj_id,
       'extractor.triple_pattern' AS edge_source,
       list_sort(list_distinct(list('CONV:' || conv_id || '#' ||
                                    CAST(turn_idx AS VARCHAR)))) AS publications,
       count(*) AS n_mentions,
       false AS is_support
FROM canon
GROUP BY subj_id, pred_id, obj_id"""


def sql_support(tier: str) -> str:
    """Counts + expected + Yates chi2 (no p: DuckDB lacks erfc; p is a
    monotone transform of chi2 at df=1 and is checked in pytest instead)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
marg AS (SELECT id, count(*) AS c FROM conv_ent GROUP BY id),
joint AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
  FROM conv_ent a JOIN conv_ent b
    ON a.conv_id = b.conv_id AND a.id < b.id
  GROUP BY a.id, b.id
),
tot AS (SELECT count(DISTINCT conv_id) AS n
        FROM read_parquet('{p["transcripts"]}/*.parquet')),
scored AS (
  SELECT j.id_a, j.id_b, m1.c AS c1, m2.c AS c2, j.c AS c, tot.n AS n,
         greatest(0.0, abs(j.c * (tot.n - m1.c - m2.c + j.c)
                           - (m1.c - j.c) * (m2.c - j.c)) - tot.n / 2.0) AS g,
         1.0 * m1.c * m2.c * (tot.n - m1.c) * (tot.n - m2.c) AS denom
  FROM joint j
  JOIN marg m1 ON m1.id = j.id_a
  JOIN marg m2 ON m2.id = j.id_b
  CROSS JOIN tot
)
SELECT id_a, id_b, c1, c2, c,
       1.0 * c1 * c2 / n AS expected,
       CASE WHEN denom > 0 THEN n * g * g / denom ELSE 0.0 END AS chi2,
       c < 11 AS suppressed
FROM scored"""


def sql_node_type_histogram(tier: str) -> str:
    """Histogram over the emitted node table (`builder/builder.py:129-134`)."""
    nodes = sql_nodes(tier)
    return f"SELECT node_type, count(*) AS n FROM ({nodes}) GROUP BY node_type"


def sql_turns_ordered(tier: str) -> str:
    p = corpus_paths(tier)
    return (
        f"SELECT conv_id, turn_idx, text "
        f"FROM read_parquet('{p['transcripts']}/*.parquet')"
    )


def sql_components(tier: str) -> str:
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE
reach(id, lbl) AS (
  SELECT curie, curie FROM read_parquet('{p["gazetteer"]}')
  UNION
  SELECT CASE WHEN r.id = b.a THEN b.b ELSE b.a END, r.lbl
  FROM reach r JOIN read_parquet('{p["bridges"]}') b ON r.id = b.a OR r.id = b.b
)
SELECT id, min(lbl) AS component FROM reach GROUP BY id"""
