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


def sql_nodes_upsert(tier: str) -> str:
    """Independent recomputation of the run-over-run node UPSERT
    (`stages/upsert.py` merge semantics, `builder/builder.py:76-96`):
    run 1 = full standard node table; run 2 = even-parity conversations
    with names upper-cased and synonyms projected to UMLS codes. Merge:
    run 2 overwrites name and the synonym set (id re-included), types
    union; run-1-only ids pass through."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
used1 AS (
  SELECT DISTINCT id FROM (
    SELECT subj_id AS id FROM canon UNION ALL SELECT obj_id AS id FROM canon
  )
),
used2 AS (
  SELECT DISTINCT id FROM (
    SELECT subj_id AS id FROM canon
    WHERE CAST(substr(conv_id, -1) AS INT) % 2 = 0
    UNION ALL
    SELECT obj_id AS id FROM canon
    WHERE CAST(substr(conv_id, -1) AS INT) % 2 = 0
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
),
run1 AS (
  SELECT u.id, m.name, m.node_type, eq.equivalent_identifiers
  FROM used1 u
  JOIN eq ON eq.canon = u.id
  JOIN members m ON m.canon = u.id AND m.curie = u.id
),
run2 AS (
  SELECT u.id, upper(m.name) AS name, m.node_type,
         list_sort(list_filter(eq.equivalent_identifiers,
                               x -> x LIKE 'UMLS:%'))
           AS equivalent_identifiers
  FROM used2 u
  JOIN eq ON eq.canon = u.id
  JOIN members m ON m.canon = u.id AND m.curie = u.id
)
SELECT r1.id,
       coalesce(r2.name, r1.name) AS name,
       CASE WHEN r2.id IS NULL THEN [r1.node_type]
            ELSE list_sort(list_distinct([r1.node_type, r2.node_type]))
       END AS node_types,
       list_sort(list_distinct(list_append(
           coalesce(r2.equivalent_identifiers, r1.equivalent_identifiers),
           r1.id))) AS equivalent_identifiers
FROM run1 r1 LEFT JOIN run2 r2 ON r1.id = r2.id"""


def sql_nodes_expanded(tier: str) -> str:
    """kg_nodes + M9 dynamic coded-synonym expansion: the xref table joins
    on the component MEMBERS' primary curies (exactly the ids in the
    engine's equivalent_identifiers that can hit the xref dict) and the
    found codes fold into equivalent_identifiers for the gated node types
    (`builder/cdw.py:20-21` DISEASE/GENETIC_CONDITION analog)."""
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
),
ex AS (
  SELECT m.canon, list(DISTINCT x.code) AS codes
  FROM members m JOIN read_parquet('{p["xrefs"]}') x ON x.curie = m.curie
  GROUP BY m.canon
)
SELECT u.id, m.name, m.node_type,
       CASE WHEN m.node_type IN ('disease', 'phenotypic_feature')
                 AND ex.codes IS NOT NULL
            THEN list_sort(list_distinct(
                   eq.equivalent_identifiers || ex.codes))
            ELSE eq.equivalent_identifiers
       END AS equivalent_identifiers
FROM used u
JOIN eq ON eq.canon = u.id
JOIN members m ON m.canon = u.id AND m.curie = u.id
LEFT JOIN ex ON ex.canon = u.id"""


def sql_edges(tier: str) -> str:
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]}
SELECT subj_id, pred_id, replace(pred_id, ':', '_') AS standard_label, obj_id,
       'extractor.triple_pattern' AS edge_source,
       CAST(0 AS BIGINT) AS ctime,
       subj_id || ',' || obj_id AS input_identifiers,
       list_sort(list_distinct(list('CONV:' || conv_id || '#' ||
                                    CAST(turn_idx AS VARCHAR)))) AS publications,
       count(*) AS n_mentions,
       false AS is_support
FROM canon
GROUP BY subj_id, pred_id, obj_id"""


def sql_support(tier: str, cap: int = 256) -> str:
    """Counts + expected + Yates chi2 (no p: DuckDB lacks erfc; p is a
    monotone transform of chi2 at df=1 and is checked in pytest instead).

    The joint CTE models the engine's per-conversation entity cap
    (``max_entities_per_conv`` — lexicographically-first ``cap`` entities):
    marginals are uncapped, pair generation is capped, exactly like
    ``support_stage``."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
),
marg AS (SELECT id, count(*) AS c FROM conv_ent GROUP BY id),
joint AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
  FROM conv_ent_r a JOIN conv_ent_r b
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


def sql_support_triples(tier: str, cap: int = 64,
                        min_sup: int = 2) -> str:
    """Oracle for support.support_triples_stage: capped per-conv entity
    sets, every ascending triple, conversation counts >= min_sup."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
)
SELECT a.id AS id_a, b.id AS id_b, c.id AS id_c,
       CAST(count(*) AS BIGINT) AS n_convs
FROM conv_ent_r a
JOIN conv_ent_r b ON b.conv_id = a.conv_id AND b.id > a.id
JOIN conv_ent_r c ON c.conv_id = a.conv_id AND c.id > b.id
GROUP BY a.id, b.id, c.id
HAVING count(*) >= {min_sup}"""


def sql_name_lookup(tier: str) -> str:
    """Oracle for the typed name -> CURIE dispatch (M2/M3/M5/D5):
    normalization recomputed in SQL (comma inversion at the FIRST ', ',
    whitespace collapse, lower, trim), joined against the lexicon table,
    with the per-type HP-prefix rule."""
    p = corpus_paths(tier)
    return f"""
WITH gsel AS (
  SELECT name, node_type FROM read_parquet('{p["gazetteer"]}')
  WHERE node_type IN ('phenotypic_feature', 'disease', 'chemical_substance')
),
n1 AS (SELECT name, node_type, trim(name) AS s FROM gsel),
n2 AS (
  SELECT name, node_type,
         CASE WHEN position(', ' IN s) > 0
              THEN substr(s, position(', ' IN s) + 2)
                   || ' ' || substr(s, 1, position(', ' IN s) - 1)
              ELSE s END AS s2
  FROM n1
),
norm AS (
  SELECT name, node_type,
         trim(regexp_replace(lower(s2), '\\s+', ' ', 'g')) AS sn
  FROM n2
)
SELECT nm.name, nm.node_type, l.curie
FROM norm nm
JOIN read_parquet('{p["lexicon"]}') l ON l.surface_norm = nm.sn
WHERE CASE WHEN nm.node_type = 'phenotypic_feature'
                THEN l.curie LIKE 'HP:%'
           WHEN nm.node_type = 'disease'
                THEN l.curie NOT LIKE 'HP:%'
           ELSE TRUE END"""


def sql_phrase_sim(tier: str, cap: int = 256) -> str:
    """Independent recomputation of the phrase-similarity supporter
    (`builder/chemotext2.py:30-42` semantics, `stages/supporters.py`
    PhraseSimScorer): candidate pairs (the kg_support pair universe),
    phrase generation (punct strip, whitespace split, single-word
    passthrough, length>2 + stoplist filter), max token-set Jaccard with
    first-match argmax terms. Generated phrases are single words, so the
    max Jaccard over singleton token sets is exactly 1.0 on any
    case-insensitive word match and no edge otherwise; term_a = the
    FIRST a-phrase (generation order) matching any b-phrase, term_b =
    the first b-phrase matching that term_a — the engine's strict
    ``s > best`` loop order."""
    from .functions.text import PHRASE_STOPLIST

    stop = ", ".join(f"'{w}'" for w in sorted(PHRASE_STOPLIST))
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM conv_ent_r a JOIN conv_ent_r b
    ON a.conv_id = b.conv_id AND a.id < b.id
),
names AS (
  SELECT g.curie AS id, g.name
  FROM read_parquet('{p["gazetteer"]}') g
),
base AS (
  SELECT id, list_filter(
           string_split_regex(
             regexp_replace(name, '[()\\-,;./]', ' ', 'g'), '\\s+'),
           w -> w <> '') AS ws
  FROM names
),
phr AS (
  SELECT id,
         CASE WHEN len(ws) <= 1 THEN ws
              ELSE list_filter(ws, w -> length(w) > 2
                                    AND NOT list_contains([{stop}],
                                                          lower(w)))
         END AS ps
  FROM base
),
pha AS (
  SELECT id, ps[i] AS w, i AS ord
  FROM phr, UNNEST(range(1, len(ps) + 1)) AS t(i)
),
matched AS (
  SELECT p.id_a, p.id_b, a.w AS term_a, b.w AS term_b,
         row_number() OVER (PARTITION BY p.id_a, p.id_b
                            ORDER BY a.ord, b.ord) AS rn
  FROM pairs p
  JOIN pha a ON a.id = p.id_a
  JOIN pha b ON b.id = p.id_b AND lower(a.w) = lower(b.w)
)
SELECT id_a, id_b, 1.0 AS similarity, term_a, term_b,
       'phrase_sim.term_to_term' AS edge_source, TRUE AS is_support
FROM matched WHERE rn = 1"""


def sql_support_embedding(tier: str, cap: int = 256) -> str:
    """Embedding-cosine supporter oracle (chemotext2's actual w2v-service
    semantics, `builder/chemotext2.py:14-66`): the kg_support candidate
    pair universe joined twice against the SEQUENTIAL SGNS fit's
    quantized embedding parquet (``ensure_sgns_aux`` — the same aux table
    that proves ``kg_sgns_embeddings``), cosine re-derived with exact
    int64 dot products and the engine's single-double-expression
    ``sab / sqrt(saa * sbb)`` so floats are bit-identical. Pairs whose
    endpoint is absent from the walk universe drop via the INNER join
    (term_to_term -> None)."""
    path = ensure_sgns_aux(tier)
    p = corpus_paths(tier)
    dot = " + ".join(f"a.e{j}_q * b.e{j}_q" for j in range(_SGNS_DIM))
    naa = " + ".join(f"a.e{j}_q * a.e{j}_q" for j in range(_SGNS_DIM))
    nbb = " + ".join(f"b.e{j}_q * b.e{j}_q" for j in range(_SGNS_DIM))
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM conv_ent_r a JOIN conv_ent_r b
    ON a.conv_id = b.conv_id AND a.id < b.id
)
SELECT p.id_a, p.id_b,
       CAST(({dot}) AS DOUBLE)
         / sqrt(CAST(({naa}) AS DOUBLE) * CAST(({nbb}) AS DOUBLE))
         AS similarity,
       'embedding_sim.term_to_term' AS edge_source,
       TRUE AS is_support
FROM pairs p
JOIN read_parquet('{path}') a ON a.id = p.id_a
JOIN read_parquet('{path}') b ON b.id = p.id_b
WHERE ({naa}) > 0 AND ({nbb}) > 0"""


def sql_node_contexts(tier: str, path: str = "SGD") -> str:
    """Per-node path-position contexts oracle (`builder/builder.py:381,
    396`): unrolled per-position forward/backward typed frontier CTEs
    over the distinct undirected graph; position i = forward-reachable
    at i AND backward-reachable from the final position (complete
    instances only). Wildcard positions take every type (predicate TRUE)
    — no literal type-universe list to drift (ADVICE r04 #3)."""
    from .functions.pathdsl import NODE_TYPE_BY_CODE, tokenize_path

    steps = tokenize_path(path)
    if any(s.max_path_length > 1 for s in steps[1:]):
        raise ValueError("sql_node_contexts takes direct hops only")
    ts = [NODE_TYPE_BY_CODE[s.nodetype] for s in steps]
    k = len(ts)

    def pred(t: str) -> str:
        return "TRUE" if t == "unspecified" else f"ty.node_type = '{t}'"

    p = corpus_paths(tier)
    ctes = [f"""und AS (
  SELECT DISTINCT u, v FROM (
    SELECT subj_id AS u, obj_id AS v FROM canon WHERE subj_id <> obj_id
    UNION ALL
    SELECT obj_id, subj_id FROM canon WHERE subj_id <> obj_id)
),
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}')),
gn AS (SELECT DISTINCT u AS id FROM und)"""]
    ctes.append(f"""f0 AS (
  SELECT gn.id FROM gn JOIN ty ON ty.curie = gn.id WHERE {pred(ts[0])})""")
    for i in range(1, k):
        ctes.append(f"""f{i} AS (
  SELECT DISTINCT und.v AS id FROM und
  JOIN f{i-1} ON und.u = f{i-1}.id
  JOIN ty ON ty.curie = und.v WHERE {pred(ts[i])})""")
    ctes.append(f"""b{k-1} AS (
  SELECT gn.id FROM gn JOIN ty ON ty.curie = gn.id
  WHERE {pred(ts[k-1])})""")
    for i in range(k - 2, -1, -1):
        ctes.append(f"""b{i} AS (
  SELECT DISTINCT und.v AS id FROM und
  JOIN b{i+1} ON und.u = b{i+1}.id
  JOIN ty ON ty.curie = und.v WHERE {pred(ts[i])})""")
    arms = "\n  UNION ALL\n".join(
        f"  SELECT f{i}.id, CAST({i} AS BIGINT) AS pos "
        f"FROM f{i} JOIN b{i} ON f{i}.id = b{i}.id"
        for i in range(k))
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n"
            + ",\n".join(ctes)
            + f"\nSELECT id, pos FROM (\n{arms}\n)")


def sql_path_filtered(tier: str, type_a: str = "chemical_substance",
                      type_b: str = "disease") -> str:
    """Path-DSL scoping oracle: canonical triples whose endpoint node types
    match the path's adjacent step pair (either direction) — recomputes the
    engine's ``path_filter`` via gazetteer type joins."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]}
SELECT c.conv_id, c.turn_idx, c.subj_id, c.pred_id, c.obj_id
FROM canon c
JOIN read_parquet('{p["gazetteer"]}') gs ON gs.curie = c.subj_id
JOIN read_parquet('{p["gazetteer"]}') go ON go.curie = c.obj_id
WHERE (gs.node_type = '{type_a}' AND go.node_type = '{type_b}')
   OR (gs.node_type = '{type_b}' AND go.node_type = '{type_a}')"""


def sql_path_filtered_2hop(tier: str, type_a: str = "chemical_substance",
                           type_b: str = "disease") -> str:
    """Var-length path oracle for ``S(2-2)D``: canonical triples lying on a
    2-hop path whose OUTER endpoints are typed (type_a, type_b), with ANY
    intermediate — independent recomputation of
    ``kg_build.path_filter_varlen`` via a distinct-undirected-edge CTE and
    per-vertex neighbor-type counts. Valid for type_a != type_b (the
    exclude-own-partner adjustment is identically zero then, since an
    outer endpoint's type never falls in the far type set)."""
    assert type_a != type_b
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
und AS (
  SELECT DISTINCT u, v FROM (
    SELECT subj_id AS u, obj_id AS v FROM canon WHERE subj_id <> obj_id
    UNION ALL
    SELECT obj_id, subj_id FROM canon WHERE subj_id <> obj_id)
),
nt AS (
  SELECT und.u, g.node_type AS t, count(DISTINCT und.v) AS n
  FROM und JOIN read_parquet('{p["gazetteer"]}') g ON g.curie = und.v
  GROUP BY und.u, g.node_type
),
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}'))
SELECT c.conv_id, c.turn_idx, c.subj_id, c.pred_id, c.obj_id
FROM canon c
JOIN ty ts ON ts.curie = c.subj_id
JOIN ty tob ON tob.curie = c.obj_id
LEFT JOIN nt nys ON nys.u = c.subj_id AND nys.t = '{type_b}'
LEFT JOIN nt nxs ON nxs.u = c.subj_id AND nxs.t = '{type_a}'
LEFT JOIN nt nyo ON nyo.u = c.obj_id AND nyo.t = '{type_b}'
LEFT JOIN nt nxo ON nxo.u = c.obj_id AND nxo.t = '{type_a}'
WHERE (ts.node_type = '{type_a}' AND coalesce(nyo.n, 0) >= 1)
   OR (ts.node_type = '{type_b}' AND coalesce(nxo.n, 0) >= 1)
   OR (tob.node_type = '{type_a}' AND coalesce(nys.n, 0) >= 1)
   OR (tob.node_type = '{type_b}' AND coalesce(nxs.n, 0) >= 1)"""


def sql_support_path_scoped(tier: str, path: str = "SGD") -> str:
    """Oracle for ``kg_build.path_scoped_pairs`` (the
    `builder/builder.py:372-407` ``generate_links_from_paths`` analog):
    distinct (id_a < id_b) pairs of entities lying on a realized PREFIX
    instance of the 3-position DSL path — (v0, v1) for every typed edge
    reaching position 1, plus (v1, v2) and (v0, v2) whenever the full
    instance realizes (the v2 leg needs only SOME realized prefix at its
    mid, `builder.py:394-398`; self pairs collapse under least/greatest).
    Wildcard positions expand to the full gazetteer type universe."""
    from .functions.pathdsl import NODE_TYPE_BY_CODE, tokenize_path

    steps = tokenize_path(path)
    assert len(steps) == 3 and all(
        s.max_path_length == 1 for s in steps[1:])
    p = corpus_paths(tier)
    # wildcard universe from the GAZETTEER, not a literal tuple (ADVICE
    # r04 #3: a new node type must flow into oracle wildcards the same
    # way the engine derives them from nodeinfo)
    import duckdb as _duckdb

    from .sources.corpus import ensure_corpus as _ensure

    _ensure(tier)
    universe = tuple(r[0] for r in _duckdb.sql(
        "SELECT DISTINCT node_type FROM "
        f"read_parquet('{p['gazetteer']}') ORDER BY node_type").fetchall())

    def inlist(code: str) -> str:
        t = NODE_TYPE_BY_CODE[code]
        ts = universe if t == "unspecified" else (t,)
        return ", ".join(f"'{x}'" for x in ts)

    t0, t1, t2 = (inlist(s.nodetype) for s in steps)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}')),
srcs AS (
  SELECT a.id AS mid, a.nb AS v0 FROM adj a
  JOIN ty tm ON tm.curie = a.id AND tm.node_type IN ({t1})
  JOIN ty tt ON tt.curie = a.nb AND tt.node_type IN ({t0})
),
dsts AS (
  SELECT a.id AS mid, a.nb AS v2 FROM adj a
  JOIN ty tm ON tm.curie = a.id AND tm.node_type IN ({t1})
  JOIN ty tt ON tt.curie = a.nb AND tt.node_type IN ({t2})
),
allp AS (
  SELECT v0 AS x, mid AS y FROM srcs
  UNION ALL
  SELECT d.v2, d.mid FROM dsts d
  WHERE EXISTS (SELECT 1 FROM srcs s WHERE s.mid = d.mid)
  UNION ALL
  SELECT s.v0, d.v2 FROM srcs s JOIN dsts d ON d.mid = s.mid
  WHERE s.v0 <> d.v2
)
SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b FROM allp"""


def sql_support_path_scoped4(tier: str) -> str:
    """Oracle for the 4-position path-scoped pairs (``SGPD``: chemical -
    gene - biological_process - disease, all DISTINCT types so a node
    occupies exactly one position and the reference's ancestor
    accumulation reduces to join chains): per-position typed edge
    relations e1/e2/e3 (each leg constrained to REACHED sources), pairs =
    every (position j, position i>j) join-chain projection, distinct
    under least/greatest. CTEs referenced by several arms are
    MATERIALIZED (DuckDB re-derives plain CTEs per reference — the
    sql_ktruss lesson)."""
    p = corpus_paths(tier)
    t0, t1, t2, t3 = ("chemical_substance", "gene", "biological_process",
                      "disease")
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}')),
e1 AS MATERIALIZED (
  SELECT a.id AS v0, a.nb AS v1 FROM adj a
  JOIN ty x ON x.curie = a.id AND x.node_type = '{t0}'
  JOIN ty y ON y.curie = a.nb AND y.node_type = '{t1}'
),
e2 AS MATERIALIZED (
  SELECT a.id AS v1, a.nb AS v2 FROM adj a
  JOIN ty x ON x.curie = a.id AND x.node_type = '{t1}'
  JOIN ty y ON y.curie = a.nb AND y.node_type = '{t2}'
  WHERE a.id IN (SELECT v1 FROM e1)
),
e3 AS MATERIALIZED (
  SELECT a.id AS v2, a.nb AS v3 FROM adj a
  JOIN ty x ON x.curie = a.id AND x.node_type = '{t2}'
  JOIN ty y ON y.curie = a.nb AND y.node_type = '{t3}'
  WHERE a.id IN (SELECT v2 FROM e2)
),
allp AS (
  SELECT v0 AS x, v1 AS y FROM e1
  UNION ALL SELECT v1, v2 FROM e2
  UNION ALL SELECT v2, v3 FROM e3
  UNION ALL SELECT e1.v0, e2.v2 FROM e1 JOIN e2 USING (v1)
  UNION ALL SELECT e2.v1, e3.v3 FROM e2 JOIN e3 USING (v2)
  UNION ALL SELECT e1.v0, e3.v3
            FROM e1 JOIN e2 USING (v1) JOIN e3 USING (v2)
)
SELECT DISTINCT least(x, y) AS id_a, greatest(x, y) AS id_b
FROM allp WHERE x <> y"""


def sql_support_pubs(tier: str, cap: int = 256,
                     pub_cap: int = 10_000) -> str:
    """Shared-provenance supporter oracle (`builder/omnicorp.py:14-32`
    semantics): per within-conversation pair, the sorted capped list of
    CONV: ids mentioning both entities."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
),
pubs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         list_sort(list(DISTINCT 'CONV:' || a.conv_id)) AS all_pubs
  FROM conv_ent_r a JOIN conv_ent_r b
    ON a.conv_id = b.conv_id AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       all_pubs[1:{pub_cap}] AS publications,
       least(len(all_pubs), {pub_cap}) AS n_pubs,
       'shared_pubs.term_to_term' AS edge_source,
       true AS is_support
FROM pubs"""


def sql_edges_full(tier: str, cap: int = 256) -> str:
    """One-edge-table oracle (reference sink shape, `builder/builder.py:
    32-41`): extraction edges UNION cooccur support edges (stats payload,
    `builder/cdw.py:55-60` {c1,c2,c,e,p} dict flattened to columns) UNION
    shared-pubs support edges."""
    edges = sql_edges(tier)
    support = sql_support(tier, cap)
    pubs = sql_support_pubs(tier, cap)
    return f"""
WITH x_edges AS ({edges}),
x_support AS ({support}),
x_pubs AS ({pubs})
SELECT subj_id, pred_id, standard_label, obj_id, edge_source, ctime,
       input_identifiers, publications, n_mentions, is_support,
       CAST(NULL AS BIGINT) AS c1, CAST(NULL AS BIGINT) AS c2,
       CAST(NULL AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS expected,
       CAST(NULL AS DOUBLE) AS chi2
FROM x_edges
UNION ALL
SELECT id_a AS subj_id, 'SUPPORT:literature_co-occurence' AS pred_id,
       'SUPPORT_literature_co-occurence' AS standard_label, id_b AS obj_id,
       'cooccur.term_to_term' AS edge_source, CAST(0 AS BIGINT) AS ctime,
       id_a || ',' || id_b AS input_identifiers,
       CAST([] AS VARCHAR[]) AS publications,
       CAST(NULL AS BIGINT) AS n_mentions, true AS is_support,
       c1, c2, c, expected, chi2
FROM x_support
UNION ALL
SELECT id_a AS subj_id, 'SUPPORT:literature_co-occurence' AS pred_id,
       'SUPPORT_literature_co-occurence' AS standard_label, id_b AS obj_id,
       edge_source, CAST(0 AS BIGINT) AS ctime,
       id_a || ',' || id_b AS input_identifiers, publications,
       CAST(NULL AS BIGINT) AS n_mentions, true AS is_support,
       CAST(NULL AS BIGINT) AS c1, CAST(NULL AS BIGINT) AS c2,
       CAST(NULL AS BIGINT) AS c, CAST(NULL AS DOUBLE) AS expected,
       CAST(NULL AS DOUBLE) AS chi2
FROM x_pubs"""


def sql_pagerank(tier: str, iters: int = 3) -> str:
    """Quantized-integer PageRank unrolled per iteration (aggregates are
    not allowed in a recursive CTE member, and ``iters`` is a small fixed
    constant). Integer `//` + associative sums make every iterate
    bit-identical to both engine paths (stages/pagerank.py docstring)."""
    p = corpus_paths(tier)
    ctes = [f"""e AS (SELECT DISTINCT subj_id AS src, obj_id AS dst FROM canon),
nodes AS (
  -- NOT plain UNION: inside a WITH RECURSIVE block DuckDB 1.0 applies
  -- recursive-union semantics to non-recursive CTEs and skips the dedup
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
meta AS (SELECT count(*) AS n FROM nodes),
it0 AS (SELECT id, 1000000000000 // (SELECT n FROM meta) AS r FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""it{i} AS (
  SELECT nd.id,
         150000000000 // (SELECT n FROM meta)
           + (85 * coalesce(s.inb, 0)) // 100 AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS id, sum(p.r // d.deg) AS inb
    FROM e JOIN it{i-1} p ON e.src = p.id JOIN deg d ON d.id = e.src
    GROUP BY e.dst) s ON nd.id = s.id)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n" + ",\n".join(ctes)
            + f"\nSELECT id, CAST(r AS BIGINT) AS rank_units FROM it{iters}")


def sql_personalized_pagerank(tier: str, n_seeds: int = 4,
                              iters: int = 3) -> str:
    """Quantized-integer personalized PageRank unrolled per iteration:
    sql_pagerank with the teleport/base mass restricted to the n_seeds
    lexicographically-smallest nodes (the engine's SPEC seed rule)."""
    p = corpus_paths(tier)
    s, bt = 1_000_000_000_000, 150_000_000_000
    ctes = [f"""e AS (SELECT DISTINCT subj_id AS src, obj_id AS dst FROM canon),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
seeds AS MATERIALIZED (SELECT id FROM nodes ORDER BY id LIMIT {n_seeds}),
meta AS (SELECT count(*) AS k FROM seeds),
it0 AS (
  SELECT nd.id,
         CASE WHEN nd.id IN (SELECT id FROM seeds)
              THEN {s} // (SELECT k FROM meta) ELSE 0 END AS r
  FROM nodes nd)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""it{i} AS (
  SELECT nd.id,
         CASE WHEN nd.id IN (SELECT id FROM seeds)
              THEN {bt} // (SELECT k FROM meta) ELSE 0 END
           + (85 * coalesce(sm.inb, 0)) // 100 AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS id, sum(p.r // d.deg) AS inb
    FROM e JOIN it{i-1} p ON e.src = p.id JOIN deg d ON d.id = e.src
    GROUP BY e.dst) sm ON nd.id = sm.id)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n" + ",\n".join(ctes)
            + f"\nSELECT id, CAST(r AS BIGINT) AS rank_units FROM it{iters}")


def sql_hits(tier: str, iters: int = 2) -> str:
    """Quantized-integer HITS unrolled per half-sweep (mirrors
    stages/pagerank.hits: L1 rescale ``v // greatest(1, sum(v)//SCALE)``,
    fixed iters, integer `//` everywhere — bit-identical to both engine
    paths). raw CTEs are MATERIALIZED (each is referenced by its rescale
    CTE twice: FROM + the sum subquery)."""
    p = corpus_paths(tier)
    s = 1_000_000_000_000
    ctes = [f"""e AS (SELECT DISTINCT subj_id AS src, obj_id AS dst FROM canon),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
meta AS (SELECT count(*) AS n FROM nodes),
h0 AS (SELECT id, {s} // (SELECT n FROM meta) AS v FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""a{i}raw AS MATERIALIZED (
  SELECT e.dst AS id, sum(h.v) AS v
  FROM e JOIN h{i-1} h ON e.src = h.id GROUP BY e.dst),
a{i} AS MATERIALIZED (
  SELECT id, v // greatest(1, (SELECT sum(v) FROM a{i}raw) // {s}) AS v
  FROM a{i}raw),
h{i}raw AS MATERIALIZED (
  SELECT e.src AS id, sum(a.v) AS v
  FROM e JOIN a{i} a ON e.dst = a.id GROUP BY e.src),
h{i} AS MATERIALIZED (
  SELECT id, v // greatest(1, (SELECT sum(v) FROM h{i}raw) // {s}) AS v
  FROM h{i}raw)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n" + ",\n".join(ctes)
            + f"""
SELECT nd.id, CAST(coalesce(h.v, 0) AS BIGINT) AS hub_units,
       CAST(coalesce(a.v, 0) AS BIGINT) AS auth_units
FROM nodes nd
LEFT JOIN h{iters} h ON h.id = nd.id
LEFT JOIN a{iters} a ON a.id = nd.id""")


def sql_degree_topk(tier: str, k: int = 20) -> str:
    """Undirected distinct-neighbor degree, global top-k with rank.
    Degree over distinct (subj, obj) pairs from the canonical closure ==
    degree over the deduped edge table (pred multiplicity collapses under
    DISTINCT nb)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
pairs AS (SELECT DISTINCT subj_id, obj_id FROM canon),
und AS (
  SELECT subj_id AS id, obj_id AS nb FROM pairs
  UNION ALL SELECT obj_id, subj_id FROM pairs
),
d AS (SELECT id, count(DISTINCT nb) AS degree FROM und GROUP BY id)
SELECT rk, id, degree FROM (
  SELECT row_number() OVER (ORDER BY degree DESC, id) AS rk, id, degree
  FROM d
) WHERE rk <= {k}"""


# ORACLE HYGIENE: under WITH RECURSIVE, DuckDB 1.0 silently drops the
# dedup of a bare `UNION` in a NON-self-referencing CTE (it behaves as
# UNION ALL — observed on kg_two_hop_ball's ball CTE). Non-recursive
# CTEs in these oracles must use `SELECT DISTINCT ... FROM (a UNION ALL
# b)` instead; bare UNION is reserved for genuinely recursive CTEs.
_UND_CTES = """p0 AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
       WHERE subj_id <> obj_id),
und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM p0),
adj AS (SELECT a AS id, b AS nb FROM und UNION ALL SELECT b, a FROM und)"""


def sql_triangles(tier: str) -> str:
    """Per-node triangle counts over the undirected simple graph (mirrors
    graph_metrics.triangles_per_node's degree-ordered enumeration: SQL
    enumerates each triangle once via a < b < c ordering instead)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
ids AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT id, count(*) AS n_triangles FROM ids GROUP BY id"""


def sql_neighbor_jaccard(tier: str, k: int = 50) -> str:
    """Top-k common-neighbor Jaccard pairs; ONE double division of exact
    ints on both sides (repo float invariant)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS d FROM adj GROUP BY id),
cmn AS (
  SELECT m1.nb AS id_a, m2.nb AS id_b, count(*) AS common
  FROM adj m1 JOIN adj m2 ON m1.id = m2.id AND m1.nb < m2.nb
  GROUP BY m1.nb, m2.nb
),
scored AS (
  SELECT c.id_a, c.id_b, c.common,
         1.0 * c.common / (d1.d + d2.d - c.common) AS jaccard
  FROM cmn c
  JOIN deg d1 ON d1.id = c.id_a
  JOIN deg d2 ON d2.id = c.id_b
)
SELECT rk, id_a, id_b, common, jaccard FROM (
  SELECT row_number() OVER (ORDER BY jaccard DESC, id_a, id_b) AS rk,
         id_a, id_b, common, jaccard
  FROM scored
) WHERE rk <= {k}"""


def sql_local_bridges(tier: str) -> str:
    """Oracle for graph_metrics.local_bridges: undirected edges with no
    common neighbor (triangle support 0)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES}
SELECT u.a AS id_a, u.b AS id_b FROM und u
WHERE NOT EXISTS (
  SELECT 1 FROM adj x JOIN adj y ON x.nb = y.nb
  WHERE x.id = u.a AND y.id = u.b)"""


def sql_resource_allocation(tier: str, k: int = 50,
                            quant: int = 1_000_000) -> str:
    """Top-k Resource Allocation index pairs; each 1/deg term quantized to
    ``quant // deg`` so the sum is an order-free integer on both sides and
    the float is ONE division (repo float invariant)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS d FROM adj GROUP BY id),
wed AS (
  SELECT m1.nb AS id_a, m2.nb AS id_b, {quant} // deg.d AS w
  FROM adj m1
  JOIN adj m2 ON m1.id = m2.id AND m1.nb < m2.nb
  JOIN deg ON deg.id = m1.id
),
sc AS (SELECT id_a, id_b, CAST(sum(w) AS BIGINT) AS ra_q
       FROM wed GROUP BY id_a, id_b)
SELECT rk, id_a, id_b, ra_q, CAST(ra_q AS DOUBLE) / {quant} AS ra FROM (
  SELECT row_number() OVER (ORDER BY ra_q DESC, id_a, id_b) AS rk,
         id_a, id_b, ra_q
  FROM sc
) WHERE rk <= {k}"""


def sql_adamic_adar(tier: str, k: int = 50,
                    quant: int = 1_000_000) -> str:
    """Oracle for graph_metrics.adamic_adar_topk: each 1/ln(deg) term
    quantized to ``FLOOR(quant / LN(deg))`` — DuckDB's LN is the same
    libm log(double) as Python's math.log, the division and floor are
    IEEE-exact, so per-term integers match the engine bit-for-bit and
    the sum is order-free."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS d FROM adj GROUP BY id),
wed AS (
  SELECT m1.nb AS id_a, m2.nb AS id_b,
         CAST(FLOOR({quant} / LN(deg.d)) AS BIGINT) AS w
  FROM adj m1
  JOIN adj m2 ON m1.id = m2.id AND m1.nb < m2.nb
  JOIN deg ON deg.id = m1.id
),
sc AS (SELECT id_a, id_b, CAST(sum(w) AS BIGINT) AS aa_q
       FROM wed GROUP BY id_a, id_b)
SELECT rk, id_a, id_b, aa_q, CAST(aa_q AS DOUBLE) / {quant} AS aa FROM (
  SELECT row_number() OVER (ORDER BY aa_q DESC, id_a, id_b) AS rk,
         id_a, id_b, aa_q
  FROM sc
) WHERE rk <= {k}"""


def sql_kcore(tier: str, k: int = 30, rounds: int = 8) -> str:
    """Fixed-round k-core peeling unrolled per round (mirrors
    graph_metrics.kcore: ``rounds`` is a spec constant, so the oracle
    re-derives exactly that many peels — bit-identical whether or not the
    peeling has converged)."""
    p = corpus_paths(tier)
    # MATERIALIZED: each round references the previous edge set twice, so
    # plain CTE inlining would expand the recursive canon scan 2^rounds
    # times (observed as a too-many-open-files blowup)
    ctes = ["e0 AS MATERIALIZED (SELECT a, b FROM und)"]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
  SELECT id, count(*) AS d FROM (
    SELECT a AS id FROM e{r - 1} UNION ALL SELECT b FROM e{r - 1})
  GROUP BY id),
n{r} AS MATERIALIZED (SELECT id FROM d{r} WHERE d >= {k}),
e{r} AS MATERIALIZED (SELECT e.a, e.b FROM e{r - 1} e
         JOIN n{r} x ON x.id = e.a JOIN n{r} y ON y.id = e.b)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes)
            + f"""
SELECT id, count(*) AS core_degree FROM (
  SELECT a AS id FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
GROUP BY id""")


def sql_metapath_2hop(tier: str, type_a: str = "chemical_substance",
                      type_b: str = "disease") -> str:
    """Typed 2-hop path counts (Path-DSL S(1-2)D two-hop leg): adjacency
    rows are unique per (mid, neighbor) so count(*) == distinct mids."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES}
SELECT m1.nb AS id_a, m2.nb AS id_b, count(*) AS n_paths
FROM adj m1
JOIN adj m2 ON m1.id = m2.id
JOIN read_parquet('{p["gazetteer"]}') ga
  ON ga.curie = m1.nb AND ga.node_type = '{type_a}'
JOIN read_parquet('{p["gazetteer"]}') gb
  ON gb.curie = m2.nb AND gb.node_type = '{type_b}'
GROUP BY m1.nb, m2.nb"""


def sql_bfs_distances(tier: str, seed_type: str = "chemical_substance",
                      rounds: int = 4) -> str:
    """Multi-source BFS hop distances (graph_metrics.bfs_distances): seeds
    are the edge-endpoint nodes of ``seed_type``; the recursive CTE expands
    at most ``rounds`` hops and min(dist) collapses re-reaches — identical
    round semantics to both engine paths."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
bfs(id, dist) AS (
  SELECT ga.curie, 0 FROM read_parquet('{p["gazetteer"]}') ga
  WHERE ga.node_type = '{seed_type}'
    AND ga.curie IN (SELECT id FROM adj)
  UNION
  SELECT adj.nb, b.dist + 1 FROM bfs b JOIN adj ON adj.id = b.id
  WHERE b.dist < {rounds}
)
SELECT id, min(dist) AS dist FROM bfs GROUP BY id"""


def sql_bfs_tree(tier: str, seed_type: str = "chemical_substance",
                 rounds: int = 4) -> str:
    """Oracle for graph_metrics.bfs_tree: the bfs_distances recursion plus
    the min-parent rule (smallest neighbor one hop closer; '' at seeds)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
bfs(id, dist) AS (
  SELECT ga.curie, 0 FROM read_parquet('{p["gazetteer"]}') ga
  WHERE ga.node_type = '{seed_type}'
    AND ga.curie IN (SELECT id FROM adj)
  UNION
  SELECT adj.nb, b.dist + 1 FROM bfs b JOIN adj ON adj.id = b.id
  WHERE b.dist < {rounds}
),
d AS (SELECT id, min(dist) AS dist FROM bfs GROUP BY id),
par AS (
  SELECT c.id, min(j.nb) AS parent
  FROM d c JOIN adj j ON j.id = c.id
  JOIN d pd ON pd.id = j.nb AND pd.dist = c.dist - 1
  GROUP BY c.id
)
SELECT d.id, CAST(d.dist AS BIGINT) AS dist,
       coalesce(par.parent, '') AS parent
FROM d LEFT JOIN par USING (id)"""


def sql_weighted_sssp(tier: str, seed_type: str = "chemical_substance",
                      rounds: int = 4) -> str:
    """Multi-source weighted shortest paths (graph_metrics.weighted_sssp):
    per-pair mention counts -> evidence-discounted weights (>=3 mentions
    cost 1, 2 cost 2, 1 costs 3 — SPEC shared with _mention_weight); the
    recursive CTE enumerates all <= ``rounds``-edge paths from the seeds
    and min(dist) collapses them — exactly Bellman-Ford after ``rounds``
    relaxation rounds, identical to both engine paths."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
wpair AS (
  SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
         count(*) AS m
  FROM canon WHERE subj_id <> obj_id GROUP BY 1, 2
),
wund AS (SELECT a, b,
                CASE WHEN m >= 3 THEN 1 WHEN m = 2 THEN 2 ELSE 3 END AS wt
         FROM wpair),
wadj AS (SELECT a AS id, b AS nb, wt FROM wund
         UNION ALL SELECT b, a, wt FROM wund),
sssp(id, dist, hops) AS (
  SELECT ga.curie, 0, 0 FROM read_parquet('{p["gazetteer"]}') ga
  WHERE ga.node_type = '{seed_type}' AND ga.curie IN (SELECT id FROM wadj)
  UNION
  SELECT wadj.nb, s.dist + wadj.wt, s.hops + 1
  FROM sssp s JOIN wadj ON wadj.id = s.id
  WHERE s.hops < {rounds}
)
SELECT id, CAST(min(dist) AS BIGINT) AS dist FROM sssp GROUP BY id"""


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


# ----------------------------------------------------- dedup sketch oracles
#
# The minhash / simhash pair queries are not directly SQL-expressible (the
# hash functions aren't), but their SIGNATURES are deterministic pure
# functions of the document text. A sequential single-process numpy
# recomputation (below — independent of the Ray actor/batch code paths)
# writes them as parquet; DuckDB then recomputes the entire distributed
# machinery — banding, bucket-candidate generation, signature verification,
# pigeonhole chunk blocking, hamming filter, connected components — in SQL
# from those signatures. That checks everything the Ray pipeline does after
# hashing: the exchanges, joins, caps and dedup steps.

_AUX_VERSION = "v4"  # bump when any sketch constant/algorithm changes
# (v4: corpus rev 4 — media near-dup variants change payload-derived aux)
_MINHASH_NUM_PERM = 128
_MINHASH_SEED = 7
_SHINGLE_N = 3
_MERSENNE = (1 << 61) - 1


def dedup_aux_paths(tier: str) -> dict[str, str]:
    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    return {
        "root": root,
        "minhash_sig": f"{root}/minhash_sig.parquet",
        "simhash": f"{root}/simhash.parquet",
    }


def ensure_count_tables(tier: str, cap: int = 256) -> dict:
    """Write the S4 static count-table fixture for ``tier`` (idempotent):
    a marginal ``code|count`` file and a symmetric pair ``a|b|count`` file
    in the reference's AllDxCounts/ICD_Combo shape (`builder/cdw.py:37-62`),
    derived DETERMINISTICALLY from the even-parity conversations of the
    tier's corpus (a "historical CDW extract" of the same entity universe).
    Shared INPUT data — both the engine (via sources.count_tables) and the
    oracle (via read_csv) consume these files; the derivation is keyed by
    ``_AUX_VERSION`` like the sketch signature tables."""
    import json
    import os

    import duckdb

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    out = {
        "marginal_path": f"{root}/static_marginals.txt",
        "pair_path": f"{root}/static_pairs.txt",
        "meta_path": f"{root}/static_meta.json",
    }
    if all(os.path.exists(v) for v in out.values()):
        with open(out["meta_path"]) as f:
            out["total"] = json.load(f)["total"]
        return out
    os.makedirs(root, exist_ok=True)
    p = corpus_paths(tier)
    con = duckdb.connect()
    base = f"""WITH RECURSIVE {_canon_cte(p)[1:]},
ce AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  ) WHERE CAST(substr(conv_id, -1) AS INT) % 2 = 0
),
cer AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM ce
  ) WHERE rk <= {cap}
)"""
    marg = con.execute(
        base + "\nSELECT id, count(*) FROM ce GROUP BY id ORDER BY id"
    ).fetchall()
    pairs = con.execute(
        base + """
SELECT a.id, b.id, count(*)
FROM cer a JOIN cer b ON a.conv_id = b.conv_id AND a.id < b.id
GROUP BY a.id, b.id ORDER BY a.id, b.id"""
    ).fetchall()
    total = con.execute(f"""
SELECT count(DISTINCT conv_id) FROM read_parquet('{p["transcripts"]}/*.parquet')
WHERE CAST(substr(conv_id, -1) AS INT) % 2 = 0""").fetchone()[0]
    with open(out["marginal_path"], "w") as f:
        for code, n in marg:
            f.write(f"{code}|{n}\n")
    with open(out["pair_path"], "w") as f:
        for a, b, n in pairs:
            f.write(f"{a}|{b}|{n}\n")
    with open(out["meta_path"], "w") as f:
        json.dump({"total": int(total)}, f)
    out["total"] = int(total)
    return out


def sql_support_static(tier: str, cap: int = 256) -> str:
    """Oracle for the static_counts supporter (T4/J4,
    `builder/cdw.py:92-100`): the kg_support candidate-pair universe scored
    against the S4 count-table FILES with left-outer fallback — absent
    marginal/pair counts coalesce to 0, expected = c1*c2/N, chi2 by the
    shared Yates formula, suppressed below 11."""
    aux = ensure_count_tables(tier, cap)
    n_total = aux["total"]
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM conv_ent_r a JOIN conv_ent_r b
    ON a.conv_id = b.conv_id AND a.id < b.id
),
marg AS (
  SELECT column0 AS code, CAST(column1 AS BIGINT) AS n
  FROM read_csv('{aux["marginal_path"]}', delim='|', header=false,
                columns={{'column0': 'VARCHAR', 'column1': 'BIGINT'}})
),
pairsrc AS (
  SELECT column0 AS a, column1 AS b, CAST(column2 AS BIGINT) AS n
  FROM read_csv('{aux["pair_path"]}', delim='|', header=false,
                columns={{'column0': 'VARCHAR', 'column1': 'VARCHAR',
                          'column2': 'BIGINT'}})
),
scored AS (
  SELECT p.id_a, p.id_b,
         coalesce(m1.n, 0) AS c1, coalesce(m2.n, 0) AS c2,
         coalesce(ps.n, 0) AS c
  FROM pairs p
  LEFT JOIN marg m1 ON m1.code = p.id_a
  LEFT JOIN marg m2 ON m2.code = p.id_b
  LEFT JOIN pairsrc ps ON ps.a = least(p.id_a, p.id_b)
                      AND ps.b = greatest(p.id_a, p.id_b)
),
g AS (
  SELECT *,
         greatest(0.0, abs(c * ({n_total} - c1 - c2 + c)
                           - (c1 - c) * (c2 - c)) - {n_total} / 2.0) AS num,
         1.0 * c1 * c2 * ({n_total} - c1) * ({n_total} - c2) AS denom
  FROM scored
)
SELECT id_a, id_b, c1, c2, c,
       1.0 * c1 * c2 / {n_total} AS expected,
       CASE WHEN denom > 0 THEN {n_total} * num * num / denom
            ELSE 0.0 END AS chi2,
       c < 11 AS suppressed
FROM g"""


def _grams(text: str, n: int) -> list[str]:
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def ensure_dedup_aux(tier: str) -> dict[str, str]:
    """Write the signature tables for ``/root/testdata/<tier>/documents``
    (idempotent; ~1 s for 500 docs)."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = dedup_aux_paths(tier)
    if os.path.exists(p["minhash_sig"]) and os.path.exists(p["simhash"]):
        return p
    os.makedirs(p["root"], exist_ok=True)
    docs = pd.read_parquet(f"/root/testdata/{tier}/documents.parquet",
                           columns=["doc_id", "text"])

    rng = np.random.default_rng(_MINHASH_SEED)
    A = rng.integers(1, _MERSENNE, size=_MINHASH_NUM_PERM, dtype=np.uint64)
    B = rng.integers(0, _MERSENNE, size=_MINHASH_NUM_PERM, dtype=np.uint64)

    sig_doc, sig_perm, sig_val = [], [], []
    sim_doc, sim_val = [], []
    arange64 = np.arange(64, dtype=np.uint64)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        grams = _grams(text, _SHINGLE_N)
        # --- minhash (siphash shingles, universal-hash min; uint64 wrap is
        # part of the spec and matches the distributed implementation)
        if grams:
            h = np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))
        else:
            h = np.array([], dtype=np.uint64)
        if len(h) == 0:
            sig = np.zeros(_MINHASH_NUM_PERM, dtype=np.uint64)
        else:
            with np.errstate(over="ignore"):
                vals = (A[:, None] * h[None, :] + B[:, None]) % _MERSENNE
            sig = vals.min(axis=1).astype(np.uint64)
        sig_doc.extend([int(doc_id)] * _MINHASH_NUM_PERM)
        sig_perm.extend(range(_MINHASH_NUM_PERM))
        sig_val.extend(sig.tolist())
        # --- simhash (siphash shingle features, +1/-1 bit votes)
        sim_doc.append(int(doc_id))
        if not grams:
            sim_val.append(0)
        else:
            hs = pd.util.hash_array(np.asarray(grams, dtype=object))
            bits = ((hs[:, None] >> arange64[None, :]) & 1).astype(np.int64)
            score = 2 * bits.sum(axis=0) - len(grams)
            sim_val.append(int(((score > 0).astype(np.uint64)
                                << arange64).sum()))

    pq.write_table(
        pa.table({"doc_id": pa.array(sig_doc, pa.int64()),
                  "perm_idx": pa.array(sig_perm, pa.int32()),
                  "sig_val": pa.array(sig_val, pa.uint64())}),
        p["minhash_sig"],
    )
    pq.write_table(
        pa.table({"doc_id": pa.array(sim_doc, pa.int64()),
                  "simhash": pa.array(sim_val, pa.uint64())}),
        p["simhash"],
    )
    return p


def _minhash_pair_ctes(tier: str, threshold: float, bands: int) -> str:
    """CTE chain ending in ``mh_pairs(id_a, id_b)``: recomputes LSH banding +
    signature-Jaccard verification from the signature parquet."""
    p = dedup_aux_paths(tier)
    rows = _MINHASH_NUM_PERM // bands
    return f"""
sig AS (
  SELECT doc_id, perm_idx, sig_val
  FROM read_parquet('{p["minhash_sig"]}')
),
bands AS (
  SELECT doc_id, perm_idx // {rows} AS band_id,
         list(sig_val ORDER BY perm_idx) AS bvec
  FROM sig GROUP BY doc_id, perm_idx // {rows}
),
ranked AS (
  -- rk <= 200 mirrors dedup.LSH_BUCKET_CAP (hot band buckets truncate
  -- to the smallest doc_ids) — change both together (ADVICE r04 #2)
  SELECT doc_id, band_id, bvec,
         row_number() OVER (PARTITION BY band_id, bvec
                            ORDER BY doc_id) AS rk
  FROM bands
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM ranked a JOIN ranked b
    ON a.band_id = b.band_id AND a.bvec = b.bvec AND a.doc_id < b.doc_id
  WHERE a.rk <= 200 AND b.rk <= 200
),
mh_pairs AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.perm_idx = sa.perm_idx
  GROUP BY c.id_a, c.id_b
  HAVING avg(CASE WHEN sa.sig_val = sb.sig_val THEN 1.0 ELSE 0.0 END)
         >= {threshold}
)"""


def sql_dedup_minhash_lsh(tier: str, threshold: float = 0.5,
                          bands: int = 32) -> str:
    return (f"WITH {_minhash_pair_ctes(tier, threshold, bands)[1:]}\n"
            "SELECT id_a, id_b FROM mh_pairs")


def sql_dedup_incremental_lsh(tier: str, mod: int = 3,
                              threshold: float = 0.5,
                              bands: int = 32) -> str:
    """Oracle for dedup.incremental_lsh_pairs: the full minhash pair set
    restricted to pairs touching the new shard (doc_id % mod == 0).
    The band-bucket cap (dedup.LSH_BUCKET_CAP) is mirrored inside
    ``_minhash_pair_ctes`` — the pair set is exact INCLUDING truncated
    hot buckets (ADVICE r04 #2)."""
    return (f"WITH {_minhash_pair_ctes(tier, threshold, bands)[1:]}\n"
            f"SELECT id_a, id_b FROM mh_pairs "
            f"WHERE id_a % {mod} = 0 OR id_b % {mod} = 0")


def sql_dedup_lsh_eval(tier: str) -> str:
    """Oracle for the LSH-vs-exact dedup quality eval: minhash pairs
    from the signature tables, truth from the exact all-pairs Jaccard
    >= 1/2 SQL, intersected."""
    mh = sql_dedup_minhash_lsh(tier)
    pj = sql_dedup_prefix_jaccard()
    return f"""
WITH f AS (SELECT id_a, id_b FROM ({mh})),
t AS (SELECT id_a, id_b FROM ({pj})),
h AS (SELECT count(*) AS n FROM f JOIN t USING (id_a, id_b))
SELECT (SELECT CAST(count(*) AS BIGINT) FROM t) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM f) AS n_found,
       CAST(h.n AS BIGINT) AS n_hit,
       CASE WHEN (SELECT count(*) FROM f) = 0 THEN 0.0
            ELSE CAST(h.n AS DOUBLE) / (SELECT count(*) FROM f)
       END AS "precision",
       CASE WHEN (SELECT count(*) FROM t) = 0 THEN 0.0
            ELSE CAST(h.n AS DOUBLE) / (SELECT count(*) FROM t)
       END AS recall
FROM h"""


def sql_dedup_simhash(tier: str, max_hamming: int = 3) -> str:
    p = dedup_aux_paths(tier)
    return f"""
WITH sh AS (SELECT doc_id, simhash FROM read_parquet('{p["simhash"]}')),
chunks AS (
  SELECT doc_id, simhash, t.k AS chunk_idx,
         (simhash >> (16 * t.k)) & 65535 AS chunk_val
  FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) t
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS ha, b.simhash AS hb
  FROM chunks a JOIN chunks b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}"""


def sql_dedup_ngram_jaccard(threshold: float = 0.3, n: int = 3) -> str:
    """Fully independent oracle: EXACT all-pairs word n-gram Jaccard in SQL
    over the registered ``documents`` view (the engine is LSH-blocked; at
    sf0.01 every true pair sits far above threshold, so blocking recall is
    exactly 1 — verified empirically, duplicate pairs have j >= 0.9 vs next
    value 0.067)."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tk FROM documents
),
sets AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(tk) < {n} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {n - 2}),
                             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
    END) AS gs
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE len(a.gs) + len(b.gs) > 0
  AND 1.0 * len(list_intersect(a.gs, b.gs))
      / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))
      >= {threshold}"""


def sql_dedup_prefix_jaccard(t_num: int = 1, t_den: int = 2,
                             n: int = 3) -> str:
    """Fully independent oracle for prefix_jaccard_pairs: EXACT all-pairs
    word n-gram Jaccard in SQL. The engine's prefix-filter blocking is
    provably complete (no empirical-recall caveat needed, unlike the LSH
    and rare-shingle siblings); the threshold gate is the same integer
    cross-multiplication on both sides, the float ONE division."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tk FROM documents
),
sets AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(tk) < {n} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {n - 2}),
                             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
    END) AS gs
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.gs, b.gs)) AS inter,
         len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS un
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
  WHERE len(a.gs) + len(b.gs) > 0
)
SELECT id_a, id_b, 1.0 * inter / un AS jaccard
FROM pairs WHERE inter * {t_den} >= un * {t_num}"""


def sql_dedup_containment(threshold: float = 0.8, n: int = 3) -> str:
    """Fully independent oracle for overlap_coefficient_pairs: EXACT
    all-pairs Szymkiewicz-Simpson overlap in SQL (the engine blocks on
    rare shared shingles; qualifying pairs at the test tiers share rare
    shingles, so blocking recall is exactly 1 — the
    sql_dedup_ngram_jaccard precedent). Float is ONE division."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS tk FROM documents
),
sets AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(tk) < {n} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {n - 2}),
                             i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])
    END) AS gs
  FROM toks
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS n_common,
       1.0 * len(list_intersect(a.gs, b.gs))
           / least(len(a.gs), len(b.gs)) AS overlap
FROM sets a JOIN sets b ON a.doc_id < b.doc_id
WHERE len(a.gs) > 0 AND len(b.gs) > 0
  AND 1.0 * len(list_intersect(a.gs, b.gs))
      / least(len(a.gs), len(b.gs)) >= {threshold}"""


def sql_dedup_clusters(tier: str, threshold: float = 0.5,
                       bands: int = 32) -> str:
    """Connected components over the SQL-recomputed minhash pairs; cluster =
    min doc_id of the duplicate group, singletons map to themselves."""
    return f"""WITH RECURSIVE {_minhash_pair_ctes(tier, threshold, bands)[1:]},
reach(id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT CASE WHEN r.id = p.id_a THEN p.id_b ELSE p.id_a END, r.lbl
  FROM reach r JOIN mh_pairs p ON r.id = p.id_a OR r.id = p.id_b
)
SELECT id AS doc_id, min(lbl) AS cluster FROM reach GROUP BY id"""


def ensure_bpe_aux(tier: str, n_merges: int = 60) -> str:
    """Sequential BPE-trainer oracle (idempotent): an INDEPENDENTLY
    structured implementation — Counter word counts, words as
    space-joined symbol strings, merges applied with the boundary-aware
    regex substitution of the original Sennrich et al. (2016) reference
    code — writing the merge table to parquet for the SQL side. Same
    spec as ``vocab.bpe_train`` (char symbols + '</w>', tie-break count
    desc then lexicographic pair), different code path end to end."""
    import os
    import re as _re
    from collections import Counter

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/bpe_merges_{n_merges}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    docs = pd.read_parquet(f"/root/testdata/{tier}/documents.parquet",
                           columns=["text"])
    counts: Counter[str] = Counter()
    for text in docs["text"]:
        counts.update(_re.findall(r"[a-z0-9]+", text.lower()))
    vocab = {" ".join(list(w) + ["</w>"]): c for w, c in counts.items()}
    ranks, lefts, rights, ns = [], [], [], []
    for rank in range(1, n_merges + 1):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, c in vocab.items():
            syms = w.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        pair = min(p for p, c in pairs.items() if c == best_n)
        pat = _re.compile(r"(?<!\S)" + _re.escape(" ".join(pair))
                          + r"(?!\S)")
        vocab = {pat.sub("".join(pair), w): c for w, c in vocab.items()}
        ranks.append(rank)
        lefts.append(pair[0])
        rights.append(pair[1])
        ns.append(best_n)
    pq.write_table(pa.table({
        "rank": pa.array(ranks, pa.int64()),
        "left": pa.array(lefts, pa.string()),
        "right": pa.array(rights, pa.string()),
        "pair_count": pa.array(ns, pa.int64()),
    }), path)
    return path


def sql_bpe_merges(tier: str, n_merges: int = 60) -> str:
    path = ensure_bpe_aux(tier, n_merges)
    return (f'SELECT "rank", "left", "right", pair_count '
            f"FROM read_parquet('{path}')")


# SGNS spec constants — independent copies of stages/embedding_train.py's
# (the _MINHASH_SEED convention); changing either side requires an
# _AUX_VERSION bump so signature tables regenerate
_SGNS_DIM = 8
_SGNS_ITERS = 10
_SGNS_LR = 0.5
_SGNS_Q = 1_000_000_000


def ensure_sgns_aux(tier: str, n_walks: int = 2, walk_len: int = 3,
                    window: int = 2, k_neg: int = 2) -> str:
    """Sequential SGNS-trainer oracle (idempotent): re-derives the
    deterministic walk corpus, skip-gram pairs, md5 negatives AND the
    quantized full-batch fit from the corpus parquet with an
    independently-structured single-process implementation (the graph
    comes from the recursive canon SQL, walks from dict-adjacency Python
    loops), writing the final quantized center embeddings to parquet.
    The engine's distributed fit must reproduce them bit-for-bit — the
    ``ensure_bpe_aux`` pattern applied to representation learning."""
    import hashlib
    import os

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/sgns_emb_{n_walks}_{walk_len}_{window}_{k_neg}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    from .sources.corpus import ensure_corpus

    p = dict(corpus_paths(tier))
    p.update(ensure_corpus(tier))  # aux runs duckdb NOW, corpus must exist
    und = duckdb.sql(
        f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES}\n"
        "SELECT a, b FROM und").df()
    adj: dict[str, list[str]] = {}
    for a, b in zip(und["a"], und["b"]):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)

    def hkey(u: str, v: str, w: int, s: int) -> str:
        return hashlib.md5(f"{u}|{v}|{w}|{s}".encode()).hexdigest()

    # walks: argmin-md5 next hop from EVERY node (engine convention)
    seqs: dict[tuple[str, int], list[str]] = {}
    for s in sorted(adj):
        for w in range(n_walks):
            seq = [s]
            for step in range(1, walk_len + 1):
                u = seq[-1]
                seq.append(min(adj[u], key=lambda v: hkey(u, v, w, step)))
            seqs[(s, w)] = seq
    # skip-gram pairs within the window, both directions, one row per
    # (sequence, step offset) occurrence — multiplicity preserved
    pairs: list[tuple[str, int, int, int, str, str]] = []
    for (s, w), seq in seqs.items():
        for i in range(len(seq)):
            for d in range(1, window + 1):
                if i + d < len(seq):
                    pairs.append((s, w, i, i + d, seq[i], seq[i + d]))
                    pairs.append((s, w, i + d, i, seq[i + d], seq[i]))
    uni = sorted({s for (s, _w) in seqs})
    pos = {u: i for i, u in enumerate(uni)}
    n = len(uni)
    centers, ctxs, ys = [], [], []
    for (s, w, cs, xs, c, x) in pairs:
        centers.append(pos[c])
        ctxs.append(pos[x])
        ys.append(1.0)
        for i in range(k_neg):
            h = int(hashlib.md5(
                f"{s}|{w}|{cs}|{xs}|{i}".encode()).hexdigest()[:8], 16)
            centers.append(pos[c])
            ctxs.append(pos[uni[h % n]])
            ys.append(0.0)
    ci = np.asarray(centers, dtype=np.int64)
    xi = np.asarray(ctxs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.float64)
    n_pairs = len(y)
    i_idx = np.arange(n, dtype=np.int64)[:, None]
    j_idx = np.arange(_SGNS_DIM, dtype=np.int64)[None, :]
    W = ((i_idx * 131 + j_idx * 31) % 201 - 100) / 1000.0
    C = ((i_idx * 137 + j_idx * 29) % 201 - 100) / 1000.0
    for _ in range(_SGNS_ITERS):
        z = np.zeros(n_pairs, dtype=np.float64)
        for j in range(_SGNS_DIM):
            z = z + W[ci, j] * C[xi, j]
        err = 1.0 / (1.0 + np.exp(-z)) - y
        gW = np.zeros((n, _SGNS_DIM), dtype=np.int64)
        gC = np.zeros((n, _SGNS_DIM), dtype=np.int64)
        for j in range(_SGNS_DIM):
            np.add.at(gW[:, j], ci,
                      np.floor(err * C[xi, j] * _SGNS_Q).astype(np.int64))
            np.add.at(gC[:, j], xi,
                      np.floor(err * W[ci, j] * _SGNS_Q).astype(np.int64))
        W = W - _SGNS_LR * (gW / _SGNS_Q) / n_pairs
        C = C - _SGNS_LR * (gC / _SGNS_Q) / n_pairs
    cols = {"id": pa.array(uni, pa.string())}
    for j in range(_SGNS_DIM):
        cols[f"e{j}_q"] = pa.array(
            np.floor(W[:, j] * _SGNS_Q).astype(np.int64), pa.int64())
    pq.write_table(pa.table(cols), path)
    return path


def sql_sgns_embeddings(tier: str) -> str:
    path = ensure_sgns_aux(tier)
    cols = ", ".join(f"e{j}_q" for j in range(_SGNS_DIM))
    return f"SELECT id, {cols} FROM read_parquet('{path}')"


def ensure_media_dhash_aux(tier: str) -> str:
    """Sequential dHash oracle (idempotent): decodes every image payload
    with the SHARED codec spec (the decoders are spec constants, like
    the minhash seed) but re-derives the perceptual hash — nearest
    resize, integer luminance, gradient bits, packing — with
    independently-written code. The engine's distributed signature pass
    must reproduce every value exactly."""
    import os

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/media_dhash.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    from .sources.corpus import ensure_corpus
    from .stages import multimodal as mm

    media = pd.read_parquet(ensure_corpus(tier)["media"])
    dec = {mm.PPM_MIME: mm.decode_ppm, mm.PNG_MIME: mm.decode_png,
           mm.GIF_MIME: mm.decode_gif, mm.JPEG_MIME: mm.decode_jpeg}
    ids, hs = [], []
    for mid, kind, mime, p in zip(media["media_id"], media["kind"],
                                  media["mime"], media["payload"]):
        if kind != "image" or mime not in dec:
            continue
        img = dec[mime](p)
        if img.ndim == 2:
            img = np.dstack([img, img, img])
        img = img[:, :, :3]
        h, w = img.shape[:2]
        v = 0
        for r in range(8):
            rr = (r * h) // 8
            row = [int(img[rr, (c * w) // 9, 0]) + int(img[rr, (c * w) // 9, 1])
                   + int(img[rr, (c * w) // 9, 2]) for c in range(9)]
            for c in range(8):
                if row[c + 1] > row[c]:
                    v |= 1 << (r * 8 + c)
        ids.append(int(mid))
        hs.append(v - (1 << 64) if v >= (1 << 63) else v)
    pq.write_table(pa.table({"media_id": pa.array(ids, pa.int64()),
                             "dhash": pa.array(hs, pa.int64())}), path)
    return path


def sql_media_image_dhash(tier: str) -> str:
    path = ensure_media_dhash_aux(tier)
    return f"SELECT media_id, dhash FROM read_parquet('{path}')"


def sql_media_dhash_dupes(tier: str, max_hamming: int = 3) -> str:
    """Oracle for multimodal.image_dhash_pairs at radius <= 3: exact
    all-pairs popcount join over the independently-derived dHash aux
    table — valid as a completeness check because the engine's 4-chunk
    pigeonhole blocking is provably complete at this radius."""
    path = ensure_media_dhash_aux(tier)
    return f"""SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
FROM read_parquet('{path}') a
JOIN read_parquet('{path}') b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}"""


def ensure_media_scenecut_aux(tier: str, threshold: int = 16) -> str:
    """Sequential scene-cut oracle (idempotent): decodes every video
    payload with the SHARED container/MJPEG codec spec, then re-derives
    the per-frame perceptual hash and consecutive Hamming distances with
    INDEPENDENTLY-written code (scalar bit loop + bin().count popcount —
    the engine's path is the vectorized dhash_of + shift-accumulate)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/media_scenecut_{threshold}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    from .sources.corpus import ensure_corpus
    from .stages import multimodal as mm

    dec = {mm.AVI_MIME: mm.decode_avi_mjpeg,
           mm.MP4_MIME: mm.decode_mp4_mjpeg}
    media = pd.read_parquet(ensure_corpus(tier)["media"])
    ids, idxs, hams, cuts = [], [], [], []
    for mid, kind, mime, p in zip(media["media_id"], media["kind"],
                                  media["mime"], media["payload"]):
        if kind != "video" or mime not in dec:
            continue
        frames = dec[mime](p)
        hs = []
        for img in frames:
            if img.ndim == 2:
                import numpy as np
                img = np.dstack([img, img, img])
            img = img[:, :, :3]
            h, w = img.shape[:2]
            v = 0
            for r in range(8):
                rr = (r * h) // 8
                row = [int(img[rr, (c * w) // 9, 0])
                       + int(img[rr, (c * w) // 9, 1])
                       + int(img[rr, (c * w) // 9, 2]) for c in range(9)]
                for c in range(8):
                    if row[c + 1] > row[c]:
                        v |= 1 << (r * 8 + c)
            hs.append(v)
        for i in range(1, len(hs)):
            d = bin(hs[i - 1] ^ hs[i]).count("1")
            ids.append(int(mid))
            idxs.append(i)
            hams.append(d)
            cuts.append(d >= threshold)
    pq.write_table(pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "frame_idx": pa.array(idxs, pa.int64()),
        "hamming": pa.array(hams, pa.int64()),
        "is_cut": pa.array(cuts, pa.bool_()),
    }), path)
    return path


def sql_media_video_scenecut(tier: str) -> str:
    path = ensure_media_scenecut_aux(tier)
    return (f"SELECT media_id, frame_idx, hamming, is_cut "
            f"FROM read_parquet('{path}')")


def ensure_bpe_encode_aux(tier: str, n_merges: int = 60) -> str:
    """Sequential BPE-ENCODE oracle (idempotent): tokenizes every document
    with the merges from :func:`ensure_bpe_aux` (the independently trained
    sequential merge table) by applying each merge IN RANK ORDER with the
    Sennrich boundary-aware regex substitution over a word -> symbol-string
    map — a per-rank pass, deliberately the opposite structure from
    ``vocab._BpeEncoder``'s lowest-rank-present loop. Writes
    (doc_id, n_bpe_tokens, tok_hash=md5 of the space-joined token stream)
    to parquet; passes only if the distributed encoder reproduces the
    token stream byte-for-byte on every document."""
    import hashlib
    import os
    import re as _re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/bpe_encode_{n_merges}.parquet"
    if os.path.exists(path):
        return path
    merges = pd.read_parquet(ensure_bpe_aux(tier, n_merges))
    docs = pd.read_parquet(f"/root/testdata/{tier}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = _re.compile(r"[a-z0-9]+")
    token_lists = [tok.findall(t.lower()) for t in docs["text"]]
    word_map = {w: " ".join(list(w) + ["</w>"])
                for toks in token_lists for w in toks}
    for left, right in zip(merges["left"], merges["right"]):
        pat = _re.compile(r"(?<!\S)" + _re.escape(f"{left} {right}")
                          + r"(?!\S)")
        joined = left + right
        word_map = {w: pat.sub(joined, s) for w, s in word_map.items()}
    n_syms = {w: s.count(" ") + 1 for w, s in word_map.items()}
    ids, ns, hs = [], [], []
    for doc_id, toks in zip(docs["doc_id"], token_lists):
        stream = " ".join(word_map[w] for w in toks)
        ids.append(doc_id)
        ns.append(sum(n_syms[w] for w in toks))
        hs.append(hashlib.md5(stream.encode()).hexdigest())
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_bpe_tokens": pa.array(ns, pa.int64()),
        "tok_hash": pa.array(hs, pa.string()),
    }), path)
    return path


def sql_bpe_encode(tier: str, n_merges: int = 60) -> str:
    path = ensure_bpe_encode_aux(tier, n_merges)
    return (f"SELECT doc_id, n_bpe_tokens, tok_hash "
            f"FROM read_parquet('{path}')")


def sql_random_walks(tier: str, n_walks: int = 2, walk_len: int = 3) -> str:
    """Oracle for graph_metrics.random_walks: steps unrolled, each next
    node chosen by row_number over the identical md5 position hash."""
    p = corpus_paths(tier)
    steps = []
    prev = "s0"
    for s in range(1, walk_len + 1):
        steps.append(f"""s{s} AS (
  SELECT {prev}.id, {prev}.walk, {s} AS step, adj.nb AS node
  FROM {prev} JOIN adj ON adj.id = {prev}.node
  QUALIFY row_number() OVER (
    PARTITION BY {prev}.id, {prev}.walk
    ORDER BY md5({prev}.node || '|' || adj.nb || '|' ||
                 CAST({prev}.walk AS VARCHAR) || '|{s}')) = 1
)""")
        prev = f"s{s}"
    steps_sql = ",\n".join(steps)
    unions = "\nUNION ALL ".join(
        f"SELECT id, walk, step, node FROM s{s}"
        for s in range(walk_len + 1))
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
nodes AS (SELECT DISTINCT id FROM adj),
w AS (SELECT id, unnest(range({n_walks})) AS walk FROM nodes),
s0 AS (SELECT id, CAST(walk AS BIGINT) AS walk, 0 AS step, id AS node
       FROM w),
{steps_sql}
{unions}"""


def sql_walk_skipgrams(tier: str, window: int = 2) -> str:
    """Oracle for graph_metrics.walk_skipgrams: the unrolled walk corpus
    (sql_random_walks) self-joined within the step window."""
    return f"""WITH walks AS (
{sql_random_walks(tier)}
)
SELECT a.id, a.walk, a.step AS center_step, b.step AS context_step,
       a.node AS center, b.node AS context
FROM walks a JOIN walks b
  ON a.id = b.id AND a.walk = b.walk
 AND a.step <> b.step AND abs(a.step - b.step) <= {window}"""


def sql_skipgram_negatives(tier: str, window: int = 2, k: int = 2) -> str:
    """Oracle for graph_metrics.walk_skipgram_negatives: the skip-gram
    pairs cross-joined with range(k), each negative re-derived by the
    identical md5 positional hash mod the sorted node universe."""
    return f"""WITH sg AS (
{sql_walk_skipgrams(tier, window)}
),
uni AS (
  SELECT id AS cand,
         row_number() OVER (ORDER BY id) - 1 AS rk,
         count(*) OVER () AS n
  FROM (SELECT DISTINCT id FROM sg)
),
negs AS (
  SELECT sg.*, CAST(i.i AS BIGINT) AS neg_rank,
         CAST(('0x' || substr(md5(
             sg.id || '|' || CAST(sg.walk AS VARCHAR) || '|' ||
             CAST(sg.center_step AS VARCHAR) || '|' ||
             CAST(sg.context_step AS VARCHAR) || '|' ||
             CAST(i.i AS VARCHAR)), 1, 8)) AS UBIGINT) AS h
  FROM sg CROSS JOIN (SELECT unnest(range({k})) AS i) i
)
SELECT id, walk, center_step, context_step, center, context,
       neg_rank, cand AS negative
FROM negs JOIN uni ON uni.rk = CAST(negs.h % uni.n AS BIGINT)"""


def sql_label_prop(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.label_propagation: the synchronous rounds
    unrolled (``rounds`` is the SPEC constant LABELPROP_ROUNDS); per round
    each node adopts its neighbors' modal label, ties -> min label."""
    p = corpus_paths(tier)
    ctes = ["""l0 AS MATERIALIZED (
  SELECT id, id AS label FROM (SELECT DISTINCT id FROM adj))"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""l{r} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT a.id, p.label,
           row_number() OVER (PARTITION BY a.id
                              ORDER BY count(*) DESC, p.label) AS rn
    FROM adj a JOIN l{r - 1} p ON p.id = a.nb
    GROUP BY a.id, p.label
  ) WHERE rn = 1)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes)
            + f"\nSELECT id, label FROM l{rounds}")


def sql_scc_labels(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.scc_labels: ``rounds`` unrolled min-label
    propagations over the DIRECTED simple graph, forward and backward."""
    p = corpus_paths(tier)
    ctes = ["""de AS MATERIALIZED (
  SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
  WHERE subj_id <> obj_id)""",
            """n0 AS MATERIALIZED (
  SELECT a AS id FROM de UNION SELECT b FROM de)""",
            "f0 AS MATERIALIZED (SELECT id, id AS label FROM n0)",
            "b0 AS MATERIALIZED (SELECT id, id AS label FROM n0)"]
    for r in range(1, rounds + 1):
        ctes.append(f"""f{r} AS MATERIALIZED (
  SELECT id, min(l) AS label FROM (
    SELECT id, label AS l FROM f{r - 1}
    UNION ALL
    SELECT e.b AS id, p.label FROM de e JOIN f{r - 1} p ON p.id = e.a
  ) GROUP BY id)""")
        ctes.append(f"""b{r} AS MATERIALIZED (
  SELECT id, min(l) AS label FROM (
    SELECT id, label AS l FROM b{r - 1}
    UNION ALL
    SELECT e.a AS id, p.label FROM de e JOIN b{r - 1} p ON p.id = e.b
  ) GROUP BY id)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n"
            + ",\n".join(ctes)
            + f"""
SELECT f.id, f.label AS fwd_label, b.label AS bwd_label,
       f.label = b.label AS settled
FROM f{rounds} f JOIN b{rounds} b USING (id)""")


def sql_topo_levels(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.topo_levels: unrolled max-level rounds."""
    p = corpus_paths(tier)
    ctes = ["""de AS MATERIALIZED (
  SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
  WHERE subj_id <> obj_id)""",
            """l0 AS MATERIALIZED (
  SELECT id, 0 AS level FROM
  (SELECT a AS id FROM de UNION SELECT b FROM de))"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""l{r} AS MATERIALIZED (
  SELECT id, max(l) AS level FROM (
    SELECT id, level AS l FROM l{r - 1}
    UNION ALL
    SELECT e.b AS id, p.level + 1 FROM de e JOIN l{r - 1} p ON p.id = e.a
  ) GROUP BY id)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n"
            + ",\n".join(ctes)
            + f"\nSELECT id, CAST(level AS BIGINT) AS level FROM l{rounds}")


def sql_reciprocity(tier: str) -> str:
    """Oracle for graph_metrics.reciprocity (one exact-int division)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
de AS MATERIALIZED (
  SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
  WHERE subj_id <> obj_id),
m AS (SELECT count(*) AS n_mutual FROM de
      WHERE EXISTS (SELECT 1 FROM de r WHERE r.a = de.b AND r.b = de.a)),
t AS (SELECT count(*) AS n_directed FROM de)
SELECT CAST(t.n_directed AS BIGINT) AS n_directed,
       CAST(m.n_mutual AS BIGINT) AS n_mutual,
       CASE WHEN t.n_directed > 0
            THEN CAST(m.n_mutual AS DOUBLE) / t.n_directed
            ELSE 0.0 END AS reciprocity
FROM t, m"""


def sql_in_out_degree(tier: str) -> str:
    """Oracle for graph_metrics.in_out_degree."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
de AS MATERIALIZED (
  SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
  WHERE subj_id <> obj_id),
o AS (SELECT a AS id, count(*) AS out_deg FROM de GROUP BY a),
i AS (SELECT b AS id, count(*) AS in_deg FROM de GROUP BY b)
SELECT coalesce(o.id, i.id) AS id,
       CAST(coalesce(o.out_deg, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg
FROM o FULL OUTER JOIN i ON i.id = o.id"""


def sql_degree_histogram(tier: str) -> str:
    """Oracle for graph_metrics.degree_histogram."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id)
SELECT CAST(deg AS BIGINT) AS deg, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY deg"""


def sql_support_pmi(tier: str, cap: int = 256,
                    quant: int = 1_000_000) -> str:
    """Oracle for the PMI scoring over kg_support's capped-joint /
    uncapped-marginal counts: floor(Q * LN(c*N / (c1*c2))) — the same
    libm-ln quantization contract as adamic_adar/powerlaw."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
conv_ent AS (
  SELECT DISTINCT conv_id, id FROM (
    SELECT conv_id, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, obj_id AS id FROM canon
  )
),
conv_ent_r AS (
  SELECT conv_id, id FROM (
    SELECT conv_id, id,
           row_number() OVER (PARTITION BY conv_id ORDER BY id) AS rk
    FROM conv_ent
  ) WHERE rk <= {cap}
),
marg AS (SELECT id, count(*) AS c FROM conv_ent GROUP BY id),
joint AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS c
  FROM conv_ent_r a JOIN conv_ent_r b
    ON a.conv_id = b.conv_id AND a.id < b.id
  GROUP BY a.id, b.id
),
tot AS (SELECT count(DISTINCT conv_id) AS n
        FROM read_parquet('{p["transcripts"]}/*.parquet'))
SELECT j.id_a, j.id_b, CAST(j.c AS BIGINT) AS c,
       CAST(FLOOR({quant} * LN(CAST(j.c * tot.n AS DOUBLE)
                               / CAST(m1.c * m2.c AS DOUBLE)))
            AS BIGINT) AS pmi_q,
       CAST(FLOOR({quant} * LN(CAST(j.c * tot.n AS DOUBLE)
                               / CAST(m1.c * m2.c AS DOUBLE)))
            AS DOUBLE) / {quant} AS pmi
FROM joint j
JOIN marg m1 ON m1.id = j.id_a
JOIN marg m2 ON m2.id = j.id_b
CROSS JOIN tot"""


def sql_conversation_dedup(tier: str) -> str:
    """Oracle for dedup.conversation_dedup: md5 of the turn-ordered
    concat per conversation, keep-first (min conv_id) per fingerprint."""
    p = corpus_paths(tier)
    return f"""WITH cf AS (
  SELECT conv_id,
         md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS f
  FROM read_parquet('{p["transcripts"]}/*.parquet')
  GROUP BY conv_id)
SELECT min(conv_id) AS conv_id FROM cf GROUP BY f"""


def sql_mention_trend(tier: str) -> str:
    """Oracle for graph_metrics.mention_trend: per-entity hourly mention
    counts over the global span, OLS slope from integer moments (span
    constants H/Sx/Sxx, zero-hours contribute nothing to Sy/Sxy)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
tt AS (SELECT conv_id, turn_idx, epoch_us(ts) AS t
       FROM read_parquet('{p["transcripts"]}/*.parquet')),
ct AS (SELECT c.subj_id, c.obj_id, tt.t // 3600000000 AS hour
       FROM canon c JOIN tt ON tt.conv_id = c.conv_id
                           AND tt.turn_idx = c.turn_idx),
men AS (SELECT id, hour, count(*) AS c FROM (
          SELECT subj_id AS id, hour FROM ct
          UNION ALL SELECT obj_id, hour FROM ct)
        GROUP BY id, hour),
sp AS (SELECT min(hour) AS hmin, max(hour) - min(hour) + 1 AS h FROM men),
cons AS (SELECT h, h * (h - 1) // 2 AS sx,
                (h - 1) * h * (2 * h - 1) // 6 AS sxx FROM sp),
agg AS (SELECT id, CAST(sum(c) AS BIGINT) AS sy,
               CAST(sum((hour - (SELECT hmin FROM sp)) * c) AS BIGINT)
                 AS sxy
        FROM men GROUP BY id)
SELECT id, sy AS n_mentions,
       CASE WHEN cons.h * cons.sxx - cons.sx * cons.sx = 0 THEN 0.0
            ELSE CAST(cons.h * sxy - cons.sx * sy AS DOUBLE)
                 / (cons.h * cons.sxx - cons.sx * cons.sx) END AS slope
FROM agg, cons"""


def sql_metagraph(tier: str) -> str:
    """Oracle for the metagraph schema summary."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}')),
e AS (SELECT DISTINCT subj_id, pred_id, obj_id FROM canon)
SELECT ts.node_type AS subj_type, e.pred_id,
       tob.node_type AS obj_type, CAST(count(*) AS BIGINT) AS n_edges
FROM e JOIN ty ts ON ts.curie = e.subj_id
JOIN ty tob ON tob.curie = e.obj_id
GROUP BY ts.node_type, e.pred_id, tob.node_type"""


def sql_provenance_stats(tier: str) -> str:
    """Oracle for the edge-provenance audit: per-edge distinct
    (conv, turn) publication counts, folded per predicate."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
e AS (SELECT pred_id,
             count(DISTINCT conv_id || '#' || CAST(turn_idx AS VARCHAR))
               AS np
      FROM canon GROUP BY subj_id, pred_id, obj_id)
SELECT pred_id, CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_pubs,
       CAST(sum(np) AS BIGINT) AS n_pubs,
       CAST(sum(np) AS DOUBLE) / count(*) AS avg_pubs
FROM e GROUP BY pred_id"""


def sql_metapath_3hop(tier: str, type_a: str = "chemical_substance",
                      type_b: str = "disease") -> str:
    """Oracle for graph_metrics.metapath_3hop: non-backtracking typed
    3-hop path counts via a 3-way adjacency join."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}'))
SELECT e1.id AS id_a, e3.nb AS id_b,
       CAST(count(*) AS BIGINT) AS n_paths
FROM adj e1
JOIN adj e2 ON e2.id = e1.nb
JOIN adj e3 ON e3.id = e2.nb
JOIN ty ta ON ta.curie = e1.id AND ta.node_type = '{type_a}'
JOIN ty tb ON tb.curie = e3.nb AND tb.node_type = '{type_b}'
WHERE e1.id <> e2.nb AND e2.id <> e3.nb AND e1.id <> e3.nb
GROUP BY e1.id, e3.nb"""


def sql_directed_common(tier: str, mode: str = "cocitation",
                        k: int = 50) -> str:
    """Oracle for graph_metrics.directed_common_topk: pairs of one
    node's out-neighbors (cocitation) or in-neighbors (coupling)."""
    p = corpus_paths(tier)
    ctr, nbr = ("a", "b") if mode == "cocitation" else ("b", "a")
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
de AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
       WHERE subj_id <> obj_id),
cmn AS (
  SELECT m1.{nbr} AS id_a, m2.{nbr} AS id_b, count(*) AS common
  FROM de m1 JOIN de m2
    ON m1.{ctr} = m2.{ctr} AND m1.{nbr} < m2.{nbr}
  GROUP BY m1.{nbr}, m2.{nbr}
)
SELECT rk, id_a, id_b, CAST(common AS BIGINT) AS common FROM (
  SELECT row_number() OVER (ORDER BY common DESC, id_a, id_b) AS rk,
         id_a, id_b, common
  FROM cmn
) WHERE rk <= {k}"""


def sql_role_transitions(tier: str) -> str:
    """Oracle for temporal.role_transitions: lag() over (conv, turn)."""
    p = corpus_paths(tier)
    return f"""WITH seq AS (
  SELECT conv_id, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS prev_role
  FROM read_parquet('{p["transcripts"]}/*.parquet')
),
agg AS (
  SELECT prev_role AS from_role, role AS to_role,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_role IS NOT NULL
  GROUP BY prev_role, role
)
SELECT from_role, to_role, n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY from_role) AS BIGINT) AS p
FROM agg"""


def sql_conflicting_edges(tier: str) -> str:
    """Oracle for the multi-predicate contradiction audit (undirected
    pair, distinct predicates across both orientations)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
pp AS (SELECT DISTINCT least(subj_id, obj_id) AS id_a,
               greatest(subj_id, obj_id) AS id_b, pred_id
       FROM canon WHERE subj_id <> obj_id)
SELECT id_a, id_b,
       CAST(count(*) AS BIGINT) AS n_preds,
       string_agg(pred_id, '|' ORDER BY pred_id) AS preds
FROM pp GROUP BY id_a, id_b HAVING count(*) >= 2"""


def sql_reciprocal_best(tier: str) -> str:
    """Oracle for graph_metrics.reciprocal_best_jaccard: full Jaccard
    pair table, per-node argmax (ties to smallest partner), pairs
    present from both directions."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS d FROM adj GROUP BY id),
cmn AS (
  SELECT m1.nb AS id_a, m2.nb AS id_b, count(*) AS common
  FROM adj m1 JOIN adj m2 ON m1.id = m2.id AND m1.nb < m2.nb
  GROUP BY m1.nb, m2.nb
),
sc AS (
  SELECT c.id_a, c.id_b,
         1.0 * c.common / (d1.d + d2.d - c.common) AS jaccard
  FROM cmn c
  JOIN deg d1 ON d1.id = c.id_a
  JOIN deg d2 ON d2.id = c.id_b
),
ori AS (SELECT id_a AS id, id_b AS p, jaccard FROM sc
        UNION ALL SELECT id_b, id_a, jaccard FROM sc),
best AS (
  SELECT id, p, jaccard FROM (
    SELECT id, p, jaccard,
           row_number() OVER (PARTITION BY id
                              ORDER BY jaccard DESC, p) AS rn
    FROM ori
  ) WHERE rn = 1)
SELECT a.id AS id_a, a.p AS id_b, a.jaccard
FROM best a JOIN best b ON b.id = a.p AND b.p = a.id
WHERE a.id < a.p"""


def sql_type_inference(tier: str) -> str:
    """Oracle for graph_metrics.type_inference: majority vote over
    even-suffix seed neighbors, ties to the smallest type, scored per
    TRUE type over odd-suffix eval nodes with >=1 seed neighbor."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
ty AS (SELECT curie, node_type FROM read_parquet('{p["gazetteer"]}')),
sfx AS (SELECT curie,
               CAST(regexp_extract(curie, '([0-9]+)$', 1) AS BIGINT)
                 AS s
        FROM ty WHERE regexp_extract(curie, '([0-9]+)$', 1) <> ''),
votes AS (
  SELECT adj.id, ty.node_type AS t, count(*) AS c
  FROM adj
  JOIN sfx si ON si.curie = adj.id AND si.s % 2 = 1
  JOIN sfx sn ON sn.curie = adj.nb AND sn.s % 2 = 0
  JOIN ty ON ty.curie = adj.nb
  GROUP BY adj.id, ty.node_type
),
pred AS (
  SELECT id, t FROM (
    SELECT id, t, row_number() OVER (PARTITION BY id
                                     ORDER BY c DESC, t) AS rn
    FROM votes
  ) WHERE rn = 1
),
scored AS (
  SELECT ty.node_type AS tt,
         CASE WHEN pred.t = ty.node_type THEN 1 ELSE 0 END AS ok
  FROM pred JOIN ty ON ty.curie = pred.id
)
SELECT tt AS node_type, CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(ok) AS BIGINT) AS n_correct,
       CAST(sum(ok) AS DOUBLE) / count(*) AS accuracy
FROM scored GROUP BY tt"""


def sql_transitivity(tier: str) -> str:
    """Oracle for graph_metrics.transitivity: sum C(deg,2) wedges vs
    summed per-node triangle counts (the a<b<c enumeration x3), one
    division."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS d FROM adj GROUP BY id),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
w AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS nw FROM deg),
c AS (SELECT CAST(3 * count(*) AS BIGINT) AS nc FROM tri)
SELECT w.nw AS n_wedges, c.nc AS n_closed,
       CASE WHEN w.nw = 0 THEN 0.0
            ELSE CAST(c.nc AS DOUBLE) / CAST(w.nw AS DOUBLE)
       END AS transitivity
FROM w, c"""


def sql_triad_motifs(tier: str) -> str:
    """Oracle for graph_metrics.triad_motifs: directed 2-paths and their
    transitive / cyclic closures via joins over the distinct digraph."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
de AS (SELECT DISTINCT subj_id AS a, obj_id AS b FROM canon
       WHERE subj_id <> obj_id),
pth AS (SELECT e1.a AS x, e1.b AS m, e2.b AS y
        FROM de e1 JOIN de e2 ON e2.a = e1.b
        WHERE e1.a <> e2.b)
SELECT (SELECT count(*) FROM pth) AS n_paths,
       (SELECT count(*) FROM pth
        JOIN de ON de.a = pth.x AND de.b = pth.y) AS n_transitive,
       CAST((SELECT count(*) FROM pth
             JOIN de ON de.a = pth.y AND de.b = pth.x) // 3
            AS BIGINT) AS n_cyclic"""


def sql_growth_trace(tier: str) -> str:
    """Oracle for graph_metrics.growth_trace: triples joined back to
    their turn timestamps, first-seen mins per node / per (s,p,o) edge,
    hour histogram with window cumsums."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
tt AS (SELECT conv_id, turn_idx, epoch_us(ts) AS t
       FROM read_parquet('{p["transcripts"]}/*.parquet')),
ct AS (SELECT c.subj_id, c.pred_id, c.obj_id, tt.t
       FROM canon c JOIN tt ON tt.conv_id = c.conv_id
                           AND tt.turn_idx = c.turn_idx),
ef AS (SELECT min(t) AS t FROM ct GROUP BY subj_id, pred_id, obj_id),
nf AS (SELECT id, min(t) AS t FROM (
         SELECT subj_id AS id, t FROM ct
         UNION ALL SELECT obj_id, t FROM ct) GROUP BY id),
eh AS (SELECT t // 3600000000 AS hour, count(*) AS ne FROM ef GROUP BY 1),
nh AS (SELECT t // 3600000000 AS hour, count(*) AS nn FROM nf GROUP BY 1),
h AS (SELECT coalesce(nh.hour, eh.hour) AS hour,
             coalesce(nn, 0) AS nn, coalesce(ne, 0) AS ne
      FROM nh FULL JOIN eh ON nh.hour = eh.hour)
SELECT CAST(hour AS BIGINT) AS hour,
       CAST(nn AS BIGINT) AS new_nodes, CAST(ne AS BIGINT) AS new_edges,
       CAST(sum(nn) OVER (ORDER BY hour) AS BIGINT) AS cum_nodes,
       CAST(sum(ne) OVER (ORDER BY hour) AS BIGINT) AS cum_edges
FROM h"""


def sql_rich_club(tier: str) -> str:
    """Oracle for graph_metrics.rich_club: for every k = 0..deg_max-1
    with a >=2-member club, the induced-subgraph density of nodes with
    degree > k — counts via inequality joins over the degree table, the
    float is the identical single division of two exact ints."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
em AS (SELECT least(d1.deg, d2.deg) AS m
       FROM und JOIN deg d1 ON d1.id = und.a JOIN deg d2 ON d2.id = und.b),
ks AS (SELECT unnest(range(0, (SELECT max(deg) FROM deg))) AS k),
agg AS (
  SELECT ks.k,
         (SELECT count(*) FROM deg WHERE deg.deg > ks.k) AS n_nodes,
         (SELECT count(*) FROM em WHERE em.m > ks.k) AS n_edges
  FROM ks)
SELECT CAST(k AS BIGINT) AS k, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(2 * n_edges AS DOUBLE)
         / CAST(n_nodes * (n_nodes - 1) AS DOUBLE) AS phi
FROM agg WHERE n_nodes >= 2"""


def sql_powerlaw_alpha(tier: str, quant: int = 1_000_000) -> str:
    """Oracle for graph_metrics.powerlaw_alpha: Clauset-Shalizi-Newman
    continuous MLE with x_min=1 over the degree distribution; per-degree
    ln terms quantized with the same libm FLOOR(Q*LN(d)) as the engine,
    the float is one division plus one add."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
h AS (SELECT deg, count(*) AS n,
             CAST(FLOOR({quant} * LN(deg)) AS BIGINT) AS t
      FROM deg GROUP BY deg)
SELECT CAST(sum(n) AS BIGINT) AS n_nodes,
       CAST(max(deg) AS BIGINT) AS deg_max,
       CAST(sum(n * t) AS BIGINT) AS lnsum_q,
       CASE WHEN sum(n * t) = 0 THEN 0.0 ELSE
         1.0 + CAST({quant} * sum(n) AS DOUBLE)
               / CAST(sum(n * t) AS DOUBLE) END AS alpha
FROM h"""


def sql_community_stats(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.community_stats: the label-prop unroll
    (sql_label_prop's rounds) followed by exact integer per-community
    node count, distinct-neighbor degree sum and intra-community edge
    count."""
    p = corpus_paths(tier)
    ctes = ["""l0 AS MATERIALIZED (
  SELECT id, id AS label FROM (SELECT DISTINCT id FROM adj))"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""l{r} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT a.id, p.label,
           row_number() OVER (PARTITION BY a.id
                              ORDER BY count(*) DESC, p.label) AS rn
    FROM adj a JOIN l{r - 1} p ON p.id = a.nb
    GROUP BY a.id, p.label
  ) WHERE rn = 1)""")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes)
            + f""",
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
nn AS (SELECT l.label, count(*) AS n_nodes,
              sum(deg.deg) AS degree_sum
       FROM l{rounds} l JOIN deg USING (id) GROUP BY l.label),
ie AS (SELECT la.label, count(*) AS intra_edges
       FROM und e
       JOIN l{rounds} la ON la.id = e.a
       JOIN l{rounds} lb ON lb.id = e.b AND lb.label = la.label
       GROUP BY la.label)
SELECT nn.label, CAST(nn.n_nodes AS BIGINT) AS n_nodes,
       CAST(nn.degree_sum AS BIGINT) AS degree_sum,
       CAST(coalesce(ie.intra_edges, 0) AS BIGINT) AS intra_edges
FROM nn LEFT JOIN ie USING (label)""")


def sql_two_hop_ball(tier: str) -> str:
    """Oracle for graph_metrics.two_hop_ball: distinct <=2-hop partners
    per node = adjacency UNION both orientations of every same-center
    neighbor pair, counted per node."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
ball AS (
  SELECT DISTINCT id, p FROM (
    SELECT id, nb AS p FROM adj
    UNION ALL
    SELECT m1.nb AS id, m2.nb AS p
    FROM adj m1 JOIN adj m2 ON m1.id = m2.id AND m1.nb <> m2.nb)
)
SELECT id, CAST(count(*) AS BIGINT) AS ball_size FROM ball GROUP BY id"""


def sql_modularity(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.modularity_summary: wraps the
    community-stats oracle and folds the exact integer rational
    Q = (4*m*intra - sum(D_c^2)) / (4*m^2), m = sum(D_c)//2 — the CAST
    AS DOUBLE / integer-den division is the identical
    double-cast-then-divide the engine performs."""
    inner = sql_community_stats(tier, rounds)
    return f"""SELECT
  CAST(count(*) AS BIGINT) AS n_communities,
  CAST(sum(degree_sum) // 2 AS BIGINT) AS n_edges,
  CAST(sum(intra_edges) AS BIGINT) AS intra_edges,
  CAST(sum(degree_sum * degree_sum) AS BIGINT) AS deg_sq_sum,
  CASE WHEN sum(degree_sum) = 0 THEN 0.0 ELSE
    CAST(4 * (sum(degree_sum) // 2) * sum(intra_edges)
         - sum(degree_sum * degree_sum) AS DOUBLE)
    / CAST(4 * (sum(degree_sum) // 2) * (sum(degree_sum) // 2) AS DOUBLE)
  END AS modularity
FROM ({inner})"""


def sql_clustering_coeff(tier: str) -> str:
    """Oracle for graph_metrics.clustering_coefficient: triangle counts
    (a<b<c enumeration) LEFT-joined to distinct-neighbor degree; the
    coefficient is the identical single float division."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
ids AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
),
tcnt AS (SELECT id, count(*) AS t FROM ids GROUP BY id)
SELECT d.id, d.deg, CAST(coalesce(t.t, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.deg >= 2
            THEN 2.0 * coalesce(t.t, 0) / (d.deg * (d.deg - 1))
            ELSE 0.0 END AS coeff
FROM deg d LEFT JOIN tcnt t ON t.id = d.id"""


def sql_harmonic_centrality(tier: str, n_seeds: int = 8,
                            rounds: int = 4) -> str:
    """Oracle for graph_metrics.harmonic_centrality: per-seed BFS via a
    recursive CTE from the ``n_seeds`` lexicographically-smallest graph
    nodes, min(dist) per (seed, node), then the identical integer LCM
    accumulation — harmonic is ONE division so the float is bit-identical."""
    import math

    lcm = math.lcm(*range(1, rounds + 1))
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
nodes AS (SELECT DISTINCT id FROM adj),
seeds AS (SELECT id AS s FROM nodes ORDER BY id LIMIT {n_seeds}),
bfs(s, id, dist) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT b.s, adj.nb, b.dist + 1 FROM bfs b JOIN adj ON adj.id = b.id
  WHERE b.dist < {rounds}
),
d AS (SELECT s, id, min(dist) AS dist FROM bfs GROUP BY s, id),
h AS (SELECT id, sum({lcm} // dist) AS h12 FROM d WHERE dist > 0 GROUP BY id)
SELECT n.id, CAST(coalesce(h.h12, 0) AS BIGINT) AS h12,
       CAST(coalesce(h.h12, 0) AS DOUBLE) / {lcm} AS harmonic
FROM nodes n LEFT JOIN h ON h.id = n.id"""


def sql_stress_centrality(tier: str, n_seeds: int = 8,
                          rounds: int = 3) -> str:
    """Oracle for graph_metrics.stress_centrality (rounds=3 unrolled):
    per-seed sigma layers d1..d3 as MATERIALIZED CTEs (each layer sums
    path counts from the previous one, excluding already-reached nodes),
    then the backward DAG fold f2/f1 and stress = sigma * f summed over
    seeds. Integer-exact end to end — no float compares."""
    assert rounds == 3, "oracle unrolled for rounds=3"
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
nodes AS (SELECT DISTINCT id FROM adj),
seeds AS (SELECT id AS s FROM nodes ORDER BY id LIMIT {n_seeds}),
d0 AS MATERIALIZED (SELECT s, s AS id, CAST(1 AS BIGINT) AS sigma
                    FROM seeds),
d1 AS MATERIALIZED (
  SELECT d0.s, adj.nb AS id, CAST(sum(d0.sigma) AS BIGINT) AS sigma
  FROM d0 JOIN adj ON adj.id = d0.id
  WHERE adj.nb <> d0.s
  GROUP BY d0.s, adj.nb),
d2 AS MATERIALIZED (
  SELECT d1.s, adj.nb AS id, CAST(sum(d1.sigma) AS BIGINT) AS sigma
  FROM d1 JOIN adj ON adj.id = d1.id
  WHERE NOT EXISTS (SELECT 1 FROM d0 WHERE d0.s = d1.s AND d0.id = adj.nb)
    AND NOT EXISTS (SELECT 1 FROM d1 p WHERE p.s = d1.s AND p.id = adj.nb)
  GROUP BY d1.s, adj.nb),
d3 AS MATERIALIZED (
  SELECT d2.s, adj.nb AS id, CAST(sum(d2.sigma) AS BIGINT) AS sigma
  FROM d2 JOIN adj ON adj.id = d2.id
  WHERE NOT EXISTS (SELECT 1 FROM d0 WHERE d0.s = d2.s AND d0.id = adj.nb)
    AND NOT EXISTS (SELECT 1 FROM d1 WHERE d1.s = d2.s AND d1.id = adj.nb)
    AND NOT EXISTS (SELECT 1 FROM d2 p WHERE p.s = d2.s AND p.id = adj.nb)
  GROUP BY d2.s, adj.nb),
f2 AS MATERIALIZED (
  SELECT d2.s, d2.id AS v, CAST(count(*) AS BIGINT) AS f
  FROM d2 JOIN adj ON adj.id = d2.id
  JOIN d3 ON d3.s = d2.s AND d3.id = adj.nb
  GROUP BY d2.s, d2.id),
f1 AS MATERIALIZED (
  SELECT d1.s, d1.id AS v,
         CAST(sum(1 + coalesce(f2.f, 0)) AS BIGINT) AS f
  FROM d1 JOIN adj ON adj.id = d1.id
  JOIN d2 ON d2.s = d1.s AND d2.id = adj.nb
  LEFT JOIN f2 ON f2.s = d1.s AND f2.v = adj.nb
  GROUP BY d1.s, d1.id),
contrib AS (
  SELECT d1.s, d1.id, d1.sigma * coalesce(f1.f, 0) AS c
  FROM d1 LEFT JOIN f1 ON f1.s = d1.s AND f1.v = d1.id
  UNION ALL
  SELECT d2.s, d2.id, d2.sigma * coalesce(f2.f, 0) AS c
  FROM d2 LEFT JOIN f2 ON f2.s = d2.s AND f2.v = d2.id)
SELECT n.id, CAST(coalesce(sum(c.c), 0) AS BIGINT) AS stress
FROM nodes n LEFT JOIN contrib c ON c.id = n.id
GROUP BY n.id"""


def sql_distance_profile(tier: str, n_seeds: int = 8,
                         rounds: int = 4) -> str:
    """Oracle for graph_metrics.distance_profile: recursive-CTE BFS from
    the sampled seeds, min dist per (seed, node), counts per hop; hops
    with zero pairs still emit a row (range LEFT JOIN)."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
nodes AS (SELECT DISTINCT id FROM adj),
seeds AS (SELECT id AS s FROM nodes ORDER BY id LIMIT {n_seeds}),
bfs(s, id, dist) AS (
  SELECT s, s, 0 FROM seeds
  UNION
  SELECT b.s, adj.nb, b.dist + 1 FROM bfs b JOIN adj ON adj.id = b.id
  WHERE b.dist < {rounds}
),
d AS (SELECT s, id, min(dist) AS dist FROM bfs GROUP BY s, id),
c AS (SELECT dist, count(*) AS n FROM d WHERE dist > 0 GROUP BY dist)
SELECT r.dist, CAST(coalesce(c.n, 0) AS BIGINT) AS n_pairs
FROM (SELECT CAST(x AS BIGINT) AS dist
      FROM range(1, {rounds + 1}) t(x)) r
LEFT JOIN c ON c.dist = r.dist"""


def sql_path_anchored(tier: str, type_a: str = "chemical_substance",
                      type_b: str = "disease", budget: int = 2) -> str:
    """Oracle for kg_build.anchored_path_filter (--start semantics): the
    sql_path_filtered type filter intersected with BFS reachability
    (<= budget hops over the undirected simple graph) from the
    lexicographically-smallest type_a node present in the graph."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
anchor AS (
  SELECT min(a.id) AS s FROM (SELECT DISTINCT id FROM adj) a
  JOIN read_parquet('{p["gazetteer"]}') g ON g.curie = a.id
  WHERE g.node_type = '{type_a}'
),
bfs(id, dist) AS (
  SELECT s, 0 FROM anchor
  UNION
  SELECT adj.nb, b.dist + 1 FROM bfs b JOIN adj ON adj.id = b.id
  WHERE b.dist < {budget}
),
allowed AS (SELECT DISTINCT id FROM bfs)
SELECT c.conv_id, c.turn_idx, c.subj_id, c.pred_id, c.obj_id
FROM canon c
JOIN read_parquet('{p["gazetteer"]}') gs ON gs.curie = c.subj_id
JOIN read_parquet('{p["gazetteer"]}') go ON go.curie = c.obj_id
WHERE ((gs.node_type = '{type_a}' AND go.node_type = '{type_b}')
    OR (gs.node_type = '{type_b}' AND go.node_type = '{type_a}'))
  AND c.subj_id IN (SELECT id FROM allowed)
  AND c.obj_id IN (SELECT id FROM allowed)"""


def sql_edges_upsert(tier: str) -> str:
    """Oracle for stages.upsert.merge_edge_runs over the standard edge
    table: run 2 re-aggregates the even-parity conversations and REPLACES
    every (subj, obj, edge_source) key it emits; run-1-only keys persist
    (`builder/builder.py:16-41` delete-then-create)."""
    p = corpus_paths(tier)
    agg = """SELECT subj_id, pred_id, replace(pred_id, ':', '_') AS standard_label, obj_id,
       'extractor.triple_pattern' AS edge_source,
       CAST(0 AS BIGINT) AS ctime,
       subj_id || ',' || obj_id AS input_identifiers,
       list_sort(list_distinct(list('CONV:' || conv_id || '#' ||
                                    CAST(turn_idx AS VARCHAR)))) AS publications,
       count(*) AS n_mentions,
       false AS is_support
FROM {src}
GROUP BY subj_id, pred_id, obj_id"""
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
canon2 AS (SELECT * FROM canon
           WHERE CAST(substr(conv_id, -1) AS INT) % 2 = 0),
r1 AS ({agg.format(src="canon")}),
r2 AS ({agg.format(src="canon2")})
SELECT * FROM r2
UNION ALL
SELECT r1.* FROM r1
WHERE NOT EXISTS (SELECT 1 FROM r2
                  WHERE r2.subj_id = r1.subj_id
                    AND r2.obj_id = r1.obj_id)"""


def sql_degree_assortativity(tier: str) -> str:
    """Oracle for graph_metrics.degree_assortativity: endpoint-degree
    Pearson over both orientations of the undirected simple graph, the
    HUGEINT moment formula shared with sql_lineitem_qty_price_corr."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
deg AS (SELECT id, count(*) AS deg FROM adj GROUP BY id),
pairs AS (
  SELECT CAST(da.deg AS BIGINT) AS x, CAST(db.deg AS BIGINT) AS y
  FROM adj JOIN deg da ON da.id = adj.id JOIN deg db ON db.id = adj.nb
),
m AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
         AS assortativity
FROM m"""


def sql_schema_histogram(tier: str) -> str:
    """Oracle for kg_schema_histogram: distinct-edge counts per
    (subj_type, pred_id, obj_type) — KG schema profiling."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
e AS (SELECT DISTINCT subj_id, pred_id, obj_id FROM canon)
SELECT gs.node_type AS subj_type, e.pred_id, go.node_type AS obj_type,
       count(*) AS n
FROM e
JOIN read_parquet('{p["gazetteer"]}') gs ON gs.curie = e.subj_id
JOIN read_parquet('{p["gazetteer"]}') go ON go.curie = e.obj_id
GROUP BY 1, 2, 3"""


def sql_edge_spans(tier: str) -> str:
    """Oracle for kg_edge_spans: per distinct (subj, pred, obj) edge the
    zero-padded first/last mention key and the distinct-conversation
    support breadth."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]}
SELECT subj_id, pred_id, obj_id,
       min(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 6, '0'))
         AS first_pub,
       max(conv_id || '#' || lpad(CAST(turn_idx AS VARCHAR), 6, '0'))
         AS last_pub,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM canon GROUP BY subj_id, pred_id, obj_id"""


def sql_unused_entities(tier: str) -> str:
    """Oracle for kg_unused_entities: gazetteer rows whose canonical
    component is not an endpoint of the undirected simple graph."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
nodes AS (SELECT DISTINCT id FROM adj)
SELECT g.curie, g.name, g.node_type
FROM read_parquet('{p["gazetteer"]}') g
JOIN cc ON cc.id = g.curie
WHERE cc.canon NOT IN (SELECT id FROM nodes)"""


def sql_conv_stats(tier: str) -> str:
    """Oracle for kg_conv_stats: per-conversation turn/role/char counts
    and the microsecond ts span."""
    p = corpus_paths(tier)
    return f"""
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (WHERE role = 'user') AS BIGINT) AS n_user,
       CAST(count(*) FILTER (WHERE role = 'assistant') AS BIGINT)
         AS n_assistant,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us
FROM read_parquet('{p["transcripts"]}/*.parquet')
GROUP BY conv_id"""


def sql_turn_window_pairs(tier: str, window: int = 2,
                          cap: int = 256) -> str:
    """Oracle for support.turn_window_pairs: distinct (conv, turn, id)
    mentions, per-conv lexicographic entity cap, |turn diff| <= window
    self-join with a.id < b.id, pair counts."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
ment AS (
  SELECT DISTINCT conv_id, turn_idx, id FROM (
    SELECT conv_id, turn_idx, subj_id AS id FROM canon
    UNION ALL SELECT conv_id, turn_idx, obj_id FROM canon
  )
),
ranked AS (
  SELECT conv_id, id,
         dense_rank() OVER (PARTITION BY conv_id ORDER BY id) AS rk
  FROM (SELECT DISTINCT conv_id, id FROM ment)
),
m2 AS (
  SELECT m.* FROM ment m
  JOIN ranked r ON r.conv_id = m.conv_id AND r.id = m.id
  WHERE r.rk <= {cap}
)
SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS n_windows
FROM m2 a JOIN m2 b
  ON a.conv_id = b.conv_id AND a.id < b.id
 AND abs(a.turn_idx - b.turn_idx) <= {window}
GROUP BY 1, 2"""


def sql_ktruss(tier: str, k: int = 4, rounds: int = 3) -> str:
    """Oracle for graph_metrics.ktruss: ``rounds`` unrolled peels (drop
    edges with common-neighbor support < k-2 over the current set), then
    the survivors' support recomputed on the survivor set."""
    p = corpus_paths(tier)
    # AS MATERIALIZED: without it DuckDB inlines each CTE reference and
    # re-derives the whole canon -> und chain per join arm per round
    # (exponential blowup; the un-hinted form ran > 110 s at sf0.001)
    ctes = ["e0 AS MATERIALIZED (SELECT a, b FROM und)"]
    for r in range(rounds + 1):
        ctes.append(
            f"a{r} AS MATERIALIZED (SELECT a AS id, b AS nb FROM e{r} "
            f"UNION ALL SELECT b, a FROM e{r})")
        ctes.append(
            f"t{r} AS MATERIALIZED (SELECT e.a, e.b, count(*) AS t "
            f"FROM e{r} e "
            f"JOIN a{r} n1 ON n1.id = e.a "
            f"JOIN a{r} n2 ON n2.id = e.b AND n2.nb = n1.nb "
            f"GROUP BY e.a, e.b)")
        if r < rounds:
            ctes.append(
                f"e{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e "
                f"LEFT JOIN t{r} t ON t.a = e.a AND t.b = e.b "
                f"WHERE coalesce(t.t, 0) >= {k - 2})")
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes)
            + f"""
SELECT e.a, e.b, CAST(coalesce(t.t, 0) AS BIGINT) AS support
FROM e{rounds} e
LEFT JOIN t{rounds} t ON t.a = e.a AND t.b = e.b""")


def sql_matching(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.maximal_matching: ``rounds`` unrolled
    Luby peels at EDGE grain — per round the active edges whose unique
    key md5(a||'|'||b) (pair tie-break suffix) is the per-node minimum
    at BOTH endpoints join the matching; their endpoints deactivate
    every incident edge."""
    p = corpus_paths(tier)
    ctes = ["e0 AS MATERIALIZED (SELECT a, b, "
            "md5(a || '|' || b) || '|' || a || '|' || b AS k FROM und)"]
    for r in range(rounds):
        ctes.append(
            f"mn{r} AS MATERIALIZED (SELECT id, min(k) AS mk FROM ("
            f"SELECT a AS id, k FROM e{r} "
            f"UNION ALL SELECT b, k FROM e{r}) GROUP BY id)")
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT e.a, e.b FROM e{r} e "
            f"JOIN mn{r} ma ON ma.id = e.a AND ma.mk = e.k "
            f"JOIN mn{r} mb ON mb.id = e.b AND mb.mk = e.k)")
        if r < rounds - 1:
            ctes.append(
                f"e{r + 1} AS MATERIALIZED (SELECT e.a, e.b, e.k "
                f"FROM e{r} e WHERE e.a NOT IN "
                f"(SELECT a FROM w{r} UNION ALL SELECT b FROM w{r}) "
                f"AND e.b NOT IN "
                f"(SELECT a FROM w{r} UNION ALL SELECT b FROM w{r}))")
    sel = "\nUNION ALL ".join(
        f"SELECT a, b, CAST({r} AS BIGINT) AS match_round FROM w{r}"
        for r in range(rounds))
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes) + "\n" + sel)


def sql_mis(tier: str, rounds: int = 3) -> str:
    """Oracle for graph_metrics.maximal_independent_set: ``rounds``
    unrolled Luby peels — per round the active nodes whose md5(id)
    priority (id tie-break) is strictly smallest among active neighbors
    join, then winners and their neighbors deactivate."""
    p = corpus_paths(tier)
    ctes = ["act0 AS MATERIALIZED (SELECT DISTINCT id FROM adj)",
            "pr AS MATERIALIZED (SELECT id, md5(id) AS h "
            "FROM (SELECT DISTINCT id FROM adj))"]
    for r in range(rounds):
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT x.id FROM act{r} x "
            f"JOIN pr px ON px.id = x.id WHERE NOT EXISTS ("
            f"SELECT 1 FROM adj j "
            f"JOIN act{r} y ON y.id = j.nb "
            f"JOIN pr py ON py.id = j.nb "
            f"WHERE j.id = x.id AND (py.h < px.h "
            f"OR (py.h = px.h AND j.nb < x.id))))")
        ctes.append(
            f"act{r + 1} AS MATERIALIZED (SELECT a.id FROM act{r} a "
            f"WHERE a.id NOT IN (SELECT id FROM w{r}) "
            f"AND NOT EXISTS (SELECT 1 FROM adj j "
            f"JOIN w{r} w ON w.id = j.nb WHERE j.id = a.id))")
    sel = "\nUNION ALL ".join(
        f"SELECT id, CAST({r} AS BIGINT) AS mis_round FROM w{r}"
        for r in range(rounds))
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes) + "\n" + sel)


def sql_coloring(tier: str, rounds: int = 4) -> str:
    """Oracle for graph_metrics.greedy_coloring: ``rounds`` unrolled
    Jones-Plassmann steps — per round the still-uncolored nodes whose
    md5(id) priority (id tie-break) is strictly smallest among uncolored
    neighbors take color = round; ONLY winners retire (their neighbors
    keep competing), unlike MIS's neighbor deactivation."""
    p = corpus_paths(tier)
    ctes = ["act0 AS MATERIALIZED (SELECT DISTINCT id FROM adj)",
            "pr AS MATERIALIZED (SELECT id, md5(id) AS h "
            "FROM (SELECT DISTINCT id FROM adj))"]
    for r in range(rounds):
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT x.id FROM act{r} x "
            f"JOIN pr px ON px.id = x.id WHERE NOT EXISTS ("
            f"SELECT 1 FROM adj j "
            f"JOIN act{r} y ON y.id = j.nb "
            f"JOIN pr py ON py.id = j.nb "
            f"WHERE j.id = x.id AND (py.h < px.h "
            f"OR (py.h = px.h AND j.nb < x.id))))")
        ctes.append(
            f"act{r + 1} AS MATERIALIZED (SELECT a.id FROM act{r} a "
            f"WHERE a.id NOT IN (SELECT id FROM w{r}))")
    sel = "\nUNION ALL ".join(
        f"SELECT id, CAST({r} AS BIGINT) AS color FROM w{r}"
        for r in range(rounds))
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes) + "\n" + sel)


def sql_wl_colors(tier: str, rounds: int = 2) -> str:
    """Oracle for graph_metrics.wl_colors: 1-WL refinement unrolled —
    per round each node's color becomes md5(own_color || '|' || the
    sorted 'color x count' multiset of its neighbors' colors); colors
    start as the CURIE prefix. ``rounds`` is the SPEC constant
    WL_ROUNDS."""
    p = corpus_paths(tier)
    ctes = ["""w0 AS MATERIALIZED (
  SELECT id, split_part(id, ':', 1) AS c
  FROM (SELECT DISTINCT id FROM adj))"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""g{r} AS MATERIALIZED (
  SELECT a.id, p.c AS nc, count(*) AS n
  FROM adj a JOIN w{r - 1} p ON p.id = a.nb
  GROUP BY a.id, p.c)""")
        ctes.append(f"""w{r} AS MATERIALIZED (
  SELECT g.id, md5(o.c || '|' || string_agg(
           g.nc || 'x' || CAST(g.n AS VARCHAR), ',' ORDER BY g.nc)) AS c
  FROM g{r} g JOIN w{r - 1} o ON o.id = g.id
  GROUP BY g.id, o.c)""")
    sel = ", ".join(f"w{r}.c AS wl{r}" for r in range(1, rounds + 1))
    joins = " ".join(f"JOIN w{r} ON w{r}.id = w1.id"
                     for r in range(2, rounds + 1))
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes)
            + f"\nSELECT w1.id, {sel} FROM w1 {joins}")


def sql_conv_latency(tier: str) -> str:
    """Oracle for kg_conv_latency: min assistant ts at-or-after the first
    user ts, per conversation."""
    p = corpus_paths(tier)
    return f"""
WITH t AS (SELECT conv_id, role, epoch_us(ts) AS t
           FROM read_parquet('{p["transcripts"]}/*.parquet')
           WHERE role IN ('user', 'assistant')),
u AS (SELECT conv_id, min(t) AS t_user FROM t
      WHERE role = 'user' GROUP BY conv_id)
SELECT t.conv_id, CAST(min(t.t) - u.t_user AS BIGINT) AS latency_us
FROM t JOIN u USING (conv_id)
WHERE t.role = 'assistant' AND t.t >= u.t_user
GROUP BY t.conv_id, u.t_user"""


def sql_tool_usage(tier: str) -> str:
    """Oracle for the tool-call usage profile: per non-empty tool name
    its call count, distinct conversations and share of all tool calls
    (ONE division of exact ints)."""
    p = corpus_paths(tier)
    return f"""
WITH tc AS (
  SELECT tool, conv_id FROM read_parquet('{p["transcripts"]}/*.parquet')
  WHERE tool <> ''
)
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM tc) AS share
FROM tc GROUP BY tool"""


def ensure_zlib_aux(tier: str) -> str:
    """Sequential zlib measurement oracle (idempotent): DEFLATE output
    length is a property of the zlib spec constants (level 6), like the
    media codecs — the aux stores only the raw MEASUREMENTS (raw_len,
    comp_len); the ratio arithmetic and both quality thresholds are
    re-derived independently in :func:`sql_compression_flags`."""
    import os
    import zlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .stages.text_analysis import ZLIB_LEVEL

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/zlib_lens.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    docs = pd.read_parquet(f"/root/testdata/{tier}/documents.parquet",
                           columns=["doc_id", "text"])
    ids, rls, cls_ = [], [], []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        b = text.encode("utf-8")
        ids.append(int(doc_id))
        rls.append(len(b))
        cls_.append(len(zlib.compress(b, ZLIB_LEVEL)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "raw_len": pa.array(rls, pa.int64()),
                             "comp_len": pa.array(cls_, pa.int64())}), path)
    return path


def sql_compression_flags(tier: str) -> str:
    from .stages.text_analysis import COMP_RATIO_HI_PM, COMP_RATIO_LO_PM

    path = ensure_zlib_aux(tier)
    return f"""
WITH m AS (
  SELECT doc_id, raw_len, comp_len,
         comp_len * 1000 // greatest(raw_len, 1) AS ratio_pm
  FROM read_parquet('{path}'))
SELECT doc_id, raw_len, comp_len, ratio_pm,
       CASE WHEN ratio_pm < {COMP_RATIO_LO_PM} THEN 'repetitive'
            ELSE 'incompressible' END AS flag
FROM m
WHERE ratio_pm < {COMP_RATIO_LO_PM} OR ratio_pm > {COMP_RATIO_HI_PM}"""


def ensure_mst_aux(tier: str) -> str:
    """Sequential KRUSKAL oracle for the minimum spanning forest
    (idempotent): derives the same mention-weighted edge list in DuckDB
    (the weighted_sssp CTEs) and runs an independently-written
    sort-then-union-find Kruskal. Under the total edge order (wt, a, b)
    all weights are distinct, so the MSF is unique — the distributed
    Borůvka in graph_metrics must reproduce the edge set exactly."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = f"/tmp/graft_oracle/{tier}_{_AUX_VERSION}"
    path = f"{root}/mst_edges.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    p = corpus_paths(tier)
    edges = duckdb.sql(f"""WITH RECURSIVE {_canon_cte(p)[1:]},
wpair AS (
  SELECT least(subj_id, obj_id) AS a, greatest(subj_id, obj_id) AS b,
         count(*) AS m
  FROM canon WHERE subj_id <> obj_id GROUP BY 1, 2
)
SELECT a, b, CASE WHEN m >= 3 THEN 1 WHEN m = 2 THEN 2 ELSE 3 END AS wt
FROM wpair ORDER BY wt, a, b""").fetchdf()

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep_a, keep_b, keep_w = [], [], []
    for a, b, wt in edges.itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            keep_a.append(a)
            keep_b.append(b)
            keep_w.append(int(wt))
    pq.write_table(pa.table({"a": pa.array(keep_a, pa.string()),
                             "b": pa.array(keep_b, pa.string()),
                             "wt": pa.array(keep_w, pa.int64())}), path)
    return path


def sql_mst(tier: str) -> str:
    path = ensure_mst_aux(tier)
    return f"SELECT a, b, wt FROM read_parquet('{path}')"


def sql_densest(tier: str, rounds: int = 8) -> str:
    """Oracle for graph_metrics.densest_subgraph: ``rounds`` unrolled
    average-degree peels; per surviving round one (v_count, e_count,
    density) row. Peel keeps nodes with deg * V > 2 * E (integer
    cross-multiplication); density is the single float division."""
    p = corpus_paths(tier)
    ctes = ["e0 AS MATERIALIZED (SELECT a, b FROM und)"]
    for r in range(rounds):
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS e_cnt,
         CAST((SELECT count(DISTINCT id) FROM
               (SELECT a AS id FROM e{r} UNION ALL SELECT b FROM e{r}))
              AS BIGINT) AS v_cnt
  FROM e{r})""")
        if r < rounds - 1:
            ctes.append(f"""k{r} AS MATERIALIZED (
  SELECT d.id FROM (
    SELECT id, count(*) AS deg FROM
      (SELECT a AS id FROM e{r} UNION ALL SELECT b FROM e{r})
    GROUP BY id) d, s{r} s
  WHERE d.deg * s.v_cnt > 2 * s.e_cnt)""")
            ctes.append(f"""e{r + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r} e
  JOIN k{r} x ON x.id = e.a JOIN k{r} y ON y.id = e.b)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, v_cnt AS v_count,"
        f" e_cnt AS e_count, 1.0 * e_cnt / v_cnt AS density"
        f" FROM s{r} WHERE v_cnt > 0"
        for r in range(rounds))
    return (f"WITH RECURSIVE {_canon_cte(p)[1:]},\n{_UND_CTES},\n"
            + ",\n".join(ctes) + "\n" + sel)


def sql_bipartite(tier: str) -> str:
    """Oracle for graph_metrics.bipartite_components: parity-carrying
    reachability (recursive CTE) — a component has an odd cycle iff some
    node is reachable from some root at BOTH parities."""
    p = corpus_paths(tier)
    return f"""WITH RECURSIVE {_canon_cte(p)[1:]},
{_UND_CTES},
nodes AS (SELECT DISTINCT id FROM adj),
preach(id, root, par) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT a.nb, r.root, 1 - r.par
  FROM preach r JOIN adj a ON a.id = r.id
),
comp AS (SELECT id, min(root) AS component FROM preach GROUP BY id),
oddnodes AS (
  SELECT r.id FROM preach r
  GROUP BY r.id, r.root HAVING count(DISTINCT r.par) = 2
),
odd AS (SELECT DISTINCT c.component
        FROM oddnodes o JOIN comp c ON c.id = o.id)
SELECT c.component, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(CASE WHEN c.component IN (SELECT component FROM odd)
                 THEN 0 ELSE 1 END AS BIGINT) AS is_bipartite
FROM comp c GROUP BY c.component"""
