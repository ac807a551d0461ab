"""Driver-contract simulator: runs __ray_entry__ exactly as the round driver
does — ray.init, entry() smoke, then every queries()[name](sf_dir) compared
against oracle_sql()[name] via DuckDB (row count + schema + order-insensitive
value comparison).

Usage: python tools/drive_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import gc
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rows: ray={len(got)} oracle={len(want)}")
    g, w = normalize(got), normalize(want)
    if list(g.columns) != list(w.columns):
        problems.append(f"schema: ray={list(g.columns)} oracle={list(w.columns)}")
        return problems
    # The real driver hashes raw values: an int64 Ray column vs a float64
    # oracle column (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64) hashes
    # DIFFERENTLY even when values compare equal. Mirror that strictness by
    # failing on dtype-kind mismatches before value comparison.
    for c in g.columns:
        gk = got.reindex(sorted(got.columns), axis=1)[c].dtype.kind
        wk = want.reindex(sorted(want.columns), axis=1)[c].dtype.kind
        if gk != wk and {gk, wk} != {"O", "U"}:
            problems.append(
                f"col {c}: dtype kind mismatch ray={gk} oracle={wk} "
                f"(driver hash would differ)"
            )
    if problems:
        return problems
    for c in g.columns:
        if g[c].dtype.kind == "f":
            import numpy as np

            if not np.allclose(g[c], w[c], rtol=0, atol=0, equal_nan=True):
                mx = float(np.nanmax(np.abs(g[c] - w[c])))
                problems.append(f"col {c}: float mismatch max|diff|={mx:.3e}")
        else:
            neq = (g[c] != w[c])
            if hasattr(neq, "any") and neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {c}: {int(neq.sum())} mismatches, first @{i}: "
                    f"ray={g[c][i]!r} oracle={w[c][i]!r}"
                )
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--driver-strict"]
    # --driver-strict: reproduce the ROUND DRIVER's conversion exactly —
    # no base_schema rebuild of a zero-row to_pandas() result. The r04
    # driver flagged two healthy empty results schema-red precisely on
    # that path; queries() now routes every entry through
    # __ray_entry__._driver_stable, so strict mode must pass everywhere.
    strict = "--driver-strict" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    # corpus-backed oracles (kg_*, dedup sketch tables) must read the SAME
    # tier the queries run on; the real driver always uses sf0.01
    import os

    tier = os.path.basename(sf_dir.rstrip("/"))
    prior = os.environ.get("GRAFT_SQL_TIER")
    if prior is not None and prior != tier:
        # a stale tier in the environment would make corpus-backed oracles
        # read a DIFFERENT tier than the queries under test — fail loudly
        raise SystemExit(
            f"GRAFT_SQL_TIER={prior!r} conflicts with sf_dir tier {tier!r}; "
            "unset it or pass the matching sf_dir"
        )
    os.environ["GRAFT_SQL_TIER"] = tier

    import ray

    sys.path.insert(0, ".")
    from robokop_build_ray.functions.ray_utils import local_init_kwargs

    ray.init(address="local", num_cpus=8, ignore_reinit_error=True,
             logging_level="ERROR", **local_init_kwargs())
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from robokop_build_ray.functions.ray_utils import (
        silence_empty_block_schema_warnings,
    )

    silence_empty_block_schema_warnings()
    import __ray_entry__ as e

    t0 = time.time()
    res = e.entry()
    n = res.count() if hasattr(res, "count") and not isinstance(res, pd.DataFrame) else len(res)
    print(f"entry(): {n} rows, schema={res.schema().names if hasattr(res,'schema') else list(res.columns)} "
          f"({time.time()-t0:.1f}s)", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # drop lingering Dataset/executor references from the PREVIOUS
            # query first: an un-collected streaming executor keeps its
            # actor-pool workers alive, and on the 8-CPU contract cluster
            # a couple of orphaned actors plus the next query's pool can
            # hold every CPU lease and starve its read tasks (observed
            # deadlock at query 89 of a full sweep). `out`/`got` are still
            # bound to the previous query's Dataset at this point, so the
            # gc alone could not reap its executor — unbind them first
            # (observed again at query 48 of the r3 full sweep: a
            # VarLenFilter actor from kg_path_filtered_2hop survived the
            # collect and starved kg_path_anchored's three pools)
            out = got = None
            gc.collect()
            out = fn(sf_dir)
            got = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
            if (not strict and len(got) == 0 and len(got.columns) == 0
                    and hasattr(out, "schema")):
                # Ray's to_pandas() drops the schema of a ZERO-ROW dataset
                # (typed-empty Arrow blocks come back column-less); rebuild
                # the typed empty frame from the dataset schema so empty
                # results compare schemas like the driver does
                sch = out.schema()
                base = getattr(sch, "base_schema", None)
                if base is not None:
                    got = base.empty_table().to_pandas()
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}", flush=True)
            failed.append(name)
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"ok   {name}: {len(got)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]", flush=True)
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}",
                  flush=True)
            failed.append(name)
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems), flush=True)
            failed.append(name)
        else:
            print(f"ok   {name}: {len(got)} rows match oracle "
                  f"[{time.time()-t0:.1f}s]", flush=True)
    ray.shutdown()
    print(("ALL OK" if not failed else f"FAILED: {failed}"), flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
