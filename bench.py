"""Benchmark: full 5-stage KG pipeline end-to-end over the bench corpus.

Prints ONE JSON line:
  {"metric": "kg_build_e2e_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-phase sec...}, "sf": ..., "num_cpus": N,
   "rows": turns, "triples": n, "triples_per_sec": ..., "rows_per_sec": ...}

--scaling: runs the same job in fresh processes at num_cpus=8 and 32 and
reports throughput at both plus efficiency = (T32/T8)/(32/8)
(sandbox stand-in for the N vs 4N node cluster criterion).

Corpus generation (deterministic, cached under /tmp/graft_corpus) is
excluded from timing; one untimed read warms the page cache first.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def _probe_burn(n=10_000_000) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def host_probe() -> dict:
    """Machine-state probe (BASELINE §2.6 forensics, shipped per run so
    every scaling ratio carries its host-health annotation):

    - ``matmul_s``: single 2000^2 float64 matmul wall. The documented
      slow-host state shows >2.5 s here vs <2 s healthy.
    - ``mp_efficiency``: wall-clock efficiency of 8 concurrent CPU-bound
      processes vs 1 (1.0 = perfect core scaling). The slow-day no-Ray
      probe bottomed at ~0.76, capping ANY engine's measurable scaling.
    """
    import multiprocessing as mp
    import time as _t

    import numpy as np

    a = np.random.default_rng(0).standard_normal((2000, 2000))
    t0 = _t.time()
    _ = a @ a
    matmul_s = _t.time() - t0

    ctx = mp.get_context("spawn")
    work = 10_000_000  # ~1 s/worker: amortizes pool scheduling overhead
    with ctx.Pool(1) as pool:
        pool.map(_probe_burn, [1000])  # warm the worker
        t0 = _t.time()
        pool.map(_probe_burn, [work])
        t1 = _t.time() - t0
    with ctx.Pool(8) as pool:
        pool.map(_probe_burn, [1000] * 8)
        t0 = _t.time()
        pool.map(_probe_burn, [work] * 8)
        t8 = _t.time() - t0
    # the 8->32 ceiling: wall of 32 equal units on 32 procs vs 8 units on
    # 8 procs (perfect machine => equal walls). This is the no-Ray
    # denominator for the 8-vs-32 scaling criterion itself — any engine
    # ratio measured in the same window is bounded above by it.
    with ctx.Pool(32) as pool:
        pool.map(_probe_burn, [1000] * 32)
        t0 = _t.time()
        pool.map(_probe_burn, [work] * 32)
        t32 = _t.time() - t0
    return {
        "matmul_s": round(matmul_s, 3),
        "mp_1x_s": round(t1, 3),
        "mp_8x_s": round(t8, 3),
        "mp_32x_s": round(t32, 3),
        "mp_efficiency": round(t1 / t8, 3) if t8 > 0 else None,
        "mp_ceiling_8_32": round(t8 / t32, 3) if t32 > 0 else None,
    }


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from robokop_build_ray.functions.ray_utils import local_init_kwargs

    ray.init(address="local", num_cpus=num_cpus, ignore_reinit_error=True,
             logging_level="ERROR", **local_init_kwargs())
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # A/B knob (round-3 verdict #5): GRAFT_SHUFFLE_STRATEGY=hash swaps
    # every Dataset exchange (repartition / groupby) onto Ray's
    # hash-shuffle implementation so the bucketed pattern can be measured
    # under both strategies; unset = Ray's default sort shuffle, the
    # strategy every recorded perf finding was measured under
    shuffle = os.environ.get("GRAFT_SHUFFLE_STRATEGY")
    if shuffle:
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = {
            "hash": ShuffleStrategy.HASH_SHUFFLE,
            "sort_push": ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED,
        }[shuffle]
    from robokop_build_ray.functions.ray_utils import silence_empty_block_schema_warnings
    silence_empty_block_schema_warnings()

    from robokop_build_ray.sources.corpus import ensure_corpus, tier_of
    from robokop_build_ray.pipelines.kg_build import (
        build_graph, materialize_graph,
    )

    paths = ensure_corpus(sf_dir)  # untimed (deterministic input generation)
    import json as _json

    with open(os.path.join(os.path.dirname(paths["transcripts"]),
                           "_META.json")) as f:
        n_rows = _json.load(f)["n_turns"]
    for part in sorted(os.listdir(paths["transcripts"])):  # warm page cache
        with open(os.path.join(paths["transcripts"], part), "rb") as f:
            while f.read(1 << 24):
                pass

    # untimed warmup: spin up worker processes / code paths so the timed
    # region measures the pipeline, not cluster cold-start
    import ray.data as rd

    rd.range(num_cpus * 4).map_batches(lambda b: b).count()

    def one_run(tag: int):
        out_dir = f"/tmp/graft_bench_out.{os.getpid()}.{tag}"
        shutil.rmtree(out_dir, ignore_errors=True)
        ph: dict[str, float] = {}
        t_all = time.time()
        graph = build_graph(sf_dir, materialize_intermediate=True,
                            support_async=True, timings=ph)
        n_tr = graph["canonical"].count()
        t0 = time.time()
        man = materialize_graph(graph, out_dir, timings=ph)
        ph["materialize_outputs"] = round(time.time() - t0, 3)
        tot = round(time.time() - t_all, 3)
        shutil.rmtree(out_dir, ignore_errors=True)
        return tot, ph, man, n_tr

    # best of N runs in ONE session: first-run cold-start effects (worker
    # spawn, page cache) put single runs up to ±30% off; N=2 stabilizes
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    total, phases, manifests, n_triples = min(
        (one_run(i) for i in range(repeats)), key=lambda r: r[0]
    )
    # BASELINE headline gate: triple P/R vs the reference-semantics oracle
    # (exact-match join of canonical triples at smoke scale; untimed)
    import pyarrow.parquet as _pq

    from robokop_build_ray.gazetteer import build_entities
    from robokop_build_ray.oracle import OracleKG, extract as oracle_extract
    from robokop_build_ray.sources.corpus import N_ENTITIES

    smoke = ensure_corpus("sf0.001")
    ok = OracleKG(build_entities(N_ENTITIES))
    want = set(ok.canonical_triples(ok.link(
        oracle_extract(_pq.read_table(smoke["transcripts"])))))
    got_graph = build_graph("sf0.001", include_support=False)
    got = set(
        (r["conv_id"], r["turn_idx"], r["subj_id"], r["pred_id"], r["obj_id"])
        for r in got_graph["canonical"].take_all()
    )
    tp = len(got & want)
    precision = round(tp / max(1, len(got)), 6)
    recall = round(tp / max(1, len(want)), 6)

    result = {
        "metric": "kg_build_e2e_sec",
        "value": total,
        "host_probe": host_probe(),
        "triple_precision": precision,
        "triple_recall": recall,
        "unit": "sec",
        "queries": phases,
        "sf": float(tier_of(sf_dir).removeprefix("sf")),
        "num_cpus": num_cpus,
        **({"shuffle_strategy": shuffle} if shuffle else {}),
        "rows": n_rows,
        "triples": n_triples,
        "rows_per_sec": round(n_rows / total, 1),
        "triples_per_sec": round(n_triples / total, 1),
        "out_rows": {k: m["rows"] for k, m in manifests.items()},
    }
    ray.shutdown()
    return result


def run_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__) or ".", "bench.py")],
        env=env, capture_output=True, text=True,
    )
    if r.returncode != 0:
        # a failed window must say WHY (capture_output otherwise swallows
        # the subprocess traceback and the log records only exit status 1)
        sys.stderr.write(r.stderr[-4000:])
        raise RuntimeError(
            f"bench subprocess (num_cpus={ncpu}) exited {r.returncode}; "
            f"stderr tail above")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--scaling" in sys.argv:
        # bench.py already takes best-of-2 INSIDE each subprocess (wall-time
        # noise is additive: cold workers, page cache, writeback), so one
        # subprocess per level suffices for a stable efficiency ratio
        # levels overridable for N-vs-4N forensics on a contended host
        # (e.g. 4/16 isolates engine scaling from the full-machine
        # penalty); the recorded protocol default stays 8/32
        lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
        hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
        os.environ["GRAFT_BENCH_REPEATS"] = (
            "1" if "--quick" in sys.argv else "2"
        )
        # hi level first on fresh machine state, then a settle gap: the
        # second subprocess otherwise inherits writeback/cleanup from the
        # first, which distorts whichever level runs second
        r_hi = run_subprocess(hi)
        time.sleep(15)
        r_lo = run_subprocess(lo)
        thr_lo = r_lo["rows_per_sec"]
        thr_hi = r_hi["rows_per_sec"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        # machine-normalized: raw efficiency over the window's no-Ray
        # process-scaling ceiling (mp_ceiling_8_32) — what the ENGINE
        # loses beyond what the host itself loses at 4x procs
        ceils = [p.get("mp_ceiling_8_32")
                 for p in (r_lo.get("host_probe"), r_hi.get("host_probe"))
                 if p and p.get("mp_ceiling_8_32")]
        ceil = min(ceils) if ceils else None
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "machine_ceiling_8_32": ceil,
            "value_normalized": (round(eff / ceil, 3)
                                 if ceil and ceil > 0 else None),
            "unit": "ratio",
            "num_cpus_lo": lo, "num_cpus_hi": hi,
            "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
            "rows_per_sec_lo": thr_lo, "rows_per_sec_hi": thr_hi,
            "triples_per_sec_lo": r_lo["triples_per_sec"],
            "triples_per_sec_hi": r_hi["triples_per_sec"],
            "sf": r_hi["sf"], "rows": r_hi["rows"],
            # host-health annotations: a ratio measured on a degraded host
            # (matmul_s > ~2.5 or mp_efficiency < ~0.85) is not evidence
            # about the engine (BASELINE §2.6 forensics doctrine)
            "host_probe_lo": r_lo.get("host_probe"),
            "host_probe_hi": r_hi.get("host_probe"),
            # per-phase walls at both levels: the scaling story is per
            # phase, not just end-to-end (which phase stops scaling?)
            "queries_lo": r_lo.get("queries"),
            "queries_hi": r_hi.get("queries"),
        }))
        return
    print(json.dumps(run_bench()))


if __name__ == "__main__":
    main()
