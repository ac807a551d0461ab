"""CLI entry point (S1/S2 analog of `builder/builder.py:564-603` ``main``).

    python -m robokop_build_ray.cli build \
        --sf-dir /root/testdata/sf0.001 --out /tmp/graph \
        -s cooccur -s phrase_sim [--checkpoint /tmp/ckpt] [--num-cpus 8]

Owns the Ray session (guarded init, shutdown on exit) — the only places
allowed to: this CLI, bench.py, and the pytest fixture.
"""

from __future__ import annotations

import argparse
import json
import sys


def _analyze(args) -> int:
    import ray.data as rd

    from .stages import graph_metrics as gm

    edges = rd.read_parquet(f"{args.graph}/edges")
    if args.metric == "components":
        from .stages.components import connected_components

        res = connected_components(
            edges.select_columns(["subj_id", "obj_id"]),
            col_a="subj_id", col_b="obj_id")
    elif args.metric == "pagerank":
        from .stages.pagerank import pagerank

        res = pagerank(edges)
    elif args.metric == "degree":
        res = gm.degree_topk(edges, k=args.k or 20)
    elif args.metric == "triangles":
        res = gm.triangles_per_node(edges)
    elif args.metric == "jaccard":
        res = gm.neighbor_jaccard_topk(edges, k=args.k or 50)
    elif args.metric == "kcore":
        res = gm.kcore(edges, k=args.k or gm.KCORE_K)
    elif args.metric == "labelprop":
        res = gm.label_propagation(edges)
    elif args.metric == "clustering":
        res = gm.clustering_coefficient(edges)
    elif args.metric == "harmonic":
        res = gm.harmonic_centrality(edges, n_seeds=args.k
                                     or gm.HARMONIC_SEEDS)
    elif args.metric == "assortativity":
        res = gm.degree_assortativity(edges)
    elif args.metric == "ktruss":
        res = gm.ktruss(edges, k=args.k or gm.KTRUSS_K)
    elif args.metric == "stress":
        res = gm.stress_centrality(edges, n_seeds=args.k
                                   or gm.STRESS_SEEDS)
    elif args.metric == "ra":
        res = gm.resource_allocation_topk(edges, k=args.k or 50)
    elif args.metric == "bridges":
        res = gm.local_bridges(edges)
    elif args.metric == "hits":
        from .stages.pagerank import hits

        res = hits(edges)
    elif args.metric == "ppr":
        from .stages.pagerank import PPR_SEEDS, personalized_pagerank

        res = personalized_pagerank(edges, n_seeds=args.k or PPR_SEEDS)
    elif args.metric == "mis":
        res = gm.maximal_independent_set(edges)
    elif args.metric == "scc":
        res = gm.scc_labels(edges)
    elif args.metric == "reciprocity":
        res = gm.reciprocity(edges)
    elif args.metric == "inoutdeg":
        res = gm.in_out_degree(edges)
    elif args.metric == "deghist":
        res = gm.degree_histogram(edges)
    elif args.metric == "community":
        res = gm.community_stats(edges)
    else:  # metapath2
        import pandas as pd

        gaz = pd.read_parquet(args.gazetteer)
        tm = dict(zip(gaz["curie"], gaz["node_type"]))
        res = gm.metapath_2hop(edges, tm, args.type_a, args.type_b)
    if args.out:
        res.write_parquet(args.out)
        res = rd.read_parquet(args.out)
    print(json.dumps({"metric": args.metric, "rows": res.count()}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="robokop-build-ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build", help="run the 5-stage KG build")
    b.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                   help="scale-tier directory (selects the transcript corpus)")
    b.add_argument("--transcripts", default=None,
                   help="explicit transcripts parquet path (overrides tier)")
    b.add_argument("--out", required=True, help="output graph directory")
    b.add_argument("--checkpoint", default=None,
                   help="stage-checkpoint directory (resumable)")
    b.add_argument("-s", "--support", action="append", default=None,
                   help="supporter module name (repeatable; default cooccur); "
                        "see stages.supporters.SUPPORTERS")
    b.add_argument("--num-cpus", type=int, default=None)
    b.add_argument("--address", default="local",
                   help="'local' (default) starts a local Ray; 'auto' "
                        "connects to an existing cluster — the `ray job "
                        "submit` path on a real multi-node deployment")
    b.add_argument("--batch-size", type=int, default=8192)
    b.add_argument("--cap", type=int, default=256,
                   help="max distinct entities per conversation for pair gen")
    b.add_argument("--path", default=None,
                   help="Path-DSL scope, e.g. 'SD' or 'S(1-2)D' "
                        "(codes: S=chemical G=gene P=process C=cell "
                        "A=anatomy T=phenotype D=disease X=genetic_condition "
                        "W=drug_class ?=any); filters triples to adjacent "
                        "step type pairs")
    b.add_argument("--contexts", action="store_true",
                   help="with --path: export nodes with a contexts "
                        "list<int32> column of the DSL positions each "
                        "node realizes on complete path instances "
                        "(builder.py:381,396 node.contexts analog)")
    b.add_argument("--start", default=None,
                   help="anchor entity NAME (reference --start, "
                        "`builder/builder.py:574-602`): resolved to a "
                        "CURIE via the lookup dispatch; with --path, "
                        "triples are kept only within the path's edge "
                        "budget of the anchor")
    b.add_argument("--end", default=None,
                   help="optional second anchor NAME (reference --end); "
                        "kept triples must be reachable from BOTH anchors")
    b.add_argument("-q", "--question", type=int, choices=[1, 2, 3],
                   default=None,
                   help="canned-question shortcut (1=Disease/GeneticCondition"
                        " DGX, 2=COP SGPCATD, 3=COP-to-Phenotype SGPCAT; "
                        "`builder/builder.py:574-602`); cannot combine with "
                        "--path")
    a = sub.add_parser(
        "analyze",
        help="graph analytics over a built graph (the neo4j-side queries "
             "the reference defers to its sink, run engine-native)")
    a.add_argument("--graph", required=True,
                   help="graph directory produced by `build --out` "
                        "(reads <graph>/edges/)")
    a.add_argument("--metric", required=True,
                   choices=["components", "pagerank", "degree", "triangles",
                            "jaccard", "metapath2", "kcore", "labelprop",
                            "clustering", "harmonic", "assortativity",
                            "ktruss", "stress", "ra", "bridges", "hits",
                            "ppr", "mis", "scc", "reciprocity", "inoutdeg",
                            "deghist", "community"])
    a.add_argument("--out", default=None,
                   help="write result parquet here (else just print counts)")
    a.add_argument("--gazetteer", default=None,
                   help="gazetteer parquet with curie/node_type "
                        "(required for metapath2)")
    a.add_argument("--type-a", default="chemical_substance")
    a.add_argument("--type-b", default="disease")
    a.add_argument("--k", type=int, default=None,
                   help="top-k (degree/jaccard) or core k (kcore)")
    a.add_argument("--num-cpus", type=int, default=None)
    a.add_argument("--address", default="local",
                   help="'local' or 'auto' (existing cluster)")
    args = p.parse_args(argv)

    if args.cmd == "build":
        if args.question is not None and args.path is not None:
            p.error("cannot specify both --question and --path")
        if args.question is not None:
            args.path = {1: "DGX", 2: "SGPCATD", 3: "SGPCAT"}[args.question]
        if args.start is None and args.end is not None:
            p.error("--end requires --start")
        if args.start is not None and args.path is None:
            p.error("--start requires --path or --question (the anchor's "
                    "hop budget comes from the path)")
    elif args.metric == "metapath2" and not args.gazetteer:
        p.error("--metric metapath2 requires --gazetteer")

    import ray

    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        if getattr(args, "address", "local") != "local":
            kw.pop("num_cpus", None)  # cluster resources are the cluster's
        from .functions.ray_utils import local_init_kwargs

        ray.init(address=getattr(args, "address", "local"),
                 logging_level="ERROR", **kw, **local_init_kwargs())
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .functions.ray_utils import silence_empty_block_schema_warnings
    silence_empty_block_schema_warnings()

    if args.cmd == "analyze":
        rc = _analyze(args)
        ray.shutdown()
        return rc

    from .pipelines.kg_build import build_graph, materialize_graph, run_supporters

    supports = args.support or ["cooccur"]
    graph = build_graph(
        args.sf_dir,
        checkpoint_dir=args.checkpoint,
        batch_size=args.batch_size,
        max_entities_per_conv=args.cap,
        transcripts_path=args.transcripts,
        materialize_intermediate=True,
        include_support="cooccur" in supports,
        # overlap the support exchange with the node/edge writes (the
        # support job in materialize_graph blocks on the future)
        support_async=args.checkpoint is None,
        path=args.path,
        start=args.start,
        end=args.end,
    )
    extra = [s for s in supports if s != "cooccur"]
    if extra:
        graph["extra_supports"] = run_supporters(graph, extra, args.cap)
    if args.contexts:
        if args.path is None:
            raise SystemExit("--contexts requires --path (contexts are "
                             "positions of the ACTIVE path query)")
        from .pipelines.kg_build import nodes_with_contexts

        graph["node_decorator"] = lambda nodes: nodes_with_contexts(
            nodes, graph["canonical"], args.path,
            graph["state"].nodeinfo_ref)
    manifests = materialize_graph(graph, args.out)
    print(json.dumps({k: m["rows"] for k, m in manifests.items()}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
