"""Small Dataset helpers."""

from __future__ import annotations


def default_parallelism(minimum: int = 8) -> int:
    """Shuffle/join partition count sized to the cluster (never a hard-coded
    single-node constant): total cluster CPUs, floored at ``minimum``."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(minimum, cpus)


def silence_empty_block_schema_warnings() -> None:
    """Drop Ray's 'RefBundle with a different schema ... names=[]' warnings.

    Empty shuffle partitions (buckets with no keys) are emitted by Ray's
    sort-based groupby as ZERO-COLUMN blocks without calling user code —
    verified by instrumentation; our stages always return typed empties.
    The filter matches only the empty-schema variant, so genuine schema
    mismatches still warn."""
    import logging

    class _F(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            # two spellings of the same sort-emitted empty block: pandas
            # (zero-column PandasBlockSchema) and Arrow (schema prints as
            # nothing -> "new schema: ."); real mismatches still warn
            return ("PandasBlockSchema(names=[], types=[])" not in msg
                    and ", new schema: . This may lead" not in msg)

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_F())


def local_init_kwargs() -> dict:
    """Shared kwargs for every entry point that OWNS a Ray session
    (bench.py, cli.py, tests, drive_contract — never the library).

    The ``worker_process_setup_hook`` imports the package — installing the
    empty-block and schema-hash logging filters — in EVERY worker process,
    including pure read/shuffle workers that never deserialize a repo UDF
    (a ``ReadParquet`` task on pandas-written parquet hits the
    unhashable-schema warning before any user code runs, so the
    import-time install alone cannot reach it). The hook is a CLOSURE
    (cloudpickled by value) carrying the repo root: it executes before the
    worker can resolve repo modules, so a module-level hook function would
    itself fail to import."""
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    def _hook(_root=repo_root):
        import sys

        if _root not in sys.path:
            sys.path.insert(0, _root)
        import robokop_build_ray  # noqa: F401  (import side effect)

    return {
        "include_dashboard": False,
        "runtime_env": {"worker_process_setup_hook": _hook},
    }


def rename(ds, mapping: dict[str, str]):
    """Rename columns via an Arrow map_batches — unlike
    ``Dataset.rename_columns``, this works regardless of whether upstream
    blocks are pandas or Arrow (coercing them to Arrow)."""
    return ds.map_batches(
        lambda t: t.rename_columns([mapping.get(c, c) for c in t.column_names]),
        batch_format="pyarrow",
    )
