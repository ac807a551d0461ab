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


def rename(ds, mapping: dict[str, str]):
    """Rename columns via an Arrow map_batches — unlike
    ``Dataset.rename_columns``, this works regardless of whether upstream
    blocks are pandas or Arrow (coercing them to Arrow)."""
    return ds.map_batches(
        lambda t: t.rename_columns([mapping.get(c, c) for c in t.column_names]),
        batch_format="pyarrow",
    )
