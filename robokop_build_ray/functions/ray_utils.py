"""Small Dataset helpers."""

from __future__ import annotations


def rename(ds, mapping: dict[str, str]):
    """Rename columns via an Arrow map_batches — unlike
    ``Dataset.rename_columns``, this works regardless of whether upstream
    blocks are pandas or Arrow (coercing them to Arrow)."""
    return ds.map_batches(
        lambda t: t.rename_columns([mapping.get(c, c) for c in t.column_names]),
        batch_format="pyarrow",
    )
