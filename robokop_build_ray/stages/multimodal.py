"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio decode libraries are not available in this environment, so the
DECODE KERNELS ARE STUBS (deterministic fakes / NotImplementedError), but the
Ray-side plumbing is real and tested: schema, actor-pool signature, small
batch sizes for wide binary rows, and output layout.

Pattern: payloads stay ``binary`` end-to-end (Arrow batches, never pandas
object columns); per-item work happens in an actor pool whose model handle
is created once in ``__init__``; ``batch_size`` is kept small so
batch x concurrency fits worker heaps (SURVEY §4.2 memory note).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown / not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=64 + i % 128, dtype=np.uint8).tobytes()
                for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(
                [{"image": "image/png", "audio": "audio/wav",
                  "video": "video/mp4"}[kinds[i % 3]] for i in range(n)]
            ),
            "width": pa.array([64 if i % 3 == 0 else -1 for i in range(n)], pa.int32()),
            "height": pa.array([48 if i % 3 == 0 else -1 for i in range(n)], pa.int32()),
            "duration_ms": pa.array(
                [-1 if i % 3 == 0 else 1000 + i for i in range(n)], pa.int32()
            ),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool decode/feature stage.

    Real deployments load the codec/model here ONCE (``__init__``); this
    sandbox has no image/audio libs, so decode is a clearly-marked stub:
    ``strict=True`` raises NotImplementedError, else a deterministic fake
    feature (blake2b of payload -> FEATURE_DIM floats) keeps the plumbing
    testable end-to-end.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _fake_feature(self, payload: bytes) -> list[float]:
        d = hashlib.blake2b(payload, digest_size=2 * FEATURE_DIM).digest()
        return (np.frombuffer(d, dtype=np.uint16).astype(np.float32)
                / 65535.0).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "environment; run with strict=False for the deterministic stub"
            )
        feats = [self._fake_feature(p.as_py()) for p in batch["payload"]]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "n_bytes": pa.array(
                    [len(p.as_py()) for p in batch["payload"]], pa.int64()
                ),
                "feature": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


class FrameSampler:
    """Video frame-sampling plumbing (flat-map shape: one row in, N frame
    rows out). The actual codec is STUBBED (deterministic byte slices of the
    payload stand in for decoded frames); the Ray-side contract — binary in,
    multiple binary rows out, frame_idx column, small batches — is real."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idxs, frames = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "video":
                continue
            step = max(1, len(payload) // self.n_frames)
            for k in range(self.n_frames):
                media_ids.append(mid)
                frame_idxs.append(k)
                frames.append(payload[k * step : (k + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(media_ids, pa.int64()),
                "frame_idx": pa.array(frame_idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(media, n_frames: int = 4, batch_size: int = 32,
                  concurrency=(1, 2)):
    return media.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_features(media, batch_size: int = 64, concurrency=(1, 2),
                    strict: bool = False):
    """Small batches on purpose: payload bytes x batch x concurrency must fit
    the worker heap; the object store spills the rest."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
