"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a sidecar metadata
struct, processed by actor-pool ``map_batches`` stages.  The decode kernels
themselves are STUBBED (no image/audio libs in this container — the task brief
mandates a clearly-marked stub): ``DecodeActor`` raises ``NotImplementedError``
unless constructed with ``fake=True``, in which case it produces a
deterministic fake decode derived from the payload hash.  Everything around
the kernel — schema, batch sizing for large binaries, actor signature, output
layout — is real and tested.

Reference analog: image decode + preprocess
(/root/reference/modules/feature_extraction.py:41-74) and the GPU actor pool
(/root/reference/modules/distributed_processor.py:11-136).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import U64, splitmix64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown / n-a
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)


def _payload_hashes(payloads: list) -> np.ndarray:
    import pandas as _pd

    arr = np.asarray([p if p is not None else b"" for p in payloads], dtype=object)
    return splitmix64(_pd.util.hash_array(arr).astype(U64))


class DecodeActor:
    """bytes -> decoded features. STUB: real decode needs cv2/PIL/librosa.

    ``fake=True`` produces a deterministic stand-in (hash-derived pseudo
    dimensions + a 16-d pseudo feature vector) so the Ray plumbing — actor
    pool, batch size for MB-scale binaries, schema — is fully testable.
    """

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires an image/audio library not present in "
                "this environment; construct DecodeActor(fake=True) for the "
                "deterministic test double"
            )
        payloads = batch["payload"].to_pylist()
        h = _payload_hashes(payloads)
        sizes = np.asarray([len(p) if p else 0 for p in payloads], dtype=np.int64)
        width = (h % U64(1920)).astype(np.int32) + 1
        height = (splitmix64(h) % U64(1080)).astype(np.int32) + 1
        # 16-d pseudo feature: splitmix chain scaled to [0, 1)
        feats = np.empty((len(h), 16), dtype=np.float64)
        x = h.copy()
        for i in range(16):
            x = splitmix64(x)
            feats[:, i] = x / np.float64(2**64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array(sizes, pa.int64()),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float64()), 16
                ).cast(pa.list_(pa.float64())),
            }
        )


def decode_stage(
    media: Dataset, fake: bool = False, concurrency: int = 2, batch_size: int = 32
) -> Dataset:
    """Actor-pool decode over binary payloads.

    ``batch_size`` is deliberately small: with MB-scale binaries the batch x
    concurrency product must fit each worker's heap (task-brief memory rule).
    """
    return media.map_batches(
        DecodeActor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        zero_copy_batch=True,
    )


def frame_sample_stage(media: Dataset, every_ms: int = 1000, batch_size: int = 8) -> Dataset:
    """Video -> frame-reference rows (timestamp plan only; decode is stubbed).

    Emits one row per planned frame sample based on ``duration_ms`` — the
    flat_map-shaped layout a real frame extractor would fill with pixels.
    """

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["media_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        dur = np.asarray(t["duration_ms"].to_numpy(zero_copy_only=False), dtype=np.int64)
        counts = np.maximum(dur // every_ms, 0)
        rep_ids = np.repeat(ids, counts)
        offs = np.concatenate([np.arange(c) * every_ms for c in counts]) if counts.sum() else np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "media_id": pa.array(rep_ids, pa.int64()),
                "frame_ts_ms": pa.array(offs, pa.int64()),
            }
        )

    video = media.map_batches(
        lambda t: t.filter(pa.compute.equal(t["kind"], "video")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return video.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def make_fake_media(n: int, seed: int = 42):
    """Deterministic fake media table for tests (binary payloads of mixed size)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(int(rng.integers(100, 5000))) for _ in range(n)],
        "mime": ["application/octet-stream"] * n,
        "width": [-1] * n,
        "height": [-1] * n,
        "duration_ms": [int(rng.integers(0, 10_000)) if i % 3 == 2 else 0 for i in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)
