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

from ..functions.hashing import U64

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
        from ..functions.hashing import md5_u64

        payloads = batch["payload"].to_pylist()
        # md5-anchored fake decode: every derived value is a pure function of
        # the payload bytes that DuckDB can recompute (md5_number_lower), so
        # the stub is oracle-checkable end to end
        h = md5_u64(payloads)
        sizes = np.asarray([len(p) if p else 0 for p in payloads], dtype=np.int64)
        width = (h % U64(1920)).astype(np.int32) + 1
        height = ((h >> U64(32)) % U64(1080)).astype(np.int32) + 1
        # 16-d pseudo feature: nibbles of the checksum scaled to [0, 1]
        nibbles = (h[:, None] >> (np.arange(16, dtype=U64) * U64(4))) & U64(0xF)
        feats = nibbles.astype(np.float64) / 15.0
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload_bytes": pa.array(sizes, pa.int64()),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "checksum": pa.array(h, pa.uint64()),
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
        from ..functions.hashing import _ranges

        ids = np.asarray(t["media_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        dur = np.asarray(t["duration_ms"].to_numpy(zero_copy_only=False), dtype=np.int64)
        counts = np.maximum(dur // every_ms, 0)
        rep_ids = np.repeat(ids, counts)
        offs = _ranges(counts[counts > 0]) * every_ms
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


def resize_plan_stage(decoded: Dataset, max_side: int = 256, batch_size: int = 1024) -> Dataset:
    """Decoded dims -> integer resize plan (fit within ``max_side``, aspect
    preserved, floor division, never below 1 px).

    The arithmetic stage a real resizer (cv2.resize / PIL thumbnail) would
    execute; here only the PLAN is computed (pixel kernels are behind the
    decode stub), entirely in integer ops so the SQL oracle reproduces it
    exactly.  Reference analog: the preprocess resize
    (/root/reference/modules/feature_extraction.py:41-74).
    """

    def fn(t: pa.Table) -> pa.Table:
        w = np.asarray(t["width"].to_numpy(zero_copy_only=False), dtype=np.int64)
        h = np.asarray(t["height"].to_numpy(zero_copy_only=False), dtype=np.int64)
        g = np.maximum(w, h)
        need = g > max_side
        safe_g = np.maximum(g, 1)
        ow = np.where(need, np.maximum(1, (w * max_side) // safe_g), w)
        oh = np.where(need, np.maximum(1, (h * max_side) // safe_g), h)
        return t.append_column("out_width", pa.array(ow.astype(np.int32), pa.int32())).append_column(
            "out_height", pa.array(oh.astype(np.int32), pa.int32())
        )

    return decoded.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


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


def media_from_documents(docs: Dataset) -> Dataset:
    """Adapt a documents table into the media shape (payload = utf-8 text bytes).

    Gives the decode stage a deterministic, oracle-visible input: every field
    is a pure function of (doc_id, text), so the DuckDB side can rebuild the
    same media table from the ``documents`` view and check the fake decode
    end to end.  Kind cycles image/audio/video by ``doc_id % 3``.
    """
    kinds = np.array(["image", "audio", "video"], dtype=object)
    mimes = np.array(["image/jpeg", "audio/wav", "video/mp4"], dtype=object)

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        k = (ids % 3).astype(np.int64)
        nc = pa.compute.binary_length(pa.compute.cast(t["text"], pa.binary())).cast(pa.int64())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds[k], pa.string()),
                "payload": pa.compute.cast(t["text"], pa.binary()),
                "mime": pa.array(mimes[k], pa.string()),
                "width": pa.array(np.full(len(ids), -1, np.int32), pa.int32()),
                "height": pa.array(np.full(len(ids), -1, np.int32), pa.int32()),
                # video rows report a pseudo duration of 1 ms per byte
                "duration_ms": pa.compute.if_else(
                    pa.array(k == 2), nc, pa.array(np.zeros(len(ids), np.int64), pa.int64())
                ),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def payload_feature_stage(media: Dataset, batch_size: int = 256) -> Dataset:
    """Binary-payload feature extraction — the one multimodal kernel that
    needs NO decode library, so it ships real (not stubbed): a 256-bin byte
    histogram per payload plus size and Shannon byte entropy.

    Reference analog: the cheap color-statistics features used as the K6
    verification gate (/root/reference/modules/deduplication.py:711-734) —
    byte histograms fill the same role for opaque payloads (compared by
    cosine, they feed ``embedding_cosine_pairs``/``kmeans`` directly via the
    ``hist`` column renamed to ``embedding``).

    Fully vectorized: the Arrow binary column's data buffer is viewed as one
    flat uint8 array; per-row bincounts come from ONE ``np.add.at`` over
    (row_segment, byte_value) — no per-row Python.

    Output: (media_id, kind, n_bytes int64, byte_entropy float64,
    hist list<float64>[256], normalized to sum 1; all-zero for empty
    payloads).
    """

    def fn(t: pa.Table) -> pa.Table:
        pay = t["payload"]
        if isinstance(pay, pa.ChunkedArray):
            pay = pay.combine_chunks()
        if pay.type == pa.large_binary():
            pay = pay.cast(pa.binary())
        if pay.null_count:
            # the raw-buffer view below would silently histogram whatever
            # bytes sit under a null slot — refuse instead (ADVICE r4)
            raise ValueError(
                "payload_feature_stage: null payloads are not supported; "
                "fill or drop null rows first"
            )
        n = len(pay)
        lens = np.asarray(
            pa.compute.binary_length(pay).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        # zero-copy view of the packed payload bytes (nulls rejected above —
        # a null slot's data range is undefined in the values buffer)
        buf = pay.buffers()[2]
        offs = np.frombuffer(pay.buffers()[1], dtype=np.int32)[
            pay.offset : pay.offset + n + 1
        ]
        flat = np.frombuffer(buf, dtype=np.uint8)[offs[0] : offs[-1]]
        seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        hist = np.zeros((n, 256), dtype=np.float64)
        np.add.at(hist, (seg, flat.astype(np.int64)), 1.0)
        total = np.maximum(hist.sum(axis=1, keepdims=True), 1.0)
        p = hist / total
        with np.errstate(divide="ignore", invalid="ignore"):
            ent = -np.where(p > 0, p * np.log2(p), 0.0).sum(axis=1)
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "n_bytes": pa.array(lens, pa.int64()),
                "byte_entropy": pa.array(ent, pa.float64()),
                "hist": pa.array(list(p), pa.list_(pa.float64())),
            }
        )

    return media.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
