"""A/B the pandas-container shard reducers against Arrow-native variants.

Evidence tool for the round-5 item "measured pass over the pandas-format
shards" (VERDICT round 4, task 8: segment_dedup rebuild, exactsubstr
rebuild, asof_join shard).  Each operator runs over a deterministic
synthetic input sized so the shard stage dominates; print wall time per
operator per implementation.  Adopt only what an isolated A/B wins.

Usage: python tools/measure_shard_formats.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    rng = np.random.default_rng(11)
    words = np.array([f"w{i:04d}" for i in range(5000)], dtype=object)
    # ~60-token docs with planted repeated 10-token runs for segment/substr hits
    texts = []
    stock = " ".join(words[rng.integers(0, 5000, 10)])
    for i in range(n_docs):
        body = " ".join(words[rng.integers(0, 5000, 50)])
        texts.append(body + " " + stock if i % 5 == 0 else body)
    docs_tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    docs = rd.from_arrow(docs_tbl).repartition(num_cpus * 2).materialize()

    out = {"n_docs": n_docs, "num_cpus": num_cpus}

    from image_deduplication_3m_images_ray.extras.dedup_ops import segment_dedup
    t0 = time.time()
    r1 = segment_dedup(docs, seg_tokens=10).materialize()
    out["segment_dedup_sec"] = round(time.time() - t0, 2)
    out["segment_dedup_rows"] = r1.count()

    from image_deduplication_3m_images_ray.extras.exactsubstr import exact_substring_dedup
    t0 = time.time()
    r2 = exact_substring_dedup(docs, k=10, plan="sharded").materialize()
    out["exactsubstr_sharded_sec"] = round(time.time() - t0, 2)
    out["exactsubstr_rows"] = r2.count()

    # asof_join over synthetic event streams
    n_ev = n_docs
    from image_deduplication_3m_images_ray.extras.windows import asof_join_latest
    ts = np.sort(rng.integers(0, 10_000_000, n_ev)).astype("datetime64[us]")
    keys = rng.integers(0, 500, n_ev).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "user_id": pa.array(keys, pa.int64()),
        "ts": pa.array(ts),
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64), pa.int64()),
    })).repartition(num_cpus * 2).materialize()
    right = rd.from_arrow(pa.table({
        "user_id": pa.array(rng.integers(0, 500, n_ev // 2).astype(np.int64), pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 10_000_000, n_ev // 2)).astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n_ev // 2, dtype=np.int64), pa.int64()),
        "price": pa.array(rng.random(n_ev // 2), pa.float64()),
    })).repartition(num_cpus * 2).materialize()
    t0 = time.time()
    r3 = asof_join_latest(left, right, by="user_id", payload={"price": "price"}).materialize()
    out["asof_join_sec"] = round(time.time() - t0, 2)
    out["asof_rows"] = r3.count()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
