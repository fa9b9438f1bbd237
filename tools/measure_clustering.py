"""Scale-evidence tool for the seventh-pass operators (BASELINE.md).

Times full-data Lloyd's k-means on a 200k x 64-d synthetic embedding table
(k=64, 5 iterations) and bpe_train (8 merges) on the 20k-page bench corpus.

Usage: python tools/measure_clustering.py [num_cpus]
Run at two CPU counts in fresh processes to see the latency-bound floor.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from image_deduplication_3m_images_ray.extras.bpe import bpe_train, word_vocab
    from image_deduplication_3m_images_ray.extras.clustering import kmeans
    from image_deduplication_3m_images_ray.fixtures import write_corpus

    path = "/tmp/kmeans_bench_emb.parquet"
    if not os.path.exists(path):
        rng = np.random.default_rng(42)
        n, d = 200_000, 64
        rows = rng.normal(size=(n, d)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(rows.reshape(-1)), d
                    ).cast(pa.list_(pa.float32())),
                }
            ),
            path,
        )

    ds = ray.data.read_parquet(path, override_num_blocks=cpus * 2).materialize()
    n_rows = ds.count()
    t0 = time.time()
    kmeans(ds, k=64, n_iter=5, batch_size=8192).count()
    km_sec = round(time.time() - t0, 2)

    bench_dir = "/tmp/graft_bench_corpus_20000_s4_42"
    bench_pages = os.path.join(bench_dir, "pages.parquet")
    if not os.path.exists(bench_pages):
        write_corpus(bench_dir, 20000, seed=42, doc_scale=4)
    docs = ray.data.read_parquet(bench_pages, override_num_blocks=cpus * 2)
    docs.count()
    t0 = time.time()
    bpe_train(docs, n_merges=8, text_col="text")
    bpe_sec = round(time.time() - t0, 2)
    vocab = word_vocab(docs, text_col="text").count()

    print(
        json.dumps(
            {
                "num_cpus": cpus,
                "kmeans_rows": n_rows,
                "kmeans_k64_iter5_sec": km_sec,
                "kmeans_row_assignments_per_sec": round(n_rows * 5 / km_sec),
                "bpe_8merges_sec": bpe_sec,
                "vocab_words": vocab,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
