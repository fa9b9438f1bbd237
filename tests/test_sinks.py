"""Partitioned report sink + mid-loop cluster checkpoint resume."""

import os

import numpy as np
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.config import DedupConfig


def test_write_report_partitioned(ray_session, tiny_corpus, tmp_path):
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.sources.report_sink import write_report

    pages, _ = tiny_corpus
    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    report = dedup_pipeline(ray.data.from_arrow(pages), cfg)
    out = str(tmp_path / "report")
    counts = write_report(report, out)
    assert sum(counts.values()) == len(pages)
    assert counts["Best"] > 0 and counts["Unique"] > 0
    # each partition readable on its own and contains only its status
    best = ray.data.read_parquet(os.path.join(out, "status=Best")).to_pandas()
    assert set(best["status"]) == {"Best"}
    assert len(best) == counts["Best"]


def test_cluster_round_checkpoint_resume(ray_session, tmp_path):
    """Killing the propagation loop mid-way and resuming yields identical labels."""
    import ray.data
    from image_deduplication_3m_images_ray.stages.cluster import cluster_stage

    # chain graph forces multiple propagation rounds on the distributed path
    edges = [(i, i + 1) for i in range(30)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([e[0] for e in edges], pa.uint64()),
                "doc_b": pa.array([e[1] for e in edges], pa.uint64()),
            }
        )
    )
    cfg = DedupConfig(join_num_buckets=2, cluster_driver_max_edges=0)

    full_dir = str(tmp_path / "full")
    full = cluster_stage(ds, cfg, round_checkpoint_dir=full_dir).to_pandas()
    rounds_done = sorted(f for f in os.listdir(full_dir) if f.endswith(".done"))
    assert len(rounds_done) >= 2

    # simulate a crash: keep only the first completed round, resume
    resume_dir = str(tmp_path / "resume")
    os.makedirs(resume_dir)
    import shutil

    shutil.copytree(os.path.join(full_dir, "round_0"), os.path.join(resume_dir, "round_0"))
    shutil.copy(os.path.join(full_dir, "round_0.done"), os.path.join(resume_dir, "round_0.done"))
    resumed = cluster_stage(ds, cfg, round_checkpoint_dir=resume_dir).to_pandas()

    a = full.sort_values("doc_id").reset_index(drop=True)
    b = resumed.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert set(b["cluster_id"]) == {0}


def test_write_report_csv(ray_session, tiny_corpus, tmp_path):
    import csv

    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.sources.report_sink import (
        REPORT_COLUMNS,
        write_report_csv,
    )

    pages, _ = tiny_corpus
    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    report = dedup_pipeline(ray.data.from_arrow(pages), cfg).materialize()
    out = str(tmp_path / "image_report.csv")
    n = write_report_csv(report, out)
    assert n == len(pages)
    with open(out, newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0] == REPORT_COLUMNS
    assert len(rows) == n + 1
    # csv content matches the report row-for-row (same sorted order)
    df = report.to_pandas()
    assert [r[0] for r in rows[1:]] == list(df["url"])
    assert [r[5] for r in rows[1:]] == list(df["status"])


def test_read_documents_formats_agree(ray_session, tmp_path):
    """CSV and JSONL reads must yield the same rows as the Parquet read."""
    import pandas as pd

    from image_deduplication_3m_images_ray.sources import read_documents

    df = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": ["alpha beta", "gamma", "delta", "eps", "zeta", "eta"],
            "lang": ["en", "en", "de", "en", "fr", "de"],
        }
    )
    pq = str(tmp_path / "d.parquet")
    csv = str(tmp_path / "d.csv")
    jl = str(tmp_path / "d.jsonl")
    pa.parquet.write_table(pa.Table.from_pandas(df), pq)
    df.to_csv(csv, index=False)
    df.to_json(jl, orient="records", lines=True)

    def load(fmt, path):
        return (
            read_documents(path, format=fmt, columns=["doc_id", "text"], lang="en")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    base = load("parquet", pq)
    assert list(base["doc_id"]) == [0, 1, 3]
    assert list(base.columns) == ["doc_id", "text"]
    for fmt, path in (("csv", csv), ("jsonl", jl)):
        got = load(fmt, path)
        assert got.equals(base), fmt

    with pytest.raises(ValueError):
        read_documents(pq, format="xml")
