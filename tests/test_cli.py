"""CLI run driver: ``python -m image_deduplication_3m_images_ray dedup`` (reference main.py parity)."""

import json
import os
import subprocess
import sys


def test_cli_dedup_end_to_end(tmp_path):
    """Subprocess owns its own Ray session (the CLI is a script entry point);
    checks status-partitioned report + CSV + progress JSON."""
    from image_deduplication_3m_images_ray.fixtures import write_corpus

    corpus = tmp_path / "corpus"
    pages_path, _ = write_corpus(str(corpus), 120, seed=7)
    out = tmp_path / "report"
    csv = tmp_path / "report.csv"
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "image_deduplication_3m_images_ray",
            "dedup",
            "--input",
            pages_path,
            "--output",
            str(out),
            "--csv",
            str(csv),
            "--num-cpus",
            "4",
            "--progress",
            "--signature-concurrency",
            "2",
            "--join-num-buckets",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    counts = result["rows_per_status"]
    assert sum(counts.values()) == 120
    assert counts["Best"] > 0 and counts["Duplicate"] > 0
    assert result["csv_rows"] == 120
    # status-partitioned layout on disk
    assert os.path.isdir(out / "status=Best")
    # per-stage progress JSON lines on stderr
    stages = [
        json.loads(l)["stage"]
        for l in proc.stderr.splitlines()
        if l.startswith('{"stage"')
    ]
    assert "signatures" in stages and "verified_pairs" in stages
    # CSV header + rows
    with open(csv) as f:
        header = f.readline().strip().split(",")
    assert header == ["url", "doc_id", "cluster_id", "cluster_size", "quality", "status"]
