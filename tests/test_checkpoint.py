"""Checkpoint / resume: killed-run semantics at every stage boundary."""

import json
import os
import shutil

import pytest

from image_deduplication_3m_images_ray.config import DedupConfig

CFG = DedupConfig(signature_concurrency=2, join_num_buckets=4)

STAGES = [
    "docs",
    "exact_reps",
    "signatures",
    "candidate_pairs",
    "verified_pairs",
    "clusters",
    "report",
]


def _run(pages_table, root):
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    ds = ray.data.from_arrow(pages_table)
    rep = dedup_pipeline(ds, CFG, checkpoint_dir=root).to_pandas()
    return rep.sort_values(["url"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def ckpt_setup(ray_session, tiny_corpus, tmp_path_factory):
    pages, _ = tiny_corpus
    root = str(tmp_path_factory.mktemp("ckpt"))
    baseline = _run(pages, root)
    return pages, root, baseline


def test_all_manifests_written(ckpt_setup):
    _, root, _ = ckpt_setup
    for s in STAGES:
        m = json.load(open(os.path.join(root, s, "manifest.json")))
        assert m["config_hash"] == CFG.config_hash()
        assert m["total_rows"] == sum(p["rows"] for p in m["partitions"])
        assert m["total_rows"] > 0


def test_resume_is_noop_and_identical(ckpt_setup):
    pages, root, baseline = ckpt_setup
    mtimes = {
        s: os.path.getmtime(os.path.join(root, s, "manifest.json")) for s in STAGES
    }
    again = _run(pages, root)
    # nothing recomputed
    for s in STAGES:
        assert os.path.getmtime(os.path.join(root, s, "manifest.json")) == mtimes[s]
    assert baseline.equals(again)


def test_kill_mid_stage_recomputes_only_that_stage(ckpt_setup):
    pages, root, baseline = ckpt_setup
    # simulate a crash during the verify stage: data present, no manifest
    vdir = os.path.join(root, "verified_pairs")
    os.remove(os.path.join(vdir, "manifest.json"))
    early = {
        s: os.path.getmtime(os.path.join(root, s, "manifest.json"))
        for s in ["docs", "exact_reps", "signatures", "candidate_pairs"]
    }
    again = _run(pages, root)
    for s, t in early.items():
        assert os.path.getmtime(os.path.join(root, s, "manifest.json")) == t
    assert baseline.equals(again)


def test_config_change_invalidates(ckpt_setup, tmp_path_factory):
    pages, root, baseline = ckpt_setup
    other = DedupConfig(signature_concurrency=2, join_num_buckets=4, jaccard_threshold=0.8)
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    # a different config hash must not reuse the stale checkpoints
    ds = ray.data.from_arrow(pages)
    rep = dedup_pipeline(ds, other, checkpoint_dir=root).to_pandas()
    m = json.load(open(os.path.join(root, "docs", "manifest.json")))
    assert m["config_hash"] == other.config_hash()
    assert len(rep) == len(baseline)
