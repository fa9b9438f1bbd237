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


def test_partial_partition_resume(ckpt_setup, tmp_path_factory):
    """North rule: per-partition lineage — a killed partitioned stage resumes
    by recomputing ONLY the missing partitions; survivors are not rewritten
    and recreated files are byte-identical to an uninterrupted run's."""
    pages, _, _ = ckpt_setup
    root = str(tmp_path_factory.mktemp("ckpt_part"))
    first = _run(pages, root)
    sdir = os.path.join(root, "signatures")
    data = os.path.join(sdir, "data")
    files = sorted(os.listdir(data))
    assert files and all(f.startswith("part-") and f.endswith(".parquet") for f in files)
    assert len(files) == CFG.num_output_partitions
    # simulate a crash mid-stage: manifest missing, two partitions unwritten
    os.remove(os.path.join(sdir, "manifest.json"))
    removed = files[:2]
    orig_bytes = {}
    for f in removed:
        with open(os.path.join(data, f), "rb") as fh:
            orig_bytes[f] = fh.read()
        os.remove(os.path.join(data, f))
    survivors = {f: os.path.getmtime(os.path.join(data, f)) for f in files[2:]}
    again = _run(pages, root)
    for f, t in survivors.items():
        assert os.path.getmtime(os.path.join(data, f)) == t, f"{f} was rewritten"
    for f in removed:
        with open(os.path.join(data, f), "rb") as fh:
            assert fh.read() == orig_bytes[f], f"{f} not byte-identical after resume"
    assert first.equals(again)


def test_partial_stale_lineage_wipes(ckpt_setup, tmp_path_factory):
    """A partial stage whose pending lineage mismatches (e.g. config changed
    between the kill and the resume) is wiped, not merged."""
    pages, _, _ = ckpt_setup
    root = str(tmp_path_factory.mktemp("ckpt_stale"))
    _run(pages, root)
    sdir = os.path.join(root, "signatures")
    os.remove(os.path.join(sdir, "manifest.json"))
    # poison the pending lineage
    pend = os.path.join(sdir, "pending.json")
    j = json.load(open(pend))
    j["config_hash"] = "deadbeef"
    json.dump(j, open(pend, "w"))
    mt_before = {
        f: os.path.getmtime(os.path.join(sdir, "data", f))
        for f in os.listdir(os.path.join(sdir, "data"))
    }
    again = _run(pages, root)
    mt_after = {
        f: os.path.getmtime(os.path.join(sdir, "data", f))
        for f in os.listdir(os.path.join(sdir, "data"))
    }
    # every partition rewritten (full recompute), same file set
    assert set(mt_before) == set(mt_after)
    assert all(mt_after[f] > mt_before[f] for f in mt_after)
    assert len(again) == len(pages)


def test_progress_callback(ckpt_setup, tmp_path_factory, ray_session):
    """Per-stage metrics callback (reference progress_callback analog): fires
    for every stage in both checkpoint and streaming modes; resume marks
    stages skipped."""
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    pages, _, _ = ckpt_setup
    root = str(tmp_path_factory.mktemp("ckpt_prog"))
    events = []
    cb = lambda stage, info: events.append((stage, info))  # noqa: E731
    dedup_pipeline(ray.data.from_arrow(pages), CFG, checkpoint_dir=root, progress=cb).to_pandas()
    seen = [s for s, _ in events]
    for s in STAGES:
        assert s in seen, f"no progress event for {s}"
    assert all(not i["skipped"] for _, i in events)
    assert all(i["seconds"] >= 0 for _, i in events)
    rows = {s: i["rows"] for s, i in events}
    assert rows["docs"] == len(pages)
    # resume: every stage reports skipped
    events.clear()
    dedup_pipeline(ray.data.from_arrow(pages), CFG, checkpoint_dir=root, progress=cb).to_pandas()
    assert all(i["skipped"] for _, i in events if i is not None)
    # streaming mode fires at the pinned boundaries
    events.clear()
    dedup_pipeline(ray.data.from_arrow(pages), CFG, progress=cb).to_pandas()
    stream_seen = [s for s, _ in events]
    for s in ["exact_reps", "signatures", "candidate_pairs", "verified_pairs"]:
        assert s in stream_seen
