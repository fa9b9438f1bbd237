"""Winnow dup-fp prefilter: identical pair output across all three plans.

The prefilter drops fingerprint rows whose fp is borne by a single doc —
provably dead for pair emission — before the expensive exchange.  These
tests pin that (a) the exact-set plan, (b) the Bloom scale plan
(``winnow_dupfp_max_ids=0`` forces it) and (c) the unfiltered plan emit the
same candidate pair multiset, and that the dup-fp pre-pass itself is exact.
"""

import numpy as np
import pytest

from image_deduplication_3m_images_ray.config import DedupConfig


def _pairs_df(pages, cfg):
    import ray.data

    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.winnow import (
        fingerprint_stage,
        winnow_pairs_stage,
    )

    ds = ray.data.from_arrow(pages)
    docs_rep = exact_rep_stage(extract_stage(ds, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()
    df = winnow_pairs_stage(fingerprint_stage(profile, cfg), cfg).to_pandas()
    return df.sort_values(["doc_a", "doc_b", "pos_a", "pos_b"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def three_plans(ray_session, tiny_corpus):
    pages, _ = tiny_corpus
    base = dict(signature_concurrency=2, join_num_buckets=4, group_shards=8)
    # the prefilter is default-OFF — the exact/bloom plans must opt in, else
    # all three fixtures would run the identical unfiltered path
    exact = _pairs_df(pages, DedupConfig(**base, winnow_prefilter=True))
    bloom = _pairs_df(
        pages, DedupConfig(**base, winnow_prefilter=True, winnow_dupfp_max_ids=0)
    )
    off = _pairs_df(pages, DedupConfig(**base, winnow_prefilter=False))
    return exact, bloom, off


def test_prefilter_matches_unfiltered(three_plans):
    exact, _, off = three_plans
    assert len(exact) > 0  # the corpus plants substring dups
    assert exact.equals(off)


def test_bloom_plan_matches_exact(three_plans):
    exact, bloom, _ = three_plans
    assert exact.equals(bloom)


def test_dup_fp_prepass_exact(ray_session, tiny_corpus):
    """dup_fingerprint_stage returns exactly the fps borne by >= 2 docs."""
    import ray
    import ray.data

    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.winnow import (
        dup_fingerprint_stage,
        fingerprint_stage,
    )

    pages, _ = tiny_corpus
    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4, group_shards=8)
    ds = ray.data.from_arrow(pages)
    docs_rep = exact_rep_stage(extract_stage(ds, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()
    fps = fingerprint_stage(profile, cfg).materialize()

    got_parts = [
        np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        for t in ray.get(dup_fingerprint_stage(fps, cfg).to_arrow_refs())
        if t.num_rows and "fp" in t.schema.names
    ]
    got = np.sort(np.concatenate(got_parts)) if got_parts else np.empty(0, np.uint64)

    df = fps.to_pandas()
    rec = df[["fp", "doc_id"]].drop_duplicates()
    counts = rec.groupby("fp").size()
    want = np.sort(counts[counts >= 2].index.to_numpy().astype(np.uint64))
    assert np.array_equal(got, want)
