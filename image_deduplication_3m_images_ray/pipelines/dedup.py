"""The flagship near-duplicate detection + clustering pipeline.

Composition (SURVEY.md §3.4 target lifecycle):

    pages ->[extract]-> docs ->[exact pre-pass]-> reps
          ->[signatures]-> profile
          ->[LSH banding + salted pair emission]-> lsh candidate pairs
          ->[winnowing fingerprints]-> substring candidate pairs
          ->[verify: join profiles, gates, exact Jaccard / seed-extend]-> verified pairs
          ->[min-label propagation]-> rep clusters ->[expand exact members]-> clusters
          ->[report: best-per-cluster, statuses]-> report

Reference analog: the 5-stage hierarchical deduplicator end to end
(/root/reference/modules/deduplication.py:1019-1205, memory-efficient driver
/root/reference/modules/memory_efficient_deduplication.py:41-186).  Every
stage boundary can checkpoint per-partition Parquet with a lineage manifest
(``checkpoint_dir=``), making a killed run resumable mid-pipeline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig, DEFAULT_CONFIG
from ..state import CheckpointManager
from ..util import rename_columns, shard_attach
from ..stages.extract import extract_stage
from ..stages.exact import exact_rep_stage, reps_only
from ..stages.signatures import signature_stage
from ..stages.banding import band_postings_stage, lsh_pairs_stage
from ..stages.winnow import fingerprint_stage, winnow_pairs_stage
from ..stages.verify import prepare_candidates, verify_prepared, verify_stage
from ..stages.cluster import cluster_stage
from ..stages.report import report_stage, report_stage_from_reps


def _expand_clusters(docs_rep: Dataset, rep_clusters: Dataset, cfg: DedupConfig) -> Dataset:
    """Map every doc to its final cluster id through its exact representative.

    cluster(doc) = label(rep(doc)) when the rep was clustered, else rep(doc)
    itself.  Labels are min-rep ids and each rep is the min doc_id of its
    exact-copy group, so cluster ids remain the min doc_id of the full cluster.
    Left-outer shard_attach uses 0 as the no-match sentinel (a real cluster id
    of 0 requires a doc whose 64-bit url hash is exactly 0 — negligible).
    """
    mapping = docs_rep.select_columns(["doc_id", "rep_id"])
    rc = rename_columns(rep_clusters, {"doc_id": "rep_id", "cluster_id": "rep_cluster"})
    j = shard_attach(
        mapping,
        rc,
        key="rep_id",
        payload={"rep_cluster": "rep_cluster"},
        num_shards=cfg.group_shards,
        how="left_outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        rep_cluster = np.asarray(t["rep_cluster"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        rep_id = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        cid = np.where(rep_cluster == 0, rep_id, rep_cluster)
        return pa.table(
            {"doc_id": t["doc_id"], "cluster_id": pa.array(cid, pa.uint64())}
        )

    return j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def dedup_pipeline(
    pages: Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    checkpoint_dir: Optional[str] = None,
    exact_prepass: bool = True,
    progress: Optional[callable] = None,
) -> Dataset:
    """pages -> report(url, doc_id, cluster_id, cluster_size, quality, status).

    ``checkpoint_dir=None`` runs fully streaming; otherwise each stage persists
    partitioned Parquet + manifest and a rerun resumes at the first incomplete
    stage.  ``exact_prepass=False`` skips the exact-duplicate collapse (every
    doc goes through signatures/LSH — used by tests to cross-check both paths).

    ``progress`` is the per-stage metrics callback (reference analog:
    ``progress_callback``, /root/reference/modules/
    memory_efficient_deduplication.py:45): called as ``progress(stage_name,
    info)`` after each pinned/persisted stage completes, where ``info`` has
    ``seconds`` (wall time of the stage boundary), ``rows`` (when known from
    the manifest or materialized stage) and ``skipped`` (resume hit).  Lazy
    unpinned intermediates stream through and report at the next boundary.
    """
    import time as _time

    ckpt = CheckpointManager(checkpoint_dir, cfg, progress=progress)
    # Stage outputs referenced by MULTIPLE downstream consumers must be pinned,
    # or the lazy DAG re-executes the whole upstream chain once per consumer
    # (profile alone feeds banding, winnowing and both verify-join sides).  With
    # a checkpoint_dir the Parquet round-trip does this; in streaming mode we
    # materialize into the object store (spills when large).  Single-consumer
    # stages stay lazy so the streaming executor pipelines them — every
    # materialize barrier is ~1-2s of serial wall-time regardless of CPU count.
    if checkpoint_dir:

        def pin(build, name=None):
            return build() if callable(build) else build

    else:
        # pins nest (lsh_pairs/winnow_pairs run inside the candidate_pairs
        # builder), so each stage reports its EXCLUSIVE time — inclusive
        # timing double-counts the inner pins and the sum of stages can
        # exceed the pipeline total
        _pin_inner = [0.0]

        def pin(build, name=None):
            # time the BUILD too, not just the materialize: stage builders run
            # eager driver-side work (the semi-join membership passes collect
            # candidate ids with a map_batches + take_all) that would otherwise
            # be invisible between pins and mis-attributed to the final tail
            t0 = _time.time()
            outer_inner = _pin_inner[0]
            _pin_inner[0] = 0.0
            ds = build() if callable(build) else build
            out = ds.materialize()
            elapsed = _time.time() - t0
            own = elapsed - _pin_inner[0]
            _pin_inner[0] = outer_inner + elapsed
            if progress and name:
                # metadata-only row count: a materialized dataset knows its
                # rows without launching a plan — out.count() here measured
                # ~0.4-2 s of driver-side execution PER STAGE (~14 s across
                # the pipeline at 500k pages), all of it invisible to the
                # stage attribution because it ran after `elapsed`
                try:
                    rows = out._meta_count()
                except Exception:
                    rows = None
                progress(name, {"seconds": round(own, 3), "rows": rows, "skipped": False})
            return out

    def pin_named(name):
        return lambda build: pin(build, name)

    if exact_prepass:
        # extract feeds only the exact pre-pass, so it fuses into this
        # execution; docs_rep then serves BOTH the rep filter and the report
        docs_rep = pin_named("exact_reps")(
            lambda: ckpt.run(
                "exact_reps",
                lambda: exact_rep_stage(
                    ckpt.run("docs", lambda: extract_stage(pages, cfg), partition_key="doc_id"),
                    cfg,
                ),
                parents=["docs"] if checkpoint_dir else [],
                partition_key="doc_id",
            )
        )
        docs_for_report = docs_rep
        reps = reps_only(docs_rep)
        sig_parents = ["exact_reps"]
    else:
        docs_rep = None
        docs_for_report = pin_named("docs")(
            lambda: ckpt.run("docs", lambda: extract_stage(pages, cfg), partition_key="doc_id")
        )
        reps = docs_for_report
        sig_parents = ["docs"]
    profile = pin_named("signatures")(
        lambda: ckpt.run(
            "signatures",
            lambda: signature_stage(reps, cfg),
            parents=sig_parents,
            partition_key="doc_id",
        )
    )
    # Pair generation / consolidation / verification each end in an
    # all-to-all exchange.  MEASURED on this Ray version (2.49): several
    # unpinned sort exchanges in one streaming DAG thrash each other
    # (100k-doc run: 227 s unpinned vs 78 s with materialize pins at the
    # exchange boundaries at 16 cpus) — the executor runs concurrent
    # all-to-all operators with no inter-operator memory coordination.  So
    # each exchange boundary IS pinned; the ~1 s serial cost per pin is an
    # order of magnitude below what it buys.
    def build_prepared() -> Dataset:
        # the LSH-pair sort and the winnow-fingerprint sort are pinned
        # SEPARATELY before their union feeds the prepare exchange:
        # running them concurrently in one streaming DAG measured 1.7x slower
        # (31.8 s vs 19.2 s at 16 cpus on 100k docs) — same concurrent
        # all-to-all thrashing as the stage-boundary pins above
        lsh = pin(lambda: lsh_pairs_stage(band_postings_stage(profile, cfg), cfg, dedup=False), "lsh_pairs")
        # pin the fingerprint map BEFORE its exchange: fused lazily into the
        # pair groupby it measured 27.6 s vs 11.2 + 9.7 s pinned at 500k
        # pages / 16 cpus (the exactsubstr round-5 finding, same cause)
        fps = pin(lambda: fingerprint_stage(profile, cfg), "fingerprints")
        wp = pin(lambda: winnow_pairs_stage(fps, cfg), "winnow_pairs")
        # prepare = consolidate + a-side payload attach in ONE exchange
        # (stages/verify.py module docstring: the two-exchange verify plan)
        return prepare_candidates(lsh.union(wp), profile, cfg)

    candidates = pin_named("candidate_pairs")(
        lambda: ckpt.run(
            "candidate_pairs",
            build_prepared,
            parents=["signatures"],
            partition_key="doc_a",
            sort_keys=["doc_a", "doc_b", "origin", "seed"],
        )
    )
    verified = pin_named("verified_pairs")(
        lambda: ckpt.run(
            "verified_pairs",
            lambda: verify_prepared(candidates, profile, cfg),
            parents=["candidate_pairs"],
            partition_key="doc_a",
            sort_keys=["doc_a", "doc_b"],
        )
    )
    if checkpoint_dir:
        # key the mid-loop round checkpoints by config + upstream lineage so a
        # changed config or recomputed verified_pairs never resumes stale labels
        import hashlib

        vid = (ckpt.manifest("verified_pairs") or {}).get("stage_id", "")
        tag = hashlib.sha256(f"{cfg.config_hash()}:{vid}".encode()).hexdigest()[:12]
        round_dir = f"{checkpoint_dir}/clusters_rounds_{tag}"
    else:
        round_dir = None
    rep_clusters = pin_named("clusters")(
        lambda: ckpt.run(
            "clusters",
            lambda: cluster_stage(verified, cfg, round_checkpoint_dir=round_dir),
            parents=["verified_pairs"],
            partition_key="doc_id",
        )
    )
    if exact_prepass:
        # one attach: doc -> rep -> cluster (report_stage_from_reps)
        build_report = lambda: report_stage_from_reps(docs_rep, rep_clusters, cfg)  # noqa: E731
    else:
        build_report = lambda: report_stage(docs_for_report, rep_clusters, cfg)  # noqa: E731
    # pin the report too (streaming mode): the sort is the tail's only
    # full-row exchange and pinning it makes the progress attribution
    # complete — the unpinned remainder is just the caller's consume
    report = pin_named("report")(
        lambda: ckpt.run(
            "report",
            lambda: build_report().sort(["cluster_id", "status"]),
            parents=["clusters"],
        )
    )
    return report


def cluster_stats_pipeline(pages: Dataset, cfg: DedupConfig = DEFAULT_CONFIG) -> Dataset:
    """pages -> per-cluster statistics (cluster_id, cluster_size, n_pairs,
    mean_jaccard).

    Reference analog: the stage-2 ``processing_report.csv`` with group sizes
    and average intra-group similarity
    (/root/reference/modules/deduplication.py:952-1017, 1397-1419).
    ``cluster_size`` counts ALL member docs (exact copies included);
    ``n_pairs`` / ``mean_jaccard`` cover the Jaccard-confirmed verified pairs
    (winnow-only pairs carry no Jaccard evidence and are excluded from the
    mean); singleton and substring-only clusters report 0 / 0.0.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import sharded_group_map

    docs_rep = exact_rep_stage(extract_stage(pages, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()
    raw = lsh_pairs_stage(band_postings_stage(profile, cfg), cfg, dedup=False).union(
        winnow_pairs_stage(fingerprint_stage(profile, cfg), cfg)
    )
    verified = verify_stage(raw, profile, cfg).materialize()
    rep_clusters = cluster_stage(verified, cfg)
    clusters = _expand_clusters(docs_rep, rep_clusters, cfg)

    # per-cluster member counts (one partial-aggregating exchange)
    def count_members(g: dict) -> dict:
        cid = np.asarray(g["cluster_id"], dtype=np.uint64)
        u, c = np.unique(cid, return_counts=True)
        return {"cluster_id": u, "cluster_size": c.astype(np.int64)}

    sizes = sharded_group_map(
        clusters.select_columns(["cluster_id"]), ["cluster_id"], count_members,
        num_shards=cfg.group_shards,
    )

    # jaccard-confirmed pairs -> their cluster (doc_a is a rep; its label IS
    # the pair's cluster), then per-cluster count + sum
    jpairs = verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t["jaccard"], cfg.jaccard_threshold)).select(
            ["doc_a", "jaccard"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    attached = shard_attach(
        jpairs,
        rename_columns(rep_clusters, {"doc_id": "doc_a"}),
        key="doc_a",
        payload={"cluster_id": "cluster_id"},
        num_shards=cfg.group_shards,
    )

    def pair_stats(g: dict) -> dict:
        cid = np.asarray(g["cluster_id"], dtype=np.uint64)
        j = np.asarray(g["jaccard"], dtype=np.float64)
        order = np.argsort(cid, kind="stable")
        cid, j = cid[order], j[order]
        first = np.ones(len(cid), dtype=bool)
        if len(cid) > 1:
            first[1:] = cid[1:] != cid[:-1]
        starts = np.nonzero(first)[0]
        n = np.diff(np.append(starts, len(cid)))
        # deterministic mean: sort each cluster's jaccards before summing so
        # the float result is independent of shard arrival order
        jsum = np.array(
            [np.sort(j[s : s + c]).sum() for s, c in zip(starts, n)], dtype=np.float64
        )
        return {"cluster_id": cid[starts], "n_pairs": n.astype(np.int64), "jsum": jsum}

    pstats = sharded_group_map(attached, ["cluster_id"], pair_stats, num_shards=cfg.group_shards)

    merged = shard_attach(
        sizes,
        pstats,
        key="cluster_id",
        payload={"n_pairs": "n_pairs", "jsum": "jsum"},
        num_shards=cfg.group_shards,
        how="left_outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        n_pairs = np.asarray(t["n_pairs"].to_numpy(zero_copy_only=False), dtype=np.int64)
        jsum = np.asarray(t["jsum"].to_numpy(zero_copy_only=False), dtype=np.float64)
        mean = np.where(n_pairs > 0, np.round(jsum / np.maximum(n_pairs, 1), 6), 0.0)
        return pa.table(
            {
                "cluster_id": t["cluster_id"],
                "cluster_size": t["cluster_size"],
                "n_pairs": pa.array(n_pairs, pa.int64()),
                "mean_jaccard": pa.array(mean, pa.float64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def run_dedup_pipeline(
    pages: Dataset,
    cfg: DedupConfig = DEFAULT_CONFIG,
    work_dir: Optional[str] = None,
    exact_prepass: bool = True,
) -> Dataset:
    """Alias entry point: ``work_dir`` is the checkpoint root (None = streaming)."""
    return dedup_pipeline(pages, cfg, checkpoint_dir=work_dir, exact_prepass=exact_prepass)
