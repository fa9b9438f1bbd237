"""Pipeline configuration.

The reference exposes its knobs as ``HierarchicalDeduplicator.__init__`` thresholds
(/root/reference/modules/deduplication.py:33-61: wavelet 0.8, color 0.85, global 0.85,
local 0.75).  Here every knob lives in one frozen dataclass so a run is fully
reproducible and the config hash participates in checkpoint lineage.

LSH S-curve: with ``num_perms=128`` split into ``bands=32`` x ``rows_per_band=4``,
the probability that a pair with true Jaccard ``s`` shares at least one band is
``1 - (1 - s^4)^32``: ~0.9998 at s=0.70 (our verify threshold), ~0.80 at s=0.50,
~0.12 at s=0.30.  That keeps dup-pair recall vs the exact-Jaccard oracle at ~1.0
while pruning the candidate space aggressively below the threshold.

Winnowing guarantee: any common substring of length >= ``winnow_kgram +
winnow_window - 1`` BYTES shares at least one selected fingerprint (Schleimer,
Wilkerson & Aiken, SIGMOD'03), so ``100 + 101 - 1 = 200 = min_substring_len``.
The CONTRACT unit is characters: an L-char substring spans >= L bytes, so the
byte-window candidate generator is recall-safe, and the verify seed-extend
measures match length in complete codepoints before comparing to
``min_substring_len`` (equal on ASCII; exact on any unicode text — matches
the SQL oracle's substr/length semantics).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # --- shingling / signatures ---
    shingle_k: int = 5            # tokens per shingle (5-gram, per north_star)
    num_perms: int = 128          # MinHash signature length
    bands: int = 32               # LSH bands
    rows_per_band: int = 4        # rows per band (bands * rows == num_perms)

    # --- verification thresholds ---
    jaccard_threshold: float = 0.7    # exact shingle-set Jaccard to confirm a pair
    simhash_hamming_max: int = 32     # cheap pre-gate on candidate pairs (loose by
                                      # design: must never reject a true pair;
                                      # analog of the color gate, reference
                                      # modules/deduplication.py:711-801)
    length_ratio_min: float = 0.3     # min(len)/max(len) gate for LSH pairs

    # --- substring (suffix/winnowing) pass ---
    min_substring_len: int = 200      # CHARS of exact common substring => duplicate
                                      # (codepoint unit — verify counts complete
                                      # codepoints; suffix op windows codepoints)
    winnow_kgram: int = 100           # BYTES per rolling k-gram (candidate unit;
                                      # recall-safe for the char contract)
    winnow_window: int = 101          # winnowing window (k + w - 1 == min_substring_len)
    winnow_prefilter: bool = False    # dup-fp pre-pass before the fingerprint
                                      # exchange: ~80% of fingerprint rows are
                                      # borne by ONE doc and can never emit a
                                      # pair; a 9-byte (fp, cnt) pre-exchange
                                      # finds the dup fps and the 24-byte rows
                                      # are filtered map-side before the pair
                                      # sort.  DEFAULT OFF — re-measured in
                                      # round 5 (tools/measure_prefilter_
                                      # crossover.py, 16 cpus): prefilter
                                      # loses at 13.0M fp rows (2.5 s off vs
                                      # 3.8 s on), 25.9M (4.6 vs 6.8) and
                                      # 51.9M (9.1 vs 14.8) with the gap
                                      # WIDENING, so no auto-enable threshold
                                      # exists in the measurable range.  The
                                      # opt-in remains for exchange-byte-
                                      # bound deployments (output identical —
                                      # pinned by tests/test_winnow_prefilter.py)
    winnow_dupfp_max_ids: int = 20_000_000  # dup-fp broadcast: exact sorted
                                      # array up to here (8 B/fp), else a
                                      # distributed-built Bloom filter (sized
                                      # by attach_bloom_* knobs) whose false
                                      # positives only ship dead rows

    # --- skew handling ---
    bucket_pair_cap: int = 64         # bucket size above which pair emission is
                                      # salted into chunks; the chunk split is
                                      # deliberately CONSTANT across bands (a
                                      # hot bucket recurring in many bands then
                                      # emits the SAME pair set, which the
                                      # downstream distinct collapses — see
                                      # stages/banding.py emit_capped_pairs)
    salt_seed: int = 0x5A17           # deterministic member->chunk assignment
                                      # seed for the salted split

    # --- execution ---
    seed: int = 42                    # hash seeds (minhash seed derivation)
    batch_size: int = 1024            # rows per batch for signature stages
    signature_concurrency: int | tuple = 4   # actor-pool size for the signature stage
    join_num_buckets: int = 16        # buckets for the repartitioned hash join
    group_shards: int = 64            # hash shards for grouped vectorized ops
                                      # (~dataset_rows / target_rows_per_task;
                                      # bounds per-task group-processing size)
    cluster_contract_rounds: int = 3  # min-label contraction rounds before the
                                      # propagation loop: a dup cluster's
                                      # clique contracts to nothing in ONE
                                      # round, so the residual edge set is
                                      # usually empty after 1-2; contraction
                                      # is NOT O(log n) on path graphs (a
                                      # chain shifts one node per round —
                                      # measured), hence the bounded handoff
    cluster_max_rounds: int = 50      # safety cap for label propagation
    cluster_driver_max_edges: int = 2_000_000  # below this, union-find runs on the
                                      # driver (provably-small candidate set —
                                      # Ray guide's sanctioned fast path);
                                      # above, distributed label propagation
    num_output_partitions: int = 16   # deterministic hash-partition count for
                                      # checkpointed stage outputs (the unit of
                                      # per-partition lineage + resume)
    attach_semijoin_max_ids: int = 20_000_000  # each verify exchange ships a
                                      # profile row only for docs that appear
                                      # on ITS side of a candidate row (a
                                      # broadcast semi-join; measured 58% of
                                      # profile rows dead at 200k docs).
                                      # Gated per side on the SUM of
                                      # per-block distinct-id counts — a true
                                      # distinct upper bound, tighter than
                                      # both the raw row count (one pair is
                                      # up to `bands` LSH rows + one row per
                                      # shared fingerprint) and round 3's
                                      # 2*n_pairs (ADVICE item 3) — decided
                                      # from per-block scalars BEFORE any
                                      # driver-side id collection; above the
                                      # bound distributed Bloom filters are
                                      # built from the same per-block
                                      # distinct-id blobs (one candidate
                                      # scan total; false positives only
                                      # ship extra rows, never drop one)
    attach_bloom_bits_per_id: int = 12  # Bloom sizing above the exact-set
                                      # bound (~3e-4 fp rate with 8 hashes);
                                      # <= 0 disables the Bloom path entirely
                                      # (every profile row ships — old
                                      # behavior, still correct)
    attach_bloom_hashes: int = 8      # probes per id (Kirsch-Mitzenmacher
                                      # double hashing)
    attach_bloom_max_bits: int = 1 << 33  # 1 GiB filter ceiling — a broadcast
                                      # object at cluster scale, not driver heap

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perms:
            raise ValueError("bands * rows_per_band must equal num_perms")
        if self.winnow_kgram + self.winnow_window - 1 > self.min_substring_len:
            raise ValueError(
                "winnowing guarantee broken: winnow_kgram + winnow_window - 1 "
                "must be <= min_substring_len"
            )

    def config_hash(self) -> str:
        """Stable hash of the config — part of every checkpoint manifest's lineage."""
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = DedupConfig()
