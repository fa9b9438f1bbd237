"""Deterministic synthetic ``pages`` corpus with planted duplicate structure.

Implements FIXTURES.md: given ``(seed, n_rows)`` the generator is byte-identical
across runs.  Reference analog: hand-built feature dicts with known duplicate
structure (/root/reference/tests/performance/test_deduplication_process.py:44-98)
and the small named-path corpus with expected groups
(/root/reference/tests/performance/test_small_dataset.py:26-50).

Row classes (fractions of n_rows):
  unique 50% | exact_dup 10% | near_dup_light 15% (incl. one giant cluster)
  near_dup_heavy 10% | substring_dup 7.5% | boilerplate_nondup 7.5%

Emits two Arrow tables:
  pages(url, warc_ts, html, text, lang)  — ``text`` emptied for 20% of rows
  truth(url, true_cluster_id, class, body)  — ``body`` is the full ground-truth
      text (what extraction must recover), for oracle + test use only.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00 in microseconds


@dataclass
class _Row:
    cls: str
    cluster: int
    tokens: list


def _word_pool(rng: np.random.Generator, size: int = 4096) -> list:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    seen = set()
    while len(words) < size:
        ln = int(rng.integers(3, 9))
        w = "".join(rng.choice(letters, size=ln))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _base_doc(rng: np.random.Generator, pool: list, lo: int = 60, hi: int = 500) -> list:
    n = int(rng.integers(lo, hi))
    return [pool[int(i)] for i in rng.integers(0, len(pool), size=n)]


def _edit(rng: np.random.Generator, pool: list, tokens: list, rate: float) -> list:
    out = list(tokens)
    n_edits = max(1, int(round(rate * len(out))))
    pos = rng.choice(len(out), size=min(n_edits, len(out)), replace=False)
    delete = rng.random(len(pos)) < 0.3
    kill = set()
    for p, d in zip(pos, delete):
        if d and len(out) - len(kill) > 10:
            kill.add(int(p))
        else:
            out[int(p)] = pool[int(rng.integers(0, len(pool)))]
    return [t for i, t in enumerate(out) if i not in kill]


def generate_corpus(
    n_rows: int, seed: int = 42, giant_size: int | None = None, doc_scale: float = 1.0
):
    """Return (pages: pa.Table, truth: pa.Table); deterministic in (n_rows, seed,
    doc_scale).  ``doc_scale`` multiplies document token lengths — bench corpora
    use larger docs (Common-Crawl pages average several KB of extracted text)."""
    rng = np.random.default_rng(seed)
    pool = _word_pool(rng)
    if giant_size is None:
        giant_size = max(6, min(500, n_rows // 40))

    def S(n: int) -> int:
        return max(10, int(n * doc_scale))

    budgets = {
        "exact_dup": int(n_rows * 0.10),
        "near_dup_light": max(0, int(n_rows * 0.15) - giant_size),
        "near_dup_heavy": int(n_rows * 0.10),
        "substring_dup": int(n_rows * 0.075),
        "boilerplate_nondup": int(n_rows * 0.075),
    }
    rows: list[_Row] = []
    cluster_id = 0

    def new_cluster() -> int:
        nonlocal cluster_id
        cluster_id += 1
        return cluster_id

    # giant cluster: light edits of one seed -> must resolve to ONE final cluster
    seed_doc = _base_doc(rng, pool, S(200), S(400))
    cid = new_cluster()
    rows.append(_Row("near_dup_light", cid, seed_doc))
    for _ in range(giant_size - 1):
        # rate kept low so every member-to-seed pair has exact Jaccard safely
        # above the 0.7 verify threshold (J >= (1-5r)/(1+5r) ~ 0.89 at r=0.012)
        rows.append(_Row("near_dup_light", cid, _edit(rng, pool, seed_doc, float(rng.uniform(0.004, 0.012)))))

    for cls, budget in budgets.items():
        made = 0
        if cls == "boilerplate_nondup":
            header = [pool[int(i)] for i in rng.integers(0, len(pool), size=25)]
            footer = [pool[int(i)] for i in rng.integers(0, len(pool), size=25)]
            # keep each shared run under min_substring_len(=200) chars
            while sum(len(w) + 1 for w in header) >= 195:
                header = header[:-1]
            while sum(len(w) + 1 for w in footer) >= 195:
                footer = footer[:-1]
            for _ in range(budget):
                body = _base_doc(rng, pool, S(150), S(400))
                rows.append(_Row(cls, new_cluster(), header + body + footer))
            continue
        while made < budget:
            if cls == "substring_dup":
                inner = _base_doc(rng, pool, S(60), S(200))
                prefix = _base_doc(rng, pool, len(inner), 2 * len(inner))
                suffix = _base_doc(rng, pool, len(inner) // 2, len(inner))
                cid = new_cluster()
                rows.append(_Row(cls, cid, inner))
                rows.append(_Row(cls, cid, prefix + inner + suffix))
                made += 2
                continue
            size = int(rng.integers(2, 7))
            size = min(size, budget - made) if budget - made >= 2 else budget - made
            if size < 2:
                # absorb the remainder as a unique row
                rows.append(_Row("unique", new_cluster(), _base_doc(rng, pool, S(60), S(500))))
                made += 1
                continue
            base = _base_doc(rng, pool, S(80), S(500))
            cid = new_cluster()
            rows.append(_Row(cls, cid, base))
            for _ in range(size - 1):
                if cls == "exact_dup":
                    rows.append(_Row(cls, cid, list(base)))
                elif cls == "near_dup_light":
                    rows.append(_Row(cls, cid, _edit(rng, pool, base, float(rng.uniform(0.01, 0.03)))))
                else:
                    rows.append(_Row(cls, cid, _edit(rng, pool, base, float(rng.uniform(0.08, 0.12)))))
            made += size

    while len(rows) < n_rows:
        rows.append(_Row("unique", new_cluster(), _base_doc(rng, pool, S(60), S(500))))
    rows = rows[:n_rows]

    # deterministic shuffle of row order
    order = rng.permutation(len(rows))
    rows = [rows[int(i)] for i in order]

    langs_pool = ["de", "fr", ""]
    urls, tss, htmls, texts, langs = [], [], [], [], []
    t_urls, t_cids, t_cls, t_bodies = [], [], [], []
    empty_mask = rng.random(len(rows)) < 0.20
    lang_draw = rng.random(len(rows))
    lang_pick = rng.integers(0, 3, size=len(rows))
    for i, r in enumerate(rows):
        body = _tokens_to_body(r.tokens)
        url = f"https://site-{i % 97}.example/{r.cls}-{i}"
        urls.append(url)
        tss.append(_EPOCH_US + i * 17_000_000)
        htmls.append(_render_html(f"Page {i}", body))
        texts.append("" if empty_mask[i] else body)
        langs.append("en" if lang_draw[i] < 0.90 else langs_pool[int(lang_pick[i])])
        t_urls.append(url)
        t_cids.append(r.cluster)
        t_cls.append(r.cls)
        t_bodies.append(body)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    truth = pa.table(
        {
            "url": pa.array(t_urls, pa.string()),
            "true_cluster_id": pa.array(t_cids, pa.int64()),
            "class": pa.array(t_cls, pa.string()),
            "body": pa.array(t_bodies, pa.string()),
        }
    )
    return pages, truth


def _tokens_to_body(tokens: list, para_len: int = 60) -> str:
    paras = [" ".join(tokens[i : i + para_len]) for i in range(0, len(tokens), para_len)]
    return "\n\n".join(paras)


_NAV = "home about products contact"
_FOOTER = "copyright 2025 example inc all rights reserved"


def _render_html(title: str, body: str) -> bytes:
    paras = "".join(f"<p>{_html.escape(p)}</p>" for p in body.split("\n\n"))
    doc = (
        "<!doctype html><html><head>"
        f"<title>{_html.escape(title)}</title>"
        "<style>body{font-family:sans-serif;margin:0}</style>"
        "</head><body>"
        f"<nav>{_NAV}</nav>"
        f"<main>{paras}</main>"
        f"<footer>{_FOOTER}</footer>"
        "<script>var _t=Date.now();</script>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def write_corpus(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    giant_size: int | None = None,
    doc_scale: float = 1.0,
    rows_per_file: int = 50_000,
):
    """Write pages.parquet + truth.parquet under ``out_dir``; returns paths.

    ``pages.parquet`` is a DIRECTORY of ``part-NNNNN.parquet`` shards
    (``rows_per_file`` rows each, filename order == row order) — never one
    giant file: ``ray.data.read_parquet`` creation on a single 5.7 GB file
    measured 17-21 s of DRIVER-side metadata + size-estimation sampling per
    call (the round-4 "CPU-invariant report tail" was mostly this, hidden
    before the first stage pin), vs well under a second over 180 MB shards.
    Sharded input is also what the engine targets at 100 TB (per-shard
    resume, parallel metadata fetch).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages, truth = generate_corpus(n_rows, seed=seed, giant_size=giant_size, doc_scale=doc_scale)
    pages_path = os.path.join(out_dir, "pages.parquet")
    truth_path = os.path.join(out_dir, "truth.parquet")
    if os.path.isfile(pages_path):
        os.remove(pages_path)  # pre-round-5 single-file layout
    os.makedirs(pages_path, exist_ok=True)
    for i, lo in enumerate(range(0, max(pages.num_rows, 1), rows_per_file)):
        pq.write_table(
            pages.slice(lo, rows_per_file),
            os.path.join(pages_path, f"part-{i:05d}.parquet"),
        )
    pq.write_table(truth, truth_path)
    return pages_path, truth_path
