"""Command-line run driver: ``python -m image_deduplication_3m_images_ray <cmd>``.

Reference analog: ``main.py`` (/root/reference/main.py:34-154) — the
user-facing driver that lists inputs, runs the memory-efficient dedup,
writes the CSV report, and prints progress JSON.  Here the same lifecycle is
three subcommands over Parquet tables:

- ``dedup``      pages table -> status-partitioned Parquet report
                 (+ optional single-file CSV for reference parity), with
                 per-stage progress JSON on stderr and checkpoint/resume.
- ``cluster-stats``  pages table -> per-cluster statistics (the reference's
                 ``processing_report.csv`` analog).
- ``oracle-check``   run every driver query against its DuckDB oracle on an
                 sf directory (wraps tools/check_queries.py semantics).

The CLI owns its Ray session (scripts own sessions; library code never calls
``ray.init`` — driver contract), initialised local-only.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _config_from_args(args: argparse.Namespace):
    from .config import DedupConfig

    overrides = {}
    for name in (
        "jaccard_threshold",
        "min_substring_len",
        "num_perms",
        "bands",
        "rows_per_band",
        "shingle_k",
        "signature_concurrency",
        "join_num_buckets",
        "group_shards",
    ):
        v = getattr(args, name, None)
        if v is not None:
            overrides[name] = v
    return DedupConfig(**overrides)


def _progress_printer(stage: str, info: dict) -> None:
    print(json.dumps({"stage": stage, **info}), file=sys.stderr, flush=True)


def cmd_dedup(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .pipelines import dedup_pipeline
    from .sources.pages import read_pages
    from .sources.report_sink import write_report, write_report_csv

    cfg = _config_from_args(args)
    t0 = time.time()
    pages = read_pages(args.input, lang=args.lang)
    report = dedup_pipeline(
        pages,
        cfg,
        checkpoint_dir=args.checkpoint_dir,
        progress=_progress_printer if args.progress else None,
    )
    counts = write_report(report, args.output)
    n_csv = None
    if args.csv:
        import ray.data

        n_csv = write_report_csv(ray.data.read_parquet(args.output), args.csv)
    print(
        json.dumps(
            {
                "report_dir": args.output,
                "rows_per_status": counts,
                "csv": args.csv,
                "csv_rows": n_csv,
                "seconds": round(time.time() - t0, 3),
            }
        )
    )
    return 0


def cmd_cluster_stats(args: argparse.Namespace) -> int:
    _init_ray(args.num_cpus)
    from .pipelines.dedup import cluster_stats_pipeline
    from .sources.pages import read_pages

    cfg = _config_from_args(args)
    t0 = time.time()
    stats = cluster_stats_pipeline(read_pages(args.input, lang=args.lang), cfg)
    stats.write_parquet(args.output)
    print(
        json.dumps(
            {
                "stats_dir": args.output,
                "clusters": stats.count(),
                "seconds": round(time.time() - t0, 3),
            }
        )
    )
    return 0


def cmd_oracle_check(args: argparse.Namespace) -> int:
    import subprocess
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return subprocess.call(
        [sys.executable, os.path.join(here, "tools", "check_queries.py"), args.sf_dir]
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m image_deduplication_3m_images_ray",
        description="Ray-Data-native webtext near-dup engine (see README.md)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp: argparse.ArgumentParser, needs_io: bool = True) -> None:
        if needs_io:
            sp.add_argument("--input", required=True, help="pages Parquet path/dir")
            sp.add_argument("--output", required=True, help="output Parquet dir")
            sp.add_argument("--lang", default=None, help="pushdown lang filter")
        sp.add_argument("--num-cpus", type=int, default=None)
        for name, typ in (
            ("jaccard_threshold", float),
            ("min_substring_len", int),
            ("num_perms", int),
            ("bands", int),
            ("rows_per_band", int),
            ("shingle_k", int),
            ("signature_concurrency", int),
            ("join_num_buckets", int),
            ("group_shards", int),
        ):
            sp.add_argument(f"--{name.replace('_', '-')}", dest=name, type=typ, default=None)

    d = sub.add_parser("dedup", help="flagship near-dup pipeline -> report")
    common(d)
    d.add_argument("--checkpoint-dir", default=None, help="resume-able stage checkpoints")
    d.add_argument("--csv", default=None, help="also write one sorted CSV (reference parity)")
    d.add_argument("--progress", action="store_true", help="per-stage JSON on stderr")
    d.set_defaults(fn=cmd_dedup)

    c = sub.add_parser("cluster-stats", help="per-cluster size/pairs/mean-jaccard")
    common(c)
    c.set_defaults(fn=cmd_cluster_stats)

    o = sub.add_parser("oracle-check", help="run all driver queries vs DuckDB oracles")
    o.add_argument("sf_dir", help="testdata scale-factor dir (e.g. /root/testdata/sf0.01)")
    o.set_defaults(fn=cmd_oracle_check)
    return p


def main(argv: list | None = None) -> int:
    args = build_parser().parse_args(argv)
    code = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
