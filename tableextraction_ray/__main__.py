"""CLI entry points — the engine's replacement for the reference's upload
web UI (``main.py:20-56``) and ad-hoc notebook runs, shaped for
``ray job submit``:

    python -m tableextraction_ray extract   --corpus DIR --out DIR [--format spans|yaml|json]
    python -m tableextraction_ray run       --corpus DIR --out DIR [--parts N]   # checkpointed + resumable
    python -m tableextraction_ray datagen   --out DIR [--tier t1|t2|bench | --n-docs N]
    python -m tableextraction_ray verify    --corpus DIR                         # span equality vs golden
    python -m tableextraction_ray ingest    --input DIR --out DIR [--dpi N]      # raw PDF/image files -> corpus
    python -m tableextraction_ray query     NAME --sf DIR [--out DIR] [--list]   # any registered pipeline/operator

Owns its Ray session (guarded init), unlike the library modules.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, log_to_driver=False)
    return ray


def cmd_extract(args: argparse.Namespace) -> int:
    ray = _ray_init()
    from .pipelines.extract import (
        ExtractConfig,
        build_extraction_pipeline,
        build_serialization_pipeline,
    )

    cfg = ExtractConfig(classify_filter=args.classify_filter)
    if args.format == "spans":
        ds = build_extraction_pipeline(args.corpus, config=cfg)
    else:
        ds = build_serialization_pipeline(args.corpus, config=cfg)
        if args.format == "yaml":
            ds = ds.select_columns(["doc_id", "page_offset", "table_no", "yaml"])
        elif args.format == "json":
            ds = ds.select_columns(["doc_id", "page_offset", "table_no", "json"])
    ds.write_parquet(args.out)
    print(json.dumps({"rows": ray.data.read_parquet(args.out).count(), "out": args.out}))
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    _ray_init()
    from .state.checkpoint import run_partitioned

    totals = run_partitioned(args.corpus, args.out, num_parts=args.parts)
    print(json.dumps(totals))
    return 0


def cmd_datagen(args: argparse.Namespace) -> int:
    _ray_init()
    from .datagen import generate_corpus

    out = generate_corpus(args.out, n_docs=args.n_docs, tier=args.tier, force=args.force)
    print(json.dumps({"corpus": out}))
    return 0


def cmd_verify(args: argparse.Namespace) -> int:
    """Span-sequence equality of a fresh extraction vs the corpus golden —
    fully distributed (union + one doc_id shuffle); the driver only sees
    the per-doc verdicts."""
    _ray_init()

    import pyarrow.compute as pc

    from .pipelines.verify import verify_against_golden

    # Materialize ONCE: counts and examples below are three consumptions,
    # and an unmaterialized Dataset re-runs the whole extraction per
    # consumption (verdict rows are tiny — pinning them is free).
    verdicts = verify_against_golden(args.corpus).materialize()
    bad = verdicts.map_batches(
        lambda b: b.filter(pc.invert(b["equal"])), batch_format="pyarrow"
    ).materialize()
    mismatches = bad.take(5)
    n_docs = verdicts.count()
    n_bad = bad.count()
    print(
        json.dumps(
            {
                "docs": n_docs,
                "mismatched_docs": n_bad,
                "equal": n_bad == 0,
                "examples": [
                    {"doc_id": m["doc_id"], "first_diff": m["first_diff"]}
                    for m in mismatches
                ],
            }
        )
    )
    return 0 if n_bad == 0 else 1


def cmd_query(args: argparse.Namespace) -> int:
    ray = _ray_init()
    import importlib.util
    import os

    # queries() lives in the repo-root driver contract module; resolve it
    # relative to the package so the CLI works from any cwd.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(root, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    registry = mod.queries()
    if args.list or not args.name:
        oracles = set(mod.oracle_sql())
        for name in sorted(registry):
            kind = "sql-verified" if name in oracles else "rows-only"
            print(f"{name:28s} {kind}")
        return 0
    if args.name not in registry:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    result = registry[args.name](args.sf)
    if not isinstance(result, ray.data.Dataset):
        import ray.data as rd

        result = rd.from_pandas(result) if hasattr(result, "columns") else rd.from_arrow(result)
    if args.out:
        result.write_parquet(args.out)
        print(json.dumps({"query": args.name, "rows": result.count(), "out": args.out}))
    else:
        rows = result.take(args.limit)
        print(json.dumps({"query": args.name, "rows_shown": len(rows)}))
        for r in rows:
            print(json.dumps(r, default=str))
    return 0


def cmd_grits(args: argparse.Namespace) -> int:
    """Corpus-level GriTS: extraction cells vs golden cells, mean per
    metric (reference transformer/src/grits.py:813+ 'grits' mode)."""
    _ray_init()
    from tableextraction_ray import metrics
    from tableextraction_ray.datagen import golden_cells
    from tableextraction_ray.pipelines.extract import build_cells_pipeline

    pred = build_cells_pipeline(args.corpus)
    gold = golden_cells(args.corpus)
    result = metrics.grits_corpus(pred, gold, per_table=args.per_table)
    for row in result.take_all():
        print(json.dumps(row, default=str))
    return 0


def cmd_ingest(args: argparse.Namespace) -> int:
    """Raw PDF/image files -> an extraction-ready corpus (documents.parquet
    + media store). The real front door for non-synthetic data."""
    import os

    ray = _ray_init()
    from .sources.rasterize import ingest_files

    docs = ingest_files(args.input, args.out, dpi=args.dpi)
    docs.write_parquet(os.path.join(args.out, "documents.parquet"))
    n = ray.data.read_parquet(os.path.join(args.out, "documents.parquet")).count()
    print(json.dumps({"docs": n, "corpus": args.out}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="tableextraction_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract", help="one-shot extraction to parquet")
    e.add_argument("--corpus", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--format", choices=["spans", "yaml", "json"], default="spans")
    e.add_argument("--classify-filter", action="store_true")
    e.set_defaults(fn=cmd_extract)

    r = sub.add_parser("run", help="checkpointed partitioned run (resumable)")
    r.add_argument("--corpus", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--parts", type=int, default=4)
    r.set_defaults(fn=cmd_run)

    d = sub.add_parser("datagen", help="generate the synthetic corpus")
    d.add_argument("--out", required=True)
    d.add_argument("--tier", default="t1")
    d.add_argument("--n-docs", type=int, default=None)
    d.add_argument("--force", action="store_true")
    d.set_defaults(fn=cmd_datagen)

    v = sub.add_parser("verify", help="span equality vs corpus golden")
    v.add_argument("--corpus", required=True)
    v.set_defaults(fn=cmd_verify)

    i = sub.add_parser("ingest", help="raw PDF/image files -> corpus")
    i.add_argument("--input", required=True, help="directory of .pdf/.png/.jpg files")
    i.add_argument("--out", required=True, help="corpus directory to create")
    i.add_argument("--dpi", type=int, default=300)
    i.set_defaults(fn=cmd_ingest)

    g = sub.add_parser("grits", help="corpus-level GriTS vs golden cells")
    g.add_argument("--corpus", required=True)
    g.add_argument("--per-table", action="store_true")
    g.set_defaults(fn=cmd_grits)

    q = sub.add_parser("query", help="run any registered pipeline/operator")
    q.add_argument("name", nargs="?", default=None)
    q.add_argument("--sf", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None)
    q.add_argument("--limit", type=int, default=10)
    q.add_argument("--list", action="store_true")
    q.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
