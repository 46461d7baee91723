"""Interactive/CLI entry point — the ``hyriseConsole`` analog
(SURVEY.md §3.1; src/bin/console.cpp).

The reference's console takes SQL strings; this engine deliberately
has no SQL frontend (SURVEY.md §7.6 — the parser/translator/optimizer
stack is out of scope), so the console's unit of execution is a NAMED
PIPELINE from the suite registry (the ``queries()`` driver surface)
plus the catalog's import/export verbs.

Usage:
    python -m hyrise_generalized_dedup_ray.console list
    python -m hyrise_generalized_dedup_ray.console run <query> [sf_dir]
        [--limit N] [--out out.parquet|out.csv]
    python -m hyrise_generalized_dedup_ray.console describe <query>

Owns its Ray session (guarded init) — like bench.py and the CLI tools,
and unlike the library modules, which never call ray.init().
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="hgd-console")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered pipelines")
    d = sub.add_parser("describe", help="show a pipeline's docstring")
    d.add_argument("query")
    r = sub.add_parser("run", help="run a pipeline and print a preview")
    r.add_argument("query")
    r.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    r.add_argument("--limit", type=int, default=20)
    r.add_argument("--out", default=None,
                   help="also export the full result (.parquet/.csv/.tbl)")
    args = ap.parse_args(argv)

    from hyrise_generalized_dedup_ray.pipelines.suite import QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            doc = (QUERIES[name].__doc__ or "").strip().splitlines()
            print(f"{name:32s} {doc[0] if doc else ''}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; `list` shows all",
              file=sys.stderr)
        return 2

    if args.cmd == "describe":
        print(QUERIES[args.query].__doc__ or "(no docstring)")
        return 0

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        from hyrise_generalized_dedup_ray.relational.operators import \
            print_table

        import pyarrow as _pa
        import ray.data

        t0 = time.perf_counter()
        res = QUERIES[args.query](args.sf_dir)
        if isinstance(res, _pa.Table):
            res = ray.data.from_arrow(res)
        elif not isinstance(res, ray.data.Dataset):  # pandas
            res = ray.data.from_pandas(res)
        # pin once: preview, count and export read ONE cached result
        # instead of re-executing the whole pipeline per consumer
        res = res.materialize()
        print(print_table(res, n=args.limit))
        n = res.count()
        print(f"-- {n} rows in {time.perf_counter() - t0:.2f}s")
        if args.out:
            from hyrise_generalized_dedup_ray.relational.catalog import \
                export_table, export_tbl
            if args.out.endswith(".tbl"):
                export_tbl(res, args.out)
            else:
                ft = "csv" if args.out.endswith(".csv") else "parquet"
                export_table(res, args.out, file_type=ft)
            print(f"-- exported to {args.out}")
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
