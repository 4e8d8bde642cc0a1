"""User-facing CLI — the engine analog of the reference client
(``client/cli.py:9-163``): submit extraction work, poll progress, and manage
stored tables/caches, without hand-writing ``spark-submit`` invocations.

Command mapping (reference → engine):

- ``ocr_upload`` / ``ocr_request`` (submit a file, get a task id)
  → ``extract`` — run the raw-files extraction job over a file/directory
    (``jobs/raw_files_extract.py``); the run id is the task id.
- ``result --task_id`` (poll the Celery task state, main.py:171-188)
  → ``result`` — per-status rollup of the progress table for a run id.
- ``clear_cache`` (Redis flush, main.py:191-195)
  → ``clear-cache`` — drop the cache table under an output location.
- ``list_files`` / ``load_file`` / ``delete_file`` (storage ops,
  client/cli.py:138-163)
  → ``list-tables`` / ``show`` / ``delete-table``.

LLM commands (``llm_pull`` / ``llm_generate``) are N/A-by-design: external
model services (SURVEY.md §2 exclusions).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_extract_api_spark.session import get_spark  # noqa: E402


def _spark(args):
    return get_spark("cli", master=args.master or "local[*]")


def cmd_extract(args) -> int:
    from jobs.raw_files_extract import main as raw_main

    argv = ["--input", args.input, "--out", args.out, "--run-id", args.run_id]
    if args.glob:
        argv += ["--glob", args.glob]
    # pass the CLI's session in: the job must not stop a session it did not
    # create (matters when the CLI runs inside a host process / test)
    raw_main(argv, spark=_spark(args))
    return 0


def cmd_result(args) -> int:
    from text_extract_api_spark.checkpoint import poll_progress

    spark = _spark(args)
    rows = poll_progress(spark, f"{args.out}/progress", args.run_id).collect()
    if not rows:
        # the reference's PENDING answer for an unknown/unstarted task
        print(json.dumps({"state": "PENDING", "run_id": args.run_id}))
        return 0
    for r in sorted(rows, key=lambda r: r["status"]):
        print(
            json.dumps(
                {
                    "run_id": args.run_id,
                    "status": r["status"],
                    "n_marks": r["n_marks"],
                    "docs_done": r["docs_done"],
                    "spans_done": r["spans_done"],
                }
            )
        )
    return 0


def cmd_clear_cache(args) -> int:
    from text_extract_api_spark.io import delete_table

    spark = _spark(args)
    removed = delete_table(spark, f"{args.out}/cache")
    print(json.dumps({"cleared": bool(removed)}))
    return 0


def cmd_list_tables(args) -> int:
    from text_extract_api_spark.io import list_tables

    spark = _spark(args)
    for name in list_tables(spark, args.base):
        print(name)
    return 0


def cmd_show(args) -> int:
    from text_extract_api_spark.io import read_table

    spark = _spark(args)
    df = read_table(spark, args.location)
    for r in df.limit(args.limit).collect():
        print(json.dumps(r.asDict(recursive=True), default=str))
    return 0


def cmd_delete_table(args) -> int:
    from text_extract_api_spark.io import delete_table

    spark = _spark(args)
    print(json.dumps({"deleted": bool(delete_table(spark, args.location))}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="text-extract-spark")
    ap.add_argument("--master", default=None, help="Spark master (default local[*])")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("extract", help="Extract a file or directory of raw files")
    p.add_argument("--input", required=True, help="file or directory of raw files")
    p.add_argument("--out", required=True, help="output location (results/cache/progress)")
    p.add_argument("--run-id", default="cli-0")
    p.add_argument("--glob", default=None)
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("result", help="Poll extraction progress for a run id")
    p.add_argument("--out", required=True)
    p.add_argument("--run-id", required=True)
    p.set_defaults(fn=cmd_result)

    p = sub.add_parser("clear-cache", help="Drop the cache table under an output location")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_clear_cache)

    p = sub.add_parser("list-tables", help="List stored tables under a base location")
    p.add_argument("--base", required=True)
    p.set_defaults(fn=cmd_list_tables)

    p = sub.add_parser("show", help="Print rows of a stored table as JSON lines")
    p.add_argument("--location", required=True)
    p.add_argument("--limit", type=int, default=20)
    p.set_defaults(fn=cmd_show)

    p = sub.add_parser("delete-table", help="Delete a stored table")
    p.add_argument("--location", required=True)
    p.set_defaults(fn=cmd_delete_table)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
