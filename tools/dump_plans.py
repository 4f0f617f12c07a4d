"""Dump `.explain("formatted")` output for named queries to files.

Used to produce the `plans/r10/<query>_{before,after}.txt` judge
artifacts: run once against the round-entry commit (a detached worktree)
with suffix `before`, once against HEAD with suffix `after`. explain()
compiles the plan but runs no jobs (beyond a registry function's own
bounded construction-time work), so this is cheap at any sf.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] name [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", rest
    os.makedirs(out_dir, exist_ok=True)

    from filebeat_to_clickhouse_spark.queries import QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        # public API only (r10 advice): explain() prints; capture stdout.
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
