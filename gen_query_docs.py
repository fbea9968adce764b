#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (run after adding queries)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arrow_parquet_logs_spark.queries import REGISTRY  # noqa: E402


def main() -> None:
    lines = [
        "# Query catalog",
        "",
        f"{len(REGISTRY)} registered queries — each a `(spark, sf_dir) -> DataFrame`",
        "exposed through `__spark_entry__.queries()`. \"oracle\" = the driver",
        "hash-compares the result against equivalent DuckDB SQL at sf0.01;",
        "rows-only entries are sketch/sample ops that are engine-specific by",
        "construction (each has an exact oracle-checked twin where one exists).",
        "",
        "| query | checked | tags | what it does |",
        "|---|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        doc = (spec.fn.__doc__ or "").strip().split("\n")[0].strip() or "—"
        checked = "oracle" if spec.oracle else "rows-only"
        tags = ", ".join(spec.tags)
        lines.append(f"| `{name}` | {checked} | {tags} | {doc} |")
    lines.append("")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
