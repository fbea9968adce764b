"""Assemble SCALE_r05c.json (the sf1 → sf10 'second decade' probe) from the
per-group scale_bench outputs in /tmp. Groups ran separately so a grinding
row could be killed and root-caused without losing the others (which is
exactly what happened — SCALING.md 'shingle saturation' / 'isotropic
noise')."""

from __future__ import annotations

import json
import sys

OUT = "SCALE_r05c.json"


def main(paths: list[str]) -> None:
    sfs: dict[str, dict[str, float]] = {"1": {}, "10": {}}
    reps = None
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        reps = d["reps"] if reps is None else min(reps, d["reps"])
        for sf, rows in d["sfs"].items():
            key = "1" if float(sf) == 1 else "10"
            sfs[key].update(rows)
    ratios = {
        q: round(sfs["10"][q] / sfs["1"][q], 2)
        for q in sfs["1"]
        if q in sfs["10"] and sfs["1"][q] > 0
    }
    out = {
        "metric": "scale_probe_decade2",
        "unit": "sec",
        "reps": reps,
        "note": (
            "sf1 -> sf10 (10x rows again; 100x the sf0.1 bench SF). TPC-H "
            "group: reps=2 warm minima (a cold reps=1 pair disagreed by 18x "
            "on this shared box); other groups reps=1, self-consistent, read "
            "for super-linearity not absolute time. dedup_ngram_jaccard_fast "
            "/ dedup_clusters INVERT (ratio < 1) because the join-work "
            "budget caps the saturated shingle index at sf10 while sf1 fits "
            "under budget and runs the full exact join — see SCALING.md "
            "'shingle saturation'."
        ),
        "sfs": sfs,
        "ratios": ratios,
        "data_ratio": 10.0,
    }
    with open(OUT, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
