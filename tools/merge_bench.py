#!/usr/bin/env python3
"""Merge N bench_full JSON sweeps into one min-of-sweeps record.

Usage: merge_bench.py out.json sweep1.json sweep2.json [...]

Per-query time = min over sweeps where the query succeeded (null = that
sweep failed it; a query failed in EVERY sweep stays null and is listed
in "failed"). "runs" concatenates every sweep's samples. The
"fineweb_stages" object — dropped by hand-merges before r16 — is
carried through as the ELEMENT-WISE min across sweeps that report it,
matching the per-query stance. Total = sum of merged per-query times.
"""
import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path, ins = sys.argv[1], sys.argv[2:]
    sweeps = [json.load(open(p)) for p in ins]

    names: list[str] = []
    for s in sweeps:
        for k in s["queries"]:
            if k not in names:
                names.append(k)

    queries, runs, failed = {}, {}, []
    for k in names:
        ts = [s["queries"][k] for s in sweeps
              if s["queries"].get(k) is not None]
        queries[k] = min(ts) if ts else None
        if not ts:
            failed.append(k)
        samples = []
        for s in sweeps:
            samples += s.get("runs", {}).get(k, [])
        runs[k] = samples

    merged = {
        "metric": "total",
        "value": sum(v for v in queries.values() if v is not None),
        "unit": "sec",
        "queries": queries,
        "runs": runs,
        "failed": failed,
    }

    stage_maps = [s["fineweb_stages"] for s in sweeps
                  if isinstance(s.get("fineweb_stages"), dict)]
    if stage_maps:
        stage_names: list[str] = []
        for m in stage_maps:
            for k in m:
                if k not in stage_names:
                    stage_names.append(k)
        merged["fineweb_stages"] = {
            k: min(m[k] for m in stage_maps if k in m) for k in stage_names}

    sfs = {s.get("sf") for s in sweeps}
    merged["sf"] = sweeps[0].get("sf") if len(sfs) == 1 else sorted(
        str(x) for x in sfs)

    with open(out_path, "w") as f:
        json.dump(merged, f)
        f.write("\n")
    print(f"merged {len(ins)} sweeps -> {out_path}: "
          f"{len(names)} queries, total {merged['value']:.1f}s, "
          f"fineweb_stages={'yes' if stage_maps else 'no'}")


if __name__ == "__main__":
    main()
