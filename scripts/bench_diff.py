#!/usr/bin/env python3
"""Join two BENCH_r*.json artifacts and print per-query ratio outliers.

Usage: scripts/bench_diff.py OLD_BENCH.json NEW_BENCH.json [--top N]

Each BENCH artifact stores the driver-captured stdout tail; the final
'{"metric":"total",...}' line is always complete and carries the
per-query MIN timings under short keys ("q59"). The cross-round signal
(Bench.scala's own methodology) is the ratio of each query's min
against the REGISTRY MEDIAN shift: host-level interference moves the
whole registry uniformly (round 12 measured a 1.88x uniform shift vs
round 9), so only queries well above that uniform factor are
regression candidates — and even those need two consecutive rounds
agreeing before they count.
"""
import json
import statistics
import sys


def load_queries(path: str) -> tuple:
    """Accepts a driver BENCH_r*.json artifact (stdout tail under
    "tail") or a raw file of bench stdout lines. Returns
    (short_key -> min_sec, host_factor or None, probe_cpus or None)."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        tail = doc.get("tail", "")
    except json.JSONDecodeError:
        doc = {"rc": None}
        tail = text
    # Prefer the full-name min map (queries_by_name) when a complete
    # line survives (always, in locally-captured stdout; in a driver
    # tail only when the registry is small enough) — fall back to the
    # guaranteed-complete closing total line's top-10 digest. Short-key
    # uniqueness in the fallback digest is guaranteed upstream: Bench
    # requires it before rendering, and CountSyncSpec pins it in CI.
    total_line = None
    full_line = None
    host_factor = None
    cpus = None
    for line in tail.splitlines():
        if line.startswith('{"metric":"total"'):
            total_line = line
        if line.startswith('{"metric":"host_factor"'):
            try:
                parsed = json.loads(line)
                host_factor = parsed["factor"]
                cpus = parsed.get("cpus")  # absent in pre-r17 artifacts
            except (json.JSONDecodeError, KeyError):
                pass
        if line.startswith('{"metric":"queries_by_name"'):
            try:
                json.loads(line)
                full_line = line
            except json.JSONDecodeError:
                pass  # truncated head of a driver tail
    if full_line is not None:
        qmap = json.loads(full_line)["queries"]
        short = {}
        for q, v in qmap.items():
            key = q.split("_")[0]
            if key in short:
                # Two registry names sharing a qNN prefix would silently
                # overwrite each other and mis-attribute bench deltas.
                sys.exit(f"{path}: duplicate short key {key} "
                         f"(second full name: {q}) — fix the registry")
            short[key] = v
        return short, host_factor, cpus
    if total_line is None:
        sys.exit(f"{path}: no complete total line in tail (rc={doc.get('rc')})")
    parsed = json.loads(total_line)
    return parsed["queries"], host_factor, cpus


def main() -> None:
    top = 10
    argv = sys.argv[1:]
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 2:
        sys.exit(__doc__)
    args = argv
    (old, old_hf, old_cpus) = load_queries(args[0])
    (new, new_hf, new_cpus) = load_queries(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        sys.exit("no common queries")
    # Host calibration (round-16 protocol): each bench tail carries a
    # host_factor line from Bench.hostProbeSec — a fixed CPU+shuffle
    # micro-probe with no IO. Dividing the measured cross-round factor
    # out of every ratio turns host drift (the round-15 1.37x uniform
    # slowdown) into arithmetic instead of manual A/B reruns. Artifacts
    # predating round 16 carry no line -> cal = 1 and the registry
    # median remains the only uniformity signal. The probe's 0.66 s
    # reference is pinned at 4 CPUs: factors measured at DIFFERENT cpu
    # counts differ for non-host reasons, so calibration refuses the
    # division rather than silently mis-calibrating (r17 protocol; a
    # pre-r17 artifact with no cpus field is assumed to be the
    # driver-default 4).
    cal = 1.0
    if old_hf and new_hf and (old_cpus or 4) != (new_cpus or 4):
        print(f"host calibration: REFUSED — probe cpu counts differ "
              f"(old={old_cpus or 4}, new={new_cpus or 4}); the factor "
              "reference is cpu-pinned, ratios are raw")
    elif old_hf and new_hf:
        cal = new_hf / old_hf
        print(f"host calibration: old_factor={old_hf:.3f} "
              f"new_factor={new_hf:.3f} -> dividing ratios by {cal:.2f}x")
    else:
        print("host calibration: factor line missing from "
              f"{'both' if not (old_hf or new_hf) else 'one'} artifact(s); "
              "ratios are raw (pre-round-16 artifact?)")
    ratios = {q: new[q] / old[q] / cal for q in common if old[q] > 0}
    med = statistics.median(ratios.values())
    print(f"common={len(common)}  only_old={sorted(set(old)-set(new))}  "
          f"only_new={sorted(set(new)-set(old))}")
    print(f"registry median calibrated shift: {med:.2f}x  "
          f"(should be ~1.0 when calibrated; outliers are well above)")
    print(f"{'query':<8}{'old_s':>8}{'new_s':>8}{'cal_ratio':>10}{'vs_med':>7}")
    flagged = sorted(ratios, key=ratios.get, reverse=True)[:top]
    for q in flagged:
        rel = ratios[q] / med
        # every OUTLIER term is calibrated, including the absolute-delta
        # noise guard: a raw-seconds delta on a faster new host (cal < 1)
        # could slip a genuinely regressed fast query under 0.3 s.
        mark = ("  <-- OUTLIER"
                if ratios[q] > 1.5 and rel > 1.25
                and new[q] / cal - old[q] > 0.3
                else "")
        print(f"{q:<8}{old[q]:>8.3f}{new[q]:>8.3f}{ratios[q]:>9.2f}x"
              f"{rel:>6.2f}x{mark}")


if __name__ == "__main__":
    main()
