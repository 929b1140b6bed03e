#!/usr/bin/env python3
"""Diff two Bench JSON lines (e.g. BENCH_LOCAL_r03.json vs BENCH_r03.json):
per-query deltas sorted by regression size, plus totals. Exit 1 if any
query regressed more than --threshold (default 1.5x and >0.3s absolute).

REFUSES to compare when either side ran under ambient load
(load_start > --max-load, default 3.0): a loaded run's per-query deltas
track the machine, not the plans (the round-9 driver artifact recorded
q129 at 9.8x purely from load_avg 6). Override with --max-load=N or by
re-running the bench on an idle box — prefer the latter.

Usage: python3 scripts/compare_bench.py OLD.json NEW.json
       [--threshold 1.5] [--max-load 3.0]
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    max_load = 3.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else float(
                sys.argv[sys.argv.index(a) + 1])
        if a.startswith("--max-load"):
            max_load = float(a.split("=", 1)[1]) if "=" in a else float(
                sys.argv[sys.argv.index(a) + 1])
    def load(p):
        d = json.load(open(p))
        has = lambda x: "queries" in x or "queries_ms" in x
        if not has(d):  # driver wrapper: {n, rc, cpus, sf, tail, parsed}
            d = d.get("parsed") or {}
        if not has(d):
            sys.exit(f"{p}: bench line has neither 'queries' (named dict) "
                     "nor 'queries_ms' (compact array) — driver 'parsed' "
                     "is null or the artifact is not a bench line")
        return d

    def named(d, p, names=None):
        """Per-query seconds by name. The compact stdout line carries an
        unnamed integer-ms array in sorted-query-name order (qorder) —
        reconstruct names from the OTHER side's named dict when lengths
        match, else point at the named artifact."""
        if "queries" in d:
            q = dict(d["queries"])
        else:
            arr = d["queries_ms"]
            if names is None or len(names) != len(arr):
                sys.exit(
                    f"{p}: compact 'queries_ms' array ({len(arr)} entries) "
                    "needs a name list of the same length from the other "
                    "side's named dict — compare against a named artifact "
                    "(e.g. BENCH_LOCAL_latest.json) instead")
            q = {k: v / 1000.0 for k, v in zip(sorted(names), arr)}
        # the round-6 footgun: a -1 sentinel (failed query) poisons every
        # ratio and silently reads as a speedup in the total — refuse
        neg = sorted(k for k, v in q.items() if v < 0)
        if neg:
            sys.exit(f"{p}: contains {len(neg)} failed (-1) queries, e.g. "
                     f"{neg[:5]} — re-run the bench clean before comparing")
        return q
    old, new = load(args[0]), load(args[1])
    for d, p in ((old, args[0]), (new, args[1])):
        ls = d.get("load_start")
        if ls is not None and ls > max_load:
            sys.exit(
                f"{p}: load_start {ls} exceeds --max-load {max_load} — the "
                "run was contended and its per-query seconds measure the "
                "machine, not the plans. Re-run the bench on an idle box "
                "(or pass --max-load to override deliberately).")
    oq = named(old, args[0], names=new.get("queries"))
    nq = named(new, args[1], names=oq)
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
        else:
            ratio = b / a if a > 0 else float("inf")
            flag = "REGRESSED" if (ratio > thr and b - a > 0.3) else ""
            rows.append((ratio, name, a, b, flag))
    rows.sort(reverse=True)
    bad = 0
    for ratio, name, a, b, flag in rows:
        fa = "-" if a is None else f"{a:.2f}s"
        fb = "-" if b is None else f"{b:.2f}s"
        fr = "" if ratio == float("inf") else f" ({ratio:.2f}x)"
        print(f"{name:32s} {fa:>8s} -> {fb:>8s}{fr} {flag}")
        bad += flag == "REGRESSED"
    print(f"\ntotal {old['value']:.2f}s -> {new['value']:.2f}s "
          f"({len(oq)} -> {len(nq)} queries); {bad} regression(s) over {thr}x")
    return 1 if bad else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # harmless under `| head`
        sys.exit(0)
