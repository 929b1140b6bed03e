#!/usr/bin/env python3
"""Aggregate jstack samples: count, per distinguishing frame, how many
samples show the MAIN driver thread (or a named thread) inside it.
Usage: agg_stacks.py <stacks-file> [thread-name-substring]"""
import sys, re, collections

path = sys.argv[1]
want = sys.argv[2] if len(sys.argv) > 2 else "main"
samples = open(path).read().split("=== SAMPLE")
frames = collections.Counter()
tops = collections.Counter()
n = 0
for s in samples[1:]:
    # split into per-thread blocks
    blocks = re.split(r'\n"', s)
    for b in blocks:
        name = b.split('"')[0]
        if want not in name:
            continue
        lines = [l.strip() for l in b.splitlines() if l.strip().startswith("at ")]
        if not lines:
            continue
        n += 1
        tops[lines[0]] += 1
        seen = set()
        for l in lines:
            f = l[3:].split("(")[0]
            # keep two trailing components for readability
            parts = f.split(".")
            key = ".".join(parts[-3:])
            if key not in seen:
                seen.add(key)
                frames[key] += 1
        break  # one matching thread per sample
print(f"samples with thread '{want}': {n}")
print("\n-- top frames (any depth) --")
for f, c in frames.most_common(40):
    print(f"{c:4d}  {f}")
print("\n-- top leaf frames --")
for f, c in tops.most_common(20):
    print(f"{c:4d}  {f}")
