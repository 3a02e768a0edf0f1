#!/usr/bin/env python3
"""Numeric plan-shape regression check between two bench sidecars.

Usage: python3 tools/diff_shuffle.py OLD_BENCH_DETAIL.json NEW_BENCH_DETAIL.json

Compares the per-query `shuffle_bytes` maps and prints queries whose
shuffle volume grew more than 2x past a 256 KiB floor (a lost broadcast
or un-pushed filter shows up here before anyone eyeballs a plan), plus
queries that appeared/disappeared. Exit code 1 if any regression fires.
Dev tooling only - not part of the shipped library.
"""
import json
import sys

GROWTH = 2.0
FLOOR = 256 * 1024


def main(old_path, new_path):
    old = json.load(open(old_path)).get("shuffle_bytes", {})
    new = json.load(open(new_path)).get("shuffle_bytes", {})
    bad = []
    for q, nb in sorted(new.items()):
        ob = old.get(q)
        if ob is None:
            print(f"NEW  {q}: {nb/1e6:.1f} MB (no prior value)")
            continue
        if nb > FLOOR and nb > ob * GROWTH:
            bad.append((q, ob, nb))
    for q in sorted(set(old) - set(new)):
        print(f"GONE {q} (had {old[q]/1e6:.1f} MB)")
    for q, ob, nb in bad:
        print(f"REGRESSION {q}: {ob/1e6:.1f} -> {nb/1e6:.1f} MB "
              f"({nb/max(ob,1):.1f}x)")
    improved = [(q, old[q], nb) for q, nb in new.items()
                if q in old and old[q] > FLOOR and nb < old[q] / GROWTH]
    for q, ob, nb in sorted(improved, key=lambda t: t[1] - t[2], reverse=True):
        print(f"improved {q}: {ob/1e6:.1f} -> {nb/1e6:.1f} MB")
    print(f"== {len(bad)} shuffle regression(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
