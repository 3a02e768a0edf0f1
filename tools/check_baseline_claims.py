#!/usr/bin/env python3
"""Validate BASELINE.md's round-row correctness claims against the driver's
CORRECTNESS_r*.json sidecars, and emit new round rows' claims mechanically.

The round-13 verdict flagged a hand-written "134/134 gated" claim that the
committed CORRECTNESS_r13.json contradicted (133/134, quality_classifier
hash-red). This tool makes that class of drift impossible to miss:

  python3 tools/check_baseline_claims.py            # check every round row
  python3 tools/check_baseline_claims.py --emit 14  # print round 14's claim

Check mode parses every "| <round> | <queries> | N/M ..." row of the
"Measured per round" table and fails (exit 1) when a row claims MORE passes
than its sidecar records — overstating the driver's own gate is the failure
mode; a row noting additional local verification beyond the sidecar is fine.
Dev tooling only - not part of the shipped library.
"""
import json
import os
import re
import sys


def sidecar_counts(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", d)

    def green(v):
        return (isinstance(v, dict) and v.get("hash_match")
                and v.get("rows_match", True) and v.get("schema_match", True))

    ok = sum(1 for v in qs.values() if green(v))
    bad = sorted(k for k, v in qs.items() if not green(v))
    return ok, len(qs), bad


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--emit":
        n = int(sys.argv[2])
        path = f"CORRECTNESS_r{n:02d}.json"
        ok, total, bad = sidecar_counts(path)
        extra = f" (red: {', '.join('`%s`' % b for b in bad)})" if bad else ""
        print(f"{ok}/{total} driver-gated per `{path}`{extra}")
        return
    fail = False
    with open("BASELINE.md") as f:
        md = f.read()
    for m in re.finditer(r"^\| (\d+) \| \d+ \| (\d+)/(\d+)", md, re.M):
        rnd, claimed = int(m.group(1)), int(m.group(2))
        path = f"CORRECTNESS_r{rnd:02d}.json"
        if not os.path.exists(path):
            # Round-14 lesson: a row written BEFORE its driver sidecar
            # exists must not lead with a pass-count at all — not even a
            # "LOCALLY"-qualified one. The claim cell stays "pending"
            # (local sweeps go in the notes) until the sidecar lands.
            print(f"round {rnd}: claim cell leads with {claimed}/{m.group(3)} "
                  f"but {path} does not exist yet — write 'pending' and keep "
                  "local-gate numbers in the notes column")
            fail = True
            continue
        ok, stotal, bad = sidecar_counts(path)
        if stotal == 0:  # empty sidecar (driver-side miss): no evidence
            continue
        if claimed > ok:
            print(f"round {rnd}: BASELINE claims {claimed}/{m.group(3)} but "
                  f"{path} records {ok}/{stotal}"
                  f" (red: {', '.join(bad) or 'none'})")
            fail = True
    # Bench-total discipline (r15 VERDICT #8), rounds >= 16: the bench
    # cell must lead with 'pending' until the DRIVER's BENCH_r{N}.json
    # exists, and once it does, the leading number must be the driver
    # sidecar's total (builder runs belong in the notes as supporting
    # evidence). Historical rows (<= 15) predate the rule.
    for m in re.finditer(r"^\| (\d+) \| \d+ \| [^|]* \| ([^|]*) \|", md, re.M):
        rnd, cell = int(m.group(1)), m.group(2).strip()
        if rnd < 16:
            continue
        lead = re.match(r"\**(\d+(?:\.\d+)?)", cell)
        path = f"BENCH_r{rnd:02d}.json"
        if not os.path.exists(path):
            if lead:
                print(f"round {rnd}: bench cell leads with {lead.group(1)} but "
                      f"{path} does not exist yet — write 'pending' and keep "
                      "builder-run numbers in the notes column")
                fail = True
            continue
        with open(path) as f:
            d = json.load(f)
        if "value" in d:
            driver_total = float(d["value"])
        else:
            # driver-wrapper shape: the stdout line's trailing 2000
            # chars under "tail" — the leading "value" may be cut, but
            # the trailing total_sec duplicate (r17 Bench) survives
            tm = re.search(r'"total_sec":(\d+(?:\.\d+)?)', d.get("tail", ""))
            if not tm:
                print(f"round {rnd}: {path} carries no recoverable total "
                      "(pre-r17 tail truncation) — bench cell not validated")
                continue
            driver_total = float(tm.group(1))
        if not lead:
            print(f"round {rnd}: bench cell must lead with the driver total "
                  f"{driver_total} from {path}")
            fail = True
        elif abs(float(lead.group(1)) - driver_total) > max(0.05, driver_total * 1e-3):
            print(f"round {rnd}: bench cell leads with {lead.group(1)} but "
                  f"{path} records {driver_total} — quote the driver sidecar")
            fail = True
    # sf1 refresh discipline (r16 VERDICT #7), rounds >= 17: every round
    # row needs a matching "- r<N> sf1 refresh: **<total> s** for <q>
    # queries" line in BASELINE's sf1 section, and the LATEST round's
    # line must quote the committed BENCH_SF1.json exactly (the sidecar
    # is refreshed on final code each round; older lines are historical
    # numbers from their own rounds' sidecars).
    rounds = [int(m.group(1))
              for m in re.finditer(r"^\| (\d+) \| \d+ \|", md, re.M)]
    latest = max(rounds) if rounds else 0
    if latest >= 17:
        refreshes = {
            int(m.group(1)): (float(m.group(2)), int(m.group(3)))
            for m in re.finditer(
                r"^- r(\d+) sf1 refresh: \*\*(\d+(?:\.\d+)?) s\*\* for (\d+)",
                md, re.M)}
        for rnd in [r for r in rounds if r >= 17]:
            if rnd not in refreshes:
                print(f"round {rnd}: no '- r{rnd} sf1 refresh: **<total> s** "
                      "for <q> queries' line in BASELINE's sf1 section — "
                      "refresh BENCH_SF1.json on final code and record it")
                fail = True
        if latest in refreshes:
            if not os.path.exists("BENCH_SF1.json"):
                print(f"round {latest}: sf1 refresh line exists but "
                      "BENCH_SF1.json does not — commit the sidecar")
                fail = True
            else:
                with open("BENCH_SF1.json") as f:
                    d = json.load(f)
                total, nq = float(d["value"]), len(d.get("queries", {}))
                ct, cq = refreshes[latest]
                if abs(ct - total) > max(0.05, total * 1e-3) or cq != nq:
                    print(f"round {latest}: sf1 refresh line claims {ct} s "
                          f"for {cq} queries but BENCH_SF1.json records "
                          f"{total} s for {nq} — quote the sidecar")
                    fail = True
    if fail:
        sys.exit(1)
    print("BASELINE round-row claims consistent with the driver sidecars")


main()
