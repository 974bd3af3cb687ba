#!/usr/bin/env python3
"""Re-pin BASELINE_QUERIES.json from a Bench JSON line, with provenance.

Usage:
  python3 tools/pin_baseline.py BENCH.json [--reason "..."] [--out BASELINE_QUERIES.json]
  python3 tools/pin_baseline.py BENCH.json --dry-run

Reads `queries_min` (the stall-robust per-key min) and `sf` from the
bench output — either the raw one-line JSON `graft.Bench` prints, or a
driver BENCH_r{N}.json wrapper whose "tail" embeds that line. Then:

  * prints the per-key old->new delta table vs the current pin (added /
    removed / changed keys with ratios) — the provenance record; paste
    it (or its summary) into the re-pin commit;
  * REFUSES to write a pin that moves any existing key >1.3x SLOWER
    unless --reason names a cause (a pin that silently ratchets upward
    bakes slow drifts into the baseline);
  * records each key's first-rep time as "_first:<key>" metadata when
    the bench line carries `queries_first` — the cold-path reference
    for keys whose later reps hit in-JVM memos (graft.Bench ignores
    "_"-prefixed keys).
"""
import argparse
import json
import re
import sys

UPWARD_BAR = 1.3
# Below this many seconds a ratio is scheduler jitter, not a drift —
# mirrors graft.Bench's RegressionFloorSec.
ABS_FLOOR = 0.3
# Bench-line scalar metrics pinned as '_'-metadata alongside the query
# map (graders diff them by hand; graft.Bench ignores '_' keys).
THROUGHPUT_KEYS = ("pipeline_records_per_sec", "live_epoch_records_per_sec",
                   "live_epoch_overhead_sec", "live_epoch_marginal_rps",
                   "compaction_sec")


def load_bench_line(path):
    raw = open(path).read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries_min" in doc:
        return doc
    text = doc.get("tail", raw) if isinstance(doc, dict) else raw
    m = re.search(r'\{"metric":.*\}', text)
    if not m:
        sys.exit(f"no bench JSON line found in {path}")
    return json.loads(m.group(0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench")
    ap.add_argument("--out", default="BASELINE_QUERIES.json")
    ap.add_argument("--reason", default=None,
                    help="named cause for any >1.3x upward move")
    ap.add_argument("--merge", action="store_true",
                    help="add only keys MISSING from the pin (registry "
                         "growth); existing pins stay untouched, so a "
                         "slow bench window cannot ratchet the baseline")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    bench = load_bench_line(args.bench)
    mins = bench.get("queries_min")
    if not mins:
        sys.exit("bench line has no queries_min")
    firsts = bench.get("queries_first", {})
    sf_m = re.search(r"sf([0-9.]+)$", bench.get("sf", ""))
    if not sf_m:
        sys.exit(f"cannot parse sf from {bench.get('sf')!r}")
    sf = float(sf_m.group(1))

    try:
        old = json.load(open(args.out))
    except (FileNotFoundError, json.JSONDecodeError):
        old = {}
    old_q = {k: v for k, v in old.items() if not k.startswith("_")}
    if "_sf" in old and old["_sf"] != sf:
        sys.exit(f"sf mismatch: pin is sf{old['_sf']}, bench is sf{sf}")

    added = sorted(set(mins) - set(old_q))
    removed = sorted(set(old_q) - set(mins))
    slower = []
    print(f"{'key':32s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for k in sorted(mins):
        new = mins[k]
        if k in old_q:
            ratio = new / old_q[k] if old_q[k] > 0 else float("inf")
            flag = ""
            if ratio > UPWARD_BAR and new - old_q[k] > ABS_FLOOR:
                slower.append((k, old_q[k], new, ratio))
                flag = "  <-- SLOWER"
            print(f"{k:32s} {old_q[k]:8.3f} {new:8.3f} {ratio:6.2f}{flag}")
        else:
            print(f"{k:32s} {'--':>8s} {new:8.3f}    new")
    for k in removed:
        print(f"{k:32s} {old_q[k]:8.3f} {'--':>8s}    removed")
    print(f"\n{len(mins)} keys: {len(added)} added, {len(removed)} removed, "
          f"{len(slower)} moved >%.1fx slower" % UPWARD_BAR)

    if slower and not args.reason and not args.merge:
        for k, o, n, r in slower:
            print(f"  {k}: {o:.3f} -> {n:.3f} ({r:.2f}x)", file=sys.stderr)
        sys.exit("REFUSED: upward moves above need a named cause; "
                 "re-run with --reason \"...\" (or --merge to only add "
                 "new keys)")

    if args.dry_run:
        return
    if args.merge:
        # Registry growth: existing pins (and their cold references)
        # keep their VALUES and their file ORDER (python dicts preserve
        # insertion order, so the diff is append-only); new keys append
        # at the end with their own provenance note, and a merge note
        # flags that any pre-existing aggregate metadata (_source,
        # _total_min_sec) predates this merge. A no-op merge (nothing
        # to add) must not touch the file — a rewrite would append an
        # empty-key note, polluting the provenance each rerun.
        missing_tp = [k for k in THROUGHPUT_KEYS
                      if f"_{k}" not in old and bench.get(k, 0) > 0]
        if not added and not missing_tp:
            print("nothing to merge: every bench key is already pinned")
            return
        pin = dict(old) if old else {"_sf": sf}
        pin.setdefault("_sf", sf)
        note = pin.get("_merge_note", "")
        entry = (f"added {','.join(added + missing_tp)} from {args.bench}; "
                 "pre-existing _source/_total aggregates predate this merge")
        pin["_merge_note"] = (note + " | " if note else "") + entry
        for k in added:
            pin[k] = round(mins[k], 4)
            if k in firsts and firsts[k] > mins[k] * 1.05:
                pin[f"_first:{k}"] = round(firsts[k], 4)
        # Throughput metrics merge like query keys: only when ABSENT
        # (an existing throughput pin must not be ratcheted by a slow
        # or fast window any more than a query pin).
        for bench_key in THROUGHPUT_KEYS:
            meta = f"_{bench_key}"
            if meta not in pin and bench.get(bench_key, 0) > 0:
                pin[meta] = round(bench[bench_key], 2)
                print(f"pinned {meta} = {pin[meta]}")
    else:
        pin = {"_sf": sf}
        if args.reason:
            pin["_reason"] = args.reason
        pin["_pinned_from"] = args.bench
        # Carry forward auxiliary metadata the current pin accumulated
        # (_cpus, _pipeline_records_per_sec, _merge_note, ...) — a full
        # re-pin replaces the QUERY values, not the provenance trail.
        # Keys this re-pin itself writes (_sf/_reason/_pinned_from and
        # the per-key _first: cold references, rebuilt below) are
        # excluded; everything else is preserved and reported.
        rebuilt = {"_sf", "_reason", "_pinned_from"}
        carried = sorted(
            k for k in old
            if k.startswith("_") and k not in rebuilt
            and not k.startswith("_first:"))
        for k in carried:
            pin[k] = old[k]
        if carried:
            print(f"carried forward metadata: {', '.join(carried)}")
        for k in sorted(mins):
            pin[k] = round(mins[k], 4)
        for k in sorted(firsts):
            if k in mins and firsts[k] > mins[k] * 1.05:
                pin[f"_first:{k}"] = round(firsts[k], 4)
        # A full re-pin refreshes the throughput metadata from this
        # bench line (carried-forward stale values would misgrade). A
        # key the bench line does NOT carry positively (the live stage
        # errored, or an older Bench build) keeps its carried value but
        # is called out — otherwise a stale number silently inherits
        # this re-pin's fresh _pinned_from provenance.
        for bench_key in THROUGHPUT_KEYS:
            meta = f"_{bench_key}"
            if bench.get(bench_key, 0) > 0:
                pin[meta] = round(bench[bench_key], 2)
            elif meta in pin:
                print(f"WARNING: bench line has no positive {bench_key}; "
                      f"{meta}={pin[meta]} is carried forward and PREDATES "
                      f"this re-pin", file=sys.stderr)
    with open(args.out, "w") as f:
        json.dump(pin, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
