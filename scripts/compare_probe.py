#!/usr/bin/env python3
"""Compare two ScaleProbe/Bench JSON emissions for RELATIVE regressions.

Usage: python3 scripts/compare_probe.py <old> <new> [--factor F] [--min-sec S]

<old>/<new> are files containing (possibly among log noise) one JSON
line with {"metric": ..., "queries": {name: seconds, ...}} — a raw
probe/bench stdout capture, a BENCH_r*.json whose "tail" embeds the
line, or the bare line itself. The LAST parseable line wins.

Why relative, not seconds: this sandbox's wall-clock swings up to 60×
from host-level CPU stealing invisible to the guest (see SURVEY.md
bench history), so absolute times across runs are meaningless. Each
query's new/old time ratio is taken, and a query is flagged when its
ratio exceeds --factor (default 3.0) times the MEDIAN ratio across
all queries. The median absorbs any run-wide speed difference
(uniform stealing, different CPU counts); a genuine blowup is one
query slowing down relative to its peers. Normalizing by run totals
instead would misfire when the OLD run's stealing was concentrated
in a few queries (their inflation suppresses every other share).
--min-sec (default 1.0) ignores flags whose new time is still tiny —
sub-second queries are timer noise.

Queries that newly FAIL (time < 0 or present only as an error) are
always flagged. Exit 0 = no flags, 1 = regressions, 2 = bad input.
"""
import json
import statistics
import sys


def extract(path):
    """Return the last {"metric":...} JSON object found in the file."""
    text = open(path, encoding="utf-8", errors="replace").read()
    # a BENCH_r*.json wrapper embeds the line inside its "tail" string;
    # loading it first unescapes that
    try:
        whole = json.loads(text)
        if isinstance(whole, dict):
            if "queries" in whole:
                return whole
            if isinstance(whole.get("tail"), str):
                text = whole["tail"]
    except ValueError:
        pass
    found = None
    for line in text.splitlines():
        i = line.find('{"metric"')
        if i < 0:
            continue
        try:
            obj = json.loads(line[i:])
        except ValueError:
            continue
        if isinstance(obj.get("queries"), dict):
            found = obj
    return found


def normalize(obj):
    """Per-query scalar map + contamination suspects.

    Bench emits two shapes: the compact stdout line (scalar medians) and
    bench_spread.json ({"med","min","max"} per query). When a spread is
    present, comparisons use MIN — on this host, co-tenant CPU stealing
    inflates individual samples 3-60× and the inflation is one-sided, so
    min is the least-contaminated estimator; med/min > 2 marks the
    query's median as a contamination suspect (not comparable across
    runs)."""
    qs, contam = {}, {}
    for name, v in obj["queries"].items():
        if isinstance(v, dict):
            qs[name] = v.get("min", v.get("med", -1.0))
            if v.get("min", 0) > 0 and v.get("med", 0) / v["min"] > 2.0:
                contam[name] = v["med"] / v["min"]
        else:
            qs[name] = v
    return qs, contam


def main():
    args = sys.argv[1:]
    factor, min_sec = 3.0, 1.0
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--factor":
            factor = float(args[i + 1]); i += 2
        elif args[i] == "--min-sec":
            min_sec = float(args[i + 1]); i += 2
        else:
            pos.append(args[i]); i += 1
    if len(pos) != 2:
        sys.exit("usage: compare_probe.py <old> <new> "
                 "[--factor F] [--min-sec S]")
    old, new = extract(pos[0]), extract(pos[1])
    if old is None or new is None:
        print(f"no probe/bench JSON line found in "
              f"{pos[0] if old is None else pos[1]}")
        sys.exit(2)

    old_qs, old_contam = normalize(old)
    new_qs, new_contam = normalize(new)
    for label, contam in (("old", old_contam), ("new", new_contam)):
        if contam:
            worst = ", ".join(f"{k} {v:.1f}x" for k, v in
                              sorted(contam.items(), key=lambda kv: -kv[1])[:5])
            print(f"note: {label} run contaminated (med/min>2) on "
                  f"{len(contam)} queries: {worst}")
    ratios = {name: new_qs[name] / old_qs[name]
              for name in new_qs
              if name in old_qs and old_qs[name] > 0 and new_qs[name] > 0}
    med = statistics.median(ratios.values()) if ratios else 1.0
    print(f"median new/old ratio: {med:.2f} over {len(ratios)} queries")
    flags = []
    for name in sorted(new_qs):
        if new_qs[name] < 0:
            # NEWLY failing only: a query failing identically in both
            # runs would otherwise flag forever and drown real signal
            if old_qs.get(name, 0) < 0:
                print(f"note: {name} failed in both runs")
            else:
                flags.append(
                    f"FLAG {name}: FAILED in new run "
                    f"({new.get('errors', {}).get(name, 'no message')})")
            continue
        r = ratios.get(name)
        if r is None:
            continue  # new query or failed-in-old: nothing to compare
        if new_qs[name] > min_sec and r > factor * med:
            flags.append(
                f"FLAG {name}: {old_qs[name]:.2f}s -> {new_qs[name]:.2f}s "
                f"(ratio {r:.1f}x vs median {med:.2f}x, bound "
                f"{factor}x median)")
    for name in sorted(set(old_qs) - set(new_qs)):
        print(f"note: {name} present only in old run")
    for f in flags:
        print(f)
    n = len(flags)
    print(f"== {n} regression flag{'s' if n != 1 else ''} over "
          f"{len(new_qs)} queries ==")
    sys.exit(1 if flags else 0)


if __name__ == "__main__":
    main()
