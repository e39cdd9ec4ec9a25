#!/usr/bin/env python3
"""Fit per-operator growth exponents from two ScaleProbe runs.

Usage: python3 scripts/scaling_exponents.py <small> <big> [--factor F]

<small>/<big> are probe outputs (raw logs or the bare JSON line — same
extraction as compare_probe.py) taken on two datasets whose per-table
size ratio is F (default 4.0, the make_sfbig divisor-4 pair). For each
query present in both runs the fitted exponent is

    e = log(t_big / t_small) / log(F)

so e ~= 1 is linear scaling, e ~= 2 quadratic, e < 1 sublinear (fixed
overhead still being amortized at this size). Wall-clock noise on this
sandbox swings +-30% run-to-run, which perturbs e by up to
log(1.3)/log(4) ~= 0.19 — read the exponents as bands (linear-ish /
superlinear / quadratic-ish), not decimals. Queries that FAILED
(t < 0) on either side are listed separately, never fitted.

Exit 0 always (this is a measurement, not a gate); pipe the table into
review. The structural red flag to act on is e approaching 2 on an
operator whose design claims an equality-join candidate path.
"""
import math
import sys

from compare_probe import extract


def main():
    args = sys.argv[1:]
    factor = 4.0
    if "--factor" in args:
        i = args.index("--factor")
        try:
            factor = float(args[i + 1])
        except (IndexError, ValueError):
            sys.exit(__doc__)
        del args[i:i + 2]
    if len(args) != 2:
        sys.exit(__doc__)
    small, big = extract(args[0]), extract(args[1])
    if not small or not big:
        sys.exit("could not extract a probe JSON line from the inputs")
    sq, bq = small["queries"], big["queries"]
    rows, failed, skipped = [], [], []
    for name in sorted(set(sq) & set(bq)):
        ts, tb = sq[name], bq[name]
        if ts < 0 or tb < 0:
            failed.append(name)
            continue
        # only BOTH-sides-tiny is pure timer noise; tiny-small vs
        # large-big is precisely the blowup this tool exists to catch
        if ts < 0.05 and tb < 0.05:
            skipped.append(name)
            continue
        e = math.log(tb / ts) / math.log(factor)
        rows.append((e, name, ts, tb))
    rows.sort(reverse=True)
    print(f"# growth exponents at factor {factor:g} "
          f"({len(rows)} fitted, {len(failed)} failed, "
          f"{len(skipped)} sub-50ms-both-sides)")
    for e, name, ts, tb in rows:
        band = ("QUADRATIC-ish" if e >= 1.7 else
                "superlinear  " if e >= 1.3 else
                "linear-ish   " if e >= 0.5 else
                "sublinear    ")
        print(f"{name:26s} {ts:8.1f}s -> {tb:8.1f}s   e={e:+.2f}  {band}")
    for name in failed:
        print(f"{name:26s} FAILED on one side")
    for name in skipped:
        print(f"{name:26s} skipped (sub-50ms on both sides)")
    # flush INSIDE the caller's try: the table fits the stdio buffer,
    # so without this a closed pipe only EPIPEs at interpreter-exit
    # flush — outside any handler — and the exit-0 contract breaks
    sys.stdout.flush()


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        # the docstring says to pipe the table into review — a closed
        # `head` pipe is normal termination, not an error
        import os
        os._exit(0)
