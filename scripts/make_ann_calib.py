#!/usr/bin/env python3
"""Generate a 4x embeddings corpus for ANN recall CALIBRATION.

make_sfbig.py's embeddings replicas (v + r*0.001) are right for SCALE
probes but degenerate for RECALL measurement: every query's true top-k
is its own near-identical replicas at cosine ~= 1, which any index
finds in the home cell -- recall saturates at 1.0 regardless of the
nprobe dial (measured: q41/q65/q68 all 1.00 on /tmp/sfbig).

Calibration needs the neighbor structure of the ORIGINAL corpus --
near-uniform on the 64-sphere, true top-k at cosine ~0.5 -- at 4x the
count. Each replica applies a cosine-preserving-but-decorrelating
orthogonal map instead of a perturbation:

    r0: v          r1: reverse(v)      r2: -v         r3: -reverse(v)

Reversal and global negation are permutation/sign maps, so each
replica is distributed exactly like the base corpus (iid-ish gaussian
coordinates stay iid-ish), while cross-replica cosines behave like
independent draws: cos(v, rev v) ~ N(0, 1/64), cos(v, -v) = -1. The
result: 4N near-uniform vectors with no privileged pairs.

For factors beyond 4 (the 16x corpus of the fourth dial calibration
point), replicas are CIRCULAR SHIFTS x global negation: shift by
(r % 8)*8 coordinates, negate for r >= 8. A circular shift is a
permutation (orthogonal, distribution-preserving), and the cosine
between two distinct-lag shifts of the same vector is the vector's
autocorrelation at that lag ~ N(0, 1/64) for iid-ish coordinates —
the same decorrelation quality as the reverse/negate maps. The one
privileged pair per base vector, (r, r+8) at cosine exactly -1, is
harmless for top-k.

Run:  python3 scripts/make_ann_calib.py [src_sf_dir] [out_dir] [factor]
      factor in {4 (default), 16}
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf4ann"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
if factor not in (4, 16, 64):
    sys.exit("factor must be 4, 16 or 64")
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

# replica ids live at r*1000000 offsets; a source corpus reaching that
# range would silently collide ids and corrupt every recall number
# measured downstream. The offset is part of the committed calibration
# artifacts' provenance, so guard it rather than auto-derive a new one.
max_id = con.sql(
    f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0]
if max_id >= 1000000:
    sys.exit(f"source corpus vec_ids reach {max_id} >= 1000000: replica "
             "offsets would collide — raise the offset for this corpus")

if factor == 4:
    variants = {
        0: "e.embedding",
        1: "list_reverse(e.embedding)",
        2: "list_transform(e.embedding, x -> -x)",
        3: "list_transform(list_reverse(e.embedding), x -> -x)",
    }
else:
    # factor 16: 8 lag-8 circular shifts x negation; factor 64: 32
    # lag-2 shifts x negation. Any distinct-lag pair's cross-cosine is
    # the autocorrelation at that lag ~ N(0, 1/64); the one privileged
    # pair per base vector (same lag, opposite sign, cosine exactly -1)
    # is harmless for top-k — same argument as the 16x corpus.
    half = factor // 2
    step = 64 // half

    def shifted(r):
        s = (r % half) * step
        base = ("e.embedding" if s == 0
                else f"e.embedding[{s + 1}:64] || e.embedding[1:{s}]")
        return (base if r < half
                else f"list_transform({base}, x -> -x)")
    variants = {r: shifted(r) for r in range(factor)}
selects = "\nUNION ALL\n".join(
    f"""SELECT e.vec_id + {r}*1000000 AS vec_id,
               {expr}::FLOAT[] AS embedding, e.label
        FROM '{src}/embeddings.parquet' e"""
    for r, expr in variants.items())
con.sql(f"COPY ({selects}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
n = con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
print(f"{out}/embeddings.parquet: {n} vectors "
      f"({os.path.getsize(os.path.join(out, 'embeddings.parquet')) // 1024} KB)")
