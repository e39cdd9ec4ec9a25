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

CLUSTERED mode (VERDICT r13 #1): every corpus above is near-UNIFORM on
the 64-sphere — the *adversarial* geometry for IVF (no cell is a good
home for anything, neighbors spread across many cells). Real embedding
corpora are CLUSTERED, which is the regime the index dials were never
calibrated in. `--mog` generates a deterministic mixture-of-Gaussians
corpus with the three levels real corpora show:

  v(i) = G(cluster) + 0.5*G2(subcluster) + 0.5*G3(i)        [+ twins]

  - K top-level clusters (hash-assigned, balanced-ish): cross-cluster
    cosine ~ 0, the IVF-friendly structure.
  - 8 subclusters per cluster: within-subcluster cosine ~ 0.83,
    within-cluster-cross-subcluster ~ 0.67 — topical neighborhoods,
    the regime where top-k is genuinely contested between cells.
  - every 8th base vector gets a TWIN (id + N) at +0.05*G4 noise,
    cosine ~ 0.995 — the near-dup population the dedup (q71/q45) and
    ingest-screen (q76) gates need to be non-vacuous.

  All "randomness" is Box-Muller over hash(i*64+j, salt) — portable,
  seedless, reproducible row-for-row across runs and engines.

Run:  python3 scripts/make_ann_calib.py --mog <N_base> <K> <out_dir> [ctr sub]
      (final corpus has N_base + N_base/8 vectors; label = cluster id)

Optional [ctr sub] override the mixture coefficients (defaults 1.0
0.5). The defaults put within-subcluster cosine at ~0.83 — the
RETRIEVAL-calibration regime, where top-k is contested between cells
but every within-cluster pair sits far above the 0.42 near-dup
threshold, so the exact dedup baselines degenerate (q45's pair output
is ~all within-cluster pairs: measured 360 s at 36k vectors, pure
output volume). For DEDUP/SCREEN calibration use a weak-structure
corpus, e.g. `0.2 0.1` (noise stays 0.5): within-subcluster cosine
~0.17, within-cluster ~0.13 — topical structure k-means still aligns
cells to (cross-cluster is exactly 0), while the ≥0.42 dup population
is the twins plus the d=64 sampling tail (the realistic "dup gap ≫
topical similarity" regime; the tail is irreducible — any visible
cluster structure at 64 dims puts a percent-level mass of the ~N²/K
within-cluster pairs above 0.42).
"""
import os
import sys

import duckdb

if len(sys.argv) > 1 and sys.argv[1] == "--mog":
    n_base = int(sys.argv[2])
    k_clusters = int(sys.argv[3])
    out = sys.argv[4]
    c_ctr = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
    c_sub = float(sys.argv[6]) if len(sys.argv) > 6 else 0.5
    subs = 8
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def gauss(key, salt):
        # Box-Muller over two hash-derived uniforms in (0,1); the +0.5
        # offset keeps u strictly inside the interval
        u1 = f"((hash({key}, '{salt}a') % 1000000) + 0.5) / 1000000.0"
        u2 = f"((hash({key}, '{salt}b') % 1000000) + 0.5) / 1000000.0"
        return f"sqrt(-2.0 * ln({u1})) * cos(2.0 * pi() * {u2})"

    cell = f"(hash(i, 'cl') % {k_clusters})"
    # double hash: duckdb's two-arg hash preserves low-bit structure
    # between different salts of the SAME key (hash(i,'cl')%16 fully
    # determines hash(i,'su')%8 — measured, 16 of 128 combos), which
    # would collapse every cluster to a single subcluster; the outer
    # hash avalanches it away (128/128 combos)
    sub = f"(hash(hash(i, 'su')) % {subs})"
    val = (f"{c_ctr} * {gauss(f'({cell} * 64 + j)', 'ctr')} "
           f"+ {c_sub} * {gauss(f'(({cell} * {subs} + {sub}) * 64 + j)', 'sub')} "
           f"+ 0.5 * {gauss('(i * 64 + j)', 'noi')}")
    base = f"""
        SELECT i, j, {cell} AS c, CAST({val} AS DOUBLE) AS v
        FROM (SELECT unnest(range({n_base})) AS i),
             (SELECT unnest(range(64)) AS j)"""
    q = f"""
    WITH comp AS ({base}),
    rows_all AS (
        SELECT i AS vec_id, c, j, v FROM comp
        UNION ALL
        SELECT i + {n_base} AS vec_id, c, j,
               v + 0.05 * ({gauss('(i * 64 + j)', 'twn')}) AS v
        FROM comp WHERE i % 8 = 0
    )
    SELECT vec_id,
           list(CAST(v AS FLOAT) ORDER BY j)::FLOAT[] AS embedding,
           'c' || CAST(min(c) AS VARCHAR) AS label
    FROM rows_all GROUP BY vec_id ORDER BY vec_id"""
    con.sql(f"COPY ({q}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"{out}/embeddings.parquet: {n} clustered vectors "
          f"(K={k_clusters}, subs={subs}, twins=N/8)")
    sys.exit(0)

if len(sys.argv) > 1 and sys.argv[1] == "--zipf":
    # ZIPFIAN-vocabulary documents corpus for the TOKEN-JOIN family
    # (q31/q33/q46/q72): the fixture corpora carry a ~31-token
    # near-UNIFORM vocabulary — the adversarial case for PPjoin's
    # prefix filters (every prefix is a stop-word) and the DEGENERATE
    # case for posting skew (every posting equally huge). Real corpora
    # are Zipfian; this mode generates one deterministically:
    #
    #   token rank r drawn with density ∝ 1/r over V ranks via the
    #   exact inverse-CDF of continuous Zipf(s=1): r = V^u for
    #   hash-uniform u — the head token carries ~1/ln(V) of ALL token
    #   mass (V=50k → ~9%), the classic hot-posting regime.
    #
    # Near-dup structure for the dedup family: every doc i % 8 == 0
    # gets a mutated twin (same token sequence, ~10% of positions
    # re-drawn) — shingle/minhash/winnowing pairs exist by
    # construction, with the same N/8 pair budget as the MoG corpora.
    #
    #   python3 scripts/make_ann_calib.py --zipf N V out_dir
    n_docs = int(sys.argv[2])
    vocab = int(sys.argv[3])
    out = sys.argv[4]
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # doc length: 30 + (hash % 271) tokens — mean ~165, deterministic
    dl = "CAST(30 + (hash(i, 'len') % 271) AS BIGINT)"
    u = "(((hash(i * 1024 + p, 'tok') % 1000000) + 0.5) / 1000000.0)"
    mut_u = "(((hash(i * 1024 + p, 'mut') % 1000000) + 0.5) / 1000000.0)"
    rank = f"CAST(pow({vocab}, {u}) AS BIGINT)"
    mut_rank = f"CAST(pow({vocab}, {mut_u}) AS BIGINT)"
    q = f"""
    WITH pos AS (
        SELECT i, unnest(range({dl})) AS p
        FROM (SELECT unnest(range({n_docs})) AS i)),
    toks AS (SELECT i, p, 't' || CAST({rank} AS VARCHAR) AS tok FROM pos),
    docs AS (
        SELECT i AS doc_id, string_agg(tok, ' ' ORDER BY p) AS text
        FROM toks GROUP BY i
        UNION ALL
        -- mutated twins: re-draw ~10% of positions from a second hash
        SELECT i + {n_docs} AS doc_id,
               string_agg(CASE WHEN hash(i * 1024 + p, 'sel') % 10 = 0
                 THEN 't' || CAST({mut_rank} AS VARCHAR) ELSE tok END,
                 ' ' ORDER BY p) AS text
        FROM toks WHERE i % 8 = 0 GROUP BY i)
    SELECT doc_id, text, 'en' AS lang,
           'src' || CAST(doc_id % 10 AS VARCHAR) AS source,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM docs ORDER BY doc_id"""
    con.sql(f"COPY ({q}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    hot = con.sql(f"""
        WITH t AS (SELECT unnest(string_split(text, ' ')) tok
                   FROM '{out}/documents.parquet')
        SELECT sum(c), count(*), max(c)
        FROM (SELECT tok, count(*) c FROM t GROUP BY 1)
        """).fetchone()
    print(f"{out}/documents.parquet: {n} zipf docs, {hot[0]} tokens, "
          f"vocab {hot[1]}, hottest posting {hot[2]} "
          f"({100.0 * hot[2] / hot[0]:.1f}% of mass)")
    sys.exit(0)

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf4ann"
factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
if factor not in (4, 16, 64, 256):
    sys.exit("factor must be 4, 16, 64 or 256")
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
elif factor in (16, 64):
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
else:
    # factor 256 (the >=512k-vector radius-2 regime, VERDICT r17 #2):
    # 64 dims only offer 64 distinct circular shifts, so the map
    # family extends to shift x REVERSE x negate — all three are
    # permutation/sign maps (orthogonal, distribution-preserving).
    # Cross-cosine between any two distinct variants of one base
    # vector is an (auto)correlation-like sum of +-v_i v_j terms at
    # mismatched indexes ~ N(0, 1/64) for iid-ish coordinates; the
    # privileged pairs (same shift+reverse, opposite sign: cosine -1)
    # are harmless for top-k, same argument as factors 16/64.
    def shifted256(r):
        s = r % 64
        rev = (r // 64) % 2 == 1
        neg = r >= 128
        base = ("e.embedding" if s == 0
                else f"e.embedding[{s + 1}:64] || e.embedding[1:{s}]")
        if rev:
            base = f"list_reverse({base})"
        if neg:
            base = f"list_transform({base}, x -> -x)"
        return base
    variants = {r: shifted256(r) for r in range(factor)}
selects = "\nUNION ALL\n".join(
    f"""SELECT e.vec_id + {r}*1000000 AS vec_id,
               {expr}::FLOAT[] AS embedding, e.label
        FROM '{src}/embeddings.parquet' e"""
    for r, expr in variants.items())
con.sql(f"COPY ({selects}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
n = con.sql(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
print(f"{out}/embeddings.parquet: {n} vectors "
      f"({os.path.getsize(os.path.join(out, 'embeddings.parquet')) // 1024} KB)")
