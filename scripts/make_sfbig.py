#!/usr/bin/env python3
"""Generate /tmp/sfbig, the replicated scale-probe dataset for
`graft.ScaleProbe` (documents x40, embeddings x4, facts x20 over sf0.1).

Documents get a per-replica token prefix (regexp over every token), so
within-replica near-dup structure is preserved exactly while replicas
stay disjoint in token/shingle space — the corpus and its vocabulary
both scale, which is what exposes quadratic candidate generation.
Run:  python3 scripts/make_sfbig.py [src_sf_dir] [out_dir] [divisor]

`divisor` (default 1) divides every replication factor, keeping the
per-table RATIO between two generated datasets exact: divisor 4 gives
documents x10 / embeddings x1 / facts x5 — each table exactly 4x
smaller than the default — which is what
scripts/scaling_exponents.py needs to fit per-operator growth
exponents from two probe runs.
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfbig"
div = int(sys.argv[3]) if len(sys.argv) > 3 else 1
# every base factor must divide EXACTLY or the two datasets' per-table
# ratio is not the claimed factor and every fitted exponent is skewed
if any(base % div for base in (40, 4, 20)):
    sys.exit(f"divisor {div} must divide 40, 4 and 20 exactly (use 1, 2 or 4)")
docs_r, emb_r, facts_r = 40 // div, 4 // div, 20 // div
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

copies = {
    "documents": f"""
      SELECT d.doc_id + r.r*1000000 AS doc_id,
             regexp_replace(d.text, '(\\S+)', 'r' || r.r || '\\1', 'g') AS text,
             d.lang, d.source, d.n_chars
      FROM '{src}/documents.parquet' d, (SELECT unnest(range({docs_r})) AS r) r""",
    "embeddings": f"""
      SELECT e.vec_id + r.r*1000000 AS vec_id,
             list_transform(e.embedding, x -> x + r.r*0.001)::FLOAT[] AS embedding,
             e.label
      FROM '{src}/embeddings.parquet' e, (SELECT unnest(range({emb_r})) AS r) r""",
    "lineitem": f"""
      SELECT l.* REPLACE (l.l_orderkey + r.r*100000000 AS l_orderkey)
      FROM '{src}/lineitem.parquet' l, (SELECT unnest(range({facts_r})) AS r) r""",
    "orders": f"""
      SELECT o.* REPLACE (o.o_orderkey + r.r*100000000 AS o_orderkey,
                          o.o_custkey + r.r*1000000 AS o_custkey)
      FROM '{src}/orders.parquet' o, (SELECT unnest(range({facts_r})) AS r) r""",
    "events": f"""
      SELECT e.* REPLACE (e.event_id + r.r*100000000 AS event_id,
                          e.user_id + r.r*1000000 AS user_id)
      FROM '{src}/events.parquet' e, (SELECT unnest(range({facts_r})) AS r) r""",
}
for t, q in copies.items():
    con.sql(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
for t in ("region", "nation", "customer", "supplier", "part"):
    con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
for t in sorted(os.listdir(out)):
    print(t, os.path.getsize(os.path.join(out, t)) // 1024, "KB")
