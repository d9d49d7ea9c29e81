#!/usr/bin/env python3
"""Scale the driver-generated testdata up by integer replication
(development aid only; the shipped Scala library does not depend on
this — same status as check_oracle.py).

Usage: scale_up.py <src_sf_dir> <dst_dir> <factor>

Writes <dst_dir>/<table>.parquet single files (the layout both
graft.Tables and check_oracle.py's read_parquet expect), replicating
every fact table <factor> times with FK-consistent key offsets:
replica r adds r*stride to each key column, where stride = max(key)+1
in the source — so orders still point at valid customers, lineitems
at valid orders/parts/suppliers, and per-user event histories
replicate as DISTINCT users (output of user-grained operators scales
linearly). region/nation are dimensions shared by every replica and
are copied once, unchanged.

Text, embeddings, and timestamps are copied verbatim per replica:
identical texts make every document an exact near-dup of factor-1
others and multiply every shingle/band document-frequency by factor —
deliberately the HOT-BUCKET stress case for the df-capped dedup
family, while the DuckDB oracle sees the same bytes so hash-exact
comparisons stay valid.
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

# table -> {column: key_domain}; a domain's stride is shared by every
# column that references it (FK consistency)
KEYED = {
    "customer":   {"c_custkey": "cust"},
    "orders":     {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem":   {"l_orderkey": "order", "l_partkey": "part",
                   "l_suppkey": "supp"},
    "part":       {"p_partkey": "part"},
    "supplier":   {"s_suppkey": "supp"},
    "events":     {"event_id": "event", "user_id": "user"},
    "documents":  {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DIMENSIONS = ["region", "nation"]
# key domain -> (table, column) that defines its stride
DOMAIN_OF = {
    "cust": ("customer", "c_custkey"), "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"), "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"), "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"), "vec": ("embeddings", "vec_id"),
}


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    strides = {}
    for dom, (tbl, col) in DOMAIN_OF.items():
        t = pq.read_table(f"{src}/{tbl}.parquet", columns=[col])
        strides[dom] = pc.max(t.column(col)).as_py() + 1
    for tbl in DIMENSIONS:
        pq.write_table(pq.read_table(f"{src}/{tbl}.parquet"),
                       f"{dst}/{tbl}.parquet")
        print(f"{tbl}: copied (dimension)")
    for tbl, keys in KEYED.items():
        t = pq.read_table(f"{src}/{tbl}.parquet")
        replicas = []
        for r in range(factor):
            if r == 0:
                replicas.append(t)
                continue
            cols = []
            for name in t.schema.names:
                c = t.column(name)
                if name in keys:
                    off = r * strides[keys[name]]
                    c = pc.add(c, pa.scalar(off, type=c.type))
                cols.append(c)
            replicas.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{tbl}.parquet")
        print(f"{tbl}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
