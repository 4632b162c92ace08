#!/usr/bin/env python3
"""Synthesize a 10x sf0.1 ("sf1") dataset for local scale-proof sweeps.

Usage: python3 tools/make_sf1.py [/root/testdata/sf0.1 [/tmp/sf1]]

Dev-only harness (like check.py) — the gates themselves never read this;
it exists so the SCALE.md sf1 growth table and ScaleProofSpec's sf1
plan-shape assertions are reproducible. Design choices:

- dimensions (region/nation/customer/supplier/part) copy as-is: dims
  don't grow with fact volume, and keeping them small preserves the
  broadcast-ability the plans rely on (the point of the scale proof is
  that the SAME plan shape survives 10x fact growth);
- facts replicate 10x with key offsets so ids stay unique; replica 0 is
  the original byte-for-byte;
- document texts repeat VERBATIM across replicas — realistic for a crawl
  corpus and deliberately adversarial-but-bounded for the dedup tier:
  every text becomes a 10-copy exact-dup cluster (constant cluster size,
  NOT quadratic pair growth — banded LSH and CC must absorb it);
- event timestamps shift by k microseconds so windows/sessions see
  distinct instants instead of 10 exact ties per event.
"""
import sys
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    def copy(sql, t):
        con.sql(f"COPY ({sql}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
    for t in ["region", "nation", "customer", "supplier", "part"]:
        copy(f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')", t)
    copy(f"""SELECT doc_id + k*10000000 AS doc_id, text, lang, source, n_chars
             FROM read_parquet('{sf_dir}/documents.parquet'), range(10) r(k)""",
         "documents")
    copy(f"""SELECT vec_id + k*10000000 AS vec_id, embedding, label
             FROM read_parquet('{sf_dir}/embeddings.parquet'), range(10) r(k)""",
         "embeddings")
    copy(f"""SELECT event_id + k*100000000 AS event_id,
                    ts + to_microseconds(k) AS ts,
                    user_id, event_type, value, props
             FROM read_parquet('{sf_dir}/events.parquet'), range(10) r(k)""",
         "events")
    copy(f"""SELECT o_orderkey + k*100000000 AS o_orderkey, o_custkey,
                    o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
             FROM read_parquet('{sf_dir}/orders.parquet'), range(10) r(k)""",
         "orders")
    copy(f"""SELECT l_orderkey + k*100000000 AS l_orderkey, l_partkey,
                    l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                    l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
             FROM read_parquet('{sf_dir}/lineitem.parquet'), range(10) r(k)""",
         "lineitem")
    for t in ["documents", "orders", "lineitem", "events", "embeddings"]:
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)

if __name__ == "__main__":
    import os
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    os.makedirs(out, exist_ok=True)
    main(sf, out)
