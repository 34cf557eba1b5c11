#!/usr/bin/env python3
"""Regenerate the sf1.0 scale-check fixture (dev-only tooling, like
preflight.py — the engine itself is pure Scala).

Usage: python3 scripts/make_sf1.py [<sf0.1 dir>] [<out dir>] [<replicas>]

Round 8: <replicas> (default 10 = sf1) generalizes the same methodology
to further scale decades — `python3 scripts/make_sf1.py /root/testdata/sf0.1
target/sf3 30` builds the sf3 fixture used for the second-decade scaling
probe of the head queries (BASELINE.md "sf3 scale check").

Replicates the sf0.1 tables 10x with disjoint key remapping per replica:
every key column is offset by r * (max_key + 1), consistently across
tables (l_orderkey tracks o_orderkey's offset, l_partkey tracks
p_partkey's, ...), so joins stay internally consistent inside each
replica and replicas never collide. region/nation are fixed dimensions
and are copied verbatim. Doc/embedding payloads replicate verbatim, so
duplicate density is ~10x — deliberately adversarial for the near-dup
pair family. This is the round-5 methodology (BASELINE.md "sf1.0 scale
check"); the output lives in target/ (untracked) and dies with
`sbt clean` — rerun this script, ~1 min.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> {column: offset-domain}; columns sharing a domain share the
# same per-replica offset so cross-table joins stay consistent
KEYED = {
    "customer":   {"c_custkey": "custkey"},
    "supplier":   {"s_suppkey": "suppkey"},
    "part":       {"p_partkey": "partkey"},
    "orders":     {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem":   {"l_orderkey": "orderkey", "l_partkey": "partkey",
                   "l_suppkey": "suppkey"},
    "events":     {"event_id": "eventid", "user_id": "userid"},
    "documents":  {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}
VERBATIM = ["region", "nation"]


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    tables = {name: pq.read_table(f"{SRC}/{name}.parquet")
              for name in list(KEYED) + VERBATIM}
    # one offset per key DOMAIN = max over every column in that domain + 1
    domain_off = {}
    for name, cols in KEYED.items():
        for col, dom in cols.items():
            mx = pc.max(tables[name][col]).as_py()
            domain_off[dom] = max(domain_off.get(dom, 0), mx + 1)
    for name in VERBATIM:
        pq.write_table(tables[name], f"{OUT}/{name}.parquet")
    for name, cols in KEYED.items():
        t = tables[name]
        parts = []
        for r in range(REPLICAS):
            arrays = []
            for field in t.schema:
                a = t[field.name]
                if field.name in cols:
                    off = r * domain_off[cols[field.name]]
                    a = pc.cast(pc.add(a, off), field.type)
                arrays.append(a)
            parts.append(pa.table(arrays, schema=t.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{OUT}/{name}.parquet")
        print(f"{name}: {len(t)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
