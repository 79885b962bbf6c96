"""Deterministic sf1-scale fixture builder for the 100x stress sweep.

Scales /root/testdata/sf0.1 by REPLICAS=10 (lineitem ~6M rows,
documents ~50K) into var/sf1/ without touching the read-only driver
data. Replication is key-shifted so every surrogate key stays unique
and join fan-outs match the original distribution exactly:

- fact/dim keys: key' = key + r * (max(key)+1) — foreign keys shifted by
  the SAME stride, so orders⋈lineitem⋈customer cardinalities scale
  linearly with zero skew change.
- nation/region stay fixed (real dims don't grow with data volume).
- documents: replica r>0 rewrites ~1/2 of words (position-hash salted by
  r; trigram survival (1/2)^3 puts cross-replica Jaccard near 0.07,
  LSH collision ~1e-5), so cross-replica pairs fall well below any
  near-dup threshold —
  near-dup DENSITY (pairs per doc) matches sf0.1 and candidate volume
  scales linearly, which is exactly the property the stress sweep wants
  to measure. Within-replica near-dups survive untouched.
- embeddings: replica vectors perturbed per-dimension (~1% relative),
  preserving label-cluster geometry while keeping replica vectors
  distinct.
- events: user_id and event_id shifted; per-user session structure is
  identical, 10x the users.

Everything is plain deterministic DuckDB SQL (hash() is stable for a
given DuckDB build; the fixture is generated once and reused).

Usage: python tools/make_scale_fixture.py [out_dir] [replicas]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

TABLES_SHIFTED = {
    # table -> (key columns shifted by this table's own stride,
    #           {fk column -> parent table})
    "customer": (["c_custkey"], {}),
    "supplier": (["s_suppkey"], {}),
    "part": (["p_partkey"], {}),
    "orders": (["o_orderkey"], {"o_custkey": "customer"}),
    "lineitem": (
        [],
        {
            "l_orderkey": "orders",
            "l_partkey": "part",
            "l_suppkey": "supplier",
        },
    ),
    "events": (["event_id", "user_id"], {}),
}


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "var/sf1")
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({replicas})) AS r")

    # strides: one per base table, computed once so FK shifts agree
    stride = {}
    for t, keycols in {
        "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
        "orders": "o_orderkey",
    }.items():
        stride[t] = con.execute(f"SELECT MAX({keycols})+1 FROM {t}").fetchone()[0]
    ev_stride = con.execute("SELECT MAX(event_id)+1 FROM events").fetchone()[0]
    user_stride = con.execute("SELECT MAX(user_id)+1 FROM events").fetchone()[0]
    doc_stride = con.execute("SELECT MAX(doc_id)+1 FROM documents").fetchone()[0]
    vec_stride = con.execute("SELECT MAX(vec_id)+1 FROM embeddings").fetchone()[0]

    def copy(sql: str, name: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    copy("SELECT * FROM region", "region")
    copy("SELECT * FROM nation", "nation")
    copy(
        f"""SELECT c_custkey + r*{stride['customer']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM customer CROSS JOIN reps""",
        "customer",
    )
    copy(
        f"""SELECT s_suppkey + r*{stride['supplier']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM supplier CROSS JOIN reps""",
        "supplier",
    )
    copy(
        f"""SELECT p_partkey + r*{stride['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM part CROSS JOIN reps""",
        "part",
    )
    copy(
        f"""SELECT o_orderkey + r*{stride['orders']} AS o_orderkey,
                   o_custkey + r*{stride['customer']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders CROSS JOIN reps""",
        "orders",
    )
    copy(
        f"""SELECT l_orderkey + r*{stride['orders']} AS l_orderkey,
                   l_partkey + r*{stride['part']} AS l_partkey,
                   l_suppkey + r*{stride['supplier']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem CROSS JOIN reps""",
        "lineitem",
    )
    copy(
        f"""SELECT event_id + r*{ev_stride} AS event_id, ts,
                   user_id + r*{user_stride} AS user_id,
                   event_type, value, props
            FROM events CROSS JOIN reps""",
        "events",
    )
    # documents: replica 0 verbatim; replicas >0 rewrite ~25% of words so
    # cross-replica Jaccard collapses below near-dup thresholds.
    copy(
        f"""SELECT doc_id + r*{doc_stride} AS doc_id,
                   CASE WHEN r = 0 THEN text ELSE
                     array_to_string(
                       list_transform(string_split(text, ' '),
                         (w, i) -> CASE WHEN hash(i * 2654435761 + r) % 2 = 0
                                        THEN w || 'x' || r
                                        ELSE w END),
                       ' ')
                   END AS text,
                   lang, source,
                   CAST(NULL AS BIGINT) AS n_chars
            FROM documents CROSS JOIN reps""",
        "_documents_raw",
    )
    # n_chars must track the rewritten text (operators trust it)
    copy(
        f"""SELECT doc_id, text, lang, source,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM read_parquet('{out}/_documents_raw.parquet')""",
        "documents",
    )
    (out / "_documents_raw.parquet").unlink()
    copy(
        f"""SELECT vec_id + r*{vec_stride} AS vec_id,
                   CASE WHEN r = 0 THEN embedding ELSE
                     list_transform(embedding,
                       (x, i) -> CAST(x * (1.0 + (CAST(hash(vec_id * 31 + i * 7 + r)
                                                       % 21 AS BIGINT) - 10) / 1000.0) AS FLOAT))
                   END AS embedding,
                   label
            FROM embeddings CROSS JOIN reps""",
        "embeddings",
    )
    print(f"DONE -> {out}")


if __name__ == "__main__":
    main()
