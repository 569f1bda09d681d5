"""Synthesize an sf1.0 dataset for the scaling study (VERDICT r2, item 2).

The driver provides sf{0.001,0.01,0.1} only (read-only). For one measured
decade of scaling (sf0.1 → sf1.0 per-query ratios) we replicate sf0.1 with
shifted key spaces, mirroring how the driver's own generator scales between
sf0.01 and sf0.1 (observed: key spaces stay contiguous 0..N-1 and grow
10×; the events time window stays fixed at 30 days of Jan-2024 so per-user
and per-window densities grow; embeddings grew 4× per decade; region/nation
are fixed dimensions).

Per-replica perturbations keep the copy from being byte-identical where it
would distort a query's working set (documents get one extra token so exact
dedup doesn't collapse 10-cliques to free wins; events timestamps jitter a
few seconds so windows aren't 10 identical layouts). Everything is
deterministic — no RNG.

Output: .scratch/sf1.0/*.parquet (gitignored). Usage:

    python scripts/make_sf1.py
    SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1.0 python bench.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scratch", "sf1.0")

# (table, replicas, SELECT template with {r} available)
SPECS: list[tuple[str, int, str]] = [
    ("region", 1, "SELECT * FROM src"),
    ("nation", 1, "SELECT * FROM src"),
    ("supplier", 10,
     "SELECT s_suppkey + {r} * 1000 AS s_suppkey, * EXCLUDE (s_suppkey) FROM src"),
    ("customer", 10,
     "SELECT c_custkey + {r} * 15000 AS c_custkey, * EXCLUDE (c_custkey) FROM src"),
    ("part", 10,
     "SELECT p_partkey + {r} * 20000 AS p_partkey, * EXCLUDE (p_partkey) FROM src"),
    ("orders", 10,
     "SELECT o_orderkey + {r} * 150000 AS o_orderkey,"
     "       o_custkey + {r} * 15000 AS o_custkey,"
     "       * EXCLUDE (o_orderkey, o_custkey) FROM src"),
    ("lineitem", 10,
     "SELECT l_orderkey + {r} * 150000 AS l_orderkey,"
     "       l_partkey + {r} * 20000 AS l_partkey,"
     "       l_suppkey + {r} * 1000 AS l_suppkey,"
     "       * EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM src"),
    ("events", 10,
     "SELECT event_id + {r} * 100000 AS event_id,"
     "       ts + INTERVAL ({r} * 7) SECOND AS ts,"
     "       user_id + {r} * 1500 AS user_id,"
     "       * EXCLUDE (event_id, user_id, ts) FROM src"),
    ("documents", 10,
     "SELECT doc_id + {r} * 5000 AS doc_id,"
     "       CASE WHEN {r} = 0 THEN text"
     "            ELSE text || ' replica{r}' END AS text,"
     "       * EXCLUDE (doc_id, text) FROM src"),
    # driver scaled embeddings 4x per decade (500 -> 2000)
    ("embeddings", 4,
     "SELECT vec_id + {r} * 2000 AS vec_id, * EXCLUDE (vec_id) FROM src"),
]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, reps, tmpl in SPECS:
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        )
        union = " UNION ALL ".join(tmpl.format(r=r) for r in range(reps))
        out = f"{DST}/{table}.parquet"
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")
    con.close()


if __name__ == "__main__":
    main()
