"""Synthesize the sf10 dataset for the second scaling decade.

Same discipline as make_sf1.py: replicate the previous decade with shifted
key spaces (documents/facts 10x, embeddings 4x — the driver's own observed
per-decade growth rates) and perturb each replica's text with one extra
token so exact dedup doesn't collapse 10-cliques into free wins.
Deterministic — no RNG. Round 5 generated only documents+embeddings (the
dedup/ANN probe); round 7 extends to ALL tables so the full-registry
oracle sweep (scripts/oracle_sweep.py) can run at sf10 (VERDICT r6 item
6). Existing outputs are skipped (generation is deterministic, so a skip
never changes data).

Usage:
    python scripts/make_sf1.py    # prerequisite: .scratch/sf1.0
    python scripts/make_sf10.py
    python scripts/scale_decades.py
    python scripts/oracle_sweep.py .scratch/sf10
"""

from __future__ import annotations

import os

import duckdb

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(_ROOT, ".scratch", "sf1.0")
DST = os.path.join(_ROOT, ".scratch", "sf10")

# Key shifts are the sf1.0 key-space widths (sf1.0 = 10x sf0.1's).
SPECS: list[tuple[str, int, str]] = [
    ("region", 1, "SELECT * FROM src"),
    ("nation", 1, "SELECT * FROM src"),
    ("supplier", 10,
     "SELECT s_suppkey + {r} * 10000 AS s_suppkey, * EXCLUDE (s_suppkey) FROM src"),
    ("customer", 10,
     "SELECT c_custkey + {r} * 150000 AS c_custkey, * EXCLUDE (c_custkey) FROM src"),
    ("part", 10,
     "SELECT p_partkey + {r} * 200000 AS p_partkey, * EXCLUDE (p_partkey) FROM src"),
    ("orders", 10,
     "SELECT o_orderkey + {r} * 1500000 AS o_orderkey,"
     "       o_custkey + {r} * 150000 AS o_custkey,"
     "       * EXCLUDE (o_orderkey, o_custkey) FROM src"),
    ("lineitem", 10,
     "SELECT l_orderkey + {r} * 1500000 AS l_orderkey,"
     "       l_partkey + {r} * 200000 AS l_partkey,"
     "       l_suppkey + {r} * 10000 AS l_suppkey,"
     "       * EXCLUDE (l_orderkey, l_partkey, l_suppkey) FROM src"),
    ("events", 10,
     "SELECT event_id + {r} * 1000000 AS event_id,"
     "       ts + INTERVAL ({r} * 13) SECOND AS ts,"
     "       user_id + {r} * 15000 AS user_id,"
     "       * EXCLUDE (event_id, user_id, ts) FROM src"),
    ("documents", 10,
     "SELECT doc_id + {r} * 50000 AS doc_id,"
     "       CASE WHEN {r} = 0 THEN text"
     "            ELSE text || ' decade{r}' END AS text,"
     "       * EXCLUDE (doc_id, text) FROM src"),
    ("embeddings", 4,
     "SELECT vec_id + {r} * 8000 AS vec_id, * EXCLUDE (vec_id) FROM src"),
]


def main() -> None:
    if not os.path.isdir(SRC):
        raise SystemExit("run scripts/make_sf1.py first")
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, reps, tmpl in SPECS:
        out = f"{DST}/{table}.parquet"
        src_path = f"{SRC}/{table}.parquet"
        if not os.path.exists(src_path):
            raise SystemExit(
                f"missing source {src_path} — run scripts/make_sf1.py first"
            )
        # Skip only when the output is NEWER than its source AND matches
        # the source's recorded size fingerprint: a regenerated sf1.0
        # restored with preserved mtimes must still invalidate sf10
        # (r7 ADVICE). Touch this file to force a full rebuild.
        fp_path = f"{out}.srcsize"
        src_size = os.path.getsize(src_path)
        fp_ok = False
        try:
            with open(fp_path) as f:
                fp_ok = int(f.read().strip()) == src_size
        except (OSError, ValueError):
            fp_ok = False
        if (
            os.path.exists(out)
            and fp_ok
            and os.path.getmtime(out) >= os.path.getmtime(src_path)
            and os.path.getmtime(out) >= os.path.getmtime(os.path.abspath(__file__))
        ):
            print(f"{table}: up to date, skipped")
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        )
        union = " UNION ALL ".join(tmpl.format(r=r) for r in range(reps))
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        with open(fp_path, "w") as f:
            f.write(str(src_size))
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")
    con.close()


if __name__ == "__main__":
    main()
