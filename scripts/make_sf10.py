"""Synthesize an sf10 dataset (documents + embeddings only) for the second
scaling decade of the dedup/ANN families (VERDICT r5 item 7).

Same discipline as make_sf1.py: replicate the previous decade with shifted
key spaces (documents 10x, embeddings 4x — the driver's own observed
per-decade growth rates) and perturb each replica's text with one extra
token so exact dedup doesn't collapse 10-cliques into free wins.
Deterministic — no RNG. Only the two tables the dedup/ANN probe reads are
generated; the probe (scripts/scale_decades.py) runs Spark-side only, so
no oracle ever touches sf10.

Usage:
    python scripts/make_sf1.py    # prerequisite: .scratch/sf1.0
    python scripts/make_sf10.py
    python scripts/scale_decades.py
"""

from __future__ import annotations

import os

import duckdb

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(_ROOT, ".scratch", "sf1.0")
DST = os.path.join(_ROOT, ".scratch", "sf10")

SPECS: list[tuple[str, int, str]] = [
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
