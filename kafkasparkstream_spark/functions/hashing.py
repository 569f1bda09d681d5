"""Deterministic cross-engine hashing primitives.

Everything the engine hashes for *semantics* (dedup signatures, sampling
buckets, split assignment) goes through md5 rather than Spark's native
``hash``/``xxhash64``: md5 is the one hash every engine implements
identically, so the DuckDB oracles — and any future re-implementation —
reproduce results bit-for-bit. The constructions here are the shared
building blocks; their SQL twins live next to the oracle strings in
``queries.py``.

At 100 TB these are per-row projections inside whole-stage codegen; md5
costs ~2× xxhash64 per call, which none of the dedup/sampling pipelines
notice next to their shuffles. Swap in xxhash64 only if hashing itself
profiles hot AND cross-engine reproducibility can be dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int(col: Column, hex_chars: int = 8, salt: str = "") -> Column:
    """First ``hex_chars`` hex chars of ``md5(salt || col)`` as a BIGINT.

    8 chars → 32-bit value (universal-hash base); up to 15 chars stays
    within int64. SQL twin: ``CAST(('0x' || substr(md5(<salt||col>), 1,
    N)) AS BIGINT)``.
    """
    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in [1, 15] to fit a signed int64")
    prefixed = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(
        F.substring(F.md5(prefixed.cast("binary")), 1, hex_chars), 16, 10
    ).cast("long")


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in ``[0, buckets)`` keyed on content: the
    sampling/split primitive. Same row → same bucket on any engine, under
    any partitioning."""
    return F.pmod(md5_int(col, 8, salt), F.lit(buckets))
