"""The engine's named-query registry — the correctness surface.

Each entry pairs a Spark DataFrame program with the ANSI-SQL oracle DuckDB
runs on the same parquet tables. Names, column aliases, and value grids
(float rounding) match exactly on both sides so the driver's
order-insensitive value-hash compares clean.

Organized by SURVEY.md §2 operator id (reference parity) and by
training-data-pipeline extension group (dedup / similarity / text).

Split by family in round 8 (verdict item 8): each submodule registers its
queries into the shared QUERIES / ORACLE_SQL dicts on import; this package
module preserves the historical flat namespace of the original single-file
queries.py, so `from kafkasparkstream_spark import queries as Q` and every
existing helper import keep working unchanged.
"""

from kafkasparkstream_spark.queries import _shared  # noqa: F401
from kafkasparkstream_spark.queries._shared import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
    QueryFn,
    register,
)

# Import order = original registration order grouped by family;
# cross-module helper deps force the topological order below.
from kafkasparkstream_spark.queries import tpch as _tpch  # noqa: E402,F401
from kafkasparkstream_spark.queries import events_windows as _events_windows  # noqa: E402,F401
from kafkasparkstream_spark.queries import events_stats as _events_stats  # noqa: E402,F401
from kafkasparkstream_spark.queries import text as _text  # noqa: E402,F401
from kafkasparkstream_spark.queries import dedup as _dedup  # noqa: E402,F401
from kafkasparkstream_spark.queries import ann as _ann  # noqa: E402,F401
from kafkasparkstream_spark.queries import streaming as _streaming  # noqa: E402,F401
from kafkasparkstream_spark.queries import multimodal as _multimodal  # noqa: E402,F401
from kafkasparkstream_spark.queries import serving as _serving  # noqa: E402,F401


# Flat-namespace compatibility: the registry grew up as one module and its
# helpers are imported by tests, scripts and __spark_entry__ under their
# original names (e.g. `from kafkasparkstream_spark.queries import
# load_table, _drain_sink`). Re-export every submodule's top-level name.
_origin: dict[str, str] = {}
for _m in (_shared,_tpch, _events_windows, _events_stats, _text, _dedup, _ann, _streaming, _multimodal, _serving):
    for _k, _v in vars(_m).items():
        if _k.startswith("__"):
            continue
        if _k in _origin and globals().get(_k) is not _v:
            # First-import-wins would silently shadow a same-named helper
            # defined in two submodules (r8 ADVICE) — fail loudly instead.
            # Identical objects (cross-submodule imports of one helper,
            # e.g. load_table) are fine.
            raise ImportError(
                f"kafkasparkstream_spark.queries: top-level name {_k!r} is "
                f"defined differently in both {_origin[_k]!r} and "
                f"{_m.__name__!r} — rename one; the flat namespace cannot "
                "hold two"
            )
        if _k not in globals():
            globals()[_k] = _v
            _origin[_k] = _m.__name__
del _m, _k, _v, _origin
