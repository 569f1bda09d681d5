"""Contract tests for bench.py's stdout line.

The driver captures only the last 2000 bytes of bench stdout; round 1 lost the
official bench record because the JSON line was 2.8 KB. These tests pin that
the emitted line always fits the window for the *current* registry and that
the short-key mapping is deterministic and collision-free — without starting
Spark.
"""

from __future__ import annotations

import json

import bench
import __spark_entry__ as entrymod


def _fake_timings():
    return {name: 1.2345 for name in entrymod.queries()}


def test_bench_line_fits_driver_window():
    timings = _fake_timings()
    line, mapping = bench._fit_line(timings, sum(timings.values()), 0.1)
    assert len(line) <= bench.STDOUT_BUDGET, (
        f"bench stdout line is {len(line)} bytes; driver only captures the "
        f"last 2000 — extend bench.ABBREV for the new query names"
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "total_query_sec"
    assert parsed["unit"] == "sec"
    assert len(parsed["queries"]) == len(timings), "a timing was dropped"


def test_short_keys_unique_and_reversible():
    timings = _fake_timings()
    line, mapping = bench._fit_line(timings, sum(timings.values()), 0.1)
    parsed = json.loads(line)
    # every short key maps back to exactly one registered query name
    assert set(mapping.keys()) == set(parsed["queries"].keys())
    assert sorted(mapping.values()) == sorted(timings.keys())


def test_short_name_deterministic():
    assert bench.short_name("ann_cosine_topk") == "ann_cos_topk"
    assert bench.short_name("unknown_token_xyz") == "unknown_token_xyz"
