"""Registry-wide physical-plan lint (round 6).

`test_plans.py` pins hand-picked plan properties; this audit sweeps EVERY
registry entry's physical plan at sf0.001 and enforces the engine-wide
invariants, so a new entry (or a refactor of shared code) cannot silently
reintroduce a scale anti-pattern:

1. **No row-at-a-time Python UDFs** (`BatchEvalPython`) anywhere — the
   only Python stages allowed are Arrow-batched (`ArrowEvalPython` /
   `MapInPandas` / `FlatMapGroupsInPandas[WithState]`).
2. **No CartesianProduct** anywhere.
3. **BroadcastNestedLoopJoin only where a bounded side is attached** —
   the 1-row/stat-frame cross joins (explicit allowlist below). Anything
   else is an accidental theta join.
4. **Global-order windows (SinglePartition Window) only on entries that
   declare a structurally-bounded frame** (bucket-level rollups, global
   oracle variants — explicit allowlist with the bounding argument).

Streaming entries are excluded: building their DataFrame executes the
drain (they are covered by st-specific pins + the state-shape tests).
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entry_mod
from db_loganalyzer_spark.sources import tables

SF_DIR = "/root/testdata/sf0.001"

# entries whose BroadcastNestedLoopJoin is a bounded-side attach:
# 1-row stats frames, <=k-row centroid/threshold frames, tiny grids
BNLJ_OK = {
    # 1-row global stat/threshold frames broadcast onto a big side
    "j02_global_stats_z",
    "d09_rollback_analysis",
    "w09_relative_timeline",  # 1-row t0
    "t11_tfidf_terms",  # 1-row corpus-N
    "t12_bm25_search",  # 1-row avgdl
    "a22_hll_distinct",  # 1-row estimate vs exact attach
    "a32_hll_overlap",  # three 1-row estimate frames
    "m16_domain_mixture",  # 1-row n_min attach onto the per-source counts
    "a31_cumulative_hll",  # day-buckets x distinct-registers grid (sketch-bounded)
    # <=k-row centroid / query frames
    "cl02_cluster_reps",
    "cl03_cluster_summary",
    "cl04_kmeans_sizes",
    "sim01_bruteforce_topk",
}

# entries whose SinglePartition window runs over a structurally-bounded
# frame: one row per time bucket / per doc-score / episode — NOT per event
GLOBAL_WINDOW_OK = {
    "a10_zscore_hotspots",  # z over bucket-level counts
    "d06_zscore_hotspots",
    "a31_cumulative_hll",  # one row per day bucket
    "d04_recovery_loop",  # bucket+halo form (detectors.py docstring)
    "d09_rollback_analysis",  # version-sequence frame (recovery-event level)
    "d10_recovery_episodes",  # episode-level
    "t11_tfidf_terms",  # per-term rank over vocab-bounded frame
    "t12_bm25_search",  # top-k over per-doc score frame
}

def plan_str(spark, df, mode: str = "simple") -> str:
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def audit(spark):
    saved = dict(tables._CACHE)
    tables._CACHE.clear()
    plans = {}
    for name, fn in entry_mod.queries().items():
        if name.startswith("st"):
            continue  # building the frame executes the drain
        plans[name] = plan_str(spark, fn(spark, SF_DIR))
    tables._CACHE.clear()
    tables._CACHE.update(saved)
    return plans


def test_no_row_at_a_time_python_udfs(audit):
    bad = [n for n, p in audit.items() if "BatchEvalPython" in p]
    assert not bad, bad


def test_no_cartesian_products(audit):
    bad = [n for n, p in audit.items() if "CartesianProduct" in p]
    assert not bad, bad


def test_nested_loop_joins_only_on_bounded_attaches(audit):
    bad = [
        n
        for n, p in audit.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_OK
    ]
    assert not bad, f"unexpected theta/nested-loop join in: {bad}"


def test_global_windows_only_where_declared_bounded(audit):
    pat = re.compile(r"Window .*SinglePartition|SinglePartition.*Window")
    bad = []
    for n, p in audit.items():
        if n in GLOBAL_WINDOW_OK:
            continue
        # formatted/simple plans show the exchange feeding the window;
        # a SinglePartition exchange anywhere in a non-allowlisted
        # entry's plan is worth a look — windows are the usual cause
        if "SinglePartition" in p and "Window" in p:
            bad.append(n)
        elif pat.search(p):
            bad.append(n)
    assert not bad, f"undeclared global-order window in: {bad}"


def test_allowlists_not_stale(audit):
    # every allowlisted entry must still exhibit the pattern it excuses —
    # otherwise the allowlist rots and stops meaning anything
    gone = [
        n
        for n in BNLJ_OK
        if n in audit and "BroadcastNestedLoopJoin" not in audit[n]
    ]
    gone += [
        n
        for n in GLOBAL_WINDOW_OK
        if n in audit and "SinglePartition" not in audit[n]
    ]
    assert not gone, f"allowlisted pattern no longer present: {gone}"
