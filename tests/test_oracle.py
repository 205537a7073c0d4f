"""Differential tests: every catalog query with an oracle must match
DuckDB at the test scale factor — the local mirror of the driver's t2
correctness gate."""

import pytest

from openetl_spark import catalog
from tests.oracle_utils import compare, duckdb_con

ORACLE_QUERIES = sorted(catalog.ORACLE)
ROWS_ONLY = sorted(set(catalog.QUERIES) - set(catalog.ORACLE))

# Queries whose EMPTINESS on testdata is semantically required. Every
# other oracle query must return >0 rows at the test SF — a 0-row match
# is vacuous (VERDICT r04 #1/#2: q20/join_anti/set_except rot).
EMPTY_OK: set[str] = set()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, con, name):
    df = catalog.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, catalog.ORACLE[name], allow_empty=name in EMPTY_OK)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    """VERDICT r02 #5: `count() >= 0` was vacuous (it passed while the
    LSH demo returned 0 rows). Every rows-only query is expected to
    produce rows on testdata; pair-shaped outputs must satisfy a < b."""
    df = catalog.QUERIES[name](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0, f"{name}: expected non-empty result on testdata"
    assert len(df.schema.fields) > 0
    cols = set(df.columns)
    if {"a", "b"} <= cols:  # similarity/dedup pair queries
        assert all(r["a"] < r["b"] for r in rows), f"{name}: pair order violated"


def test_driver_priority_window_integrity():
    """The driver checks the first 50 entries of queries(); this pins
    the contract: exactly 50 priority names, all real, no duplicates,
    every query newly added in r03 inside the window, and ordered_*
    views consistent with each other."""
    import __spark_entry__ as entry

    pri = catalog.DRIVER_PRIORITY
    assert len(pri) == 50 and len(set(pri)) == 50
    missing = [n for n in pri if n not in catalog.QUERIES]
    assert not missing, missing
    first50 = list(entry.queries())[:50]
    assert first50 == pri
    # round-12 rotation: the nine new queries, every DRIVER_RECHECK
    # entry (code/oracle changed since the last driver row), the
    # complete 10-entry r06-latest tail queue, and the head of the
    # 46-entry r07-latest refresh queue hold slots
    for newcomer in ("betweenness_report", "cluster_nmi_report",
                     "association_rules_k3", "markov_attribution",
                     "dp_event_counts", "ewma_user_values", "cusum_alerts",
                     "textrank_keywords", "holt_user_values",
                     "session_windows", "set_except", "simhash_dedup",
                     "skyline_parts", "sliding_counts", "sql_passthrough",
                     "string_funcs", "text_stats", "time_weighted_avg",
                     "tumbling_hourly",
                     "array_funcs_extended", "attribution_last_touch",
                     "bloom_decontaminate", "date_funcs_extended",
                     "decimal_agg", "decontaminate_ngram", "edit_distance",
                     "edit_similarity_pairs", "embedding_near_dup_exact",
                     "filtered_agg", "hll_cells", "hll_distinct_report",
                     "join_full_outer", "join_right", "json_funcs",
                     "lang_id_oracle", "map_funcs", "null_safe_join",
                     "percentile_exact", "pii_redaction", "pivot_dynamic",
                     "q10_returned_items", "q12_shipping_delay",
                     "q13_order_distribution", "q14_promo_share",
                     "q15_top_supplier",
                     *sorted(catalog.DRIVER_RECHECK)):
        assert newcomer in first50, newcomer
    o = entry.oracle_sql()
    q = entry.queries()
    assert set(o) <= set(q)
    assert list(o) == [n for n in q if n in o]  # same iteration order


def test_driver_window_completes_coverage():
    """r05 window contract: the 50 priority slots are exactly the
    catalog queries with no green row in CORRECTNESS_r01/r02, so after
    this round's driver run every query has ≥1 driver row. If a future
    round adds queries past 100, this guard flags the overflow rather
    than silently dropping coverage."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        checked |= set(json.load(open(path)))
    if not checked:  # fresh clone without driver artifacts
        pytest.skip("no CORRECTNESS records present")
    uncovered = [
        n for n in catalog.QUERIES
        if n not in checked and n not in catalog.DRIVER_PRIORITY
    ]
    # Every window slot must go to a query with no driver row yet; a
    # query may remain uncovered only when all 50 slots are already
    # spent on other unchecked queries (it then queues for next round).
    # DRIVER_RECHECK entries legitimately hold slots despite an old
    # green row: their code or oracle changed after the driver last
    # checked them, so the stale row doesn't cover the current code.
    wasted = [
        n
        for n in catalog.DRIVER_PRIORITY
        if n in checked and n not in catalog.DRIVER_RECHECK
    ]
    if uncovered and wasted:
        # The driver records a round's results against the window that
        # was live when it ran; once that record lands, every window
        # entry is "checked" and this invariant can't distinguish a
        # stale window from a wasteful one. Surface it as an explicit
        # rotation reminder, not a failure.
        if set(catalog.DRIVER_PRIORITY) <= checked:
            pytest.skip(
                f"driver consumed the current window — rotate DRIVER_PRIORITY "
                f"(uncovered: {uncovered})"
            )
        assert False, (
            f"window slots {wasted} re-check already-green queries while "
            f"{uncovered} have no driver row"
        )


def test_driver_entry_contract(spark):
    """The driver's t1 smoke gate calls __spark_entry__.entry(spark)
    and collects the result — pin the whole path (a catalog refactor
    once dropped catalog.flagship while queries() stayed healthy, and
    nothing else exercised entry())."""
    import __spark_entry__ as entry

    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1 and len(df.columns) >= 1
