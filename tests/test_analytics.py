"""Invariant tests for operators/analytics.py beyond DuckDB parity.

Parity (tests/test_oracle_parity.py) proves Spark == DuckDB; these prove
both are RIGHT: Z-order actually clusters, the CDC diff populates every
change class, Welch's t matches an independent pure-Python computation,
and the repetition metrics match a per-doc Python recount.
"""

from __future__ import annotations

import math

from json_parquet_convertor_spark import registry

registry.load_all()


def test_zorder_locality(spark, sf_dir):
    """Mean per-bucket envelope must be far narrower than the global range
    on BOTH dimensions — the property that makes min/max stats prune 2-D
    predicates after a Z-order rewrite."""
    rows = registry.QUERIES["q_sort_zorder"](spark, sf_dir).collect()
    assert len(rows) >= 4
    g_part = max(r.part_max for r in rows) - min(r.part_min for r in rows)
    g_supp = max(r.supp_max for r in rows) - min(r.supp_min for r in rows)
    mean_area = sum(
        (r.part_max - r.part_min + 1) * (r.supp_max - r.supp_min + 1)
        for r in rows
    ) / len(rows)
    # each bucket's 2-D envelope must cover a small fraction of the full
    # (part × supp) rectangle — that fraction is what min/max pruning skips
    assert mean_area < (g_part + 1) * (g_supp + 1) / 2


def test_cdc_all_classes_populated(spark, sf_dir):
    rows = registry.QUERIES["q_cdc_diff"](spark, sf_dir).collect()
    kinds = {r.change_type for r in rows}
    assert kinds == {"insert", "delete", "update"}
    for r in rows:
        if r.change_type == "insert":
            assert r.old_price is None and r.new_price is not None
        elif r.change_type == "delete":
            assert r.old_price is not None and r.new_price is None
        else:
            assert abs(r.old_price - 0.9 * r.new_price) < 1e-6


def test_ttest_matches_python_reference(spark, duck, sf_dir):
    """Recompute Welch's t from raw rows in pure Python (two-pass, no
    sufficient-statistic shortcut) — the engine's one-pass decimal version
    must agree to the reported rounding."""
    vals = {"click": [], "purchase": []}
    for et, v in duck.execute(
        "SELECT event_type, value FROM events"
        " WHERE event_type IN ('click','purchase')"
    ).fetchall():
        vals[et].append(round(v, 4))  # mirror the DECIMAL(18,4) cast
    a, b = vals["click"], vals["purchase"]
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t_ref = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))

    row = registry.QUERIES["q_stats_ttest"](spark, sf_dir).collect()[0]
    assert row.n1 == len(a) and row.n2 == len(b)
    assert abs(row.t_stat - t_ref) < 1e-3
    assert abs(row.mean_diff - (ma - mb)) < 1e-3


def test_repetition_matches_python_recount(spark, duck, sf_dir):
    """Per-doc bigram stats must equal a literal Python recount."""
    res = {
        r.doc_id: r
        for r in registry.QUERIES["q_text_repetition"](spark, sf_dir)
        .limit(1000)
        .collect()
    }
    docs = duck.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 10"
    ).fetchall()
    for doc_id, text in docs:
        ws = text.split(" ")
        grams = [f"{ws[i]} {ws[i+1]}" for i in range(len(ws) - 1)]
        if not grams:
            assert doc_id not in res
            continue
        counts: dict[str, int] = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        r = res[doc_id]
        assert r.n_bigrams == len(grams)
        assert r.n_distinct == len(counts)
        assert r.top_n == max(counts.values())


def test_incremental_merge_state_is_two_sided(spark, sf_dir):
    """Both the old-state and new-slice partials must contribute rows —
    otherwise the merge degenerates to a plain aggregate and proves
    nothing."""
    from json_parquet_convertor_spark.operators.analytics import _CUTOFF
    from json_parquet_convertor_spark.sources.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    n_old = orders.filter(orders.o_orderdate < _CUTOFF).count()
    n_new = orders.filter(orders.o_orderdate >= _CUTOFF).count()
    assert n_old > 0 and n_new > 0
    total = registry.QUERIES["q_agg_incremental"](spark, sf_dir)
    from pyspark.sql import functions as F

    merged_n = total.agg(F.sum("n_orders")).collect()[0][0]
    assert merged_n == n_old + n_new


def test_observe_metrics_collected(spark, sf_dir):
    """q_observe_qc's named observation must surface real metrics after an
    action, without a second scan."""
    df = registry.QUERIES["q_observe_qc"](spark, sf_dir)
    df.collect()
    # walk the logical plan to the CollectMetrics node's result
    from pyspark.sql.observation import Observation  # noqa: F401

    metrics = df._jdf.queryExecution().observedMetrics()
    row = metrics.get("qc").get()
    seen = row.getAs("rows_seen")
    assert seen > 0
    assert row.getAs("null_disc") == 0
    assert 0.0 <= row.getAs("min_disc") <= row.getAs("max_disc")
