"""Unit tests for the self-maintaining driver-verification order.

Round 7 burned a full driver sampling round because a hand-rotated static
priority list was not re-rotated (the 18 never-checked queries sat one slot
past the 50-query window).  ``verify_order.compute_verify_order`` derives the
order from the CORRECTNESS_r*.json / BENCH_FULL*.json artifacts instead;
these tests pin that dropping a new CORRECTNESS file reshuffles the order
with no code change.
"""

from __future__ import annotations

import json
import os

from json_parquet_convertor_spark import verify_order


def _write(root, name, payload):
    with open(os.path.join(root, name), "w", encoding="utf-8") as f:
        json.dump(payload, f)


ROW = {"rows_match": True, "schema_match": True, "hash_match": True}


def test_never_checked_lead_cheapest_first(tmp_path):
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r01.json", {"q_a": ROW, "q_b": ROW})
    _write(
        root,
        "BENCH_FULL_r01.json",
        {"queries": {"q_a": 0.1, "q_b": 0.2, "q_slow": 9.0, "q_fast": 0.01}},
    )
    order = verify_order.compute_verify_order(
        ["q_a", "q_b", "q_slow", "q_fast"], root
    )
    # never-checked first, cheapest first within the tier
    assert order == ["q_fast", "q_slow", "q_a", "q_b"]


def test_new_correctness_file_reshuffles_without_code_change(tmp_path):
    root = str(tmp_path)
    keys = ["q_a", "q_b", "q_c"]
    _write(root, "CORRECTNESS_r01.json", {"q_a": ROW, "q_b": ROW})
    before = verify_order.compute_verify_order(keys, root)
    assert before[0] == "q_c"  # the only never-checked key leads

    # the driver samples q_c in round 2 -> on the next import q_c must fall
    # to the back (freshest check) with zero code edits
    _write(root, "CORRECTNESS_r02.json", {"q_c": ROW})
    after = verify_order.compute_verify_order(keys, root)
    assert after == ["q_a", "q_b", "q_c"]


def test_staleness_orders_the_checked_tier(tmp_path):
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r01.json", {"q_old": ROW, "q_mid": ROW})
    _write(root, "CORRECTNESS_r03.json", {"q_mid": ROW, "q_new": ROW})
    order = verify_order.compute_verify_order(["q_new", "q_mid", "q_old"], root)
    # oldest driver check first; the re-check in r03 refreshes q_mid
    assert order == ["q_old", "q_mid", "q_new"]


def test_changed_block_sits_after_never_checked(tmp_path):
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r01.json", {"q_a": ROW, "q_b": ROW, "q_c": ROW})
    order = verify_order.compute_verify_order(
        ["q_a", "q_b", "q_c", "q_never"], root, changed=["q_b", "q_never"]
    )
    # q_never stays in the leading never-checked tier even though it is also
    # listed as changed; q_b is pulled forward ahead of the stale rest
    assert order == ["q_never", "q_b", "q_a", "q_c"]


def test_changed_dedup_and_unknown_names_ignored(tmp_path):
    root = str(tmp_path)
    _write(root, "CORRECTNESS_r01.json", {"q_a": ROW, "q_b": ROW})
    order = verify_order.compute_verify_order(
        ["q_a", "q_b"], root, changed=["q_b", "q_b", "q_ghost"]
    )
    assert order == ["q_b", "q_a"]
    assert len(order) == len(set(order))


def test_malformed_artifacts_never_crash(tmp_path):
    root = str(tmp_path)
    with open(os.path.join(root, "CORRECTNESS_r01.json"), "w") as f:
        f.write("{not json")
    _write(root, "BENCH_FULL_r01.json", {"queries": "not-a-dict"})
    _write(root, "BENCH_FULL_r02.json", {"queries": {"q_a": "NaN-ish"}})
    order = verify_order.compute_verify_order(["q_b", "q_a"], root)
    # everything counts as never-checked; no cost info -> input order kept by
    # the frozen name tiebreak
    assert sorted(order) == ["q_a", "q_b"]


def test_bench_rounds_merge_latest_wins(tmp_path):
    root = str(tmp_path)
    _write(root, "BENCH_FULL.json", {"queries": {"q_a": 5.0, "q_b": 0.1}})
    _write(root, "BENCH_FULL_r02.json", {"queries": {"q_a": 0.05}})
    order = verify_order.compute_verify_order(["q_a", "q_b"], root)
    assert order == ["q_a", "q_b"]  # r02 override makes q_a the cheap one


def test_live_entry_order_has_no_never_checked_past_window():
    """The live __spark_entry__ order must place every never-driver-checked
    registry key inside the driver's ~50-query sampling window."""
    import __spark_entry__ as entry_mod

    repo_root = entry_mod._REPO_ROOT
    rounds = verify_order.last_checked_rounds(repo_root)
    order = entry_mod._VERIFY_PRIORITY
    never_positions = [i for i, k in enumerate(order) if k not in rounds]
    assert len(order) == len(set(order))
    if never_positions:
        assert max(never_positions) < 50, (
            "never-driver-checked queries fall outside the 50-query window: "
            f"{[order[i] for i in never_positions if i >= 50]}"
        )
