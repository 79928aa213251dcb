"""Constraint-audit operator: per-kind semantics and single-scan fusion."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def suite_df(spark):
    return spark.createDataFrame(
        [
            (1, 10, 5.0, "O"),
            (2, 20, 50.0, "F"),
            (2, None, 150.0, "P"),  # dup key, null fk, over range, bad status
            (3, 30, None, "O"),  # null value violates the range check
        ],
        "k long, fk long, v double, st string",
    )


def test_row_local_constraints_fuse_and_count(spark, suite_df):
    from youtubeanalyzerproject_big_data__spark.operators.quality import check_constraints

    ref = spark.createDataFrame([(10,), (20,)], "rk long")
    out = {
        r["check_name"]: r
        for r in check_constraints(
            suite_df,
            [
                {"name": "a_key_unique", "kind": "unique", "cols": ["k"]},
                {"name": "b_fk_not_null", "kind": "not_null", "col": "fk"},
                {"name": "c_v_range", "kind": "in_range", "col": "v", "lo": 0.0, "hi": 100.0},
                {"name": "d_status", "kind": "in_set", "col": "st", "values": ["O", "F"]},
                {"name": "e_fk_ref", "kind": "subset_of", "col": "fk", "ref": ref, "ref_col": "rk"},
            ],
        ).collect()
    }
    assert out["a_key_unique"]["n_violations"] == 1  # one extra copy of k=2
    assert out["b_fk_not_null"]["n_violations"] == 1
    assert out["c_v_range"]["n_violations"] == 2  # 150.0 over + NULL
    assert out["d_status"]["n_violations"] == 1  # 'P'
    assert out["e_fk_ref"]["n_violations"] == 1  # fk=30 not in ref (NULL fk skipped)
    assert all((r["passed"] == 1) == (r["n_violations"] == 0) for r in out.values())


def test_clean_table_passes_everything(spark):
    from youtubeanalyzerproject_big_data__spark.operators.quality import check_constraints

    df = spark.createDataFrame([(1, "O"), (2, "F")], "k long, st string")
    out = check_constraints(
        df,
        [
            {"name": "u", "kind": "unique", "cols": ["k"]},
            {"name": "s", "kind": "in_set", "col": "st", "values": ["O", "F"]},
        ],
    ).collect()
    assert all(r["passed"] == 1 and r["n_violations"] == 0 for r in out)


def test_unknown_kind_rejected(spark, suite_df):
    from youtubeanalyzerproject_big_data__spark.operators.quality import check_constraints

    with pytest.raises(ValueError, match="unknown constraint kind"):
        check_constraints(suite_df, [{"name": "x", "kind": "positive", "col": "v"}]).collect()


def test_row_local_checks_share_one_scan(spark, suite_df):
    """The three row-local checks must compile into ONE aggregate over one
    scan of the input -- adding a check adds a buffer column, not a pass."""
    from youtubeanalyzerproject_big_data__spark.operators.quality import check_constraints
    from youtubeanalyzerproject_big_data__spark.plans.inspect import executed_plan

    out = check_constraints(
        suite_df,
        [
            {"name": "b_fk_not_null", "kind": "not_null", "col": "fk"},
            {"name": "c_v_range", "kind": "in_range", "col": "v", "lo": 0.0, "hi": 100.0},
            {"name": "d_status", "kind": "in_set", "col": "st", "values": ["O", "F"]},
        ],
    )
    plan = executed_plan(out)
    # one partial+final aggregate pair, no join, no extra scans
    assert "Join" not in plan
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") <= 1
