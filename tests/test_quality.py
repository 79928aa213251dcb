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


def test_psi_drift_zero_for_identical_distributions(spark):
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.quality import psi_drift

    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = psi_drift(ref, ref, "v", n_bins=5).collect()
    assert len(out) == 5
    assert all(r["psi_term_nano"] == 0 for r in out)  # p == q in every bin
    assert all(r["ref_count"] == r["cur_count"] == 200 for r in out)


def test_psi_drift_detects_shift_in_top_bin(spark):
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.quality import psi_drift

    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    cur = spark.range(1000).select(((F.col("id") % 100) * 1.3).alias("v"))
    out = {r["bin"]: r for r in psi_drift(ref, cur, "v", n_bins=5).collect()}
    # mass shifted upward: top bin dominates the index and every term >= 0
    assert out[4]["psi_term_nano"] == max(r["psi_term_nano"] for r in out.values())
    assert all(r["psi_term_nano"] >= 0 for r in out.values())
    total = sum(r["psi_term_nano"] for r in out.values()) / 1e9
    assert total > 0.1  # conventional "significant drift" line


def test_confusion_matrix_counts_and_recall(spark):
    from youtubeanalyzerproject_big_data__spark.operators.quality import confusion_matrix

    rows = [
        (1, "en", "en"), (2, "en", "en"), (3, "en", "es"),   # en recall 2/3
        (4, "es", "es"),                                      # es recall 1.0
    ]
    df = spark.createDataFrame(rows, "id long, truth string, pred string")
    out = {(r["truth"], r["pred"]): r for r in confusion_matrix(df, "id", "truth", "pred").collect()}
    assert out[("en", "en")]["n"] == 2 and out[("en", "en")]["recall"] == round(2 / 3, 6)
    assert out[("en", "es")]["n"] == 1
    assert out[("es", "es")]["recall"] == 1.0


def test_fact_reconciliation_flags_drift(spark):
    from youtubeanalyzerproject_big_data__spark.operators.quality import fact_reconciliation

    orders = spark.createDataFrame(
        [(1, 100.0), (2, 999.0), (3, 50.0)], "o_orderkey long, o_totalprice double"
    )
    li = spark.createDataFrame(
        # order 1: exactly 100; order 2: 200 (drift 799); order 3: no lines
        [(1, 100.0, 0.0, 0.0), (2, 200.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    out = fact_reconciliation(orders, li).collect()[0]
    assert out["n_orders"] == 3
    assert out["n_matched"] == 1      # only order 1
    assert out["n_mismatched"] == 2   # order 2 drift + order 3 missing detail
    assert out["total_drift_micros"] == 799_000_000 + 50_000_000


def test_profile_drift_counts_and_ppm(spark):
    """dq4: exact null/distinct/row counts per column and integer DIV ppm
    rates on a crafted old/new pair."""
    from youtubeanalyzerproject_big_data__spark.operators.quality import profile_drift

    old = spark.createDataFrame([(1, "a"), (2, None), (3, "b")], "k long, s string")
    new = spark.createDataFrame([(1, "a"), (2, None), (3, "b"), (4, None), (4, "c")], "k long, s string")
    out = {r["column"]: r for r in profile_drift(old, new, ["k", "s"]).collect()}
    assert out["k"]["old_rows"] == 3 and out["k"]["new_rows"] == 5
    assert out["s"]["old_nulls"] == 1 and out["s"]["new_nulls"] == 2
    assert out["s"]["old_null_ppm"] == 1_000_000 // 3 and out["s"]["new_null_ppm"] == 400_000
    assert out["k"]["old_distinct"] == 3 and out["k"]["new_distinct"] == 4
    assert out["k"]["distinct_delta"] == 1


def test_decision_stump_finds_planted_split(spark):
    """m5: on a cleanly separable label the stump must recover the planted
    feature and the grid threshold adjacent to the rule, with zero
    errors."""
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.classify import decision_stump

    df = spark.range(1000).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 7).cast("double").alias("noise"),
        (F.col("id") >= 600).cast("long").alias("y"),
    )
    out = decision_stump(df, ["x", "noise"], "y", {"x": [200.0, 400.0, 600.0, 800.0], "noise": [1.0, 3.0, 5.0]}).collect()
    assert len(out) == 1
    r = out[0]
    assert r["feature"] == "x" and r["threshold"] == 600.0
    assert r["errors"] == 0 and r["acc_ppm"] == 1_000_000


def test_auc_exact_hand_computed(spark):
    """m6: tiny score/label set with a tie -- AUC counted by hand.
    scores: pos {3, 2}, neg {1, 2}.  Pairs: (3,1)+2 (3,2)+2 (2,1)+2
    (2,2 tie)+1 => num2 = 7 of 2*2*2 = 8 -> AUC = 0.875."""
    from youtubeanalyzerproject_big_data__spark.operators.classify import auc_exact

    df = spark.createDataFrame(
        [(3.0, 1), (2.0, 1), (1.0, 0), (2.0, 0)], "score double, y long"
    )
    row = auc_exact(df, "score", "y", bucket_span=1.0).collect()[0]
    assert (row["n"], row["n_pos"], row["n_neg"]) == (4, 2, 2)
    assert row["num2"] == 7
    assert row["auc_ppm"] == (1_000_000 * 7) // 8  # 875000


def test_auc_exact_perfect_and_degenerate(spark):
    from youtubeanalyzerproject_big_data__spark.operators.classify import auc_exact

    perfect = spark.createDataFrame(
        [(10.0, 1), (9.0, 1), (2.0, 0), (1.0, 0)], "score double, y long"
    )
    assert auc_exact(perfect, "score", "y").collect()[0]["auc_ppm"] == 1_000_000
    one_class = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, y long")
    assert auc_exact(one_class, "score", "y").collect()[0]["auc_ppm"] == -1  # sentinel


def test_auc_exact_bucket_span_invariant(spark):
    """The bucketed prefix sum is an implementation detail: any span gives
    the identical integer statistic."""
    from youtubeanalyzerproject_big_data__spark.operators.classify import auc_exact

    rows = [(float(i % 17) + 0.5 * (i % 3), 1 if (i * 7) % 11 > 4 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, "score double, y long")
    a = auc_exact(df, "score", "y", bucket_span=1.0).collect()[0]
    b = auc_exact(df, "score", "y", bucket_span=100.0).collect()[0]
    assert a.asDict() == b.asDict()


def test_pr_curve_hand_computed(spark):
    """m7: 4 rows, thresholds straddling the scores; sentinel when nothing
    clears the cut."""
    from youtubeanalyzerproject_big_data__spark.operators.classify import pr_curve

    df = spark.createDataFrame(
        [(10.0, 1), (8.0, 0), (5.0, 1), (1.0, 0)], "score double, y long"
    )
    out = {r["threshold"]: r for r in pr_curve(df, "score", "y", [6.0, 9.0, 100.0]).collect()}
    r6 = out[6.0]  # predicted pos: {10(y1), 8(y0)} -> tp=1 fp=1 fn=1
    assert (r6["tp"], r6["fp"], r6["fn"]) == (1, 1, 1)
    assert r6["precision_ppm"] == 500_000 and r6["recall_ppm"] == 500_000
    assert r6["f1_ppm"] == (1_000_000 * 2) // 4
    r9 = out[9.0]  # predicted pos: {10(y1)} -> perfect precision, half recall
    assert (r9["precision_ppm"], r9["recall_ppm"]) == (1_000_000, 500_000)
    r100 = out[100.0]  # nobody clears: precision sentinel, recall 0
    assert (r100["n_pred_pos"], r100["precision_ppm"], r100["recall_ppm"]) == (0, -1, 0)
