"""Top-N tests (SURVEY.md §2.6 T1): ties at the cut, groups smaller than N
(FIXTURES.md §4)."""

from __future__ import annotations

from test_flink_spark.operators.topn import top_n_by_count


def test_topn_tie_break_and_cut(spark):
    rows = [
        (1, 10, 5), (1, 11, 5), (1, 12, 5), (1, 13, 5),  # 4-way tie, N=3
        (2, 20, 9), (2, 21, 1),
    ]
    df = spark.createDataFrame(rows, "grp INT, item BIGINT, cnt BIGINT")
    out = top_n_by_count(df, ["grp"], "cnt", ["item"], n=3).collect()
    g1 = sorted((r["rank"], r["item"]) for r in out if r["grp"] == 1)
    # deterministic: ascending item id breaks the tie; item 13 cut
    assert g1 == [(1, 10), (2, 11), (3, 12)]
    g2 = sorted((r["rank"], r["item"]) for r in out if r["grp"] == 2)
    # group smaller than N emits all (reference loop break semantics)
    assert g2 == [(1, 20), (2, 21)]
