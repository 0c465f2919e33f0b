"""Round-4 continuation (session d): fact-support evidence aggregation,
link-score calibration, blocking-quality metrics, HyperBall-style
neighborhood function."""

from __future__ import annotations


def test_fact_support_hand_computed(spark):
    from lamapi_spark.pipeline.triples import fact_support

    ev = spark.createDataFrame(
        [
            # fact A: 3 assertions across 2 convs (c1 twice)
            ("c1", 5, "e1", "p1", "o1"),
            ("c1", 9, "e1", "p1", "o1"),
            ("c2", 1, "e1", "p1", "o1"),
            # fact B: single assertion
            ("c9", 7, "e2", "p1", "o1"),
        ],
        "conv_id string, turn_idx int, subj string, pred string, obj string",
    )
    rows = {(r.subj, r.pred, r.obj): r for r in fact_support(ev).collect()}
    a = rows[("e1", "p1", "o1")]
    assert (a.support, a.n_convs) == (3, 2)
    # evidence pointers: struct-lexicographic min/max over (conv, turn)
    assert (a.first_conv, a.first_turn) == ("c1", 5)
    assert (a.last_conv, a.last_turn) == ("c2", 1)
    b = rows[("e2", "p1", "o1")]
    assert (b.support, b.n_convs) == (1, 1)
    assert (b.first_conv, b.first_turn) == ("c9", 7)
    assert (b.last_conv, b.last_turn) == ("c9", 7)
