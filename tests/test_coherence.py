"""Collective linking (pipeline/coherence.coherence_rerank): coherence
votes flip a base-score-preferred wrong candidate; supporter mentions
count once regardless of parallel edges / multiple candidate paths."""

from __future__ import annotations

from lamapi_spark.pipeline.coherence import coherence_rerank


def run(spark, cands, edges, vote_scale=1000):
    c = spark.createDataFrame(
        cands, "group_id string, mention_id bigint, cand_id string, "
               "base_score_u bigint")
    e = spark.createDataFrame(edges, "a string, b string")
    out = coherence_rerank(c, e, vote_scale=vote_scale).collect()
    return {(r.group_id, r.mention_id): (r.cand_id, r.votes, r.final_u)
            for r in out}


def test_coherence_flips_popular_but_wrong_sense(spark):
    # mention 1 "paris": city (right in context) vs person (higher base);
    # mentions 2 and 3 resolve to france/seine which the KG ties to the city
    cands = [
        ("c1", 1, "paris_city", 10), ("c1", 1, "paris_person", 90),
        ("c1", 2, "france", 50),
        ("c1", 3, "seine", 50),
    ]
    edges = [("paris_city", "france"), ("paris_city", "seine")]
    got = run(spark, cands, edges)
    # city: 2 supporter mentions -> 10 + 2000; person: 0 -> 90
    assert got[("c1", 1)] == ("paris_city", 2, 2010)
    assert got[("c1", 2)] == ("france", 1, 1050)


def test_supporters_count_once_per_mention(spark):
    # m2 offers TWO candidates both adjacent to x, plus a parallel edge:
    # still one vote (distinct supporting mentions, not edge paths)
    cands = [
        ("g", 1, "x", 0), ("g", 1, "y", 5),
        ("g", 2, "n1", 0), ("g", 2, "n2", 0),
    ]
    edges = [("x", "n1"), ("x", "n2"), ("n1", "x")]
    got = run(spark, cands, edges)
    assert got[("g", 1)] == ("x", 1, 1000)


def test_no_cross_group_support_and_tiebreak(spark):
    # the only edge partner lives in ANOTHER group -> no vote; with all
    # scores level the smallest cand_id wins
    cands = [
        ("g1", 1, "a", 7), ("g1", 1, "b", 7),
        ("g2", 1, "n", 7),
    ]
    edges = [("a", "n")]
    got = run(spark, cands, edges)
    assert got[("g1", 1)] == ("a", 0, 7)
    assert got[("g2", 1)] == ("n", 0, 7)


# ------------------------------------------------------- NIL clusters

def test_nil_clusters_transitive_and_singleton(spark):
    from lamapi_spark.pipeline.linking import nil_clusters

    surfaces = spark.createDataFrame(
        [("j smith",), ("j smith jr",), ("j smith jr esq",),
         ("totally other person",), ("j smith",)],  # dup collapses
        "surface string")
    got = {r.surface: r.cluster_id
           for r in nil_clusters(surfaces, taun=1, taud=2).collect()}
    # chain: "j smith" ~ "j smith jr" (2/3) ~ "j smith jr esq" (3/4);
    # ends J("j smith","j smith jr esq") = 2/4 = tau -> also pairs at 1/2;
    # transitive closure puts all three in min-member cluster
    assert got["j smith"] == got["j smith jr"] == got["j smith jr esq"] == "j smith"
    assert got["totally other person"] == "totally other person"
    assert len(got) == 4


# --------------------------------------------------- tool-seq n-grams

def test_tool_ngrams_counts_and_short_convs(spark):
    from lamapi_spark.pipeline.triples import tool_sequence_ngrams

    rows = [
        # conv A: a>b>a>b  (2-grams: a>b x2, b>a x1)
        ("A", 1, "tool", "a"), ("A", 2, "tool", "b"),
        ("A", 3, "tool", "a"), ("A", 4, "tool", "b"),
        # conv B: a>b (one 2-gram); non-tool rows ignored
        ("B", 1, "tool", "a"), ("B", 2, "user", None), ("B", 3, "tool", "b"),
        # conv C: single call -> no 2-grams at all
        ("C", 1, "tool", "a"),
    ]
    trt = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")
    got = {r.pattern: (r.n_convs, r.n_occ)
           for r in tool_sequence_ngrams(trt, k=2).collect()}
    assert got == {"a>b": (2, 3), "b>a": (1, 1)}
    got3 = {r.pattern: (r.n_convs, r.n_occ)
            for r in tool_sequence_ngrams(trt, k=3).collect()}
    assert got3 == {"a>b>a": (1, 1), "b>a>b": (1, 1)}


# ----------------------------------------------- Fellegi-Sunter linkage

def test_fs_linkage_regions_and_nullsafe(spark):
    from lamapi_spark.ops.linkage import fs_link_pairs

    l = spark.createDataFrame(
        [("l1", "b1", "acme", "ny"), ("l2", "b2", "zeta", None)],
        "lid string, blk string, name string, city string")
    r = spark.createDataFrame(
        [("r1", "b1", "acme", "ny"),      # both agree -> match
         ("r2", "b1", "acme", "la"),      # one disagrees -> review
         ("r3", "b2", "other", "sf"),     # both disagree -> nonmatch
         ("r4", "b2", "zeta", None),      # NULL == NULL agreement
         ("r5", "b3", "acme", "ny")],     # different block -> no pair
        "rid string, blk string, name string, city string")
    out = fs_link_pairs(l, r, ("lid", "rid"), "blk",
                        {"name": (1000, -1000), "city": (500, -500)},
                        upper_bp=1200, lower_bp=-1200)
    got = {(x.id_l, x.id_r): (x.score_bp, x.verdict) for x in out.collect()}
    assert got == {
        ("l1", "r1"): (1500, "match"),
        ("l1", "r2"): (500, "review"),
        ("l2", "r3"): (-1500, "nonmatch"),
        ("l2", "r4"): (1500, "match"),
    }


# ------------------------------------------------ FS EM weight training

def _em_py(avecs, nf, iters, m0=9000, u0=1000, p0=500):
    """Independent integer reimplementation of fs_em_weights (<=2
    fields, so no rescale arm) — the differential twin."""
    clamp = lambda x: max(1, min(9999, x))  # noqa: E731
    p, m, u = p0, [m0] * nf, [u0] * nf
    for _ in range(iters):
        n, sg = len(avecs), 0
        sga, dga = [0] * nf, [0] * nf
        for a in avecs:
            M = U = 1
            for f in range(nf):
                M *= m[f] if a[f] else 10000 - m[f]
                U *= u[f] if a[f] else 10000 - u[f]
            num = p * M
            den = num + (10000 - p) * U
            g = (20000 * num + den) // (2 * den)
            sg += g
            for f in range(nf):
                if a[f]:
                    sga[f] += g
                    dga[f] += 10000 - g
        sgs, dss = max(1, sg), max(1, 10000 * n - sg)
        p = clamp((2 * sg + n) // (2 * n))
        m = [clamp((20000 * sga[f] + sgs) // (2 * sgs)) for f in range(nf)]
        u = [clamp((20000 * dga[f] + dss) // (2 * dss)) for f in range(nf)]
    return p, m, u


def test_fs_em_matches_integer_twin_and_separates(spark):
    from lamapi_spark.ops.linkage import fs_em_weights

    avecs = [(True, True)] * 3 + [(False, False)] * 2 + [(True, False)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in avecs], "agree_f1 boolean, agree_f2 boolean")
    got = fs_em_weights(pairs, ["f1", "f2"], iters=3).head()
    p, m, u = _em_py(avecs, 2, 3)
    assert (got.p_bp, got.m_f1_bp, got.u_f1_bp,
            got.m_f2_bp, got.u_f2_bp) == (p, m[0], u[0], m[1], u[1])
    # the informative fields separate: agreement is likelier under match
    assert got.m_f1_bp > got.u_f1_bp and got.m_f2_bp > got.u_f2_bp

    # partitioning invariance: BIGINT sums commute
    again = fs_em_weights(pairs.repartition(7), ["f1", "f2"],
                          iters=3).head()
    assert again == got


def test_fs_em_rescale_arm_three_fields(spark):
    from lamapi_spark.ops.linkage import fs_em_weights

    # 3 fields exercises the shift=10^4 product rescale; just pin
    # determinism + interior-point clamps (twin would need the same
    # rescale — directional checks suffice for the arm)
    avecs = [(True, True, True)] * 4 + [(False, False, True)] * 3
    pairs = spark.createDataFrame(
        avecs, "agree_x boolean, agree_y boolean, agree_z boolean")
    one = fs_em_weights(pairs, ["x", "y", "z"], iters=2).head()
    two = fs_em_weights(pairs.repartition(5), ["x", "y", "z"],
                        iters=2).head()
    assert one == two
    for v in one:
        assert 1 <= v <= 9999
    assert one.m_x_bp > one.u_x_bp
