"""TransE-L1 fixed-point training (ops/kg_embed.py): learning on a
planted translational structure, exact partition independence, the
clamp bound, and the null-neg degrade."""

from __future__ import annotations

from pyspark.sql import functions as F

from lamapi_spark.ops.kg_embed import (
    transe_init,
    transe_loss,
    transe_score,
    transe_train,
)


def _planted(spark, n=40):
    """A perfectly learnable KG: entities 0..n-1 on a line, relation
    'next' links i -> i+1; corrupted tails drawn far away, so the
    margin separates pos from neg once h + r ~ t."""
    rows = [(str(i), "next", str(i + 1), str((i + 17) % n))
            for i in range(n - 1)]
    rows = [r for r in rows if r[3] != r[2]]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, neg_obj string")


def test_loss_decreases_on_learnable_corpus(spark):
    tn = _planted(spark)
    kw = dict(d=4, lr_u=2, margin_u=100, init_u=50, clamp_u=1000)
    e0 = transe_train(tn, iters=0, **kw)
    e2 = transe_train(tn, iters=2, **kw)
    e4 = transe_train(tn, iters=4, **kw)
    l0 = transe_loss(tn, e0).collect()[0]
    l2 = transe_loss(tn, e2).collect()[0]
    l4 = transe_loss(tn, e4).collect()[0]
    assert l0.loss_u > 0  # random init violates somewhere
    assert l2.loss_u < l0.loss_u
    assert l4.loss_u <= l2.loss_u


def test_partition_independence_bit_exact(spark):
    tn = _planted(spark)
    kw = dict(d=3, iters=2, lr_u=2, margin_u=100, init_u=50, clamp_u=1000)
    a = transe_train(tn, **kw)
    b = transe_train(tn.repartition(7), **kw)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b


def test_clamp_bounds_every_coordinate(spark):
    tn = _planted(spark)
    emb = transe_train(tn, d=3, iters=3, lr_u=500, margin_u=100,
                       init_u=50, clamp_u=120)
    mx = emb.agg(F.max(F.abs(F.col("w_u"))).alias("m")).collect()[0].m
    assert mx <= 120


def test_null_neg_rows_train_nothing(spark):
    tn = _planted(spark)
    with_nulls = tn.unionByName(spark.createDataFrame(
        [("998", "next", "999", None)],
        "subj string, pred string, obj string, neg_obj string"))
    kw = dict(d=3, iters=2, lr_u=2, margin_u=100, init_u=50, clamp_u=1000)
    a = sorted(map(tuple, transe_train(tn, **kw).collect()))
    b = sorted(map(tuple, transe_train(with_nulls, **kw).collect()))
    assert a == b  # the degraded row contributes no entity and no grad


def test_score_prefers_true_tails_after_training(spark):
    tn = _planted(spark, n=40)
    emb = transe_train(tn, d=8, iters=6, lr_u=4, margin_u=200,
                       init_u=50, clamp_u=1000)
    pos = tn.select("subj", "pred", "obj")
    neg = tn.select("subj", "pred",
                    F.col("neg_obj").alias("obj"))
    mean_pos = (transe_score(pos, emb)
                .agg(F.avg("score_u").alias("m")).collect()[0].m)
    mean_neg = (transe_score(neg, emb)
                .agg(F.avg("score_u").alias("m")).collect()[0].m)
    assert mean_pos < mean_neg  # lower L1 = more plausible


def test_init_is_pure_function_of_ids(spark):
    tn = _planted(spark)
    a = sorted(map(tuple, transe_init(tn, d=2, init_u=10).collect()))
    b = sorted(map(tuple, transe_init(tn.repartition(5), d=2,
                                      init_u=10).collect()))
    assert a == b
    assert all(-10 <= r[3] <= 10 for r in a)


def test_resume_from_checkpoint_bit_identical(spark, tmp_path):
    """Kill-and-resume discipline: training interrupted after 2 of 3
    iterations, restarted with the same checkpoint_dir, must produce
    BIT-IDENTICAL weights to an uninterrupted 3-iteration run — and a
    changed corpus under the same dir must NOT resume."""
    tn = _planted(spark)
    kw = dict(d=3, lr_u=2, margin_u=100, init_u=50, clamp_u=1000)
    ckpt = str(tmp_path / "transe_ckpt")

    transe_train(tn, iters=2, checkpoint_dir=ckpt, **kw)   # "killed" here
    resumed = transe_train(tn, iters=3, checkpoint_dir=ckpt, **kw)
    straight = transe_train(tn, iters=3, **kw)
    assert sorted(map(tuple, resumed.collect())) == \
        sorted(map(tuple, straight.collect()))

    # a different corpus must invalidate the fingerprint (fresh train)
    tn2 = _planted(spark, n=30)
    fresh = transe_train(tn2, iters=1, checkpoint_dir=str(
        tmp_path / "transe_ckpt2"), **kw)
    reused = transe_train(tn2, iters=1, checkpoint_dir=ckpt, **kw)
    assert sorted(map(tuple, fresh.collect())) == \
        sorted(map(tuple, reused.collect()))


def test_embedding_vectors_pivot(spark):
    from lamapi_spark.ops.kg_embed import embedding_vectors, transe_init

    tn = _planted(spark, n=6)
    emb = transe_init(tn, d=3, init_u=10)
    vecs = {(r.kind, r.id): r.vec for r in embedding_vectors(emb).collect()}
    flat = {(r.kind, r.id, r.dim): r.w_u for r in emb.collect()}
    for (kind, id_), v in vecs.items():
        assert v == [flat[(kind, id_, d_)] for d_ in range(3)]


def test_eval_ranks_semantics(spark):
    """The true tail of a well-trained triple should rank near 1; the
    rank/hit fields must agree; pool draw is deterministic."""
    from lamapi_spark.ops.kg_embed import (
        embedding_vectors, transe_eval_ranks, transe_train,
    )

    tn = _planted(spark, n=30)
    emb = transe_train(tn, d=8, iters=6, lr_u=4, margin_u=200,
                       init_u=50, clamp_u=1000)
    vecs = embedding_vectors(emb)
    triples = tn.select("subj", "pred", "obj")
    out = transe_eval_ranks(triples, vecs, n_candidates=8).collect()
    assert len(out) == triples.count()
    for r in out:
        assert 1 <= r.rank <= 9           # pool of 8 + the true tail
        assert r.hit1 == (r.rank <= 1) and r.hit3 == (r.rank <= 3)
    # deterministic under repartitioning
    out2 = transe_eval_ranks(triples.repartition(5), vecs,
                             n_candidates=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    # trained model beats the untrained init on mean rank
    vecs0 = embedding_vectors(transe_train(tn, d=8, iters=0, lr_u=4,
                                           margin_u=200, init_u=50,
                                           clamp_u=1000))
    mean = lambda rows: sum(r.rank for r in rows) / len(rows)  # noqa: E731
    out0 = transe_eval_ranks(triples, vecs0, n_candidates=8).collect()
    assert mean(out) <= mean(out0)


# ----------------------------------------------------------- DistMult

def test_distmult_score_hand_values(spark):
    from lamapi_spark.ops.kg_embed import distmult_score_vec

    vecs = spark.createDataFrame(
        [("e", "h", [1, 2, 3]), ("e", "t", [4, -5, 6]),
         ("r", "p", [2, 0, 1])],
        "kind string, id string, vec array<bigint>")
    tr = spark.createDataFrame([("h", "p", "t")],
                               "subj string, pred string, obj string")
    [row] = distmult_score_vec(tr, vecs).collect()
    # 1*2*4 + 2*0*(-5) + 3*1*6 = 8 + 0 + 18 = 26
    assert row.score_u == 26


def test_distmult_ranks_protocol(spark):
    from lamapi_spark.ops.kg_embed import distmult_eval_ranks

    # candidate pool = ALL entities (n_candidates large); tail 'best'
    # maximizes the product, so the triple ranks 1 and hits at 1
    vecs = spark.createDataFrame(
        [("e", "h", [1, 1]), ("e", "best", [9, 9]),
         ("e", "mid", [2, 2]), ("e", "worst", [-9, -9]),
         ("r", "p", [1, 1])],
        "kind string, id string, vec array<bigint>")
    tr = spark.createDataFrame(
        [("h", "p", "best"), ("h", "p", "worst")],
        "subj string, pred string, obj string")
    out = {r.obj: (r.rank, r.hit1, r.hit3)
           for r in distmult_eval_ranks(tr, vecs, n_candidates=10).collect()}
    assert out["best"] == (1, True, True)
    # worst is beaten by best, mid, h (products 2*18, 2*4, 2*2 > -36)
    assert out["worst"][0] == 4 and not out["worst"][1]
