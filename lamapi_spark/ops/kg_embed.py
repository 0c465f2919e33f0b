"""Distributed TransE KG-embedding training, bit-reproducibly.

The translational embedding model (Bordes et al. 2013, "Translating
Embeddings for Modeling Multi-relational Data") is the canonical
consumer of a constructed KG's triples: entities and relations become
d-dim vectors with h + r ~ t, trained by a margin loss against
corrupted triples (ops/graph.py:negative_samples supplies those).
Reference analogue: none (the reference serves lookups over a static
KG) — builder's-brief training surface, the graph-side sibling of
ops/classifier.py.

Determinism protocol (the repo's integer fixed-point discipline, cf.
pagerank_fixed_point / train_linear): this is TransE-L1 in BIGINT
micro-units end to end, so training is a pure function of the triple
set — any partitioning, any engine, replayable CTE-by-CTE in SQL:

  init     w_u[kind,id,dim] = h48(kind|id|dim|salt) % (2*init_u+1) - init_u
  score    pos_u = sum_dim |h+r-t|,  neg_u = sum_dim |h+r-t'|   (BIGINT)
  hinge    violated iff pos_u + margin_u > neg_u
  grads    per violated triple, per dim, with s+ = sign(h+r-t),
           s- = sign(h+r-t'):  g[h] += s+ - s-;  g[r] += s+ - s-;
           g[t] += -s+;        g[t'] += s-          (all in {-2..2})
  step     w_u' = clamp(w_u - lr_u * sum(g), -clamp_u, +clamp_u)

L1 distance is chosen over L2 PRECISELY because its subgradients are
signs — integers — so the full-batch gradient aggregation is an exact
associative BIGINT sum with no float combine anywhere. The paper's
per-epoch L2-ball projection becomes an L-inf clamp (the integer-exact
norm constraint; documented deviation — it bounds every coordinate, so
scores stay in [0, 2*d*clamp_u*3] and never overflow). Full-batch GD
replaces the paper's SGD for the same reason train_linear's does: a
sample order would be a partition order.

Scale shape per iteration (embeddings = (kind, id, dim, w_u) rows,
n_ent*d + n_rel*d total — row-per-dim keeps every step a fixed-width
equi-join/aggregation instead of array zip_with chains an oracle can't
replay): four shuffled joins land the h/r/t/t' coordinates on the
triple rows (id+dim composite keys, uniform — no skew), ONE per-triple
aggregation folds scores AND the per-dim sign list (collect_list
bounded by d — the plan-lesson-5 shape: no second exchange for the
violation flag), the gradient explode regroups by (kind,id,dim) with
map-side combine, and the weight update is one left join. Lineage is
localCheckpoint-truncated per iteration (the PageRank discipline).
Nothing collects to the driver; the embedding frame never broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lamapi_spark.functions.hashing import h48 as _h48


def _sign(c: F.Column) -> F.Column:
    """Integer sign in {-1,0,1} as BIGINT (F.signum returns double)."""
    return (F.when(c > 0, F.lit(1)).when(c < 0, F.lit(-1))
            .otherwise(F.lit(0)).cast("long"))


def init_embeddings(ids: DataFrame, kind: str, d: int,
                    init_u: int, salt: str = "transe") -> DataFrame:
    """Deterministic (kind, id, dim, w_u) grid: every coordinate is an
    md5 draw in [-init_u, +init_u] — a pure function of (kind, id,
    dim, salt), so init is storage-free and engine-reproducible (the
    JL-matrix argument, ops/similarity.py:jl_project)."""
    dims = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("dim")
    return ids.select(F.col(ids.columns[0]).cast("string").alias("id")) \
        .distinct() \
        .select(F.lit(kind).alias("kind"), "id", dims) \
        .select(
            "kind", "id", "dim",
            (_h48(F.concat_ws("|", F.lit(kind), F.col("id"),
                              F.col("dim").cast("string"), F.lit(salt)))
             % (2 * init_u + 1) - init_u).cast("long").alias("w_u"))


def transe_init(triples_neg: DataFrame, d: int, init_u: int,
                salt: str = "transe") -> DataFrame:
    """Embedding grid for every entity and relation a corrupted-triple
    frame (subj, pred, obj, neg_obj) touches: entities = subj u obj u
    neg_obj under kind 'e', relations = pred under kind 'r'."""
    ents = (triples_neg.select(F.col("subj").cast("string").alias("x"))
            .unionByName(triples_neg.select(F.col("obj").cast("string").alias("x")))
            .unionByName(triples_neg.select(F.col("neg_obj").cast("string").alias("x")))
            .filter(F.col("x").isNotNull()).distinct())
    rels = triples_neg.select(F.col("pred").cast("string").alias("x")).distinct()
    return init_embeddings(ents, "e", d, init_u, salt).unionByName(
        init_embeddings(rels, "r", d, init_u, salt))


def _coords(triples: DataFrame, emb: DataFrame,
            with_neg: bool) -> DataFrame:
    """Land the h/r/t(/t') coordinates on each triple row, one row per
    (triple, dim). The first join fans each triple out to its d dims;
    the rest are (id, dim) composite-key equi-joins."""
    e = emb.filter(F.col("kind") == "e").drop("kind")
    r = emb.filter(F.col("kind") == "r").drop("kind")
    t = triples.select(
        F.col("subj").cast("string").alias("subj"),
        F.col("pred").cast("string").alias("pred"),
        F.col("obj").cast("string").alias("obj"),
        *([F.col("neg_obj").cast("string").alias("neg_obj")]
          if with_neg else []))
    out = (t.join(e.select(F.col("id").alias("subj"), "dim",
                           F.col("w_u").alias("h_u")), "subj")
           .join(r.select(F.col("id").alias("pred"),
                          F.col("dim").alias("dim"),
                          F.col("w_u").alias("r_u")), ["pred", "dim"])
           .join(e.select(F.col("id").alias("obj"),
                          F.col("dim").alias("dim"),
                          F.col("w_u").alias("t_u")), ["obj", "dim"]))
    if with_neg:
        out = out.join(
            e.select(F.col("id").alias("neg_obj"), F.col("dim").alias("dim"),
                     F.col("w_u").alias("n_u")), ["neg_obj", "dim"])
    return out


def transe_train(triples_neg: DataFrame, d: int = 4, iters: int = 2,
                 lr_u: int = 2, margin_u: int = 100,
                 init_u: int = 50, clamp_u: int = 1000,
                 salt: str = "transe",
                 checkpoint_every: int | None = 1,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Full-batch TransE-L1 GD over (subj, pred, obj, neg_obj) rows
    (null neg_obj rows — negative_samples' degenerate degrade — train
    nothing and are dropped). Returns (kind, id, dim, w_u).

    Hyperparameters are integers on the micro grid: lr_u multiplies
    the per-coordinate gradient SUM (full-batch; callers with huge
    triple counts lower lr_u rather than dividing — an integer division
    by N would round each coordinate, still exact but noisier).

    ``checkpoint_dir`` makes training RESUMABLE (the classifier's
    per-iteration data + sidecar-last convention, ops/classifier.py):
    each completed iteration writes the full embedding frame plus a
    metrics.json whose fingerprint covers the hyperparameters AND the
    corpus (count + bit_xor of xxhash64(triple) — the snapshot-
    validation discipline of the lookup-index `_meta` sidecar); a
    rerun resumes from the newest matching iteration, and since the
    protocol is exactly deterministic, killed-and-resumed training is
    BIT-IDENTICAL to uninterrupted (tested)."""
    import json
    import os
    import time as _time

    spark = triples_neg.sparkSession
    tn = triples_neg.filter(F.col("neg_obj").isNotNull())
    # checkpoint tn BEFORE deriving the init grid: transe_init
    # references tn four times (subj/obj/neg_obj entity union + rels)
    # and the old order built emb against the UNCHECKPOINTED lineage,
    # so materializing emb re-executed the caller's negative-sampling
    # subtree four times (round-6 plan audit)
    if checkpoint_every is not None:
        tn = tn.localCheckpoint(eager=True)
    emb = transe_init(tn, d, init_u, salt)
    if checkpoint_every is not None:
        emb = emb.localCheckpoint(eager=True)
    start_iter = 0
    fp = None
    if checkpoint_dir:
        sig = tn.agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("subj", "pred", "obj", "neg_obj"))
            .alias("x")).collect()[0]
        fp = (f"d={d};lr={lr_u};m={margin_u};i={init_u};c={clamp_u};"
              f"salt={salt};n={sig.n};x={sig.x}")
        for k in range(iters, 0, -1):
            base = os.path.join(checkpoint_dir, f"iter_{k:04d}")
            mpath = os.path.join(base, "metrics.json")
            if not os.path.exists(mpath):
                continue  # sidecar absent => iteration never completed
            with open(mpath) as fh:
                meta = json.load(fh)
            if meta.get("fingerprint") != fp:
                continue  # different params or corpus: never resume
            emb = spark.read.parquet(os.path.join(base, "data"))
            if checkpoint_every is not None:
                emb = emb.localCheckpoint(eager=True)
            start_iter = k
            break
    for it in range(start_iter, iters):
        t0 = _time.time()
        c = _coords(tn, emb, with_neg=True).select(
            "subj", "pred", "obj", "neg_obj", "dim",
            (F.col("h_u") + F.col("r_u") - F.col("t_u")).alias("dp"),
            (F.col("h_u") + F.col("r_u") - F.col("n_u")).alias("dn"))
        # ONE per-triple exchange: scores and the per-dim sign list
        # fold in the same aggregation (collect_list bounded by d;
        # order inside the list is irrelevant — every element carries
        # its dim and the consumers are per-element explodes).
        per_triple = (c.groupBy("subj", "pred", "obj", "neg_obj")
                      .agg(F.sum(F.abs(F.col("dp"))).alias("pos_u"),
                           F.sum(F.abs(F.col("dn"))).alias("neg_u"),
                           F.collect_list(F.struct(
                               F.col("dim"),
                               _sign(F.col("dp")).alias("sp"),
                               _sign(F.col("dn")).alias("sn"))).alias("g")))
        violated = per_triple.filter(
            F.col("pos_u") + F.lit(margin_u) > F.col("neg_u"))
        # flatten the per-dim struct to plain columns BEFORE the second
        # generator — two stacked explodes where the inner references
        # the outer's struct fields trip a Catalyst binding bug
        # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on Spark 4.1)
        per_dim = (violated.select(
            "subj", "pred", "obj", "neg_obj", F.explode("g").alias("x"))
            .select("subj", "pred", "obj", "neg_obj",
                    F.col("x.dim").alias("dim"),
                    F.col("x.sp").alias("sp"), F.col("x.sn").alias("sn")))
        contrib = (per_dim.select(
            "dim",
            F.explode(F.array(
                F.struct(F.lit("e").alias("kind"),
                         F.col("subj").alias("id"),
                         (F.col("sp") - F.col("sn")).alias("gv")),
                F.struct(F.lit("r").alias("kind"),
                         F.col("pred").alias("id"),
                         (F.col("sp") - F.col("sn")).alias("gv")),
                F.struct(F.lit("e").alias("kind"),
                         F.col("obj").alias("id"),
                         (-F.col("sp")).alias("gv")),
                F.struct(F.lit("e").alias("kind"),
                         F.col("neg_obj").alias("id"),
                         F.col("sn").alias("gv")),
            )).alias("c"))
            .select("c.kind", "c.id", "dim", "c.gv"))
        grad = (contrib.groupBy("kind", "id", "dim")
                .agg(F.sum("gv").alias("g_u")))
        emb = (emb.join(grad, ["kind", "id", "dim"], "left")
               .select(
                   "kind", "id", "dim",
                   F.greatest(
                       F.lit(-clamp_u).cast("long"),
                       F.least(
                           F.lit(clamp_u).cast("long"),
                           F.col("w_u")
                           - F.lit(lr_u) * F.coalesce(F.col("g_u"), F.lit(0))
                       )).alias("w_u")))
        if checkpoint_every is not None and (it + 1) % checkpoint_every == 0:
            emb = emb.localCheckpoint(eager=True)
        if checkpoint_dir:
            base = os.path.join(checkpoint_dir, f"iter_{it + 1:04d}")
            emb.write.mode("overwrite").parquet(os.path.join(base, "data"))
            # sidecar LAST: its presence certifies the iteration landed
            with open(os.path.join(base, "metrics.json"), "w") as fh:
                json.dump({"fingerprint": fp, "iter": it + 1,
                           "duration_s": round(_time.time() - t0, 3)}, fh)
    return emb


def transe_score(triples: DataFrame, emb: DataFrame) -> DataFrame:
    """Serve side: L1 plausibility score_u = sum_dim |h+r-t| for every
    (subj, pred, obj) row under a trained embedding table — lower is
    more plausible. Three coordinate joins + one per-triple sum; the
    exact integer chain means serve scores replay anywhere."""
    return (_coords(triples, emb, with_neg=False)
            .groupBy("subj", "pred", "obj")
            .agg(F.sum(F.abs(F.col("h_u") + F.col("r_u") - F.col("t_u")))
                 .alias("score_u")))


def transe_loss(triples_neg: DataFrame, emb: DataFrame,
                margin_u: int = 100) -> DataFrame:
    """Diagnostic: total hinge loss and violated-triple count of a
    corrupted-triple frame under an embedding table (one row). The
    quantity GD descends — pytest pins that it decreases over
    iterations on a learnable corpus."""
    c = _coords(triples_neg.filter(F.col("neg_obj").isNotNull()),
                emb, with_neg=True)
    per = (c.groupBy("subj", "pred", "obj", "neg_obj")
           .agg(F.sum(F.abs(F.col("h_u") + F.col("r_u") - F.col("t_u")))
                .alias("pos_u"),
                F.sum(F.abs(F.col("h_u") + F.col("r_u") - F.col("n_u")))
                .alias("neg_u")))
    hinge = F.greatest(
        F.lit(0).cast("long"),
        F.col("pos_u") + F.lit(margin_u) - F.col("neg_u"))
    return per.agg(
        F.sum(hinge).alias("loss_u"),
        F.sum(F.when(hinge > 0, 1).otherwise(0)).cast("long")
        .alias("n_violated"))


def embedding_vectors(emb: DataFrame) -> DataFrame:
    """Pivot the row-per-dim training layout to the SERVE layout:
    (kind, id, vec array<long> ordered by dim) — one aggregation with
    a d-bounded in-array sort, the shape the stateless streaming serve
    twin (streaming/kg.py:stream_transe_score) joins against and the
    natural persisted-artifact schema (floats/ints round-trip parquet
    bit-exactly, cf. ops/similarity.IvfIndex)."""
    return (emb.groupBy("kind", "id")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "w_u"))),
                lambda s: s["w_u"]).alias("vec")))


def transe_score_vec(triples: DataFrame, vecs: DataFrame) -> DataFrame:
    """transe_score over the pivoted vector layout: three stream-
    static-joinable equi-joins plus a pure in-array fold — NO
    aggregation, so the expression is legal in a stateless streaming
    select and exactly equals the batch per-dim sum (integer adds
    associate)."""
    e = vecs.filter(F.col("kind") == "e").drop("kind")
    r = vecs.filter(F.col("kind") == "r").drop("kind")
    t = triples.select(
        F.col("subj").cast("string").alias("subj"),
        F.col("pred").cast("string").alias("pred"),
        F.col("obj").cast("string").alias("obj"))
    j = (t.join(e.select(F.col("id").alias("subj"),
                         F.col("vec").alias("hv")), "subj")
         .join(r.select(F.col("id").alias("pred"),
                        F.col("vec").alias("rv")), "pred")
         .join(e.select(F.col("id").alias("obj"),
                        F.col("vec").alias("tv")), "obj"))
    diffs = F.zip_with(
        F.zip_with(F.col("hv"), F.col("rv"), lambda h, r_: h + r_),
        F.col("tv"), lambda a, t_: F.abs(a - t_))
    return j.select(
        "subj", "pred", "obj",
        F.aggregate(diffs, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("score_u"))


def transe_eval_ranks(triples: DataFrame, vecs: DataFrame,
                      n_candidates: int = 16,
                      salt: str = "transe-eval") -> DataFrame:
    """Filtered-setting link-prediction evaluation (the Bordes et al.
    protocol every KG-embedding paper reports): for each test triple,
    rank the true tail's score against a deterministic md5-drawn
    candidate pool of ``n_candidates`` entities (rather than ALL
    entities — the pooled variant every at-scale evaluation uses).
    Lower L1 = better; rank = 1 + #candidates strictly better + ties
    breaking against the true tail only on smaller id (deterministic,
    engine-reproducible).

    Scale shape: candidates are the globally md5-smallest entities —
    an n_candidates-row frame (TakeOrdered pick, the medoid_centroids
    discipline) that BROADCASTS; each triple cross-joins only that
    frame, scores in-array via transe_score_vec's fold, and the rank
    is one per-triple aggregation. hits@1/3 come free as rank
    comparisons.

    -> (subj, pred, obj, true_score_u, rank, hit1, hit3)."""
    ents = vecs.filter(F.col("kind") == "e")
    cand = (ents
            .withColumn("_hk", _h48(F.concat(F.col("id"),
                                             F.lit("|" + salt))))
            .orderBy("_hk", "id").limit(n_candidates)
            .select(F.col("id").alias("cand_id"),
                    F.col("vec").alias("cv")))
    rels = vecs.filter(F.col("kind") == "r").drop("kind")
    t = triples.select(
        F.col("subj").cast("string").alias("subj"),
        F.col("pred").cast("string").alias("pred"),
        F.col("obj").cast("string").alias("obj"))
    base = (t.join(ents.select(F.col("id").alias("subj"),
                               F.col("vec").alias("hv")), "subj")
            .join(rels.select(F.col("id").alias("pred"),
                              F.col("vec").alias("rv")), "pred")
            .join(ents.select(F.col("id").alias("obj"),
                              F.col("vec").alias("tv")), "obj"))

    def _l1(tail_vec):
        return F.aggregate(
            F.zip_with(F.zip_with(F.col("hv"), F.col("rv"),
                                  lambda h, r: h + r),
                       tail_vec, lambda x, y: F.abs(x - y)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    scored = (base.join(F.broadcast(cand))
              .withColumn("true_u", _l1(F.col("tv")))
              .withColumn("cand_u", _l1(F.col("cv")))
              .withColumn("_beats", F.when(
                  (F.col("cand_id") != F.col("obj"))
                  & ((F.col("cand_u") < F.col("true_u"))
                     | ((F.col("cand_u") == F.col("true_u"))
                        & (F.col("cand_id") < F.col("obj")))),
                  1).otherwise(0)))
    out = (scored.groupBy("subj", "pred", "obj")
           .agg(F.min("true_u").alias("true_score_u"),
                (F.lit(1) + F.sum("_beats")).cast("long").alias("rank")))
    return out.select(
        "subj", "pred", "obj", "true_score_u", "rank",
        (F.col("rank") <= 1).alias("hit1"),
        (F.col("rank") <= 3).alias("hit3"))


def distmult_score_vec(triples: DataFrame, vecs: DataFrame) -> DataFrame:
    """DistMult plausibility (Yang et al. 2015, "Embedding Entities and
    Relations for Learning and Inference in Knowledge Bases"):
    score_u = sum_dim h_u * r_u * t_u over the pivoted vector layout —
    HIGHER is more plausible (the bilinear-diagonal twin of
    transe_score_vec's lower-is-better L1). Pure integer products and
    an associative BIGINT sum, so the score replays anywhere; with
    coordinates clamped to +-clamp_u the per-dim product is bounded by
    clamp_u^3 (1e9 at the default 1000) — d * clamp_u^3 stays far under
    2^63. Scoring and evaluation only: DistMult's gradients are
    coordinate PRODUCTS, not signs, so the integer-exact full-batch GD
    argument that makes transe_train bit-reproducible does not carry
    over — training stays TransE, serving can rank under either
    geometry."""
    e = vecs.filter(F.col("kind") == "e").drop("kind")
    r = vecs.filter(F.col("kind") == "r").drop("kind")
    t = triples.select(
        F.col("subj").cast("string").alias("subj"),
        F.col("pred").cast("string").alias("pred"),
        F.col("obj").cast("string").alias("obj"))
    j = (t.join(e.select(F.col("id").alias("subj"),
                         F.col("vec").alias("hv")), "subj")
         .join(r.select(F.col("id").alias("pred"),
                        F.col("vec").alias("rv")), "pred")
         .join(e.select(F.col("id").alias("obj"),
                        F.col("vec").alias("tv")), "obj"))
    prods = F.zip_with(
        F.zip_with(F.col("hv"), F.col("rv"), lambda h, r_: h * r_),
        F.col("tv"), lambda a, t_: a * t_)
    return j.select(
        "subj", "pred", "obj",
        F.aggregate(prods, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("score_u"))


def distmult_eval_ranks(triples: DataFrame, vecs: DataFrame,
                        n_candidates: int = 16,
                        salt: str = "distmult-eval") -> DataFrame:
    """Pooled link-prediction evaluation under DistMult scoring — the
    transe_eval_ranks protocol with the comparison flipped for a
    higher-is-better score: rank = 1 + #candidates strictly better
    (cand_u > true_u, ties breaking against the true tail only on
    smaller id). Same scale shape: a broadcast md5-smallest candidate
    pool, in-array folds, one per-triple aggregation.

    -> (subj, pred, obj, true_score_u, rank, hit1, hit3)."""
    ents = vecs.filter(F.col("kind") == "e")
    cand = (ents
            .withColumn("_hk", _h48(F.concat(F.col("id"),
                                             F.lit("|" + salt))))
            .orderBy("_hk", "id").limit(n_candidates)
            .select(F.col("id").alias("cand_id"),
                    F.col("vec").alias("cv")))
    rels = vecs.filter(F.col("kind") == "r").drop("kind")
    t = triples.select(
        F.col("subj").cast("string").alias("subj"),
        F.col("pred").cast("string").alias("pred"),
        F.col("obj").cast("string").alias("obj"))
    base = (t.join(ents.select(F.col("id").alias("subj"),
                               F.col("vec").alias("hv")), "subj")
            .join(rels.select(F.col("id").alias("pred"),
                              F.col("vec").alias("rv")), "pred")
            .join(ents.select(F.col("id").alias("obj"),
                              F.col("vec").alias("tv")), "obj"))

    def _dm(tail_vec):
        return F.aggregate(
            F.zip_with(F.zip_with(F.col("hv"), F.col("rv"),
                                  lambda h, r: h * r),
                       tail_vec, lambda x, y: x * y),
            F.lit(0).cast("long"), lambda acc, x: acc + x)

    scored = (base.join(F.broadcast(cand))
              .withColumn("true_u", _dm(F.col("tv")))
              .withColumn("cand_u", _dm(F.col("cv")))
              .withColumn("_beats", F.when(
                  (F.col("cand_id") != F.col("obj"))
                  & ((F.col("cand_u") > F.col("true_u"))
                     | ((F.col("cand_u") == F.col("true_u"))
                        & (F.col("cand_id") < F.col("obj")))),
                  1).otherwise(0)))
    out = (scored.groupBy("subj", "pred", "obj")
           .agg(F.min("true_u").alias("true_score_u"),
                (F.lit(1) + F.sum("_beats")).cast("long").alias("rank")))
    return out.select(
        "subj", "pred", "obj", "true_score_u", "rank",
        (F.col("rank") <= 1).alias("hit1"),
        (F.col("rank") <= 3).alias("hit3"))
