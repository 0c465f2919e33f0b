"""Distributed linear quality-classifier training — the fastText-style
(Joulin et al. 2016, arXiv:1607.01759) hashed bag-of-features linear
model every production corpus pipeline trains to score documents, as
an iterative Spark job with the SAME driver/executor split MLlib's
LogisticRegression uses: executors compute the full-batch gradient,
the driver applies the (n_buckets+1)-row weight step per iteration.

Reference analogue: none (the reference is a lookup service) —
builder's-brief training-data surface, tier of ops/corpus.py.

Determinism protocol (the repo's micro-unit discipline, cf.
dsir_importance): weights live on the 1e-6 grid as BIGINT micro-units,
so every gradient aggregation is an EXACT integer sum — associative,
commutative, overflow-safe below 2^53 micro-units per bucket (~1e9
token occurrences per bucket at unit residuals; raise n_buckets before
that) — and the trained weights are a pure function of the dataset:
any partitioning, any engine. The only float ops are a fixed-order
chain the DuckDB oracle replays literally:

    z   = z_micro / 1e6                      (one correctly-rounded div)
    p   = 0.5 + z / (2*(1+|z|))              (rational sigmoid — every
                                              step correctly-rounded
                                              IEEE, no exp() whose
                                              libm rounding could
                                              differ between engines)
    r_u = round_even((p - y) * 1e6)          (per-doc residual, micro)
    g_u[b] = sum_docs x[d,b] * r_u[d]        (exact BIGINT)
    w_u[b] -= round_even(lr * g_u[b] / N)    (driver step; Python's
                                              round() is half-even on
                                              the identical double)

The rational link replaces the logistic sigmoid for engine parity; the
update is still a descent step on a smooth monotone link (pytest pins
that training separates a planted corpus and that loss decreases).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lamapi_spark.ops.corpus import _hashed_features

MICRO = 1_000_000.0


def _tf_features(docs: DataFrame, id_col: str, text_col: str,
                 n_buckets: int) -> DataFrame:
    """(doc_id, bucket, x): hashed unigram+bigram term frequencies
    plus an always-on intercept feature at bucket = n_buckets."""
    tf = (_hashed_features(docs, id_col, text_col, n_buckets)
          .groupBy("doc_id", "bucket")
          .agg(F.count("*").cast("long").alias("x")))
    intercept = docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit(n_buckets).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("x"))
    return tf.unionByName(intercept)


def _p_from_zu(z_u) -> F.Column:
    """The fixed-order float chain: micro z -> rational-sigmoid p."""
    zd = z_u.cast("double") / F.lit(MICRO)
    return F.lit(0.5) + zd / (F.lit(2.0) * (F.lit(1.0) + F.abs(zd)))


# Above this many buckets the per-iteration weight lookup switches
# from a literal map (zero-shuffle, but the map rides the PLAN — fine
# for hashed dictionaries, absurd at millions of buckets) to a
# broadcast join against a driver-built weight frame. Both arms
# compute the identical integer sums (tested bit-equal).
WEIGHTS_MAP_CAP = 65_536


def train_linear(docs: DataFrame, label_col: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 64, iters: int = 2,
                 lr: float = 0.5,
                 weights_via_join: bool | None = None,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Full-batch gradient descent on the hashed linear model. Returns
    (bucket, w_micro) for buckets 0..n_buckets (last = intercept).

    Scale shape per iteration: z is one (doc_id) aggregation over the
    cached tf frame with the weights inlined as a LITERAL map (no
    join) while n_buckets <= WEIGHTS_MAP_CAP, else as a broadcast join
    against the (n_buckets+1)-row weight frame — auto-picked from the
    KNOWN cardinality, the same estimate-proof gate discipline as
    pipeline/mentions.py; the gradient is one (bucket) aggregation,
    and only n_buckets+1 fixed-width rows ever reach the driver (the
    same per-iteration driver reduction as bpe_train's one-row argmax
    and MLlib's treeAggregate step). The tf frame shuffles ONCE
    (persisted); iteration plans do not grow because each round
    starts from driver-held weights, so no checkpoint chain is
    needed.

    ``checkpoint_dir`` makes the run RESUMABLE (north-rule discipline;
    StageRunner's data + sidecar-last convention at per-iteration
    granularity): each completed iteration writes its weights plus a
    metrics.json recording the param fingerprint, iteration, and
    duration; a rerun resumes from the newest completed iteration
    whose fingerprint matches — and because the protocol is exactly
    deterministic, a killed-and-resumed run yields BIT-IDENTICAL final
    weights to an uninterrupted one (tested)."""
    import time as _time

    spark = docs.sparkSession
    if weights_via_join is None:
        weights_via_join = n_buckets > WEIGHTS_MAP_CAP
    feats = _tf_features(docs, id_col, text_col, n_buckets).persist()
    labels = docs.select(F.col(id_col).alias("doc_id"),
                         F.col(label_col).cast("long").alias("y"))
    n = docs.count()
    w = {b: 0 for b in range(n_buckets + 1)}
    fp = f"m={n_buckets};lr={lr!r};n={n}"
    start_iter = 0
    if checkpoint_dir:
        for k in range(iters, 0, -1):
            base = os.path.join(checkpoint_dir, f"iter_{k:04d}")
            mpath = os.path.join(base, "metrics.json")
            if not os.path.exists(mpath):
                continue  # sidecar absent => iteration never completed
            with open(mpath) as fh:
                meta = json.load(fh)
            if meta.get("fingerprint") != fp:
                continue  # different params/corpus size: never resume
            rows = spark.read.parquet(os.path.join(base, "data")).collect()
            w = {int(r.bucket): int(r.w_micro) for r in rows}
            start_iter = k
            break
    try:
        for it in range(start_iter, iters):
            t0 = _time.time()
            if weights_via_join:
                wdf = spark.createDataFrame(
                    sorted(w.items()), "bucket bigint, _w bigint")
                withw = feats.join(F.broadcast(wdf), "bucket")
            else:
                wmap = F.create_map(
                    *[F.lit(v).cast("long")
                      for b in sorted(w) for v in (b, w[b])])
                withw = feats.withColumn("_w", wmap[F.col("bucket")])
            z = (withw
                 .groupBy("doc_id")
                 .agg(F.sum(F.col("x") * F.col("_w")).alias("z_u")))
            r = (labels.join(z, "doc_id")
                 .select("doc_id", F.bround(
                     (_p_from_zu(F.col("z_u"))
                      - F.col("y").cast("double")) * F.lit(MICRO),
                     0).cast("long").alias("r_u")))
            g = (feats.join(r, "doc_id")
                 .groupBy("bucket")
                 .agg(F.sum(F.col("x") * F.col("r_u")).alias("g_u")))
            for row in g.collect():
                # Python round() is HALF_EVEN on the identical IEEE
                # double chain — bit-equal to the oracle's round_even
                w[int(row.bucket)] -= int(round((lr * float(row.g_u)) / n))
            if checkpoint_dir:
                base = os.path.join(checkpoint_dir, f"iter_{it + 1:04d}")
                (spark.createDataFrame(
                    sorted((int(b), int(v)) for b, v in w.items()),
                    "bucket bigint, w_micro bigint")
                 .write.mode("overwrite")
                 .parquet(os.path.join(base, "data")))
                # sidecar LAST: its presence certifies the iteration
                # landed (pipeline/incremental.py convention)
                with open(os.path.join(base, "metrics.json"), "w") as fh:
                    json.dump({"fingerprint": fp, "iter": it + 1,
                               "duration_s": round(_time.time() - t0, 3)},
                              fh)
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        sorted((int(b), int(v)) for b, v in w.items()),
        "bucket bigint, w_micro bigint")


def score_linear(docs: DataFrame, weights: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 64) -> DataFrame:
    """Serve side: (doc_id, z_micro, p) for every document under a
    trained (bucket, w_micro) table — one broadcast join against the
    weight frame plus one (doc_id) aggregation; p repeats the
    training-time float chain bit for bit."""
    feats = _tf_features(docs, id_col, text_col, n_buckets)
    z = (feats.join(F.broadcast(weights), "bucket")
         .groupBy("doc_id")
         .agg(F.sum(F.col("x") * F.col("w_micro")).alias("z_micro")))
    return z.select("doc_id", "z_micro",
                    _p_from_zu(F.col("z_micro")).alias("p"))


def label_model_vote(votes: DataFrame, gold: DataFrame | None = None,
                     default_bp: int = 5000) -> DataFrame:
    """Weak-supervision label aggregation (the Snorkel data-programming
    shape, Ratner et al. 2017, reduced to its deterministic core):
    many cheap labeling functions vote on each item; items get the
    accuracy-weighted winning label. The standard way a training-data
    pipeline turns heuristic rules (regex gates, lexicons, distant
    supervision) into one denoised label column without hand labels
    (reference analogue: none; builder's-brief surface beside
    train_linear, which can then consume the emitted labels).

    ``votes`` = (item_id, lf_id, vote); an LF abstains by having no
    row (null votes are dropped). Optional ``gold`` = (item_id, label)
    dev set: each LF's weight is its empirical accuracy on the gold
    items it voted on, in EXACT integer basis points
    (``correct * 10000L div total``); LFs with no gold overlap — and
    every LF when gold is None — weigh ``default_bp`` (majority vote).
    Winner per item = max weight sum, ties to the lexicographically
    smallest label (window-free struct-min argmax). confidence_bp =
    winner weight * 10000 div total weight — integer, engine-exact.

    Scale shape: one broadcast-sized per-LF weight frame (|LFs| rows)
    joined onto the vote stream, ONE (item, vote) weight-sum agg, ONE
    per-item struct-min argmax agg + total sum — both map-side
    combinable, keyed by the item; no window, no driver loop.

    -> (item_id, label, weight_bp, n_votes, n_lfs, total_bp,
    confidence_bp).
    """
    v = votes.filter(F.col("vote").isNotNull()) \
             .select("item_id", "lf_id", "vote")
    if gold is not None:
        acc = (v.join(gold.select("item_id", "label"), "item_id")
               .groupBy("lf_id")
               .agg(F.sum((F.col("vote") == F.col("label"))
                          .cast("long")).alias("_c"),
                    F.count("*").alias("_t"))
               .select("lf_id",
                       F.expr("_c * 10000L div _t").alias("_w")))
        weighted = (v.join(F.broadcast(acc), "lf_id", "left")
                    .withColumn("_w", F.coalesce("_w",
                                                 F.lit(int(default_bp)))))
    else:
        weighted = v.withColumn("_w", F.lit(int(default_bp)))
    per_label = (weighted.groupBy("item_id", "vote")
                 .agg(F.sum("_w").alias("_lw"),
                      F.count("*").alias("_ln")))
    out = (per_label.groupBy("item_id")
           .agg(F.min(F.struct((-F.col("_lw")).alias("nw"),
                               F.col("vote").alias("label"),
                               F.col("_ln").alias("n"))).alias("_win"),
                F.sum("_lw").alias("total_bp"),
                F.sum("_ln").alias("n_lfs")))
    return out.select(
        "item_id", F.col("_win.label").alias("label"),
        (-F.col("_win.nw")).alias("weight_bp"),
        F.col("_win.n").alias("n_votes"), "n_lfs", "total_bp",
        F.expr("(-_win.nw) * 10000L div total_bp").alias("confidence_bp"))
