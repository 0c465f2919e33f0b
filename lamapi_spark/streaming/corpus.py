"""Streaming twins of the offline-trained document scorers (DSIR
importance, linear classifier) — the quality gates a production
ingest pipeline runs on every incoming document.

The same offline-state/online-probe split as the as-of serve twin and
the streaming KG link index: `ops/corpus.dsir_model` collapses both
corpora into one <= n_buckets-row (bucket, lr) table offline, and the
stream scores each document with ZERO streaming state — the per-doc
feature sum runs IN-ARRAY over a literal map of the model (the same
map-literal zero-shuffle move as the reference's type-name resolution,
operators/lookup.py J3), so there is no explode, no streaming
aggregation, no watermark: every row is independent and any
trigger/sink works.

Parity with the batch scorer is exact: per-occurrence lr values are
the model's 6-decimal-rounded entries converted to exact integer
MICRO-units (x 1e6) and summed in BIGINT in token order — bit-equal to
the batch DECIMAL(28,6) sum — and the final /1e6 is one
correctly-rounded IEEE division of two exactly-representable doubles,
the same nearest-double the batch DECIMAL -> DOUBLE cast produces
(row-for-row equality is tested in tests/test_streaming.py). Overflow
bound: |lr| < 14 nats -> 1.4e7 micro-units per feature, ~6.5e11
features per document before BIGINT saturation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lamapi_spark.functions.hashing import h48
from lamapi_spark.ops.corpus import feature_grams

DOC_SCHEMA = "doc_id bigint, text string"


def stream_dsir_score(
    spark: SparkSession, path: str, model: DataFrame,
    n_buckets: int = 1024, schema: str = DOC_SCHEMA,
) -> DataFrame:
    """File-source document stream -> (doc_id, n_feats, log_ratio)
    scored against a prebuilt dsir_model. ``model`` is collected to a
    map literal — bounded by n_buckets BY CONSTRUCTION (the model
    covers exactly the hashed bucket space, never the raw vocabulary),
    so this is the documented small-state exception, like
    detect_mentions_pandas' dictionary set."""
    entries = {int(r["bucket"]): int(round(float(r["lr"]) * 1_000_000))
               for r in model.collect()}
    if len(entries) != n_buckets:
        raise ValueError(
            f"dsir model covers {len(entries)} of {n_buckets} buckets — "
            "build it with ops/corpus.dsir_model (all-bucket coverage)")
    lr_map = F.create_map(*[
        F.lit(x) for b in sorted(entries) for x in (b, entries[b])])

    # null-text documents are dropped, matching the batch scorer
    # (whose explode of a null gram array emits no row at all)
    docs = (spark.readStream.schema(schema).parquet(path)
            .filter(F.col("text").isNotNull()))
    grams = feature_grams(F.col("text"))
    micro = F.aggregate(
        F.transform(grams, lambda g: F.element_at(lr_map, h48(g) % n_buckets)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    return docs.select(
        "doc_id",
        F.size(grams).cast("long").alias("n_feats"),
        (micro.cast("double") / F.lit(1_000_000.0).cast("double"))
        .alias("log_ratio"),
    )


def stream_classifier_score(
    spark: SparkSession, path: str, weights: DataFrame,
    n_buckets: int = 64, schema: str = DOC_SCHEMA,
) -> DataFrame:
    """Streaming serve twin of ops/classifier.score_linear: score each
    incoming document against a trained (bucket, w_micro) table with
    ZERO streaming state — the weights (n_buckets+1 rows BY
    CONSTRUCTION, hashed feature space + intercept) become a map
    literal and the per-doc margin is an in-array BIGINT fold over the
    feature occurrences, exactly the integer sum the batch tf-frame
    aggregation computes (x * w == w summed per occurrence). The
    rational-sigmoid chain then repeats the training-time float ops in
    the same order, so stream == batch row for row INCLUDING the
    doubles (tested). Null-text docs score the bare intercept, same as
    the batch intercept-only tf row."""
    entries = {int(r["bucket"]): int(r["w_micro"]) for r in weights.collect()}
    if len(entries) != n_buckets + 1:
        raise ValueError(
            f"weights cover {len(entries)} of {n_buckets + 1} buckets — "
            "train with ops/classifier.train_linear (all-bucket coverage)")
    w_map = F.create_map(*[
        F.lit(x) for b in sorted(entries) for x in (b, entries[b])])

    docs = spark.readStream.schema(schema).parquet(path)
    grams = feature_grams(F.col("text"))
    fold = F.aggregate(
        F.transform(grams, lambda g: F.element_at(w_map, h48(g) % n_buckets)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    z_micro = (F.coalesce(fold, F.lit(0).cast("long"))
               + F.lit(entries[n_buckets]).cast("long"))
    zd = z_micro.cast("double") / F.lit(1_000_000.0)
    return docs.select(
        "doc_id",
        z_micro.alias("z_micro"),
        (F.lit(0.5) + zd / (F.lit(2.0) * (F.lit(1.0) + F.abs(zd)))).alias("p"),
    )


CAT_SCHEMA = "category string, ts timestamp"


def stream_jsd_drift(spark: SparkSession, path: str,
                     baseline: DataFrame,
                     window: str = "1 hour",
                     watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of ops/metrics.js_divergence's '__total__' row:
    per-WINDOW Jensen-Shannon divergence of the live categorical mix
    (language / source / predicate tags on the ingest feed) against a
    STATIC reference epoch — the continuously-running form of the
    batch drift monitor, alarming within a watermark of the shift
    instead of at the next batch sweep.

    Offline-state/online-probe split (the dsir/classifier-twin rule):
    ``baseline`` is the vocabulary-bounded reference count frame,
    materialized ONCE into literal arrays at plan time — so the only
    streaming state is ONE watermarked (window, category) count
    aggregation plus the per-window rollup that packs those counts
    into an in-row map (two chained window aggs, the
    stream_fact_support shape; state bounded by windows x vocabulary).
    The JSD itself is a STATELESS in-row fold over the SORTED union
    of baseline and window vocabularies: per-category terms use the
    batch operator's exact float expression and 6-dp half-even
    rounding, summed in DECIMAL(28,6) — so a drained window row
    equals the batch js_divergence total on that window's slice BIT
    FOR BIT (tested row-for-row in tests/test_streaming.py).

    Append-mode semantics: a window's JSD emits once when the
    watermark closes it; late rows beyond the watermark drop and
    surface in the next batch sweep — the standard trade.
    -> (window_start, n_new, jsd).
    """
    import math

    rows = sorted((r[0], int(r[1])) for r in
                  baseline.select("category", "c_base").collect())
    cats = [c for c, _ in rows]
    nb = sum(c for _, c in rows) or 1
    bmap = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cats]),
        F.array(*[F.lit(n).cast("long") for _, n in rows]))

    ev = spark.readStream.schema(CAT_SCHEMA).parquet(path)
    per_cat = (ev.withWatermark("ts", watermark)
               .groupBy(F.window("ts", window).alias("w"), "category")
               .agg(F.count("*").alias("c_new")))
    per_win = (per_cat
               .groupBy(F.window(F.window_time("w"), window).alias("w"))
               .agg(F.map_from_entries(F.collect_list(
                   F.struct("category", "c_new"))).alias("_m"),
                   F.sum("c_new").alias("n_new")))
    union = F.array_sort(F.array_union(
        F.array(*[F.lit(c) for c in cats]), F.map_keys(F.col("_m"))))
    nn = F.col("n_new").cast("double")
    ln2 = F.lit(math.log(2.0))

    def term(cat):
        cb = F.coalesce(F.element_at(bmap, cat), F.lit(0)).cast("double")
        cn = (F.coalesce(F.element_at(F.col("_m"), cat), F.lit(0))
              .cast("double"))
        p = cb / F.lit(float(nb))
        q = cn / nn
        m = (p + q) / 2
        t = (F.when(cb > 0, p / 2 * F.log(p / m) / ln2)
             .otherwise(F.lit(0.0))
             + F.when(cn > 0, q / 2 * F.log(q / m) / ln2)
             .otherwise(F.lit(0.0)))
        return F.bround(t, 6).cast("decimal(28,6)")

    jsd = F.aggregate(union, F.lit(0).cast("decimal(28,6)"),
                      lambda acc, cat: (acc + term(cat))
                      .cast("decimal(28,6)"))
    return per_win.select(
        F.col("w.start").alias("window_start"), "n_new",
        jsd.cast("double").alias("jsd"))
