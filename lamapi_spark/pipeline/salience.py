"""Per-conversation entity salience: which entities anchor a
conversation's triples.

A 10^12-turn KG-construction run does not treat every detected entity
equally — triple mining, coref antecedent choice, and downstream
ranking all want the conversation's *anchor* entities first. The
standard signal is TF-IDF shaped: an entity that dominates one
conversation but is rare across the corpus is salient; an entity that
appears everywhere ('the assistant') is not.

Scale shape (the whole point — see the repo's plan-lessons):

- ``tf`` is ONE partial-aggregating groupBy on (conv_id, entity) —
  map-side combine collapses the per-turn occurrence stream before the
  exchange, so shuffled rows are bounded by distinct (conv, entity),
  not by turn count.
- ``df`` / ``n_convs`` derive from the ALREADY-AGGREGATED tf frame
  (dimension-sized input), never from raw occurrences.
- the idf join is a plain equi-join on entity with NO strategy hint:
  at sandbox scale AQE broadcasts the dimension frame; at a 10^8-entity
  dictionary it is a shuffle join on fixed-width rows — exactly the
  gate discipline operators/lookup.py measured both ways.
- the per-conversation top-k is folded INTO the conv groupBy as an
  in-array sort+slice (plan lesson 5: a window feeding a group-by on a
  key prefix is an exchange in disguise; per-conv distinct entities
  are bounded by turns-per-conv, so the array is small by
  construction). No Window, no extra exchange.

Determinism: salience = bround(tf * ln(n_convs / df), 6) — one
multiply, one ln, round-even to 6 (the corpus BM25/LM ln discipline);
ties break ascending on entity. The in-array sort key negates the
rounded double, so cross-partition arrival order cannot reorder equal
scores.

Reference analogue: none (lamAPI has no per-document ranking) — this
is builder's-brief surface for the transcript KG pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_salience(occurrences: DataFrame, top_k: int = 3,
                    cache_tf: bool = True) -> DataFrame:
    """(conv_id, entity) occurrence rows -> the top_k most salient
    entities per conversation: (conv_id, rank, entity, tf, df,
    salience). rank is 1-based, ordered by salience desc then entity
    asc.

    ``cache_tf`` caches the NARROW tf aggregate (the lookup.py
    cache_narrow discipline): tf feeds three consumers (df, n_convs,
    the score join) and Catalyst does not dedupe common subtrees, so
    without it the occurrence stream is scanned and re-aggregated
    three times — the dominant cost at 10^12 turns. The cached frame
    is the post-combine (conv, entity, tf) triple, orders of magnitude
    smaller than the occurrences. Like lookup.py's cache_narrow, the
    cache is NOT unpersisted here (the result is lazy; consumers
    collect later) — a long-lived session calling this repeatedly
    should clear cache between calls or pass cache_tf=False."""
    tf = (occurrences.select("conv_id", "entity")
          .groupBy("conv_id", "entity")
          .agg(F.count("*").alias("tf")))
    if cache_tf:
        tf = tf.cache()
    # tf is unique on (conv_id, entity): df is a plain count per entity
    df = tf.groupBy("entity").agg(F.count("*").alias("df"))
    n = tf.select(F.countDistinct("conv_id").alias("n_convs"))
    scored = (
        tf.join(df, "entity")
        .crossJoin(F.broadcast(n))  # 1-row stat frame (popularity_norm precedent)
        .withColumn(
            "salience",
            F.bround(F.col("tf").cast("double")
                     * F.log(F.col("n_convs").cast("double")
                             / F.col("df").cast("double")), 6))
    )
    item = F.struct(
        (-F.col("salience")).alias("_neg"),      # asc sort == salience desc
        F.col("entity").alias("entity"),         # tie: entity asc
        F.col("tf").alias("tf"),
        F.col("df").alias("df"),
        F.col("salience").alias("salience"),
    )
    topk = (
        scored.groupBy("conv_id")
        .agg(F.slice(F.array_sort(F.collect_list(item)), 1, top_k)
             .alias("_top"))
        .select("conv_id", F.posexplode("_top").alias("pos", "it"))
    )
    return topk.select(
        "conv_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("it.entity").alias("entity"),
        F.col("it.tf").alias("tf"),
        F.col("it.df").alias("df"),
        F.col("it.salience").alias("salience"),
    )
