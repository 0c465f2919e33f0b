"""Exact set-similarity self-join via prefix filtering (AllPairs /
PPJoin family, Bayardo et al. WWW'07 / Xiao et al. WWW'08).

Complements the APPROXIMATE near-dup family in ops/dedup.py
(MinHash+LSH, SimHash): this operator returns EVERY pair of documents
whose token-set Jaccard is >= tau, with zero false negatives — the
candidate filter is lossless by the prefix-filter lemma, the verify
stage is exact integer arithmetic.

Algorithm (all DataFrame algebra, no UDFs):
1. distinct lowercase whitespace tokens per doc;
2. global token order = (doc_frequency ASC, token ASC) — rarest first;
3. per-doc tokens sorted under that order; prefix = the first
   n - ceil(tau*n) + 1 tokens. Lemma: two sets with Jaccard >= tau
   must overlap in >= ceil(tau*max(|x|,|y|)) tokens, and any two sets
   with overlap o share a token inside their (len - o + 1)-prefixes
   under ANY shared total order; ceil(tau*|x|) <= that bound makes the
   per-doc formula safe for both sides of every qualifying pair.
4. inverted-list self-join on prefix tokens -> distinct candidate
   (id_a < id_b) pairs;
5. exact verify: |intersection| and |union| of the full token sets,
   keep pairs with taud*inter >= taun*union (integer arithmetic — no
   float threshold can disagree between engines).

Scale shape (the reason this beats brute force at 100 TB):
- the only data-dependent shuffle is the prefix-token join, and the
  rare-first global order keeps hot tokens OUT of prefixes — a
  stopword shared by every doc has the largest df, sorts last, and is
  sliced away for any doc with >1 distinct token at tau >= 0.5. Group
  sizes in the join are the doc-frequencies of RARE tokens.
- df computation is one map-side-combinable hash agg; the verify stage
  is two hash joins on doc_id (uniform key, no skew).
- residual skew backstop at cluster scale: AQE skew-join split, since
  a pathological corpus (every doc identical) collapses all prefixes
  into one token group no ordering can fix — the same hot-bucket
  failure mode ops/dedup.py documents for LSH bands.

tau is a rational taun/taud so the verify threshold and the prefix
length are integer-exact in both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def setjoin_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    taun: int = 3,
    taud: int = 5,
) -> DataFrame:
    """All (id_a < id_b) pairs with token-set Jaccard >= taun/taud.

    -> (id_a, id_b, inter_n, union_n, jacc) — jacc bround(9) for
    engine-portable hashing; the FILTER is pure integer arithmetic.
    """
    if not (0 < taun <= taud):
        raise ValueError(f"tau must be in (0, 1]: {taun}/{taud}")
    toks = (
        docs.select(F.col(id_col).alias("_id"),
                    F.explode(F.array_distinct(
                        F.split(F.lower(F.col(text_col)), " "))).alias("tok"))
    )
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    # per-doc token array sorted rare-first; array_sort on struct(df, tok)
    # is lexicographic over the fields == the oracle's ORDER BY df, tok
    arr = (
        toks.join(dfreq, "tok")
        .groupBy("_id")
        .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"]).alias("toks"),
             F.count("*").alias("n"))
    )
    # prefix length n - ceil(tau*n) + 1, ceil as (taun*n + taud - 1) div taud
    pref_len = (F.col("n")
                - F.floor((F.lit(taun) * F.col("n") + F.lit(taud - 1))
                          / F.lit(taud)).cast("long") + F.lit(1))
    pref = (
        arr.filter(F.col("n") > 0)
        .select("_id", F.explode(F.slice("toks", F.lit(1), pref_len)).alias("tok"))
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"),
              (F.col("a.tok") == F.col("b.tok"))
              & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    ax = arr.select(F.col("_id").alias("id_a"), F.col("toks").alias("_ta"),
                    F.col("n").alias("_na"))
    bx = arr.select(F.col("_id").alias("id_b"), F.col("toks").alias("_tb"),
                    F.col("n").alias("_nb"))
    inter = F.size(F.array_intersect("_ta", "_tb")).cast("long")
    return (
        cand.join(ax, "id_a").join(bx, "id_b")
        .withColumn("inter_n", inter)
        .withColumn("union_n", (F.col("_na") + F.col("_nb") - F.col("inter_n")))
        .filter(F.lit(taud) * F.col("inter_n") >= F.lit(taun) * F.col("union_n"))
        .select("id_a", "id_b", "inter_n", "union_n",
                F.bround(F.col("inter_n") / F.col("union_n"), 9).alias("jacc"))
    )
