"""BM25 ranked retrieval over a document corpus — the scoring model
behind the reference's Elasticsearch lookup (api/model/elastic.py
delegates scoring to ES, which is Lucene BM25), here as an explicit
batch operator over any (id, text) table.

Engine-parity: per-term scores round to 6 decimals (half-even), then
sum in token order via F.aggregate over a sorted array — the DuckDB
list_reduce twin — so accumulation order can never flip a rank between
engines, and the ln() ulp risk is absorbed by the rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame, id_col: str, text_col: str,
    queries: list[tuple[str, str]], k: int = 5,
    k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by Lucene-flavored BM25:

        score(q, d) = sum over terms t of q matching d of
            ln(1 + (N - df_t + 0.5) / (df_t + 0.5))        # idf, >= 0
            * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    ``queries`` is the driver-side query WORKLOAD (a small list of
    (query_id, query_string)) — not data; terms are whitespace tokens,
    matching is lowercase-exact. -> (query_id, doc_id, score, rank).

    Scale shape: the token stream is pre-filtered to the query-term
    literal set INSIDE the token array (no explode of non-matching
    tokens ever happens), so tf / df frames carry only matching rows;
    doc length comes from the array size (no corpus-wide token
    shuffle); N / avgdl ride a 1-row broadcast stat frame; df and the
    query map are broadcast dims. The only full-corpus pass is the
    scan itself.
    """
    terms = sorted({t for _, qs in queries for t in qs.split()})
    spark = docs.sparkSession
    q = spark.createDataFrame(
        sorted({(qid, t) for qid, qs in queries for t in qs.split()}),
        "query_id string, tok string")

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.col(text_col)), " ").alias("_t"))
    dl = base.select("doc_id", F.size("_t").alias("dl"))
    stats = dl.agg(F.count("*").cast("double").alias("n"),
                   F.avg("dl").alias("avgdl"))

    def is_term(t):
        return t.isin(*terms)

    tf = (
        base.select(
            "doc_id", F.size("_t").alias("dl"),
            F.explode(F.filter("_t", is_term)).alias("tok"))
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count("*").cast("double").alias("df"))

    term = (
        tf.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(q), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("ts", F.bround(
            F.log(F.lit(1.0)
                  + (F.col("n") - F.col("df") + F.lit(0.5))
                  / (F.col("df") + F.lit(0.5)))
            * F.col("tf") * F.lit(k1 + 1.0)
            / (F.col("tf")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("dl") / F.col("avgdl"))),
            6))
    )

    scored = (
        term.groupBy("query_id", "doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("tok", "ts"))).alias("_c"))
        .withColumn("score", F.bround(F.aggregate(
            "_c", F.lit(0.0), lambda acc, x: acc + x["ts"]), 6))
        .drop("_c")
    )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
