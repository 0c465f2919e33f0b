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


def cosine_rank(
    query_vecs: DataFrame, corpus: DataFrame, k: int = 20,
    n_salts: int = 32,
) -> DataFrame:
    """Rank a corpus of (doc_id, embedding) against a small frame of
    (query_id, embedding) query vectors by cosine — the semantic arm
    of hybrid retrieval. -> (query_id, doc_id, cosine, rank <= k).

    Scale shape: the query frame is the WORKLOAD (a handful of rows)
    and broadcasts; the corpus scans once. The top-k itself is the
    two-phase salted pattern: a naive per-query row_number window
    would shuffle the whole scored corpus into n_queries partitions —
    the classic low-cardinality window skew — so phase 1 takes the
    per-(query, salt) top-k on a deterministic doc-hash salt (balanced
    by construction, n_queries x n_salts partitions), and phase 2
    ranks only the <= n_salts*k survivors per query. Any global top-k
    row is necessarily in its salt group's top-k, so the result is
    exactly the global top-k, independent of n_salts (tested).

    Cosine uses the fixed-order double dot (similarity.dot_exact) so
    values — and therefore ranks, with the doc_id tiebreak — are
    bit-identical across engines and partitionings.
    """
    from lamapi_spark.ops.similarity import cosine_exact

    q = query_vecs.select(F.col("query_id"), F.col("embedding").alias("_qv"))
    c = corpus.select(F.col("doc_id"), F.col("embedding").alias("_cv"))
    scored = (
        c.join(F.broadcast(q))
        .withColumn("cosine", cosine_exact(F.col("_qv"), F.col("_cv")))
        .withColumn("_salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)))
    )
    order = [F.desc("cosine"), F.asc("doc_id")]
    w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "cosine", "rank")
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 10,
             k0: int = 60) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke, SIGIR'09) of ranked
    lists from heterogeneous retrievers — the standard hybrid-search
    combiner (lexical BM25 + embedding cosine in RAG/training-data
    retrieval stacks):

        score(q, d) = sum over rankers r listing d of 1 / (k0 + rank_r)

    Each input frame carries (query_id, doc_id, rank); a document
    absent from a ranker simply contributes nothing. Per-ranker
    contributions round half-even to 6 decimals and sum in RANKER
    order via the sorted-struct-array fold (the BM25 discipline), so
    the fused score is bit-identical across engines and partitionings.

    Scale shape: inputs are already per-query top-k lists, so the
    fusion frame is bounded at n_rankers * k_in rows per query — one
    shuffle on (query_id, doc_id), and the final per-query window runs
    over that bounded set (no salting needed, unlike cosine_rank's
    corpus-sized window input). -> (query_id, doc_id, score, rank).
    """
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            "query_id", "doc_id", F.lit(i).alias("_ranker"),
            F.bround(F.lit(1.0) / (F.lit(float(k0)) + F.col("rank")), 6)
            .alias("_contrib"))
        tagged = t if tagged is None else tagged.unionByName(t)
    if tagged is None:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused = (
        tagged.groupBy("query_id", "doc_id")
        .agg(F.sort_array(F.collect_list(
            F.struct("_ranker", "_contrib"))).alias("_c"))
        .withColumn("score", F.bround(F.aggregate(
            "_c", F.lit(0.0), lambda acc, x: acc + x["_contrib"]), 6))
        .drop("_c")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def mmr_rerank(ranked: DataFrame, corpus: DataFrame, k: int = 3,
               w_rel: float = 0.7, w_div: float = 0.3) -> DataFrame:
    """Maximal-marginal-relevance diversification of a retrieval list
    (Carbonell & Goldstein 1998): greedily pick the candidate
    maximizing  w_rel * relevance - w_div * max_sim_to_already_picked,
    so near-duplicate passages stop crowding out coverage — the
    standard RAG post-rank step between retrieval and the context
    window.

    ``ranked``: (query_id, doc_id, cosine) — a BOUNDED per-query
    candidate list (cosine_rank / rrf_fuse output, tens of rows per
    query); the per-query pairwise similarity product is bounded by
    that list's square, never by the corpus. ``corpus``: (doc_id,
    embedding) supplying vectors for the candidate-candidate cosines.

    The greedy loop is ``k`` UNROLLED fixed-iteration DataFrame steps
    (the label-propagation / EM discipline — no UDF, no driver loop
    over data): each step is one anti-join (drop picked), one
    max-similarity aggregation against the picked set, one struct-min
    argmax with the (score desc, doc_id asc) total-order tiebreak.
    Pick 1 scores w_rel * cosine (max over an empty picked set = 0).

    Determinism/portability: cosine_exact doubles are bit-identical
    across engines and partitionings; scores are single IEEE
    multiply/subtract ops on them. ``w_rel``/``w_div`` are SEPARATE
    explicit literals — deriving w_div as 1 - w_rel in Python would
    bind 0.30000000000000004 while an engine's 0.3 literal is a
    different double (a real cross-engine hash trap).

    -> (query_id, doc_id, mmr, pick_rank <= k); queries with fewer
    than k candidates emit what they have."""
    from lamapi_spark.ops.similarity import cosine_exact

    cand = (ranked.select("query_id", "doc_id", "cosine")
            .join(corpus.select("doc_id", F.col("embedding").alias("_v")),
                  "doc_id"))
    a = cand.select("query_id", F.col("doc_id").alias("id_a"),
                    F.col("_v").alias("_va"))
    b = cand.select("query_id", F.col("doc_id").alias("id_b"),
                    F.col("_v").alias("_vb"))
    sims = (a.join(b, "query_id")
            .filter(F.col("id_a") != F.col("id_b"))
            .select("query_id", "id_a", "id_b",
                    cosine_exact(F.col("_va"), F.col("_vb")).alias("_sim")))
    cand = cand.drop("_v")

    def argmax(df, rank_i: int) -> DataFrame:
        m = df.groupBy("query_id").agg(F.min(F.struct(
            (-F.col("_score")).alias("ns"),
            F.col("doc_id").alias("d"))).alias("_m"))
        return m.select("query_id", F.col("_m.d").alias("doc_id"),
                        (-F.col("_m.ns")).alias("mmr"),
                        F.lit(rank_i).alias("pick_rank"))

    picks = argmax(
        cand.withColumn("_score", F.lit(w_rel) * F.col("cosine")), 1)
    for i in range(2, k + 1):
        sel = picks.select("query_id", "doc_id")
        rem = cand.join(sel, ["query_id", "doc_id"], "left_anti")
        ms = (sims.join(sel.select("query_id",
                                   F.col("doc_id").alias("id_b")),
                        ["query_id", "id_b"])
              .groupBy("query_id", F.col("id_a").alias("doc_id"))
              .agg(F.max("_sim").alias("_ms")))
        scored = (rem.join(ms, ["query_id", "doc_id"])
                  .withColumn("_score",
                              F.lit(w_rel) * F.col("cosine")
                              - F.lit(w_div) * F.col("_ms")))
        picks = picks.unionByName(argmax(scored, i))
    return picks


def bradley_terry(games: DataFrame, winner_col: str = "winner",
                  loser_col: str = "loser", iters: int = 6,
                  scale: int = 1_000_000) -> DataFrame:
    """Bradley-Terry strength estimation from pairwise outcomes — the
    model behind every arena/preference leaderboard (which assistant
    variant wins head-to-head judgments), fit with Hunter's (2004) MM
    algorithm for a FIXED number of rounds in pure BIGINT arithmetic
    (the fs_em_weights discipline), so the result is a bit-exact pure
    function of (games, iters, scale) and the SQL oracle unrolls the
    identical rounds.

    With W_i = wins of i, n_ij = games between i and j, and strengths
    w in units of 1/scale (K = scale * 10^6 the precision constant):

        D_i   = sum over opponents j of  n_ij * K DIV (w_i + w_j)
        w_i'  = W_i * K DIV D_i
        then normalize: w_i <- w_i' * (n_players * scale) DIV sum(w')

    Every division is integer DIV (order-independent BIGINT sums —
    each term a deterministic quantization, relative error <= 1e-6
    per round); zero-strength collisions guard the denominator with
    greatest(.., 1). A player with zero wins converges to strength 0
    — the true degenerate MLE; callers wanting regularization add
    virtual games first. Overflow bounds: n_ij * K needs n_ij < 9e6
    games per pair; w' * n_players * scale needs n_players < ~9e5.

    Scale shape per round: two player-keyed joins land strengths on
    the symmetrized pair-count frame (bounded by the rivalry graph),
    one opponent-sum agg, one wins join, one 1-row broadcast
    normalizer; localCheckpoint truncates round lineage. -> (player,
    wins, games, strength) with strength in scale units.
    """
    k = int(scale) * 1_000_000
    g = games.select(F.col(winner_col).alias("_w"),
                     F.col(loser_col).alias("_l"))
    wins = g.groupBy(F.col("_w").alias("player")).agg(
        F.count("*").alias("wins"))
    und = (g.select(F.least("_w", "_l").alias("a"),
                    F.greatest("_w", "_l").alias("b"))
           .groupBy("a", "b").agg(F.count("*").alias("n")))
    sym = (und.select(F.col("a").alias("i"), F.col("b").alias("j"), "n")
           .unionByName(und.select(F.col("b").alias("i"),
                                   F.col("a").alias("j"), "n"))
           .localCheckpoint(eager=True))
    players = (sym.select(F.col("i").alias("player")).distinct()
               .join(wins, "player", "left")
               .withColumn("wins", F.coalesce("wins", F.lit(0)))
               .localCheckpoint(eager=True))
    n_players = players.agg(F.count("*").alias("_np"))
    w = players.select("player", F.lit(int(scale)).cast("long")
                       .alias("w"))
    for _ in range(int(iters)):
        d = (sym
             .join(w.select(F.col("player").alias("i"),
                            F.col("w").alias("_wi")), "i")
             .join(w.select(F.col("player").alias("j"),
                            F.col("w").alias("_wj")), "j")
             .groupBy(F.col("i").alias("player"))
             .agg(F.sum(F.expr(
                 f"n * {k}L DIV greatest(_wi + _wj, 1L)")).alias("_d")))
        upd = (d.join(players, "player")
               .select("player", F.expr(
                   f"(wins * {k}L) DIV greatest(_d, 1L)").alias("w")))
        tot = upd.agg(F.coalesce(F.sum("w"), F.lit(1)).alias("_tot"))
        w = (upd.join(F.broadcast(tot)).join(F.broadcast(n_players))
             .select("player", F.expr(
                 f"(w * (_np * {int(scale)}L)) DIV greatest(_tot, 1L)")
                 .alias("w"))
             .localCheckpoint(eager=True))
    gcnt = sym.groupBy(F.col("i").alias("player")).agg(
        F.sum("n").alias("games"))
    return (players.join(gcnt, "player")
            .join(w, "player")
            .select("player", "wins", "games",
                    F.col("w").alias("strength")))
