"""Round-4 tenth-part sweep: governance (k-anonymity / l-diversity),
forecast-quality decomposition (Brier / Murphy), sequence analytics
(per-key autocorrelation, Markov role-transition stationary
distribution, gapped sequential patterns), robust trend (Theil-Sen),
and character-level MT eval (chrF) — measurement and release-gate
surface a fleet-scale training-data pipeline runs beside the
round-4 stats family. Every query has a DuckDB oracle that rebuilds
the dataflow independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lamapi_spark.queries import load, register

# ------------------------------------------------- k-anonymity census


@register("privacy_k_anonymity", """
WITH g AS (
  SELECT c_mktsegment, c_nationkey, c_custkey % 3 AS zip_bin,
         count(*)::BIGINT AS k,
         count(DISTINCT CASE WHEN c_acctbal >= 0 THEN 'pos'
                             ELSE 'neg' END)::BIGINT AS l
  FROM customer GROUP BY 1, 2, 3)
SELECT k, count(*)::BIGINT AS n_groups, sum(k)::BIGINT AS n_rows,
       sum(CASE WHEN k < 5 THEN 1 ELSE 0 END)::BIGINT AS groups_below_k,
       sum(CASE WHEN l < 2 THEN 1 ELSE 0 END)::BIGINT AS groups_low_l
FROM g GROUP BY k ORDER BY k
""")
def privacy_k_anonymity(spark, sf):
    """k-anonymity / l-diversity release census
    (ops/governance.k_anonymity_census) over customer with the QI
    tuple (mktsegment, nationkey, custkey%3) — the %3 bin plays the
    zip-code role, keeping sub-threshold groups real at every sf — and the
    account-balance sign as the sensitive attribute (l in {1, 2}, so
    the l-diversity branch is load-bearing). The oracle replays the
    QI grouping, both thresholds, and the census rollup."""
    from lamapi_spark.ops.governance import k_anonymity_census

    c = load(spark, sf, "customer").select(
        "c_mktsegment", "c_nationkey",
        (F.col("c_custkey") % 3).alias("zip_bin"),
        F.when(F.col("c_acctbal") >= 0, F.lit("pos"))
        .otherwise(F.lit("neg")).alias("bal_sign"))
    return k_anonymity_census(
        c, ["c_mktsegment", "c_nationkey", "zip_bin"], "bal_sign",
        k_threshold=5, l_threshold=2).orderBy("k")


# ------------------------------------------------- Brier / Murphy


@register("eval_brier", """
WITH d AS (
  SELECT ((o_orderkey % 100) + 0.5) / 100.0 AS p,
         CASE WHEN 10 * (((o_orderkey * 104729) % 99991) % 100)
                   < 8 * (o_orderkey % 100) + 100
              THEN 1 ELSE 0 END AS y
  FROM orders),
pb AS (
  SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
         count(*)::BIGINT AS n_k, sum(y)::BIGINT AS sum_y,
         sum(round_even(p, 9)::DECIMAL(28,9)) AS sum_p,
         sum(round_even((p - y) * (p - y), 12)::DECIMAL(38,12)) AS sum_sq
  FROM d GROUP BY 1),
t AS (SELECT sum(n_k)::BIGINT AS n, sum(sum_y)::BIGINT AS sy,
             sum(sum_sq) AS ssq FROM pb),
terms AS (
  SELECT round_even(n_k * (CAST(sum_p AS DOUBLE) / n_k - CAST(sum_y AS DOUBLE) / n_k)
                        * (CAST(sum_p AS DOUBLE) / n_k - CAST(sum_y AS DOUBLE) / n_k), 9)
           AS rel_t,
         round_even(n_k * (CAST(sum_y AS DOUBLE) / n_k - CAST(t.sy AS DOUBLE) / t.n)
                        * (CAST(sum_y AS DOUBLE) / n_k - CAST(t.sy AS DOUBLE) / t.n), 9)
           AS res_t
  FROM pb CROSS JOIN t),
s AS (SELECT sum(rel_t::DECIMAL(28,9)) AS rel_s,
             sum(res_t::DECIMAL(28,9)) AS res_s FROM terms)
SELECT t.n AS n, 10 AS n_bins,
       round_even(CAST(t.ssq AS DOUBLE) / t.n, 6) AS brier,
       round_even(CAST(s.rel_s AS DOUBLE) / t.n, 6) AS reliability,
       round_even(CAST(s.res_s AS DOUBLE) / t.n, 6) AS resolution,
       round_even((CAST(t.sy AS DOUBLE) / t.n)
                  * (1 - CAST(t.sy AS DOUBLE) / t.n), 6) AS uncertainty,
       round_even(round_even(CAST(t.ssq AS DOUBLE) / t.n, 6)
                  - (round_even(CAST(s.rel_s AS DOUBLE) / t.n, 6)
                     - round_even(CAST(s.res_s AS DOUBLE) / t.n, 6)
                     + round_even((CAST(t.sy AS DOUBLE) / t.n)
                                  * (1 - CAST(t.sy AS DOUBLE) / t.n), 6)), 6)
         AS decomp_gap
FROM t CROSS JOIN s
""")
def eval_brier(spark, sf):
    """Brier score + Murphy decomposition
    (ops/metrics.brier_decomposition) over a PLANTED miscalibrated
    forecaster: forecast p = (k%100 + 0.5)/100 on a uniform grid, true
    outcome probability 0.8p + 0.1 (a linear distortion, so
    reliability is well off 0 while resolution stays large), the
    outcome draw a deterministic 104729/99991 hash of the orderkey.
    The oracle replays the bin assignment, every DECIMAL sum, the
    per-bin rel/res terms in the same float order, and the
    already-rounded-components gap convention."""
    from lamapi_spark.ops.metrics import brier_decomposition

    o = load(spark, sf, "orders")
    k = F.col("o_orderkey")
    d = o.select(
        (((k % 100) + 0.5) / 100.0).alias("score"),
        F.when(10 * (((k * 104729) % 99991) % 100) < 8 * (k % 100) + 100,
               F.lit(1)).otherwise(F.lit(0)).alias("label"))
    return brier_decomposition(d, "score", "label", n_bins=10)


# ------------------------------------------------- per-key ACF


@register("events_acf", """
WITH d AS (
  SELECT event_type AS key, ts, event_id,
         CAST(round_even(value * 100, 0) AS BIGINT) AS x
  FROM events WHERE event_id % 4 = 0),
s AS (
  SELECT key, x,
         row_number() OVER (PARTITION BY key ORDER BY ts, event_id) AS t,
         count(*) OVER (PARTITION BY key) AS n,
         sum(x) OVER (PARTITION BY key) AS sx
  FROM d),
c AS (SELECT key, t, n, CAST(n * x - sx AS HUGEINT) AS c FROM s),
den AS (SELECT key, any_value(n)::BIGINT AS n, sum(c * c) AS den
        FROM c GROUP BY key),
num AS (
  SELECT a.key, (b.t - a.t)::BIGINT AS lag, sum(a.c * b.c) AS num
  FROM c a JOIN c b ON a.key = b.key AND b.t - a.t BETWEEN 1 AND 5
  GROUP BY 1, 2)
SELECT den.key AS key, den.n AS n, num.lag AS lag,
       CASE WHEN den.den > 0
            THEN round_even(CAST(num.num AS DOUBLE)
                            / CAST(den.den AS DOUBLE), 6)
            ELSE 0.0 END AS r
FROM den JOIN num ON den.key = num.key
WHERE den.n BETWEEN 2 AND 32768 ORDER BY key, lag
""")
def events_acf(spark, sf):
    """Per-event-type sequence autocorrelation at lags 1..5
    (ops/temporal.acf_by) over the event-id-thinned value series
    (x = round(value*100), an exact integer), ordered by (ts,
    event_id). The oracle rebuilds the n-scaled centering (c = n*x -
    S), the HUGEINT numerator/denominator sums via a window + lag
    self-join — structurally independent of the in-row fold — and the
    single rounded division."""
    from lamapi_spark.ops.temporal import acf_by

    e = load(spark, sf, "events").filter(F.col("event_id") % 4 == 0)
    d = e.select(F.col("event_type"), F.col("ts"), F.col("event_id"),
                 F.bround(F.col("value") * 100, 0).cast("long").alias("x"))
    return (acf_by(d, "event_type", ["ts", "event_id"], "x", max_lag=5)
            .orderBy("key", "lag"))


# ------------------------------------------------- Theil-Sen trend


@register("eval_theil_sen", """
WITH d AS (
  SELECT o_orderpriority AS key,
         CAST(o_orderkey % 1000 AS DOUBLE) AS x,
         CAST(3 * (o_orderkey % 1000) + 50
              + ((o_orderkey * 104729) % 97) - 48
              + CASE WHEN o_orderkey % 13 = 0 THEN 100000 ELSE 0 END
              AS DOUBLE) AS y
  FROM orders WHERE o_orderkey % 97 = 0),
s AS (SELECT key, x, y,
             row_number() OVER (PARTITION BY key ORDER BY x, y) AS t,
             count(*) OVER (PARTITION BY key) AS n
      FROM d),
sl AS (SELECT a.key, a.n, (b.y - a.y) / (b.x - a.x) AS slope
       FROM s a JOIN s b ON a.key = b.key AND a.t < b.t AND a.x <> b.x),
mr AS (SELECT key, n, slope,
              row_number() OVER (PARTITION BY key ORDER BY slope) AS rn,
              count(*) OVER (PARTITION BY key) AS m
       FROM sl),
b AS (SELECT key, any_value(n)::BIGINT AS n, any_value(m)::BIGINT AS m,
             any_value(slope) AS slope
      FROM mr WHERE rn = (m + 1) // 2 GROUP BY key),
r AS (SELECT d.key, d.y - b.slope * d.x AS resid, b.n, b.m, b.slope
      FROM d JOIN b ON d.key = b.key),
ri AS (SELECT key, n, m, slope, resid,
              row_number() OVER (PARTITION BY key ORDER BY resid) AS rn
       FROM r)
SELECT key, n, m AS n_slopes, round_even(slope, 6) AS slope,
       round_even(any_value(resid), 6) AS intercept
FROM ri WHERE rn = (n + 1) // 2 AND n BETWEEN 2 AND 512
GROUP BY key, n, m, slope ORDER BY key
""")
def eval_theil_sen(spark, sf):
    """Theil-Sen robust trend per order priority
    (ops/metrics.theil_sen_by) over a PLANTED line y = 3x + 50 with
    bounded hash noise AND a gross +100000 outlier on every 13th
    orderkey — the corruption that would drag an OLS slope far off 3
    moves the pairwise-slope median barely at all (the planted check
    the unit test pins). The oracle rebuilds the (x,y)-ordered pair
    set with a rank self-join, both lower-median selections, and the
    shared IEEE slope/residual shape."""
    from lamapi_spark.ops.metrics import theil_sen_by

    o = load(spark, sf, "orders").filter(F.col("o_orderkey") % 97 == 0)
    k = F.col("o_orderkey")
    d = o.select(
        F.col("o_orderpriority").alias("key"),
        (k % 1000).cast("double").alias("x"),
        (3 * (k % 1000) + 50 + ((k * 104729) % 97) - 48
         + F.when(k % 13 == 0, F.lit(100000)).otherwise(F.lit(0)))
        .cast("double").alias("y"))
    return theil_sen_by(d, "key", "x", "y", max_n=512).orderBy("key")


# ------------------------------------------------- gapped tool patterns


_TOOLSEQ_SQL2 = """
trt AS (
  SELECT 'c' || o_custkey AS conv_id,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey)::INT AS turn_idx,
         CASE WHEN o_orderkey % 2 = 1 THEN 'tool' ELSE 'user' END AS role,
         CASE WHEN o_orderkey % 2 = 1 THEN
           ['search', 'lookup', 'calc', 'fetch'][(o_orderkey % 8 + 1) // 2]
         END AS tool
  FROM orders
),
seq AS (
  SELECT conv_id, list(tool ORDER BY turn_idx) AS tools
  FROM trt WHERE role = 'tool' AND tool IS NOT NULL GROUP BY conv_id
)"""


@register("kg_tool_patterns", f"""
WITH {_TOOLSEQ_SQL2},
pos AS (
  SELECT conv_id, (u.t)::INT AS t, u.tool FROM (
    SELECT conv_id, unnest(list_transform(range(1, len(tools) + 1),
           i -> struct_pack(t := i, tool := tools[i]))) AS u
    FROM seq WHERE len(tools) <= 32)),
p2 AS (SELECT a.conv_id, a.tool || '~>' || b.tool AS pattern
       FROM pos a JOIN pos b ON a.conv_id = b.conv_id AND a.t < b.t),
p3 AS (SELECT a.conv_id,
              a.tool || '~>' || b.tool || '~>' || c.tool AS pattern
       FROM pos a JOIN pos b ON a.conv_id = b.conv_id AND a.t < b.t
            JOIN pos c ON b.conv_id = c.conv_id AND b.t < c.t),
allp AS (SELECT * FROM p2 UNION ALL SELECT * FROM p3)
SELECT pattern, len(string_split(pattern, '~>'))::INT AS k,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       count(*)::BIGINT AS n_occ
FROM allp GROUP BY pattern ORDER BY pattern
""")
def kg_tool_patterns(spark, sf):
    """GAPPED sequential tool patterns over agent transcripts
    (pipeline/triples.tool_sequence_patterns) — the PrefixSpan-style
    'a eventually b' miner beside kg_tool_ngrams' contiguous chains,
    on the SAME four-tool rotation synth so the two pattern families
    cross-check (every contiguous occurrence is also a gapped
    embedding). The oracle enumerates index tuples with positional
    self-joins — structurally independent of the in-row nested
    transform."""
    from lamapi_spark.pipeline.triples import tool_sequence_patterns

    from pyspark.sql import Window
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    names = F.array(F.lit("search"), F.lit("lookup"),
                    F.lit("calc"), F.lit("fetch"))
    trt = o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.when(F.col("o_orderkey") % 2 == 1, F.lit("tool"))
        .otherwise(F.lit("user")).alias("role"),
        F.when(F.col("o_orderkey") % 2 == 1,
               F.element_at(names, ((F.col("o_orderkey") % 8 + 1) / 2)
                            .cast("int"))).alias("tool"))
    return (tool_sequence_patterns(trt, max_seq=32)
            .orderBy("pattern"))


# ------------------------------------------------- Markov stationary


_MK_ROUNDS = 20


def _mk_round(k: int) -> str:
    # MATERIALIZED is load-bearing: each round references states + its
    # predecessor; DuckDB inlines plain CTEs per reference, so 20 chained
    # rounds re-expand (and re-execute) the window census exponentially —
    # the rag_mmr_rerank / graph_hits round-5 lesson (>150s at sf0.1 -> ~1s)
    return f"""
r{k} AS MATERIALIZED (
  SELECT st.s AS state, coalesce(x.pi, 0.0) AS pi
  FROM states st LEFT JOIN (
    SELECT tp.s_to AS state,
           CAST(sum(round_even(r.pi * tp.p, 12)::DECIMAL(38,12)) AS DOUBLE)
             AS pi
    FROM r{k - 1} r JOIN tp ON tp.s_from = r.state
    GROUP BY tp.s_to) x ON x.state = st.s)"""


@register("kg_role_stationary", f"""
WITH trt AS (
  SELECT 'c' || o_custkey AS conv_id,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey)::INT AS turn_idx,
         CASE o_orderkey % 4 WHEN 0 THEN 'user' WHEN 1 THEN 'tool'
              WHEN 2 THEN 'tool' ELSE 'assistant' END AS role
  FROM orders),
pr AS (SELECT conv_id, role,
              lead(role) OVER (PARTITION BY conv_id
                               ORDER BY turn_idx) AS nxt
       FROM trt),
trans AS (SELECT role AS s_from, nxt AS s_to, count(*)::BIGINT AS c
          FROM pr WHERE nxt IS NOT NULL GROUP BY 1, 2),
tt AS (SELECT s_from, sum(c)::BIGINT AS tot FROM trans GROUP BY 1),
tp AS MATERIALIZED (SELECT t.s_from, t.s_to,
              round_even(CAST(t.c AS DOUBLE) / tt.tot, 12) AS p
       FROM trans t JOIN tt ON t.s_from = tt.s_from),
states AS MATERIALIZED (SELECT DISTINCT s FROM
           (SELECT s_from AS s FROM tp UNION SELECT s_to FROM tp)),
sc AS (SELECT count(*)::BIGINT AS s FROM states),
r0 AS (SELECT states.s AS state, round_even(1.0 / sc.s, 12) AS pi
       FROM states CROSS JOIN sc),
{",".join(_mk_round(k + 1) for k in range(_MK_ROUNDS))}
SELECT r.state AS state, coalesce(tt.tot, 0)::BIGINT AS n_out, r.pi AS pi
FROM r{_MK_ROUNDS} r LEFT JOIN tt ON tt.s_from = r.state
ORDER BY state
""")
def kg_role_stationary(spark, sf):
    """Role-transition Markov chain over agent transcripts
    (ops/temporal.markov_stationary): consecutive-turn role pairs
    (user/tool/tool/assistant rotation planted per orderkey) feed a
    transition matrix whose stationary distribution is reached by 20
    fixed power-iteration rounds from uniform — every round a 12-dp
    DECIMAL sum, so the vector is bit-reproducible. The oracle unrolls
    all 20 rounds as chained CTEs over a lead()-window pair census —
    structurally independent of the in-row matrix fold."""
    from lamapi_spark.ops.temporal import markov_stationary

    from pyspark.sql import Window
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    m4 = F.col("o_orderkey") % 4
    trt = o.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("conv_id"),
        F.row_number().over(w).cast("int").alias("turn_idx"),
        F.when(m4 == 0, F.lit("user")).when(m4.isin(1, 2), F.lit("tool"))
        .otherwise(F.lit("assistant")).alias("role"))
    return (markov_stationary(trt, "conv_id", "turn_idx", "role",
                              rounds=_MK_ROUNDS)
            .orderBy("state"))


# ------------------------------------------------- corpus chrF


def _chrf_gram_sql(t: str, n: int) -> str:
    return (f"list_transform(range(1, greatest(len({t}) - {n - 1}, 0)"
            f" + 1), i -> '{n}|' || substring({t}, i, {n}))")


_CHRF_LVL = " + ".join(
    f"CASE WHEN ctotal_{n} + rtotal_{n} > 0 THEN 1 ELSE 0 END"
    for n in range(1, 7))
_CHRF_P = " + ".join(
    f"CASE WHEN ctotal_{n} > 0"
    f" THEN match_{n} / CAST(ctotal_{n} AS DOUBLE) ELSE 0.0 END"
    for n in range(1, 7))
_CHRF_R = " + ".join(
    f"CASE WHEN rtotal_{n} > 0"
    f" THEN match_{n} / CAST(rtotal_{n} AS DOUBLE) ELSE 0.0 END"
    for n in range(1, 7))


@register("eval_chrf", f"""
WITH t AS (
  SELECT doc_id AS id,
         replace(substring(text, 1,
                 CAST(floor(len(text) * 4 / 5) AS INT)), 'e', '3') AS cand,
         text AS ref
  FROM documents),
nn AS (SELECT id,
         regexp_replace(lower(trim(cand)), '\\s+', '', 'g') AS cs,
         regexp_replace(lower(trim(ref)), '\\s+', '', 'g') AS rs
       FROM t),
g AS (SELECT id,
        flatten([{", ".join(_chrf_gram_sql('cs', n) for n in range(1, 7))}])
          AS cg,
        flatten([{", ".join(_chrf_gram_sql('rs', n) for n in range(1, 7))}])
          AS rg
      FROM nn),
cc AS (SELECT id, g AS gram, count(*)::BIGINT AS cnt
       FROM (SELECT id, unnest(cg) AS g FROM g) GROUP BY id, g),
rc AS (SELECT id, g AS gram, count(*)::BIGINT AS cnt
       FROM (SELECT id, unnest(rg) AS g FROM g) GROUP BY id, g),
m AS (SELECT left(cc.gram, 1)::INT AS n,
             sum(least(cc.cnt, rc.cnt))::BIGINT AS m
      FROM cc JOIN rc ON cc.id = rc.id AND cc.gram = rc.gram
      GROUP BY 1),
tot AS (SELECT
        {', '.join(f'sum(greatest(len(cs) - {n - 1}, 0))::BIGINT'
                   f' AS ctotal_{n}' for n in range(1, 7))},
        {', '.join(f'sum(greatest(len(rs) - {n - 1}, 0))::BIGINT'
                   f' AS rtotal_{n}' for n in range(1, 7))}
        FROM nn),
mw AS (SELECT {', '.join(
           f'coalesce(sum(CASE WHEN n = {n} THEN m END), 0)::BIGINT'
           f' AS match_{n}' for n in range(1, 7))}
       FROM m),
pre AS (
  SELECT *, ({_CHRF_LVL}) AS lvl, ({_CHRF_P}) AS psum, ({_CHRF_R}) AS rsum
  FROM tot CROSS JOIN mw),
fin AS (
  SELECT *,
         CASE WHEN lvl > 0 THEN psum / lvl ELSE 0.0 END AS p,
         CASE WHEN lvl > 0 THEN rsum / lvl ELSE 0.0 END AS r
  FROM pre)
SELECT {', '.join(f'ctotal_{n}' for n in range(1, 7))},
       {', '.join(f'rtotal_{n}' for n in range(1, 7))},
       {', '.join(f'match_{n}' for n in range(1, 7))},
       round_even(p, 6) AS chrp, round_even(r, 6) AS chrr,
       round_even(CASE WHEN p + r > 0
                       THEN 5.0 * p * r / (4.0 * p + r)
                       ELSE 0.0 END, 6) AS chrf
FROM fin
""")
def eval_chrf(spark, sf):
    """Corpus chrF with beta=2 (ops/metrics.chrf_corpus) over planted
    generation pairs: candidate = the first 4/5 of each document's
    characters with every 'e' corrupted to '3', reference = the full
    text — so char-level precision AND recall are both meaningfully
    below 1 and asymmetric (truncation hits recall, corruption hits
    both). The oracle replays the whitespace-stripped normalization,
    the flattened 6-level "n|gram" encoding, the clipped per-pair
    join, both corpus rollups, and the fixed-order level means + F2
    expression."""
    from lamapi_spark.ops.metrics import chrf_corpus

    docs = load(spark, sf, "documents")
    flen = F.floor(F.length("text") * 4 / 5).cast("int")
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.regexp_replace(F.col("text").substr(F.lit(1), flen),
                         "e", "3").alias("cand"),
        F.col("text").alias("ref"))
    return chrf_corpus(pairs, "pair_id", "cand", "ref",
                       max_n=6, beta=2.0)


# ------------------------------------------------- RAKE keywords


def _stoplist_sql() -> str:
    from lamapi_spark.functions.strings import STOPWORDS
    return ", ".join(f"'{s}'" for s in sorted(STOPWORDS))


@register("corpus_rake", f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents),
m AS (SELECT doc_id,
             list_transform(toks, w -> CASE WHEN w IN ({_stoplist_sql()})
                                       THEN chr(1) ELSE w END) AS mk
      FROM d),
occ AS (
  SELECT doc_id, p AS phrase FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(array_to_string(mk, ' '),
                                '\\s*' || chr(1) || '\\s*'),
             p -> len(p) > 0)) AS p
    FROM m)),
ow AS (SELECT doc_id, len(string_split(phrase, ' '))::BIGINT AS plen,
              unnest(string_split(phrase, ' ')) AS w
       FROM occ),
ws AS (SELECT doc_id, w,
              round_even(CAST(sum(plen) AS DOUBLE) / count(*), 9)
                AS wscore
       FROM ow GROUP BY doc_id, w),
cand AS (SELECT DISTINCT doc_id, phrase FROM occ),
cw AS (SELECT doc_id, phrase, unnest(string_split(phrase, ' ')) AS w
       FROM cand),
sc AS (SELECT cw.doc_id, cw.phrase, count(*)::BIGINT AS n_words,
              CAST(sum(ws.wscore::DECIMAL(28,9)) AS DOUBLE) AS score
       FROM cw JOIN ws ON cw.doc_id = ws.doc_id AND cw.w = ws.w
       GROUP BY cw.doc_id, cw.phrase),
rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, phrase ASC)
                   ::BIGINT AS rk
       FROM sc)
SELECT doc_id, phrase, n_words, score, rk
FROM rk WHERE rk <= 3 ORDER BY doc_id, rk
""")
def corpus_rake(spark, sf):
    """Per-document RAKE keyword phrases (ops/corpus.rake_keywords,
    k=3) over the documents corpus — candidates are maximal
    stopword-free token runs ('the'/'a' in the template vocabulary
    make the split real), word score deg/freq over candidate
    occurrences, phrase score a DECIMAL sum of 9-dp word scores. The
    oracle replays the mark-rejoin-split run extraction, both aggs,
    the join, and the tie-broken per-document window."""
    from lamapi_spark.ops.corpus import rake_keywords

    docs = load(spark, sf, "documents")
    return (rake_keywords(docs, "doc_id", "text", k=3)
            .orderBy("doc_id", "rk"))


# ------------------------------------------------- expected reciprocal rank


def _err_prefix(r: int) -> str:
    e = "1.0"
    for i in range(1, r):
        e = f"({e} * coalesce(1.0 - rr_{i}, 1.0))"
    return e


_ERR_TERMS = " + ".join(
    f"CASE WHEN rr_{r} IS NOT NULL THEN {_err_prefix(r)} * rr_{r} / {r} "
    f"ELSE 0.0 END" for r in range(1, 11))
_ERR_PIVOT = ", ".join(
    f"max(CASE WHEN rank = {r} THEN (power(2.0, g) - 1.0) / 8.0 END)"
    f" AS rr_{r}" for r in range(1, 11))


@register("eval_err", f"""
WITH ids AS (SELECT DISTINCT (o_orderkey % 2000)::BIGINT AS i FROM orders),
d AS (SELECT 'q' || (i % 200) AS query_id,
             ((i // 200) + 1)::INT AS rank,
             ((i * 7) % 4)::INT AS g
      FROM ids),
pv AS (SELECT query_id, count(*)::BIGINT AS n_ranked, {_ERR_PIVOT}
       FROM d WHERE rank <= 10 GROUP BY query_id)
SELECT query_id, n_ranked, round_even({_ERR_TERMS}, 6) AS err
FROM pv ORDER BY query_id
""")
def eval_err(spark, sf):
    """Expected Reciprocal Rank (ops/metrics.err_eval) over a planted
    200-query ranking lattice (rank = id block, graded gain an
    (i*7)%4 rotation — every grade 0..3 occurs at every rank band).
    The oracle UNROLLS the cascade: rank-pivoted satisfaction
    probabilities with explicit left-associated prefix products and
    identity steps for absent ranks — term-for-term the fold's float
    order, with no fold."""
    from lamapi_spark.ops.metrics import err_eval

    o = load(spark, sf, "orders")
    ids = o.select((F.col("o_orderkey") % 2000).alias("i")).distinct()
    d = ids.select(
        F.concat(F.lit("q"), (F.col("i") % 200)).alias("query_id"),
        ((F.col("i") / 200).cast("long") + 1).cast("int").alias("rank"),
        ((F.col("i") * 7) % 4).cast("int").alias("gain"))
    return (err_eval(d, "query_id", "rank", "gain", max_rank=10, g_max=3)
            .orderBy("query_id"))


# ------------------------------------------------- regression metrics


@register("eval_regression", """
WITH d AS (
  SELECT o_totalprice AS y,
         o_totalprice * 1.05 - 3000.0
           + (((o_orderkey * 104729) % 2001) - 1000) AS p
  FROM orders),
t AS (SELECT count(*)::BIGINT AS n,
             sum(round_even(abs(p - y), 12)::DECIMAL(38,12)) AS sae,
             sum(round_even((p - y) * (p - y), 12)::DECIMAL(38,12)) AS sse,
             sum(round_even(CASE WHEN abs(p) + abs(y) > 0
                   THEN 2 * abs(p - y) / (abs(p) + abs(y))
                   ELSE 0.0 END, 12)::DECIMAL(38,12)) AS ssm,
             sum(round_even(y, 9)::DECIMAL(38,9)) AS sy,
             sum(round_even(y * y, 9)::DECIMAL(38,9)) AS syy
      FROM d)
SELECT n,
       round_even(CAST(sae AS DOUBLE) / n, 6) AS mae,
       round_even(sqrt(CAST(sse AS DOUBLE) / n), 6) AS rmse,
       round_even(CAST(ssm AS DOUBLE) / n, 6) AS smape,
       round_even(CASE WHEN CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
                  THEN 1.0 - CAST(n AS DOUBLE) * CAST(sse AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  ELSE 0.0 END, 6) AS r2
FROM t
""")
def eval_regression(spark, sf):
    """One-pass regression eval (ops/metrics.regression_metrics) of a
    PLANTED biased predictor: p = 1.05y - 3000 + bounded hash noise
    over order prices — scale bias, offset, and noise all nonzero, so
    MAE/RMSE/sMAPE/R^2 each read a different mix of them. The oracle
    replays every 12-dp DECIMAL term sum, the y-moments, and the
    n-scaled SST identity."""
    from lamapi_spark.ops.metrics import regression_metrics

    o = load(spark, sf, "orders")
    k = F.col("o_orderkey")
    d = o.select(
        F.col("o_totalprice").alias("truth"),
        (F.col("o_totalprice") * 1.05 - 3000.0
         + (((k * 104729) % 2001) - 1000)).alias("pred"))
    return regression_metrics(d, "pred", "truth")


# ------------------------------------------------- weighted log-odds


@register("corpus_log_odds", """
WITH a AS (SELECT CASE WHEN doc_id % 2 = 0 THEN text END AS text
           FROM documents WHERE doc_id % 2 = 0),
b AS (SELECT replace(text, 'spark', 'flink') AS text
      FROM documents WHERE doc_id % 2 = 1),
ca AS (SELECT t AS token, count(*)::BIGINT AS y1 FROM
       (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
        FROM a) GROUP BY t),
cb AS (SELECT t AS token, count(*)::BIGINT AS y2 FROM
       (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
        FROM b) GROUP BY t),
j AS (SELECT coalesce(ca.token, cb.token) AS token,
             coalesce(y1, 0)::BIGINT AS y1,
             coalesce(y2, 0)::BIGINT AS y2
      FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
t AS (SELECT sum(y1)::BIGINT AS n1, sum(y2)::BIGINT AS n2 FROM j),
w AS (SELECT token, y1, y2,
             CAST(y1 AS DOUBLE) AS y1d, CAST(y2 AS DOUBLE) AS y2d,
             CAST(t.n1 AS DOUBLE) AS n1, CAST(t.n2 AS DOUBLE) AS n2,
             1000.0 * (CAST(y1 AS DOUBLE) + CAST(y2 AS DOUBLE))
               / (CAST(t.n1 AS DOUBLE) + CAST(t.n2 AS DOUBLE)) AS aw
      FROM j CROSS JOIN t WHERE y1 + y2 >= 5),
d AS (SELECT token, y1, y2,
             ln((y1d + aw) / (n1 + 1000.0 - y1d - aw))
             - ln((y2d + aw) / (n2 + 1000.0 - y2d - aw)) AS delta,
             aw, y1d, y2d
      FROM w)
SELECT token, y1, y2, round_even(delta, 6) AS delta,
       round_even(delta / sqrt(1.0 / (y1d + aw) + 1.0 / (y2d + aw)), 6)
         AS z
FROM d ORDER BY token
""")
def corpus_log_odds(spark, sf):
    """Weighted log-odds distinctive vocabulary
    (ops/corpus.log_odds_words, Monroe et al. informative-prior form)
    between the even-doc_id half of documents and the odd half with
    'spark' PLANTED as 'flink' — each replacement token is fully
    one-sided, so the two largest |z| land on exactly that pair while
    the shared template vocabulary shrinks toward 0. The oracle
    replays tokenize/counts, the pooled prior, corpus totals BEFORE
    the min-count cut, and both fixed-order float chains."""
    from lamapi_spark.ops.corpus import log_odds_words

    docs = load(spark, sf, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = (docs.filter(F.col("doc_id") % 2 == 1)
         .select(F.regexp_replace("text", "spark", "flink").alias("text")))
    return (log_odds_words(a, b, "text", alpha0=1000.0, min_count=5)
            .orderBy("token"))


# ------------------------------------------------- MAD anomalies


@register("events_anomaly_mad", """
WITH d AS (
  SELECT event_type AS key, event_id AS o,
         CAST(round_even(value * 100, 0) AS BIGINT)
           + CASE WHEN event_id % 503 = 0 THEN 1000000 ELSE 0 END AS x
  FROM events WHERE event_id % 4 = 0),
n AS (SELECT key, count(*)::BIGINT AS n FROM d GROUP BY key),
medr AS (SELECT key, x, row_number() OVER (PARTITION BY key ORDER BY x)
                         AS rn
         FROM d),
med AS (SELECT medr.key, any_value(x) AS med
        FROM medr JOIN n USING (key)
        WHERE rn = (n + 1) // 2 GROUP BY medr.key),
devr AS (SELECT d.key, abs(d.x - med.med) AS dev,
                row_number() OVER (PARTITION BY d.key
                                   ORDER BY abs(d.x - med.med)) AS rn,
                n.n AS n
         FROM d JOIN med USING (key) JOIN n USING (key)),
mad AS (SELECT key, any_value(dev) AS mad
        FROM devr WHERE rn = (n + 1) // 2 GROUP BY key)
SELECT d.key AS key, d.o AS o, d.x AS x, med.med AS med, mad.mad AS mad,
       abs(d.x - med.med) AS dev
FROM d JOIN med USING (key) JOIN mad USING (key) JOIN n USING (key)
WHERE n.n BETWEEN 3 AND 32768
  AND abs(d.x - med.med) > 5 * greatest(mad.mad, 1)
ORDER BY key, o
""")
def events_anomaly_mad(spark, sf):
    """Median-absolute-deviation anomaly flags per event type
    (ops/temporal.mad_anomalies, thresh=5) over the thinned scaled
    value series with a PLANTED +1e6 spike on every 503rd event — the
    outliers the detector must flag are exactly the ones a mean/sigma
    gate would let widen the band. Exact integers end to end; the
    oracle rebuilds both lower medians with rank windows instead of
    in-row sorted arrays."""
    from lamapi_spark.ops.temporal import mad_anomalies

    e = load(spark, sf, "events").filter(F.col("event_id") % 4 == 0)
    d = e.select(
        F.col("event_type"), F.col("event_id"),
        (F.bround(F.col("value") * 100, 0).cast("long")
         + F.when(F.col("event_id") % 503 == 0, F.lit(1000000))
         .otherwise(F.lit(0))).alias("x"))
    return (mad_anomalies(d, "event_type", "event_id", "x", thresh=5)
            .orderBy("key", "o"))


# ------------------------------------------------- n-gram novelty


@register("corpus_ngram_novelty", """
WITH tr AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
ge AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
tg AS (SELECT DISTINCT g AS gram FROM (
  SELECT unnest(CASE WHEN len(t) >= 3 THEN
           list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
         ELSE [] END) AS g
  FROM (SELECT string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM tr))),
gg AS (SELECT doc_id, g AS gram, count(*)::BIGINT AS cnt FROM (
  SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
           list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
         ELSE [] END) AS g
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
        FROM ge)) GROUP BY doc_id, g)
SELECT gg.doc_id AS doc_id, sum(cnt)::BIGINT AS n_grams,
       sum(CASE WHEN tg.gram IS NULL THEN cnt ELSE 0 END)::BIGINT
         AS n_novel,
       round_even(sum(CASE WHEN tg.gram IS NULL THEN cnt ELSE 0 END)
                  / CAST(sum(cnt) AS DOUBLE), 6) AS novelty
FROM gg LEFT JOIN tg ON gg.gram = tg.gram
GROUP BY gg.doc_id ORDER BY doc_id
""")
def corpus_ngram_novelty(spark, sf):
    """Token-3-gram novelty (ops/corpus.ngram_novelty) of the
    odd-doc_id half of documents against the even half as training —
    the template generator repeats grams across docs, so novelty sits
    strictly between 0 and 1 and every branch (seen, novel, repeated
    novel) is exercised. The oracle replays tokenization, the in-row
    gram slice, the distinct training set, and the occurrence-weighted
    left join."""
    from lamapi_spark.ops.corpus import ngram_novelty

    docs = load(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    gen = docs.filter(F.col("doc_id") % 2 == 1)
    return (ngram_novelty(gen, train, "doc_id", "text", n=3)
            .orderBy("doc_id"))


# ------------------------------------------------- permutation test


@register("eval_perm_test", """
WITH ids AS (SELECT DISTINCT (o_orderkey % 1000)::BIGINT AS i FROM orders),
d AS (SELECT 'i' || i AS iid,
             (((i * 7) % 13) + CASE WHEN i % 5 = 0 THEN 1 ELSE 0 END
              - (((i * 7) % 13) + ((i * 11) % 3) - 1))::BIGINT AS diff
      FROM ids),
obs AS (SELECT sum(diff)::BIGINT AS s_obs, count(*)::BIGINT AS n FROM d),
rep AS (SELECT iid, diff, b FROM d CROSS JOIN
        (SELECT unnest(range(1, 201)) AS b)),
perms AS (
  SELECT b, sum(CASE WHEN (('0x' || substr(md5(iid || '|' || b), 1, 1))
                           ::BIGINT) % 2 = 0
                     THEN diff ELSE -diff END)::BIGINT AS s_b
  FROM rep GROUP BY b)
SELECT obs.n AS n_items, 200 AS n_perm, obs.s_obs AS s_obs,
       sum(CASE WHEN abs(s_b) >= abs(obs.s_obs) THEN 1 ELSE 0 END)
         ::BIGINT AS n_ge,
       round_even((1 + sum(CASE WHEN abs(s_b) >= abs(obs.s_obs)
                                THEN 1 ELSE 0 END))
                  / CAST(201 AS DOUBLE), 6) AS p_value
FROM perms CROSS JOIN obs GROUP BY obs.n, obs.s_obs
""")
def eval_perm_test(spark, sf):
    """Paired sign-flip permutation test (ops/metrics.perm_test_paired,
    B=200) over a planted model pair: A carries a +1 advantage on
    every 5th item against a +-1 hash noise, so the observed summed
    difference sits far outside the sign-symmetric null and p pins to
    the add-one floor 1/201. The oracle replays the md5-parity
    permutation lattice, every signed sum, and the exceedance count."""
    from lamapi_spark.ops.metrics import perm_test_paired

    o = load(spark, sf, "orders")
    ids = o.select((F.col("o_orderkey") % 1000).alias("i")).distinct()
    i = F.col("i")
    d = ids.select(
        F.concat(F.lit("i"), i).alias("item_id"),
        (((i * 7) % 13) + F.when(i % 5 == 0, 1).otherwise(0))
        .alias("score_a"),
        (((i * 7) % 13) + ((i * 11) % 3) - 1).alias("score_b"))
    return perm_test_paired(d, "item_id", "score_a", "score_b",
                            n_perm=200)


# ------------------------------------------------- weighted kappa


@register("eval_weighted_kappa", """
WITH a AS (SELECT o_orderkey AS i, ((o_orderkey * 3) % 5)::BIGINT AS la
           FROM orders),
b AS (SELECT o_orderkey AS i,
             least(greatest(((o_orderkey * 3) % 5)
                            + ((o_orderkey * 7) % 3) - 1, 0), 4)::BIGINT
               AS lb
      FROM orders WHERE o_orderkey % 11 <> 0),
obs AS (SELECT la, lb, count(*)::BIGINT AS o
        FROM a JOIN b USING (i) GROUP BY la, lb),
ra AS (SELECT la, sum(o)::BIGINT AS r FROM obs GROUP BY la),
cb AS (SELECT lb, sum(o)::BIGINT AS c FROM obs GROUP BY lb),
t AS (SELECT sum(o)::BIGINT AS n,
             sum(((la - lb) * (la - lb) * o)::HUGEINT) AS ow
      FROM obs),
e AS (SELECT sum(((ra.la - cb.lb) * (ra.la - cb.lb)
                  * ra.r * cb.c)::HUGEINT) AS ew
      FROM ra CROSS JOIN cb)
SELECT t.n AS n, t.ow::BIGINT AS ow, e.ew::BIGINT AS ew_num,
       CASE WHEN e.ew > 0
            THEN round_even(1.0 - CAST(t.n::HUGEINT * t.ow AS DOUBLE)
                            / CAST(e.ew AS DOUBLE), 6)
            WHEN t.ow = 0 THEN 1.0 ELSE 0.0 END AS kappa_w
FROM t CROSS JOIN e
""")
def eval_weighted_kappa(spark, sf):
    """Quadratic-weighted Cohen's kappa (ops/metrics.weighted_kappa)
    between a planted 5-grade rater and a copy perturbed by a
    clamped +-1 hash shift — disagreements are mostly ADJACENT, which
    is precisely the structure plain kappa punishes and weighted
    kappa credits; every 11th item is rated by one side only and
    drops via the inner join. Exact integers to one division; the
    oracle replays cells, marginals, both HUGEINT weight sums, and
    the cross-multiplied identity."""
    from lamapi_spark.ops.metrics import weighted_kappa

    o = load(spark, sf, "orders")
    k = F.col("o_orderkey")
    a = o.select(k.alias("i"), ((k * 3) % 5).alias("label"))
    b = (o.filter(k % 11 != 0)
         .select(k.alias("i"),
                 F.least(F.greatest((k * 3) % 5 + (k * 7) % 3 - 1,
                                    F.lit(0)), F.lit(4)).alias("label")))
    return weighted_kappa(a, b, ["i"], "label", weights="quadratic")


# ------------------------------------------------- Holt forecast


@register("events_holt_forecast", """
WITH RECURSIVE d AS (
  SELECT event_type AS key, ts, event_id,
         CAST(round_even(value * 100, 0) AS DOUBLE) AS x
  FROM events WHERE event_id % 4 = 0),
s AS (SELECT key, x,
             row_number() OVER (PARTITION BY key
                                ORDER BY ts, event_id) AS t,
             count(*) OVER (PARTITION BY key) AS n
      FROM d),
r AS (
  SELECT key, t, n, x AS l, CAST(0.0 AS DOUBLE) AS b
  FROM s WHERE t = 1
  UNION ALL
  SELECT s.key, s.t, s.n,
         round_even(0.5 * s.x + 0.5 * (r.l + r.b), 9) AS l,
         round_even(0.25 * (round_even(0.5 * s.x + 0.5 * (r.l + r.b), 9)
                            - r.l) + 0.75 * r.b, 9) AS b
  FROM r JOIN s ON s.key = r.key AND s.t = r.t + 1)
SELECT key, n, round_even(l, 6) AS level, round_even(b, 6) AS trend,
       round_even(l + b, 6) AS forecast
FROM r WHERE t = n AND n <= 32768 ORDER BY key
""")
def events_holt_forecast(spark, sf):
    """Holt linear smoothing per event type
    (ops/temporal.holt_forecast, alpha=0.5 beta=0.25 — dyadic, so
    every step is a fixed IEEE chain) over the thinned scaled value
    series ordered by (ts, event_id). The oracle replays the
    recurrence with a RECURSIVE CTE seeded at t=1 (l_1 = x_1,
    b_1 = 0), inline-recomputing l_t inside b_t exactly as the Spark
    fold does. (DuckDB's list_reduce was rejected for this oracle:
    with struct accumulators it overwrites fields mid-step —
    verified empirically — so the recursion is the independent
    formulation.)"""
    from lamapi_spark.ops.temporal import holt_forecast

    e = load(spark, sf, "events").filter(F.col("event_id") % 4 == 0)
    d = e.select(F.col("event_type"), F.col("ts"), F.col("event_id"),
                 F.bround(F.col("value") * 100, 0).alias("x"))
    return (holt_forecast(d, "event_type", ["ts", "event_id"], "x")
            .orderBy("key"))
