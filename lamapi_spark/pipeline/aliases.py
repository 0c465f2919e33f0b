"""Alias mining — the dictionary-GROWTH loop that feeds ``write_delta``.

The reference's label index is static per dump snapshot: a surface form
not in the Wikidata labels/aliases (elastic_indexing.py:114-152) can
only ever fuzzy-match. But a production linker sees its own output —
when the SAME unknown surface keeps linking to the SAME entity with
high purity across many conversations, that surface has earned a
dictionary row. This module closes that loop over the batch pipeline's
own linked mentions:

    link transcripts -> mine_aliases -> LookupIndex.write_delta
                         -> probe-visible (token_match_with_delta)
                         -> exact-match next run (no fuzzy band needed)

Semantics (all integer-exact, engine-portable):

- evidence is one row per linked span (``link_mentions`` output);
  support(surface, entity) counts NON-NIL links of that pair, the
  surface total counts every occurrence INCLUDING NIL ones — a surface
  that sometimes fails to link is ambiguous evidence and its purity is
  penalized accordingly;
- the winning entity per surface is the max-support non-NIL candidate
  (tie -> entity asc, deterministic);
- gates: ``support >= min_support`` and the EXACT product comparison
  ``support * 10000 >= min_purity_bp * total`` (the reported
  ``purity_bp`` column is the floor division — gating on the product
  keeps boundary cases like 4/5 at 8000bp inside the gate);
- surfaces already present in the dictionary as a ``name_norm`` (for
  ANY entity) are excluded: the dictionary already resolves them, and
  re-adding one under the mined winner would silently re-weight an
  existing ambiguity.

Output rows carry the FULL label_dict schema (entity, name, name_norm,
language=['und'], is_alias=true, description/kind/NERtype/types/
popularity inherited from the entity's primary label row, length,
ntoken) so they can go straight to ``LookupIndex.write_delta`` after
dropping the two provenance columns (``support``, ``purity_bp``).

Scale shape: two hash aggregations on even keys (surface, entity) then
(surface) with map-side partials; the dictionary-known exclusion probes
the bucketed names artifact when an ``index`` is passed (no
dictionary-side shuffle — the same probe discipline as lookup); the
payload join broadcasts the mined entity set (bounded by the mined row
count, typically 10^3-10^5 per day) into one dictionary scan. Nothing
here is proportional to |dictionary| x |mined|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lamapi_spark.functions import clean_str

#: the label_dict columns a delta append must carry (indexes.write_delta
#: contract: "the caller's full label_dict columns, stable across appends")
LABEL_DICT_COLS = (
    "entity", "name", "name_norm", "language", "is_alias", "description",
    "kind", "NERtype", "types", "length", "ntoken", "popularity",
)


def mine_aliases(
    linked: DataFrame,
    label_dict: DataFrame,
    min_support: int = 3,
    min_purity_bp: int = 8000,
    index=None,
) -> DataFrame:
    """linked (link_mentions output: surface, entity, nil, ...) +
    label_dict -> new alias rows (LABEL_DICT_COLS + support, purity_bp).

    ``index`` (a bucketed LookupIndex) routes the dictionary-known
    exclusion through the saved names table — no dict-side shuffle.
    """
    occ = linked.groupBy("surface", "entity", "nil").agg(
        F.count("*").alias("support"))
    tot = occ.groupBy("surface").agg(F.sum("support").alias("total"))
    # deterministic argmax without a window: min of (-support, entity)
    # = max support, then entity asc on ties
    best = (
        occ.filter(~F.col("nil"))
        .groupBy("surface")
        .agg(F.min(F.struct(
            (-F.col("support")).alias("ns"),
            F.col("entity").alias("e"))).alias("_b"),
            F.max(F.when(~F.col("nil"), F.col("support"))).alias("_smax"))
        .select("surface", F.col("_b.e").alias("entity"),
                F.col("_smax").alias("support"))
    )
    mined = (
        best.join(tot, "surface")
        .filter(F.col("support") >= F.lit(int(min_support)))
        .filter(F.col("support") * F.lit(10000)
                >= F.lit(int(min_purity_bp)) * F.col("total"))
        # integer division (`div`), not double division + cast: a double
        # quotient just under an integer can round UP across the boundary
        .select("surface", "entity", "support",
                F.expr("support * 10000L div total").alias("purity_bp"))
    )

    # dictionary-known exclusion: probe the bucketed artifact when given
    # (mined side shuffles into n_buckets; the names scan stays in place)
    names = (index.probe_side(index.names) if index is not None
             else label_dict).select("name_norm")
    mined = mined.join(names, mined.surface == names.name_norm, "left_anti")

    # payload: the entity's primary label row (is_alias=false, name asc)
    # — mined entity set broadcast into ONE dictionary scan
    entities = mined.select("entity").distinct()
    w = Window.partitionBy("entity").orderBy(F.col("name").asc())
    payload = (
        label_dict.filter(~F.col("is_alias"))
        .join(F.broadcast(entities), "entity")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("entity", "description", "kind", "NERtype", "types",
                "popularity")
    )

    return (
        mined.join(payload, "entity")
        .select(
            "entity",
            F.col("surface").alias("name"),
            clean_str(F.col("surface")).alias("name_norm"),
            F.array(F.lit("und")).alias("language"),
            F.lit(True).alias("is_alias"),
            "description", "kind", "NERtype", "types",
            F.length("surface").alias("length"),
            F.size(F.split("surface", " ")).alias("ntoken"),
            "popularity",
            "support", "purity_bp",
        )
    )


def mine_and_append(
    linked: DataFrame,
    label_dict: DataFrame,
    prefix: str = "lamapi_idx",
    min_support: int = 3,
    min_purity_bp: int = 8000,
    index=None,
) -> int:
    """The full growth step: mine, strip provenance, append to the
    ``<prefix>_delta`` side table (probe-visible immediately through
    token_match_with_delta; compaction is LookupIndex.write + drop_delta).
    Returns the number of appended alias rows. Uses
    ``dedup_against_main``-equivalent safety by construction: mining
    already anti-joins dictionary-known surfaces, so appended rows are
    new by the same disjointness contract write_delta documents."""
    from lamapi_spark.operators.indexes import LookupIndex

    rows = mine_aliases(linked, label_dict, min_support=min_support,
                        min_purity_bp=min_purity_bp, index=index)
    rows = rows.select(*LABEL_DICT_COLS).localCheckpoint(eager=True)
    n = rows.count()
    if n:
        LookupIndex.write_delta(rows, prefix=prefix)
    return n
