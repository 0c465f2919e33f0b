"""Streaming twin of the Fellegi-Sunter linkage scorer
(ops/linkage.fs_link_pairs): a SECOND source's records arriving on a
stream, matched live against the static reference source.

The incremental-ER shape a real ingest needs: the reference source
(e.g. the wikidata-derived dictionary side) is a settled table; the
new feed (the reference's crunchbase-style second source) lands
record by record and each record's candidate pairs + verdicts should
be available without recomputing the cross of both corpora.

ZERO streaming state: one stream-static equi-join on the blocking key
(the static side broadcasts when small; at cluster scale it is a
bucketed artifact like operators/indexes.LookupIndex so the join
needs no stream-side shuffle) followed by the SAME stateless
agreement/score/verdict expressions the batch operator uses —
ops/linkage.fs_score is shared verbatim, so stream == batch row for
row by construction (tested, tests/test_streaming.py pattern).

Weight TRAINING stays offline (fs_em_weights): EM needs corpus-wide
sums, the same offline/online split as streaming/kg.build_link_index's
dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lamapi_spark.ops.linkage import fs_project, fs_score


def stream_fs_link(
    spark: SparkSession,
    path: str,
    schema: str,
    static_left: DataFrame,
    id_cols: tuple[str, str],
    block_col: str,
    weights_bp: dict,
    upper_bp: int,
    lower_bp: int,
) -> DataFrame:
    """File-source stream of right-source records -> (id_l, id_r,
    agree_<field>…, score_bp, verdict) against the static left source.
    Same parameters as fs_link_pairs; ``schema`` describes the stream's
    parquet rows (must carry ``id_cols[1]``, ``block_col`` and every
    weighted field)."""
    idl, idr = id_cols
    l = fs_project(static_left, idl, "id_l", block_col, weights_bp, "_l_")
    r = fs_project(spark.readStream.schema(schema).parquet(path),
                   idr, "id_r", block_col, weights_bp, "_r_")
    return fs_score(r.join(l, "_blk"), weights_bp, upper_bp, lower_bp)
