"""Shared deterministic-draw primitive.

Every operator that needs a reproducible pseudo-random coordinate
(negative-sampling addresses, DSIR feature buckets, KMV/medoid ranks,
mixture sampling) derives it from md5 of a string rendering — the one
hash both engines spell identically (DuckDB mirror:
``('0x' || substr(md5(x), 1, 12))::BIGINT``). Centralized here so the
substring width can never drift between operators and silently break
an oracle (corpus.sample_hash keeps its own documented 8-char/basis-
point variant for the published mixture-sampling coordinate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h48(col: Column) -> Column:
    """48-bit md5-derived non-negative BIGINT of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")
