"""Offline lookup-index artifacts — the cluster plan for the J1 join.

The reference's Elasticsearch index is built ONCE by an offline job
(scripts/elastic_indexing.py) and every lookup request probes it. The
round-1 engine instead rebuilt + broadcast the token / deletion-variant
indexes inside every pipeline run — a serial per-executor constant that
is physically impossible at a 10^8-entity dictionary (VERDICT r01: the
#1 scaling bottleneck).

This module materializes the four index tables as **bucketed, sorted
saved tables**:

- ``<prefix>_token``   (token,  entity, name, is_alias)   bucketed by token
- ``<prefix>_fuzzy``   (variant, token, entity, name, is_alias) bucketed by variant
- ``<prefix>_names``   (name_norm, entity, name, is_alias) bucketed by name_norm
- ``<prefix>_fuzzy_names`` (variant, name_norm)            bucketed by variant

so the lookup / mention-detection joins need NO dictionary-side shuffle
and NO broadcast: the bucketed scan already satisfies the join's
required hash distribution; only the (streaming) mention side shuffles,
into exactly ``n_buckets`` partitions. Posting-list pruning
(top-K-per-key by popularity, lookup._prune_index) is applied at BUILD
time, so the per-query-batch window shuffle disappears too.

Catalog note: bucketing metadata lives in the session catalog. The
sandbox uses Spark's in-memory catalog (artifacts are per-session); on a
real deployment the same writes go through a Hive metastore or an
Iceberg catalog (bucket transform) and become true cross-job artifacts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lamapi_spark.operators.label_dict import fuzzy_token_index, token_inverted_index
from lamapi_spark.operators.warehouse import clean_stale_location

_KEY = ["entity", "name", "is_alias"]

# sentinel: limit_per_token=None is a meaningful value (unpruned), so
# "not passed" needs its own marker
_UNSET = object()


def prune_index(idx: DataFrame, key_col: str, limit_per_token: int) -> DataFrame:
    """Keep the top-``limit_per_token`` dictionary rows per posting key,
    by popularity (the ES static-index analogue of WAND pruning).

    Exactness argument: the final per-mention candidate list is the
    popularity-desc top-``limit`` of the union of per-token posting
    lists. If a row ranks below position K within one of its tokens'
    posting lists, at least K higher-popularity rows of that SAME
    mention's candidate set outrank it — so with K >= limit it can never
    appear in the final list. Pruning to top-K per key is therefore
    lossless for candidate ranking; only the mention-level ambiguity /
    corrects_tokens features (computed over the match union) see a
    truncated tail, mirroring how the reference's ES token query is
    itself truncated at `size=limit` (elastic.py:31-39). With
    K < limit it is a recall-trading heuristic backstopped by the
    exact-name / 1-edit-name guards in token_match.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col("popularity").desc(), F.col("entity").asc(),
        F.col("name").asc(), F.col("is_alias").asc())
    return (idx.withColumn("_pk", F.row_number().over(w))
            .filter(F.col("_pk") <= limit_per_token).drop("_pk"))


def _fuzzy_name_index(label_dict: DataFrame) -> DataFrame:
    # local import: pipeline.mentions owns the deletion-1 helper
    from lamapi_spark.pipeline.mentions import fuzzy_name_index
    return fuzzy_name_index(label_dict)


@dataclass
class LookupIndex:
    """The four lookup-join index frames plus the build parameters that
    determine which guards the consumer must apply."""
    token: DataFrame                 # (token, popularity, entity, name, is_alias)
    fuzzy: DataFrame | None          # (variant, token, popularity, entity, name, is_alias)
    names: DataFrame                 # (name_norm, popularity, entity, name, is_alias)
    fuzzy_names: DataFrame | None    # (variant, name_norm)
    limit_per_token: int | None      # pruning K applied at build (None = unpruned)
    fuzzy_edits: int = 1
    bucketed: bool = False           # True -> joins need no dict-side shuffle
    n_buckets: int | None = None     # bucket count of the saved tables
    n_names: int | None = None       # REAL row count of the names table,
                                     # counted once at build — lets consumers
                                     # size-gate broadcasts on an actual
                                     # cardinality instead of a Catalyst
                                     # estimate (None = unknown/pre-meta)
    n_entities: int | None = None    # REAL row count of the payload table
                                     # (distinct entities), counted once at
                                     # build — the broadcast gate for the
                                     # response build's payload attach
    reused: bool = False             # set by build_index_artifacts when an
                                     # existing artifact was loaded instead
                                     # of rebuilt (metrics/bench attribution)
    payload: DataFrame | None = None  # (entity, description, kind, NERtype,
                                      # types) — ONE row per entity, bucketed
                                      # by entity: the response-build columns
                                      # that depend on the entity alone (the
                                      # ES _source analogue). lookup() joins
                                      # it to the <=limit post-dedup
                                      # survivors on the single entity key,
                                      # so the full dictionary-row payload
                                      # never shuffles. None on in-memory /
                                      # pre-payload artifacts (the caller's
                                      # items-based fallback applies).

    @staticmethod
    def build(label_dict: DataFrame, fuzzy: bool = True,
              limit_per_token: int | None = None,
              fuzzy_edits: int = 1) -> "LookupIndex":
        """In-memory (per-run) index frames — the non-artifact path."""
        # popularity stays IN the index rows: the consumer ranks/truncates
        # on the narrow match (popularity, entity, name, is_alias) and
        # attaches the wide payload only to the <=limit survivors
        tok = token_inverted_index(label_dict).select("token", "popularity", *_KEY)
        if limit_per_token is not None:
            tok = prune_index(tok, "token", limit_per_token)
        fz = None
        fn = None
        if fuzzy:
            fz = fuzzy_token_index(label_dict, max_edits=fuzzy_edits).select(
                "variant", "token", "popularity", *_KEY)
            if limit_per_token is not None:
                fz = prune_index(fz, "variant", limit_per_token)
            fn = _fuzzy_name_index(label_dict)
        return LookupIndex(
            token=tok, fuzzy=fz,
            names=label_dict.select("name_norm", "popularity", *_KEY),
            fuzzy_names=fn,
            limit_per_token=limit_per_token, fuzzy_edits=fuzzy_edits,
            bucketed=False)

    @staticmethod
    def write(label_dict: DataFrame, prefix: str = "lamapi_idx",
              n_buckets: int = 32, fuzzy: bool = True,
              limit_per_token: int | None = None, fuzzy_edits: int = 1,
              overwrite: bool = True,
              source_fp: str | None = None) -> "LookupIndex":
        """Materialize the bucketed artifacts (offline index build — the
        elastic_indexing.py analogue) and return the loaded index.

        ``n_buckets`` fixes join parallelism for every consumer; size it
        to >= the cluster's total cores (a bucket is one task). Pruning
        and the deletion-variant expansion run HERE, once, instead of
        inside every pipeline run.

        Round-6 build-cost cuts (guide §1.2/§2.6 — artifact contents
        and every consumer's results unchanged):
        - the dictionary frame is persisted for the duration of the
          build: each saved table re-executed the FULL label_dict
          subtree (three window passes) before — 5-7 executions per
          build, now one;
        - ``n_names``/``n_entities`` are harvested from the write jobs
          via ``observe()`` instead of re-scanning the written tables
          (two jobs removed);
        - the independent table writes overlap from a small thread pool
          (Spark schedules concurrent jobs FIFO; catalog calls are
          synchronized inside Spark) so one write's task tail
          back-fills with the next write's tasks;
        - a MINIMAL (match-only) dictionary skips the payload table
          entirely instead of writing one row of typed NULLs per
          entity: consumers see ``payload=None`` and use their
          label_dict fallback — which also closes the advisory's
          plausible-but-NULL payload hazard (a full response build can
          no longer silently coalesce an all-NULL artifact payload)."""
        spark = label_dict.sparkSession
        label_dict = label_dict.persist()
        mem = LookupIndex.build(label_dict, fuzzy=fuzzy,
                                limit_per_token=limit_per_token,
                                fuzzy_edits=fuzzy_edits)

        from pyspark.sql import Observation

        observations: dict[str, Observation] = {}

        def save(df: DataFrame, name: str, key: str,
                 count_key: str | None = None) -> None:
            # a stale warehouse dir without a catalog entry (previous
            # process, different metastore) makes saveAsTable fail with
            # LOCATION_ALREADY_EXISTS — drop the orphan first
            clean_stale_location(spark, f"{prefix}_{name}")
            if count_key is not None:
                obs = Observation(f"idx_write_{prefix}_{name}")
                observations[count_key] = obs
                df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            spark.sparkContext.setJobDescription(f"index_write:{prefix}_{name}")
            try:
                (df.write.mode("overwrite" if overwrite else "errorifexists")
                 .format("parquet")
                 .bucketBy(n_buckets, key).sortBy(key)
                 .saveAsTable(f"{prefix}_{name}"))
            finally:
                spark.sparkContext.setJobDescription(None)

        # entity-level payload (description/kind/NERtype/types are constant
        # across an entity's label rows, so any-row-per-entity is exact);
        # bucketed by the single entity key so the response build's payload
        # attach probes it with no dictionary-side exchange. MINIMAL
        # dictionaries (match-only callers: entity/name/name_norm/
        # popularity/is_alias — e.g. the lookup_candidates_indexed
        # contract query) carry no payload columns: no payload table is
        # written (see docstring) and any stale one is dropped.
        _payload_cols = ["description", "kind", "NERtype", "types"]
        have_payload = bool(set(label_dict.columns) & set(_payload_cols))

        jobs: list[tuple] = [(mem.token, "token", "token", None),
                             (mem.names, "names", "name_norm", "n_names")]
        if have_payload:
            jobs.append((label_dict.select("entity", *_payload_cols)
                         .dropDuplicates(["entity"]),
                         "payload", "entity", "n_entities"))
        if fuzzy:
            jobs.append((mem.fuzzy, "fuzzy", "variant", None))
            jobs.append((mem.fuzzy_names, "fuzzy_names", "variant", None))

        from concurrent.futures import ThreadPoolExecutor

        try:
            # materialize the persisted dictionary BEFORE fanning out so
            # the concurrent writes share one cached copy instead of
            # racing to build it
            label_dict.count()
            with ThreadPoolExecutor(max_workers=3) as pool:
                list(pool.map(lambda j: save(*j), jobs))
            if not have_payload:
                spark.sql(f"DROP TABLE IF EXISTS {prefix}_payload")
                clean_stale_location(spark, f"{prefix}_payload")
        finally:
            label_dict.unpersist()
        # the build parameters ARE part of the artifact: a consumer that
        # loads a PRUNED index with the wrong limit_per_token silently
        # skips the exact-name/1-edit recall guards in token_match, and a
        # mismatched fuzzy_edits silently changes the fuzzy bands — so
        # they persist in a 1-row sidecar table next to the data
        # the names-table cardinality is counted ONCE here (offline) and
        # persisted: it is the bound on every matched-span frame a
        # consumer might want to broadcast, and an actual count beats any
        # runtime size estimate (see pipeline/mentions.py)
        n_names = int(observations["n_names"].get["rows"])
        n_entities = (int(observations["n_entities"].get["rows"])
                      if have_payload else None)
        # source_fp fingerprints the DICTIONARY SNAPSHOT the artifact was
        # built from (build_index_artifacts computes it over kg_items):
        # reuse logic validates it so a pipeline handed a DIFFERENT
        # kg_items frame can never silently link against a stale index
        meta = spark.createDataFrame(
            [(bool(fuzzy),
              None if limit_per_token is None else int(limit_per_token),
              int(fuzzy_edits), int(n_buckets), int(n_names),
              None if n_entities is None else int(n_entities), source_fp)],
            "fuzzy boolean, limit_per_token int, fuzzy_edits int, "
            "n_buckets int, n_names bigint, n_entities bigint, "
            "source_fp string")
        clean_stale_location(spark, f"{prefix}_meta")
        (meta.write.mode("overwrite").format("parquet")
         .saveAsTable(f"{prefix}_meta"))
        return LookupIndex.load(spark, prefix)

    @staticmethod
    def read_meta(spark: SparkSession, prefix: str = "lamapi_idx") -> dict | None:
        """The persisted build parameters, or None for a pre-meta artifact."""
        if not spark.catalog.tableExists(f"{prefix}_meta"):
            return None
        r = spark.table(f"{prefix}_meta").head()
        if r is None:
            # a crash between the data saveAsTable and the meta write (or
            # an interrupted overwrite) can leave an EMPTY meta table:
            # treat it as meta-absent so load()/exists() fall back to the
            # explicit-params / rebuild path instead of raising on None
            return None
        d = r.asDict()
        return {"fuzzy": r.fuzzy, "limit_per_token": r.limit_per_token,
                "fuzzy_edits": r.fuzzy_edits, "n_buckets": r.n_buckets,
                # older sidecars lack these fields — degrade to None
                "n_names": d.get("n_names"),
                "n_entities": d.get("n_entities"),
                "source_fp": d.get("source_fp")}

    @staticmethod
    def load(spark: SparkSession, prefix: str = "lamapi_idx",
             fuzzy: bool | None = None, limit_per_token=_UNSET,
             fuzzy_edits: int | None = None) -> "LookupIndex":
        """Load saved artifacts. Build parameters come from the persisted
        ``<prefix>_meta`` sidecar; explicitly passed values are VALIDATED
        against it (a silent mismatch would drop recall guards), raising
        ValueError on conflict. For pre-meta artifacts (no sidecar) the
        explicit values are required."""
        meta = LookupIndex.read_meta(spark, prefix)
        if meta is None:
            if fuzzy is None or limit_per_token is _UNSET or fuzzy_edits is None:
                raise ValueError(
                    f"index artifact '{prefix}' has no _meta sidecar; pass "
                    "fuzzy/limit_per_token/fuzzy_edits explicitly or rebuild "
                    "with LookupIndex.write")
            meta = {"fuzzy": fuzzy, "limit_per_token": limit_per_token,
                    "fuzzy_edits": fuzzy_edits, "n_buckets": None,
                    "n_names": None}
        else:
            mismatches = {}
            if fuzzy is not None and fuzzy != meta["fuzzy"]:
                mismatches["fuzzy"] = (fuzzy, meta["fuzzy"])
            if limit_per_token is not _UNSET and limit_per_token != meta["limit_per_token"]:
                mismatches["limit_per_token"] = (limit_per_token, meta["limit_per_token"])
            if fuzzy_edits is not None and fuzzy_edits != meta["fuzzy_edits"]:
                mismatches["fuzzy_edits"] = (fuzzy_edits, meta["fuzzy_edits"])
            if mismatches:
                raise ValueError(
                    f"index artifact '{prefix}' was built with different "
                    f"parameters: requested vs persisted {mismatches}; "
                    "rebuild with LookupIndex.write or drop the argument")
        return LookupIndex(
            token=spark.table(f"{prefix}_token"),
            fuzzy=spark.table(f"{prefix}_fuzzy") if meta["fuzzy"] else None,
            names=spark.table(f"{prefix}_names"),
            fuzzy_names=(spark.table(f"{prefix}_fuzzy_names")
                         if meta["fuzzy"] else None),
            limit_per_token=meta["limit_per_token"],
            fuzzy_edits=meta["fuzzy_edits"],
            bucketed=True, n_buckets=meta["n_buckets"],
            n_names=meta.get("n_names"),
            n_entities=meta.get("n_entities"),
            # pre-round-5 artifacts lack the payload table — degrade to
            # None (consumers fall back to an items-based payload join)
            payload=(spark.table(f"{prefix}_payload")
                     if spark.catalog.tableExists(f"{prefix}_payload")
                     else None))

    @staticmethod
    def exists(spark: SparkSession, prefix: str = "lamapi_idx",
               fuzzy: bool | None = None, limit_per_token=_UNSET,
               fuzzy_edits: int | None = None,
               source_fp: str | None = None) -> bool:
        """True when a loadable artifact with COMPATIBLE build parameters
        exists: tables present, meta sidecar present, and any explicitly
        passed parameter equal to the persisted one — so reuse logic
        rebuilds instead of silently probing a mismatched artifact.

        ``source_fp`` (when provided) must ALSO match the persisted
        dictionary-snapshot fingerprint; an artifact without one (built
        by an older writer, or with validation off) is treated as
        incompatible, forcing one rebuild that upgrades the sidecar —
        conservative on purpose: silently reusing an unverifiable
        artifact is exactly the stale-dictionary footgun this guards."""
        meta = LookupIndex.read_meta(spark, prefix)
        if meta is None:
            return False
        if fuzzy is not None and meta["fuzzy"] != fuzzy:
            return False
        if limit_per_token is not _UNSET and meta["limit_per_token"] != limit_per_token:
            return False
        if fuzzy_edits is not None and meta["fuzzy_edits"] != fuzzy_edits:
            return False
        if source_fp is not None and meta.get("source_fp") != source_fp:
            return False
        needed = [f"{prefix}_token", f"{prefix}_names"]
        if meta["fuzzy"]:
            needed += [f"{prefix}_fuzzy", f"{prefix}_fuzzy_names"]
        return all(spark.catalog.tableExists(t) for t in needed)

    def probe_side(self, df: DataFrame) -> DataFrame:
        """How consumers should join an index frame: bucketed artifacts
        get a SHUFFLE_HASH hint — the bucketed scan already satisfies
        the join's hash distribution (no dict-side exchange, no sort),
        and hinting defeats a pointless auto-broadcast of the index;
        in-memory frames are left to the caller's broadcast policy."""
        return df.hint("shuffle_hash") if self.bucketed else df

    # ----------------------------------------------------------- delta
    # Incremental dictionary maintenance: the transcript side already
    # appends per-conversation (pipeline/incremental.py); these give the
    # DICTIONARY side the same append-only lifecycle. New label rows
    # land in a small unbucketed side table (broadcast-sized by
    # contract: a daily label delta is ~10^3-10^5 rows against a 10^8
    # main artifact); consumers probe main + delta via
    # lookup.token_match_with_delta, and compaction is simply
    # LookupIndex.write over the full dictionary followed by drop_delta.

    @staticmethod
    def write_delta(delta_label_dict: DataFrame,
                    prefix: str = "lamapi_idx") -> None:
        """Append new dictionary rows to ``<prefix>_delta``. Rows must
        be NEW (not already in the main artifact) — the append-only
        disjointness contract incremental.py keeps for conversations;
        token_match_with_delta(dedup_against_main=True) is the guard
        for callers that cannot promise it. Schema: the caller's full
        label_dict columns (the delta serves both match and payload
        joins), stable across appends."""
        clean_stale_location(delta_label_dict.sparkSession, f"{prefix}_delta")
        (delta_label_dict.write.mode("append").format("parquet")
         .saveAsTable(f"{prefix}_delta"))

    @staticmethod
    def load_delta(spark: SparkSession,
                   prefix: str = "lamapi_idx") -> DataFrame | None:
        """The accumulated delta rows, or None when no delta exists."""
        if not spark.catalog.tableExists(f"{prefix}_delta"):
            return None
        return spark.table(f"{prefix}_delta")

    @staticmethod
    def drop_delta(spark: SparkSession, prefix: str = "lamapi_idx") -> None:
        """Clear the delta after compacting it into the main artifact
        (LookupIndex.write over the full dictionary)."""
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_delta")
