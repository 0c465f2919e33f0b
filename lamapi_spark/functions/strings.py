"""String / similarity scalar functions as JVM-side Column expressions.

Semantics mirror the reference's pure-Python helpers (cited per function)
but run inside whole-stage codegen — no Python UDFs in the hot path.
Rounding uses ``bround`` (HALF_EVEN) to match Python's banker's ``round``.

Reference citations: unimib-datAI/lamAPI ``api/model/utils.py`` and
``api/model/data_retrievers/bow_retriever.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A deterministic English stopword list (reference uses NLTK's set,
# bow_retriever.py:30; we pin an explicit subset so results are stable
# without a runtime download). Keep sorted for reproducibility.
STOPWORDS: tuple[str, ...] = (
    "a", "about", "above", "after", "again", "all", "an", "and", "any",
    "are", "as", "at", "be", "because", "been", "before", "being", "below",
    "between", "both", "but", "by", "can", "did", "do", "does", "doing",
    "down", "during", "each", "few", "for", "from", "further", "had", "has",
    "have", "having", "he", "her", "here", "hers", "him", "his", "how", "i",
    "if", "in", "into", "is", "it", "its", "just", "me", "more", "most",
    "my", "no", "nor", "not", "now", "of", "off", "on", "once", "only",
    "or", "other", "our", "out", "over", "own", "same", "she", "so",
    "some", "such", "than", "that", "the", "their", "them", "then",
    "there", "these", "they", "this", "those", "through", "to", "too",
    "under", "until", "up", "very", "was", "we", "were", "what", "when",
    "where", "which", "while", "who", "whom", "why", "will", "with",
    "you", "your",
)


def clean_str(c: Column | str) -> Column:
    """lowercase + collapse any whitespace runs to single spaces + trim.

    Parity with ``utils.py:42-44`` (``" ".join(s.lower().split())``).
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column | str, pre_cleaned: bool = False) -> Column:
    """Whitespace tokens of the cleaned string.

    ``"".split(" ") == [""]`` in Python; Spark's split matches, so the
    empty-mention edge case keeps ntoken == 1 parity
    (``lookup_retriever.py:48``).
    """
    c = F.col(c) if isinstance(c, str) else c
    base = c if pre_cleaned else clean_str(c)
    return F.split(base, " ")


def token_set(c: Column | str, pre_cleaned: bool = False) -> Column:
    return F.array_distinct(tokens(c, pre_cleaned))


def ed_score(a: Column | str, b: Column | str) -> Column:
    """Normalized edit similarity: ``bround(1 - lev/max(|a|,|b|), 2)``.

    Parity with ``utils.py:6-7`` + ``round(.., 2)`` at
    ``lookup_retriever.py:148``; guarded against max-len 0.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(a), F.length(b), F.lit(1))
    return F.bround(F.lit(1.0) - F.levenshtein(a, b) / denom, 2)


def jaccard_arrays(a: Column, b: Column, scale: int = 2) -> Column:
    """``|A ∩ B| / max(|A|, |B|, 1)`` over two array columns (sets).

    Parity with ``utils.py:47-51`` (note: denominator is the *max* set
    size, not the union — the reference's variant of Jaccard).
    """
    inter = F.size(F.array_intersect(a, b))
    denom = F.greatest(F.size(a), F.size(b), F.lit(1))
    return F.bround(inter / denom, scale)


def ngram_set(c: Column | str, n: int | None = 3) -> Column:
    """Character n-gram set of a (cleaned) string, per token, deduped.

    Parity with ``utils.py:54-67``: each whitespace token contributes
    ``token[i:i+n]`` for ``i in range(len(token)-n+1)`` — a token shorter
    than ``n`` contributes nothing; ``n=None`` means whole tokens.
    """
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(c, " ")
    if n is None:
        return F.array_distinct(toks)
    grams = F.transform(
        toks,
        lambda t: F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
                lambda i: t.substr(i, F.lit(n)),
            ),
            lambda g: F.length(g) == n,
        ),
    )
    return F.array_distinct(F.flatten(grams))


def jaccard_score(a: Column | str, b: Column | str) -> Column:
    """Whole-token overlap score (``compute_similarity_between_string``
    with ``ngram=None``), bround 2 per ``lookup_retriever.py:149``."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return jaccard_arrays(ngram_set(a, None), ngram_set(b, None))


def jaccard_ngram_score(a: Column | str, b: Column | str, n: int = 3) -> Column:
    """Character-3-gram overlap score, bround 2 (``lookup_retriever.py:150``)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return jaccard_arrays(ngram_set(a, n), ngram_set(b, n))


def kg_of_entity(c: Column | str) -> Column:
    """'wikidata' for ``^[QP]\\d+$`` ids else 'dbpedia' (``utils.py:11-26``)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.when(c.rlike(r"^[QP]\d+$"), F.lit("wikidata")).otherwise(F.lit("dbpedia"))


def dot_notation_variants(name: Column | str) -> Column:
    """Person-name dot abbreviations (``scripts/elastic_indexing.py:38-54``).

    "John Fitzgerald Kennedy" -> ["John Fitzgerald Kennedy",
    "J. Fitzgerald Kennedy", "J. F. Kennedy"]. Element 0 is always the
    unmodified name; callers typically slice it off when emitting alias rows.

    Tokenization is whitespace-collapsing (``name.split()`` in the
    reference) — splitting on a single space would turn consecutive
    whitespace into empty tokens and emit garbage '.' aliases.
    """
    name = F.col(name) if isinstance(name, str) else name
    words = F.split(F.trim(name), r"\s+")
    nwords = F.size(words)
    heads = F.slice(words, 1, nwords - 1)
    return F.transform(
        F.sequence(F.lit(0), nwords - 1),
        lambda i: F.concat_ws(
            " ",
            F.concat(
                F.transform(
                    heads,
                    lambda w, j: F.when(j < i, F.concat(w.substr(1, 1), F.lit("."))).otherwise(w),
                ),
                F.array(F.element_at(words, -1)),
            ),
        ),
    )


def bow_tokens(c: Column | str) -> Column:
    """BoW tokenization: lowercase, whitespace split, alnum-only,
    stopwords removed, deduped (``bow_retriever.py:58-64``).

    The alnum test is Unicode-aware (``\\p{L}\\p{N}`` — Java regex), like
    the reference's Python ``isalnum()``: 'café' and CJK tokens survive;
    an ASCII-only class would silently drop every non-English label."""
    c = F.col(c) if isinstance(c, str) else c
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    kept = F.filter(
        toks,
        lambda t: t.rlike(r"^[\p{L}\p{N}]+$") & ~F.array_contains(F.lit(list(STOPWORDS)), t),
    )
    return F.array_distinct(kept)
