from lamapi_spark.functions.strings import (  # noqa: F401
    STOPWORDS,
    clean_str,
    bow_tokens,
    dot_notation_variants,
    ed_score,
    jaccard_arrays,
    jaccard_ngram_score,
    jaccard_score,
    kg_of_entity,
    ngram_set,
    token_set,
    tokens,
)
from lamapi_spark.functions.literals import classify_literal, XSD_BY_CLASS  # noqa: F401
