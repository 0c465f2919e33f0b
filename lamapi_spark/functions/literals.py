"""Literal datatype classifier — the reference's ordered regex cascade.

Parity with ``api/model/literal_recognizer.py:23-94`` and the xsd mapping
in ``api/model/data_retrievers/literal_classifier.py:8-30``: first match
wins in the fixed order DATETIME, TIME, URL, EMAIL, FLOAT, INTEGER, DATE,
else STRING. Patterns are kept verbatim (they are Java-regex compatible;
case-insensitive like the reference's ``re.IGNORECASE``) and evaluated as
an ``F.when`` cascade — JVM-side, codegen-friendly, no Python in the path.
The reference uses ``finditer`` (search-anywhere); every alternative is
``^``-anchored so Spark's ``rlike`` (find-anywhere) is equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MONTHS = (
    "january|february|march|april|may|june|july|august|september|october"
    "|november|dicember"  # [sic] — the reference misspells December; kept for parity
)

DATE_PATTERN = (
    r"^\d{1,4}[\,\.\s\t\n]+bc$|"
    r"^\d{4}[-.\/]\d{1,2}[-.\/]\d{1,2}$|"
    r"^\d{1,2}[-.\/]\d{1,2}[-.\/]\d{4}$|"
    r"^\d{1,2}[-.\/]\d{1,2}[-.\/]\d{2}$|"
    rf"^({_MONTHS})[\.\,\s\t\n\/]+\d{{1,2}}[\.\,\s\t\n\/]+\d{{4}}$|"
    rf"^\d{{1,2}}[\.\,\s\t\n\/]+({_MONTHS})[\.\,\s\t\n\/]+\d{{4}}$|"
    rf"^\d{{4}}[\.\,\s\t\n\/]+({_MONTHS})[\.\,\s\t\n\/]+\d{{1,2}}$|"
    rf"^\d{{4}}[\.\,\s\t\n\/]+\d{{1,2}}[\.\,\s\t\n\/]+({_MONTHS})$|"
    rf"^({_MONTHS})[\.\,\s\n\t\/]+\d{{4}}$|"
    rf"^\d{{4}}[\.\,\s\n\t\/]+({_MONTHS})$|"
    r"^\d+[\.\,]\d+[\.\,]\d+[\.\,]\d+$|"
    r"^\d+[\.\,]\d+[\.\,]\d+$|"
    r"^\d+[\.\,]\d+$|"
    r"^\d{4}[–-]\d{4}$|"
    r"^\d{4}[–-](present|now)$|"
    r"^\d{4}$|"
    r"^\d+$"
)

URL_PATTERN = (
    r"^((http|https)\:\/\/)?[a-zA-Z0-9\.\/\?\:@\-_=#]+"
    r"\.([a-zA-Z]){2,6}([a-zA-Z0-9\.\&\/\?\:@\-_=#])$"
)

EMAIL_PATTERN = r"^\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b$"

DATETIME_PATTERN = (
    r"^\d{4}[-.\/]\d{1,2}[-.\/]\d{1,2}"
    r"T(24:00|2[0-3]:[0-5][0-9]|[0-1][0-9]:[0-5][0-9])$"
)

TIME_PATTERN = r"^(24:00|2[0-3]:[0-5][0-9]|[0-1][0-9]:[0-5][0-9])$"

FLOAT_PATTERN = (
    r"^[-+]?\d+[\,\.]\d+$|"
    r"^[-+]?\d+[\,\.]\d+[eE][-+]\d+$|"
    r"^[-+]?\d+[\,\.]\d+[ ]+(km|km2|m|sq|mi|cm|cm2|mm|dm|ft)|"
    r"^\d+[ ]+(km|km2|m|sq|mi|cm|cm2|mm|dm|ft)"
)

INTEGER_PATTERN = (
    r"^[-+]?\d+$|"
    r"^\d+[ –-](thousand|million|billion|trillion)$|"
    r"^\d+[\,\.]\d+[ –-](thousand|million|billion|trillion)$"
)

# First-match-wins order — dict insertion order at literal_recognizer.py:76-84.
CASCADE: tuple[tuple[str, str], ...] = (
    ("DATETIME", DATETIME_PATTERN),
    ("TIME", TIME_PATTERN),
    ("URL", URL_PATTERN),
    ("EMAIL", EMAIL_PATTERN),
    ("FLOAT", FLOAT_PATTERN),
    ("INTEGER", INTEGER_PATTERN),
    ("DATE", DATE_PATTERN),
)

# literal_classifier.py:8-30 datatype -> xsd mapping.
XSD_BY_CLASS = {
    "DATETIME": "xsd:dateTime",
    "TIME": "xsd:time",
    "URL": "xsd:anyURI",
    "EMAIL": "xsd:string",
    "FLOAT": "xsd:double",
    "INTEGER": "xsd:integer",
    "DATE": "xsd:date",
    "STRING": "xsd:string",
}


def classify_literal(c: Column | str) -> Column:
    """Return the literal class (DATETIME/TIME/URL/EMAIL/FLOAT/INTEGER/
    DATE/STRING) of a string column via the reference's cascade."""
    c = F.col(c) if isinstance(c, str) else c
    expr = None
    for name, pat in CASCADE:
        cond = c.rlike("(?i)" + pat)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit("STRING"))


def classify_literal_py(token: str) -> str:
    """Pure-Python twin of :func:`classify_literal` (test oracle)."""
    import re

    for name, pat in CASCADE:
        if re.compile(pat, re.IGNORECASE).search(token):
            return name
    return "STRING"
