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


def xsd_of_class(c: Column | str) -> Column:
    """Class -> xsd datatype, the ``/literal-recognizer`` response surface
    (data_retrievers/literal_classifier.py:8-30)."""
    c = F.col(c) if isinstance(c, str) else c
    expr = None
    for cls, xsd in XSD_BY_CLASS.items():
        expr = F.when(c == cls, F.lit(xsd)) if expr is None else expr.when(c == cls, F.lit(xsd))
    return expr.otherwise(F.lit("xsd:string"))


# ISO-8601 subset accepted by the cb cascade's DATETIME probe — the Spark
# twin of dateutil.parser.isoparse (scripts/parsing_cb.py:27-29): year /
# year-month / date, optionally a time part after ANY single separator
# char. The `.` separator class is deliberate and INCLUDES digits:
# isoparse slices the date positionally (chars [0:10]) and treats
# whatever follows as the separator without validating it — verified
# against dateutil in this environment, isoparse('2016-01-05912:30')
# == datetime(2016,1,5,12,30) (tested in tests/test_literals.py), so a
# [^0-9] class here would diverge from the real classifier. Optional
# seconds/fraction and Z/offset. Field validity (month 01-12, day
# 01-31, hour 00-23, min/sec 00-59) is encoded in the pattern since
# rlike cannot raise like isoparse does. Documented deviations from
# isoparse: compact forms (20160101), ISO week dates (2016-W01) and
# ordinal dates (2016-123) classify as NUMBER/STRING here.
ISO_DATETIME_PATTERN = (
    r"^\d{4}(-(0[1-9]|1[0-2])(-(0[1-9]|[12][0-9]|3[01])"
    r"(.([01][0-9]|2[0-3]):[0-5][0-9](:[0-5][0-9](\.\d+)?)?"
    r"(Z|[+-]([01][0-9]|2[0-3])(:?[0-5][0-9])?)?)?)?)?$"
)


def classify_value_cb(c: Column | str) -> Column:
    """The cb-ingest value classifier (scripts/parsing_cb.py:26-37) — a
    DIFFERENT function from the regex cascade above: ISO-8601 parse ->
    DATETIME, float() cast -> NUMBER, else STRING. Notably '2016-01-01
    00:00:00' is DATETIME here but STRING under :func:`classify_literal`,
    and a bare year '2016' is DATETIME (isoparse accepts it) even though
    float() would too — the cascade order decides."""
    c = F.col(c) if isinstance(c, str) else c
    return (
        F.when(c.rlike(ISO_DATETIME_PATTERN), F.lit("DATETIME"))
        .when(c.try_cast("double").isNotNull(), F.lit("NUMBER"))
        .otherwise(F.lit("STRING"))
    )


def classify_value_cb_py(value) -> str:
    """Pure-Python twin of the reference classify_value (test oracle) —
    the real dateutil/float cascade where available."""
    try:
        from dateutil import parser as _p  # pragma: no cover - optional
        try:
            _p.isoparse(value)
            return "DATETIME"
        except (ValueError, TypeError):
            pass
    except ImportError:
        import re
        if isinstance(value, str) and re.match(ISO_DATETIME_PATTERN, value):
            return "DATETIME"
    try:
        float(value)
        return "NUMBER"
    except (ValueError, TypeError):
        pass
    return "STRING"
