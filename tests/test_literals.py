"""Literal classifier parity: Spark cascade vs the documented reference
corpus (api/server.py:495-525, literal_recognizer.py:6-21) and vs the
pure-Python twin on a broader sample."""

from __future__ import annotations

from lamapi_spark.functions.literals import classify_literal, classify_literal_py

# Documented corpus — expectations computed by the reference's own
# first-match-wins order (e.g. '2.8' hits FLOAT before DATE; '1997' is
# DATE via ^\d{4}$; '12:30' is TIME; '25 million' INTEGER; '2 km' FLOAT).
CORPUS = [
    ("1997-08-26", "DATE"),
    ("26/08/1997", "DATE"),
    ("26.08.97", "DATE"),
    ("august 26 1997", "DATE"),
    ("26 august 1997", "DATE"),
    ("1997 august", "DATE"),
    ("145 bc", "DATE"),
    ("2,797,800,564", "DATE"),
    ("200.797.800", "DATE"),
    ("1997", "INTEGER"),  # ^[-+]?\d+$ wins before the DATE year pattern
    ("1345", "INTEGER"),
    ("1990-present", "DATE"),
    ("1939-1945", "DATE"),
    ("2.8", "FLOAT"),
    ("2,8", "FLOAT"),
    ("-3.5", "FLOAT"),
    ("1.5e+10", "FLOAT"),
    ("2 km", "FLOAT"),
    ("3.4 km2", "FLOAT"),
    ("+34", "INTEGER"),
    ("-7", "INTEGER"),
    # README says INTEGER, but the FLOAT unit-suffix alternative is not
    # $-anchored so '25 m(illion)' matches FLOAT first — code-behavior parity.
    ("25 million", "FLOAT"),
    ("3 billion", "INTEGER"),
    ("12:30", "TIME"),
    ("24:00", "TIME"),
    ("2021-01-02T13:45", "DATETIME"),
    ("https://www.unimib.it/", "URL"),
    ("www.google.it/", "URL"),
    # the URL regex demands a ".xx<char>" tail, so a query-string URL is STRING
    ("www.google.com/search?q=x", "STRING"),
    ("mario.rossi@gmail.it", "EMAIL"),
    ("hello world", "STRING"),
    ("batman begins", "STRING"),
    ("", "STRING"),
]


def test_python_twin_matches_corpus():
    for value, expect in CORPUS:
        assert classify_literal_py(value) == expect, value


def test_iso_pattern_digit_separator_matches_isoparse():
    """The `.` date/time separator class in ISO_DATETIME_PATTERN
    deliberately includes digits: dateutil isoparse slices the date
    positionally and accepts ANY separator char — '2016-01-05912:30'
    really parses as 2016-01-05 12:30. Guards the pattern against a
    well-meaning [^0-9] 'fix' that would diverge from the reference's
    classifier."""
    import re

    from lamapi_spark.functions.literals import (
        ISO_DATETIME_PATTERN, classify_value_cb_py,
    )

    for v in ("2016-01-05912:30", "2016-01-05T12:30", "2016-01-05#12:30"):
        assert re.match(ISO_DATETIME_PATTERN, v), v
        assert classify_value_cb_py(v) == "DATETIME", v
    try:
        from dateutil import parser
        import datetime
        assert parser.isoparse("2016-01-05912:30") == datetime.datetime(2016, 1, 5, 12, 30)
    except ImportError:
        pass


def test_spark_matches_python_twin(spark):
    values = [v for v, _ in CORPUS] + [
        "Q30", "12:99", "25:00", "1.2.3", "a@b.c", "10 ft", "1997.08.26",
        "now", "1990-now", "0.0", "000", "  ", "T12:30",
    ]
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    got = {r.v: r.cls for r in df.select("v", classify_literal("v").alias("cls")).collect()}
    for v in values:
        assert got[v] == classify_literal_py(v), v
