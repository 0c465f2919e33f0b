"""lamapi_spark — a PySpark-native KG-construction / entity-lookup engine.

A from-scratch re-expression of the capabilities of unimib-datAI/lamAPI
(a Flask + MongoDB + Elasticsearch entity-lookup service) as batch Spark
dataflow: the ES label index becomes an exploded label-dictionary
DataFrame, lookup becomes a token equi-join + window ranking, and the
Mongo retrievers become broadcast/semi joins. On top sits a
KG-construction pipeline over conversation-transcript tables
(mention detection -> candidate generation -> entity-link scoring ->
canonicalization -> triple materialization), designed for 10^12-turn
scale: explicit repartitioning by conv_id, broadcast dictionaries,
skew salting, AQE, and per-stage checkpoint/metrics for resume.
"""

__version__ = "0.1.0"
