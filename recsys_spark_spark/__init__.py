"""recsys_spark_spark — a PySpark-native analytics engine.

Capability target: the query/data-processing surface of ``xiaogp/recsys_spark``
(an ItemCF/ALS collaborative-filtering recommender built on Spark SQL; the
reference checkout at /root/reference was empty this round — see SURVEY.md §0,
so parity targets follow SURVEY.md §3's reconstructed operator inventory),
extended with LLM-data-pipeline operators: dedup, similarity search, multimodal
columns, text analysis, and Structured Streaming.

Design rules (SURVEY.md §5, for 100 TB scale):
- Everything is declared via the DataFrame/SQL API; Catalyst + Tungsten + AQE
  pick physical plans. No RDDs, no driver-side collect loops.
- Dims are broadcast; big joins/aggs keyed for partition parallelism.
- Python UDFs only where built-ins cannot express semantics, and then
  Arrow-batched (pandas_udf / applyInPandas / mapInPandas).
- Float aggregates use order-independent scaled-integer sums
  (functions/determinism.py) so results are bit-identical across partitionings
  and engines (DuckDB oracle parity).
"""

__version__ = "0.1.0"
