"""PySpark-native analytics engine with the query/data-processing
capabilities of darkbringer35/Stream-processing-with-Flink-study.

The reference is a study repo for *Stream Processing with Apache Flink*
(example Flink programs over an IoT sensor domain + chapter notes that
document the full DataStream operator surface).  This package re-expresses
that capability surface Spark-first:

- DataFrame / Spark SQL for all batch semantics (Catalyst optimizes;
  we never hand-schedule what the optimizer already does),
- Structured Streaming for the streaming twins (watermarks, windows,
  stateful processing via ``transformWithStateInPandas`` /
  ``applyInPandasWithState``),
- Arrow-vectorized pandas UDFs only where built-ins genuinely cannot
  express the semantics.

Module map (SURVEY.md section in parens):

- :mod:`.session`       SparkSession factory (§3 lifecycle)
- :mod:`.schemas`       fixed StructTypes (§1 data model)
- :mod:`.sources`       §2.1 sources (parquet/file/memory/rate-sensor)
- :mod:`.operators`     §2.2-2.7 (core, keyed, windows, joins, stateful,
                        distribution)
- :mod:`.functions`     §2.9-2.10 scalar surface + training-data ops
                        (text, dedup, similarity, multimodal)
- :mod:`.sinks`         §2.8 sinks
- :mod:`.plans`         query registry feeding ``__spark_entry__.py``
- :mod:`.streaming`     streaming twins + equivalence helpers
"""

__version__ = "0.1.0"
