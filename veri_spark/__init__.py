"""veri_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference feature store (bgokden/veri),
re-expressed Spark-first.

The reference is a distributed KNN feature store: float32 feature vectors with
opaque JSON labels, queried exclusively by k-nearest-neighbor with filtering,
grouped top-k, dedup, multi-query merge and context re-scoring
(reference: veriservice/veriservice.proto:51-73, data/search.go).

This package maps every reference operator onto declarative DataFrame programs
(SURVEY.md section 2 has the full inventory), and extends them with the
operators a 100 TB training-data pipeline needs: near-duplicate detection,
similarity search/join, text analysis, and multimodal column plumbing.

Design stance (SURVEY.md section 7):
- Everything is a DataFrame program; no RDDs.
- Native Column expressions before pandas_udf; pandas_udf (Arrow) before
  row-at-a-time UDFs; UDFs never in the hot path when a builtin works.
- Catalyst owns optimization: predicate pushdown, column pruning, broadcast
  joins, AQE. The engine only *composes* plans.
"""

from veri_spark.session import get_spark, prepare_session
from veri_spark.sources.catalog import load_json_lines, load_table, load_tables, TABLES
from veri_spark.operators.search import SearchConfig, search, multi_search
from veri_spark.operators.asof import asof_join
from veri_spark.store import DatasetConfig, FeatureStore

__all__ = [
    "get_spark",
    "prepare_session",
    "load_json_lines",
    "load_table",
    "load_tables",
    "TABLES",
    "SearchConfig",
    "search",
    "multi_search",
    "asof_join",
    "DatasetConfig",
    "FeatureStore",
]

__version__ = "0.1.0"
