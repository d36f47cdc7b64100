"""Named query registry: every implemented operator from SURVEY.md
section 2 as a (PySpark program, DuckDB oracle SQL) pair — the public
import surface (``QUERIES``, ``ORACLES``, ``register``,
``_query_vector``) is unchanged; the implementations now live in
domain modules (plans/tpch.py, plans/knn.py, ...) that register
themselves at import time.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame
whose column names/aliases match the oracle exactly (the external
harness sorts columns by name and hash-compares values). Float outputs
are rounded in BOTH programs; every LIMIT has a deterministic
tie-break. See each domain module for the per-query docs.
"""

from __future__ import annotations

from veri_spark.plans._base import (  # noqa: F401
    ORACLES,
    QUERIES,
    _query_vector,
    register,
)

# importing a domain module registers its queries (order fixed for
# deterministic duplicate detection)
from veri_spark.plans import knn as _knn  # noqa: F401,E402
from veri_spark.plans import knn_audit as _knn_audit  # noqa: F401,E402
from veri_spark.plans import events as _events  # noqa: F401,E402
from veri_spark.plans import events_behavior as _events_behavior  # noqa: F401,E402
from veri_spark.plans import vectors as _vectors  # noqa: F401,E402
from veri_spark.plans import tpch as _tpch  # noqa: F401,E402
from veri_spark.plans import store_queries as _store_queries  # noqa: F401,E402
from veri_spark.plans import text as _text  # noqa: F401,E402
from veri_spark.plans import text_metrics as _text_metrics  # noqa: F401,E402
from veri_spark.plans import dedup as _dedup  # noqa: F401,E402
from veri_spark.plans import dedup_audit as _dedup_audit  # noqa: F401,E402
from veri_spark.plans import pipeline as _pipeline  # noqa: F401,E402
from veri_spark.plans import physical as _physical  # noqa: F401,E402
from veri_spark.plans import features as _features  # noqa: F401,E402
from veri_spark.plans import graph as _graph  # noqa: F401,E402
from veri_spark.plans import graph_metrics as _graph_metrics  # noqa: F401,E402
from veri_spark.plans import ranking_metrics as _ranking_metrics  # noqa: F401,E402
from veri_spark.plans import integrity as _integrity  # noqa: F401,E402
from veri_spark.plans import temporal as _temporal  # noqa: F401,E402
from veri_spark.plans import evaluation as _evaluation  # noqa: F401,E402
from veri_spark.plans import evaluation_metrics as _evaluation_metrics  # noqa: F401,E402
from veri_spark.plans import nonparametric as _nonparametric  # noqa: F401,E402
from veri_spark.plans import stats_tests as _stats_tests  # noqa: F401,E402
from veri_spark.plans import mleval as _mleval  # noqa: F401,E402
from veri_spark.plans import quality as _quality  # noqa: F401,E402
from veri_spark.plans import effects as _effects  # noqa: F401,E402
from veri_spark.plans import curation as _curation  # noqa: F401,E402
