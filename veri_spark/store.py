"""FeatureStore facade: the reference's service surface as a Python API.

Mirrors the gRPC verbs of VeriService (veriservice.proto:7-17; SURVEY.md
section 2.9) over DataFrames:

    reference RPC              | here
    ---------------------------+------------------------------------------
    CreateDataIfNotExists      | create_dataset(name, config)
    Insert                     | insert(name, df, ttl_seconds, no_target)
    (delete via Data.Delete)   | delete(name, keys)
    SearchStream               | search(name, queries, config, context)
    GetDataInfo                | data_info(name)
    DataStream (export)        | export(name)
    Join/AddPeer/Ping          | dropped — the cluster manager owns membership

Datasets are named parquet directories under a root path plus a JSON config
sidecar (the analog of dataset.go's index.save persistence,
data/dataset.go:166-227). State transitions are whole-table rewrites through
the mutation operators — at production scale the same calls target Delta/
Iceberg tables and become MERGE/DELETE; the facade isolates that choice.

Score functions named with the reference's ``Annoy*`` prefix route to the
approximate path (IVF probe search), mirroring data/search.go:136-141's
dispatch; all other names run the exact pipeline.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from veri_spark.functions.vector import is_approximate
from veri_spark.operators import mutation as M
from veri_spark.operators import stats as ST
from veri_spark.operators.search import SearchConfig, aggregated_search, multi_search
from veri_spark.operators.similarity import ivf_assign, take_centroids
from veri_spark.session import prepare_session

DATUM_SCHEMA = (
    "feature array<float>, group_label string, label string, version bigint, "
    "dim1 int, dim2 int, size1 int, size2 int, expire_at timestamp"
)


@dataclass
class DatasetConfig:
    """Mirror of pb.DataConfig defaults (data/dataset.go:45-56)."""

    target_n: int = 1000
    target_utilization: float = 0.4
    replication_on_insert: int = 1  # recorded, not enforced (storage owns it)
    retention_days: int = 14
    version: int = 0


class FeatureStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = prepare_session(spark)
        self.root = root.rstrip("/")
        os.makedirs(self.root, exist_ok=True)

    # -- catalog ----------------------------------------------------------
    def _data_path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def _config_path(self, name: str) -> str:
        return f"{self.root}/{name}.config.json"

    def create_dataset(self, name: str, config: DatasetConfig | None = None) -> DatasetConfig:
        """CreateIfNotExists semantics (data/dataset.go:107-130): register
        with defaults; a higher config.version replaces the stored config."""
        config = config or DatasetConfig()
        path = self._config_path(name)
        if os.path.exists(path):
            stored = DatasetConfig(**json.load(open(path)))
            if config.version <= stored.version:
                return stored
        json.dump(asdict(config), open(path, "w"))
        return config

    def get_config(self, name: str) -> DatasetConfig:
        path = self._config_path(name)
        if os.path.exists(path):
            return DatasetConfig(**json.load(open(path)))
        return self.create_dataset(name)

    def _read(self, name: str) -> DataFrame:
        path = self._data_path(name)
        if not os.path.exists(path):
            return self.spark.createDataFrame([], DATUM_SCHEMA)
        return self.spark.read.parquet(path)

    # -- mutations --------------------------------------------------------
    def insert(
        self,
        name: str,
        df: DataFrame,
        ttl_seconds: int | None = None,
        no_target: bool = False,
    ) -> int:
        """Upsert a batch (S1/S2): TargetN cap unless no_target, TTL
        attachment, last-version-wins on the datum key. Returns the admitted
        row count."""
        self.create_dataset(name)
        cfg = self.get_config(name)
        current = self._read(name)
        batch = M.with_ttl(df, ttl_seconds)
        if "version" not in batch.columns:
            batch = batch.withColumn("version", F.lit(0).cast("bigint"))
        # null-pad optional datum columns (dim/size/...) absent from the batch
        for field in current.schema.fields:
            if field.name not in batch.columns:
                batch = batch.withColumn(field.name, F.lit(None).cast(field.dataType))
        # key BEFORE the capacity gate so admission can order on it: the gate's
        # limit() is then deterministic, and the count below agrees with the
        # rows the merge actually persists (same plan, same order, same rows).
        batch = batch.withColumn("__key", M.datum_key())
        admitted = M.capacity_gate(
            current.count(), batch, cfg.target_n, no_target, order_cols=["__key"]
        )
        cur_keyed = current.withColumn("__key", M.datum_key())
        merged = M.upsert(cur_keyed, admitted.select(*cur_keyed.columns), ["__key"]).drop(
            "__key"
        )
        n = admitted.count()
        self._overwrite(name, merged)
        return n

    def insert_stream(
        self,
        name: str,
        stream: DataFrame,
        ttl_seconds: int | None = None,
        timeout_s: int = 120,
    ) -> None:
        """Streaming ingest (the reference's continuously-accepting Insert
        RPC, node/nodeservice.go:35-51): each micro-batch runs the same
        upsert as the batch path via foreachBatch, so change-dedup and
        last-version-wins hold per batch. availableNow drains the source
        then stops — swap the trigger for continuous production ingest."""

        def _merge(batch_df: DataFrame, _batch_id: int) -> None:
            self.insert(name, batch_df, ttl_seconds=ttl_seconds, no_target=True)

        q = (
            stream.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", f"{self.root}/{name}.checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)

    def delete(self, name: str, keys: DataFrame, key_cols: list[str]) -> None:
        """Delete by key columns (S3)."""
        self._overwrite(name, M.delete_keys(self._read(name), keys, key_cols))

    def expire_now(self, name: str) -> None:
        """TTL compaction (the reference's lazy expiry made explicit)."""
        self._overwrite(name, M.expire(self._read(name)))

    def compact(self, name: str, target_files: int = 8) -> int:
        """Small-files compaction: rewrite the dataset as ``target_files``
        parquet files (streaming ingest leaves one file set per micro-batch;
        at cluster scale this is OPTIMIZE/rewriteDataFiles). Drops expired
        rows in the same pass. Returns the live row count."""
        live = M.expire(self._read(name))
        self._overwrite(name, live.repartition(target_files))
        return self._read(name).count()

    def _overwrite(self, name: str, df: DataFrame) -> None:
        # plain-parquet state transition: write new, swap. Delta/Iceberg
        # MERGE replaces this whole method in production.
        tmp = self._data_path(name) + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self._data_path(name)
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)

    # -- queries ----------------------------------------------------------
    def search(
        self,
        name: str,
        query_vectors: list[list[float]] | DataFrame,
        config: SearchConfig | None = None,
        context_vectors: list[list[float]] = (),
        prioritize_context: bool = False,
        nprobe: int = 2,
        n_centroids: int = 16,
        cache_seconds: int | None = None,
    ) -> DataFrame:
        """SearchStream (section 3.1): single- or multi-query KNN with the
        full aggregation pipeline. ``Annoy*`` score functions take the
        approximate IVF path (single-query only), like the reference's
        prefix dispatch — served from the persisted partition-pruned index
        when refresh_index has run, else computed on the fly.
        ``cache_seconds`` enables the result cache (K14): the key is the
        normalized (dataset, queries, config) triple, mirroring
        data/search.go:151-158's query-key + config-minus-uuid."""
        config = config or SearchConfig()
        cache_key = None
        if cache_seconds:
            import hashlib

            if not isinstance(query_vectors, DataFrame):
                payload = json.dumps(
                    [name, [list(map(float, v)) for v in query_vectors],
                     [list(map(float, v)) for v in context_vectors],
                     prioritize_context, nprobe, n_centroids, asdict(config)],
                    sort_keys=True, default=str,
                )
                cache_key = hashlib.sha256(payload.encode()).hexdigest()[:32]
                hit = self._cached_result(cache_key, cache_seconds)
                if hit is not None:
                    return hit

        def _finish(df: DataFrame) -> DataFrame:
            return self._store_result(cache_key, df) if cache_key else df

        corpus = self._read(name)
        if isinstance(query_vectors, DataFrame):
            return multi_search(
                corpus, query_vectors, config,
                context_vectors=context_vectors,
                prioritize_context=prioritize_context,
            )
        if len(query_vectors) == 1:
            q = list(query_vectors[0])
            if is_approximate(config.score_func):
                return _finish(self._approx_search(
                    name, corpus, q, config, nprobe, n_centroids,
                    context_vectors=context_vectors,
                    prioritize_context=prioritize_context,
                ))
            return _finish(aggregated_search(
                corpus, q, config,
                context_vectors=context_vectors,
                prioritize_context=prioritize_context,
                key_cols=["label"],
            ))
        queries = self.spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(query_vectors)],
            "query_id int, query_vector array<float>",
        )
        return _finish(multi_search(
            corpus, queries, config,
            context_vectors=context_vectors,
            prioritize_context=prioritize_context,
        ))

    def _approx_search(
        self,
        name: str,
        corpus: DataFrame,
        q: list[float],
        config: SearchConfig,
        nprobe: int,
        n_centroids: int,
        context_vectors=(),
        prioritize_context: bool = False,
    ) -> DataFrame:
        """The Annoy* dispatch (data/search.go:136-141): IVF probe for
        candidate generation, then the SAME scoring/filter/aggregation
        semantics as the exact path — the reference's Annoy branch scores
        candidates with the configured function and applies PassesFilters
        before collecting (data/search.go:311-327), so TTL, JSON-path
        filters, context re-scoring, and higher_is_better all apply here
        identically; only candidate generation is approximate."""
        from veri_spark.operators.search import (
            context_rescore,
            json_path_filter,
            ttl_filter,
        )
        from veri_spark.operators.similarity import ivf_probe_candidates
        from veri_spark.operators.topk import topk

        builder, hib = config.resolve()
        idx = self._indexed(name)
        if idx is not None:
            assigned, cents = idx
        else:
            cents = take_centroids(corpus, n_centroids, id_col="label", vector_col="feature")
            assigned = ivf_assign(corpus, cents, id_col="label", vector_col="feature")
        cand = ivf_probe_candidates(assigned, cents, q, nprobe=nprobe)
        cand = ttl_filter(cand)
        if config.filters and "label" in cand.columns:
            cand = json_path_filter(cand, "label", config.filters)
        if config.group_filters and "group_label" in cand.columns:
            cand = json_path_filter(cand, "group_label", config.group_filters)
        scored = cand.withColumn("score", builder(F.col("feature"), q))
        scored = context_rescore(
            scored, context_vectors, config, vector_col="feature",
            prioritize=prioritize_context,
        )
        n = config.result_limit or config.limit
        return topk(scored, "score", n, hib, tie_cols=["label"])

    # -- index lifecycle (Process / Annoyer hot-swap analog) ---------------
    def _index_path(self, name: str) -> str:
        return f"{self.root}/{name}.index"

    def refresh_index(
        self, name: str, n_centroids: int = 16, vector_col: str = "feature"
    ) -> int:
        """The reference's Process pass (data/newsync.go:93-227): rebuild the
        ANN index from the live table and hot-swap it atomically. Here the
        index is the IVF assignment written PARTITIONED BY centroid_id, so a
        probe search prunes to nprobe/n_centroids of the files at the scan.
        Returns the number of indexed rows."""
        df = self._read(name)
        df = df.withColumn("__row_id", F.xxhash64(*df.columns))
        cents = take_centroids(df, n_centroids, id_col="__row_id", vector_col=vector_col)
        assigned = ivf_assign(df, cents, id_col="__row_id", vector_col=vector_col)
        tmp = self._index_path(name) + ".tmp"
        assigned.drop("__row_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(tmp)
        cents.write.mode("overwrite").parquet(tmp + ".centroids")
        final = self._index_path(name)
        import shutil

        for suffix in ("", ".centroids"):
            if os.path.exists(final + suffix):
                shutil.rmtree(final + suffix)
            os.rename(tmp + suffix, final + suffix)
        return self.spark.read.parquet(final).count()

    def _indexed(self, name: str):
        final = self._index_path(name)
        if not os.path.exists(final):
            return None
        return (
            self.spark.read.parquet(final),
            self.spark.read.parquet(final + ".centroids"),
        )

    # -- result cache (K14, data/search.go:151-158,169-183,235-239) --------
    def _cached_result(self, key: str, max_age_s: int) -> DataFrame | None:
        path = f"{self.root}/_cache/{key}"
        meta = f"{path}.ts"
        if os.path.exists(meta):
            import time

            if time.time() - float(open(meta).read()) <= max_age_s:
                return self.spark.read.parquet(path)
        return None

    def _store_result(self, key: str, df: DataFrame) -> DataFrame:
        import time

        path = f"{self.root}/_cache/{key}"
        df.write.mode("overwrite").parquet(path)
        with open(f"{path}.ts", "w") as f:
            f.write(str(time.time()))
        return self.spark.read.parquet(path)

    def data_info(self, name: str) -> dict:
        """GetDataInfo (proto:100-114): N, centroid, max distance, histogram."""
        return ST.data_info(self._read(name))

    def export(self, name: str) -> DataFrame:
        """DataStream: the full live table (TTL-filtered)."""
        from veri_spark.operators.search import ttl_filter

        return ttl_filter(self._read(name))
