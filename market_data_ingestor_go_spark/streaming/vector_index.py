"""Streaming maintenance of the materialized ANN index (round 5).

``operators/similarity.py::build_hyperplane_index`` materializes the
hyperplane-LSH index as a bucketed table — the 100 TB deployment
shape. This module keeps that index FRESH from an embedding stream:
each micro-batch of new vectors is signed with the SAME deterministic
hyperplanes and landed into the index table, so probes see new
vectors within one trigger and never recompute corpus signatures.

Exactly-once layout: the managed table is PARTITIONED by epoch and
BUCKETED by the LSH bucket id. Epoch partitions give the same
idempotent-replay contract as the ingest history sink (a replayed
epoch dynamically overwrites ITS OWN partition — verified: replaying
an epoch leaves the row count unchanged); bucketing keeps the probe
path's pruned, shuffle-free scan shape within every partition.

Scale posture: per-batch work is signature computation over the batch
only (narrow projection, no shuffle beyond the bucketed write of the
batch — never the existing index). Probes reuse
``hyperplane_ann_from_index`` unchanged: identical planes, probes and
ranking as the on-the-fly path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (_hyperplanes, as_double, dot,
                                    hyperplane_ann_from_index,
                                    hyperplane_signature)


@dataclass
class StreamingVectorIndex:
    """foreachBatch maintainer of a bucketed hyperplane-LSH index."""

    spark: SparkSession
    table: str
    dim: int = 64
    n_planes: int = 6
    n_buckets: int = 16
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    trigger_seconds: int = 2
    rows_indexed: int = 0
    epochs: int = 0
    queries: list = field(default_factory=list)

    def _signed(self, batch: DataFrame, epoch_id: int) -> DataFrame:
        planes = _hyperplanes(self.dim, self.n_planes)
        c = batch.select(F.col(self.id_col).alias("n_id"),
                         as_double(self.vec_col).alias("nv"))
        return (c.withColumn("nsd", dot(F.col("nv"), F.col("nv")))
                .withColumn("bucket",
                            hyperplane_signature(F.col("nv"), planes))
                .withColumn("epoch", F.lit(int(epoch_id))))

    def _index_batch(self, batch: DataFrame, epoch_id: int) -> None:
        signed = self._signed(batch, epoch_id)
        # dynamic partition overwrite → replaying a crashed epoch
        # rewrites only its own partition (idempotent). Set on the
        # session the write runs under: foreachBatch executes in a
        # CLONED session whose conf was snapshotted at stream start,
        # so setting only self.spark after that point would leave the
        # clone in static mode and wipe the table on every insert.
        signed.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
        if not self.spark.catalog.tableExists(self.table):
            (signed.write.mode("overwrite").partitionBy("epoch")
             .bucketBy(self.n_buckets, "bucket").sortBy("bucket")
             .saveAsTable(self.table))
        else:
            # positional insert: (n_id, nv, nsd, bucket, epoch) matches
            # the creation schema above
            signed.write.insertInto(self.table, overwrite=True)
        self.rows_indexed += batch.count()
        self.epochs += 1

    def attach(self, embedding_stream: DataFrame, checkpoint_dir: str):
        """Maintain the index from a streaming embedding source."""
        q = (embedding_stream.writeStream
             .foreachBatch(self._index_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(processingTime=f"{self.trigger_seconds} seconds")
             .start())
        self.queries.append(q)
        return q

    def bootstrap(self, corpus: DataFrame) -> None:
        """Seed the index from an existing batch corpus (epoch -1),
        before attaching the stream."""
        self._index_batch(corpus, epoch_id=-1)
        self.epochs -= 1  # bootstrap is not a stream epoch

    def probe(self, query_vectors: DataFrame, k: int = 5,
              multiprobe: int = 1) -> DataFrame:
        """ANN top-k against the CURRENT index contents — same
        semantics as random_hyperplane_ann over everything indexed so
        far (epoch partitions union transparently)."""
        return hyperplane_ann_from_index(
            self.spark, self.table, query_vectors, k=k, dim=self.dim,
            n_planes=self.n_planes, multiprobe=multiprobe,
            id_col=self.id_col, vec_col=self.vec_col)

    def compact(self) -> int:
        """Fold all epoch partitions into epoch -1 (mirrors
        compact_history): a long-running stream accumulates one
        partition per trigger, which degrades listing/planning long
        before it degrades data. Run only while the stream is stopped
        with its checkpoint fully committed — compaction folds epochs
        together, so a pending replay would resurrect its partition
        and duplicate rows. Returns the compacted row count.

        Staged copy: the folded index lands in ``<table>__staging``
        first, the live table is rebuilt from it, then staging drops —
        a full copy exists at every instant of the swap (managed-table
        RENAME is not used: the catalog keeps the old location and
        reads empty after it — observed on this build).
        """
        staging = f"{self.table}__staging"

        def write_folded(src: DataFrame, dest: str) -> None:
            (src.write.mode("overwrite").partitionBy("epoch")
             .bucketBy(self.n_buckets, "bucket").sortBy("bucket")
             .saveAsTable(dest))

        live = self.spark.table(self.table)
        n = live.count()
        write_folded(live.drop("epoch").withColumn("epoch", F.lit(-1)),
                     staging)
        write_folded(self.spark.table(staging), self.table)
        self.spark.sql(f"DROP TABLE {staging}")
        return n

    def metrics(self) -> dict:
        return {"vector_index_rows_indexed": self.rows_indexed,
                "vector_index_epochs": self.epochs}

    def stop(self) -> None:
        for q in self.queries:
            q.stop()


@dataclass
class StreamingPQIndex:
    """foreachBatch maintainer of the PQ CODES table (r6) — the
    encode-on-ingest half of the production PQ deployment (train
    offline → encode each arriving batch with the broadcast codebook
    → serve with ADC + rerank over the stored codes, zero encode at
    query time). Same exactly-once layout as StreamingVectorIndex:
    epoch partitions + dynamic partition overwrite make a crashed
    epoch's replay rewrite only its own partition.

    ``codebook_rows`` is the trained artifact as plain rows
    (subspace, cell, cv) — the collected output of
    ``train_pq_codebooks`` — so the maintainer owns no lineage into
    the training corpus. Per-batch work is the batch's encode only;
    the existing index never rewrites. Probes reuse
    ``pq_ann_from_index`` unchanged, so an index probe is
    row-identical to ``pq_ann`` over everything indexed so far
    (tested)."""

    spark: SparkSession
    table: str
    codebook_rows: list = field(default_factory=list)
    id_col: str = "vec_id"
    vec_col: str = "embedding"
    trigger_seconds: int = 2
    rows_indexed: int = 0
    epochs: int = 0
    queries: list = field(default_factory=list)

    def _codebooks(self) -> DataFrame:
        return self.spark.createDataFrame(
            self.codebook_rows, "subspace INT, cell INT, cv ARRAY<DOUBLE>")

    def _encode_batch(self, batch: DataFrame, epoch_id: int) -> None:
        from ..operators.similarity import pq_encode
        enc = (pq_encode(batch, self._codebooks(), self.id_col,
                         self.vec_col)
               .withColumn("epoch", F.lit(int(epoch_id))))
        enc.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic")
        if not self.spark.catalog.tableExists(self.table):
            (enc.write.mode("overwrite").partitionBy("epoch")
             .saveAsTable(self.table))
        else:
            enc.write.insertInto(self.table, overwrite=True)
        self.rows_indexed += batch.count()
        self.epochs += 1

    def attach(self, embedding_stream: DataFrame, checkpoint_dir: str):
        q = (embedding_stream.writeStream
             .foreachBatch(self._encode_batch)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(processingTime=f"{self.trigger_seconds} seconds")
             .start())
        self.queries.append(q)
        return q

    def bootstrap(self, corpus: DataFrame) -> None:
        """Seed from an existing batch corpus (epoch -1)."""
        self._encode_batch(corpus, epoch_id=-1)
        self.epochs -= 1  # bootstrap is not a stream epoch

    def probe(self, query_vectors: DataFrame, k: int = 5,
              shortlist: int = 4) -> DataFrame:
        from ..operators.similarity import pq_ann_from_index
        return pq_ann_from_index(
            self.spark.table(self.table).drop("epoch"), query_vectors,
            self._codebooks(), k=k, shortlist=shortlist,
            id_col=self.id_col, vec_col=self.vec_col)

    def metrics(self) -> dict:
        return {"pq_index_rows_indexed": self.rows_indexed,
                "pq_index_epochs": self.epochs}

    def stop(self) -> None:
        for q in self.queries:
            q.stop()
