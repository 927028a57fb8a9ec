"""Streaming vector-search serving: a stream of query vectors answered
against the static corpus, micro-batch at a time.

This is the online half of the batch-index/serve split the ANN rows
certify: queries ARRIVE (a file/queue stream), the corpus/index is a
static broadcastable relation, and each micro-batch runs the SAME
``operators.knn`` plan the batch path uses — so the streaming results are
oracle-checkable against the batch KNN over the same probe set. Per-probe
top-k inside one micro-batch is fine (the rank is per batch, not over the
unbounded stream — contrast streaming/fusion.py, which accumulates state
across batches instead).

``foreachBatch`` is the serving surface on purpose: it hands each bounded
micro-batch to arbitrary BATCH code (the knn operator, untouched), which
is exactly how real Structured Streaming deployments serve model/index
lookups. Results accumulate on the driver here only because the memory
sink is the test harness — a deployment writes each batch's answers to
its sink inside the same callback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-process invocation counter for run_streaming_graph_ingest_availablenow:
# each call deploys into a FRESH durable state_dir (bench runs a row twice;
# reusing a state dir would make trial 2 a recovery no-op, not a deployment)
_INGEST_INVOCATION = 0


class AnnIndexServer:
    """Batched ANN serving against a persisted partition-pruned IVF index
    — the STABLE serving surface for the measured Spark-native form.

    Single-probe queries on Spark pay a ~0.5-1 s planning/scheduling
    floor regardless of index quality (measured,
    ``tools/serve_latency.py``); batching probes into ONE plan amortizes
    it to ~11.5 ms/query at 100 probes. So the API accepts probe BATCHES
    only: ``serve_batch(probes_df)`` answers every probe in the batch in
    a single DataFrame plan — no per-probe jobs, no driver loop — which
    is also exactly what the per-micro-batch streaming serve
    (``run_streaming_knn_availablenow`` / ``s_streaming_knn_serve``)
    executes per trigger. Centroids are pinned once at construction
    (localCheckpoint) so repeated batches re-broadcast a tiny
    materialized relation instead of re-deriving it; the index scan
    prunes to the probed buckets via the ``centroid_id`` partition
    column. At 100 TB this object is the long-lived serving session over
    the once-per-corpus index build."""

    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        centroids: DataFrame,
        k: int = 10,
        n_probe: int = 4,
    ) -> None:
        self.spark = spark
        self.index_path = index_path
        self.centroids = centroids.localCheckpoint(eager=True)
        self.k = k
        self.n_probe = n_probe

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        centroids: DataFrame,
        index_path: str,
        k: int = 10,
        n_probe: int = 4,
    ) -> "AnnIndexServer":
        """Once-per-corpus batch job: assign + write the centroid-
        partitioned index, then return the serving session over it."""
        from ..operators.ann import ivf_assign, ivf_build_index

        ivf_build_index(
            corpus, centroids, index_path,
            assigned=ivf_assign(corpus, centroids),
        )
        return cls(corpus.sparkSession, index_path, centroids, k, n_probe)

    def serve_batch(self, probes: DataFrame) -> DataFrame:
        """Answer a batch of (probe_id, probe_vec) rows in ONE plan:
        returns (probe_id, vec_id, score) top-k per probe. Cost is one
        pruned index scan + broadcast joins for the whole batch —
        per-query latency falls linearly with batch size until scan work
        dominates."""
        from ..operators.ann import ivf_probe_index

        return ivf_probe_index(
            self.spark, self.index_path, self.centroids, probes,
            k=self.k, n_probe=self.n_probe,
        )


def stream_vectors(spark: SparkSession, path_glob: str) -> DataFrame:
    """File-source stream over embeddings parquet (bounded drain with
    Trigger.availableNow in tests)."""
    schema = spark.read.parquet(path_glob).schema
    return spark.readStream.schema(schema).parquet(path_glob)


def run_streaming_knn_availablenow(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    n_probes: int = 3,
) -> DataFrame:
    """Drain the probe stream (vec_id < ``n_probes`` of the embeddings
    table arriving as files) through a per-micro-batch KNN against the
    static corpus; return all served answers. Deterministic regardless of
    how the file source batches the probes: each probe's top-k depends
    only on that probe and the static corpus."""
    from ..operators.knn import knn
    from ..sources.catalog import load_table

    corpus = load_table(spark, sf_dir, "embeddings")
    probes = (
        stream_vectors(spark, f"{sf_dir}/embeddings*.parquet")
        .filter(F.col("vec_id") < n_probes)
        .select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_vec")
        )
    )
    served: list = []

    def _serve(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = knn(corpus, batch_df, k=k).select(
            "probe_id", "vec_id", F.round("score", 6).alias("score")
        )
        # driver accumulation is the TEST sink (k x n_probes rows); a
        # deployment writes res to its real sink here instead
        served.extend(res.collect())

    q = (
        probes.writeStream.foreachBatch(_serve)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        served, "probe_id long, vec_id long, score double"
    )


class GraphIndexServer:
    """Batched graph-ANN serving over a prebuilt k-NN graph — the
    HNSW-class twin of :class:`AnnIndexServer` (round 8, the serve half
    of ``operators.ann.knn_graph_build``). Same contract: probe BATCHES
    only (single-probe queries pay Spark's ~0.5-1 s scheduling floor),
    one DataFrame plan per batch via ``knn_graph_serve``'s iterative
    beam search. The adjacency and corpus vectors are pinned once at
    construction (localCheckpoint) so repeated batches re-broadcast
    materialized relations; measured 27.9 ms/query at 100 probes
    (tools/serve_latency.py, graph_batched)."""

    def __init__(
        self,
        graph: DataFrame,
        corpus: DataFrame,
        k: int = 10,
        beam: int = 8,
        rounds: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int | None = None,
        seed: int = 42,
        n_planes: int | None = None,
        band_bits: int | None = None,
    ) -> None:
        self.graph = graph.localCheckpoint(eager=True)
        self.corpus = corpus.select(id_col, vec_col).localCheckpoint(
            eager=True
        )
        self.k = k
        self.beam = beam
        self.rounds = rounds
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self.seed = seed
        # one Arrow signature pass at construction — the LSH entry mode
        # would otherwise re-hash the whole corpus (interpreted 24-dot
        # JVM signature, ~ms/row) on EVERY batch. The banding config is
        # resolved ONCE here and the SAME values feed both the persisted
        # band table and every serve call (ADVICE r8 high: letting
        # serve_batch re-derive band_bits from an auto corpus count made
        # probe and corpus hash under different configs at any corpus
        # size where auto != the table's default — entry join empty).
        if dim is not None:
            from ..operators.ann import auto_band_bits, corpus_band_keys

            if band_bits is None:
                band_bits = auto_band_bits(corpus.count())
            if n_planes is None:
                n_planes = band_bits * 4
            self.band_bits = band_bits
            self.n_planes = n_planes
            self.corpus_bands = corpus_band_keys(
                corpus, n_planes=n_planes, band_bits=band_bits, seed=seed,
                dim=dim, id_col=id_col, vec_col=vec_col,
            ).localCheckpoint(eager=True)
        else:
            self.band_bits = band_bits
            self.n_planes = n_planes
            self.corpus_bands = None

    @classmethod
    def build(
        cls,
        corpus: DataFrame,
        dim: int,
        graph_k: int = 6,
        rounds: int = 2,
        seed: int = 42,
        k: int = 10,
        beam: int = 8,
        serve_rounds: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "GraphIndexServer":
        """Once-per-corpus batch job: build the k-NN graph (AUTO
        band_bits — bucket sizes hold at any corpus scale) and return
        the serving session over it. The auto banding is resolved HERE
        (one count job) and the identical config is pinned through the
        build, the persisted band table, and every serve batch."""
        from ..operators.ann import auto_band_bits, knn_graph_build

        band_bits = auto_band_bits(corpus.count())
        n_planes = band_bits * 4
        graph = knn_graph_build(
            corpus, k=graph_k, n_planes=n_planes, band_bits=band_bits,
            rounds=rounds, seed=seed, dim=dim,
            id_col=id_col, vec_col=vec_col,
        )
        return cls(
            graph, corpus, k=k, beam=beam, rounds=serve_rounds,
            id_col=id_col, vec_col=vec_col, dim=dim, seed=seed,
            n_planes=n_planes, band_bits=band_bits,
        )

    def serve_batch(self, probes: DataFrame) -> DataFrame:
        """Answer a batch of (probe_id, probe_vec) rows in ONE plan:
        (probe_id, vec_id, rank, score) top-k per probe via batched beam
        search — the graph never shuffles (frontier broadcast-joins it)."""
        from ..operators.ann import knn_graph_serve

        # LSH-seeded entries when the build dim is known (the clustered-
        # corpus fix — see knn_graph_serve's entry-mode contract);
        # lowest-id entries otherwise.
        return knn_graph_serve(
            self.graph, self.corpus, probes,
            k=self.k, beam=self.beam, rounds=self.rounds,
            entries="lsh" if self.dim is not None else None,
            id_col=self.id_col, vec_col=self.vec_col,
            dim=self.dim, seed=self.seed,
            n_planes=self.n_planes, band_bits=self.band_bits,
            corpus_bands=self.corpus_bands,
        )


class DurableGraphIngest:
    """DURABLE streaming graph-index maintenance (VERDICT r9 next #1):
    the grown k-NN graph survives stream restarts.

    The round-9 form kept the grown adjacency in a driver-side dict of
    localCheckpoints — a restart either replayed every insert from
    scratch or lost them. This class closes that gap with the same
    recipe the reference uses for its durable ``condition_vec`` store
    (a real table, not process memory): every micro-batch's post-insert
    adjacency is persisted to parquet in the ``v_knn_graph_persist``
    shard format (``graph_write_index``), keyed by the stream's batch_id
    and committed via an atomic ``_LATEST`` marker rename, alongside the
    Structured Streaming source checkpoint.

    Exactly-once state under the standard crash matrix:

    - crash BEFORE the snapshot write: the source checkpoint has the
      offsets but no commit → the batch replays; recovery loaded the
      previous snapshot, the replayed insert re-applies, the snapshot
      dir is overwritten idempotently.
    - crash AFTER the snapshot but BEFORE the engine's commit file: the
      batch replays, but the ``_LATEST`` marker already covers it →
      the ``batch_id <= committed`` guard SKIPS the re-insert (the
      recovered snapshot already contains it; re-applying would be
      harmless by the chained==one-shot theorem, but skipping keeps the
      work bounded).
    - clean stop between batches: restart recovers the latest snapshot
      and the source checkpoint feeds only unseen files.

    Chained-insert == one-shot-insert (the pinned batching-invariance
    theorem) extends across restarts: the final graph equals the
    one-shot insert of ALL drained rows regardless of where the crash
    fell — ``tests/test_streaming.py`` pins both crash cases. At 100 TB
    the snapshot write is the standard per-batch index publish (hash-
    sharded parquet, bounded by graph size ~n·k rows), and recovery is
    one index read instead of a corpus-wide rebuild."""

    def __init__(
        self,
        base: DataFrame,
        state_dir: str,
        k: int = 6,
        n_planes: int = 24,
        band_bits: int = 6,
        seed: int = 42,
        dim: int | None = None,
        rounds: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        import os

        from ..config import EMB_DIM

        self.spark = base.sparkSession
        self.base = base.localCheckpoint(eager=True)
        self.state_dir = state_dir
        self.graph_dir = os.path.join(state_dir, "graph")
        self.checkpoint_dir = os.path.join(state_dir, "checkpoint")
        self.marker = os.path.join(self.graph_dir, "_LATEST")
        self.k = k
        self.n_planes = n_planes
        self.band_bits = band_bits
        self.seed = seed
        self.dim = EMB_DIM if dim is None else dim
        self.rounds = rounds
        self.id_col = id_col
        self.vec_col = vec_col
        # base corpus band table: hashed ONCE per process (Arrow pass),
        # reused by every micro-batch's candidate join — never per batch
        from ..operators.ann import corpus_band_keys

        self.bands = corpus_band_keys(
            self.base, n_planes=n_planes, band_bits=band_bits, seed=seed,
            dim=self.dim, id_col=id_col, vec_col=vec_col,
        ).localCheckpoint(eager=True)
        self._graph, self._committed = self._recover()

    # -- durability plumbing ------------------------------------------
    def _snapshot_path(self, batch_id: int) -> str:
        import os

        return os.path.join(self.graph_dir, f"b{batch_id}")

    def _read_marker(self) -> int | None:
        import os

        if not os.path.exists(self.marker):
            return None
        with open(self.marker) as fh:
            return int(fh.read().strip())

    def _commit(self, graph: DataFrame, batch_id: int) -> None:
        """Persist the post-insert adjacency, then advance the marker
        atomically (tmp + rename) — the snapshot is invisible to
        recovery until the rename lands."""
        import os

        from ..operators.ann import graph_write_index

        graph_write_index(graph, self._snapshot_path(batch_id))
        tmp = self.marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, self.marker)
        self._committed = batch_id
        # retain only the committed snapshot: older ones are superseded
        # (the marker never points at them again)
        import shutil

        for d in os.listdir(self.graph_dir):
            if d.startswith("b") and d[1:].lstrip("-").isdigit():
                if int(d[1:]) != batch_id:
                    shutil.rmtree(
                        os.path.join(self.graph_dir, d), ignore_errors=True
                    )

    def _recover(self) -> tuple[DataFrame, int]:
        """Load the latest committed snapshot; on first start, build the
        base graph and commit it as batch -1 (so even a crash before the
        first micro-batch recovers without a rebuild)."""
        import os

        from ..operators.ann import graph_read_index, knn_graph_build

        last = self._read_marker()
        if last is not None:
            g = (
                graph_read_index(self.spark, self._snapshot_path(last))
                .coalesce(32)
                .localCheckpoint(eager=True)
            )
            return g, last
        os.makedirs(self.graph_dir, exist_ok=True)
        g = (
            knn_graph_build(
                self.base, k=self.k, n_planes=self.n_planes,
                band_bits=self.band_bits, rounds=self.rounds,
                seed=self.seed, dim=self.dim,
                id_col=self.id_col, vec_col=self.vec_col,
            )
            .coalesce(32)
            .localCheckpoint(eager=True)
        )
        self._commit(g, -1)
        return g, -1

    # -- streaming surface --------------------------------------------
    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: replay-guarded insert + snapshot commit."""
        from ..operators.ann import knn_graph_insert

        if batch_df.isEmpty():
            return
        if batch_id <= self._committed:
            return  # replayed batch already in the committed snapshot
        self._graph = (
            knn_graph_insert(
                self._graph, self.base, batch_df, k=self.k,
                n_planes=self.n_planes, band_bits=self.band_bits,
                seed=self.seed, dim=self.dim, id_col=self.id_col,
                vec_col=self.vec_col, corpus_bands=self.bands,
            )
            # iterative-loop rules: re-coalesce before each checkpoint or
            # unionByName SUMS partition counts across batches
            .coalesce(32)
            .localCheckpoint(eager=True)
        )
        self._commit(self._graph, batch_id)

    def run_availablenow(self, source_glob: str, schema) -> DataFrame:
        """Drain all available source files through the replay-guarded
        ingest (maxFilesPerTrigger=1 so foreachBatch fires per file) and
        return the grown adjacency. The source checkpoint lives under
        the same state_dir, so a restarted run skips already-ingested
        files AND recovers the matching graph snapshot."""
        q = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(source_glob)
            .writeStream.foreachBatch(self.ingest_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self._graph

    @property
    def graph(self) -> DataFrame:
        return self._graph


def run_streaming_graph_ingest_availablenow(
    spark: SparkSession,
    sf_dir: str,
    n_new: int = 20,
    k: int = 6,
    serve_k: int = 10,
    beam: int = 8,
    serve_rounds: int = 2,
    n_probes: int = 3,
    n_planes: int = 24,
    band_bits: int = 6,
    dim: int | None = None,
    n_files: int = 3,
) -> DataFrame:
    """Streaming graph-index MAINTENANCE + serve — the full online story
    (VERDICT r8 next #6): the k-NN graph GROWS between micro-batches.
    The base graph is built once on vec_id >= ``n_new``; the ``n_new``
    newest vectors are written out as ``n_files`` parquet files and
    drained through a file-source stream with maxFilesPerTrigger=1, so
    ``foreachBatch`` really fires multiple times, each batch linked in
    by ``knn_graph_insert`` against the base corpus (the persisted
    build-time band table is computed ONCE and reused per batch — no
    corpus re-hash). After the drain, probes are answered by the
    LSH-entry beam search over the GROWN graph.

    Batching-invariance is a THEOREM here, not luck: per-node top-k is
    idempotent under staged candidate arrival — topk(topk(E ∪ C1) ∪ C2)
    = topk(E ∪ C1 ∪ C2) for any fixed scores under a total order
    (floored score DESC, id ASC), and new-node edges pair against the
    BASE corpus only (the documented no-new-new-pairs contract), so the
    chained per-batch inserts equal the one-shot insert of all new rows
    however the file source batches them. That one-shot insert is
    exactly what the DuckDB oracle replays (``s_graph_ingest_serve``),
    followed by the serve replay over the post-insert adjacency —
    values, ranks, and scores exact. The chained==one-shot identity is
    additionally pinned as a batch test (tests/test_streaming.py).

    At 100 TB this is the steady-state deployment: one long-lived graph
    relation, per-micro-batch bounded insert work (banded candidates
    only), serve over the latest snapshot.

    Round 10: the ingest runs through :class:`DurableGraphIngest` — the
    grown adjacency is persisted per micro-batch (sharded parquet +
    atomic marker) next to the stream's source checkpoint, so this row
    now certifies the DURABLE deployment form, and restart recovery is
    pinned separately in tests/test_streaming.py. Each invocation uses
    a fresh state_dir (invocation-counted) so bench trials measure a
    full cold deployment, not a recovery no-op."""
    import os
    import shutil

    from ..config import EMB_DIM
    from ..operators.ann import knn_graph_serve
    from ..sources.catalog import load_table
    from ..utils import pid_scratch

    dim = EMB_DIM if dim is None else dim
    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    base = emb.filter(F.col("vec_id") >= n_new).localCheckpoint(eager=True)
    new_rows = emb.filter(F.col("vec_id") < n_new)
    global _INGEST_INVOCATION
    _INGEST_INVOCATION += 1
    # counter goes INSIDE the pid-scratch dir (the dead-pid pruner parses
    # the trailing token as a pid — nothing may follow it)
    path = os.path.join(
        pid_scratch("graph_ingest_src", sf_dir), f"inv{_INGEST_INVOCATION}"
    )
    state_dir = os.path.join(
        pid_scratch("graph_ingest_state", sf_dir), f"inv{_INGEST_INVOCATION}"
    )
    shutil.rmtree(state_dir, ignore_errors=True)
    new_rows.repartition(n_files).write.mode("overwrite").parquet(path)
    ingest = DurableGraphIngest(
        base, state_dir, k=k, n_planes=n_planes, band_bits=band_bits,
        seed=42, dim=dim, rounds=2,
    )
    grown = ingest.run_availablenow(
        os.path.join(path, "*.parquet"), new_rows.schema
    )
    probes = emb.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    return knn_graph_serve(
        grown, emb, probes, k=serve_k, beam=beam,
        rounds=serve_rounds, entries="lsh", n_planes=n_planes,
        band_bits=band_bits, seed=42, dim=dim,
    )


def run_streaming_graph_serve_availablenow(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    beam: int = 8,
    rounds: int = 2,
    n_probes: int = 3,
    n_planes: int = 24,
    band_bits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Streaming GRAPH-ANN serving (the GraphIndexServer twin of
    ``run_streaming_knn_availablenow``): the k-NN graph is built ONCE
    (static index), then probe files drain through the streaming engine
    and each micro-batch runs ``knn_graph_serve`` with LSH-seeded
    entries inside ``foreachBatch``. Per-probe answers are
    batching-invariant — each probe's beam walk depends only on that
    probe, the static graph, and the static corpus — so the union over
    micro-batches is certified against the one-batch serve oracle."""
    from ..config import EMB_DIM
    from ..operators.ann import knn_graph_build, knn_graph_serve
    from ..sources.catalog import load_table

    dim = EMB_DIM if dim is None else dim
    corpus = load_table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=True
    )
    graph = knn_graph_build(
        corpus, k=6, n_planes=n_planes, band_bits=band_bits, rounds=2,
        seed=42, dim=dim,
    ).localCheckpoint(eager=True)
    probes = (
        stream_vectors(spark, f"{sf_dir}/embeddings*.parquet")
        .filter(F.col("vec_id") < n_probes)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
        )
    )
    served: list = []

    def _serve(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = knn_graph_serve(
            graph, corpus, batch_df, k=k, beam=beam, rounds=rounds,
            entries="lsh", n_planes=n_planes, band_bits=band_bits,
            seed=42, dim=dim,
        )
        served.extend(res.collect())

    q = (
        probes.writeStream.foreachBatch(_serve)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        served, "probe_id long, vec_id long, rank long, score double"
    )
