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

# stats of the most recent run_streaming_graph_ingest_availablenow call:
# {"publish_s": cumulative delta/base publish wall, "modes": [...]} — the
# bench reads this to report the durability tax as its own split stage
# (VERDICT r10 next #8)
LAST_INGEST_STATS: dict = {}


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
        corpus_bands: DataFrame | None = None,
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
        # one corpus signature pass at construction — the LSH entry mode
        # would otherwise re-hash the whole corpus (interpreted 24-dot
        # JVM signature, ~ms/row) on EVERY batch. The banding config is
        # resolved ONCE here and the SAME values feed both the persisted
        # band table and every serve call (ADVICE r8 high: letting
        # serve_batch re-derive band_bits from an auto corpus count made
        # probe and corpus hash under different configs at any corpus
        # size where auto != the table's default — entry join empty).
        # r14: callers that already hashed the corpus (knn_graph_build's
        # return_bands) pass ``corpus_bands`` — value-identical banding,
        # zero extra passes; ``band_bits``/``n_planes`` must then match
        # the table's config (the standing corpus_bands contract).
        if dim is not None:
            from ..operators.ann import auto_band_bits, corpus_band_keys

            if corpus_bands is not None and (
                band_bits is None or n_planes is None
            ):
                raise ValueError(
                    "GraphIndexServer: corpus_bands requires explicit "
                    "n_planes and band_bits matching the table's banding"
                )
            if band_bits is None:
                band_bits = auto_band_bits(corpus.count())
            if n_planes is None:
                n_planes = band_bits * 4
            self.band_bits = band_bits
            self.n_planes = n_planes
            self.corpus_bands = (
                corpus_bands
                if corpus_bands is not None
                else corpus_band_keys(
                    corpus, n_planes=n_planes, band_bits=band_bits,
                    seed=seed, dim=dim, id_col=id_col, vec_col=vec_col,
                )
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
        # r14: the build's band table seeds the server — one corpus
        # signature pass for build + every serve batch combined
        graph, bands = knn_graph_build(
            corpus, k=graph_k, n_planes=n_planes, band_bits=band_bits,
            rounds=rounds, seed=seed, dim=dim,
            id_col=id_col, vec_col=vec_col, return_bands=True,
        )
        return cls(
            graph, corpus, k=k, beam=beam, rounds=serve_rounds,
            id_col=id_col, vec_col=vec_col, dim=dim, seed=seed,
            n_planes=n_planes, band_bits=band_bits, corpus_bands=bands,
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

    Round 10 persisted the FULL post-insert adjacency every micro-batch
    — O(index) write IO per O(batch) of ingested work, the one
    scale-`weak` in the round-10 audit (at 100× the corpus every batch
    paid 100× the IO of what it ingested). Round 11 replaces that with
    the LSM-style delta publish in ``operators.graph_delta``: per batch
    only the TOUCHED srcs' replacement rows land on disk (new nodes +
    patched neighbors — ``knn_graph_insert`` reports the exact set via
    ``with_touched=True``), bounded by (batch + touched)·k rows; the
    atomic ``_LATEST`` marker names (base snapshot, delta list);
    recovery folds base + deltas with per-src latest-wins; and the
    log's own policy (accumulated delta rows >= half the base, or >32
    deltas) folds everything into a fresh base — O(index) writes happen
    only at compaction, amortized over ~n/2 ingested rows.

    Exactly-once state under the standard crash matrix:

    - crash BEFORE the delta commit: the source checkpoint has the
      offsets but no commit → the batch replays; recovery folded the
      previous (base, deltas), the replayed insert re-applies, the
      delta dir is overwritten idempotently (invisible until the
      marker rename anyway).
    - crash AFTER the delta commit but BEFORE the engine's commit file:
      the batch replays, but the marker already covers it → the
      ``batch_id <= committed`` guard SKIPS the re-insert (the folded
      state already contains it; re-applying would be harmless by the
      chained==one-shot theorem, but skipping keeps the work bounded).
    - clean stop between batches: restart folds the latest (base,
      deltas) and the source checkpoint feeds only unseen files.

    Chained-insert == one-shot-insert (the pinned batching-invariance
    theorem) extends across restarts: the final graph equals the
    one-shot insert of ALL drained rows regardless of where the crash
    fell — ``tests/test_streaming.py`` pins both crash cases. At 100 TB
    the per-batch publish is the standard bounded index-delta write of
    every LSM deployment, and recovery is one base read + a bounded
    delta fold instead of a corpus-wide rebuild.

    ``publish_secs``/``publish_modes`` account the durability tax per
    run so the bench can report the snapshot stage separately
    (VERDICT r10 next #8)."""

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
        compact_rows_frac: float = 0.5,
        max_deltas: int = 32,
    ) -> None:
        import os

        from ..config import EMB_DIM

        from ..operators.graph_delta import GraphDeltaLog

        self.spark = base.sparkSession
        self.base = base.localCheckpoint(eager=True)
        self.state_dir = state_dir
        self.graph_dir = os.path.join(state_dir, "graph")
        self.checkpoint_dir = os.path.join(state_dir, "checkpoint")
        self.log = GraphDeltaLog(
            self.spark, self.graph_dir,
            compact_rows_frac=compact_rows_frac, max_deltas=max_deltas,
        )
        self.publish_secs = 0.0
        self.publish_modes: list[str] = []
        # phase accounting (VERDICT r11 #6): where does the row's wall
        # time actually go — base build vs per-batch insert vs publish
        # vs the streaming engine's per-trigger scheduling floor
        self.base_build_secs = 0.0
        self.band_secs = 0.0
        self.insert_secs = 0.0
        self.drain_secs = 0.0
        self.n_batches = 0
        self.k = k
        self.n_planes = n_planes
        self.band_bits = band_bits
        self.seed = seed
        self.dim = EMB_DIM if dim is None else dim
        self.rounds = rounds
        self.id_col = id_col
        self.vec_col = vec_col
        # base corpus band table: hashed ONCE per process, reused by every
        # micro-batch's candidate join — never per batch. r14: on a COLD
        # start the base build below already hashed every vector, so its
        # banded relation (identical planes, value-identical sign bits)
        # is checkpointed as the band table instead of paying a second
        # corpus-wide Arrow signature pass; the recovery path (no build)
        # still hashes once via corpus_band_keys.
        import time as _time

        from ..operators.ann import corpus_band_keys

        self._built_bands = None
        self._graph, self._committed = self._recover()
        t0 = _time.perf_counter()
        if self._built_bands is not None:
            self.bands = self._built_bands.localCheckpoint(eager=True)
        else:
            self.bands = corpus_band_keys(
                self.base, n_planes=n_planes, band_bits=band_bits,
                seed=seed, dim=self.dim, id_col=id_col, vec_col=vec_col,
            ).localCheckpoint(eager=True)
        self.band_secs = _time.perf_counter() - t0

    # -- durability plumbing ------------------------------------------
    def _publish(
        self, graph: DataFrame, touched: DataFrame | None, batch_id: int
    ) -> None:
        """Delta-publish through the log (base only on first commit or
        when the log's compaction policy fires), timing the durability
        tax for the bench split."""
        import time

        t0 = time.perf_counter()
        mode = self.log.publish(graph, touched, batch_id)
        el = time.perf_counter() - t0
        self.publish_secs += el
        self.publish_modes.append((mode, round(el, 3)))
        self._committed = batch_id

    def _recover(self) -> tuple[DataFrame, int]:
        """Fold the latest committed (base, deltas); on first start,
        build the base graph and commit it as batch -1 (so even a crash
        before the first micro-batch recovers without a rebuild)."""
        g, m = self.log.recover()
        if m is not None:
            return (
                g.coalesce(32).localCheckpoint(eager=True),
                m["committed"],
            )
        import time as _time

        from ..operators.ann import knn_graph_build

        t0 = _time.perf_counter()
        g, self._built_bands = knn_graph_build(
            self.base, k=self.k, n_planes=self.n_planes,
            band_bits=self.band_bits, rounds=self.rounds,
            seed=self.seed, dim=self.dim,
            id_col=self.id_col, vec_col=self.vec_col,
            return_bands=True,
        )
        g = g.coalesce(32).localCheckpoint(eager=True)
        self.base_build_secs = _time.perf_counter() - t0
        self._publish(g, None, -1)
        return g, -1

    # -- streaming surface --------------------------------------------
    def ingest_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: replay-guarded insert + delta commit."""
        from ..operators.ann import knn_graph_insert

        if batch_df.isEmpty():
            return
        if batch_id <= self._committed:
            return  # replayed batch already in the committed snapshot
        import time as _time

        t0 = _time.perf_counter()
        updated, touched = knn_graph_insert(
            self._graph, self.base, batch_df, k=self.k,
            n_planes=self.n_planes, band_bits=self.band_bits,
            seed=self.seed, dim=self.dim, id_col=self.id_col,
            vec_col=self.vec_col, corpus_bands=self.bands,
            with_touched=True,
        )
        # iterative-loop rules: re-coalesce before each checkpoint or
        # unionByName SUMS partition counts across batches
        self._graph = updated.coalesce(32).localCheckpoint(eager=True)
        self.insert_secs += _time.perf_counter() - t0
        self.n_batches += 1
        self._publish(self._graph, touched, batch_id)

    def run_availablenow(self, source_glob: str, schema) -> DataFrame:
        """Drain all available source files through the replay-guarded
        ingest (maxFilesPerTrigger=1 so foreachBatch fires per file) and
        return the grown adjacency. The source checkpoint lives under
        the same state_dir, so a restarted run skips already-ingested
        files AND recovers the matching graph snapshot."""
        import time as _time

        t0 = _time.perf_counter()
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
        self.drain_secs += _time.perf_counter() - t0
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
    grown adjacency is persisted per micro-batch next to the stream's
    source checkpoint, so this row certifies the DURABLE deployment
    form, and restart recovery is pinned separately in
    tests/test_streaming.py. Round 11: the per-batch persist is the
    bounded DELTA publish of ``operators.graph_delta`` (touched srcs
    only + atomic marker), not a full-index rewrite — publish IO now
    scales with the batch, not the index. Each invocation uses a fresh
    state_dir (invocation-counted) so bench trials measure a full cold
    deployment, not a recovery no-op."""
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
    #
    # Source files are STAGED ONCE per (fixture, n_new, n_files) and
    # shared across invocations (VERDICT r12 #7): in the deployment this
    # row measures, the stream's source files arrive from OUTSIDE — the
    # write that creates them is harness scaffolding, not index work, so
    # repeated bench trials must not re-pay it inside the timed region.
    # The STATE dir stays invocation-fresh: every trial still runs the
    # full cold deployment (band hash + base build + per-batch ingest +
    # publish + serve) against the pre-existing source.
    path = os.path.join(
        pid_scratch("graph_ingest_src", sf_dir),
        f"staged_n{n_new}_f{n_files}",
    )
    state_dir = os.path.join(
        pid_scratch("graph_ingest_state", sf_dir), f"inv{_INGEST_INVOCATION}"
    )
    shutil.rmtree(state_dir, ignore_errors=True)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        new_rows.repartition(n_files).write.mode("overwrite").parquet(path)
    ingest = DurableGraphIngest(
        base, state_dir, k=k, n_planes=n_planes, band_bits=band_bits,
        seed=42, dim=dim, rounds=2,
    )
    grown = ingest.run_availablenow(
        os.path.join(path, "*.parquet"), new_rows.schema
    )
    LAST_INGEST_STATS.clear()
    LAST_INGEST_STATS.update(
        publish_s=round(ingest.publish_secs, 3),
        modes=ingest.publish_modes,
        # phase breakdown (VERDICT r11 #6): band hash + base build happen
        # at construction; insert_s is the summed per-batch graph work;
        # drain_s - insert_s - (delta publishes) is the streaming
        # engine's per-trigger scheduling floor x n_batches
        band_s=round(ingest.band_secs, 3),
        base_build_s=round(ingest.base_build_secs, 3),
        insert_s=round(ingest.insert_secs, 3),
        drain_s=round(ingest.drain_secs, 3),
        n_batches=ingest.n_batches,
    )
    probes = emb.filter(F.col("vec_id") < n_probes).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    # r14: the serve's LSH entry join needs the GROWN corpus's band table
    # = the ingest's checkpointed base bands ∪ the (bounded) new rows'
    # bands via the JVM fold — instead of re-hashing the whole corpus
    # with a second Arrow pass per serve (value-identical banding)
    from ..operators.ann import bounded_band_keys

    grown_bands = ingest.bands.unionByName(
        bounded_band_keys(
            new_rows, n_planes=n_planes, band_bits=band_bits, seed=42,
            dim=dim,
        )
    )
    return knn_graph_serve(
        grown, emb, probes, k=serve_k, beam=beam,
        rounds=serve_rounds, entries="lsh", n_planes=n_planes,
        band_bits=band_bits, seed=42, dim=dim,
        corpus_bands=grown_bands,
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
    micro-batches is certified against the one-batch serve oracle.

    Round 12 (VERDICT r11 #4): the per-batch serve goes through
    :class:`GraphIndexServer` — the ONE graph serve path — instead of
    assembling ``knn_graph_serve`` params locally; the server also pins
    ``corpus_band_keys`` once at construction, where the old inline call
    re-hashed the whole corpus for LSH entries on EVERY micro-batch."""
    from ..config import EMB_DIM
    from ..operators.ann import knn_graph_build
    from ..sources.catalog import load_table

    dim = EMB_DIM if dim is None else dim
    corpus = load_table(spark, sf_dir, "embeddings").localCheckpoint(
        eager=True
    )
    # r14: the server's LSH entry table reuses the build's band table
    # (one corpus signature pass total, value-identical banding)
    graph, bands = knn_graph_build(
        corpus, k=6, n_planes=n_planes, band_bits=band_bits, rounds=2,
        seed=42, dim=dim, return_bands=True,
    )
    server = GraphIndexServer(
        graph, corpus, k=k, beam=beam, rounds=rounds, dim=dim, seed=42,
        n_planes=n_planes, band_bits=band_bits, corpus_bands=bands,
    )
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
        served.extend(server.serve_batch(batch_df).collect())

    q = (
        probes.writeStream.foreachBatch(_serve)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        served, "probe_id long, vec_id long, rank long, score double"
    )


def run_streaming_semantic_dedup_availablenow(
    spark: SparkSession,
    sf_dir: str,
    n_new: int = 100,
    threshold: float = 0.3,
    n_planes: int = 32,
    band_bits: int = 8,
    dim: int | None = None,
    n_files: int = 3,
) -> DataFrame:
    """Ingestion-time SEMANTIC dedup as a stream (round 13 — the online
    half of ``d_embedding_persist_incr``): the corpus' embedding-LSH
    index is the STANDING ASSET (``embedding_index_write``, staged once
    per fixture — it is read-only at serve time and its content is a
    pure function of (corpus, knobs), so re-building it per invocation
    would be harness waste, not index work), and each arriving delivery
    (``n_new`` newest vectors drained as ``n_files`` parquet files with
    maxFilesPerTrigger=1, so ``foreachBatch`` really fires per file)
    probes the on-disk band table at O(batch) cost
    (``embedding_probe_pairs``) and emits its near-dup matches against
    the corpus.

    Batching-invariance is structural: a probe row's matches depend only
    on that row and the STATIC index — no cross-batch state — so the
    union over micro-batches equals the one-shot probe of all new rows
    however the file source batches them, and THAT is what the DuckDB
    oracle replays (``s_semantic_dedup_ingest``). Matches accumulate on
    the driver only as the test harness's memory sink (they are
    match-sized, not corpus-sized); a deployment writes each batch's
    pairs to its sink inside the same callback — the quarantine/reject
    step of a streaming corpus build."""
    import os

    from ..config import EMB_DIM
    from ..operators.dedup import embedding_index_write, embedding_probe_pairs
    from ..sources.catalog import load_table
    from ..utils import pid_scratch

    dim = EMB_DIM if dim is None else dim
    emb = load_table(spark, sf_dir, "embeddings")
    # the staged dir is keyed by EVERY knob the index content depends on
    # (ADVICE r13: keyed by n_new alone, a same-process call with other
    # banding knobs silently probed a mismatched plane bank — band keys
    # simply failed to collide, pairs went missing with no error)
    idx_path = os.path.join(
        pid_scratch("semdedup_idx", sf_dir),
        f"idx_n{n_new}_p{n_planes}b{band_bits}d{dim}",
    )
    if not os.path.exists(os.path.join(idx_path, "vecs", "_SUCCESS")):
        embedding_index_write(
            emb.filter(F.col("vec_id") >= n_new),
            "embedding", "vec_id", idx_path,
            n_planes=n_planes, band_bits=band_bits, dim=dim,
        )
    src_path = os.path.join(
        pid_scratch("semdedup_src", sf_dir), f"staged_n{n_new}_f{n_files}"
    )
    if not os.path.exists(os.path.join(src_path, "_SUCCESS")):
        emb.filter(F.col("vec_id") < n_new).repartition(
            n_files
        ).write.mode("overwrite").parquet(src_path)
    deliveries = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_path, "*.parquet"))
    )
    matched: list = []

    def _probe(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matched.extend(
            embedding_probe_pairs(
                spark, idx_path, batch_df, "embedding", "vec_id",
                threshold=threshold, n_planes=n_planes,
                band_bits=band_bits, dim=dim,
            ).collect()
        )

    q = (
        deliveries.writeStream.foreachBatch(_probe)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        matched, "new_id long, corpus_id long, cos double"
    )


# invocation counter for run_streaming_semantic_dedup_admit_availablenow:
# the admit loop MUTATES its index (deliveries join the corpus), so each
# invocation deploys a fresh index dir — reuse would leak admitted rows
# into the next trial's base state
_ADMIT_INVOCATION = 0


def semantic_admit_batch(
    spark: SparkSession,
    idx_path: str,
    batch_df: DataFrame,
    batch_id: int,
    threshold: float,
    n_planes: int,
    band_bits: int,
    dim: int,
) -> list:
    """ONE dedup-then-admit step, replay-idempotent by construction —
    the body of the streaming loop's ``foreachBatch`` callback, exposed
    so the crash-injection test (tests/test_embedding_persist.py) can
    drive the exact at-least-once window a real sink has.

    The probe is windowed to deltas admitted STRICTLY BEFORE this batch
    (``max_batch_id=batch_id``) and the insert commits under this
    batch's own id with overwrite semantics
    (``embedding_index_insert(batch_id=...)``), so a replayed delivery —
    crash after the insert committed but before the source checkpoint
    did — probes the identical admitted-before set (it cannot see its
    own delta) and its re-insert replaces rather than duplicates. The
    emitted PAIR LIST is therefore a pure function of (batch, batch_id,
    index state below batch_id): same pairs on every replay."""
    from ..operators.dedup import embedding_index_insert, embedding_probe_pairs

    batch_df = batch_df.localCheckpoint(eager=True)  # probe + insert
    pairs = embedding_probe_pairs(
        spark, idx_path, batch_df, "embedding", "vec_id",
        threshold=threshold, n_planes=n_planes, band_bits=band_bits,
        dim=dim, max_batch_id=batch_id,
    ).collect()
    embedding_index_insert(
        batch_df, "embedding", "vec_id", idx_path,
        n_planes=n_planes, band_bits=band_bits, dim=dim,
        batch_id=batch_id,
    )
    return pairs


def run_streaming_semantic_dedup_admit_availablenow(
    spark: SparkSession,
    sf_dir: str,
    n_new: int = 90,
    batch_rows: int = 30,
    threshold: float = 0.3,
    n_planes: int = 32,
    band_bits: int = 8,
    dim: int | None = None,
    compact_every: int | None = None,
) -> DataFrame:
    """The full DEDUP-THEN-ADMIT ingest loop (round 13): every delivery
    first probes the persisted index for near-dups against EVERYTHING
    ADMITTED SO FAR (base corpus ∪ earlier deliveries), then is admitted
    itself (``embedding_index_insert`` — O(batch) band/vec appends).
    Later deliveries therefore dedup against earlier ones — the
    cross-delivery duplicate class the static-index row
    (``s_semantic_dedup_ingest``) is blind to by design.

    Delivery ORDER is part of the semantics here (a pair (n, c) is
    emitted iff c was admitted before n's delivery), so the stream's
    batching is pinned, not assumed: each delivery is staged as ONE
    parquet file with strictly increasing mtimes (the file source orders
    by modification time; maxFilesPerTrigger=1 makes batch i == delivery
    i), and delivery membership is a pure function of the id
    (vec_id DIV batch_rows) — which is exactly what the DuckDB oracle
    replays: matches where batch(c) = -1 (base) OR batch(c) < batch(n).

    Restart safety is structural, not assumed (round 14 — the r13 claim
    that plain appends were pair-idempotent was FALSE for the vecs side):
    each step runs :func:`semantic_admit_batch`, which probes deltas
    STRICTLY BELOW its own ``foreachBatch`` id and commits its insert
    UNDER that id with overwrite semantics — a replayed delivery (crash
    after the insert committed, before the checkpoint did) re-emits the
    identical pair list and its re-insert replaces its own delta instead
    of duplicating vec rows. Pinned by the crash-injection test in
    tests/test_embedding_persist.py.

    ``compact_every=k`` folds the delta log into a new base generation
    after every k-th admitted delivery (round 14), always with
    ``upto_batch_id`` = the CURRENT batch id — the current delivery's
    own delta is excluded because its source checkpoint has not
    committed yet (folding it would bake rows a replay's windowed probe
    could no longer exclude). Compaction is value-invisible by contract:
    the loop's emitted pairs are identical with or without it (pinned
    in pytest); it only trades delta-read fan-in for an O(index)
    rewrite."""
    import os
    import shutil

    from ..config import EMB_DIM
    from ..operators.dedup import embedding_index_write
    from ..sources.catalog import load_table
    from ..utils import pid_scratch

    dim = EMB_DIM if dim is None else dim
    emb = load_table(spark, sf_dir, "embeddings")
    # ceil: a trailing partial delivery still ships (ADVICE r13 — floor
    # silently dropped the tail rows the oracle still expects)
    n_files = -(-n_new // batch_rows)
    global _ADMIT_INVOCATION
    _ADMIT_INVOCATION += 1
    idx_path = os.path.join(
        pid_scratch("semadmit_idx", sf_dir), f"inv{_ADMIT_INVOCATION}"
    )
    shutil.rmtree(idx_path, ignore_errors=True)
    embedding_index_write(
        emb.filter(F.col("vec_id") >= n_new),
        "embedding", "vec_id", idx_path,
        n_planes=n_planes, band_bits=band_bits, dim=dim,
    )
    src_path = os.path.join(
        pid_scratch("semadmit_src", sf_dir),
        f"staged_n{n_new}_b{batch_rows}",
    )
    if not os.path.exists(os.path.join(src_path, "_STAGED")):
        os.makedirs(src_path, exist_ok=True)
        for i in range(n_files):
            tmp = os.path.join(src_path, f"_tmp{i}")
            emb.filter(
                F.expr(f"vec_id DIV {batch_rows}") == i
            ).filter(F.col("vec_id") < n_new).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = next(
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            )
            dst = os.path.join(src_path, f"delivery_{i}.parquet")
            shutil.move(os.path.join(tmp, part), dst)
            shutil.rmtree(tmp)
            # strictly increasing mtimes pin the file-source order
            os.utime(dst, (1700000000 + i * 60, 1700000000 + i * 60))
        open(os.path.join(src_path, "_STAGED"), "w").close()
    deliveries = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_path, "*.parquet"))
    )
    matched: list = []

    def _probe_then_admit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        matched.extend(
            semantic_admit_batch(
                spark, idx_path, batch_df, batch_id,
                threshold, n_planes, band_bits, dim,
            )
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            from ..operators.dedup import embedding_index_compact

            embedding_index_compact(
                spark, idx_path, upto_batch_id=batch_id
            )

    q = (
        deliveries.writeStream.foreachBatch(_probe_then_admit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(idx_path, ignore_errors=True)
    return spark.createDataFrame(
        matched, "new_id long, corpus_id long, cos double"
    )
