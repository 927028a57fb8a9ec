"""Graph-index LIFECYCLE maintenance: long-run insert/delete churn with
an executable compaction policy (VERDICT r9 next #2).

``knn_graph_insert``/``knn_graph_delete`` certify single maintenance
batches; a deployment applies them for months. Each incremental step is
slightly lossier than a fresh build — inserted nodes never receive
NN-descent refinement, and delete repair pools draw from banded
candidates plus surviving neighbors only — so graph quality DECAYS
monotonically with cumulative churn (measured decay curve in SCALING.md
round 10). The fix every HNSW-class deployment uses is periodic
compaction: rebuild on the surviving corpus once enough of it has
churned. :class:`GraphMaintainer` makes that policy executable: it
tracks the churned-row fraction since the last full build and rebuilds
when it crosses ``compact_churn_frac``.

Why a churn-fraction trigger rather than a recall trigger: recall needs
ground truth the deployment doesn't have online. The measured decay
curve maps churn fraction to edge/serve recall on clustered data (the
HNSW contract workload), so the fraction is the observable PROXY for the
recall floor — the pytest in tests/test_ann.py pins both directions
(recall stays >= the floor across a churn sequence WITH compaction and
falls below it WITHOUT).

All state transitions reuse the certified operators unchanged; the
corpus band table is maintained incrementally (append on insert, filter
on delete) so no step re-hashes the corpus — the persisted-band-table
contract of the 100 TB deployment. Reference counterpart: the mutable
``condition_vec`` catalog (rows accrete per condition,
``nl_targeting_save.py:139-146``) served by a long-lived index.

DURABILITY (VERDICT r10 next #4 — the round-10 maintainer was
driver-memory only; a crash mid-churn lost the maintained index): pass
``state_dir=`` and every maintenance op commits through the same
``operators.graph_delta`` log the streaming ingest uses —

- graph: base snapshot at init/compaction, bounded DELTA per
  insert/delete (the op's touched-src set, incl. zero-row tombstones);
- corpus: full snapshot at base commits only (compaction already pays
  O(n) for the rebuild, so the snapshot doesn't change the
  asymptotics), bounded mutation logs (``cadd-b*``/``cdel-b*``)
  between — recovery replays them in op order;
- counters + config (churned, n, compactions, op sequence, k/planes/
  seed/...): the marker's ``extra`` dict, advanced by the SAME atomic
  rename as the graph commit, so a crash between any two ops recovers
  the exact pre-op state (op-atomic: an op either fully committed or
  never happened);
- bands: NOT persisted — ``corpus_band_keys`` is a pure per-row
  function of (corpus, seeded planes), so recovery recomputes the
  identical table in one Arrow pass over the recovered corpus (same
  cost class as reading a persisted copy; steady-state ops still
  never re-hash).

``GraphMaintainer.recover(spark, state_dir)`` reconstructs the whole
maintained state; the restart test kills after a delete and before a
compaction and pins edge-set equality + counter preservation.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class GraphMaintainer:
    """Long-lived k-NN-graph index over a mutable corpus.

    Holds the current (corpus, adjacency, band-table) triple, applies
    bounded maintenance batches through the certified incremental
    operators, and compacts (full rebuild on survivors) when the
    cumulative churned fraction since the last build crosses
    ``compact_churn_frac``. Every relation is re-coalesced and
    localCheckpoint'ed per step (the iterative-loop lineage rule —
    unionByName otherwise SUMS partition counts across rounds)."""

    def __init__(
        self,
        corpus: DataFrame,
        dim: int,
        k: int = 6,
        n_planes: int = 24,
        band_bits: int = 6,
        seed: int = 42,
        build_rounds: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        compact_churn_frac: float = 0.5,
        coalesce_to: int = 32,
        state_dir: str | None = None,
    ) -> None:
        from .ann import knn_graph_build

        self.dim = dim
        self.k = k
        self.n_planes = n_planes
        self.band_bits = band_bits
        self.seed = seed
        self.build_rounds = build_rounds
        self.id_col = id_col
        self.vec_col = vec_col
        self.compact_churn_frac = compact_churn_frac
        self._coalesce = coalesce_to
        self._init_durability(corpus.sparkSession, state_dir)
        self.corpus = (
            corpus.select(id_col, vec_col)
            .coalesce(coalesce_to)
            .localCheckpoint(eager=True)
        )
        self._n = self.corpus.count()
        self._churned = 0
        self.compactions = 0
        self._op_seq = 0
        self._kw = dict(
            k=k, n_planes=n_planes, band_bits=band_bits, seed=seed, dim=dim,
            id_col=id_col, vec_col=vec_col,
        )
        # r14: the build's band table doubles as the maintainer's band
        # table (identical planes — one corpus signature pass instead of
        # two; corpus_band_keys stays the recovery-path source)
        g, bands = knn_graph_build(
            self.corpus, rounds=build_rounds, return_bands=True, **self._kw
        )
        self.graph = g.coalesce(coalesce_to).localCheckpoint(eager=True)
        self.bands = bands.coalesce(coalesce_to).localCheckpoint(eager=True)
        if self._log is not None:
            self._commit_base()

    # -- durability plumbing ----------------------------------------------
    def _init_durability(self, spark, state_dir: str | None) -> None:
        from .graph_delta import GraphDeltaLog

        self.state_dir = state_dir
        if state_dir is None:
            self._log = None
            return
        self._spark = spark
        self._ops_dir = os.path.join(state_dir, "ops")
        os.makedirs(self._ops_dir, exist_ok=True)
        # the maintainer's own churn policy decides when to fold, so the
        # log never auto-compacts underneath it
        self._log = GraphDeltaLog(
            spark, os.path.join(state_dir, "graph"),
            compact_rows_frac=float("inf"), max_deltas=1 << 30,
        )
        self._ops: list = []  # [("add"|"del", op_id), ...] since last base

    def _extra(self) -> dict:
        return {
            "churned": self._churned,
            "n": self._n,
            "compactions": self.compactions,
            "op_seq": self._op_seq,
            "ops": self._ops,
            "corpus_base": self._corpus_base,
            "config": {
                "dim": self.dim, "k": self.k, "n_planes": self.n_planes,
                "band_bits": self.band_bits, "seed": self.seed,
                "build_rounds": self.build_rounds, "id_col": self.id_col,
                "vec_col": self.vec_col,
                "compact_churn_frac": self.compact_churn_frac,
                "coalesce_to": self._coalesce,
            },
        }

    def _commit_base(self) -> None:
        """Full (corpus, graph) snapshot + marker — init and compaction
        only; both already pay O(n) (the build), so the snapshot keeps
        the asymptotics."""
        oid = self._op_seq
        cpath = os.path.join(self._ops_dir, f"corpus-b{oid}")
        self.corpus.write.mode("overwrite").parquet(cpath)
        self._corpus_base = oid
        self._ops = []
        self._log.publish(self.graph, None, oid, extra=self._extra(),
                          mode="base")
        self._gc_ops()

    def _commit_op(self, kind: str, mutation: DataFrame,
                   touched: DataFrame) -> None:
        """Bounded per-op commit: the corpus mutation log + the graph
        delta + counters, made visible by ONE atomic marker rename —
        crash anywhere before it and the op never happened."""
        oid = self._op_seq
        mpath = os.path.join(
            self._ops_dir, f"c{kind}-b{oid}"
        )
        mutation.coalesce(1).write.mode("overwrite").parquet(mpath)
        self._ops = self._ops + [[kind, oid]]
        self._log.publish(
            self.graph, touched, oid, extra=self._extra(), mode="delta"
        )
        self._gc_ops()

    def _gc_ops(self) -> None:
        """Reap ops/corpus dirs the marker no longer references —
        superseded logs after a compaction and orphans from crashes."""
        live = {f"corpus-b{self._corpus_base}"} | {
            f"c{kind}-b{oid}" for kind, oid in self._ops
        }
        for d in os.listdir(self._ops_dir):
            if d not in live:
                shutil.rmtree(
                    os.path.join(self._ops_dir, d), ignore_errors=True
                )

    @classmethod
    def recover(cls, spark, state_dir: str) -> "GraphMaintainer":
        """Reconstruct the EXACT maintained state from the durable log:
        graph = base+deltas fold; corpus = corpus snapshot + mutation
        logs replayed in op order; counters/config from the marker;
        bands recomputed (pure function of the recovered corpus)."""
        from .ann import corpus_band_keys
        from .graph_delta import GraphDeltaLog

        log = GraphDeltaLog(spark, os.path.join(state_dir, "graph"))
        m = log.read_marker()
        if m is None:
            raise FileNotFoundError(f"no durable maintainer state in {state_dir}")
        ex = m["extra"]
        cfg = ex["config"]
        self = cls.__new__(cls)
        self.dim = cfg["dim"]
        self.k = cfg["k"]
        self.n_planes = cfg["n_planes"]
        self.band_bits = cfg["band_bits"]
        self.seed = cfg["seed"]
        self.build_rounds = cfg["build_rounds"]
        self.id_col = cfg["id_col"]
        self.vec_col = cfg["vec_col"]
        self.compact_churn_frac = cfg["compact_churn_frac"]
        self._coalesce = cfg["coalesce_to"]
        self._init_durability(spark, state_dir)
        self._churned = ex["churned"]
        self._n = ex["n"]
        self.compactions = ex["compactions"]
        self._op_seq = ex["op_seq"]
        self._ops = [tuple(o) for o in ex["ops"]]
        self._corpus_base = ex["corpus_base"]
        self._kw = dict(
            k=self.k, n_planes=self.n_planes, band_bits=self.band_bits,
            seed=self.seed, dim=self.dim, id_col=self.id_col,
            vec_col=self.vec_col,
        )
        corpus = spark.read.parquet(
            os.path.join(self._ops_dir, f"corpus-b{self._corpus_base}")
        )
        for kind, oid in self._ops:
            opath = os.path.join(self._ops_dir, f"c{kind}-b{oid}")
            if kind == "add":
                corpus = corpus.unionByName(spark.read.parquet(opath))
            else:
                dl = spark.read.parquet(opath)
                corpus = corpus.join(
                    F.broadcast(dl),
                    corpus[self.id_col] == dl[dl.columns[0]],
                    "left_anti",
                )
        self.corpus = (
            corpus.select(self.id_col, self.vec_col)
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self.graph = (
            log.fold(m).coalesce(self._coalesce).localCheckpoint(eager=True)
        )
        self.bands = (
            corpus_band_keys(
                self.corpus, n_planes=self.n_planes,
                band_bits=self.band_bits, seed=self.seed, dim=self.dim,
                id_col=self.id_col, vec_col=self.vec_col,
            )
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self._ops = list(self._ops)
        return self

    # -- observability ---------------------------------------------------
    @property
    def churn_frac(self) -> float:
        """Cumulative churned rows (inserts + deletes) since the last
        full build, as a fraction of the CURRENT corpus size — the
        observable proxy the compaction policy triggers on."""
        return self._churned / max(self._n, 1)

    # -- maintenance batches ----------------------------------------------
    def insert(self, new_rows: DataFrame) -> None:
        """Link a bounded batch of new vectors in (``knn_graph_insert``
        against the CURRENT corpus — earlier inserts are full candidates
        for later batches via the maintained band table)."""
        from .ann import bounded_band_keys, knn_graph_insert

        batch = (
            new_rows.select(self.id_col, self.vec_col)
            .localCheckpoint(eager=True)
        )
        b = batch.count()
        if b == 0:
            return
        updated, touched = knn_graph_insert(
            self.graph, self.corpus, batch,
            corpus_bands=self.bands, with_touched=True, **self._kw,
        )
        self.graph = (
            updated
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self.corpus = (
            self.corpus.unionByName(batch)
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        # r14: the batch is bounded by the maintenance contract — the
        # JVM-fold banding (no Arrow stage crossing) is the right tool,
        # exactly as knn_graph_insert's own batch side already hashes;
        # sign bits agree with the Arrow path except |dot| ≲ 1e-14 (the
        # documented LSH bucketing channel)
        self.bands = (
            self.bands.unionByName(
                bounded_band_keys(
                    batch, n_planes=self.n_planes, band_bits=self.band_bits,
                    seed=self.seed, dim=self.dim,
                    id_col=self.id_col, vec_col=self.vec_col,
                )
            )
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self._n += b
        self._churned += b
        if self._log is not None:
            self._op_seq += 1
            self._commit_op("add", batch, touched)

    def delete(self, del_ids: DataFrame) -> None:
        """Tombstone + repair a bounded batch of removals
        (``knn_graph_delete`` with the maintained band table — survivors
        are filtered, never re-hashed)."""
        from .ann import knn_graph_delete

        dl = (
            del_ids.select(F.col(del_ids.columns[0]).alias("did"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        d = dl.count()
        if d == 0:
            return
        updated, touched = knn_graph_delete(
            self.graph, self.corpus, dl,
            corpus_bands=self.bands, with_touched=True, **self._kw,
        )
        self.graph = (
            updated
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self.corpus = (
            self.corpus.join(
                F.broadcast(dl),
                self.corpus[self.id_col] == dl["did"],
                "left_anti",
            )
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self.bands = (
            self.bands.join(
                F.broadcast(dl), self.bands["id"] == dl["did"], "left_anti"
            )
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self._n -= d
        self._churned += d
        if self._log is not None:
            self._op_seq += 1
            self._commit_op("del", dl, touched)

    # -- compaction policy --------------------------------------------------
    def compact(self) -> None:
        """Full rebuild on the surviving corpus — the operation
        ``knn_graph_delete``'s contract prescribes for amortizing
        tombstone decay. Resets the churn counter."""
        from .ann import knn_graph_build

        # r14: the rebuild's band table doubles as the refreshed band
        # table (one corpus signature pass instead of two)
        g, bands = knn_graph_build(
            self.corpus, rounds=self.build_rounds, return_bands=True,
            **self._kw
        )
        self.graph = g.coalesce(self._coalesce).localCheckpoint(eager=True)
        self.bands = (
            bands.coalesce(self._coalesce).localCheckpoint(eager=True)
        )
        self._churned = 0
        self.compactions += 1
        if self._log is not None:
            self._op_seq += 1
            self._commit_base()

    def maybe_compact(self) -> bool:
        """Apply the policy: rebuild when the churned fraction since the
        last build reaches ``compact_churn_frac``. Returns whether a
        compaction ran. Call after each maintenance batch (the rebuild
        cost is amortized over ~compact_churn_frac·n churned rows)."""
        if self.churn_frac >= self.compact_churn_frac:
            self.compact()
            return True
        return False

    # -- serving -----------------------------------------------------------
    def serve(
        self, probes: DataFrame, k: int = 10, beam: int = 8, rounds: int = 2
    ) -> DataFrame:
        """LSH-entry beam search over the CURRENT graph/corpus (one plan
        per probe batch, the GraphIndexServer contract)."""
        from .ann import knn_graph_serve

        return knn_graph_serve(
            self.graph, self.corpus, probes, k=k, beam=beam, rounds=rounds,
            entries="lsh", n_planes=self.n_planes, band_bits=self.band_bits,
            seed=self.seed, dim=self.dim, corpus_bands=self.bands,
            id_col=self.id_col, vec_col=self.vec_col,
        )
