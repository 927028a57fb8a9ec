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
"""

from __future__ import annotations

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
    ) -> None:
        from .ann import corpus_band_keys, knn_graph_build

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
        self.corpus = (
            corpus.select(id_col, vec_col)
            .coalesce(coalesce_to)
            .localCheckpoint(eager=True)
        )
        self._n = self.corpus.count()
        self._churned = 0
        self.compactions = 0
        self._kw = dict(
            k=k, n_planes=n_planes, band_bits=band_bits, seed=seed, dim=dim,
            id_col=id_col, vec_col=vec_col,
        )
        self.graph = (
            knn_graph_build(self.corpus, rounds=build_rounds, **self._kw)
            .coalesce(coalesce_to)
            .localCheckpoint(eager=True)
        )
        self.bands = (
            corpus_band_keys(
                self.corpus, n_planes=n_planes, band_bits=band_bits,
                seed=seed, dim=dim, id_col=id_col, vec_col=vec_col,
            )
            .coalesce(coalesce_to)
            .localCheckpoint(eager=True)
        )

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
        from .ann import corpus_band_keys, knn_graph_insert

        batch = (
            new_rows.select(self.id_col, self.vec_col)
            .localCheckpoint(eager=True)
        )
        b = batch.count()
        if b == 0:
            return
        self.graph = (
            knn_graph_insert(
                self.graph, self.corpus, batch,
                corpus_bands=self.bands, **self._kw,
            )
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self.corpus = (
            self.corpus.unionByName(batch)
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
        )
        self.bands = (
            self.bands.unionByName(
                corpus_band_keys(
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
        self.graph = (
            knn_graph_delete(
                self.graph, self.corpus, dl,
                corpus_bands=self.bands, **self._kw,
            )
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

    # -- compaction policy --------------------------------------------------
    def compact(self) -> None:
        """Full rebuild on the surviving corpus — the operation
        ``knn_graph_delete``'s contract prescribes for amortizing
        tombstone decay. Resets the churn counter."""
        from .ann import corpus_band_keys, knn_graph_build

        self.graph = (
            knn_graph_build(self.corpus, rounds=self.build_rounds, **self._kw)
            .coalesce(self._coalesce)
            .localCheckpoint(eager=True)
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
        self._churned = 0
        self.compactions += 1

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
