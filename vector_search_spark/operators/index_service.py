"""VectorIndexService — the ONE composed entry point over the certified
vector-index parts (VERDICT r11 #8): profile → choose → build → serve →
mutate → compact → recover, one object.

The repo ships every piece individually certified — the measured
decision table (:func:`index_select.choose_index`), the per-family
build+serve surface (:func:`index_select.build_choice` /
:class:`index_select.ServingIndex`), the durable mutable-graph
lifecycle (:class:`graph_lifecycle.GraphMaintainer` over
:class:`graph_delta.GraphDeltaLog`). This module is the composition a
real user adopts:

>>> svc = VectorIndexService.open(corpus, dim=64, recall_target=0.9)
>>> answers = svc.serve(probes)            # (probe_id, vec_id, score)
>>> svc.close()

Mutable deployments (the reference's accreting ``condition_vec``
catalog, ``nl_targeting_save.py:139-146``) get the durable graph
lifecycle — inserts/deletes commit through the LSM delta log, churn
triggers compaction, and a crashed process reopens exactly where it
stopped:

>>> svc = VectorIndexService.open(corpus, dim=64, mutable=True,
...                               state_dir="/idx/catalog")
>>> svc.insert(new_rows); svc.delete(dead_ids)
>>> svc.serve(probes)
>>> # process dies; later:
>>> svc2 = VectorIndexService.recover(spark, "/idx/catalog")
>>> svc2.serve(probes)                     # identical post-churn state

Scale shape: every serve is one DataFrame plan per probe BATCH (the
single-probe Spark scheduling floor is documented in
tools/serve_latency.py); maintenance batches are bounded (banded
candidates only); durability IO is O(batch) per commit with O(index)
writes only at compaction. Nothing here adds a new code path — the
facade delegates to the exact surfaces the registry rows certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .index_select import (
    IndexChoice,
    ServingIndex,
    _graph_params as _graph_defaults,
    build_choice,
    choose_index,
)


class _MutableExact:
    """Mutable engine for the chooser's small-corpus EXACT pick: serving
    is one brute-force scan of the CURRENT corpus, so mutation is just
    corpus maintenance (union / anti-join, checkpointed per step). In-
    memory only — durability needs the graph family's delta log, which
    :meth:`VectorIndexService.open` routes to whenever ``state_dir`` is
    passed."""

    def __init__(self, corpus: DataFrame, k: int) -> None:
        self.corpus = corpus.select("vec_id", "embedding").localCheckpoint(
            eager=True
        )
        self.k = k
        self._n0 = self.corpus.count()
        self._churned = 0

    def serve(self, probes: DataFrame) -> DataFrame:
        from .knn import knn

        return knn(self.corpus, probes, k=self.k).select(
            "probe_id", "vec_id", "score"
        )

    def insert(self, new_rows: DataFrame) -> None:
        rows = new_rows.select("vec_id", "embedding")
        self._churned += rows.count()
        self.corpus = (
            self.corpus.unionByName(rows)
            .coalesce(32)
            .localCheckpoint(eager=True)
        )

    def delete(self, del_ids: DataFrame) -> None:
        ids = del_ids.select("vec_id")
        self._churned += ids.count()
        self.corpus = (
            self.corpus.join(ids, "vec_id", "left_anti")
            .coalesce(32)
            .localCheckpoint(eager=True)
        )

    @property
    def churn_frac(self) -> float:
        return self._churned / max(self._n0, 1)


class VectorIndexService:
    """Facade over (chooser, builder, server, maintainer). Construct via
    :meth:`open` or :meth:`recover`, never directly."""

    def __init__(
        self, choice: IndexChoice, engine, k: int, family: str | None = None
    ) -> None:
        self.choice = choice
        # the ENGINE family actually serving (may differ from the
        # chooser's pick when durability forces the graph family —
        # choice keeps the chooser's full reasoning for transparency)
        self.family = family or choice.family
        self._engine = engine  # ServingIndex | GraphMaintainer | _MutableExact
        self.k = k

    # -- lifecycle ------------------------------------------------------
    @classmethod
    def open(
        cls,
        corpus: DataFrame,
        dim: int,
        recall_target: float = 0.9,
        qps_shape: str = "batch",
        mutable: bool = False,
        memory_budget_bytes: int | None = None,
        k: int = 10,
        state_dir: str | None = None,
        index_path: str | None = None,
        graph_params: dict | None = None,
    ) -> "VectorIndexService":
        """Profile the corpus, choose the family from the measured
        decision table, build the index, return the serving service.

        ``mutable=True`` routes to the graph family's durable
        :class:`GraphMaintainer` (pass ``state_dir`` to make churn
        survive restarts via :meth:`recover`); static corpora get the
        chosen family through the shared :class:`ServingIndex` surface
        (``index_path`` persists the IVF index; otherwise adhoc scratch
        reclaimed by :meth:`close`). ``graph_params`` pins the graph
        family's build knobs (k/n_planes/band_bits/rounds) instead of
        the chooser's data-derived defaults — deployments that must
        reproduce a specific banding (or an oracle replay) pass it; the
        pinned values are durably recorded in the maintainer's marker
        like any other config."""
        n = corpus.count()
        choice = choose_index(
            n, dim, recall_target=recall_target, qps_shape=qps_shape,
            mutable=mutable, memory_budget_bytes=memory_budget_bytes,
        )
        if mutable:
            # The chooser can still pick EXACT for a small corpus even
            # when mutable (precedence 1: no index beats one scan — and
            # a scan of the CURRENT corpus is trivially mutable). That
            # in-memory form cannot be durable, so a caller passing
            # state_dir is asking for the graph family's delta-log
            # durability regardless of corpus size.
            if choice.family == "exact" and state_dir is None:
                return cls(choice, _MutableExact(corpus, k), k)
            # graph: the only family with certified durable insert AND
            # delete (chooser precedence 2)
            from .graph_lifecycle import GraphMaintainer

            params = graph_params or (
                choice.params if choice.family == "graph"
                else _graph_defaults(n)
            )
            eng = GraphMaintainer(
                corpus, dim=dim,
                k=params.get("k", 6),
                band_bits=params.get("band_bits", 6),
                n_planes=params.get("n_planes", 24),
                build_rounds=params.get("rounds", 2),
                state_dir=state_dir,
            )
            return cls(choice, eng, k, family="graph")
        return cls(
            choice,
            build_choice(choice, corpus, k=k, dim=dim, index_path=index_path),
            k,
        )

    @classmethod
    def recover(
        cls, spark: SparkSession, state_dir: str, k: int = 10
    ) -> "VectorIndexService":
        """Reopen a durable mutable service exactly where it stopped:
        folds the delta log's (base, deltas) and replays the mutation
        log (GraphMaintainer.recover's certified restart contract)."""
        from .graph_lifecycle import GraphMaintainer

        eng = GraphMaintainer.recover(spark, state_dir)
        choice = choose_index(
            eng.corpus.count(), eng.dim, mutable=True
        )
        return cls(choice, eng, k, family="graph")

    # -- serve ----------------------------------------------------------
    def serve(self, probes: DataFrame) -> DataFrame:
        """Answer one probe batch in one plan: (probe_id, vec_id, score),
        top-k per probe — the uniform contract across families."""
        from .graph_lifecycle import GraphMaintainer

        if isinstance(self._engine, GraphMaintainer):
            return self._engine.serve(probes, k=self.k).select(
                "probe_id", "vec_id", "score"
            )
        return self._engine.serve(probes)

    # -- mutation (mutable services only) -------------------------------
    def _mutable(self):
        if isinstance(self._engine, ServingIndex):
            raise ValueError(
                f"index family {self.family!r} is static — open the "
                "service with mutable=True for insert/delete/compact"
            )
        return self._engine

    def insert(self, new_rows: DataFrame) -> None:
        """Bounded incremental insert; graph services auto-compact when
        cumulative churn crosses the maintainer's policy."""
        m = self._mutable()
        m.insert(new_rows)
        if hasattr(m, "maybe_compact"):
            m.maybe_compact()

    def delete(self, del_ids: DataFrame) -> None:
        """Incremental delete (banded neighbor repair on the graph
        family); same auto-compaction policy."""
        m = self._mutable()
        m.delete(del_ids)
        if hasattr(m, "maybe_compact"):
            m.maybe_compact()

    def compact(self) -> None:
        """Force a compaction (full rebuild on survivors + fresh base
        snapshot in the delta log). No-op for the mutable-exact engine —
        a corpus scan has nothing to compact."""
        m = self._mutable()
        if hasattr(m, "compact"):
            m.compact()

    @property
    def churn_frac(self) -> float:
        return self._mutable().churn_frac

    # -- teardown -------------------------------------------------------
    def close(self) -> None:
        """Reclaim adhoc scratch (static ServingIndex only; durable
        maintainer state is the product — never deleted here)."""
        if isinstance(self._engine, ServingIndex):
            self._engine.close()
