"""choose_index decision-table tests: replay the recorded evidence
(SCALING.md rounds 6-8, v_ivf_recall_sweep, tests/test_ann.py recall
floors) and assert the chooser picks what the measurements support."""

import pytest

from vector_search_spark.operators.ann import auto_band_bits
from vector_search_spark.operators.index_select import (
    EXACT_MAX_N,
    IVF_RECALL,
    choose_index,
)


def test_small_corpus_exact():
    c = choose_index(50_000, 768, recall_target=0.99)
    assert c.family == "exact"


def test_mutable_corpus_graph_always():
    # the reference's condition_vec pattern: deletes + re-inserts
    c = choose_index(5_000_000, 768, recall_target=0.85, mutable=True)
    assert c.family == "graph"
    assert c.params["band_bits"] == auto_band_bits(5_000_000)
    assert c.params["n_planes"] == c.params["band_bits"] * 4


def test_recall_within_sweep_gets_ivf_with_measured_nprobe():
    # measured sweep: 0.83 / 0.87 / 0.87 at n_probe 1 / 2 / 4
    assert choose_index(10**7, 768, recall_target=0.8).params["n_probe"] == 1
    assert choose_index(10**7, 768, recall_target=0.85).params["n_probe"] == 2
    assert choose_index(10**7, 768, recall_target=0.87).params["n_probe"] == 2
    c = choose_index(10**7, 768, recall_target=0.85)
    assert c.family == "ivf"
    assert 16 <= c.params["n_centroids"] <= 65536


def test_recall_above_ivf_ceiling_gets_graph():
    c = choose_index(10**7, 768, recall_target=0.95)
    assert c.family == "graph"


def test_memory_pressure_pq_then_hamming():
    n, dim = 10**8, 768
    raw = n * dim * 4                      # ~307 GB
    c = choose_index(n, dim, recall_target=0.8,
                     memory_budget_bytes=raw // 10)   # ~31 GB: PQ fits
    assert c.family == "ivf_pq"
    c2 = choose_index(n, dim, recall_target=0.8,
                      memory_budget_bytes=n * 2)      # 0.2 GB: only sketches
    assert c2.family == "hamming"


def test_memory_pressure_with_unreachable_recall_carries_caveat():
    # ADVICE r9 low: the memory branch fires before the recall-ceiling
    # check — a tight budget + recall_target above the measured IVF
    # ceiling must say the target is unreachable, not silently accept it
    n, dim = 10**8, 768
    c = choose_index(n, dim, recall_target=0.95,
                     memory_budget_bytes=(n * dim * 4) // 10)
    assert c.family == "ivf_pq"
    assert any("unreachable" in cv for cv in c.caveats)
    ok = choose_index(n, dim, recall_target=0.85,
                      memory_budget_bytes=(n * dim * 4) // 10)
    assert not any("unreachable" in cv for cv in ok.caveats)


def test_single_qps_is_a_caveat_not_a_family_change():
    a = choose_index(10**7, 768, recall_target=0.85, qps_shape="batch")
    b = choose_index(10**7, 768, recall_target=0.85, qps_shape="single")
    assert a.family == b.family
    assert any("scheduling floor" in c for c in b.caveats)
    assert not any("scheduling floor" in c for c in a.caveats)


def test_bad_args_raise():
    with pytest.raises(ValueError):
        choose_index(1000, 64, recall_target=0.0)
    with pytest.raises(ValueError):
        choose_index(1000, 64, qps_shape="firehose")


def test_boundary_consistency_with_evidence_constants():
    # just above EXACT_MAX_N the exact path must close even at high recall
    c = choose_index(EXACT_MAX_N + 1, 64, recall_target=0.99)
    assert c.family == "graph"
    # at the measured ceiling exactly, IVF still qualifies
    c2 = choose_index(EXACT_MAX_N + 1, 64, recall_target=IVF_RECALL[4])
    assert c2.family == "ivf"
