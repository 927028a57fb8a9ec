"""Materialize a REAL-embedding-width variant of a fixture dir (VERDICT
r7 item #1): every float contract in the vector family — the sequential
JVM/DuckDB fold bit-exactness, the numpy pairwise-sum ulp rule, the
HOF-fold cost model — was calibrated on the 64-dim fixture; production
embedding models run 768-3072 dims. This tool emits a sibling fixture
whose ``embeddings.parquet`` is regenerated at a chosen width so the
full vector-family registry can run through ``tools/parity.py`` at that
width:

    python tools/make_dim_fixtures.py 768
    SPARK_GRAFT_EMB_DIM=768 python tools/parity.py /root/repo/.scratch/sf0.01_d768

(the env var re-registers the whole registry — Spark queries AND DuckDB
oracles — at the new width; see vector_search_spark/config.py).

Generation recipe (deterministic, clustered):

- vec_id + label columns are copied from the base table (same row count,
  same probe ids, same label blocking for d_embedding_neardup).
- Per label, a unit-norm center c_l; per row, a unit-norm noise vector;
  v = normalize(0.7*c_label + sqrt(1-0.49)*noise), float32. Same-label
  expected cosine ≈ 0.49, cross-label ≈ 0 — CLUSTERED, unlike the
  near-uniform base fixture, because at 768 dims uniform cosines
  concentrate at ±1/sqrt(768) ≈ 0.036 and every threshold row
  (v_threshold_group_max ≥ 0.3, v_brp_lsh_neighbors > 0.155,
  d_embedding_neardup ≥ 0.3) would degenerate to empty-vs-empty
  comparisons. Cluster structure keeps those rows discriminating and
  gives the recall-floor gates (v_ivf_kmeans_knn) real structure.
- All other tables are symlinked to the base fixture (both engines
  follow symlinks; documents/events content is width-independent).

Vectors are generated with seeded numpy (RNG streams keyed on label /
vec_id, independent of row order) and written via pyarrow as ONE file,
matching the driver's fixture layout.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
ALPHA = 0.7  # center weight; same-label E[cos] ~ ALPHA^2


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def make_embeddings(base_path: str, out_path: str, dim: int) -> int:
    t = pq.read_table(base_path, columns=["vec_id", "label"])
    vec_ids = t["vec_id"].to_numpy()
    labels = t["label"].to_numpy()
    beta = float(np.sqrt(1.0 - ALPHA * ALPHA))
    centers = {
        int(l): _unit(np.random.default_rng(1000 + int(l)).standard_normal(dim))
        for l in np.unique(labels)
    }
    vecs = np.empty((len(vec_ids), dim), dtype=np.float32)
    for i, (vid, lab) in enumerate(zip(vec_ids, labels)):
        noise = _unit(
            np.random.default_rng(7_919 * int(vid) + 13).standard_normal(dim)
        )
        vecs[i] = _unit(ALPHA * centers[int(lab)] + beta * noise).astype(
            np.float32
        )
    emb_col = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    out = pa.table(
        {"vec_id": t["vec_id"], "embedding": emb_col, "label": t["label"]}
    )
    pq.write_table(out, out_path)
    return len(vec_ids)


def main() -> None:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(
            REPO, ".scratch", f"{os.path.basename(base.rstrip('/'))}_d{dim}"
        )
    )
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t == "embeddings":
            continue
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    n = make_embeddings(
        os.path.join(base, "embeddings.parquet"),
        os.path.join(out, "embeddings.parquet"),
        dim,
    )
    print(f"embeddings: {n} rows at dim={dim}")
    print(out)


if __name__ == "__main__":
    main()
