"""Planted-neighbor clustered embedding fixture (VERDICT r9 #5).

The driver's synthetic embeddings are near-random, so ANN recall@10 on
them is 0.04-0.16 BY CONSTRUCTION — fine for monotonicity tests,
useless for judging whether the approximate operators find real
neighbors. This generator plants the structure real embedding corpora
have: N_CLUSTERS unit-sphere centroids, PER_CLUSTER members each =
unit(centroid + noise), so a query's true top-k are overwhelmingly its
same-cluster siblings and a healthy ANN operator should recover most
of them at its default dial.

Layout matches the testdata embeddings table exactly (vec_id int64,
embedding list<float>, label int32 = cluster id), and the id scheme
cooperates with the operators' fixture literals:
  - cluster(vec_id) = vec_id % N_CLUSTERS, so queries (vec_id < 5) sit
    in clusters 0..4 with PER_CLUSTER-1 planted same-cluster neighbors;
  - the IVF seed vectors (vec_id 100..115) land one per cluster 0..15,
    i.e. near their own cluster's centroid — the cell structure mirrors
    the planted structure, which is precisely the regime IVF assumes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_CLUSTERS = 20
PER_CLUSTER = 50
DIM = 64
# total noise-vector norm ~ NOISE (per-dim std NOISE/sqrt(DIM)): members
# sit at cosine ~ 1/sqrt(1+NOISE^2) ~ 0.94 to their centroid while
# cross-cluster cosines stay near-random — clusters exist but the
# problem isn't trivial (bucket/sign boundaries still cut clusters)
NOISE = 0.35
SEED = 20260816


def write_planted_embeddings(out_dir: str) -> str:
    """Write embeddings.parquet under out_dir; returns out_dir (usable
    as an sf_dir for every similarity operator)."""
    rng = np.random.RandomState(SEED)
    cents = rng.randn(N_CLUSTERS, DIM)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    n = N_CLUSTERS * PER_CLUSTER
    ids = np.arange(n, dtype=np.int64)
    cluster = (ids % N_CLUSTERS).astype(np.int32)
    vecs = cents[cluster] + (NOISE / np.sqrt(DIM)) * rng.randn(n, DIM)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(cluster, type=pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir
