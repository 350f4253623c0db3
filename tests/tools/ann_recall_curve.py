"""Recall-vs-cost curves for the ANN operators on the planted corpus
(VERDICT r9 #5). Sweeps each operator's quality dial against the exact
brute-force top-k and records recall@10 plus the dial's cost measure
(fraction of the corpus scored / candidates reranked) and wall time.

Run SOLO:  python tests/tools/ann_recall_curve.py [out.json]
Writes artifacts/round10/ann_recall_curve.json by default.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from tools.planted_corpus import (  # noqa: E402
    N_CLUSTERS,
    NOISE,
    PER_CLUSTER,
    write_planted_embeddings,
)


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "artifacts", "round10", "ann_recall_curve.json")
    )
    from google_cloud_ecommerce_spark.operators import similarity as S
    from google_cloud_ecommerce_spark.session import get_spark

    spark = get_spark(app_name="ann_recall_curve")
    d = write_planted_embeddings(tempfile.mkdtemp(prefix="planted_curve_"))
    n_vecs = N_CLUSTERS * PER_CLUSTER

    def pairs(df):
        return {(r.q_id, r.neighbor_id) for r in df.collect()}

    exact = pairs(S.similarity_topk(spark, d))

    def measure(fn):
        t0 = time.monotonic()
        got = pairs(fn())
        return {
            "recall_at_10": round(len(got & exact) / len(exact), 4),
            "wall_s": round(time.monotonic() - t0, 3),
        }

    n_cells = S.CENTROID_HI - S.CENTROID_LO
    curves: dict[str, list[dict]] = {
        "ivf": [
            {
                "n_probe": p,
                "cost_frac": round(p / n_cells, 4),
                **measure(lambda: S.similarity_ivf_topk(spark, d, n_probe=p)),
            }
            for p in (1, 2, 4, 8, 16)
        ],
        "multiprobe": [
            {
                "n_extra_probes": e,
                "cost_buckets": 1 + e,
                **measure(
                    lambda: S.similarity_multiprobe_topk(spark, d, n_extra_probes=e)
                ),
            }
            for e in (0, 1, 3, 7, 15)
        ],
        "binary": [
            {
                "n_candidates": c,
                "rerank_frac": round(c / n_vecs, 4),
                **measure(
                    lambda: S.similarity_binary_topk(spark, d, n_candidates=c)
                ),
            }
            for c in (5, 10, 25, 50, 100)
        ],
        "lsh": [
            {"buckets": 1, **measure(lambda: S.similarity_lsh_topk(spark, d))}
        ],
    }
    doc = {
        "corpus": {
            "n_clusters": N_CLUSTERS,
            "per_cluster": PER_CLUSTER,
            "noise_norm": NOISE,
            "n_vecs": n_vecs,
        },
        "defaults": {
            "ivf_n_probe": S.N_PROBE,
            "multiprobe_n_extra": S.N_EXTRA_PROBES,
            "binary_n_candidates": S.BQ_CANDIDATES,
        },
        "curves": curves,
    }
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(doc, fh, indent=2)
    print(json.dumps(doc))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
