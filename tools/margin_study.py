"""margin_topk with ANN-tier candidates vs its exact brute tier — the
measured backing for the operator's pluggable-candidates claim.

The oracle proves the brute tier's arithmetic; this measures what the
100 TB path (IVF forward candidates) costs in RESULT quality on the
regime margin mining exists for: a clustered corpus (anchors +
σ-noise) where the query's true alignment is its own cluster and
hub-like vectors sit between clusters. Reported per IVF nprobe
setting:

- ``top1_agree``: fraction of queries whose rank-1 margin match equals
  the brute tier's rank-1 (the mined pair — the decision that matters);
- ``pair_recall``: fraction of brute top-k margin pairs the IVF-fed
  tier also returns (any rank);
- timing for both tiers (noop-sink full evaluation).

Usage: python tools/margin_study.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from zacks_estimates_financial_statements_spark.session import get_spark  # noqa: E402
from zacks_estimates_financial_statements_spark.operators import similarity  # noqa: E402


def main() -> int:
    spark = get_spark(master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      extra_conf={"spark.ui.enabled": "false"})
    rng = np.random.default_rng(7)
    n_clusters, copies, dim, sigma = 60, 9, 64, 0.4
    rows = []
    vid = 0
    for _ in range(n_clusters):
        a = rng.normal(size=dim)
        a /= np.linalg.norm(a)
        rows.append((vid, [float(x) for x in a]))
        vid += 1
        for _ in range(copies):
            g = rng.normal(size=dim)
            g /= np.linalg.norm(g)
            v = a + sigma * g
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").persist()
    corpus.count()
    # queries = 30 anchor vectors (their true alignment: own cluster)
    queries = (corpus.filter(F.col("vec_id") % (copies + 1) == 0)
               .limit(30)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec"))
               .persist())
    queries.count()
    k = 4

    def run(fwd=None):
        t = time.time()
        out = similarity.margin_topk(corpus, queries, k=k, fwd=fwd)
        rows = out.collect()
        return rows, round(time.time() - t, 2)

    brute_rows, brute_s = run()
    brute_top1 = {r["query_id"]: r["vec_id"] for r in brute_rows
                  if r["rank"] == 1}
    brute_pairs = {(r["query_id"], r["vec_id"]) for r in brute_rows}

    results = {"brute_s": brute_s, "n_queries": len(brute_top1),
               "k": k, "ivf": {}}
    for nprobe in (2, 4):
        t = time.time()
        fwd = similarity.topk_ivf(corpus, queries, k=k,
                                  n_centroids=16, nprobe=nprobe)
        ivf_rows, ivf_s = run(fwd=fwd)
        top1 = {r["query_id"]: r["vec_id"] for r in ivf_rows
                if r["rank"] == 1}
        pairs = {(r["query_id"], r["vec_id"]) for r in ivf_rows}
        agree = sum(top1.get(q) == v for q, v in brute_top1.items())
        results["ivf"][f"nprobe={nprobe}"] = {
            "top1_agree": round(agree / len(brute_top1), 3),
            "pair_recall": round(len(pairs & brute_pairs)
                                 / len(brute_pairs), 3),
            "wall_s": round(time.time() - t, 2),
        }
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
