"""Candidate-recall study: how much of the exact near-dup ground truth
the sketch-based candidate generators recover, and at what precision.

The oracle gate proves the sketches are *deterministic*; this measures
whether they *retrieve* — the quality dimension correctness hashes can't
see. Ground truth is the exact word-shingle Jaccard over the same
shingle space the sketches use (``ngram_jaccard_pairs``, shingle_k=3),
so the comparison is apples-to-apples.

- **MinHash LSH** (k=12, bands=4 → r=3 rows/band): banding theory says a
  pair with true Jaccard ``s`` becomes a candidate with probability
  ``1-(1-s^r)^b`` (Leskovec/Rajaraman/Ullman, MMDS ch.3). The study
  reports measured recall on pairs ≥ tau next to that expectation, and
  precision as the fraction of emitted candidates whose TRUE Jaccard
  clears tau.
- **SimHash** is not sampled here: its pigeonhole banding has EXACT
  recall within the hamming budget (proven against brute force in
  test_simhash_banding_exact_recall).

Usage: python tools/recall_study.py [sf_dir] [tau]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zacks_estimates_financial_statements_spark.operators import dedup  # noqa: E402
from zacks_estimates_financial_statements_spark.session import get_spark  # noqa: E402

K, BANDS = 12, 4          # the operator defaults the oracle covers
R = K // BANDS            # rows per band


def expected_recall(s: float) -> float:
    return 1.0 - (1.0 - s ** R) ** BANDS


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tau = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="recall-study", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # exact ground truth over ALL co-shingle pairs (min_jaccard=0 keeps
    # sub-threshold pairs so candidate precision can be judged too)
    exact = dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                      shingle_k=3, min_jaccard=0.0)
    cand = dedup.minhash_near_dup_pairs(docs, "doc_id", "text",
                                        k=K, bands=BANDS, shingle_k=3)

    truth = exact.filter(F.col("jaccard") >= tau).persist()
    n_truth = truth.count()
    hit = truth.join(cand, ["id_a", "id_b"], "left_semi").count()
    n_cand = cand.count()
    # candidates whose TRUE jaccard clears tau (candidates that share no
    # shingle at all cannot exist — a shared band needs shared minhashes)
    good = cand.join(truth, ["id_a", "id_b"], "left_semi").count()
    exp = (truth.select(F.avg(
        1.0 - F.pow(1.0 - F.pow("jaccard", F.lit(R)), F.lit(BANDS)))
        .alias("e")).first()["e"]) if n_truth else None

    print(json.dumps({
        "sf_dir": sf_dir, "tau": tau, "k": K, "bands": BANDS,
        "n_docs": docs.count(),
        "truth_pairs": n_truth,
        "candidates": n_cand,
        "recall": round(hit / n_truth, 4) if n_truth else None,
        "expected_recall_theory": round(exp, 4) if exp is not None else None,
        "precision_at_tau": round(good / n_cand, 4) if n_cand else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
