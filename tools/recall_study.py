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

- **ANN recall@k**: the LSH and IVF top-k paths against the exact
  brute-force cosine ranking — mean fraction of each query's true top-k
  the approximate method returns, at the operator defaults the oracles
  cover plus one wider-probe setting, so the speed/recall dial is
  documented with measured points. Two corpora, because the regime
  matters: the **testdata embeddings are i.i.d.-random** (measured: zero
  pairs above cosine 0.8, median nearest neighbor ≈0.37), which is the
  documented WORST case for any bucketing index — top-k is a ranking of
  statistical near-ties carrying no bucket signal — so the study also
  plants a **clustered corpus** (anchors + σ-noise copies, the
  structure ANN indexes exist for) and reports both.

Usage: python tools/recall_study.py [sf_dir] [tau]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zacks_estimates_financial_statements_spark.operators import dedup, similarity  # noqa: E402
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

    # --- ANN recall@k vs exact brute force --------------------------------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_queries, topk = 50, 10
    queries = (emb.orderBy("vec_id").limit(n_queries)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("query_vec")))
    exact_k = (similarity.topk_bruteforce(emb, queries, k=topk)
               .select("query_id", "vec_id").persist())
    n_exact = exact_k.count()          # n_queries × topk

    def recall_at_k(approx) -> float:
        hits = exact_k.join(approx.select("query_id", "vec_id"),
                            ["query_id", "vec_id"], "left_semi").count()
        return round(hits / n_exact, 4)

    ann = {
        # oracle-covered defaults, then one wider-probe point each
        "lsh_bits8_probe1": recall_at_k(similarity.topk_lsh(
            emb, queries, k=topk, bucket_bits=8, probe_hamming=1)),
        "lsh_bits8_probe2": recall_at_k(similarity.topk_lsh(
            emb, queries, k=topk, bucket_bits=8, probe_hamming=2)),
        "ivf_c16_probe4": recall_at_k(similarity.topk_ivf(
            emb, queries, k=topk, n_centroids=16, nprobe=4)),
        "ivf_c16_probe8": recall_at_k(similarity.topk_ivf(
            emb, queries, k=topk, n_centroids=16, nprobe=8)),
    }

    # --- same measurement on a clustered corpus (the ANN regime) ----------
    import numpy as np

    rng = np.random.default_rng(0)
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
            v = a + sigma * g                   # E[cos(a, v)] ≈ 0.93
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    planted = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pq = (planted.filter(F.col("vec_id") % (copies + 1) == 0)
          .limit(n_queries)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("embedding").alias("query_vec")))
    exact_k.unpersist()
    exact_k = (similarity.topk_bruteforce(planted, pq, k=topk)
               .select("query_id", "vec_id").persist())
    n_exact = exact_k.count()
    ann_planted = {
        "lsh_bits8_probe1": recall_at_k(similarity.topk_lsh(
            planted, pq, k=topk, bucket_bits=8, probe_hamming=1)),
        "lsh_bits8_probe2": recall_at_k(similarity.topk_lsh(
            planted, pq, k=topk, bucket_bits=8, probe_hamming=2)),
        "ivf_c16_probe4": recall_at_k(similarity.topk_ivf(
            planted, pq, k=topk, n_centroids=16, nprobe=4)),
        "ivf_c16_probe8": recall_at_k(similarity.topk_ivf(
            planted, pq, k=topk, n_centroids=16, nprobe=8)),
    }

    # --- SemDeDup pair recall on the planted corpus -----------------------
    # ground truth = exact all-pairs cosine >= tau_sem (the planted
    # near-dups sit at cos ~0.93); recall = fraction of true pairs whose
    # two members land in the SAME IVF cluster — the only pairs
    # semantic_dedup can act on. The knob is n_centroids (and Lloyd
    # refinement); more clusters = cheaper quadratic stage, lower recall.
    tau_sem = 0.8
    sem_truth = dedup.embedding_near_dup_pairs(
        planted, "vec_id", "embedding", min_cosine=tau_sem,
        bucket_bits=0).select("id_a", "id_b").persist()
    n_sem_truth = sem_truth.count()
    sem = {}
    for label, nc, iters in (("ivf_c16_seed", 16, 0),
                             ("ivf_c60_seed", 60, 0),
                             ("ivf_c60_lloyd2", 60, 2)):
        assign, _ = similarity.ivf_assign(planted, nc, "vec_id",
                                          "embedding", kmeans_iters=iters)
        got = (sem_truth
               .join(assign.select(F.col("vec_id").alias("id_a"),
                                   F.col("centroid_id").alias("__ca")),
                     "id_a")
               .join(assign.select(F.col("vec_id").alias("id_b"),
                                   F.col("centroid_id").alias("__cb")),
                     "id_b")
               .filter(F.col("__ca") == F.col("__cb")).count())
        sem[label] = round(got / n_sem_truth, 4) if n_sem_truth else None

    # --- PQ/ADC recall vs exact squared-L2 top-k --------------------------
    # PQ ranks by approximate L2, so its ground truth is the exact L2
    # ranking (cosine order coincides only on unit-norm corpora). Raw
    # ADC + the IVFADC+R refine points document the dial PERFORMANCE.md
    # tabulates; the refine stage touches only Q·R float rows.
    from pyspark.sql import Window

    from zacks_estimates_financial_statements_spark.functions import vectors as V

    def pq_recall(corpus, qset) -> dict:
        w = Window.partitionBy("query_id").orderBy(
            F.asc("d"), F.col("vec_id"))
        exact_l2 = (corpus.crossJoin(F.broadcast(qset))
                    .select("query_id", "vec_id",
                            V.sq_l2(F.col("embedding"),
                                    F.col("query_vec")).alias("d"))
                    .withColumn("r", F.row_number().over(w))
                    .filter(F.col("r") <= topk)
                    .select("query_id", "vec_id").persist())
        n = exact_l2.count()

        def r(approx) -> float:
            hits = exact_l2.join(approx.select("query_id", "vec_id"),
                                 ["query_id", "vec_id"],
                                 "left_semi").count()
            return round(hits / n, 4)

        out = {
            "pq_m8_iters1": r(similarity.topk_pq_adc(
                corpus, qset, k=topk, dims=64, n_subspaces=8,
                n_codes=16, kmeans_iters=1)),
            "pq_m8_iters1_rerank100": r(similarity.topk_pq_adc(
                corpus, qset, k=topk, dims=64, n_subspaces=8,
                n_codes=16, kmeans_iters=1, rerank=100)),
            "pq_m8_iters1_rerank200": r(similarity.topk_pq_adc(
                corpus, qset, k=topk, dims=64, n_subspaces=8,
                n_codes=16, kmeans_iters=1, rerank=200)),
        }
        exact_l2.unpersist()
        return out

    pq_random = pq_recall(emb, queries)
    planted_f = planted.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    pq_planted = pq_recall(
        planted_f,
        pq.select("query_id",
                  F.col("query_vec").cast("array<float>").alias("query_vec")))

    print(json.dumps({
        "sf_dir": sf_dir, "tau": tau, "k": K, "bands": BANDS,
        "n_docs": docs.count(),
        "truth_pairs": n_truth,
        "candidates": n_cand,
        "recall": round(hit / n_truth, 4) if n_truth else None,
        "expected_recall_theory": round(exp, 4) if exp is not None else None,
        "precision_at_tau": round(good / n_cand, 4) if n_cand else None,
        "ann_recall_at_10": ann,
        "ann_recall_at_10_planted": ann_planted,
        "pq_recall_at_10_vs_l2": pq_random,
        "pq_recall_at_10_vs_l2_planted": pq_planted,
        "ann_queries": n_queries,
        "semantic_dedup_pair_recall": {
            "tau": tau_sem, "truth_pairs": n_sem_truth, **sem},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
