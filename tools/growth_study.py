"""Ingestion-gate growth study: is admitting a batch to a GROWING
stored LSH index really O(batch)?

The incremental-dedup design claim (operators/dedup.py,
``incremental_minhash_pairs``) is that per-batch admission cost does
not grow with the stored corpus: only the batch is sketched, its
bucket rows broadcast into the index probe, and the stored index is
scanned but never re-sketched or shuffled. This tool measures that
claim directly: build an index from an initial corpus slice, then
admit successive fixed-size batches, appending each batch's index rows
to the STORED parquet index between rounds (the real ingestion loop),
and record the per-batch admission wall time against the index size.

Flat admission time across a 5× index growth = the claim holds at the
scales local mode can exercise; the plan shape (broadcast probe, no
corpus shuffle) is what extends it beyond.

Usage: python tools/growth_study.py [sf_dir] [initial] [batch_size] [n_batches]
Prints one JSON line; PERFORMANCE.md carries the table.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from zacks_estimates_financial_statements_spark.operators import dedup, graph  # noqa: E402
from zacks_estimates_financial_statements_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    initial = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    batch_size = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_N", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(app_name="growth-study", master=f"local[{cpus}]",
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false",
                                  "spark.sql.shuffle.partitions": cpus})
    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text").persist())
    docs.count()

    tmp = tempfile.mkdtemp(prefix="growth_index_")
    index_path = os.path.join(tmp, "minhash_index")
    try:
        seed = docs.filter(F.col("doc_id") < initial)
        dedup.minhash_index(seed, "doc_id", "text") \
            .write.mode("overwrite").parquet(index_path)
        # label-maintenance leg: stored (node, component) relation,
        # seeded with a full CC over the seed slice
        labels_a = os.path.join(tmp, "labels_a")
        labels_b = os.path.join(tmp, "labels_b")
        seed_pairs = dedup.minhash_near_dup_pairs(seed, "doc_id", "text")
        seed_cc = graph.connected_components(seed_pairs)
        (seed.select(F.col("doc_id").alias("node"))
         .join(seed_cc, "node", "left")
         .select("node", F.coalesce("component", "node").alias("component"))
         .write.mode("overwrite").parquet(labels_a))
        labels_path, labels_next = labels_a, labels_b

        rows = []
        for b in range(n_batches):
            lo = initial + b * batch_size
            batch = docs.filter((F.col("doc_id") >= lo)
                                & (F.col("doc_id") < lo + batch_size))
            stored = spark.read.parquet(index_path)
            index_rows = stored.count()
            times, times_pruned = [], []
            for _ in range(reps):
                t0 = time.time()
                n_pairs = dedup.incremental_minhash_pairs(
                    stored, batch, "doc_id", "text").count()
                times.append(time.time() - t0)
                t0 = time.time()
                n_pruned = dedup.incremental_minhash_pairs(
                    stored, batch, "doc_id", "text",
                    prune_index_scan=True).count()
                times_pruned.append(time.time() - t0)
            assert n_pruned == n_pairs, (n_pruned, n_pairs)
            # label maintenance: contracted-graph CC + relabel against
            # the GROWING stored label relation (incremental_components)
            stored_labels = spark.read.parquet(labels_path)
            n_labels = stored_labels.count()
            bpairs = dedup.minhash_near_dup_pairs(
                batch, "doc_id", "text").select("id_a", "id_b")
            cross = dedup.incremental_minhash_pairs(
                stored, batch, "doc_id", "text") \
                .select(F.col("batch_id").alias("id_a"),
                        F.col("corpus_id").alias("id_b"))
            t0 = time.time()
            bl, rm = graph.incremental_components(stored_labels,
                                                  bpairs.union(cross))
            merged = graph.apply_relabel(stored_labels, rm)
            batch_all = (batch.select(F.col("doc_id").alias("node"))
                         .join(bl, "node", "left")
                         .select("node",
                                 F.coalesce("component", "node")
                                 .alias("component")))
            new_labels = merged.union(batch_all)
            new_labels.write.mode("overwrite").parquet(labels_next)
            label_s = round(time.time() - t0, 3)
            labels_path, labels_next = labels_next, labels_path
            # the real ingestion loop: admitted batch joins the index
            dedup.minhash_index(batch, "doc_id", "text") \
                .write.mode("append").parquet(index_path)
            rows.append({"batch": b + 1, "index_rows": index_rows,
                         "label_rows": n_labels, "label_s": label_s,
                         "admit_s": round(statistics.median(times), 3),
                         "admit_pruned_s":
                         round(statistics.median(times_pruned), 3),
                         "pairs": n_pairs})
            print(f"# batch {b + 1}/{n_batches}: index={index_rows} rows, "
                  f"admit={rows[-1]['admit_s']}s, "
                  f"pruned={rows[-1]['admit_pruned_s']}s, pairs={n_pairs}, "
                  f"labels={n_labels} maintain={label_s}s",
                  file=sys.stderr)

        first, last = rows[0]["admit_s"], rows[-1]["admit_s"]
        print(json.dumps({
            "sf_dir": sf_dir, "initial_docs": initial,
            "batch_size": batch_size, "n": reps,
            "batches": rows,
            "growth_ratio": round(rows[-1]["index_rows"]
                                  / rows[0]["index_rows"], 2),
            "admit_ratio_last_vs_first": round(last / first, 2)
            if first else None,
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
