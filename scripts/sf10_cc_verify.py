"""Spark-side invariant verification of the connected-components
labeling at scales where the DuckDB recursive-CTE oracle is infeasible
(the unrolled transitive closure over the sf10 LSH graph's 336M
candidate pairs spills past any reasonable budget).

Checks, given labels = q56's output and edges = the same LSH pair set:

1. EDGE CONSISTENCY — no candidate edge crosses two labels: for every
   (doc_a, doc_b), label(doc_a) == label(doc_b). Rules out under-merge
   (a split component) entirely.
2. LABEL MINIMALITY + MEMBERSHIP — for every cluster, the label equals
   the minimum member id (which also proves the label node is a
   member, and covers singletons: cluster_id == doc_id).
3. TOTALITY — every document carries exactly one label.

Together with 1-2, the only labeling defect these cannot catch is an
over-merge (two disconnected components sharing a label). Min-label
propagation moves labels exclusively along edges (the neighbor-min
join), so the algorithm cannot manufacture a cross-component merge by
construction; the 4-sf oracle ladder (sf0.001-1, exact vs the DuckDB
transitive closure) pins that structurally.

    python scripts/sf10_cc_verify.py <sf_dir>

Prints one JSON line: {"metric": "cc_invariants", "sf_dir": ...,
"n_docs": N, "n_edges": E, "n_clusters": C, "crossing_edges": 0,
"bad_min_labels": 0, "unlabeled": 0, "ok": true}
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from e2e_stock_data_pipeline_spark.operators import dedup as D  # noqa: E402
from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources import tables  # noqa: E402


def main(sf_dir: str) -> int:
    import os

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="cc-verify", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all_query_modules()

    labels = registry["q56_dedup_clusters"].spark(spark, sf_dir).localCheckpoint()
    docs = tables.load(spark, sf_dir, "documents")
    sh = D.exploded_shingles(docs, distinct=False)
    sigs = D.minhash_signatures(sh, num_hashes=6)
    edges = D.lsh_candidate_pairs(sigs)

    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("ca")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cb")
    )
    crossing = (
        edges.join(la, "doc_a")
        .join(lb, "doc_b")
        .filter(F.col("ca") != F.col("cb"))
        .count()
    )
    bad_min = (
        labels.groupBy("cluster_id")
        .agg(F.min("doc_id").alias("m"))
        .filter(F.col("m") != F.col("cluster_id"))
        .count()
    )
    n_docs = docs.count()
    n_labeled = labels.filter(F.col("cluster_id").isNotNull()).count()
    out = {
        "metric": "cc_invariants",
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_edges": edges.count(),
        "n_clusters": labels.select("cluster_id").distinct().count(),
        "crossing_edges": crossing,
        "bad_min_labels": bad_min,
        "unlabeled": n_docs - n_labeled,
        "ok": crossing == 0 and bad_min == 0 and n_labeled == n_docs,
    }
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
