"""q123 PQ geometry experiment (the q128-style knob sweep applied to
the PQ path): measure planted recall@5 + wall time at sf10 for
(shortlist_scale_div, n_seeds) variants of pq_rerank_topk_seeded,
using the sf10_ann_recall plant protocol (5 perturbed real-corpus
queries per rep, numpy exact integer truth).

Usage: python scripts/pq_variants.py [sf_dir] [reps] [div,seeds ...]
   eg: python scripts/pq_variants.py .bench_sf1/sf10 2 16,16 8,16 16,32 8,32
"""

from __future__ import annotations

import math
import random
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from e2e_stock_data_pipeline_spark.operators import pq as pq_ops  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402
from e2e_stock_data_pipeline_spark.sources import tables  # noqa: E402


def quantize(x: np.ndarray) -> np.ndarray:
    return np.floor(x.astype(np.float64) * 10000.0).astype(np.int64)


def exact_top5(qv, cand_q, cand_ids):
    d2 = ((cand_q - qv) ** 2).sum(axis=1)
    order = np.lexsort((cand_ids, d2))[:5]
    return [int(cand_ids[i]) for i in order]


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else ".bench_sf1/sf10"
    reps = int(argv[1]) if len(argv) > 1 else 2
    variants = [tuple(map(int, a.split(","))) for a in argv[2:]] or [
        (16, 16), (8, 16), (16, 32), (8, 32)
    ]

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids0 = tbl.column("vec_id").to_numpy()
    X0 = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels0 = tbl.column("label").to_numpy()
    dim = X0.shape[1]
    scale = float(np.linalg.norm(X0, axis=1).mean()) / math.sqrt(dim)
    spark = get_spark(app_name="pq-variants")
    spark.sparkContext.setLogLevel("ERROR")

    stats = {v: [0, 0, 0, 0.0] for v in variants}  # hits, tot, src@1, sec
    for rep in range(reps):
        rng = random.Random(1234 + rep)
        nprng = np.random.default_rng(1234 + rep)
        ids, X, labels = ids0.copy(), X0.copy(), labels0.copy()
        hi = int(ids.max()) + 1
        for i in range(5):
            ids[np.where(ids0 == i)[0][0]] = hi + i
        src_pool = np.where(ids >= 5)[0]
        src_idx = rng.sample(list(src_pool), 5)
        q_ids, q_X, q_lab, sources = [], [], [], []
        for slot, si in enumerate(src_idx):
            sigma = 0.10 + 0.25 * rng.random()
            v = X[si] + nprng.normal(0.0, sigma * scale, dim).astype(np.float32)
            q_ids.append(slot)
            q_X.append(v)
            q_lab.append(int(labels[si]))
            sources.append(int(ids[si]))
        all_ids = np.concatenate([np.array(q_ids, dtype=np.int64), ids])
        all_X = np.vstack([np.array(q_X, dtype=np.float32), X])
        all_lab = np.concatenate(
            [np.array(q_lab, dtype=np.int32), labels]
        ).astype(np.int32)
        cand_mask = all_ids >= 5
        cand_q = quantize(all_X[cand_mask])
        cand_ids = all_ids[cand_mask]
        truth = {
            s: exact_top5(quantize(np.array(q_X[s])), cand_q, cand_ids)
            for s in range(5)
        }
        with tempfile.TemporaryDirectory() as tmp:
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(all_ids, pa.int64()),
                        "embedding": pa.array(
                            [list(map(float, v)) for v in all_X],
                            pa.list_(pa.float32()),
                        ),
                        "label": pa.array(all_lab, pa.int32()),
                    }
                ),
                f"{tmp}/embeddings.parquet",
            )
            for div, seeds in variants:
                e = tables.load(spark, tmp, "embeddings")
                t0 = time.time()
                rows = pq_ops.pq_rerank_topk_seeded(
                    e.filter("vec_id < 5"),
                    e.filter("vec_id >= 5"),
                    n_seeds=seeds,
                    shortlist_scale_div=div,
                ).collect()
                dt = time.time() - t0
                got = {}
                rank1 = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.cand_id)
                    if r.rnk == 1:
                        rank1[r.query_id] = r.cand_id
                st = stats[(div, seeds)]
                st[3] += dt
                for s in range(5):
                    st[1] += 5
                    st[0] += sum(1 for c in truth[s] if c in got.get(s, set()))
                    if rank1.get(s) == sources[s]:
                        st[2] += 1
        print(f"rep {rep} done", flush=True)

    for (div, seeds), (hit, tot, s1, sec) in stats.items():
        print(
            f"VARIANT div={div} n_seeds={seeds}: recall@5 "
            f"{hit / max(tot, 1):.4f} ({hit}/{tot}) src@1 {s1}/{reps * 5} "
            f"avg_sec {sec / reps:.1f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
