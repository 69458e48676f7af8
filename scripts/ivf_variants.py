"""q128 IVF geometry experiment (VERDICT r16 item 2): measure planted
recall@5 + wall time at sf10 for (lloyd_steps, probe_div) variants of
ivf_rerank_topk_seeded, using the same plant protocol as
scripts/sf10_ann_recall.py (5 perturbed real-corpus queries per rep,
numpy exact integer truth). Picks nothing — prints the evidence table.

Usage: python scripts/ivf_variants.py [sf_dir] [reps] [L,div ...]
   eg: python scripts/ivf_variants.py .bench_sf1/sf10 3 1,4 1,2 2,4 2,2
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

from e2e_stock_data_pipeline_spark.operators import similarity as S  # noqa: E402
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
    reps = int(argv[1]) if len(argv) > 1 else 3
    variants = [tuple(map(int, a.split(","))) for a in argv[2:]] or [
        (1, 4), (1, 2), (2, 4), (2, 2)
    ]

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids0 = tbl.column("vec_id").to_numpy()
    X0 = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels0 = tbl.column("label").to_numpy()
    dim = X0.shape[1]
    scale = float(np.linalg.norm(X0, axis=1).mean()) / math.sqrt(dim)
    spark = get_spark(app_name="ivf-variants")
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
            for L, pdv in variants:
                e = tables.load(spark, tmp, "embeddings")
                t0 = time.time()
                rows = S.ivf_rerank_topk_seeded(
                    e.filter("vec_id < 5"),
                    e.filter("vec_id >= 5"),
                    density_scaled=True,
                    lloyd_steps=L,
                    probe_div=pdv,
                ).collect()
                dt = time.time() - t0
                got = {}
                rank1 = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.cand_id)
                    if r.rnk == 1:
                        rank1[r.query_id] = r.cand_id
                st = stats[(L, pdv)]
                st[3] += dt
                for s in range(5):
                    st[1] += 5
                    st[0] += sum(1 for c in truth[s] if c in got.get(s, set()))
                    if rank1.get(s) == sources[s]:
                        st[2] += 1
        print(f"rep {rep} done", flush=True)

    for (L, pdv), (hit, tot, s1, sec) in stats.items():
        print(
            f"VARIANT lloyd={L} probe_div={pdv}: recall@5 "
            f"{hit / max(tot, 1):.4f} ({hit}/{tot}) src@1 {s1}/{reps * 5} "
            f"avg_sec {sec / reps:.1f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
