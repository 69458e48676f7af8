"""Planted-truth recall audit for the embedding ANN family (q51 /
q123 / q128) — the vector-modality sibling of scripts/sf10_lsh_recall.py
(VERDICT r14 item 4: the MinHash seed correlation was invisible until a
planted instrument measured it; the hyperplane/IVF/PQ tier has recall
BOUND tests but no planted ground-truth run at sf10 density).

What it plants and what it measures:

* the registered q123/q128 pin their QUERY set to vec_id < 5, so per
  repetition the 5 query slots are overwritten with perturbed copies of
  seeded real corpus vectors (the originals are relabeled to fresh ids
  and stay in the candidate set — each query's true nearest neighbor by
  construction). Ground truth is the exact quantized-L2 top-5 over ALL
  candidates, computed independently in numpy with the engines' own
  integer semantics (floor(x*10000), d2 over int64). Reported per path:
  recall@5 against that truth and the source-recovered@rank-1 rate,
  with every miss printed (query, cand, true rank, d2 margin, whether
  it was the planted source). A miss can only come from the path's one
  recall-losing stage — IVF: true neighbor's refined cell not among
  the 4 probed; PQ: true neighbor outside the 32-deep ADC shortlist —
  because the final rerank is exact and oracle-gated.

* q51 (8-hyperplane bucket assignment) loses recall only when a true
  pair straddles a hyperplane, with per-pair probability exactly
  1 - (1 - theta/pi)^8. A larger planted-pair population (default 300,
  appended at fresh ids with a spread of perturbation strengths) is
  pushed through the REGISTERED q51 and the observed bucket-collision
  count is compared with the sum of per-pair predictions — the same
  calibration shape that exposed the v1 MinHash family (a correlated
  plane family would sit far from its prediction; sigma is reported).

* q130 (r16): the density-scaled banded geometry gets the q126-shaped
  cross-boundary planted-pair audit — plants take new-batch ids, the
  observed recall through the REGISTERED query is calibrated against
  1-(1-s^r)^B and must not undershoot the r15 fixed-geometry
  prediction s^base (the "recall >= current" bar for the fix).

    python scripts/sf10_ann_recall.py [sf_dir] [reps] [n_pairs]
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

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402


def quantize(x: np.ndarray) -> np.ndarray:
    """The engines' shared quantization: floor(double(x) * 10000) as int64."""
    return np.floor(x.astype(np.float64) * 10000.0).astype(np.int64)


def exact_top5(qv: np.ndarray, cand_q: np.ndarray, cand_ids: np.ndarray):
    """Top-5 candidates by (quantized L2 d2, cand_id) — q123/q128's metric."""
    d2 = ((cand_q - qv) ** 2).sum(axis=1)
    order = np.lexsort((cand_ids, d2))[:5]
    return [(int(cand_ids[i]), int(d2[i])) for i in order]


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else ".bench_sf1/sf10"
    reps = int(argv[1]) if len(argv) > 1 else 10
    n_pairs = int(argv[2]) if len(argv) > 2 else 300

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids0 = tbl.column("vec_id").to_numpy()
    X0 = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    labels0 = tbl.column("label").to_numpy()
    dim = X0.shape[1]
    scale = float(np.linalg.norm(X0, axis=1).mean()) / math.sqrt(dim)

    registry = load_all_query_modules()
    spark = get_spark(app_name="ann-recall")

    def write_corpus(tmp, ids, X, labels):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in X],
                                          pa.list_(pa.float32())),
                    "label": pa.array(labels, pa.int32()),
                }
            ),
            f"{tmp}/embeddings.parquet",
        )

    # ---- q123 / q128: registered-query-slot plants, numpy exact truth ----
    stats = {"q123_pq_rerank": [0, 0, 0], "q128_ivf_rerank": [0, 0, 0]}
    # [hits, total_slots, source_at_rank1]
    misses: dict[str, list] = {"q123_pq_rerank": [], "q128_ivf_rerank": []}
    cos_lo, cos_hi = 1.0, -1.0
    t0 = time.time()
    for rep in range(reps):
        rng = random.Random(1234 + rep)
        nprng = np.random.default_rng(1234 + rep)
        ids, X, labels = ids0.copy(), X0.copy(), labels0.copy()
        # relabel the query-slot originals to fresh ids (stay candidates)
        hi = int(ids.max()) + 1
        for i in range(5):
            ids[np.where(ids0 == i)[0][0]] = hi + i
        src_pool = np.where(ids >= 5)[0]
        src_idx = rng.sample(list(src_pool), 5)
        q_rows_ids, q_rows_X, q_rows_lab, sources = [], [], [], []
        for slot, si in enumerate(src_idx):
            sigma = 0.10 + 0.25 * rng.random()
            v = X[si] + nprng.normal(0.0, sigma * scale, dim).astype(np.float32)
            qa, qb = quantize(v), quantize(X[si])
            c = float(qa @ qb) / (math.sqrt(qa @ qa) * math.sqrt(qb @ qb))
            cos_lo, cos_hi = min(cos_lo, c), max(cos_hi, c)
            q_rows_ids.append(slot)
            q_rows_X.append(v)
            q_rows_lab.append(int(labels[si]))
            sources.append(int(ids[si]))
        all_ids = np.concatenate([np.array(q_rows_ids, dtype=np.int64), ids])
        all_X = np.vstack([np.array(q_rows_X, dtype=np.float32), X])
        all_lab = np.concatenate(
            [np.array(q_rows_lab, dtype=np.int32), labels]
        ).astype(np.int32)

        cand_mask = all_ids >= 5
        cand_q = quantize(all_X[cand_mask])
        cand_ids = all_ids[cand_mask]
        truth = {
            slot: exact_top5(quantize(np.array(q_rows_X[slot])), cand_q, cand_ids)
            for slot in range(5)
        }
        with tempfile.TemporaryDirectory() as tmp:
            write_corpus(tmp, all_ids, all_X, all_lab)
            for name in stats:
                rows = registry[name].spark(spark, tmp).collect()
                got = {}
                for r in rows:
                    got.setdefault(r.query_id, set()).add(r.cand_id)
                rank1 = {
                    r.query_id: r.cand_id for r in rows if r.rnk == 1
                }
                for slot in range(5):
                    want = truth[slot]
                    have = got.get(slot, set())
                    stats[name][1] += len(want)
                    for t_rank, (cid, d2) in enumerate(want, 1):
                        if cid in have:
                            stats[name][0] += 1
                        else:
                            misses[name].append(
                                (rep, slot, cid, t_rank, d2, cid == sources[slot])
                            )
                    if rank1.get(slot) == sources[slot]:
                        stats[name][2] += 1

    print(f"planted query cos range: [{cos_lo:.4f}, {cos_hi:.4f}]")
    ok = True
    for name, (hit, tot, s1) in stats.items():
        rec = hit / tot if tot else 1.0
        print(
            f"{name}: recall@5 {rec:.4f} ({hit}/{tot}), "
            f"source@rank1 {s1}/{reps * 5}"
        )
        stage = (
            "ADC shortlist (32) pruned it"
            if name.startswith("q123")
            else "refined cell not among the 4 probed"
        )
        for rep, slot, cid, t_rank, d2, was_src in misses[name][:10]:
            print(
                f"  MISS rep={rep} slot={slot} cand={cid} true_rank={t_rank} "
                f"d2={d2} source={was_src} -> {stage}"
            )
        # the planted near-identical source must essentially always
        # surface at rank 1 — that is the near-dup use these paths serve
        if s1 < 0.95 * reps * 5:
            ok = False

    # ---- q51: bucket-collision calibration over a larger plant set ----
    rng = random.Random(51)
    nprng = np.random.default_rng(51)
    ids, X, labels = ids0.copy(), X0.copy(), labels0.copy()
    hi = int(ids.max()) + 1
    pick = rng.sample(list(range(len(ids))), n_pairs)
    pl_ids, pl_X, pl_lab, pairs, preds = [], [], [], [], []
    for j, si in enumerate(pick):
        sigma = 0.05 + 0.45 * rng.random()
        v = X[si] + nprng.normal(0.0, sigma * scale, dim).astype(np.float32)
        qa, qb = quantize(v), quantize(X[si])
        c = float(qa @ qb) / (math.sqrt(qa @ qa) * math.sqrt(qb @ qb))
        theta = math.acos(max(-1.0, min(1.0, c)))
        preds.append((1.0 - theta / math.pi) ** 8)
        pl_ids.append(hi + j)
        pl_X.append(v)
        pl_lab.append(int(labels[si]))
        pairs.append((hi + j, int(ids[si])))
    all_ids = np.concatenate([ids, np.array(pl_ids, dtype=np.int64)])
    all_X = np.vstack([X, np.array(pl_X, dtype=np.float32)])
    all_lab = np.concatenate([labels, np.array(pl_lab, dtype=np.int32)]).astype(
        np.int32
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_corpus(tmp, all_ids, all_X, all_lab)
        buckets = {
            r.vec_id: r.bucket
            for r in registry["q51_ann_lsh_buckets"].spark(spark, tmp).collect()
        }
    observed = sum(1 for a, b in pairs if buckets[a] == buckets[b])
    expected = sum(preds)
    sd = math.sqrt(sum(p * (1 - p) for p in preds))
    z = (observed - expected) / sd if sd else 0.0
    print(
        f"q51_ann_lsh_buckets: planted-pair bucket collisions {observed}/{n_pairs}"
        f" observed vs {expected:.1f} predicted by (1-theta/pi)^8"
        f" (sd {sd:.1f}, z={z:+.2f})"
    )
    if abs(z) > 4.0:
        ok = False
        print("  CALIBRATION FAILURE: plane family deviates from independence math")

    # ---- q130: cross-boundary planted pairs through the REGISTERED
    # density-scaled banded geometry (r16). Plants get new-batch ids
    # (vec_id % 5 = 0), sources stay corpus-side; a pair is recalled iff
    # it appears in q130's output (its cos is far above the 0.2 verify,
    # so the only loss stage is band collision). Observed recall is
    # calibrated against the banding math 1-(1-s^r)^B and compared with
    # the r15 fixed single-band prediction s^base — the "recall >= the
    # old geometry" evidence the density fix must carry.
    from e2e_stock_data_pipeline_spark.operators.similarity import (
        EMBED_BASE_PLANES,
        EMBED_DENSITY_DIV,
        EMBED_R_MAX,
    )

    def embed_geometry(n_old: int) -> tuple[int, int]:
        for r in range(EMBED_BASE_PLANES, EMBED_R_MAX):
            if n_old <= EMBED_DENSITY_DIV * (1 << r):
                break
        else:
            r = EMBED_R_MAX
        return r, max(1, r - EMBED_BASE_PLANES)

    rng = random.Random(130)
    nprng = np.random.default_rng(130)
    ids, X, labels = ids0.copy(), X0.copy(), labels0.copy()
    n_old = int((ids % 5 != 0).sum())
    r_depth, n_bands = embed_geometry(n_old)
    hi = (int(ids.max()) // 5 + 1) * 5  # planted ids stay % 5 == 0 (new)
    old_pool = list(np.where(ids % 5 != 0)[0])
    pick = rng.sample(old_pool, min(n_pairs, len(old_pool)))
    pl_ids, pl_X, pl_lab, pairs, p_new, p_old = [], [], [], [], [], []
    for j, si in enumerate(pick):
        sigma = 0.05 + 0.45 * rng.random()
        v = X[si] + nprng.normal(0.0, sigma * scale, dim).astype(np.float32)
        qa, qb = quantize(v), quantize(X[si])
        c = float(qa @ qb) / (math.sqrt(qa @ qa) * math.sqrt(qb @ qb))
        s = 1.0 - math.acos(max(-1.0, min(1.0, c))) / math.pi
        p_new.append(1.0 - (1.0 - s**r_depth) ** n_bands)
        p_old.append(s**EMBED_BASE_PLANES)
        pl_ids.append(hi + 5 * j)
        pl_X.append(v)
        pl_lab.append(int(labels[si]))
        pairs.append((hi + 5 * j, int(ids[si])))
    all_ids = np.concatenate([ids, np.array(pl_ids, dtype=np.int64)])
    all_X = np.vstack([X, np.array(pl_X, dtype=np.float32)])
    all_lab = np.concatenate([labels, np.array(pl_lab, dtype=np.int32)]).astype(
        np.int32
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_corpus(tmp, all_ids, all_X, all_lab)
        got_pairs = {
            (r.vec_new, r.vec_old)
            for r in registry["q130_incremental_embed_neardup"]
            .spark(spark, tmp)
            .select("vec_new", "vec_old")
            .collect()
        }
    observed = sum(1 for p in pairs if p in got_pairs)
    expected = sum(p_new)
    sd = math.sqrt(sum(p * (1 - p) for p in p_new))
    z = (observed - expected) / sd if sd else 0.0
    print(
        f"q130_incremental_embed_neardup: planted cross-boundary recall "
        f"{observed}/{len(pairs)} ({observed / len(pairs):.4f}) at geometry "
        f"r={r_depth} B={n_bands} (n_old={n_old}); predicted "
        f"{expected:.1f} by 1-(1-s^r)^B (sd {sd:.1f}, z={z:+.2f}); "
        f"r15 fixed single-band geometry would predict {sum(p_old):.1f}"
    )
    if abs(z) > 4.0:
        ok = False
        print("  CALIBRATION FAILURE: banded family deviates from independence math")
    if observed + 3.0 * sd < sum(p_old):
        ok = False
        print("  RECALL REGRESSION: observed below the fixed-geometry prediction")

    # ---- q50b: same banded mechanism through the (bucket AND label)
    # blocked pair query. Plants copy their source's LABEL (the label
    # conjunction can then never drop a planted pair), so the only loss
    # stage is again band collision — observed recall must match the
    # banding math and not undershoot the fixed-geometry prediction.
    rng = random.Random(50)
    nprng = np.random.default_rng(50)
    ids, X, labels = ids0.copy(), X0.copy(), labels0.copy()
    n_corpus = len(ids)
    r_depth, n_bands = embed_geometry(n_corpus + n_pairs)
    hi = int(ids.max()) + 1
    pick = rng.sample(range(len(ids)), min(n_pairs, len(ids)))
    pl_ids, pl_X, pl_lab, pairs, p_new, p_old = [], [], [], [], [], []
    for j, si in enumerate(pick):
        sigma = 0.05 + 0.45 * rng.random()
        v = X[si] + nprng.normal(0.0, sigma * scale, dim).astype(np.float32)
        qa, qb = quantize(v), quantize(X[si])
        c = float(qa @ qb) / (math.sqrt(qa @ qa) * math.sqrt(qb @ qb))
        s = 1.0 - math.acos(max(-1.0, min(1.0, c))) / math.pi
        p_new.append(1.0 - (1.0 - s**r_depth) ** n_bands)
        p_old.append(s**EMBED_BASE_PLANES)
        pl_ids.append(hi + j)
        pl_X.append(v)
        pl_lab.append(int(labels[si]))  # same label as the source
        pairs.append((int(ids[si]), hi + j))  # vec_a < vec_b order
    all_ids = np.concatenate([ids, np.array(pl_ids, dtype=np.int64)])
    all_X = np.vstack([X, np.array(pl_X, dtype=np.float32)])
    all_lab = np.concatenate([labels, np.array(pl_lab, dtype=np.int32)]).astype(
        np.int32
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_corpus(tmp, all_ids, all_X, all_lab)
        got_pairs = {
            (r.vec_a, r.vec_b)
            for r in registry["q50b_neardup_lsh_blocked"]
            .spark(spark, tmp)
            .select("vec_a", "vec_b")
            .collect()
        }
    observed = sum(1 for p in pairs if p in got_pairs)
    expected = sum(p_new)
    sd = math.sqrt(sum(p * (1 - p) for p in p_new))
    z = (observed - expected) / sd if sd else 0.0
    print(
        f"q50b_neardup_lsh_blocked: planted same-label pair recall "
        f"{observed}/{len(pairs)} ({observed / len(pairs):.4f}) at geometry "
        f"r={r_depth} B={n_bands} (n={n_corpus + len(pairs)}); predicted "
        f"{expected:.1f} by 1-(1-s^r)^B (sd {sd:.1f}, z={z:+.2f}); "
        f"r15 fixed single-band geometry would predict {sum(p_old):.1f}"
    )
    if abs(z) > 4.0:
        ok = False
        print("  CALIBRATION FAILURE: banded family deviates from independence math")
    if observed + 3.0 * sd < sum(p_old):
        ok = False
        print("  RECALL REGRESSION: observed below the fixed-geometry prediction")

    print(f"RESULT wall={time.time() - t0:.1f}s ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
