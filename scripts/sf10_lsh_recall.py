"""Measured LSH recall at sf10 for the production near-dup pipeline
(q86) — the probabilistic twin of scripts/sf10_planted_neardup.py.

q86 is a recall-then-precision pipeline: since the r15 cutover, 12-seed
v2 MinHash folded into 6 bands of 2 rows proposes candidates
(theoretical pair recall 1 - (1-J^2)^6: ~96% at J = 0.7, >= 99.9% at
J = 0.8), a hot-bucket cap (>100 members, never-binding under 2-row
bands) drops degenerate signatures, and exact Jaccard >= 0.5 verifies.
The cap and the bands are the two places a true pair can be lost, and
neither is observable from the (pair-free) gen_sf1 corpus — so PLANT
truth and measure:

* sample K real sf10 docs (seeded), append one single-word-mutated copy
  of each — every planted pair's exact Jaccard is >= 0.5 by construction
  (computed in pure Python, never assumed);
* run the REGISTERED q86 over corpus + plants;
* report recall over the planted pairs, the per-pair expected vs
  returned Jaccard (must match the Python value to 1e-12 when returned),
  and the J-histogram of any misses (a miss at J = 0.55 is the banding
  math; a miss at J = 0.95 would be a bug or a cap collision — printed
  loudly either way).

    python scripts/sf10_lsh_recall.py [sf10_dir] [K] [--query q126]

``--query q126`` audits the REGISTERED incremental path instead: plants
get ids on the new-batch side of q126's boundary (doc_id % 5 = 0),
sources are sampled from the corpus side (% 5 != 0), and recovery is
measured through q126_incremental_dedup's (doc_new, doc_old, jaccard)
output — closing the loop on the one v2-family query whose candidate
join crosses a partition boundary instead of self-joining.
"""

from __future__ import annotations

import random
import sys
import tempfile
import time

sys.path.insert(0, ".")

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402


def shingles(text: str) -> frozenset[str]:
    ws = [w for w in text.strip().split() if w]
    if len(ws) < 3:
        return frozenset()
    return frozenset(" ".join(ws[i : i + 3]) for i in range(len(ws) - 2))


def main(argv: list[str]) -> int:
    qname = "q86_neardup_pipeline"
    if "--query" in argv:
        i = argv.index("--query")
        qname = {"q86": "q86_neardup_pipeline", "q126": "q126_incremental_dedup"}[
            argv[i + 1]
        ]
        argv = argv[:i] + argv[i + 2 :]
    incremental = qname.startswith("q126")
    sf_dir = argv[0] if argv else ".bench_sf1/sf10"
    k = int(argv[1]) if len(argv) > 1 else 500
    rng = random.Random(86)

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    docs = tbl.to_pylist()
    max_id = max(d["doc_id"] for d in docs)
    vocab = sorted({w for d in rng.sample(docs, 200) for w in d["text"].split()})

    pool = [d for d in docs if len(d["text"].split()) >= 16]
    if incremental:
        # sources must sit on the corpus side of q126's boundary; plants
        # take ids on the new-batch side (doc_id % 5 = 0)
        pool = [d for d in pool if d["doc_id"] % 5 != 0]
        next_new = (max_id // 5 + 1) * 5
    planted, expected = [], {}
    for i, src in enumerate(rng.sample(pool, k)):
        ws = src["text"].split()
        pos = rng.randrange(2, len(ws) - 2)
        ws[pos] = rng.choice([w for w in vocab if w != ws[pos]])
        new_id = next_new + 5 * i if incremental else max_id + 1 + i
        copy = dict(src, doc_id=new_id, text=" ".join(ws))
        copy["n_chars"] = len(copy["text"])
        planted.append(copy)
        sa, sb = shingles(src["text"]), shingles(copy["text"])
        c = len(sa & sb)
        u = len(sa) + len(sb) - c
        j = c / u if u else 0.0
        if j >= 0.5:
            key = (
                (copy["doc_id"], src["doc_id"])
                if incremental
                else tuple(sorted((src["doc_id"], copy["doc_id"])))
            )
            expected[key] = j
    print(f"planted {len(planted)}, expected (J >= 0.5) pairs {len(expected)}")

    with tempfile.TemporaryDirectory() as tmp:
        pq.write_table(
            pa.Table.from_pylist(docs + planted, schema=tbl.schema), f"{tmp}/documents.parquet"
        )
        spark = get_spark(app_name="lsh-recall")
        t0 = time.time()
        rows = load_all_query_modules()[qname].spark(spark, tmp).collect()
        wall = time.time() - t0
    if incremental:
        got = {(r.doc_new, r.doc_old): r.jaccard for r in rows}
    else:
        got = {(r.doc_a, r.doc_b): r.jaccard for r in rows}

    hits = {p: j for p, j in expected.items() if p in got}
    drift = [p for p, j in hits.items() if abs(got[p] - j) > 1e-12]
    misses = {p: j for p, j in expected.items() if p not in got}
    recall = len(hits) / len(expected) if expected else 1.0
    print(
        f"RESULT wall={wall:.1f}s returned={len(got)} recall={recall:.4f} "
        f"({len(hits)}/{len(expected)}), value_drift={len(drift)}"
    )
    if misses:
        js = sorted(misses.values())
        print(f"MISSES by J: min={js[0]:.3f} median={js[len(js)//2]:.3f} max={js[-1]:.3f}")
        high = {p: j for p, j in misses.items() if j >= 0.8}
        if high:
            print("HIGH-J MISSES (>= 0.8, suspicious):", list(high.items())[:5])
    if drift:
        print("VALUE DRIFT (first 5):", [(p, expected[p], got[p]) for p in drift[:5]])
    return 0 if recall >= 0.98 and not drift else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
