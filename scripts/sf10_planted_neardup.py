"""Planted-pair recovery audit for the exact set-similarity join (q184)
at sf10 — ground-truth correctness evidence at full scale.

The gen_sf1.py corpora contain NO J >= 0.8 3-gram-shingle pairs (the sf1
zero is oracle-confirmed), so a plain sf10 run of q184 exercises only
the candidate path. This script PLANTS known near-dups and checks the
join recovers exactly them, among the full 500k-doc candidate stream:

* sample K source docs from the real sf10 corpus (seeded, reproducible);
* for each, append one mutated copy (flip exactly one mid-word — for
  docs of >= 16 words that leaves 3-gram Jaccard >= 0.8 whenever the
  exact Python check below says so; the EXPECTED set is computed by
  brute-force Jaccard over (source, copy) in pure Python, never assumed);
* run the REGISTERED q184 over (corpus + planted copies) in a temp dir;
* assert: every expected planted pair is returned with the exact
  (n_common, jaccard_fp) the Python brute force computes (completeness
  against ground truth), and every OTHER returned pair — planted-x-
  natural or natural-x-natural — passes an exact Python Jaccard >= 0.8
  re-check on its two texts (soundness; such extras are legitimate
  discoveries, printed and re-verified, not failures).

    python scripts/sf10_planted_neardup.py [sf10_dir] [K]
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


def jacc(a: frozenset, b: frozenset) -> tuple[int, int]:
    common = len(a & b)
    union = len(a) + len(b) - common
    return common, union


def main(argv: list[str]) -> int:
    sf_dir = argv[0] if argv else ".bench_sf1/sf10"
    k = int(argv[1]) if len(argv) > 1 else 500
    rng = random.Random(184)

    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    cols = tbl.column_names
    docs = tbl.to_pylist()
    max_id = max(d["doc_id"] for d in docs)
    vocab = sorted({w for d in rng.sample(docs, 200) for w in d["text"].split()})

    planted, expected = [], {}
    sources = rng.sample([d for d in docs if len(d["text"].split()) >= 16], k)
    for i, src in enumerate(sources):
        ws = src["text"].split()
        pos = rng.randrange(2, len(ws) - 2)  # mid-word: bounded shingle churn
        old = ws[pos]
        ws[pos] = rng.choice([w for w in vocab if w != old])
        copy = dict(src)
        copy["doc_id"] = max_id + 1 + i
        copy["text"] = " ".join(ws)
        copy["n_chars"] = len(copy["text"])
        planted.append(copy)
        c, u = jacc(shingles(src["text"]), shingles(copy["text"]))
        if u and 5 * c >= 4 * u:  # same exact-integer threshold as q184
            a, b = sorted((src["doc_id"], copy["doc_id"]))
            expected[(a, b)] = (c, 1_000_000 * c // u)
    print(f"planted {len(planted)} copies, {len(expected)} expected pairs")

    with tempfile.TemporaryDirectory() as tmp:
        pq.write_table(
            pa.Table.from_pylist(docs + planted, schema=tbl.schema).select(cols),
            f"{tmp}/documents.parquet",
        )
        spark = get_spark(app_name="q184-planted")
        reg = load_all_query_modules()
        t0 = time.time()
        rows = reg["q184_set_similarity_join"].spark(spark, tmp).collect()
        wall = time.time() - t0
        got = {(r.doc_a, r.doc_b): (r.n_common, r.jaccard_fp) for r in rows}

    text_by_id = {d["doc_id"]: d["text"] for d in docs}
    text_by_id.update({d["doc_id"]: d["text"] for d in planted})
    missing = {p: v for p, v in expected.items() if got.get(p) != v}
    extras = {p: v for p, v in got.items() if p not in expected}
    unsound = []
    for (a, b), (c_got, fp_got) in extras.items():
        c, u = jacc(shingles(text_by_id[a]), shingles(text_by_id[b]))
        if not (u and 5 * c >= 4 * u and c == c_got and 1_000_000 * c // u == fp_got):
            unsound.append((a, b, c_got, fp_got, c, u))
    print(
        f"RESULT wall={wall:.1f}s got={len(got)} expected={len(expected)} "
        f"missing={len(missing)} extras={len(extras)} unsound={len(unsound)}"
    )
    if missing:
        print("MISSING (first 5):", list(missing.items())[:5])
    if unsound:
        print("UNSOUND (first 5):", unsound[:5])
    ok = not missing and not unsound
    print("PLANTED-PAIR AUDIT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
