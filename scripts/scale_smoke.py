"""Scale smoke: run the engine's custom operators on ~10M generated rows
(100x the sf0.1 events table) on local[32] to demonstrate headroom —
the shapes that must survive a 1000-executor cluster, exercised at the
largest size this box holds comfortably.

    python scripts/scale_smoke.py [n_rows]

Not part of pytest (runtime ~minutes); results are recorded in
BENCH_NOTES.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.operators.asof import asof_join  # noqa: E402
from e2e_stock_data_pipeline_spark.operators.windows import keep_last, moving_avg  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.perf_counter()
    n = fn()
    print(f"{label}: {n:,} rows in {time.perf_counter() - t0:.1f}s")


def main(n_rows: int = 10_000_000) -> None:
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")

    # synthetic event stream: 10k keys, monotone-ish timestamps, 2-dec values
    ev = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            # 9999 is coprime to the %5 event-type split below, so purchase
            # and view rows share user_ids (10000 would partition them apart)
            (F.col("id") % 9_999).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 1_000 + (F.xxhash64("id") % 997)
            ).alias("ts"),
            (F.round(F.abs(F.xxhash64("id", F.lit(1)) % 100_000) / 100.0, 2)).alias("value"),
        )
    )

    timed(
        f"moving averages (2 frames, {n_rows/1e6:.0f}M rows, 10k keys)",
        lambda: ev.select(
            "event_id", moving_avg("user_id", ["ts", "event_id"], "value", 20).alias("ma")
        ).count(),
    )

    timed(
        "keep-last dedup to 10k keys",
        lambda: keep_last(ev, ["user_id"], ["ts", "event_id"]).count(),
    )

    purchases = ev.filter(F.col("event_id") % 5 == 0)
    views = ev.filter(F.col("event_id") % 5 == 1).select("user_id", "ts", "value")
    timed(
        f"as-of join ({n_rows/5e6:.0f}M x {n_rows/5e6:.0f}M, 10k keys)",
        lambda: asof_join(
            purchases, views, on="user_id", left_time="ts", right_time="ts",
            value_cols=["value"],
        ).count(),
    )

    # --- dedup path at 100x: synthetic corpus with planted near-dups ----
    from e2e_stock_data_pipeline_spark.operators.dedup import (  # noqa: E402
        exploded_shingles,
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    n_docs = max(n_rows // 50, 1000)  # ~200k docs at the 10M default
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        # 10-word docs from a 5k-word vocab; every 100th doc repeats the
        # previous doc's words (planted near-dup pairs for the banding join)
        F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.xxhash64((F.col("id") - F.col("id") % 100), F.lit(j)) % 5_000),
                )
                for j in range(10)
            ],
        ).alias("text"),
    )
    sh = exploded_shingles(docs, distinct=False)
    timed(
        f"minhash-lsh candidates ({n_docs/1e3:.0f}k docs, ~{n_docs*8/1e6:.1f}M shingles)",
        lambda: lsh_candidate_pairs(minhash_signatures(sh)).count(),
    )
    timed(
        f"capped jaccard pairs (max_doc_freq=200, {n_docs/1e3:.0f}k docs)",
        lambda: ngram_jaccard_pairs(
            exploded_shingles(docs), threshold=0.5, max_doc_freq=200
        ).count(),
    )

    # --- ANN path at 100x: hyperplane buckets over 1M vectors -----------
    from e2e_stock_data_pipeline_spark.operators.similarity import (  # noqa: E402
        hyperplane_lsh_buckets,
    )

    n_vecs = max(n_rows // 10, 10_000)
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), d -> CAST(xxhash64(id, d) % 1000 AS DOUBLE) / 1000.0)"
        ).alias("embedding"),
    )
    timed(
        f"lsh bucket assignment ({n_vecs/1e6:.1f}M vectors, 16-dim, 8 planes)",
        lambda: hyperplane_lsh_buckets(vecs, dim=16).count(),
    )

    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
