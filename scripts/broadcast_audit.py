"""Static broadcast-hazard audit (r16, after the q86 smoke flake): for
every registered query, build its physical plan against a BIG sf dir
(plan only — nothing executes) and flag BroadcastExchange subtrees that
contain a Generate (explode): Catalyst's size estimate THROUGH an
explode undershoots so badly it statically broadcast two ~50M-row
exploded-shingle frames in q86 — a multi-GB HashedRelation build that
sat at the driver-heap edge and failed by GC timing. An explode under a
broadcast is not automatically wrong (a generate over a 10-row frame is
fine), so the output is a review list, not a gate: each flagged site
names the query, the broadcast's first line, and the generate line.

    python scripts/broadcast_audit.py [sf_dir] [--only q1,q2]

Exits 0 always; pipe to a file and review. Known-benign sites can be
recorded in KNOWN_BENIGN below with a one-line rationale.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules  # noqa: E402
from e2e_stock_data_pipeline_spark.session import get_spark  # noqa: E402

# query -> rationale for an explode-under-broadcast that is genuinely
# small (dimension-bounded generates, one-row scalar frames, ...).
# Reviewed r16 against the sf10 smoke walls:
KNOWN_BENIGN: dict[str, str] = {
    # seed_sub/lut frames: posexplode over the 16 smallest-id seed
    # vectors x m=8 subspaces (and the 5 pinned query vectors) — at
    # most 128 rows regardless of corpus size; the broadcasts are the
    # operator's own explicit hints on its codebook frames
    "q123_pq_rerank": "posexplode bounded by n_seeds*m / |Q|*m constants",
    # minhash_bands' band explode is LSH_NUM_HASHES/ROWS_PER_BAND = 6
    # rows per doc (~3M rows / ~10s of MB at sf10) — an order below the
    # q86 heap hazard and measured stable across every sf10 sweep
    "q155_minhash_calibration": "band explode = 6 rows/doc, agg-adjacent",
    # the l=2 prefix legs broadcast rare-prefix-filtered probe frames
    # built from the materialized token table (LogicalRDD, so scans=[?]);
    # bounded by the posting-cap contract and stable at its measured
    # 115-150s sf10 wall across rounds
    "q184_set_similarity_join": "rare-prefix probe frames, cap-bounded",
}


def _depth(line: str) -> int:
    """Tree depth of a Spark plan line (position of its node marker)."""
    m = re.search(r"[+:]-", line)
    return m.start() if m else -1


def broadcast_generate_sites(plan: str) -> list[tuple[str, str, str]]:
    """(broadcast line, generate line, scanned relations) triples where a
    Generate sits in the BroadcastExchange's subtree. The relations tell
    the reviewer whether the explode multiplies a FACT-table scan (the
    q86 hazard) or a dimension-bounded frame (benign)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = _depth(line)
        gen = None
        rels: list[str] = []
        for j in range(i + 1, len(lines)):
            dj = _depth(lines[j])
            if dj != -1 and dj <= d:
                break  # left the subtree
            if gen is None and "Aggregate" in lines[j]:
                break  # agg-bounded: the broadcast holds group-count rows,
                # not the explode's fan-out — the q86 hazard needs the
                # Generate's raw output under the broadcast
            if gen is None and ("Generate" in lines[j] or "explode" in lines[j]):
                gen = lines[j].strip()[:110]
            m = re.search(r"FileScan parquet \[?([^\]]*)\]?|parquet [^ ]*/(\w+)\.parquet", lines[j])
            if "FileScan" in lines[j]:
                m2 = re.search(r"(\w+)\.parquet", lines[j])
                if m2:
                    rels.append(m2.group(1))
        if gen is not None:
            out.append((line.strip()[:90], gen, ",".join(sorted(set(rels))) or "?"))
    return out


def main(argv: list[str]) -> int:
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else ".bench_sf1/sf10"
    spark = get_spark(app_name="broadcast-audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all_query_modules()
    flagged = errors = 0
    for name, spec in reg.items():
        if only is not None and name not in only:
            continue
        if spec.pinned_sf_dir:
            continue
        try:
            df = spec.spark(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            errors += 1
            print(f"ERROR {name}: {type(exc).__name__}: {str(exc)[:120]}")
            continue
        for bline, gline, rels in broadcast_generate_sites(plan):
            tag = "known-benign" if name in KNOWN_BENIGN else "REVIEW"
            if name not in KNOWN_BENIGN:
                flagged += 1
            print(f"{tag} {name} scans=[{rels}]\n    {gline}")
    print(f"SUMMARY flagged={flagged} errors={errors}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
