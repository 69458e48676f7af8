"""Focused semantics tests for the r17 relational rewrites.

q77 (sole-late-supplier): the EXISTS/NOT-EXISTS pair was collapsed to
per-order supplier counts (n_supp >= 2, n_late == 1) — exercise every
qualification branch on a hand-built fixture, including a multi-line
supplier whose lateness comes from one of several lines.

q60 (trigram language id): the DISTINCT-join-count scoring leg became
size(array_intersect(...)) with a min(struct(-hits, p_lang)) argmax —
exercise the hits tiebreak (equal hits -> alphabetically first
language) and the zero-hit exclusion (doc absent from the confusion
matrix, as under the old inner join).
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd

from e2e_stock_data_pipeline_spark.plans.registry import load_all_query_modules

REG = load_all_query_modules()


def _write(tmp_path, table, rows):
    pd.DataFrame(rows).to_parquet(
        os.path.join(str(tmp_path), f"{table}.parquet"),
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    return str(tmp_path)


def test_q77_sole_late_branches(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    late = base + dt.timedelta(days=120)  # > orderdate + 90
    ontime = base + dt.timedelta(days=30)
    li = []

    def line(okey, skey, ship):
        li.append({"l_orderkey": okey, "l_suppkey": skey, "l_shipdate": ship})

    # order 1: A late, B on-time -> A qualifies
    line(1, 101, late), line(1, 102, ontime)
    # order 2: A and B both late -> nobody (n_late == 2)
    line(2, 101, late), line(2, 102, late)
    # order 3: A late but sole supplier -> nobody (n_supp == 1)
    line(3, 101, late)
    # order 4: A has an on-time AND a late line, B on-time -> A qualifies
    line(4, 101, ontime), line(4, 101, late), line(4, 102, ontime)
    # order 5: nobody late -> nobody
    line(5, 101, ontime), line(5, 102, ontime)
    # order 6: B late, A on-time -> B qualifies
    line(6, 101, ontime), line(6, 102, late)

    _write(tmp_path, "lineitem", li)
    _write(
        tmp_path,
        "orders",
        [{"o_orderkey": k, "o_orderdate": base} for k in range(1, 7)],
    )
    d = _write(
        tmp_path,
        "supplier",
        [
            {"s_suppkey": 101, "s_name": "Supplier#101"},
            {"s_suppkey": 102, "s_name": "Supplier#102"},
        ],
    )
    rows = {
        r["s_name"]: r["numwait"]
        for r in REG["q77_sole_late_supplier"].spark(spark, d).collect()
    }
    assert rows == {"Supplier#101": 2, "Supplier#102": 1}


def _q60_reference(docs):
    """Naive reimplementation of the q60 oracle spec: top-20 trigram
    profile per language ((count DESC, trigram ASC) ties), per-doc
    DISTINCT-trigram overlap scores, argmax with (hits DESC, p_lang
    ASC), zero-hit docs excluded."""
    from collections import Counter, defaultdict

    def tri(t):
        return [t[i : i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []

    counts = defaultdict(Counter)
    for d in docs:
        counts[d["lang"]].update(tri(d["text"]))
    profile = {
        lang: {tg for tg, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]}
        for lang, c in counts.items()
    }
    conf = Counter()
    for d in docs:
        tgs = set(tri(d["text"]))
        scores = sorted(
            (-len(tgs & p), pl) for pl, p in profile.items() if tgs & p
        )
        if scores:
            conf[(d["lang"], scores[0][1])] += 1
    return dict(conf)


def test_q60_tiebreak_and_zero_hit_exclusion(spark, tmp_path):
    docs = [
        {"doc_id": 1, "lang": "aa", "text": "aaaaaa"},
        # labeled bb; its only trigram (bbb) also enters the aa profile
        # via doc 3, so it ties 1-1 and must resolve to the
        # alphabetically first profile language
        {"doc_id": 2, "lang": "bb", "text": "bbbbbb"},
        {"doc_id": 3, "lang": "aa", "text": "aaabbb"},
        # shorter than 3 chars -> zero trigrams -> zero hits everywhere
        # -> must be ABSENT from the confusion matrix (the old inner
        # join never produced a row for it)
        {"doc_id": 4, "lang": "aa", "text": "xy"},
    ]
    expected = _q60_reference(docs)
    # the fixture must actually exercise both branches
    assert ("bb", "aa") in expected  # the tie, broken alphabetically
    assert sum(expected.values()) == 3  # doc 4 excluded
    d = _write(tmp_path, "documents", docs)
    out = {
        (r["lang"], r["lang_pred"]): r["n"]
        for r in REG["q60_char_ngram_langid"].spark(spark, d).collect()
    }
    assert out == expected
