"""Document deduplication operators [EXT]: exact, MinHash-LSH, SimHash,
n-gram Jaccard — the training-data-pipeline surface beyond the
reference (whose only dedup is keyed keep-last / dropDuplicates,
SURVEY.md §2.8).

Everything here is pure Catalyst expressions — no Python UDFs — so the
hot path stays in whole-stage codegen, and every hash is the engine's
portable 60-bit sha256-prefix hash (functions/hashing.py) so the DuckDB
oracle can reproduce results bit-for-bit.

Scale design (100 TB):
* shingling + min-hash signatures are per-row `transform`s — no shuffle;
* LSH banding is ONE shuffle keyed on (band, band_signature) — the
  bucket join never materializes the full pair matrix;
* the exact-Jaccard verifier joins only on shared shingles; production
  deployments should cap posting-list length per shingle (drop
  ultra-frequent shingles) to bound skew — noted inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = " +"


def words_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, WORD_SPLIT)


def _seeded_hash(col: Column, seed_col: Column) -> Column:
    """Portable 60-bit hash with a *column* seed (see functions/hashing.py)."""
    digest = F.sha2(F.concat(F.lit("s"), seed_col.cast("string"), F.lit(":"), col), 256)
    return F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint")


def exploded_shingles(
    docs: DataFrame, id_col: str = "doc_id", n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs; docs with < n words drop out.

    distinct=True dedups per doc (required for Jaccard set semantics —
    one shuffle); MIN-based consumers (minhash, fingerprints) pass
    distinct=False since min over a multiset equals min over its set,
    saving that shuffle entirely.
    """
    joined = "concat_ws(' ', " + ", ".join(f"w[i + {j}]" for j in range(n)) + ")"
    with_words = docs.select(F.col(id_col), words_col("text").alias("w"))
    sh = F.expr(
        f"CASE WHEN size(w) >= {n} THEN transform(sequence(0, size(w) - {n}), i -> {joined}) "
        "ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    out = with_words.select(F.col(id_col), F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


# Universal-hash family for MinHash: ONE sha256 per shingle produces a
# 28-bit base hash; the k family members are (a_s*h + b_s) mod P derived
# arithmetically (standard k-wise hashing). 28 bits keeps a_s*h inside
# int64 in both engines; sha256 work drops k-fold vs hashing per seed.
MINHASH_P = 268435399  # largest prime < 2^28


def base_hash28(col: Column) -> Column:
    digest = F.sha2(col, 256)
    return F.conv(F.substring(digest, 1, 7), 16, 10).cast("bigint")


BASE_HASH28_SQL = "CAST(('0x' || substr(sha256({expr}), 1, 7)) AS BIGINT)"


def universal_hash(base: Column, seed_col: Column) -> Column:
    a = seed_col * 2 + 1
    b = seed_col * 7919 + 13
    return (a * base + b) % MINHASH_P


UNIVERSAL_HASH_SQL = "(({seed} * 2 + 1) * {base} + ({seed} * 7919 + 13)) % 268435399"


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", num_hashes: int = 6
) -> DataFrame:
    """(id, seed, sig): min universal hash per seed over the doc's shingles."""
    spark = shingled.sparkSession
    seeds = F.broadcast(spark.range(num_hashes).withColumnRenamed("id", "seed"))
    hashed = shingled.select(id_col, base_hash28(F.col("shingle")).alias("h"))
    return (
        hashed.crossJoin(seeds)
        .groupBy(id_col, "seed")
        .agg(F.min(universal_hash(F.col("h"), F.col("seed"))).alias("sig"))
    )


def lsh_candidate_pairs(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a, doc_b) sharing any minhash value — LSH banding with
    one row per band. ONE shuffle on (seed, sig); no full pair matrix."""
    a = sigs.select(F.col(id_col).alias("doc_a"), "seed", "sig")
    b = sigs.select(F.col(id_col).alias("doc_b"), "seed", "sig")
    return (
        a.join(b, ["seed", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    shingled: DataFrame, id_col: str = "doc_id", threshold: float = 0.05
) -> DataFrame:
    """Exact Jaccard over distinct shingles for pairs sharing >= 1 shingle.

    At 100 TB, cap the posting list per shingle (drop shingles appearing
    in > K docs) before this join to bound skew; the synthetic corpus
    doesn't need it.
    """
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = shingled.select(F.col(id_col).alias("doc_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash16(docs: DataFrame, id_col: str = "doc_id", seed: int = 7) -> DataFrame:
    """16-bit SimHash over each doc's distinct words.

    bit b of the fingerprint is 1 iff sum over words of
    (+1 if bit b of hash(word) else -1) is positive. Bit extraction uses
    integer shiftright — the 60-bit hashes exceed double precision, so
    float paths would corrupt bits.
    """
    wds = (
        docs.select(F.col(id_col), F.explode(words_col("text")).alias("word"))
        .distinct()
        .select(id_col, _seeded_hash(F.col("word"), F.lit(seed)).alias("h"))
    )
    spark = docs.sparkSession
    bits = F.broadcast(spark.range(16).withColumnRenamed("id", "b"))
    contrib = F.when(F.expr("(shiftright(h, CAST(b AS INT)) & 1) = 1"), 1).otherwise(-1)
    per_bit = (
        wds.crossJoin(bits)
        .groupBy(id_col, "b")
        .agg(F.sum(contrib).alias("s"))
    )
    bitval = F.when(F.col("s") > 0, F.expr("CAST(pow(2, b) AS BIGINT)")).otherwise(F.lit(0))
    return per_bit.groupBy(id_col).agg(F.sum(bitval).cast("bigint").alias("simhash16"))


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
) -> DataFrame:
    """Cluster ids for an undirected pair graph: each node labeled with the
    minimum node id reachable from it (iterative min-label propagation,
    converging in O(graph diameter) rounds).

    The dedup use: LSH candidate pairs form the edges; each cluster keeps
    one canonical doc. Lineage is truncated per round (localCheckpoint)
    so the plan doesn't grow exponentially; at cluster scale swap in
    checkpoint() on durable storage. Each round is one shuffle on the
    neighbor join + one on the aggregate.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                F.col("node"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
