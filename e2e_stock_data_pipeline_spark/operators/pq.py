"""Product quantization (PQ) ANN [EXT] — the memory-bound scale path
for embedding search: candidates compress from d floats to m small
codes (here m bytes), and query-time distance is a table lookup, not a
dot product.

At 100 TB of embeddings the working set, not compute, is the binding
constraint; PQ shrinks a 64-dim float vector 32x so the scan stage
streams codes while each query carries a tiny (m x k) distance lookup
table. Everything here is DataFrame-shaped:

* codebooks: one KMeans per subspace, fit driver-side on a (sampled)
  candidate set — the classic train-on-sample trade (same as IVF,
  operators/similarity.py:ivf_topk);
* encode: argmin over k centroid distances per subspace as pure
  Catalyst expressions (no UDF) — ties break to the first index,
  deterministic;
* search (ADC): the per-query LUT is |Q| x m x k rows built by joining
  the query's subvectors against the broadcast codebook table; the
  candidate side explodes to (cand, subspace, code) and joins the LUT
  on (subspace, code) — one broadcast join + one groupBy(query, cand),
  never a full-vector product against the candidate table.

Approximation contract: PQ distances are reconstructions, so top-k is
approximate; recall is tested against brute force on planted
duplicates (tests/test_operators.py). Rerank survivors with
operators/similarity.brute_force_topk when exactness matters.

Measured regime note (sf0.01 embeddings, m=8, k=16): on clustered /
near-duplicate data (the dedup use) top-1 recall is >= 80%; on
near-uniform data where the true NN is barely closer than the median
candidate (rank-1 d2 ~1.3 vs median ~2.0 here), quantization error
rivals the neighbor gap and PQ must run as a SHORTLIST stage — top-10
catches 5/10 exact-NNs, top-50 8/10 — followed by exact rerank of the
shortlist. That two-stage shape (code scan -> rerank ~0.1% of corpus)
is the standard production deployment and the one the e2e check runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import dot_q, quantized

# Density divisor for the ADC shortlist (the r15 planted-audit fix):
# effective shortlist = max(shortlist, n_candidates DIV this). Module-
# level so the registered q123 call AND its DuckDB oracle f-string
# reference the same constant and cannot drift (ADVICE r15).
SHORTLIST_SCALE_DIV = 16


def _subvec(vec_col: str, j: int, dsub: int):
    return F.slice(F.col(vec_col).cast("array<double>"), j * dsub + 1, dsub)


def _dist2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_fit_codebooks(
    candidates: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 7,
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Fit m per-subspace KMeans codebooks of k centroids each.

    Returns codebooks[j][c] = centroid vector (d/m floats). The fits run
    over the candidate table (sample it upstream at scale); model state
    is tiny (m * k * d/m floats = d * k) and travels as literals.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if dim is None:
        dim = len(candidates.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = candidates.select(array_to_vector(_subvec(vec_col, j, dsub)).alias("_v"))
        model = KMeans(k=k, seed=seed + j, featuresCol="_v").fit(sub)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int> of length m): nearest centroid per subspace."""
    m, k, dsub = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    codes = []
    for j in range(m):
        dists = F.array(
            *[
                _dist2(_subvec(vec_col, j, dsub), F.array(*[F.lit(x) for x in codebooks[j][c]]))
                for c in range(k)
            ]
        )
        codes.append((F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return df.select(F.col(id_col), F.array(*codes).alias("codes"))


def pq_topk(
    queries: DataFrame,
    encoded_candidates: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_top: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: per-query LUT join against codes.

    Returns (query_id, cand_id, adc_dist2, rnk). The LUT side is
    |Q| * m * k rows (broadcast); the candidate side is |C| * m rows of
    (subspace, code) — the scan never touches a float vector.
    """
    m, k, dsub = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    spark = queries.sparkSession
    book = spark.createDataFrame(
        [(j, c, codebooks[j][c]) for j in range(m) for c in range(k)],
        "j int, c int, cent array<double>",
    )
    qsub = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {m - 1}), "
                f"j -> slice(CAST({vec_col} AS ARRAY<DOUBLE>), j * {dsub} + 1, {dsub}))"
            )
        ).alias("j", "qsub"),
    )
    lut = qsub.join(F.broadcast(book), "j").select(
        "query_id", "j", "c", _dist2(F.col("qsub"), F.col("cent")).alias("d2")
    )
    cand = encoded_candidates.select(
        F.col(id_col).alias("cand_id"), F.posexplode("codes").alias("j", "c")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist2"), F.col("cand_id"))
    return (
        cand.join(F.broadcast(lut), ["j", "c"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("d2").alias("adc_dist2"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k_top)
    )


def _d2_q(a, b):
    """Exact integer squared L2 via the dot decomposition |a|^2 - 2ab + |b|^2.

    Same value as summing (x-y)^2 (integers are exact), but each dot is a
    single fold and the decomposition is what an SQL oracle can replay with
    its native list dot product.
    """
    return dot_q(a, a) - F.lit(2).cast("bigint") * dot_q(a, b) + dot_q(b, b)


def pq_rerank_topk_seeded(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
    n_seeds: int = 16,
    shortlist: int = 32,
    k_top: int = 5,
    shortlist_scale_div: int | None = SHORTLIST_SCALE_DIV,
) -> DataFrame:
    """PQ shortlist -> exact rerank, fully lazy and integer-exact.

    The production two-stage ANN composition (see module docstring): an
    ADC scan over m-byte codes shortlists `shortlist` candidates per
    query, then only those survivors pay an exact full-vector distance.
    Unlike :func:`pq_fit_codebooks` (driver-side KMeans), the codebook
    here is DATA-DERIVED INSIDE THE PLAN: centroid c of subspace j is
    the j-th subvector of the c-th-smallest-id candidate (a deterministic
    sample codebook ~ KMeans iteration zero). That keeps the whole chain
    one lazy Catalyst plan — no fit job, no literals — and lets a SQL
    oracle replay every stage bit-for-bit over integer-quantized vectors.

    Scale shape: seeds are a broadcast O(n_seeds) frame; encode is one
    explode + map-side-combinable groupBy(cand, j) (the stored code
    index at 100 TB); the ADC scan touches codes only (|C| * m rows, no
    float vectors) and shortlisting is a per-query top-k window over an
    aggregated |Q| x |C| code-distance frame; the exact stage reads full
    vectors for `shortlist` rows per query only.

    ``shortlist_scale_div`` is the density guard the r15 planted audit
    demanded (sf10: a FIXED 32-deep shortlist is 6.5% of the gate corpus
    but 0.016% of 200k candidates — measured recall@5 fell to 22.8%):
    the effective shortlist is max(shortlist, n_candidates DIV div),
    computed per query as a COUNT window over the same partition the
    top-k window already shuffles — no extra exchange, and at gate
    scales (< div * shortlist candidates) the output is bit-unchanged.
    A fixed FRACTION is the honest operating point for THIS codebook:
    the 16-seed sampled codebook's distortion does not improve with
    corpus size, so a fixed-count shortlist must lose recall as density
    grows. At true 100 TB scale, swap in a trained codebook
    (pq_fit_codebooks) and a fixed-count shortlist; pass None to
    disable scaling.

    Returns (query_id, cand_id, adc_dist2, exact_d2, rnk) — all bigint
    but the int rnk; ties break on cand_id everywhere.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    subs = f"transform(sequence(0, {m - 1}), j -> slice(_q, j * {dsub} + 1, {dsub}))"

    def checked_q(side: str):
        # Length guard INSIDE the _q expression (a separate asserted
        # column would be pruned out of the plan): a short/malformed
        # embedding would otherwise silently truncate zip_with dots and
        # produce short slice() subvectors — wrong ADC and exact
        # distances instead of an error (ADVICE r7).
        q = quantized(vec_col)
        return F.when(F.size(q) == dim, q).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"pq_rerank: {side} embedding length != dim={dim} for id "),
                    F.col(id_col).cast("string"),
                )
            )
        )

    qn = queries.select(F.col(id_col).alias("query_id"), checked_q("query").alias("_q"))
    cn = candidates.select(F.col(id_col).alias("cand_id"), checked_q("candidate").alias("_q"))

    # Codebook: subvectors of the n_seeds smallest-id candidates. The limit
    # is a TakeOrdered (no global sort); the row_number window then runs on
    # n_seeds rows only.
    seeds = (
        cn.orderBy("cand_id")
        .limit(n_seeds)
        .withColumn("c", F.row_number().over(Window.orderBy("cand_id")) - 1)
    )
    seed_sub = seeds.select("c", F.posexplode(F.expr(subs)).alias("j", "cent"))

    d2 = _d2_q(F.col("sub"), F.col("cent"))

    # Encode: argmin centroid per (candidate, subspace) — min over a
    # lexicographic (d2, c) struct is partial-aggregable, so the explode
    # never shuffles raw subvector rows.
    cand_sub = cn.select("cand_id", F.posexplode(F.expr(subs)).alias("j", "sub"))
    codes = (
        cand_sub.join(F.broadcast(seed_sub), "j")
        .select("cand_id", "j", d2.alias("_d2"), "c")
        .groupBy("cand_id", "j")
        .agg(F.min(F.struct("_d2", "c")).alias("_mc"))
        .select("cand_id", "j", F.col("_mc.c").alias("c"))
    )

    # Per-query LUT: |Q| * m * n_seeds rows, broadcast to the code scan.
    q_sub = qn.select("query_id", F.posexplode(F.expr(subs)).alias("j", "sub"))
    lut = q_sub.join(F.broadcast(seed_sub), "j").select("query_id", "j", "c", d2.alias("d2"))

    adc = (
        codes.join(F.broadcast(lut), ["j", "c"])
        .groupBy("query_id", "cand_id")
        .agg(F.sum("d2").cast("bigint").alias("adc_dist2"))
    )
    ws = Window.partitionBy("query_id").orderBy("adc_dist2", "cand_id")
    short = adc.withColumn("_r", F.row_number().over(ws))
    if shortlist_scale_div is not None and shortlist_scale_div < 1:
        raise ValueError(
            f"shortlist_scale_div must be >= 1 or None to disable the "
            f"density guard, got {shortlist_scale_div}"
        )
    if shortlist_scale_div is not None:
        short = short.withColumn(
            "_nc", F.count(F.lit(1)).over(Window.partitionBy("query_id"))
        ).filter(
            F.col("_r")
            <= F.greatest(
                F.lit(shortlist).cast("bigint"),
                F.expr(f"_nc DIV {shortlist_scale_div}"),
            )
        )
    else:
        short = short.filter(F.col("_r") <= shortlist)
    short = short.drop("_r", "_nc")

    # Exact rerank of survivors only.
    exact = _d2_q(F.col("_qq"), F.col("_cq"))
    wr = Window.partitionBy("query_id").orderBy("exact_d2", "cand_id")
    return (
        short.join(cn.select("cand_id", F.col("_q").alias("_cq")), "cand_id")
        .join(F.broadcast(qn.select("query_id", F.col("_q").alias("_qq"))), "query_id")
        .select("query_id", "cand_id", "adc_dist2", exact.alias("exact_d2"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= k_top)
    )
