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
* LSH banding is ONE shuffle keyed on (band, s0, s1) — b=6 bands of
  r=2 hashes each (12-seed v2 MinHash, see minhash_bands): bucket
  membership requires TWO simultaneous min-hash matches, so bucket
  sizes fall quadratically with corpus density and the hot-bucket cap
  is a never-binding safety valve (the r14 finding: single-hash
  buckets grow linearly with corpus size, so any cap eventually eats
  true pairs — measured 45.2% planted recall at sf10, 99.0% under
  this scheme). The bucket join never materializes the full pair
  matrix;
* the exact-Jaccard verifier joins only on shared shingles; production
  deployments should cap posting-list length per shingle (drop
  ultra-frequent shingles) to bound skew — noted inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .materialize import MAX_ROWS_PER_TASK, materialize, unpersist_materialized

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


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, sset): each doc's DISTINCT shingle set as ONE array cell —
    the array-land twin of ``exploded_shingles(distinct=True)``.

    Same set membership (``array_distinct`` over the same ``transform``
    the exploded form flattens), but the set never leaves its row: no
    explode, and crucially no corpus-sized DISTINCT shuffle. Docs with
    < n words carry an empty array; such docs have no shingles, hence
    no MinHash signature, hence never appear in an LSH candidate list,
    so verify joins keyed from a candidate frame see identical rows
    either way (r17, guide §2.4 "remove shuffles outright").

    Scale bound: one doc's distinct shingle set must fit an array cell
    (the q187 covered-set precondition) — shingle counts are bounded by
    doc length, which a 100 TB text corpus bounds at ingest anyway."""
    joined = "concat_ws(' ', " + ", ".join(f"w[i + {j}]" for j in range(n)) + ")"
    with_words = docs.select(F.col(id_col), words_col("text").alias("w"))
    sh = F.expr(
        f"CASE WHEN size(w) >= {n} THEN"
        f" array_distinct(transform(sequence(0, size(w) - {n}), i -> {joined}))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return with_words.select(F.col(id_col), sh.alias("sset"))


def exploded_shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs, DISTINCT PER DOC, with the dedup done in-row
    — ``exploded_shingles(distinct=True)`` without the corpus-sized
    DISTINCT shuffle.

    Deliberately explodes the ``array_distinct(transform(...))``
    EXPRESSION, not a projected attribute: ``InferFiltersFromGenerate``
    (SPARK-36715) only infers ``size(g) > 0 AND isnotnull(g)`` when the
    generator input is a plain attribute, and predicate pushdown then
    substitutes that filter through the projection so the whole shingle
    build lands INLINE in the scan filter — the q184 r17 trap, measured
    again on q99's r18 rewrite (sf10 20 -> 81 s before this form).
    Exploding the expression keeps the rule silent and the plan lazy."""
    joined = "concat_ws(' ', " + ", ".join(f"w[i + {j}]" for j in range(n)) + ")"
    with_words = docs.select(F.col(id_col), words_col("text").alias("w"))
    sh = F.expr(
        f"CASE WHEN size(w) >= {n} THEN"
        f" array_distinct(transform(sequence(0, size(w) - {n}), i -> {joined}))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    return with_words.select(F.col(id_col), F.explode(sh).alias("shingle"))


def jaccard_verify_arrays(
    cands: DataFrame,
    ssets: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, n_common, n_a, n_b) for each candidate pair, with the
    exact set intersection computed INSIDE the row.

    Replaces the exploded-shingle verify shape (cands ⋈ shingled ⋈
    shingled on (id, shingle) + re-aggregate + two size joins): that
    form shuffles the corpus-sized exploded frame twice and the
    |cands| × |shingles-per-doc| intermediate once, all to compare
    elements that never needed to leave their documents. Here the two
    joins are keyed on the candidate's doc ids over the one-row-per-doc
    array frame, ``array_intersect`` intersects in-row, and sizes are
    ``size()`` on the same arrays (no separate counts aggregate).
    n_common = |set(a) ∩ set(b)| exactly as the exploded COUNT(*) — the
    arrays are distinct by construction (:func:`shingle_sets`). Any
    extra columns riding on ``cands`` (e.g. q155's n_match_sigs) pass
    through unchanged.

    The merge hints block the static planner from broadcasting the
    array frame: its size estimate is the documents RELATION's bytes,
    blind to the fan-out of the built arrays, so it ships a corpus-
    sized HashedRelation (the r16 q86/q126 heap-edge flake class —
    observed again here on the first r17 array-land plan). SMJ spills
    gracefully and shuffles each side once; the candidate side is
    pair-list-sized."""
    wa = ssets.select(
        F.col(id_col).alias(a_col), F.col("sset").alias("_sa")
    ).hint("merge")
    wb = ssets.select(
        F.col(id_col).alias(b_col), F.col("sset").alias("_sb")
    ).hint("merge")
    return (
        cands.join(wa, a_col)
        .join(wb, b_col)
        .select(
            *[F.col(c) for c in cands.columns],
            F.size(F.array_intersect("_sa", "_sb"))
            .cast("bigint")
            .alias("n_common"),
            F.size("_sa").cast("bigint").alias("n_a"),
            F.size("_sb").cast("bigint").alias("n_b"),
        )
    )


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


# RETIRED r15 (no oracle uses it — enforced by the family-consistency
# contract test); kept with universal_hash so the independence
# regression test can still measure the defect the v2 family fixed.
UNIVERSAL_HASH_SQL = "(({seed} * 2 + 1) * {base} + ({seed} * 7919 + 13)) % 268435399"

# --- v2 family (r14 finding; the registered family since r15) ---------
# The v1 multipliers (2s+1) are SMALL and the shifts are constants, so
# whenever (2s+1)*h_min < P (typical: h_min ~ P/#shingles) the seed's
# argmin is seed 0's argmin — measured 6.5x excess agreement at
# sf0.001, which silently collapses "k independent bands" toward one
# band and caps banding recall below 1-(1-J)^k on every corpus. v2
# draws the multiplier from a golden-ratio Weyl sequence over the FULL
# multiplicative range [1, P-1] (P prime, so every a is a bijection and
# large a values scramble the order relation wraparound-style), keeping
# the closed-form-in-seed shape so the DuckDB oracles can mirror it as
# one SQL expression. a*h still fits int64: a < 2^28, h < 2^28.
_V2_A, _V2_B = 2654435769, 2246822519  # 0x9E3779B9, 0x85EBCA77


def universal_hash_v2(base: Column, seed_col: Column) -> Column:
    a = (F.lit(_V2_A) * (seed_col + 1)) % (MINHASH_P - 1) + 1
    b = (F.lit(_V2_B) * (seed_col + 1)) % MINHASH_P
    return (a * base + b) % MINHASH_P


UNIVERSAL_HASH_V2_SQL = (
    f"((((%d * ({{seed}} + 1)) %% {MINHASH_P - 1}) + 1) * {{base}}"
    f" + ((%d * ({{seed}} + 1)) %% {MINHASH_P})) %% {MINHASH_P}"
) % (_V2_A, _V2_B)

# The registered LSH operating point since r15 (the v1 -> v2 cutover):
# 12-seed v2 MinHash folded into b=6 bands x r=2 rows. Every registered
# query and every oracle mirror derives from these three constants.
LSH_NUM_HASHES = 12
LSH_ROWS_PER_BAND = 2
LSH_BAND_KEYS = ("band", "s0", "s1")


def minhash_wide(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    family: str = "v2",
) -> DataFrame:
    """(id, _s0.._s{k-1}): the per-doc MinHash signature as ONE wide row
    — all k family members aggregated in one groupBy(id) (see
    :func:`minhash_signatures`, which unpivots this frame to the
    (id, seed, sig) banding layout). Exposed since r17 so signature-
    match counting (q155) can compare two docs' sketches as k equality
    terms on two wide rows instead of exploding 2k rows per doc through
    a (seed, sig)-keyed join; both consumers share this aggregate's
    exchange via AQE stage reuse when they appear in one plan."""
    fam = {"v1": universal_hash, "v2": universal_hash_v2}[family]
    hashed = shingled.select(id_col, base_hash28(F.col("shingle")).alias("h"))
    return hashed.groupBy(id_col).agg(
        *[
            F.min(fam(F.col("h"), F.lit(s).cast("bigint"))).alias(f"_s{s}")
            for s in range(num_hashes)
        ]
    )


def minhash_signatures(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
    family: str = "v2",
) -> DataFrame:
    """(id, seed, sig): min universal hash per seed over the doc's shingles.

    All k family members aggregate in ONE groupBy(id) as k min columns —
    the k-fold seed cross-join a naive formulation would shuffle is pure
    waste (k x the rows through the exchange); the wide result (one row
    per doc) then unpivots to the (id, seed, sig) banding layout for
    free. Same values as the explode-then-group form, 1/k the shuffle.

    ``family`` selects the hash family: "v2" (the default and the
    registered family since r15) is the independence-fixed Weyl family
    (universal_hash_v2); "v1" is the original correlated family, kept
    only so the independence regression test can measure the defect it
    replaced.
    """
    wide = minhash_wide(shingled, id_col, num_hashes, family)
    return minhash_signatures_from_wide(wide, id_col, num_hashes)


def minhash_signatures_from_wide(
    wide: DataFrame, id_col: str = "doc_id", num_hashes: int = 12
) -> DataFrame:
    """Unpivot a :func:`minhash_wide` frame to the (id, seed, sig)
    banding layout — free (one explode of a k-element struct array per
    row, no shuffle). Split out (r17) so a caller that needs BOTH
    layouts (q155: bands for candidacy, wide rows for per-pair match
    counts) builds the aggregate once."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).cast("bigint").alias("seed"), F.col(f"_s{s}").alias("sig")
            )
            for s in range(num_hashes)
        ]
    )
    return wide.select(id_col, F.explode(pairs).alias("_p")).select(
        id_col, "_p.seed", "_p.sig"
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    keys: tuple[str, ...] = LSH_BAND_KEYS,
) -> DataFrame:
    """Distinct (doc_a, doc_b) sharing any complete LSH band — ONE
    shuffle on the band key; no full pair matrix. ``keys`` defaults to
    the registered multi-row band layout (band, s0, s1) produced by
    :func:`minhash_bands` / :func:`band_signatures`; the flat
    single-hash layout passes ("seed", "sig").

    The merge hint matters: both join inputs are the SAME signature
    pipeline (shingle explode + sha256 + min-agg), and under the default
    broadcast strategy the build side recomputes that whole subtree —
    every sha256 runs twice. Forcing a sort-merge join puts identical
    shuffle exchanges on both sides, which AQE stage-reuse materializes
    ONCE (measured sf1: 2.7 s -> 1.55 s for the q41 candidate set)."""
    a = sigs.select(F.col(id_col).alias("doc_a"), *keys)
    b = sigs.select(F.col(id_col).alias("doc_b"), *keys)
    return (
        a.hint("merge")
        .join(b, list(keys))
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def band_signatures(
    sigs: DataFrame,
    rows_per_band: int = 2,
    id_col: str = "doc_id",
    num_hashes: int | None = None,
) -> DataFrame:
    """Fold an (id, seed, sig) signature table into multi-row LSH bands:
    (id, band, s0..s{r-1}) with band = seed DIV r. Bucket membership
    then requires r simultaneous min-hash matches, so bucket sizes fall
    roughly as the r-th power of the single-hash density — the fix for
    the r14 finding that single-hash buckets ("docs sharing ONE
    min-shingle") grow linearly with corpus size and force the
    hot-bucket cap to eat true pairs at sf10. Pair collision prob per
    band is J^r; recall with b bands is 1-(1-J^r)^b. One groupBy on
    (id, band); the r sig columns come out of the same aggregate.

    Pass ``num_hashes`` (the seed-family size feeding ``sigs``) to get
    the divisibility guard: a family size not divisible by r would
    leave the trailing band with NULL sig slots, and NULL join keys
    never match — the band's hashes would be computed but contribute
    zero recall, silently degrading the 1-(1-J^r)^b guarantee. Without
    ``num_hashes`` the check cannot run (the seed count is not visible
    from the frame without an action), so prefer :func:`minhash_bands`,
    which always validates."""
    if rows_per_band < 1:
        raise ValueError(f"rows_per_band must be >= 1, got {rows_per_band}")
    if num_hashes is not None and num_hashes % rows_per_band != 0:
        raise ValueError(
            f"num_hashes={num_hashes} is not divisible by rows_per_band="
            f"{rows_per_band}: the trailing band would carry NULL sig "
            "slots that never join — dead hashes, silent recall loss"
        )
    g = sigs.withColumn("band", F.expr(f"seed DIV {rows_per_band}"))
    return g.groupBy(id_col, "band").agg(
        *[
            F.max(
                F.when(F.col("seed") % rows_per_band == i, F.col("sig"))
            ).alias(f"s{i}")
            for i in range(rows_per_band)
        ]
    )


def minhash_bands(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = LSH_NUM_HASHES,
    rows_per_band: int = LSH_ROWS_PER_BAND,
    family: str = "v2",
) -> DataFrame:
    """The one-call LSH index build: v2 MinHash signatures folded into
    multi-row bands — (id, band, s0..s{r-1}), ready for
    ``lsh_candidate_pairs(bands, keys=LSH_BAND_KEYS)``. Composes
    :func:`minhash_signatures` and :func:`band_signatures` with the
    divisibility guard always on (the num_hashes is known here). Two
    groupBys on the id key (signatures, band fold) — no extra
    shuffle vs the flat layout, since the band fold groups on
    (id, band) and id already co-partitions it."""
    sigs = minhash_signatures(shingled, id_col, num_hashes, family)
    return band_signatures(sigs, rows_per_band, id_col, num_hashes=num_hashes)


def filter_hot_buckets(
    sigs: DataFrame, max_bucket: int, keys: tuple[str, ...] = ("seed", "sig")
) -> DataFrame:
    """Drop LSH buckets with more than ``max_bucket`` members — the
    banding-side twin of :func:`ngram_jaccard_pairs`'s posting-list cap.

    A (seed, sig) bucket holding d docs feeds d*(d-1)/2 candidate pairs
    to ONE reducer; with a k-hash MinHash sketch a bucket in the hundreds
    means a near-degenerate signature (empty/boilerplate text), which is
    collision noise, not near-duplication. Measured on the synthetic
    corpus: cap 100 never binds through sf1 (max bucket 79) but removes
    96% of sf10's 417M candidate pairs. Bucket counts are one extra
    groupBy on the SAME key the banding join shuffles on; the qualifying-
    bucket list is tiny (#distinct buckets) so the join back is
    broadcast-sized at any corpus scale."""
    counts = sigs.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bc"))
    ok = counts.filter(F.col("_bc") <= max_bucket).drop("_bc")
    return sigs.join(ok, list(keys))


def ngram_jaccard_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.05,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct shingles for pairs sharing >= 1 shingle.

    ``max_doc_freq`` is the 100 TB skew guard: shingles appearing in more
    than K documents are dropped from the representation BEFORE the
    self-join (both the intersection AND the set sizes use the capped
    set, so the result is exactly Jaccard over non-viral shingles). A
    shingle in d docs contributes d*(d-1)/2 candidate pairs to one
    reducer; one boilerplate shingle shared by 1e6 docs would otherwise
    pin 5e11 pairs on a single key. With the cap, per-shingle work is
    bounded by K^2 regardless of corpus size. None = uncapped (exact
    classic Jaccard; fine at bench scale).
    """
    if max_doc_freq is not None:
        doc_freq = shingled.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("_df")
        )
        shingled = (
            shingled.join(doc_freq, "shingle")
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
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


def containment_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.6,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric Jaccard CONTAINMENT |A ∩ B| / |A| over distinct
    shingles — the signal symmetric Jaccard misses: a short document
    pasted inside a much longer one scores near 1.0 here while its
    symmetric Jaccard stays tiny (|A|/|B|). The quote/excerpt/subset
    detector a curation pipeline runs alongside near-dup.

    Ordered pairs: (doc_a contained-in doc_b); each direction is emitted
    independently when its containment clears ``threshold`` (the common
    case — a snippet inside a long doc — survives in exactly one
    direction). ``max_doc_freq`` is the same viral-
    shingle posting-list cap as :func:`ngram_jaccard_pairs` (containment
    is then exact over the capped shingle sets — the intersection AND
    |A| both use the capped representation).
    """
    if max_doc_freq is not None:
        doc_freq = shingled.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        shingled = (
            shingled.join(doc_freq, "shingle")
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a = shingled.select(F.col(id_col).alias("doc_a"), "shingle")
    b = shingled.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("n_a"))
    containment = F.col("n_common").cast("double") / F.col("n_a").cast("double")
    return (
        inter.join(sa, "doc_a")
        .select("doc_a", "doc_b", "n_a", "n_common", containment.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def incremental_neardup(
    docs: DataFrame,
    is_new,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = LSH_NUM_HASHES,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup check of a NEW batch against the EXISTING corpus — the
    daily-ingest composition: candidates pair only across the
    new/corpus boundary, never corpus x corpus, so incremental work
    scales with the batch, not the archive.

    ``is_new`` is a boolean Column over ``docs`` marking today's batch.
    Stages mirror q86's recall->precision pipeline: v2 MinHash banding
    (b bands of r=2 rows, see :func:`minhash_bands`) proposes
    cross-boundary candidates (one shuffle on (band, s0, s1)); exact
    Jaccard verifies only those candidates at ``threshold``.

    At 100 TB the corpus side's band index is a stored table (computed
    once, appended per batch) — here both sides derive from one frame
    for oracle replayability, which changes cost, not semantics.
    ``max_bucket`` applies :func:`filter_hot_buckets` to the combined
    band set before the cross-boundary banding join (the density
    guard that keeps a degenerate-signature bucket from pairing the
    whole batch against the whole corpus — never-binding under r=2
    bands at every measured density, kept as the safety valve). Returns
    (doc_new, doc_old, jaccard).
    """
    flagged = docs.select(F.col(id_col), is_new.alias("_new"), F.col("text"))
    bands = minhash_bands(
        exploded_shingles(flagged, id_col, distinct=False), id_col, num_hashes
    ).join(flagged.select(id_col, "_new"), id_col)
    if max_bucket is not None:
        bands = filter_hot_buckets(bands, max_bucket, keys=LSH_BAND_KEYS)
    new_side = bands.filter(F.col("_new")).select(
        F.col(id_col).alias("doc_new"), *LSH_BAND_KEYS
    )
    old_side = bands.filter(~F.col("_new")).select(
        F.col(id_col).alias("doc_old"), *LSH_BAND_KEYS
    )
    cands = (
        new_side.join(old_side, list(LSH_BAND_KEYS))
        .select("doc_new", "doc_old")
        .distinct()
    )

    # Exact-Jaccard verify in ARRAY land (r17): the candidate pair list
    # joins the one-row-per-doc distinct shingle-set frame and
    # intersects in-row — replacing the exploded-shingle 3-frame join
    # whose 50M-row merge-hinted SMJ legs (the r16 broadcast-flake fix)
    # were this query's dominant cost. Set semantics identical; sizes
    # read off the same arrays.
    ver = jaccard_verify_arrays(
        cands, shingle_sets(flagged, id_col), "doc_new", "doc_old", id_col
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    )
    return ver.select("doc_new", "doc_old", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
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
    # r17 (guide §2.3 "aggregate before you shuffle", the
    # minhash_signatures k-min lesson applied to sign counts): all 16
    # per-bit sums ride ONE groupBy(id) as 16 agg columns. The old shape
    # cross-joined every distinct word with a 16-row bit frame — 16x the
    # rows through the (id, b) exchange — then needed a SECOND exchange
    # to fold bits per doc; this one collapses map-side to one row per
    # doc and removes the bit fold's exchange outright. Values are
    # identical: per (doc, b), s = sum(+/-1 over distinct words), bit b
    # set iff s > 0, fingerprint = sum of 2^b over set bits.
    wide = wds.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"_b{b}")
            for b in range(16)
        ]
    )
    fp: Column = F.lit(0).cast("bigint")
    for b in range(16):
        fp = fp + F.when(F.col(f"_b{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return wide.select(id_col, fp.cast("bigint").alias("simhash16"))


# Broadcast the per-node star-round min tables when the graph has at
# most this many nodes: (long, long) rows at ~16 B + overhead keep the
# broadcast under ~100 MB — one copy per executor on a cluster. Above
# it, star rounds fall back to shuffle joins.
_BCAST_NODE_LIMIT = 4_000_000


def node_gated_broadcast_hint(nodes: DataFrame):
    """Broadcast-hint factory gated on the CC node bound: returns
    ``F.broadcast`` when ``nodes`` has at most ``_BCAST_NODE_LIMIT``
    rows (one driver-sized count — the same probe connected_components
    runs per round), else the identity, so callers joining a per-node
    frame against a pair set fall back to AQE's shuffle choice instead
    of force-broadcasting an unbounded build side. Lives here (not in a
    plan module) because the count is an action by design — the plan
    modules stay action-free under the plan-purity lint."""
    if nodes.count() <= _BCAST_NODE_LIMIT:
        return F.broadcast
    return lambda frame: frame


def _edge_signature(e: DataFrame) -> tuple:
    """Order-independent fingerprint of a deduped edge set: (count,
    bit_xor(xxhash64(u, v))) — xor is order-independent over a SET and
    cannot overflow under ANSI mode. One scan of the materialized frame."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    strict: bool = True,
    assume_canonical: bool = False,
    pre_materialized: bool = False,
) -> DataFrame:
    """Cluster ids for an undirected pair graph: each node labeled with the
    minimum node id reachable from it.

    Algorithm: alternating large-star / small-star contraction (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the published O(log^2 n)-round algorithm, in practice a handful of
    rounds on real graphs REGARDLESS of diameter. This replaced r1-r11's
    min-label propagation, whose O(diameter) rounds made the sf10
    near-dup closure (336M candidate pairs) take 598 s; each star round
    here both shrinks the edge set (edges contract toward component
    minima) and runs in a constant number of shuffles.

    One round over the current edge set E (kept deduped, no self-loops):

    * large-star — over the symmetric neighbor view, each node u computes
      m(u) = min(N(u) + {u}) and reconnects every STRICTLY LARGER
      neighbor v to m(u): emit (v, m(u)). Every output edge is oriented
      (child > parent), so the output needs no re-orientation.
    * small-star — over the now-oriented edges grouped by the larger
      endpoint u, m(u) = min of the smaller neighbors; every smaller
      neighbor v != m(u) and u itself reconnect to m(u).

    The edge set is a fixed point of the round map iff it is a union of
    min-rooted stars (the paper's termination theorem), at which point
    the edges ARE the (node -> cluster-min) labels. Convergence is
    detected by an order-independent signature (count + hash sum) of the
    materialized edge set — one cheap scan per round, no join.

    The dedup use: LSH candidate pairs form the edges; each cluster keeps
    one canonical doc. Scale/latency design:

    * only nodes that touch an edge enter the iteration — in a near-dup
      graph the overwhelming majority of docs are singletons and are
      attached by one final left join, so per-round data is O(|E|), not
      O(|corpus|);
    * the initial edge set and each round's output are materialized with
      spill-safe DISK_ONLY storage + sized re-widening
      (operators/materialize.py) so lineage stays flat; at cluster scale
      swap in checkpoint() on durable storage;
    * when the node universe is small enough (_BCAST_NODE_LIMIT), the
      per-node min tables broadcast, making a round broadcast joins +
      ONE shuffle (the output dedup); otherwise shuffle joins, with the
      round's exchange width sized from the live edge count;
    * the per-round frames are explicitly unpersisted once the next
      round's set is materialized, so a long session does not accumulate
      block-manager residue (VERDICT r11 item 3).
    """
    import os
    import time as _time

    spark = edges.sparkSession
    canon = edges.select(
        F.greatest("doc_a", "doc_b").alias("u"),
        F.least("doc_a", "doc_b").alias("v"),
    ).where(F.col("u") != F.col("v"))
    if not assume_canonical:
        # ``assume_canonical=True`` is the caller's attestation that the
        # pair set is already deduped with doc_a != doc_b (true for
        # lsh_candidate_pairs, which ends in a distinct) — skipping this
        # re-dedup saves one full-edge-set shuffle (~15% of the sf10
        # closure's wall)
        canon = canon.distinct()
    # The initial edge set IS materialized, deliberately: round 0 consumes
    # it twice (the per-node min build and the reconnect probe), and a
    # lazy input was MEASURED far worse at sf10 (r12: >1200 s vs 284 s) —
    # AQE stage reuse shares the upstream exchange, but every consumer
    # re-runs the banding pipeline's final distinct aggregate over the
    # 336M-row shuffle, and the round-0 width override bloats the
    # upstream pipeline's own exchanges. Writing the 5.4 GB of DISK_ONLY
    # blocks once is the cheaper trade. widen=False: every round-0
    # consumer re-exchanges at the conf width anyway, so the re-widen's
    # second checkpoint write + full shuffle buys nothing here.
    # ``pre_materialized=True`` is the caller's attestation that
    # ``edges`` is ALREADY checkpointed blocks (a query that also feeds
    # the pair set to other consumers materializes it once at its own
    # level); round 0 then iterates the cheap projection directly — the
    # lazy-plan hazard documented above doesn't apply to block re-reads.
    e = canon if pre_materialized else materialize(canon, "u", widen=False)
    # Dense near-dup graphs have FAR fewer nodes than edges (sf10: 500k
    # docs, 336M candidate pairs): when the per-node min table fits a
    # broadcast, ship it to the map side so a star round is broadcast
    # joins + ONE shuffle (the output dedup) instead of sort-merge joins
    # whose per-task sort state starved the 8 GiB unified pool at 32
    # concurrent tasks (r12 first sf10 runs). Decided from the caller's
    # node universe — a cheap count-star upper bound on the graph's node
    # count (over-estimating only costs a skipped broadcast, never
    # correctness); _BCAST_NODE_LIMIT rows of (long, long) is ~a few
    # tens of MB — one copy per executor on a cluster.
    n_node_bound = nodes.count()
    use_broadcast = 0 < n_node_bound <= _BCAST_NODE_LIMIT
    verbose = bool(os.environ.get("SPARK_GRAFT_CC_VERBOSE"))
    if verbose:
        print(
            f"[cc] node_bound={n_node_bound} broadcast={use_broadcast}",
            flush=True,
        )
    prev_sig: tuple | None = _edge_signature(e)
    converged = prev_sig[0] == 0  # empty graph: already a (trivial) fixpoint
    # Size the round's shuffle width from the LIVE edge count: the star
    # joins/aggregates process ~2x the edge set (symmetric view), and at
    # the session's toy-scale default (32) an sf10 round would hand each
    # reducer 20M+ rows of concurrent hash-map state — the GCLocker heap
    # death the r12 first sf10 run hit. AQE coalesces whatever a round
    # doesn't need, so over-providing is one cheap config write per round.
    old_width = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for _round in range(max_iter):
            if converged:
                break
            _t0 = _time.perf_counter()
            width = max(
                int(old_width),
                min(2048, -(-2 * prev_sig[0] // MAX_ROWS_PER_TASK)),
            )
            spark.conf.set("spark.sql.shuffle.partitions", str(width))
            # large-star: m(u) = min(N(u) + {u}) over BOTH directions;
            # every strictly larger neighbor reconnects to m(u).
            # m(u) <= u < v, so outputs are already (larger, smaller)-
            # oriented and loop-free.
            sym = e.unionByName(
                e.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            lmin = (
                sym.groupBy("u")
                .agg(F.min("v").alias("mv"))
                .select("u", F.least("mv", F.col("u")).alias("m"))
            )
            if use_broadcast:
                lmin = F.broadcast(lmin)
            lg = (
                sym.join(lmin, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .distinct()
            )
            if use_broadcast:
                # lg feeds BOTH small-star inputs; checkpoint it so the
                # broadcast build doesn't re-execute the large-star
                # subtree, and so each half-round is one simple
                # scan -> broadcast-join -> dedup pipeline
                lg = materialize(lg, "u")
            # small-star: grouped by the larger endpoint u over its
            # smaller neighbors, m(u) = min; each smaller neighbor != m
            # and u itself reconnect to m. m < u always, and v > m is
            # filtered, so the output stays oriented and loop-free.
            smin = lg.groupBy("u").agg(F.min("v").alias("m"))
            if use_broadcast:
                smin = F.broadcast(smin)
            stepped = materialize(
                lg.join(smin, "u")
                .where(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .unionByName(smin.select("u", F.col("m").alias("v")))
                .distinct(),
                "u",
            )
            sig = _edge_signature(stepped)
            unpersist_materialized(e)
            if use_broadcast:
                unpersist_materialized(lg)
            e = stepped
            if verbose:
                print(
                    f"[cc] round={_round} width={width} edges={sig[0]} "
                    f"sec={_time.perf_counter() - _t0:.1f}",
                    flush=True,
                )
            if sig[0] == 0 or sig == prev_sig:
                converged = True
                prev_sig = sig
                break
            prev_sig = sig
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_width)
    if prev_sig is None or prev_sig[0] > 0:
        # The signature is a heuristic trigger; soundness (both ways)
        # comes from this one structural check: E is a union of stars iff
        # every child appears exactly once AND no child is also a parent.
        # With the (child > parent) orientation invariant a star's root is
        # below all its children, i.e. the stars are min-rooted — exactly
        # the label set we return. Running it on loop exhaustion too means
        # a graph that lands on the fixpoint in its LAST round (sig
        # equality unobserved) is still accepted. One job at exit, not
        # per round.
        deg = (
            e.select(
                F.col("u").alias("node"),
                F.lit(1).alias("as_child"),
                F.lit(0).alias("as_parent"),
            )
            .unionByName(
                e.select(
                    F.col("v").alias("node"),
                    F.lit(0).alias("as_child"),
                    F.lit(1).alias("as_parent"),
                )
            )
            .groupBy("node")
            .agg(F.sum("as_child").alias("c"), F.sum("as_parent").alias("p"))
        )
        not_star = (
            deg.where((F.col("c") > 1) | ((F.col("c") > 0) & (F.col("p") > 0)))
            .limit(1)
            .count()
        )
        converged = not_star == 0
    if not converged and strict:
        # partial labels are WRONG labels (an unconverged edge set may
        # still split one component) — surface it instead of returning
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "star rounds (pathological for this algorithm — rounds are "
            "O(log^2 n), not O(diameter)); raise max_iter or pass "
            "strict=False to accept partial labels"
        )
    # at the fixpoint E is min-rooted stars: each non-root node appears
    # exactly once as u with v = its component minimum (the min-agg is a
    # no-op there; under strict=False it collapses an unconverged node's
    # multiple parents to one partial label instead of duplicating rows)
    labels = e.groupBy("u").agg(F.min("v").alias("label"))
    out = nodes.select(F.col(id_col)).join(
        labels.select(F.col("u").alias(id_col), "label"),
        id_col,
        "left",
    )
    return out.select(
        F.col(id_col), F.coalesce(F.col("label"), F.col(id_col)).alias("cluster_id")
    )


# Session-scoped memo for the registered near-dup CLUSTER pipeline
# (r17, the graph-tier _EDGE_PLAN_CACHE pattern applied to the dedup
# tier): FOUR registered queries (q56/q105/q153/q158) derive from the
# IDENTICAL (candidate-pair set, cluster-label) frames — same docs
# scan, same 12-seed v2 MinHash, same 6x2 banding, same star-contraction
# fixpoint — and each paid the full ~25-30 s sf10 build per query in a
# sweep. Key = (applicationId, analyzed-plan semanticHash of the docs
# input, id_col, hash-family geometry); a hit is served only while BOTH
# backing checkpoint RDDs are still in the context's persistent map
# (registry.release() spares live memo rids, and a checkpointed frame
# is UNRECOMPUTABLE once its blocks drop, so a stale hit must rebuild).
_CLUSTER_PLAN_CACHE: dict[tuple, tuple[DataFrame, DataFrame, int, int]] = {}


def cluster_labels_plan(
    docs: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """(pairs, labels) for the registered near-dup cluster pipeline,
    materialized ONCE PER SESSION.

    pairs  — distinct LSH candidate (doc_a, doc_b) under the registered
             operating point (minhash_bands over non-distinct shingles),
             DISK_ONLY-checkpointed because the CC fixpoint consumes it
             twice per round-0 and q153's leak audits probe it again;
    labels — connected_components over those pairs (each doc labeled
             with its component's minimum doc_id), checkpointed so memo
             consumers read ~|corpus| rows of blocks instead of
             re-running the fixpoint.

    Every frame is recomputed from the parquet inputs on the first call
    of each Spark application — the memo only amortizes WITHIN one
    session (the sweep/gate shape), never across runs."""
    spark = docs.sparkSession
    try:
        key = (
            spark.sparkContext.applicationId,
            docs._jdf.queryExecution().analyzed().semanticHash(),
            id_col,
            LSH_NUM_HASHES,
            LSH_ROWS_PER_BAND,
        )
    except Exception:  # noqa: BLE001 — unhashable input: skip the memo
        key = None
    if key is not None:
        # evict entries from stopped applications wholesale (the r16
        # ADVICE leak class: the liveness probe below only clears the
        # entry it hits)
        app_id = key[0]
        for k in [k for k in _CLUSTER_PLAN_CACHE if k[0] != app_id]:
            del _CLUSTER_PLAN_CACHE[k]
    if key is not None and key in _CLUSTER_PLAN_CACHE:
        pairs, labels, rid_p, rid_l = _CLUSTER_PLAN_CACHE[key]
        alive = False
        try:
            pm = spark.sparkContext._jsc.getPersistentRDDs()
            alive = pm.containsKey(rid_p) and pm.containsKey(rid_l)
        except Exception:  # noqa: BLE001
            alive = False
        if alive:
            return pairs, labels
        del _CLUSTER_PLAN_CACHE[key]
    sh = exploded_shingles(docs, id_col=id_col, distinct=False)
    pairs = materialize(
        lsh_candidate_pairs(minhash_bands(sh, id_col=id_col), id_col=id_col),
        "doc_a",
        widen=False,
    )
    labels = connected_components(
        docs.select(id_col),
        pairs,
        id_col=id_col,
        assume_canonical=True,
        pre_materialized=True,
    )
    # one ~|corpus|-row DISK_ONLY write; memo hits then read label
    # blocks directly instead of re-joining the final star edge set
    labels = materialize(labels, id_col, widen=False)
    if key is not None:
        try:
            rid_p = pairs._jdf.queryExecution().analyzed().rdd().id()
            rid_l = labels._jdf.queryExecution().analyzed().rdd().id()
            _CLUSTER_PLAN_CACHE[key] = (pairs, labels, rid_p, rid_l)
        except Exception:  # noqa: BLE001 — non-LogicalRDD plan: no memo
            pass
    return pairs, labels
