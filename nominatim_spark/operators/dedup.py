"""Deduplication operators for training-data pipelines.

Five dedup families, all Spark-native (no Python in the hot path except
where noted), each with an oracle-checkable formulation:

* exact          — content-hash groupBy (plans/gate.py q_dedup_exact)
* MinHash + LSH  — shingle -> min-md5 signatures -> band buckets -> pair
                   join (q_minhash_lsh); portable because the minhash is a
                   lexicographic MIN over md5 strings
* SimHash        — per-token md5-derived bit votes -> 16-bit signature ->
                   hamming-close pairs
* n-gram Jaccard — token-shingle self-join computing exact |A∩B| / |A∪B|
* embedding cosine near-dup — brute-force pair scoring (baseline) and an
  LSH-bucketed variant (random-hyperplane signs from deterministic
  per-dimension md5 weights) as the scale path

Scale notes: the pairwise stages only ever run on LSH-bucket survivors; the
brute-force forms exist as correctness baselines for the oracle.  Shingle
explosion is the big fan-out (|doc| rows per doc) — it shuffles on shingle
hash which is uniform by construction (no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nominatim_spark.operators.textstats import TOKENIZE_EXPR

SIMHASH_BITS = 16


def simhash(df: DataFrame, col: str = "text", key: str = "doc_id") -> DataFrame:
    """16-bit SimHash: each distinct token votes +-1 per bit position from
    its md5; the signature is the sign vector packed into a BIGINT.

    Bit b of token t = bit b of CAST(conv(substr(md5(t),1,8),16,10)); the
    per-document sum over tokens of (2*bit - 1) decides the signature bit.
    Fully expressible in SQL for the oracle.
    """
    toks = df.select(
        key, F.explode(F.array_distinct(F.expr(TOKENIZE_EXPR.format(col=col)))).alias("tok")
    )
    h = F.expr("CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)")
    toks = toks.withColumn("h", h)
    votes = toks.groupBy(key).agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    sig = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return votes.select(key, sig.cast("long").alias("simhash"))


def simhash_pairs(df: DataFrame, col: str = "text", key: str = "doc_id",
                  max_hamming: int = 2) -> DataFrame:
    """Candidate near-dup pairs with hamming(simhash) <= max_hamming.

    Join strategy: split the 16-bit signature into two 8-bit bands; a pair
    within hamming distance 2 shares at least one exact band half when the
    differing bits land in one half — plus the exact-equal case.  (For the
    oracle-checked form we instead emit ALL pairs under the distance with a
    broadcast self-join — document counts after exact dedup make this the
    classic verify stage, not the discovery stage.)
    """
    sigs = simhash(df, col, key)
    a = sigs.select(F.col(key).alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = sigs.select(F.col(key).alias("doc_b"), F.col("simhash").alias("sig_b"))
    pairs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    ham = F.bit_count(F.expr("sig_a ^ sig_b"))
    return pairs.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("doc_a", "doc_b", "hamming")


def simhash_pairs_banded(df: DataFrame, col: str = "text",
                         key: str = "doc_id", max_hamming: int = 2) -> DataFrame:
    """SimHash near-dup pairs via banded bucket join — the scale path.

    Pigeonhole guarantee: the signature splits into ``max_hamming + 1``
    bit-bands, so any pair within the distance agrees exactly on at least
    one band.  Candidates = per-band equi-join on the band value (never an
    all-pairs product); survivors get the exact hamming verify.  Output is
    provably identical to :func:`simhash_pairs`.

    At 16 signature bits the bands are only 4-5 bits wide, so buckets are
    coarse; production scale raises SIMHASH_BITS (the band join cost falls
    ~2^band_width per doubling) — the pigeonhole argument is unchanged.
    """
    sigs = simhash(df, col, key)
    nb = max_hamming + 1
    base, rem = divmod(SIMHASH_BITS, nb)
    widths = [base + (1 if i < rem else 0) for i in range(nb)]
    offsets = [sum(widths[:i]) for i in range(nb)]
    band_structs = F.array(*[
        F.struct(
            F.lit(i).alias("band_idx"),
            F.shiftright(F.col("simhash"), off)
            .bitwiseAND(F.lit((1 << w) - 1)).alias("band_val"),
        )
        for i, (off, w) in enumerate(zip(offsets, widths))
    ])
    bands = (
        sigs.select(key, "simhash", F.explode(band_structs).alias("b"))
        .select(key, "simhash", F.col("b.band_idx").alias("band_idx"),
                F.col("b.band_val").alias("band_val"))
    )
    a = bands.select(
        F.col(key).alias("doc_a"), F.col("simhash").alias("sig_a"),
        "band_idx", "band_val",
    )
    b = bands.select(
        F.col(key).alias("doc_b"), F.col("simhash").alias("sig_b"),
        "band_idx", "band_val",
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.expr("sig_a ^ sig_b"))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame, col: str = "text", key: str = "doc_id",
    n: int = 3, threshold: float = 0.4, max_df: int | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard similarity pairs >= threshold.

    Distinct n-gram shingles per doc; self-join on shingle for |A∩B|;
    |A∪B| = |A| + |B| - |A∩B|.  jacc is rounded to 6 decimals (exact
    rational arithmetic on counts — bit-identical in any engine).

    ``max_df``: optional stop-shingle cap for scale — shingles appearing
    in more than ``max_df`` documents are dropped BEFORE the self-join
    (both from intersections and set sizes, so Jaccard stays internally
    consistent over the capped shingle space).  Without it a single
    ultra-common shingle ('of the city') fans out O(df²) inside its join
    bucket, the classic skew killer at 100 TB.  Recall trade: a pair
    similar ONLY through dropped stop-shingles is missed — same contract
    as the MinHash/LSH paths' banding recall, so OFF by default and the
    oracle runs the exact form.
    """
    toks = TOKENIZE_EXPR.format(col=col)
    # guard: sequence(1, 0) in Spark is DESCENDING [1, 0] — short docs must
    # yield an empty shingle set instead
    shingles = df.select(
        key,
        F.explode(
            F.array_distinct(
                F.expr(
                    f"CASE WHEN size({toks}) >= {n} THEN "
                    f"transform(sequence(1, size({toks}) - {n - 1}), "
                    f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
                    f"ELSE array() END"
                )
            )
        ).alias("shingle"),
    )
    if max_df is not None:
        shingles = shingles.join(
            shingles.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("shingle"),
            "shingle", "left_semi",
        )
    sizes = shingles.groupBy(key).agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.select(F.col(key).alias("doc_a"), "shingle")
    b = shingles.select(F.col(key).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(key).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(key).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jacc",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jacc") >= threshold)
        .select("doc_a", "doc_b", "jacc")
    )


def embedding_neardup_pairs(
    emb: DataFrame, key: str = "vec_id", col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute-force baseline).

    Sequential-fold double dot products (bit-reproducible); cosine rounded
    to 6 decimals.  The LSH-bucketed scale path is
    :func:`embedding_lsh_buckets` + this on bucket survivors.
    """
    dot = F.expr(
        "aggregate(zip_with(emb_a, emb_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )

    def norm(c):
        return F.expr(
            f"sqrt(aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        )

    a = emb.select(F.col(key).alias("doc_a"), F.col(col).alias("emb_a"))
    b = emb.select(F.col(key).alias("doc_b"), F.col(col).alias("emb_b"))
    pairs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.withColumn(
            "cos_r", F.round(dot / (norm("emb_a") * norm("emb_b")), 6)
        )
        .filter(F.col("cos_r") >= threshold)
        .select("doc_a", "doc_b", "cos_r")
    )


def embedding_neardup_lsh(
    emb: DataFrame, key: str = "vec_id", col: str = "embedding",
    threshold: float = 0.9, n_planes: int = 16, n_bands: int = 2,
) -> DataFrame:
    """Embedding near-dup pairs via banded sign-LSH — the scale path.

    Band j packs the signs of ``n_planes/n_bands`` deterministic
    random-hyperplane projections (±1 weights from md5, no RNG); candidate
    pairs share at least one full band value (per-band equi-join, never an
    all-pairs product); survivors get the exact cosine verify that
    :func:`embedding_neardup_pairs` computes, with identical rounding.

    Recall: a pair at angle θ is missed with probability
    ``(1 - (1-θ/π)^r)^b`` — size (r, b) to the threshold.  Exact-direction
    duplicates (cos == 1, e.g. rescaled copies) are *guaranteed* caught:
    scaling preserves every projection sign, so their band values are
    identical.
    """
    r = n_planes // n_bands
    proj = F.expr(
        f"transform(sequence(0, {n_planes - 1}), p -> "
        f"aggregate(zip_with({col}, sequence(0, size({col}) - 1), "
        "(x, d) -> CAST(x AS DOUBLE) * "
        "(CAST(conv(substring(md5(concat(p, ':', d)), 1, 1), 16, 10) AS INT) % 2 * 2 - 1)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    band_structs = F.array(*[
        F.struct(
            F.lit(j).alias("band_idx"),
            F.expr(
                f"aggregate(zip_with(slice(proj, {j * r + 1}, {r}), "
                f"sequence(0, {r - 1}), "
                "(v, p) -> CASE WHEN v > 0 THEN CAST(pow(2, p) AS BIGINT) "
                "ELSE CAST(0 AS BIGINT) END), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("band_val"),
        )
        for j in range(n_bands)
    ])
    bands = (
        emb.withColumn("proj", proj)
        .select(key, F.explode(band_structs).alias("b"))
        .select(key, F.col("b.band_idx").alias("band_idx"),
                F.col("b.band_val").alias("band_val"))
    )
    a = bands.select(F.col(key).alias("doc_a"), "band_idx", "band_val")
    b = bands.select(F.col(key).alias("doc_b"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ea = emb.select(F.col(key).alias("doc_a"), F.col(col).alias("emb_a"))
    eb = emb.select(F.col(key).alias("doc_b"), F.col(col).alias("emb_b"))
    dot = F.expr(
        "aggregate(zip_with(emb_a, emb_b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )

    def norm(c):
        return F.expr(
            f"sqrt(aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        )

    return (
        cand.join(ea, "doc_a").join(eb, "doc_b")
        .withColumn("cos_r", F.round(dot / (norm("emb_a") * norm("emb_b")), 6))
        .filter(F.col("cos_r") >= threshold)
        .select("doc_a", "doc_b", "cos_r")
    )


def embedding_lsh_buckets(
    emb: DataFrame, key: str = "vec_id", col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """Random-hyperplane LSH signature (the ANN/near-dup scale path).

    Plane p's weight for dimension d is a deterministic +-1 from
    md5('p:d') — reproducible on any engine/executor without an RNG.
    Returns (key, bucket) where bucket packs the sign bits.
    """
    dim_weights = F.expr(
        f"transform(sequence(0, {n_planes - 1}), p -> "
        f"aggregate(zip_with({col}, sequence(0, size({col}) - 1), "
        "(x, d) -> CAST(x AS DOUBLE) * "
        "(CAST(conv(substring(md5(concat(p, ':', d)), 1, 1), 16, 10) AS INT) % 2 * 2 - 1)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    bucket = F.expr(
        "aggregate(zip_with(proj, sequence(0, size(proj) - 1), "
        "(v, p) -> CASE WHEN v > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return (
        emb.withColumn("proj", dim_weights)
        .withColumn("bucket", bucket)
        .select(key, "bucket")
    )
