"""Deduplication operators for training-data pipelines.

All hot paths are JVM-native (shingling, hashing, banding via built-in
higher-order functions); Python appears only in the SimHash bit-fold, as an
Arrow-batched UDF.  Every operator returns DataFrames of duplicate *pairs* or
deduplicated tables, both shuffle-friendly shapes (no driver collection).

Scale design: MinHash-LSH candidate generation is a single groupBy on
(band_id, band_hash) — the classic shingle→minhash→band→bucket-join; exact
Jaccard verification only runs inside buckets (tiny fraction of pairs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

MERSENNE_P = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash — keep the smallest id per group."""
    h = F.xxhash64(F.col(text_col))
    w = df.withColumn("__h", h)
    keep = w.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "__h"], "left_semi").drop("__h")


def _shingles(text_col: str, k: int) -> F.Column:
    """Character k-shingles as a distinct array — native higher-order fns."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(1, length({text_col}) - {k} + 1)), "
            f"i -> substring({text_col}, i, {k}))"
        )
    )


def minhash_params(num_hashes: int = 64, seed: int = 7):
    """The (a_i, b_i) hash coefficients — shared with the DuckDB oracle."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signature(df: DataFrame, text_col: str = "text", num_hashes: int = 64,
                      shingle_k: int = 5, seed: int = 7,
                      hash_mode: str = "xxhash64") -> DataFrame:
    """Add ``minhash`` array<long> of length ``num_hashes`` (all JVM-side):
    h_i(x) = (a_i·x31 + b_i) mod 2^61−1 with x31 = pmod(hash(x), 2^31) and
    a_i < 2^31 — products stay < 2^62, safe under Spark's ANSI overflow
    checks, min over shingles.  ``hash_mode``: "xxhash64" (native, default)
    or "portable" (polynomial fold, exactly reproducible in DuckDB)."""
    a, b = minhash_params(num_hashes, seed)
    if hash_mode == "portable":
        # fused text -> signature in ONE Arrow pass: sliding-window
        # polynomial hash (identical closed form: sum code_i * 131^(k-1-i)
        # mod 2^31, zero-padded tails) + vectorized min-pluck.  Min over all
        # windows == min over distinct shingles, so array_distinct is
        # unnecessary here.  ~100x the interpreted-HOF route.
        from pyspark.sql.types import ArrayType

        av, bv = a.copy(), b.copy()
        w = np.array([131 ** (shingle_k - 1 - i) for i in range(shingle_k)],
                     dtype=np.int64)

        @pandas_udf(ArrayType(LongType()))
        def _sig_text(texts: pd.Series) -> pd.Series:
            out = []
            for s in texts:
                if s is None:
                    out.append(None)
                    continue
                codes = np.array([ord(c) for c in s], dtype=np.int64) \
                    if not s.isascii() else \
                    np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
                if len(codes) < shingle_k:
                    codes = np.pad(codes, (0, shingle_k - len(codes)))
                n = len(codes) - shingle_k + 1
                h = np.zeros(n, dtype=np.int64)
                for i in range(shingle_k):
                    h += codes[i : i + n] * w[i]
                h %= 2147483648
                m = (av[None, :] * h[:, None] + bv[None, :]) % MERSENNE_P
                out.append(m.min(axis=0))
            return pd.Series(out)

        return df.withColumn("minhash", _sig_text(F.col(text_col)))

    shingle_hash = "transform(__sh, s -> pmod(xxhash64(s), 2147483648))"
    df = df.withColumn("__sh", _shingles(text_col, shingle_k)).withColumn(
        "__shh", F.expr(shingle_hash)
    )

    # the num_hashes x shingles min-pluck as an interpreted HOF measured
    # ~8 ms/doc (465 s for 60k docs) — Arrow-vectorized NumPy does the same
    # integer arithmetic (a*x < 2^62, exact in int64) ~100x faster
    from pyspark.sql.types import ArrayType

    av = a.copy()
    bv = b.copy()

    @pandas_udf(ArrayType(LongType()))
    def _sig(shh: pd.Series) -> pd.Series:
        out = []
        for arr in shh:
            if arr is None or len(arr) == 0:
                out.append(None)  # matches array_min over an empty array
                continue
            x = np.asarray(arr, dtype=np.int64)
            m = (av[None, :] * x[:, None] + bv[None, :]) % MERSENNE_P
            out.append(m.min(axis=0))
        return pd.Series(out)

    return df.withColumn("minhash", _sig(F.col("__shh"))).drop("__sh", "__shh")


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      num_hashes: int = 64, bands: int = 16, shingle_k: int = 5,
                      jaccard_threshold: float = 0.7,
                      hash_mode: str = "xxhash64") -> DataFrame:
    """Near-duplicate pairs via MinHash-LSH banding + exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, num_hashes, shingle_k,
                            hash_mode=hash_mode).select(
        id_col, text_col, "minhash"
    )
    if hash_mode == "xxhash64":
        band_hash = (
            f"xxhash64(to_json(struct(slice(minhash, b * {rows_per_band} + 1, "
            f"{rows_per_band}))))"
        )
    else:
        # portable band fold: (acc*1000003 + (v mod 2^31)) mod 2^31 — band
        # collisions only ADD candidates and the exact verify filters them,
        # so the narrower accumulator is harmless
        band_hash = (
            f"aggregate(slice(minhash, b * {rows_per_band} + 1, {rows_per_band}), "
            "CAST(0 AS BIGINT), "
            "(acc, v) -> pmod(acc * 1000003 + pmod(v, 2147483648), 2147483648))"
        )
    # band self-join on ids ONLY — round 1 carried the full document text
    # through this shuffle; at 100 TB that ships text pairs for every band
    # collision.  Candidates are (id_a, id_b); shingle sets are joined back by
    # id afterwards (and computed once, not twice per pair).
    banded = sig.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b AS band_id, {band_hash} AS band_hash))"
            )
        ).alias("band"),
    ).select(id_col, "band.band_id", "band.band_hash")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact Jaccard on shingle sets, joined back by id (candidate rows only)
    sh = df.select(
        F.col(id_col), _shingles(text_col, shingle_k).alias("__sh")
    )
    cand = (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


@pandas_udf(LongType())
def _simhash_fold(token_hashes: pd.Series) -> pd.Series:
    """Fold token-hash arrays into a 64-bit SimHash (Arrow batch, NumPy ops)."""
    out = np.zeros(len(token_hashes), dtype=np.uint64)
    for i, arr in enumerate(token_hashes):
        if arr is None or len(arr) == 0:
            continue
        h = np.asarray(arr, dtype=np.int64).view(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        votes = 2 * bits.astype(np.int64) - 1
        fold = (votes.sum(axis=0) > 0).astype(np.uint64)
        out[i] = (fold << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
    return pd.Series(out.view(np.int64))


def _poly_token_hashes(s: str) -> np.ndarray:
    """Portable per-token hash: acc = (acc*131 + code) mod 2^31 over the
    token's character codes — byte-identical to the DuckDB list_reduce
    replica in the driver oracle."""
    out = []
    for t in s.lower().strip().split():
        codes = (np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
                 if t.isascii() else
                 np.array([ord(c) for c in t], dtype=np.int64))
        acc = 0
        for c in codes:
            acc = (acc * 131 + int(c)) % 2147483648
        out.append(acc)
    return np.array(out, dtype=np.int64)


@pandas_udf(LongType())
def _simhash_fold_portable(texts: pd.Series) -> pd.Series:
    """Tokenize + portable hash + 32-bit majority fold in one Arrow pass."""
    out = np.zeros(len(texts), dtype=np.int64)
    ks = np.arange(32, dtype=np.int64)
    for i, s in enumerate(texts):
        if s is None:
            continue
        hs = _poly_token_hashes(s)
        if hs.size == 0:
            continue
        votes = (2 * ((hs[:, None] >> ks[None, :]) & 1) - 1).sum(axis=0)
        out[i] = int(((votes > 0).astype(np.int64) << ks).sum())
    return pd.Series(out)


def simhash(df: DataFrame, text_col: str = "text",
            hash_mode: str = "xxhash64") -> DataFrame:
    """Add a ``simhash`` column.  ``hash_mode="xxhash64"`` (default): 64-bit,
    token hashing JVM-side, fold in Arrow.  ``hash_mode="portable"``: 32-bit,
    polynomial token hash — the whole pipeline replays exactly in ANSI SQL
    (driver oracle)."""
    if hash_mode == "portable":
        return df.withColumn("simhash", _simhash_fold_portable(F.col(text_col)))
    toks = F.expr(f"transform(split(lower(trim({text_col})), '\\\\s+'), t -> xxhash64(t))")
    return df.withColumn("simhash", _simhash_fold(toks))


def _banded_hamming_pairs(s: DataFrame, id_col: str, hash_col: str,
                          band_bits: int, max_hamming: int) -> DataFrame:
    """Shared band-block → self-join → bit_count(xor) verify pipeline for
    Hamming near-dup over a single hash column (simhash, phash).

    4 bands of ``band_bits`` bits each: a pair within ``max_hamming`` ≤ 3
    differing bits shares at least one identical band (pigeonhole), so
    recall is EXACT.  100 TB shape: only (id, hash, band) tuples cross the
    band shuffle; the self-join is an equi-join per band bucket (never all
    pairs); verification is JVM bit math on the small candidate set.
    Returns (id_a, id_b, hamming:long).
    """
    band_mask = (1 << band_bits) - 1
    banded = s.select(
        id_col,
        hash_col,
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b -> struct(b AS band_id, "
                f"shiftright({hash_col}, CAST(b * {band_bits} AS INT)) & "
                f"CAST({band_mask} AS BIGINT) AS band_val))"
            )
        ).alias("band"),
    ).select(id_col, hash_col, "band.band_id", "band.band_val")
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col(f"l.{hash_col}").alias("h_a"),
            F.col(f"r.{hash_col}").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("long")
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def simhash_near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", max_hamming: int = 3,
                           hash_mode: str = "xxhash64") -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, via band blocking
    (4 bands ⇒ exact recall for ≤ 3 differing bits — pigeonhole).  64-bit
    hash → 4×16-bit bands; portable 32-bit hash → 4×8-bit bands."""
    band_bits = 8 if hash_mode == "portable" else 16
    s = simhash(df, text_col, hash_mode=hash_mode).select(id_col, "simhash")
    return _banded_hamming_pairs(s, id_col, "simhash", band_bits, max_hamming)


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             cosine_threshold: float = 0.95,
                             planes: int = 16, seed: int = 11,
                             dim: int | None = None) -> DataFrame:
    """Embedding near-dups: sign-random-projection bucket join, exact cosine
    verify inside buckets (see similarity.srp_bucket for the bucketing)."""
    from .similarity import srp_bucket, cosine_sim_col

    b = srp_bucket(df, vec_col, planes=planes, seed=seed, dim=dim)
    l, r = b.alias("l"), b.alias("r")
    cand = l.join(
        r,
        (F.col("l.__bucket") == F.col("r.__bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        F.col(f"l.{vec_col}").alias("va"),
        F.col(f"r.{vec_col}").alias("vb"),
    )
    return (
        cand.withColumn("cosine", cosine_sim_col("va", "vb"))
        .filter(F.col("cosine") >= cosine_threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", shingle_k: int = 5,
                        jaccard_threshold: float = 0.7,
                        max_doc_freq: int = 100) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via a df-pruned inverted index.

    Candidate generation: explode distinct k-shingles, DROP shingles whose
    document frequency exceeds ``max_doc_freq`` (stopword-like shingles pair
    everything with everything — the classic quadratic blowup), self-join the
    remaining postings.  Exact Jaccard (over the FULL shingle sets) verifies
    candidates.

    Exactness condition: a pair with jaccard >= t shares >= t/(1+t) of its
    union; it is missed only if ALL its shared shingles are high-frequency.
    With threshold 0.7 and realistic near-dup text that does not occur — and
    unlike MinHash-LSH the candidate stage here is deterministic.  At 100 TB
    the df-pruned postings join is the standard shape: postings shuffle on
    shingle, skew is capped by the df cutoff."""
    sh = df.select(F.col(id_col), _shingles(text_col, shingle_k).alias("__sh"))
    post = sh.select(id_col, F.explode("__sh").alias("__g"))
    rare = post.groupBy("__g").count().filter(F.col("count") <= max_doc_freq)
    post = post.join(rare.select("__g"), "__g")
    cand = (
        post.alias("l")
        .join(post.alias("r"),
              (F.col("l.__g") == F.col("r.__g"))
              & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def phash_near_dup_pairs(df: DataFrame, id_col: str = "image_id",
                         phash_col: str = "phash",
                         max_hamming: int = 3) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance —
    the image-payload analogue of :func:`simhash_near_dup_pairs` over the
    images table's ``phash`` column (``reference``-side schema: the
    image+caption input hint carries ``phash:int64`` precisely for this).

    4×16-bit band blocking: a pair with ≤ 3 differing bits shares at least
    one identical 16-bit band (pigeonhole over 4 bands), so recall is EXACT
    for ``max_hamming`` ≤ 3; candidates are verified with
    ``bit_count(xor)``.  100 TB shape: only (id, band) tuples cross the
    band shuffle, the self-join is an equi-join per band bucket (no all
    pairs), and verification is JVM bit math on the already-small candidate
    set.
    """
    s = df.select(F.col(id_col), F.col(phash_col).alias("__ph"))
    return _banded_hamming_pairs(s, id_col, "__ph", 16, max_hamming)


def connected_components(pairs: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25) -> DataFrame:
    """Duplicate-cluster resolution: (node, comp) where ``comp`` is the
    minimum id reachable from ``node`` over the pair graph — so the label IS
    the canonical document of the cluster.  The step near-dup pipelines need
    after pair generation: A~B and B~C must collapse to ONE keep-document
    even though (A, C) was never emitted as a pair.

    Min-label propagation: each round joins labels to the symmetric edge
    list and takes the min over the closed neighborhood; ``localCheckpoint``
    cuts the lineage per round (the iterative-plan blowup lesson from kNN).
    Rounds needed = graph diameter.  Near-dup graphs are band-connected
    near-cliques (every pair of similar docs shares an LSH bucket with high
    probability), so diameter is small — typically <= 3; a web-scale engine
    whose clusters may chain longer would switch to the alternating
    small-star/large-star algorithm (same per-round shuffle shape, O(log n)
    rounds guaranteed).  Raises if ``max_iter`` rounds don't converge rather
    than returning partial labels.
    """
    e = pairs.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct().localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node")).distinct()
        .withColumn("comp", F.col("node")).localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(edges["u"].alias("node"), "comp")
        )
        new = (
            nbr.unionByName(labels)
            .groupBy("node").agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n").join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp")).limit(1).count()
        )
        labels.unpersist()
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
