"""Similarity / dedup kernels: cosine, MinHash, SimHash, LSH banding.

North-star training-data operators. Everything is built from JVM-side array
expressions (zip_with / aggregate / transform) — no Python in the per-row
path; only the random-hyperplane generation for vector LSH happens driver-
side (tiny, seeded, broadcast as literals).

Scale notes:
- MinHash signatures are k min-aggregations over shingle hashes — computed
  in one projection per document, no shuffle until the band explode; bands
  shuffle |docs|·|bands| small rows.
- SimHash packs to ONE bigint per doc; banding on bit-slices gives the
  candidate join. Hamming verify is a pair-local popcount.
- Cosine uses an explicit double fold so Spark and the DuckDB oracle
  (list_dot_product on DOUBLE[]) accumulate in the same element order →
  bit-identical scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for the universal-hash family: with a,b,x' < 2^31,
# a·x'+b stays under 2^63 — no long overflow under ANSI mode (Spark 4
# default). 31-bit minhash values are ample for dedup banding.
_MERSENNE = (1 << 31) - 1


def dot(a: Column, b: Column) -> Column:
    """Sequential double fold of a·b (deterministic element order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a||b|) — formula mirrored verbatim in oracles:
    list_dot_product(a,b)/sqrt(list_dot_product(a,a)*list_dot_product(b,b)).

    nullif guard: a zero-norm vector makes the divisor 0.0 — ANSI Spark
    would throw DIVIDE_BY_ZERO while DuckDB's x/0 is NULL; dividing by
    NULL instead reproduces the oracle's NULL score for degenerate rows.
    """
    return dot(a, b) / F.nullif(
        F.sqrt(dot(a, a) * dot(b, b)), F.lit(0.0)
    )


def minhash_signature(hashes: Column, num_perm: int = 32, seed: int = 7) -> list[Column]:
    """MinHash signature: per permutation i, min over shingle-hash set of
    the universal hash (a_i·x + b_i) mod p.

    Returns ``num_perm`` Columns (use inside one ``select`` — a single
    projection computes the whole signature). Seeded deterministic
    coefficients; empty shingle sets yield NULL mins (filter upstream).
    """
    import random

    rnd = random.Random(seed)

    def _perm(a: int, b: int):
        # factory, not default-arg lambda: PySpark introspects lambda arity
        # and rejects extra (defaulted) parameters
        def apply(x):
            # fold the signed 64-bit xxhash into [0, p) first so the affine
            # step cannot overflow a long under ANSI mode
            return F.pmod(F.pmod(x, F.lit(_MERSENNE)) * F.lit(a) + F.lit(b), F.lit(_MERSENNE))

        return apply

    cols = []
    for i in range(num_perm):
        a = rnd.randrange(1, _MERSENNE)
        b = rnd.randrange(0, _MERSENNE)
        cols.append(F.array_min(F.transform(hashes, _perm(a, b))).alias(f"mh_{i}"))
    return cols


def lsh_bands(sig_cols: list[str], rows_per_band: int = 4) -> Column:
    """Group a minhash signature into LSH bands → array<struct<band,key>>.

    Two docs sharing ANY (band, key) become a candidate pair; with b bands
    of r rows, P(candidate) = 1-(1-j^r)^b — the classic S-curve.
    """
    n = len(sig_cols)
    assert n % rows_per_band == 0
    bands = []
    for b0 in range(0, n, rows_per_band):
        band_id = b0 // rows_per_band
        key = F.xxhash64(*[F.col(c) for c in sig_cols[b0:b0 + rows_per_band]])
        bands.append(F.struct(F.lit(band_id).alias("band"), key.alias("key")))
    return F.array(*bands)


def lsh_bands_from_array(sig: Column, num_perm: int, rows_per_band: int = 4) -> Column:
    """lsh_bands over an array<bigint> signature column (the pandas-UDF
    signature form) → array<bigint> of band keys.

    The band id is hashed INTO the key (xxhash64 seeded by band_id), so a
    bare long suffices — no (band, key) struct. A cross-band key collision
    merely adds a candidate pair that exact-verify discards; meanwhile the
    LSH shuffle ships 8-byte keys, which is what the band join's cost is
    made of at 100 TB.
    """
    assert num_perm % rows_per_band == 0
    return F.array(*[
        F.xxhash64(F.lit(band_id), F.slice(sig, band_id * rows_per_band + 1, rows_per_band))
        for band_id in range(num_perm // rows_per_band)
    ])


def cosine_np():
    """Arrow-vectorized pairwise cosine: two array<double> columns → double.

    numpy float64 dot differs from the sequential-fold oracle formula only
    in summation order (ulps over 64 terms); callers round to 6 decimals on
    both sides, which absorbs it.
    """

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.full(len(a), np.nan)
        ok = a.notna().to_numpy() & b.notna().to_numpy()
        if ok.any():
            # uniform-dim batch → stack once, one einsum for the whole batch
            A = np.stack([np.asarray(x, dtype=np.float64) for x in a[ok]])
            B = np.stack([np.asarray(x, dtype=np.float64) for x in b[ok]])
            dots = np.einsum("ij,ij->i", A, B)
            out[ok] = dots / np.sqrt(
                np.einsum("ij,ij->i", A, A) * np.einsum("ij,ij->i", B, B)
            )
        return pd.Series(out)

    return _cos


def minhash_signature_np(num_perm: int = 32, seed: int = 7):
    """Arrow-vectorized MinHash kernel: array<bigint> shingle hashes →
    array<bigint> signature. Bit-identical to minhash_signature() (same
    integer arithmetic mod the same Mersenne prime), ~50-100x faster —
    Spark's higher-order array expressions evaluate interpreted, while this
    runs one numpy broadcast per Arrow batch. The sanctioned pandas-UDF
    escape hatch for custom sketch kernels (north star: Arrow batch
    transfer, never per-row Python).
    """
    import random

    rnd = random.Random(seed)
    coeffs = [(rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
              for _ in range(num_perm)]
    A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]

    @F.pandas_udf("array<long>")
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(None)
                continue
            x = np.asarray(h, dtype=np.int64) % _MERSENNE  # python-mod semantics
            x = np.where(x < 0, x + _MERSENNE, x)
            # (a·x' + b) mod p: products < 2^62, no int64 overflow
            sig = ((A * x[None, :] + B) % _MERSENNE).min(axis=1)
            out.append(sig)
        return pd.Series(out)

    return _sig


def simhash64_np(bits: int = 64):
    """Arrow-vectorized SimHash kernel (bit-identical to simhash64())."""
    shifts = np.arange(bits, dtype=np.uint64)

    @F.pandas_udf("long")
    def _fp(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                # NULL, not 0: the expression twin (simhash64's
                # F.aggregate over a null array) returns NULL, and a 0
                # fingerprint would make every null/empty doc a mutual
                # near-duplicate (shared bands, hamming 0) — null rows
                # must drop out of the band join on both kernels
                out.append(None)
                continue
            x = np.asarray(h, dtype=np.int64).astype(np.uint64)
            bitmat = (x[:, None] >> shifts[None, :]) & np.uint64(1)
            votes = (2 * bitmat.astype(np.int64) - 1).sum(axis=0)
            packed = np.uint64(0)
            for i in np.nonzero(votes > 0)[0]:
                packed |= np.uint64(1) << np.uint64(i)
            out.append(int(packed.astype(np.int64)))
        return pd.Series(out)

    return _fp


def simhash64(hashes: Column, bits: int = 64) -> Column:
    """64-bit SimHash over a set of feature hashes (array<bigint>).

    Classic construction: per bit position, sum +1/-1 votes across features;
    the sign picks the bit. Single pass over the feature array: one aggregate
    carrying a ``bits``-slot vote array, then one fold to pack the sign bits
    into a long. ``call_function("shiftright", ...)`` reaches the SQL
    function, whose shift amount (unlike the Python wrapper's) may be a
    lambda variable; shiftleft is a pure bit-shift, so packing bit 63 into
    the sign position cannot ANSI-overflow.
    """
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    empty_guard = F.size(hashes) > 0  # NULL array → NULL size → guard NULL
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                idx,
                lambda i: F.when(
                    F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            lambda a, v: a + v,
        ),
    )
    packed = F.aggregate(
        F.zip_with(
            votes,
            idx,
            lambda v, i: F.when(
                v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    # NULL (not 0) for null/empty feature sets, matching simhash64_np: a
    # 0 fingerprint would make every featureless doc a mutual near-dup
    # (all bands shared, hamming 0); NULL drops out of the band join
    return F.when(empty_guard, packed)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def simhash_bands(sim: Column, n_bands: int = 4) -> Column:
    """Slice a 64-bit simhash into ``n_bands`` bit-bands for candidate
    bucketing: near-dups within hamming d < n_bands share ≥1 exact band."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(sim, i * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        for i in range(n_bands)
    ])


def random_hyperplanes(dim: int, n_planes: int, seed: int = 11) -> list[list[float]]:
    """Seeded Gaussian hyperplanes for sign-LSH over embeddings (driver-side,
    tiny, broadcast as literals into the plan)."""
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def sign_lsh_key(vec: Column, planes: list[list[float]]) -> Column:
    """Bucket key = bit-packed signs of plane dot-products (bigint)."""
    key = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = dot(vec, plane)
        key = key.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return key


def sign_lsh_keys_np(dim: int, n_tables: int = 8, bits: int = 4, seed: int = 11):
    """Arrow-vectorized multi-table sign-LSH: embedding → array<long> of
    ``n_tables`` bucket keys (one matmul against all hyperplanes per Arrow
    batch). posexplode the result to get (table, key) memberships; same
    plane family as sign_lsh_tables.

    ``dim`` seeds the expected plane matrix, but the kernel derives the
    ACTUAL dim from each row and materializes (seed-stable) planes per
    observed dim — on the declared dim the keys are bit-identical to the
    static form, and a corpus at another (quarantined-modal) dim gets a
    consistent plane family instead of a matmul shape crash (r06
    adversarial-sweep find)."""
    weights = (1 << np.arange(bits, dtype=np.int64))
    cache = {dim: np.array(random_hyperplanes(dim, n_tables * bits, seed))}
    # Each cached plane matrix is (n_tables*bits, observed_dim) floats —
    # a corpus that reaches this kernel with MANY distinct dims (i.e. one
    # that bypassed load_vectors' modal-dim quarantine) must not grow
    # executor memory without bound, and the drift should be VISIBLE, not
    # silently absorbed into disjoint per-dim plane families. Cap the
    # cache and warn once per worker past the cap; off-cap dims still get
    # seed-stable planes, just recomputed per batch row.
    _CACHE_CAP = 8

    @F.pandas_udf("array<long>")
    def _keys(vecs: pd.Series) -> pd.Series:
        import warnings

        out = []
        for v in vecs:
            if v is None:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            planes = cache.get(len(x))
            if planes is None:
                if len(x) != dim and len(cache) == _CACHE_CAP:
                    warnings.warn(
                        f"sign_lsh_keys_np: >{_CACHE_CAP} distinct vector "
                        f"dims observed (declared dim={dim}, got "
                        f"{len(x)}) — ragged corpus reached the LSH "
                        "kernel; route inputs through load_vectors' "
                        "modal-dim quarantine",
                        stacklevel=2,
                    )
                planes = np.array(
                    random_hyperplanes(len(x), n_tables * bits, seed)
                )
                if len(cache) < _CACHE_CAP:
                    cache[len(x)] = planes
            signs = (planes @ x) > 0  # (T*b,)
            keys = (signs.reshape(n_tables, bits).astype(np.int64) * weights).sum(axis=1)
            out.append(keys)
        return pd.Series(out)

    return _keys


def sign_lsh_tables(
    vec: Column, dim: int, n_tables: int = 8, bits: int = 4, seed: int = 11
) -> Column:
    """Multi-table sign-LSH → array<struct<table,key>> bucket memberships.

    One table of b bits has candidate probability p^b (p = 1 - θ/π per
    hyperplane) — vanishing for moderately-similar vectors. L tables lift
    recall to 1-(1-p^b)^L at L× candidate cost: the recall/cost dial. For
    near-dup regimes (cos ≥ 0.9) push ``bits`` up and ``n_tables`` down;
    for broad similarity (cos ~0.4) the reverse, as here.
    """
    planes = random_hyperplanes(dim, n_tables * bits, seed)
    entries = []
    for t in range(n_tables):
        key = sign_lsh_key(vec, planes[t * bits:(t + 1) * bits])
        entries.append(F.struct(F.lit(t).alias("table"), key.alias("key")))
    return F.array(*entries)
