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
    list_dot_product(a,b)/sqrt(list_dot_product(a,a)*list_dot_product(b,b))."""
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


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
    return F.aggregate(
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
