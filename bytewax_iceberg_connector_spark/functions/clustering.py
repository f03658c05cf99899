"""Distributed k-means (Lloyd's) over an ``array<float>`` embedding column,
built on the repo's Arrow-kernel discipline: every executor-side pass is a
vectorized numpy GEMM inside ``mapInPandas``, and the only data that ever
reaches the driver is the k x dim partial-sum table (the textbook
map-side-combine shape — identical to what ``spark.ml`` KMeans aggregates
per iteration, re-expressed here so init and tie-breaking are fully
deterministic and engine-local).

Scale contract (100 TB): each Lloyd iteration is ONE scan of the embedding
table with zero shuffle — partials are (cluster, count, sum_vec) rows, at
most k per Arrow batch, reduced driver-side (k·dim doubles, e.g.
2^16 x 1024 x 8 B = 512 MiB worst-case cap — cap k accordingly). The
assignment pass emits narrow (id, cluster) rows; vectors never leave the
scan. Reference scope: the north star's embedding-centric curation ops
(SemDeDup-style semantic dedup); the reference engine has no clustering
surface, so this is net-new capability.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seed_centroids(emb: DataFrame, id_col: str, vec_col: str, k: int, seed: int) -> np.ndarray:
    """Deterministic init: the k members with the smallest
    ``xxhash64(id, seed)`` — a uniform, engine-stable pseudo-random draw
    that needs one top-k (no full sort) over narrow (hash, vec) rows."""
    rows = (
        emb.select(F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"), F.col(vec_col).alias("v"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return np.asarray([r.v for r in rows], dtype=np.float64)


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 5,
    seed: int = 23,
) -> tuple[np.ndarray, list[float]]:
    """Fit k-means; returns (centroids k x dim, per-iteration inertia).

    Each iteration: broadcast the centroid matrix in the kernel closure,
    one ``mapInPandas`` scan emits per-batch partials
    ``(cluster, n, sse, sum_vec)``; the driver reduces them (k rows after
    groupby) and recomputes means. Empty clusters keep their previous
    centroid (standard Lloyd fallback, deterministic).
    """
    src = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    history: list[float] = []
    cents = _seed_centroids(src, "id", "v", k, seed)

    partial_schema = "cluster int, n long, sse double, s array<double>"
    for _ in range(iters):
        c = cents  # bind current value into the kernel closure

        def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over cells
                d2 = (
                    (x * x).sum(axis=1, keepdims=True)
                    - 2.0 * (x @ c.T)
                    + (c * c).sum(axis=1)[None, :]
                )
                a = d2.argmin(axis=1)
                out = []
                for cl in np.unique(a):
                    m = a == cl
                    out.append(
                        (
                            int(cl),
                            int(m.sum()),
                            float(np.maximum(d2[m, cl], 0.0).sum()),
                            x[m].sum(axis=0).tolist(),
                        )
                    )
                yield pd.DataFrame(out, columns=["cluster", "n", "sse", "s"])

        part = src.mapInPandas(_partials, schema=partial_schema).toPandas()
        history.append(float(part["sse"].sum()))
        new = cents.copy()
        for cl, grp in part.groupby("cluster"):
            n = int(grp["n"].sum())
            if n > 0:
                new[cl] = np.sum(np.stack([np.asarray(s) for s in grp["s"]]), axis=0) / n
        cents = new
    return cents, history


def kmeans_assign(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Narrow assignment pass: (id, cluster) rows only — the join-back key
    table. Vectors stay behind in the scan (ann_lsh/IVF shuffle
    discipline)."""
    src = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    c = centroids

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "cluster": d2.argmin(axis=1).astype("int32")}
            )

    return (
        src.mapInPandas(_assign, schema="id long, cluster int")
        .withColumnRenamed("id", id_col)
    )
