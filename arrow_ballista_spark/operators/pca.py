"""Distributed PCA / whitening over an embedding column.

The dimensionality-reduction step an embedding pipeline runs before
clustering, ANN indexing, or SemDeDup-style dedup (centering + rotating
to the top-k variance directions makes cosine thresholds and IVF cells
much better behaved).  No reference parity: arrow-ballista has no ML
operators (SURVEY.md §2 — extension beyond the reference surface).

The classic two-stage layout every distributed ML library uses:

- **Sufficient statistics are one pass, O(d^2) per partition**: an
  Arrow-batched ``mapInPandas`` accumulates ``(n, sum x, X^T X)`` per
  batch with one numpy matmul; partials reduce via a keyed elementwise
  aggregation (d + d^2 rows TOTAL, not per point).  Points are never
  shuffled and never leave their partition.
- **Eigendecomposition is driver-side and bounded**: ``numpy.eigh`` on
  the d×d covariance — O(d^3) with d = embedding width (64-4096),
  independent of corpus size.  This is the same bounded-driver pattern
  as IVF's centroid collect (``operators/ivf.py``).
- **Projection is map-only**: the (k×d) component matrix broadcasts to
  every task; each batch is one ``(X - mean) @ W.T`` matmul.

Determinism: eigenvector SIGNS are normalized (largest-|coefficient|
entry made positive) so reruns, retries, and the agreement tests get
identical projections; ``eigh`` on the identical covariance matrix is
deterministic within a BLAS build.  Cross-engine float summation order
differs at ~1e-16, so the covariance registry query rounds (the
``agg_stats`` precedent) and the projection is property-tested against
numpy's reference PCA rather than oracle-hashed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sufficient_stats_df(df: DataFrame, vec_col: str) -> DataFrame:
    """The reduced one-pass statistics as a ``(pos, s)`` DataFrame:
    position 0 holds n, positions ``1..d`` the per-dimension sums, and
    ``d+1 ..`` the row-major ``X^T X`` sums.  Partials are one numpy
    matmul per Arrow batch; the reduce is an elementwise keyed
    aggregation over d^2 + d + 1 positions — tiny, and points never
    shuffle."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if X.size == 0:
                continue
            flat = np.concatenate(
                ([float(len(X))], X.sum(axis=0), (X.T @ X).ravel())
            )
            yield pd.DataFrame({"part": [flat.tolist()]})

    parts = df.select(vec_col).mapInPandas(partials, "part array<double>")
    return (
        parts.select(F.posexplode("part").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.sum("val").alias("s"))
    )


def covariance_df(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """Upper-triangle biased covariance as a DataFrame ``(i, j, cov)``
    with ``i <= j`` — the distributed form of :func:`covariance_stats`
    (d^2-row result, suitable for an oracle check; the eigen step wants
    the collected matrix instead)."""
    red = sufficient_stats_df(df, vec_col)
    nrow = red.where(F.col("pos") == 0).select(F.col("s").alias("_n"))
    means = red.where((F.col("pos") >= 1) & (F.col("pos") <= d)).select(
        (F.col("pos") - 1).alias("_mi"), F.col("s").alias("_ms")
    )
    prods = red.where(F.col("pos") > d).select(
        ((F.col("pos") - d - 1) / d).cast("long").alias("i"),
        ((F.col("pos") - d - 1) % d).alias("j"),
        F.col("s").alias("_sp"),
    ).where(F.col("i") <= F.col("j"))
    ma = means.select(F.col("_mi").alias("i"), F.col("_ms").alias("_sa"))
    mb = means.select(F.col("_mi").alias("j"), F.col("_ms").alias("_sb"))
    return (
        prods.crossJoin(F.broadcast(nrow))
        .join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select(
            "i",
            "j",
            (
                F.col("_sp") / F.col("_n")
                - (F.col("_sa") / F.col("_n")) * (F.col("_sb") / F.col("_n"))
            ).alias("cov"),
        )
    )


def covariance_stats(
    df: DataFrame, vec_col: str
) -> "tuple[int, object, object]":
    """One-pass sufficient statistics: ``(n, mean[d], cov[d,d])`` with
    the biased (1/n) covariance.  Only the d^2 + d + 1 reduced sums
    reach the driver."""
    import numpy as np

    reduced = sufficient_stats_df(df, vec_col).orderBy("pos").collect()
    flat = [r["s"] for r in reduced]
    n = int(flat[0])
    if n == 0:
        raise ValueError("covariance_stats: empty input")
    d = int(round((-1 + (1 + 4 * (len(flat) - 1)) ** 0.5) / 2))
    mean = np.array(flat[1 : 1 + d]) / n
    xtx = np.array(flat[1 + d :]).reshape(d, d) / n
    cov = xtx - np.outer(mean, mean)
    return n, mean, cov


def _top_components(cov, k: int):
    """eigh → top-``k`` rows, descending eigenvalue, sign-normalized
    (largest-|coefficient| entry positive): ``(W[k,d], eigvals[k])``.
    Shared by the distributed path and the literal-W helper so both
    produce identical components from an identical covariance."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order].T.copy()
    for i in range(W.shape[0]):
        j = int(np.abs(W[i]).argmax())
        if W[i, j] < 0:
            W[i] = -W[i]
    return W, vals, order


def pca_components(df: DataFrame, vec_col: str, k: int):
    """Top-``k`` principal components:
    ``(mean[d], W[k,d], evr[k], eigvals[k])`` with ``evr`` the
    explained-variance ratios, components ordered by descending
    eigenvalue and sign-normalized (largest-|coefficient| entry
    positive) for determinism."""
    _, mean, cov = covariance_stats(df, vec_col)
    W, vals, order = _top_components(cov, k)
    total = float(vals.sum()) or 1.0
    evr = vals[order] / total
    return mean, W, evr, vals[order]


#: Driver-side whitening-sample bound: the covariance estimate behind
#: :func:`whitening_literals` reads at most this many smallest-id vectors
#: — bounded driver work at any corpus size (the IVF-centroid pattern).
WHITEN_SAMPLE_CAP = 4096


def smallest_id_sample(
    path: str, id_col: str, cols: list, cap: int, nonzero_vec: str = None
):
    """Stream a parquet file's row groups keeping only the ``cap``
    smallest-``id_col`` rows at any moment — driver memory O(cap +
    batch), not O(corpus).  The SHARED deterministic-sample kernel
    behind every literal-oracle driver pass (whitening matrix, trained
    PQ codebooks): one implementation so the batching/tie-break can
    never drift between the 'bit-identical literals' claims.
    ``nonzero_vec`` names a vector column whose zero-norm rows are
    dropped BEFORE the head(cap) — the ``_sample_matrix(nonzero=True)``
    serving-population contract of the residual IVF-PQ trainers."""
    import pandas as pd
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    sample = None
    for rb in pf.iter_batches(batch_size=8192, columns=[id_col, *cols]):
        part = rb.to_pandas()
        if nonzero_vec is not None:
            # the EXACT serving-population predicate is norm(v) > 0 (the
            # Spark trainers' filter): a sequential sum-of-squares in
            # IEEE double, so denormal vectors whose squares underflow
            # to 0 are EXCLUDED and NaNs compare false — `any(x != 0)`
            # would include both and break the bit-identical-sample
            # contract between the literal and Spark trainers
            def _norm_pos(v):
                s = 0.0
                for x in v:
                    x = float(x)
                    s += x * x
                return s > 0.0

            part = part[part[nonzero_vec].map(_norm_pos)]
        sample = part if sample is None else pd.concat([sample, part])
        sample = sample.sort_values(id_col, kind="mergesort").head(cap)
    if sample is None or len(sample) == 0:
        raise ValueError(f"smallest_id_sample: empty input {path}")
    return sample


def whitening_literals(
    sf_dir: str,
    k: int = 8,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic, REPRODUCIBLE whitening parameters ``(mean[d],
    W[k,d])`` for the literal-oracle pattern: read the ``WHITEN_SAMPLE_CAP``
    smallest-id vectors driver-side (pyarrow, no Spark job), accumulate
    mean/covariance in one fixed-order numpy pass, eigh + sign-normalize +
    scale rows to unit variance.

    Why a driver-side pass instead of :func:`pca_components`: the
    distributed sufficient-statistics reduce is correct but its partial
    summation ORDER is nondeterministic across runs/engines, so the eigh
    input — and therefore the whitened values — cannot be replayed into a
    generated DuckDB oracle.  This helper is bit-reproducible: same file,
    same floats, so the SAME literals feed both the Spark plan and the
    oracle SQL (the LSH-plane / IVF-centroid precedent,
    queries/extensions.py).  The distributed covariance path agrees with
    it to ~1e-12 (tests/test_extensions.py PCA property tests); at corpus
    scale the bounded sample IS the honest design — nobody eighs 100 TB.
    """
    import os

    import numpy as np

    path = os.path.join(sf_dir, f"{table}.parquet")
    pdf = smallest_id_sample(path, id_col, [vec_col], WHITEN_SAMPLE_CAP)
    X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    n = len(X)
    if n == 0:
        raise ValueError("whitening_literals: empty input")
    mean = X.sum(axis=0) / n
    cov = (X.T @ X) / n - np.outer(mean, mean)
    W, vals, order = _top_components(cov, k)
    W = W / np.sqrt(np.maximum(vals[order], 1e-12))[:, None]
    return mean, W


def pca_project(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    whiten: bool = False,
) -> DataFrame:
    """Project every vector onto the top-``k`` principal components:
    ``(id_col, proj array<double>)``.  ``whiten=True`` additionally
    scales each component to unit variance.  The (k×d) component matrix
    and mean ride the closure (broadcast with the task binary); each
    batch is a single centered matmul — map-only, no shuffle."""
    import numpy as np
    import pandas as pd

    mean, W, evr, eigvals = pca_components(df, vec_col, k)
    if whiten:
        # variance along a unit eigenvector IS its eigenvalue — no
        # second statistics pass needed
        W = W / np.sqrt(np.maximum(eigvals, 1e-12))[:, None]

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                # an empty Arrow batch yields X of shape (0,), which
                # would break the centered-matmul broadcasting below
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            P = (X - mean[None, :]) @ W.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], "proj": list(map(list, P))}
            )

    return df.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, proj array<double>"
    )
