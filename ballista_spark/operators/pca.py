"""Distributed PCA over embedding columns — whitening / dimension
reduction ahead of ANN and semantic dedup (the standard preprocessing in
FAISS pipelines: PCA to 32-64 dims before IVF/PQ cuts index size and
often improves recall per byte; Jégou et al. 2011 §VII).

Shape of the computation (the classic two-phase moment reduction, same
as Spark MLlib's treeAggregate covariance but expressed on DataFrames):

- :func:`pca_fit` — one distributed pass computes per-Arrow-batch partial
  moments (count, Σv, ΣvvT) via ``mapInPandas`` (the ONE place Python is
  justified here: an element-wise d×d outer-product sum has no JVM-side
  aggregate — the declarative alternative explodes n·d² rows, which at
  100 TB is 4096× the corpus for d=64).  Partials are one ~(d²+d)-double
  row per batch; a single-partition second ``mapInPandas`` level reduces
  them to one row, so the driver sees exactly one moment vector no matter
  how many executors produced partials.  Eigendecomposition of the d×d
  covariance runs driver-side in numpy (d is small by construction).
- :func:`pca_project` — map-only JVM projection: mean + components ride
  in ONE broadcast row (same packed pattern as similarity._nearest_centroids)
  and each row computes k dot products with ``zip_with``/``aggregate``
  builtins.  No shuffle, no Python, constant plan size in k·d.

Determinism: eigenvector sign is fixed by making each component's
largest-magnitude coordinate positive (ties broken by lowest index), so
refits on reordered/repartitioned data produce identical models and
projections are reproducible cross-run.

Reference parity: the reference engine has no ML/linear-algebra operator —
this is part of the 100 TB training-data-pipeline inventory (SURVEY §2
"beyond the reference").
"""

from __future__ import annotations

import math
from typing import Iterator, NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PCAModel(NamedTuple):
    """Fitted PCA basis: ``mean`` (d), ``components`` (k rows × d — rows
    are unit-norm eigenvectors, descending eigenvalue), ``explained_var``
    (k eigenvalues), ``n`` (rows fitted)."""

    mean: "list[float]"
    components: "list[list[float]]"
    explained_var: "list[float]"
    n: int

    @property
    def d(self) -> int:
        return len(self.mean)

    @property
    def k(self) -> int:
        return len(self.components)


_PARTIAL_SCHEMA = "n long, s array<double>, ss array<double>"


def _partial_moments(vec_col: str):
    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None and len(v)]
            if not vecs:
                continue
            V = np.asarray(np.stack(vecs), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [V.shape[0]],
                    "s": [V.sum(axis=0).tolist()],
                    "ss": [(V.T @ V).ravel().tolist()],
                }
            )

    return gen


def _reduce_moments():
    def gen(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        n, s, ss = 0, None, None
        for pdf in batches:
            for _, row in pdf.iterrows():
                n += int(row["n"])
                rs, rss = np.asarray(row["s"]), np.asarray(row["ss"])
                s = rs if s is None else s + rs
                ss = rss if ss is None else ss + rss
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "ss": [ss.tolist()]})

    return gen


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 16) -> PCAModel:
    """Fit a k-component PCA basis in one distributed pass over ``df``.

    Null/empty vectors are skipped.  Raises if fewer than 2 rows remain
    or ``k > d``.  Covariance uses the n-1 (sample) denominator.
    """
    import numpy as np

    partials = df.select(vec_col).mapInPandas(
        _partial_moments(vec_col), _PARTIAL_SCHEMA
    )
    # second-level reduce: one partition, one output row — the driver
    # collects O(d^2) doubles total, independent of cluster size
    final = (
        partials.repartition(1)
        .mapInPandas(_reduce_moments(), _PARTIAL_SCHEMA)
        .collect()
    )
    if not final:
        raise ValueError("pca_fit: no non-empty vectors")
    row = final[0]
    n = row["n"]
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 vectors, got {n}")
    s = np.asarray(row["s"])
    d = s.shape[0]
    if k > d:
        raise ValueError(f"pca_fit: k={k} > dim={d}")
    mean = s / n
    ss = np.asarray(row["ss"]).reshape(d, d)
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps, ev = [], []
    for i in order:
        v = evecs[:, i]
        # sign convention: largest-|coordinate| entry positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append(v.tolist())
        ev.append(float(max(evals[i], 0.0)))
    return PCAModel(mean.tolist(), comps, ev, int(n))


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Append ``out_col``: the k-dim projection (v − mean) · componentsᵀ.

    Map-only and JVM-side: the basis rides in one broadcast row; each
    input row computes k ``zip_with``+``aggregate`` dot products.  With
    ``whiten=True`` each coordinate is scaled by 1/√eigenvalue (unit
    output variance — the PCA-whitening FAISS applies before PQ).
    Null/empty vectors project to NULL.
    """
    spark = df.sparkSession
    scale = [
        1.0 / math.sqrt(v) if (whiten and v > 0) else 1.0 for v in model.explained_var
    ]
    basis = F.broadcast(
        spark.createDataFrame(
            [(model.mean, model.components, scale)],
            "__mean array<double>, __comps array<array<double>>, __scale array<double>",
        )
    )
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), F.col("__mean"), lambda x, m: x - m
    )
    proj = F.transform(
        F.col("__comps"),
        lambda comp, i: F.aggregate(
            F.zip_with(centered, comp, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.element_at(F.col("__scale"), i + 1),
    )
    cols = df.columns
    out = (
        df.crossJoin(basis)
        .withColumn(
            out_col,
            F.when(
                F.col(vec_col).isNotNull() & (F.size(vec_col) > 0), proj
            ),
        )
        .select(*cols, out_col)
    )
    return out
