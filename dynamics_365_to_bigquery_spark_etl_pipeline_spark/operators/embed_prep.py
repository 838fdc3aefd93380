"""Embedding preprocessing for similarity / dedup pipelines: L2
normalization, distributed PCA (train), projection + whitening
(apply). (Reference scope note: the reference has no vector surface at
all — ``helper_functions.py`` stops at scalar columns; these are the
operations an embedding-bearing training corpus needs before the
ANN/near-dup stages in ``operators/similarity.py``.)

Scale shape:

- ``l2_normalize`` is one per-row JVM expression — map-side only,
  pushes behind the scan.
- ``fit_pca`` is the textbook two-moment reduction: every partition
  emits ONE (count, sum, Gram) partial via ``mapInPandas`` (the Gram
  is X^T X as a single BLAS call), the driver folds the ~d^2-sized
  partials (64x64 doubles = 32 KB each — driver traffic is
  O(#partitions * d^2), independent of row count) and runs ``eigh`` on
  the d x d covariance. No iterative driver loop, no per-row Python.
- ``project`` broadcasts the (d x k) component matrix in the UDF
  closure and applies one matmul per Arrow batch.

Determinism: partial Grams are float sums, so the covariance carries
partitioning-dependent last-ulp noise; component SIGNS are canonicalized
(largest-|coefficient| entry positive) so downstream outputs are stable
across layouts up to that noise. Tests verify the invariants
(orthonormality, eigenvalue ordering, unit variance after whitening,
reconstruction-error monotonicity) rather than bit equality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import dot, dot_sql


def l2_normalize(vec: Column) -> Column:
    """Unit-length copy of a float-array column (JVM-side; NULL-safe:
    a zero vector stays zero rather than dividing by 0)."""
    nrm = F.sqrt(dot(vec, vec))
    # the norm rides in as a zip_with ARGUMENT (array_repeat evaluates
    # it once per row); referencing `nrm` inside a transform lambda
    # would re-run the whole dot-product per ELEMENT — HOF lambdas are
    # interpreted with no subexpression elimination, turning an O(dim)
    # normalize into O(dim^2)
    nrm_arr = F.array_repeat(nrm, F.size(vec))
    return F.when(
        nrm > 0,
        F.zip_with(vec, nrm_arr, lambda x, m: x.cast("double") / m),
    ).otherwise(F.transform(vec, lambda x: x.cast("double")))


def l2_normalize_sql(vec: str) -> str:
    """DuckDB mirror of :func:`l2_normalize`."""
    nrm = f"sqrt({dot_sql(vec, vec)})"
    return (
        f"CASE WHEN {nrm} > 0 THEN "
        f"list_transform({vec}, x -> CAST(x AS DOUBLE) / {nrm}) "
        f"ELSE list_transform({vec}, x -> CAST(x AS DOUBLE)) END"
    )


def fit_pca(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> dict:
    """Train a PCA model: returns ``{"mean", "components",
    "explained_variance", "n"}`` with ``components`` shaped (k, d),
    rows = principal axes ordered by decreasing variance.

    One pass: per-partition (count, sum, Gram) partials -> driver fold
    -> d x d ``eigh``. The eigendecomposition itself is driver-side on
    a d x d matrix — legitimate at any corpus size because d is the
    embedding dimension, not the row count."""
    import numpy as np

    head = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if head is None:
        raise ValueError("fit_pca: empty input")
    d = head.d

    def partials(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "n long, s array<double>, g array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    G = np.sum([np.array(r.g).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = (G - n * np.outer(mean, mean)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # canonical sign: largest-|coefficient| entry of each axis positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": evals[order],
        "n": n,
    }


def project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "projected",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Apply a :func:`fit_pca` model: append ``out_col`` =
    (x - mean) @ components.T, optionally variance-whitened (each
    output coordinate divided by sqrt(eigenvalue) — unit variance, the
    normalization embedding-dedup thresholds assume). The model arrays
    ride the closure (same bytes a broadcast ships); one BLAS matmul
    per Arrow batch."""
    import numpy as np

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    scale = (
        1.0 / np.sqrt(np.maximum(model["explained_variance"], eps))
        if whiten
        else None
    )
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            P = (X - mean) @ comps.T
            if scale is not None:
                P = P * scale
            pdf = pdf.copy()
            pdf[out_col] = list(P)
            yield pdf

    return df.mapInPandas(run, schema)
