"""Distributed linear algebra over embedding columns.

The gramian (X^T X) is the workhorse behind PCA/covariance/whitening of
an embedding corpus. Computing it with explode+groupBy would shuffle
d^2 rows PER INPUT ROW; the scalable shape is per-partition partial
gramians (an Arrow-batched numpy matmul — the measured-fastest path for
vector-vs-matrix math in this repo, see q56) followed by one tiny
reduce of d^2 partials per partition. 100 TB of vectors still reduces
to n_partitions x d^2 longs on the wire.

Fixed-point contract: per-row products are rounded to integer units
(sign-aware half-away, matching SQL ROUND) BEFORE summation, so the
distributed sum is order-independent and bit-exact vs a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def gramian_upper(
    df: DataFrame, vec_col: str = "embedding", scale: int = 6
) -> DataFrame:
    """Upper-triangle gramian entries (i, j, cents) with 1-based dims,
    i <= j; ``cents`` is the exact integer fixed-point sum of x_i * x_j
    over all rows. Divide by 10**scale for the float value.
    """
    import numpy as np
    import pandas as pd

    s = float(10**scale)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            # chunk the n x d x d outer-product tensor to bound memory
            for lo in range(0, len(X), 1024):
                C = X[lo : lo + 1024]
                P = np.einsum("ni,nj->nij", C, C)
                # sign-aware half-away rounding == SQL ROUND(x, 0)
                cents = (np.sign(P) * np.floor(np.abs(P) * s + 0.5)).astype(
                    np.int64
                )
                partial = cents.sum(axis=0)
                acc = partial if acc is None else acc + partial
        if acc is not None:
            iu = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype("int32"),
                    "j": (iu[1] + 1).astype("int32"),
                    "cents": acc[iu],
                }
            )

    partials = df.select(vec_col).mapInPandas(part, schema="i int, j int, cents long")
    return partials.groupBy("i", "j").agg(F.sum("cents").alias("cents"))
