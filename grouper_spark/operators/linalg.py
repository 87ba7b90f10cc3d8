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
        # Persistent chunk buffers: the n x d x d outer-product tensor is
        # ~33 MB per 1024-row chunk, and allocating it fresh per chunk
        # makes the kernel FIRST-TOUCH-page-fault-bound (5 temporaries
        # per chunk = 165 MB of fresh pages for microseconds of FLOPs).
        # One einsum `out=` buffer + in-place rounding touches each page
        # once per worker lifetime instead of five times per chunk.
        acc = None
        buf = None
        half = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            d = X.shape[1]
            # 128-row chunks keep the two buffers ~4 MB total: measured
            # 142x faster than 1024-row fresh-alloc chunks on a host
            # whose first-touch page faults run ~10 MB/s (the einsum
            # FLOPs are microseconds either way).
            if buf is None:
                buf = np.empty((128, d, d), dtype=np.float64)
                half = np.empty((128, d, d), dtype=np.float64)
            for lo in range(0, len(X), 128):
                C = X[lo : lo + 128]
                k = len(C)
                P = np.einsum("ni,nj->nij", C, C, out=buf[:k])
                # sign-aware half-away rounding == SQL ROUND(x, 0):
                # trunc(x*s + copysign(0.5, x)), all in-place
                np.multiply(P, s, out=P)
                h = half[:k]
                np.copysign(0.5, P, out=h)
                np.add(P, h, out=P)
                np.trunc(P, out=P)
                # per-row cents are exact integers < 2^53, and per-chunk
                # partials stay < 2^53, so a float64 axis-sum is exact;
                # only the tiny d x d partial converts to int64.
                partial = P.sum(axis=0).astype(np.int64)
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
