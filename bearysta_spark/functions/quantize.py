"""Embedding quantization: float32 vectors → int8 + per-vector scale.

The storage/bandwidth lever for ANN at scale: int8 cuts the embedding
table 4× (and dot products can run in integer SIMD downstream). The
symmetric scheme stores one float scale per vector; dequantized value =
q * scale / 127.

Determinism note (oracle parity): quantization uses trunc (round toward
zero), not round() — trunc is identical everywhere, while round-half
behavior differs between implementations. Elements are widened
float32 → float64 BEFORE any arithmetic, so numpy, Spark SQL, and
DuckDB compute bit-identical doubles (all three are IEEE-754 ops in
the same order).

Scale design: per-row math only, no shuffle. Executed as an
Arrow-batched mapInPandas kernel — numpy does the whole batch
vectorized. The same arithmetic as column expressions ran ~20× slower
at 64 dims because array HOFs (transform/zip_with) are interpreted
per element, not codegen'd (see BASELINE.md perf notes).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "vec_id long, qvec array<int>, scale double, max_err double"


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization.

    scale = max(|x_i|); q_i = trunc(x_i * 127 / scale) ∈ [-127, 127].
    A zero vector keeps scale 0 and quantizes to all zeros. Returns
    (vec_id, qvec array<int>, scale double, max_err double); max_err is
    the exact dequantization error, bounded by scale/127.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            s = np.abs(x).max(axis=1)
            safe = np.where(s == 0.0, 1.0, s)
            q = np.trunc(x * 127.0 / safe[:, None]).astype(np.int32)
            q[s == 0.0, :] = 0
            err = np.abs(x - q * safe[:, None] / 127.0).max(axis=1)
            err[s == 0.0] = 0.0
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "qvec": list(q),
                    "scale": s,
                    "max_err": err,
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(kernel, OUT_SCHEMA)
