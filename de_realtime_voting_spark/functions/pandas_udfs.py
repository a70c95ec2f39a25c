"""Arrow-vectorized (Pandas UDF) alternatives to the Catalyst column
helpers.

The rule this engine follows: built-in `pyspark.sql.functions` first
(JVM-side, codegen), Pandas UDFs ONLY when the computation needs a
real numerical library or cannot be said in Catalyst.  These exist to
(a) prove the Arrow batch path end-to-end and (b) serve as drop-in
replacements if an operator ever needs numpy/scipy semantics --
`tests/test_functions.py` pins them to the Catalyst versions.

Row-at-a-time Python UDFs are banned in this codebase: they serialize
per row and run 10-100x slower than either path here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch cosine over two array columns: one numpy matmul per
    Arrow batch instead of one expression-tree walk per row."""
    ma = np.stack(a.to_numpy()).astype(np.float64)
    mb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


@pandas_udf("double")
def l2_norm_pandas(a: pd.Series) -> pd.Series:
    ma = np.stack(a.to_numpy()).astype(np.float64)
    return pd.Series(np.linalg.norm(ma, axis=1))
