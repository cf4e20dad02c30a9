"""The ML hand-off boundary (SURVEY.md §2 E2 + non-goals note: "the
engine stops at the padded-int-arrays boundary, where toPandas()/
predict_batch_udf hands off to any ML library").

``batched_top_k_predict`` reproduces the reference's inference dataflow
(reference src/model/lstm_model.py:28-41: batched ``model.predict`` over
128-session chunks, then ``np.argsort(probs)[:, -k:][:, ::-1]``) as an
Arrow-batched pandas UDF. The model itself is pluggable — any callable
``(np.ndarray[batch, maxlen]) -> np.ndarray[batch, n_classes]``; tests
use a deterministic fake. A real Keras/Torch model drops in unchanged
(load it lazily inside the UDF so each executor materializes it once).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batched_top_k_predict(
    dataset: DataFrame,
    model_fn: Callable,
    x_col: str = "x_padded",
    k: int = 10,
    out_col: str = "preds",
) -> DataFrame:
    """Top-K class predictions per row, Arrow-batched.

    Output ids follow the reference's decode convention (token space =
    class index + 1, the −1 label offset inverse; reference
    lstm_model.py:40 ``index_word[i + 1]``).
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def predict(x: pd.Series) -> pd.Series:
        mat = np.vstack(x.to_numpy())  # (batch, maxlen)
        probs = model_fn(mat)  # (batch, n_classes)
        # argsort[:, -k:][:, ::-1] — exactly the reference idiom
        top = np.argsort(probs, axis=1)[:, -k:][:, ::-1]
        return pd.Series([(row + 1).astype("int32").tolist() for row in top])

    return dataset.withColumn(out_col, predict(F.col(x_col)))


def popularity_model(n_classes: int) -> Callable:
    """Deterministic stand-in model: scores every class by a fixed
    pseudo-popularity (hash-derived), ignoring the input — the simplest
    baseline the HitRate@K suite can evaluate end-to-end."""
    import numpy as np

    rng = np.random.RandomState(42)
    scores = rng.rand(n_classes)

    def fn(batch):
        return np.tile(scores, (batch.shape[0], 1))

    return fn
