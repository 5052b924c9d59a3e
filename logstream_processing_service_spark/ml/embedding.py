"""Text-embedding column (SURVEY M1/M2).

Reference: sentence-transformers all-MiniLM-L6-v2, 384 dims, hand-rolled
batch encode (src/ml/pipeline.py:4-9; scripts/run_training_batch.py:57-73).

Spark re-expression: a scalar ``pandas_udf`` — Arrow hands the UDF whole
batches, which IS the reference's manual batching, for free. Two backends:

- ``hash_featurizer``: deterministic, dependency-free 'embedding' built from
  token hashes (the test/oracle backend — reproducible everywhere).
- ``sentence_transformer_udf``: the real model, import-gated (the model and
  torch are not in this container; the function raises with a clear message
  unless the dependency exists).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def hash_featurizer(dim: int = 64):
    """Deterministic bag-of-hashed-tokens featurizer (L2-normalized).

    Same shape/contract as the sentence-transformers UDF, so pipelines are
    testable without the model. One Arrow batch in, one out — no per-row
    Python.
    """

    import zlib

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float64)
            if t:
                for tok in str(t).split():
                    # crc32, NOT Python hash(): str hashing is salted per
                    # process and would differ across executors
                    h = zlib.crc32(tok.encode("utf-8"))
                    v[h % dim] += 1.0 if (h >> 16) % 2 == 0 else -1.0
            n = math.sqrt(float((v * v).sum()))
            if n > 0:
                v /= n
            out.append(v.astype(np.float32))
        return pd.Series(out)

    return embed


def sentence_transformer_udf(model_name: str = "all-MiniLM-L6-v2", dim: int = 384):
    """Real embedding UDF (reference parity: pipeline.py:4-9). The model is
    loaded once per executor (lazy global), encode() sees the whole Arrow
    batch — the reference's batch_size=64 GPU batching is subsumed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    try:
        import sentence_transformers  # noqa: F401
    except ImportError as exc:  # pragma: no cover - not in this container
        raise NotImplementedError(
            "sentence-transformers is not installed in this environment; "
            "use hash_featurizer() for a deterministic stand-in"
        ) from exc

    _model_cache: dict[str, object] = {}

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:  # pragma: no cover
        from sentence_transformers import SentenceTransformer

        model = _model_cache.setdefault(model_name, SentenceTransformer(model_name))
        vecs = model.encode(texts.fillna("").tolist(), batch_size=64)
        return pd.Series(list(np.asarray(vecs, dtype=np.float32)))

    return embed
