"""Pluggable embedding-generation stage — the declared T4 surface.

The reference generates template embeddings through an API vectorizer
with an in-memory cache (``/root/reference/src/gemini_vectorizer.cpp``,
``python/logai_cpp/embeddings.py:39-119``). Network models are out of
scope here, so the CONTRACT is local: a zero-arg ``model_factory``
returning ``model_fn(text_array) -> (n, dim) float array``. The
factory runs ONCE per actor in ``__init__`` — where a real local model
would load its weights — and ``model_fn`` runs per batch, vectorized.
A user slots a local sentence-transformer with::

    embed_dataset(ds, model_factory=lambda: SentenceModel(path).encode)

The default model is the deterministic hashed char-n-gram featurizer
(``textstats.hash_ngram_vectors``) so the whole path — actor pool,
schema, ANN-store wiring — is testable with no external libs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def default_ngram_model(dim: int = 64, n: int = 3):
    """Factory for the no-external-model featurizer: L2-normalized
    hashed char-n-gram count vectors (pure function of the text)."""

    def factory():
        from .textstats import hash_ngram_vectors

        def model_fn(texts):
            arr = (texts if isinstance(texts, (pa.Array,
                                               pa.ChunkedArray))
                   else pa.array(list(texts), pa.string()))
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return hash_ngram_vectors(arr, dim=dim, n=n)

        return model_fn

    return factory


def _list_float32(M: np.ndarray) -> pa.ListArray:
    """(n, d) matrix → ``list<float>`` column (the embeddings-table
    layout every kNN/ANN stage reads zero-copy)."""
    M = np.ascontiguousarray(M, dtype=np.float32)
    n, d = M.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets,
                                    pa.array(M.reshape(-1)))


class EmbedStage:
    """Actor-pool ``map_batches`` stage: text column → embedding
    column. Model construction in ``__init__`` (once per actor), batch
    inference in ``__call__`` — the T4 shape (stateful setup amortized
    across every batch the actor sees)."""

    def __init__(self, model_factory=None, *, text_col: str = "text",
                 id_col: str = "doc_id", out_id_col: str = "vec_id",
                 vec_col: str = "embedding", dim: int = 64):
        factory = model_factory or default_ngram_model(dim)
        self.model_fn = factory()
        self.text_col = text_col
        self.id_col = id_col
        self.out_id_col = out_id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = np.asarray(self.model_fn(batch.column(self.text_col)))
        if M.ndim != 2 or M.shape[0] != batch.num_rows:
            raise ValueError(
                f"model_fn must return (n_rows, dim); got {M.shape} "
                f"for {batch.num_rows} rows")
        return pa.table({
            self.out_id_col: batch.column(self.id_col),
            self.vec_col: _list_float32(M),
        })


def embed_dataset(ds, model_factory=None, *, text_col: str = "text",
                  id_col: str = "doc_id", out_id_col: str = "vec_id",
                  vec_col: str = "embedding", dim: int = 64,
                  concurrency: int = 2, num_cpus: float = 1.0,
                  batch_size: int = 1024):
    """Wire ``EmbedStage`` as an actor pool over ``ds``. Returns a
    Dataset with ``(out_id_col, vec_col)`` — exactly the embeddings
    table shape, so it feeds any ``ann_store.build_*`` or kNN stage
    directly. ``batch_size`` bounds model-input memory; size
    ``concurrency × num_cpus`` to the node."""
    return ds.map_batches(
        EmbedStage, fn_constructor_args=(model_factory,),
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, out_id_col=out_id_col,
            vec_col=vec_col, dim=dim),
        concurrency=concurrency, num_cpus=num_cpus,
        batch_size=batch_size, batch_format="pyarrow")
