"""ListSlice (reference nvtabular/ops/list_slice.py:23-228): row-wise list
slicing with optional padding.

The reference uses numba.cuda kernels over (offsets, elements) arrays
(:180-228). TPU-native replacement: the padded path is a single vectorized
gather into a [rows, pad_len] matrix (XLA/VPU-friendly, used by the device
loader); the ragged path is vectorized numpy over offsets on host."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .operator import Operator


class ListSlice(Operator):
    jit_safe = False  # ragged output; the padded gather kernel is jit-safe internally

    def __init__(self, start: int, end: Optional[int] = None, pad: bool = False, pad_value: float = 0.0):
        super().__init__()
        if end is None:
            start, end = (0, start) if start >= 0 else (start, 0)
        self.start = start
        self.end = end
        self.pad = pad
        self.pad_value = pad_value
        if self.start >= 0 and self.end > 0 and self.end <= self.start:
            raise ValueError("end must be > start")

    @property
    def _max_elements(self) -> int:
        if self.start >= 0:
            return self.end - self.start if self.end > 0 else -1
        return -self.start if self.end == 0 else self.end - self.start

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        out = TableBatch()
        for name in col_selector.names:
            col = batch[name]
            if not col.is_list:
                raise ValueError(f"ListSlice input {name!r} is not a list column")
            if col.backend == "jax" and self.pad and self._max_elements > 0:
                out[name] = self._slice_device(col)
            else:
                out[name] = _slice_list(
                    col.to_host(), self.start, self.end, self.pad, self.pad_value
                )
        return out

    def _slice_device(self, col: Column) -> Column:
        """Device path: one vectorized gather (kernels/ragged.py) instead of
        the reference's per-row CUDA loop (list_slice.py:201-228)."""
        import jax.numpy as jnp

        from ..kernels import ragged_slice_padded

        pad_len = self._max_elements
        padded, new_len = ragged_slice_padded(
            col.values, col.offsets, self.start, self.end, pad_len, self.pad_value
        )
        rows = padded.shape[0]
        offsets = jnp.arange(rows + 1, dtype=jnp.int32) * pad_len
        return Column(padded.reshape(-1), offsets, col.validity)

    def _compute_shape(self, col_schema, input_schema):
        mx = self._max_elements
        if mx > 0:
            if self.pad:
                return col_schema.with_shape(md.Shape.list(mx, mx))
            return col_schema.with_shape(md.Shape.list(0, mx))
        return col_schema

    def _compute_properties(self, col_schema, input_schema):
        mx = self._max_elements
        if mx > 0:
            return col_schema.with_properties(
                {"value_count": {"min": mx if self.pad else 0, "max": mx}}
            )
        return col_schema

    def serialize_params(self):
        return {
            "start": self.start,
            "end": self.end,
            "pad": self.pad,
            "pad_value": self.pad_value,
        }


def _slice_list(col: Column, start: int, end: int, pad: bool, pad_value) -> Column:
    offs = np.asarray(col.offsets).astype(np.int64)
    vals = np.asarray(col.values)
    lengths = offs[1:] - offs[:-1]
    n = len(lengths)

    # per-row [lo, hi) positions relative to each row start
    if start >= 0:
        lo = np.minimum(start, lengths)
        hi = np.minimum(end, lengths) if end > 0 else lengths
    else:
        lo = np.maximum(lengths + start, 0)
        hi = lengths if end == 0 else np.maximum(np.minimum(lengths + end, lengths), 0)
    hi = np.maximum(hi, lo)
    out_lens = hi - lo

    if pad:
        pad_len = int(end - start) if start >= 0 and end > 0 else int(-start if end == 0 else end - start)
        # vectorized padded gather: [n, pad_len] index matrix
        pos = np.arange(pad_len)[None, :]
        src = offs[:-1, None] + lo[:, None] + pos
        valid = pos < out_lens[:, None]
        src = np.clip(src, 0, max(len(vals) - 1, 0))
        mat = vals[src] if len(vals) else np.zeros((n, pad_len), dtype=vals.dtype)
        fill = np.asarray(pad_value).astype(mat.dtype) if np.issubdtype(mat.dtype, np.number) else pad_value
        mat = np.where(valid, mat, fill)
        new_offs = np.arange(0, (n + 1) * pad_len, pad_len, dtype=np.int64)
        return Column(mat.reshape(-1), new_offs, col.validity)

    new_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(out_lens, out=new_offs[1:])
    total = int(new_offs[-1])
    starts_abs = offs[:-1] + lo
    flat_idx = np.repeat(starts_abs, out_lens) + (
        np.arange(total) - np.repeat(new_offs[:-1], out_lens)
    )
    new_vals = vals[flat_idx] if total else vals[:0]
    return Column(new_vals, new_offs, col.validity)
