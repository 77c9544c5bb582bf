"""Columnar in-memory batch — the unit of data flowing through the DAG.

This is the TPU-native replacement for the reference's pandas/cudf DataFrame
partitions (reference operators transform one DataFrame per dask partition,
nvtabular/ops/operator.py:24-27). Here a partition is a ``TableBatch``: an
ordered dict of ``Column``s, where each column is either

* a scalar column: 1-D ``values`` array of length ``num_rows``
* a list (multihot/ragged) column: flat ``values`` + ``offsets`` (len rows+1),
  the arrow/cudf list layout the reference moves through its loaders
  (reference nvtabular/loader/tensorflow.py:144-147)

Arrays are either numpy (host path: strings, I/O, out-of-core glue) or
jax.Array (device path: jit-fused transforms in HBM). Null semantics use an
optional boolean ``validity`` mask (True = valid), matching arrow; float NaN
is additionally treated as null by ``is_null`` to mirror pandas behavior.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

from . import dtypes as md
from .schema import ColumnSchema, Schema


def _is_jax(arr) -> bool:
    # avoid importing jax at module load in pure-host contexts
    mod = type(arr).__module__
    return mod.startswith("jax") or "ArrayImpl" in type(arr).__name__


def xnp(*arrays):
    """Return the array module (numpy or jax.numpy) for the given arrays."""
    for a in arrays:
        if a is not None and _is_jax(a):
            import jax.numpy as jnp

            return jnp
    return np


def _asarray(values):
    if isinstance(values, Column):
        return values.values
    if _is_jax(values):
        return values
    if isinstance(values, np.ndarray):
        return values
    arr = np.asarray(values)
    if arr.dtype.kind in ("U", "S"):
        arr = arr.astype(object)
    return arr


class Column:
    """One column: flat values, optional list offsets, optional validity mask."""

    __slots__ = ("values", "offsets", "validity")

    def __init__(self, values, offsets=None, validity=None):
        self.values = _asarray(values)
        self.offsets = _asarray(offsets) if offsets is not None else None
        self.validity = _asarray(validity) if validity is not None else None
        if self.validity is not None and self.validity.dtype != np.bool_ and not _is_jax(
            self.validity
        ):
            self.validity = self.validity.astype(bool)

    # --- basic info -----------------------------------------------------
    @property
    def is_list(self) -> bool:
        return self.offsets is not None

    @property
    def dtype(self) -> md.DType:
        return md.normalize(self.values.dtype)

    def __len__(self) -> int:
        if self.offsets is not None:
            return int(self.offsets.shape[0]) - 1
        return int(self.values.shape[0])

    @property
    def num_rows(self) -> int:
        return len(self)

    @property
    def backend(self) -> str:
        return "jax" if _is_jax(self.values) else "numpy"

    @property
    def row_lengths(self):
        if self.offsets is None:
            raise ValueError("not a list column")
        return self.offsets[1:] - self.offsets[:-1]

    # --- nulls ------------------------------------------------------------
    def is_null(self):
        """Boolean array, True where the row value is null (mask or NaN)."""
        m = xnp(self.values)
        if self.is_list:
            if self.validity is not None:
                return ~self.validity
            return m.zeros(len(self), dtype=bool)
        out = None
        if self.validity is not None:
            out = ~self.validity
        if self.values.dtype.kind == "f":
            nan = m.isnan(self.values)
            out = nan if out is None else (out | nan)
        elif getattr(self.values.dtype, "kind", None) == "O":
            isnan = np.array(
                [v is None or (isinstance(v, float) and np.isnan(v)) for v in self.values],
                dtype=bool,
            )
            out = isnan if out is None else (out | isnan)
        if out is None:
            out = m.zeros(len(self), dtype=bool)
        return out

    def has_nulls(self) -> bool:
        return bool(xnp(self.values).any(self.is_null()))

    def drop_validity(self) -> "Column":
        return Column(self.values, self.offsets)

    # --- transforms ---------------------------------------------------------
    def astype(self, dtype) -> "Column":
        npd = md.to_numpy(dtype)
        m = xnp(self.values)
        if self.backend == "jax":
            import jax.numpy as jnp

            return Column(self.values.astype(jnp.dtype(npd)), self.offsets, self.validity)
        return Column(self.values.astype(npd), self.offsets, self.validity)

    def take(self, indices) -> "Column":
        """Gather rows by index (host path supports lists; device scalars only)."""
        indices = _asarray(indices)
        if not self.is_list:
            vals = valid = None
            if (
                isinstance(self.values, np.ndarray)
                and isinstance(indices, np.ndarray)
                and indices.dtype.kind in "iu"
            ):
                # GIL-releasing native gather: shuffle permutations run
                # thread-parallel in the parquet writer pool
                try:
                    from .serving.native import take_rows

                    vals = take_rows(self.values, indices)
                    if vals is not None and self.validity is not None:
                        valid = take_rows(self.validity, indices)
                except Exception:
                    vals = valid = None
            if vals is None:
                vals = self.values[indices]
            if valid is None and self.validity is not None:
                valid = self.validity[indices]
            return Column(vals, None, valid)
        # list column gather (host path)
        offs = np.asarray(self.offsets)
        idx = np.asarray(indices)
        lengths = (offs[1:] - offs[:-1])[idx]
        new_offs = np.zeros(len(idx) + 1, dtype=offs.dtype)
        np.cumsum(lengths, out=new_offs[1:])
        starts = offs[:-1][idx]
        flat_idx = np.repeat(starts, lengths) + (
            np.arange(int(new_offs[-1])) - np.repeat(new_offs[:-1], lengths)
        )
        vals = np.asarray(self.values)[flat_idx]
        valid = np.asarray(self.validity)[idx] if self.validity is not None else None
        return Column(vals, new_offs, valid)

    def slice(self, start: int, length: int) -> "Column":
        stop = start + length
        if not self.is_list:
            return Column(
                self.values[start:stop],
                None,
                self.validity[start:stop] if self.validity is not None else None,
            )
        offs = self.offsets[start : stop + 1]
        vals = self.values[int(offs[0]) : int(offs[-1])]
        new_offs = offs - offs[0]
        valid = self.validity[start:stop] if self.validity is not None else None
        return Column(vals, new_offs, valid)

    def to_host(self) -> "Column":
        if self.backend == "numpy":
            return self
        return Column(
            np.asarray(self.values),
            np.asarray(self.offsets) if self.offsets is not None else None,
            np.asarray(self.validity) if self.validity is not None else None,
        )

    def to_device(self) -> "Column":
        import jax.numpy as jnp

        if self.backend == "jax":
            return self
        if self.values.dtype.kind in ("O", "U", "S", "M"):
            raise TypeError(
                f"column of dtype {self.values.dtype} cannot be placed on device; "
                "dictionary-encode or hash strings host-side first"
            )
        vals = self.values
        if vals.dtype == np.int64:
            vals = vals if _int64_fits_in32(vals) is False else vals
        return Column(
            jnp.asarray(vals),
            jnp.asarray(self.offsets) if self.offsets is not None else None,
            jnp.asarray(self.validity) if self.validity is not None else None,
        )

    def to_pylist(self) -> list:
        c = self.to_host()
        if not c.is_list:
            nulls = np.asarray(c.is_null())
            return [None if nulls[i] else c.values[i].item() if hasattr(c.values[i], "item") else c.values[i] for i in range(len(c))]
        offs = np.asarray(c.offsets)
        vals = np.asarray(c.values)
        return [vals[offs[i] : offs[i + 1]].tolist() for i in range(len(c))]

    def __array__(self, dtype=None, copy=None):
        """numpy interop: a Column acts as its (flat) values array, so
        numpy/jnp ufuncs apply directly (UDF/LambdaOp contract)."""
        arr = np.asarray(self.to_host().values)
        return arr.astype(dtype) if dtype is not None else arr

    def __repr__(self):
        kind = "list" if self.is_list else "scalar"
        return f"Column({kind}, {self.dtype.name}, n={len(self)}, backend={self.backend})"


def _int64_fits_in32(vals) -> bool:
    if vals.size == 0:
        return True
    mx, mn = vals.max(), vals.min()
    return mx <= np.iinfo(np.int32).max and mn >= np.iinfo(np.int32).min


ColumnLike = Union[Column, np.ndarray, list, tuple]


def as_column(data) -> Column:
    if isinstance(data, Column):
        return data
    if isinstance(data, tuple) and len(data) == 2:
        return Column(data[0], data[1])
    if isinstance(data, list) and data and isinstance(data[0], (list, np.ndarray)):
        # list-of-lists → ragged column
        lengths = np.array([len(x) for x in data], dtype=np.int64)
        offsets = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        flat = np.concatenate([np.asarray(x) for x in data]) if len(data) else np.array([])
        return Column(flat, offsets)
    if isinstance(data, list) and any(v is None for v in data):
        valid = np.array([v is not None for v in data], dtype=bool)
        filled = [v if v is not None else 0 for v in data]
        arr = _asarray(filled)
        if arr.dtype.kind in ("i", "u") or arr.dtype.kind == "f":
            return Column(arr, None, valid)
        return Column(_asarray(data), None, valid)
    return Column(data)


class TableBatch:
    """Ordered dict of named Columns with equal row counts."""

    def __init__(self, columns: Union[Dict[str, Any], None] = None):
        self._columns: Dict[str, Column] = {}
        # global row index of this batch's first row within its dataset scan;
        # gives ops a stable per-row identity (e.g. TargetEncoding folds)
        self.row_offset: int = 0
        if columns:
            for name, col in columns.items():
                self[name] = col

    # --- container protocol ------------------------------------------------
    @property
    def column_names(self) -> List[str]:
        return list(self._columns.keys())

    @property
    def columns(self) -> Dict[str, Column]:
        return self._columns

    @property
    def num_rows(self) -> int:
        for col in self._columns.values():
            return len(col)
        return 0

    def __len__(self):
        return self.num_rows

    def __contains__(self, name):
        return name in self._columns

    def __iter__(self):
        return iter(self._columns)

    def __getitem__(self, key) -> Union[Column, "TableBatch"]:
        if isinstance(key, str):
            return self._columns[key]
        return self.select(list(key))

    def __setitem__(self, name: str, col):
        col = as_column(col)
        if self._columns and len(col) != self.num_rows:
            raise ValueError(
                f"column {name!r} has {len(col)} rows, table has {self.num_rows}"
            )
        self._columns[name] = col

    def __delitem__(self, name: str):
        del self._columns[name]

    def copy(self) -> "TableBatch":
        out = TableBatch()
        out._columns = dict(self._columns)
        out.row_offset = self.row_offset
        return out

    # --- selection -----------------------------------------------------------
    def select(self, names: Iterable[str]) -> "TableBatch":
        out = TableBatch()
        out.row_offset = self.row_offset
        for n in names:
            out._columns[n] = self._columns[n]
        return out

    def drop(self, names: Iterable[str]) -> "TableBatch":
        drop = set(names)
        out = TableBatch()
        out.row_offset = self.row_offset
        for n, c in self._columns.items():
            if n not in drop:
                out._columns[n] = c
        return out

    def rename(self, mapping: Dict[str, str]) -> "TableBatch":
        out = TableBatch()
        out.row_offset = self.row_offset
        for n, c in self._columns.items():
            out._columns[mapping.get(n, n)] = c
        return out

    # --- row ops ----------------------------------------------------------
    def take(self, indices) -> "TableBatch":
        out = TableBatch()
        out.row_offset = self.row_offset
        for n, c in self._columns.items():
            out._columns[n] = c.take(indices)
        return out

    def slice(self, start: int, length: int) -> "TableBatch":
        out = TableBatch()
        out.row_offset = self.row_offset + start
        for n, c in self._columns.items():
            out._columns[n] = c.slice(start, length)
        return out

    def filter(self, mask) -> "TableBatch":
        mask = np.asarray(mask)
        idx = np.nonzero(mask)[0]
        return self.take(idx)

    # --- placement ----------------------------------------------------------
    def to_host(self) -> "TableBatch":
        out = TableBatch()
        out.row_offset = self.row_offset
        for n, c in self._columns.items():
            out._columns[n] = c.to_host()
        return out

    def to_device(self, only_numeric: bool = True) -> "TableBatch":
        out = TableBatch()
        out.row_offset = self.row_offset
        for n, c in self._columns.items():
            if only_numeric and c.values.dtype.kind in ("O", "U", "S", "M"):
                out._columns[n] = c
            else:
                out._columns[n] = c.to_device()
        return out

    # --- schema -----------------------------------------------------------
    def infer_schema(self) -> Schema:
        cols = []
        for name, col in self._columns.items():
            cols.append(
                ColumnSchema(
                    name,
                    dtype=col.dtype,
                    is_list=col.is_list,
                    is_ragged=col.is_list,
                )
            )
        return Schema(cols)

    # --- interop -------------------------------------------------------------
    @classmethod
    def from_pydict(cls, data: Dict[str, Any]) -> "TableBatch":
        out = cls()
        for name, values in data.items():
            out[name] = as_column(values)
        return out

    @classmethod
    def from_pandas(cls, df) -> "TableBatch":
        out = cls()
        for name in df.columns:
            ser = df[name]
            first_valid = ser.dropna()
            if len(first_valid) and isinstance(
                first_valid.iloc[0], (list, np.ndarray)
            ):
                out[name] = as_column([list(v) if v is not None else [] for v in ser])
                continue
            values = ser.to_numpy()
            if values.dtype.kind == "O":
                nulls = ser.isna().to_numpy()
                if nulls.any():
                    out[name] = Column(values, None, ~nulls)
                else:
                    out[name] = Column(values)
            else:
                out[name] = Column(values)
        return out

    def to_pandas(self):
        import pandas as pd

        data = {}
        for name, col in self._columns.items():
            c = col.to_host()
            if c.is_list:
                offs = np.asarray(c.offsets)
                vals = np.asarray(c.values)
                data[name] = pd.Series(
                    [vals[offs[i] : offs[i + 1]].tolist() for i in range(len(c))]
                )
            else:
                vals = np.asarray(c.values)
                if c.validity is not None:
                    nulls = ~np.asarray(c.validity)
                    if nulls.any():
                        if vals.dtype.kind in ("i", "u"):
                            vals = vals.astype("float64")
                            vals[nulls] = np.nan
                        elif vals.dtype.kind == "f":
                            vals = vals.copy()
                            vals[nulls] = np.nan
                        else:
                            vals = vals.astype(object)
                            vals[nulls] = None
                data[name] = vals
        return pd.DataFrame(data)

    @classmethod
    def from_arrow(cls, table) -> "TableBatch":
        import pyarrow as pa

        out = cls()
        table = table.combine_chunks()
        for name in table.column_names:
            arr = table.column(name)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
                if isinstance(arr, pa.ChunkedArray):
                    arr = pa.concat_arrays(arr.chunks) if arr.num_chunks else pa.array([])
            out._columns[name] = _arrow_to_column(arr)
        return out

    def to_arrow(self):
        import pyarrow as pa

        arrays = []
        names = []
        for name, col in self._columns.items():
            arrays.append(_column_to_arrow(col.to_host()))
            names.append(name)
        return pa.table(arrays, names=names)

    def to_dict_of_arrays(self) -> Dict[str, Any]:
        """Flat dict view for jit boundaries: scalar cols map to their values
        array; list cols map to (name, '__values')/(name, '__offsets')."""
        out = {}
        for name, col in self._columns.items():
            if col.is_list:
                out[f"{name}__values"] = col.values
                out[f"{name}__offsets"] = col.offsets
            else:
                out[name] = col.values
            if col.validity is not None:
                out[f"{name}__validity"] = col.validity
        return out

    @classmethod
    def from_dict_of_arrays(cls, data: Dict[str, Any]) -> "TableBatch":
        out = cls()
        names = []
        for key in data:
            if key.endswith("__values"):
                names.append(key[: -len("__values")])
            elif not key.endswith("__offsets") and not key.endswith("__validity"):
                names.append(key)
        for name in names:
            if f"{name}__values" in data:
                col = Column(
                    data[f"{name}__values"],
                    data[f"{name}__offsets"],
                    data.get(f"{name}__validity"),
                )
            else:
                col = Column(data[name], None, data.get(f"{name}__validity"))
            out._columns[name] = col
        return out

    def __repr__(self):
        cols = ", ".join(
            f"{n}:{c.dtype.name}{'[list]' if c.is_list else ''}" for n, c in self._columns.items()
        )
        return f"TableBatch(rows={self.num_rows}, [{cols}])"


def _arrow_to_column(arr) -> Column:
    import pyarrow as pa
    import pyarrow.types as pat

    if pat.is_list(arr.type) or pat.is_large_list(arr.type):
        offsets = np.asarray(arr.offsets)
        values = _arrow_values_to_numpy(arr.values)
        validity = None
        if arr.null_count:
            validity = ~np.asarray(arr.is_null())
        return Column(values, offsets.astype(np.int64), validity)
    values = _arrow_values_to_numpy(arr)
    validity = None
    if arr.null_count:
        validity = ~np.asarray(arr.is_null())
    return Column(values, None, validity)


def _arrow_values_to_numpy(arr):
    import pyarrow.types as pat

    if pat.is_string(arr.type) or pat.is_large_string(arr.type):
        return np.asarray(arr.to_pylist(), dtype=object)
    if pat.is_dictionary(arr.type):
        return np.asarray(arr.to_pylist(), dtype=object)
    if arr.null_count:
        # fill nulls with 0 in values; the validity mask carries the nulls
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, 0)
    return arr.to_numpy(zero_copy_only=False)


def _column_to_arrow(col: Column):
    import pyarrow as pa

    if col.is_list:
        values = col.values
        if values.dtype.kind == "O":
            inner = pa.array(values.tolist())
        else:
            inner = pa.array(values)
        offsets = np.asarray(col.offsets).astype(np.int32)
        arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), inner)
        if col.validity is not None:
            # rebuild with mask
            arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), inner
            )
        return arr
    vals = col.values
    mask = None
    if col.validity is not None:
        mask = ~np.asarray(col.validity)
    if vals.dtype.kind == "O":
        return pa.array(vals.tolist(), mask=mask)
    if vals.dtype.kind == "f" and mask is None:
        nan = np.isnan(vals)
        if nan.any():
            mask = nan
    return pa.array(vals, mask=mask)


def concat_rows(batches: Sequence[TableBatch]) -> TableBatch:
    """Vertically concatenate batches (host path)."""
    batches = [b for b in batches if b.num_rows > 0] or list(batches[:1])
    if len(batches) == 1:
        return batches[0]
    out = TableBatch()
    names = batches[0].column_names
    for name in names:
        cols = [b[name].to_host() for b in batches]
        if cols[0].is_list:
            values = np.concatenate([np.asarray(c.values) for c in cols])
            offsets = [np.asarray(cols[0].offsets)]
            total = offsets[0][-1]
            for c in cols[1:]:
                offsets.append(np.asarray(c.offsets)[1:] + total)
                total += np.asarray(c.offsets)[-1]
            offs = np.concatenate(offsets)
            valid = _concat_validity(cols)
            out[name] = Column(values, offs, valid)
        else:
            values = np.concatenate([np.asarray(c.values) for c in cols])
            valid = _concat_validity(cols)
            out[name] = Column(values, None, valid)
    return out


def _concat_validity(cols):
    if all(c.validity is None for c in cols):
        return None
    parts = []
    for c in cols:
        if c.validity is None:
            parts.append(np.ones(len(c), dtype=bool))
        else:
            parts.append(np.asarray(c.validity))
    return np.concatenate(parts)


def concat_columns(batches: Sequence[TableBatch]) -> TableBatch:
    """Horizontally concatenate batches (later batches win on name clash)."""
    out = TableBatch()
    if batches:
        out.row_offset = batches[0].row_offset
    for b in batches:
        for name, col in b.columns.items():
            out._columns[name] = col
    return out
