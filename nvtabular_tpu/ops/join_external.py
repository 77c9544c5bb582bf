"""JoinExternal (reference nvtabular/ops/join_external.py:35-221): broadcast
left/inner join against an external table, cached host-side per worker."""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from ..schema import ColumnSchema, Schema
from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .groupby_stats import combine_keys
from .operator import Operator


class JoinExternal(Operator):
    jit_safe = False

    def __init__(
        self,
        df_ext,
        on,
        how: str = "left",
        on_ext=None,
        columns_ext: Optional[List[str]] = None,
        drop_duplicates_ext: bool = False,
        kind_ext: Optional[str] = None,
        cache: str = "host",
        **kwargs,
    ):
        super().__init__()
        if how not in ("left", "inner"):
            raise ValueError("how must be 'left' or 'inner'")
        self.on = [on] if isinstance(on, str) else list(on)
        self.on_ext = [on_ext] if isinstance(on_ext, str) else list(on_ext or self.on)
        self.how = how
        self.columns_ext = columns_ext
        self.drop_duplicates_ext = drop_duplicates_ext
        self.cache = cache
        self._ext_source = df_ext
        self._ext: Optional[TableBatch] = None
        self._ext_keys = None
        self._ext_index = None

    def _load_ext(self) -> TableBatch:
        if self._ext is None:
            src = self._ext_source
            if isinstance(src, TableBatch):
                ext = src
            elif isinstance(src, str) or isinstance(src, (list, tuple)):
                from ..io.dataset import Dataset

                ext = Dataset(src).to_table()
            elif type(src).__module__.startswith("pandas"):
                ext = TableBatch.from_pandas(src)
            else:
                from ..io.dataset import Dataset

                ext = src.to_table() if isinstance(src, Dataset) else Dataset(src).to_table()
            if self.columns_ext:
                keep = list(dict.fromkeys(self.on_ext + self.columns_ext))
                ext = ext.select([c for c in keep if c in ext])
            ext = ext.to_host()
            if self.drop_duplicates_ext:
                keys = combine_keys([np.asarray(ext[k].values) for k in self.on_ext])
                _, first_idx = np.unique(keys, return_index=True)
                ext = ext.take(np.sort(first_idx))
            self._ext = ext
        return self._ext

    def _ext_lookup(self, key_arrays):
        import pyarrow as pa
        import pyarrow.compute as pc

        ext = self._load_ext()
        if self._ext_keys is None:
            keys = combine_keys([np.asarray(ext[k].values) for k in self.on_ext])
            self._ext_keys = pa.array(
                keys.tolist() if keys.dtype.kind == "O" else keys
            )
        combined = combine_keys([np.asarray(a) for a in key_arrays])
        arr = pa.array(combined.tolist() if combined.dtype.kind == "O" else combined)
        idx = pc.index_in(arr, value_set=self._ext_keys)
        found = idx.is_valid().to_numpy(zero_copy_only=False)
        idx_np = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        return idx_np, found

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        batch = batch.to_host()
        ext = self._load_ext()
        key_arrays = [np.asarray(batch[k].values) for k in self.on]
        idx, found = self._ext_lookup(key_arrays)
        out = TableBatch()
        if self.how == "inner":
            sel = np.nonzero(found)[0]
            base = batch.take(sel)
            idx, found = idx[sel], found[sel]
        else:
            base = batch
        for name in base.column_names:
            out[name] = base[name]
        ext_cols = [c for c in ext.column_names if c not in self.on_ext]
        for name in ext_cols:
            col = ext[name]
            vals = np.asarray(col.values)[idx]
            if self.how == "left":
                validity = found.copy()
                if col.validity is not None:
                    validity &= np.asarray(col.validity)[idx]
                out[name] = Column(vals, None, validity if not validity.all() else None)
            else:
                valid = np.asarray(col.validity)[idx] if col.validity is not None else None
                out[name] = Column(vals, None, valid)
        return out

    def compute_output_schema(self, input_schema, col_selector, prev_output_schema=None):
        ext = self._load_ext()
        ext_schema = ext.infer_schema()
        out = Schema(list(input_schema))
        for cs in ext_schema:
            if cs.name not in self.on_ext:
                out = out + Schema([cs])
        return out

    def set_storage_path(self, new_path, copy=False):
        """Persist the external table as a parquet artifact (the serializer
        calls this before serialize_params — same contract as Categorify's
        vocab artifacts, reference categorify.py:1855-1881)."""
        import os

        import pyarrow.parquet as pq

        os.makedirs(new_path, exist_ok=True)
        dest = os.path.join(new_path, "join_ext.parquet")
        pq.write_table(self._load_ext().to_arrow(), dest)
        self._ext_path = dest

    def serialize_params(self):
        ext_path = getattr(self, "_ext_path", None)
        if ext_path is None and isinstance(self._ext_source, str):
            ext_path = self._ext_source
        if ext_path is None:
            raise NotImplementedError(
                "JoinExternal requires set_storage_path before serialization"
            )
        return {
            "df_ext": ext_path,
            "on": self.on,
            "on_ext": self.on_ext,
            "how": self.how,
            "columns_ext": self.columns_ext,
            "drop_duplicates_ext": self.drop_duplicates_ext,
            "cache": self.cache,
        }
