"""JoinGroupby (reference nvtabular/ops/join_groupby.py:76-283): per-category
aggregates of continuous columns computed at fit, broadcast-merged back onto
rows at transform. Output naming matches the reference:
`{group}_{stat}` for count, `{group}_{cont}_{stat}` otherwise; stat dtype
coercion per AGG_DTYPES (join_groupby.py:29-34)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .. import dtypes as md
from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .groupby_stats import GroupbyStatsAccum, KeyedStats
from .operator import Operator
from .stat_operator import StatOperator

AGG_DTYPES = {
    "count": np.int32,
    "std": np.float32,
    "var": np.float32,
    "mean": np.float32,
}

_SUPPORTED = ("count", "sum", "mean", "std", "var", "min", "max")


class JoinGroupby(StatOperator):
    jit_safe = False  # transform does host-side hash joins against stats

    def __init__(
        self,
        cont_cols=None,
        stats=("count",),
        split_out=None,
        split_every=None,
        cat_cache="host",
        out_path=None,
        on_host=True,
        name_sep="_",
        **kwargs,
    ):
        super().__init__()
        self.name_sep = name_sep
        self.stats = list(stats)
        for s in self.stats:
            if s not in _SUPPORTED:
                raise ValueError(f"Unsupported stat {s!r}; supported: {_SUPPORTED}")
        self.out_path = out_path or "./"
        self.cat_cache = cat_cache
        self.on_host = on_host
        self.split_out = split_out
        self.split_every = split_every

        if isinstance(cont_cols, str):
            cont_cols = [cont_cols]
        self._cont_selector = (
            ColumnSelector(cont_cols) if isinstance(cont_cols, (list, tuple)) else cont_cols
        )
        self.keyed: Dict[str, KeyedStats] = {}
        self.categories: Dict[str, str] = {}

    @property
    def cont_names(self) -> List[str]:
        if self._cont_selector is None:
            return []
        if isinstance(self._cont_selector, ColumnSelector):
            return self._cont_selector.names
        # Node dependency
        return list(getattr(self._cont_selector, "output_columns", []))

    @property
    def dependencies(self):
        return [self._cont_selector] if self._cont_selector is not None else None

    # --- group structure ---------------------------------------------------
    def _groups(self, col_selector: ColumnSelector):
        groups = []
        for entry in col_selector.grouped_names:
            if isinstance(entry, tuple):
                groups.append(list(entry))
            else:
                groups.append([entry])
        return groups

    def _group_name(self, group: List[str]) -> str:
        return self.name_sep.join(group)

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        sel = super().compute_selector(input_schema, selector, parents_selector, dependencies_selector)
        drop = set(self.cont_names)
        return ColumnSelector(
            [n for n in sel._names if n not in drop],
            subgroups=sel.subgroups,
        )

    def column_mapping(self, col_selector: ColumnSelector):
        mapping = {}
        for group in self._groups(col_selector):
            name = self._group_name(group)
            for stat in self.stats:
                if stat == "count":
                    mapping[f"{name}_count"] = list(group)
                else:
                    for cont in self.cont_names:
                        mapping[f"{name}_{cont}_{stat}"] = [cont, *group]
        return mapping

    # --- fit -------------------------------------------------------------
    def fit_init(self, col_selector, input_schema):
        agg_specs = {}
        non_count = [s for s in self.stats if s != "count"]
        if "count" in self.stats or not non_count:
            pass  # __rows always tracked by the accumulator
        for cont in self.cont_names:
            if non_count:
                agg_specs[cont] = non_count
        return {
            self._group_name(g): GroupbyStatsAccum(g, agg_specs)
            for g in self._groups(col_selector)
        }

    def fit_batch(self, col_selector, batch, state):
        host = batch.to_host()
        cont_arrays = {
            c: np.asarray(host[c].values, dtype=np.float64) for c in self.cont_names
        }
        # respect null masks in continuous cols
        for c in self.cont_names:
            col = host[c]
            if col.validity is not None:
                vals = cont_arrays[c].copy()
                vals[~np.asarray(col.validity)] = np.nan
                cont_arrays[c] = vals
        for group in self._groups(col_selector):
            key_arrays = [np.asarray(host[k].values) for k in group]
            state[self._group_name(group)].update(key_arrays, cont_arrays)
        return state

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            for name in out:
                out[name].merge(s[name])
        return out

    def fit_reduce_multihost(self, state):
        """Large int-keyed group tables ride the all-to-all row exchange
        instead of the whole-accumulator pickle allgather (see
        groupby_stats.reduce_accums_multihost)."""
        from .groupby_stats import reduce_accums_multihost

        merged, self.last_fit_reduce = reduce_accums_multihost(state)
        return merged

    def fit_finalize(self, state):
        import os

        import pyarrow.parquet as pq

        out_dir = os.path.join(self.out_path, "categories")
        os.makedirs(out_dir, exist_ok=True)
        for name, accum in state.items():
            keyed = accum.finalize()
            self.keyed[name] = keyed
            path = os.path.join(out_dir, f"cat_stats.{name}.parquet")
            pq.write_table(keyed.to_arrow(), path)
            self.categories[name] = path

    def clear(self):
        super().clear()
        self.keyed, self.categories = {}, {}

    def set_storage_path(self, new_path, copy=False):
        import os
        import shutil

        os.makedirs(new_path, exist_ok=True)
        new_cats = {}
        for key, path in self.categories.items():
            dest = os.path.join(new_path, os.path.basename(path))
            (shutil.copyfile if copy else shutil.move)(path, dest)
            new_cats[key] = dest
        self.categories = new_cats

    # --- transform ---------------------------------------------------------
    def is_jit_safe(self, col_selector, input_schema):
        """Device path: int-key groups whose fitted stats admit a gather
        lookup — single keys via KeyedStats.lookup_struct, multi-key groups
        via the collision-checked hash pair (hashed_lookup_struct)."""
        if not self.fitted or input_schema is None:
            return False
        for cs in input_schema:
            if cs.dtype.is_string or not cs.dtype.is_numeric:
                return False
        for group in self._groups(col_selector):
            keyed = self.keyed.get(self._group_name(group))
            if keyed is None or not keyed.device_ready():
                return False
        return True

    def device_state(self):
        state = {}
        for name, keyed in self.keyed.items():
            entries = keyed.device_state_entries(f"joingroupby:{id(self)}:{name}")
            if not entries:
                continue
            state.update(entries)
            for stat in self.stats:
                if stat == "count":
                    state[f"joingroupby:{id(self)}:{name}:__rows"] = keyed.padded_stat(
                        "__rows", 0, dtype=np.int32
                    )
                else:
                    for cont in self.cont_names:
                        key = f"{cont}.{stat}"
                        state[f"joingroupby:{id(self)}:{name}:{key}"] = keyed.padded_stat(
                            key, np.nan
                        )
        return state

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        from ..table import xnp

        out = TableBatch()
        host = None
        for group in self._groups(col_selector):
            name = self._group_name(group)
            keyed = self.keyed[name]
            cols = [batch[k] for k in group]
            if keyed.device_ready() and all(xnp(c.values) is not np for c in cols):
                self._transform_device(out, name, keyed, cols)
                continue
            if host is None:
                host = batch.to_host()
            key_arrays = [np.asarray(host[k].values) for k in group]
            idx, found = keyed.row_indices(key_arrays)
            for k in group:  # null keys never join (device path agrees)
                kv = host[k].validity
                if kv is not None:
                    found = found & np.asarray(kv)
            for stat in self.stats:
                if stat == "count":
                    vals = np.where(found, keyed.stats["__rows"][idx], 0)
                    out[f"{name}_count"] = Column(vals.astype(AGG_DTYPES["count"]))
                else:
                    for cont in self.cont_names:
                        vals = np.where(found, keyed.stats[f"{cont}.{stat}"][idx], np.nan)
                        dtype = AGG_DTYPES.get(stat, np.float32)
                        out[f"{name}_{cont}_{stat}"] = Column(vals.astype(dtype))
        return out

    def _transform_device(self, out: TableBatch, name: str, keyed, cols):
        """Gather-based broadcast join: key(s) → stats-row index (1-2
        gathers; multi-key via the verified hash pair) then one float
        gather per stat column."""
        import jax.numpy as jnp

        from ..dag.device_state import get_device_state

        idx = keyed.device_group_index(f"joingroupby:{id(self)}:{name}", cols)

        def stat_array(key, default):
            arr = get_device_state(f"joingroupby:{id(self)}:{name}:{key}")
            if arr is None:
                arr = jnp.asarray(keyed.padded_stat(key, default))
            return arr

        for stat in self.stats:
            if stat == "count":
                arr = get_device_state(f"joingroupby:{id(self)}:{name}:__rows")
                if arr is None:
                    arr = jnp.asarray(keyed.padded_stat("__rows", 0, dtype=np.int32))
                vals = jnp.take(arr, idx)
                out[f"{name}_count"] = Column(vals.astype(jnp.dtype(AGG_DTYPES["count"])))
            else:
                dtype = AGG_DTYPES.get(stat, np.float32)
                for cont in self.cont_names:
                    vals = jnp.take(stat_array(f"{cont}.{stat}", np.nan), idx)
                    out[f"{name}_{cont}_{stat}"] = Column(vals.astype(jnp.dtype(dtype)))

    def _compute_dtype(self, col_schema, input_schema):
        for agg, dtype in AGG_DTYPES.items():
            if col_schema.name.endswith(f"{self.name_sep}{agg}"):
                return col_schema.with_dtype(md.normalize(dtype))
        return col_schema.with_dtype(md.float32)

    def _compute_shape(self, col_schema, input_schema):
        return col_schema.with_shape(md.Shape.scalar())

    # --- persistence ---------------------------------------------------------
    def serialize_params(self):
        return {
            "cont_cols": self.cont_names,
            "stats": self.stats,
            "cat_cache": self.cat_cache if isinstance(self.cat_cache, str) else "host",
            "out_path": self.out_path,
            "on_host": self.on_host,
            "name_sep": self.name_sep,
        }

    def serialize_state(self):
        if not self.fitted:
            return None
        return {
            "categories": self.categories,
            "key_cols": {name: self.keyed[name].key_cols for name in self.keyed},
        }

    def deserialize_state(self, state):
        import pyarrow.parquet as pq

        self.categories = dict(state["categories"])
        for name, path in self.categories.items():
            tbl = pq.read_table(path)
            self.keyed[name] = KeyedStats.from_arrow(tbl, state["key_cols"][name])
        self.fitted = True
