"""TargetEncoding (reference nvtabular/ops/target_encoding.py:89-439):
k-fold out-of-fold smoothed target mean per categorical group:

    TE = (sum_oof + p_smooth * global_mean) / (count_oof + p_smooth)

Fit reuses the shared groupby engine with (fold, group) keys — per-fold
sums/counts aggregate to per-group totals, mirroring how the reference reuses
Categorify's `_category_stats` with ["count","sum"] (target_encoding.py:199-214)
plus `_custom_moments` for the global mean.

Fold assignment is a seeded hash of the row's GLOBAL index within the dataset
scan (batch.row_offset + position) — deterministic across fit and transform,
the stateless analog of the reference's seeded index-based `_add_fold`
(:427-439)."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import numpy as np

from .. import dtypes as md
from ..dispatch import hash_lanes
from ..selector import ColumnSelector
from ..table import Column, TableBatch
from .groupby_stats import GroupbyStatsAccum, KeyedStats
from .stat_operator import StatOperator

FOLD_NAME = "__fold__"


def _fold_ids(row_offset: int, n: int, kfold: int, seed: int) -> np.ndarray:
    idx = np.arange(row_offset, row_offset + n, dtype=np.int64)
    lo = (idx & 0xFFFFFFFF).astype(np.uint32)
    hi = (idx >> 32).astype(np.uint32)
    return (hash_lanes(lo, hi, seed) % np.uint32(kfold)).astype(np.int64)


def _fold_ids_dev(lanes, n: int, kfold: int, seed: int):
    """Device fold assignment from traced (lo, hi) row-offset lanes —
    bit-identical to the host `_fold_ids` (same uint32 lane hash), with a
    32-bit carry so >2^32-row datasets assign correctly."""
    import jax.numpy as jnp

    lo_off, hi_off = lanes
    i = jnp.arange(n, dtype=jnp.uint32)
    lo = (lo_off.astype(jnp.uint32) + i).astype(jnp.uint32)
    carry = (lo < lo_off.astype(jnp.uint32)).astype(jnp.uint32)
    hi = hi_off.astype(jnp.uint32) + carry
    return (hash_lanes(lo, hi, seed) % np.uint32(kfold)).astype(jnp.int32)


class TargetEncoding(StatOperator):
    jit_safe = False

    def __init__(
        self,
        target,
        target_mean=None,
        kfold=None,
        fold_seed=42,
        p_smooth=20,
        out_col=None,
        out_dtype=None,
        split_out=None,
        split_every=None,
        cat_cache="host",
        out_path=None,
        on_host=True,
        name_sep="_",
        drop_folds=True,
        **kwargs,
    ):
        super().__init__()
        if isinstance(target, str):
            target = [target]
        if isinstance(target, ColumnSelector):
            target = target.names
        self.target = list(target)
        self.target_mean = target_mean
        self.kfold = kfold or 3
        self.fold_seed = fold_seed
        self.p_smooth = p_smooth
        self.out_col = [out_col] if isinstance(out_col, str) else out_col
        self.out_dtype = out_dtype
        self.out_path = out_path or "./"
        self.cat_cache = cat_cache
        self.on_host = on_host
        self.name_sep = name_sep
        self.drop_folds = drop_folds
        self.fold_name = FOLD_NAME

        self.means: Dict[str, float] = dict(target_mean or {})
        self.fold_stats: Dict[str, KeyedStats] = {}
        self.overall_stats: Dict[str, KeyedStats] = {}
        self.categories: Dict[str, str] = {}

    @property
    def dependencies(self):
        return [ColumnSelector(self.target)]

    # --- group structure --------------------------------------------------
    def _groups(self, col_selector: ColumnSelector) -> List[List[str]]:
        groups = []
        for entry in col_selector.grouped_names:
            if isinstance(entry, tuple):
                groups.append(list(entry))
            else:
                groups.append([entry])
        return groups

    def _group_tag(self, group: List[str]) -> str:
        return self.name_sep.join(group)

    def compute_selector(self, input_schema, selector, parents_selector=None, dependencies_selector=None):
        sel = super().compute_selector(input_schema, selector, parents_selector, dependencies_selector)
        drop = set(self.target)
        return ColumnSelector(
            [n for n in sel._names if n not in drop], subgroups=sel.subgroups
        )

    def column_mapping(self, col_selector: ColumnSelector):
        mapping = {}
        groups = self._groups(col_selector)
        for gi, group in enumerate(groups):
            tag = self._group_tag(group)
            for ti, t in enumerate(self.target):
                if self.out_col:
                    flat_idx = gi * len(self.target) + ti
                    name = (
                        self.out_col[flat_idx]
                        if flat_idx < len(self.out_col)
                        else f"TE_{tag}_{t}"
                    )
                else:
                    name = f"TE_{tag}_{t}"
                mapping[name] = [*group, t]
        if self.kfold > 1 and not self.drop_folds:
            mapping[self.fold_name] = []
        return mapping

    def _te_name(self, gi: int, group: List[str], ti: int, target: str) -> str:
        if self.out_col:
            flat_idx = gi * len(self.target) + ti
            if flat_idx < len(self.out_col):
                return self.out_col[flat_idx]
        return f"TE_{self._group_tag(group)}_{target}"

    # --- fit ------------------------------------------------------------
    def fit_init(self, col_selector, input_schema):
        state = {"groups": {}, "sum": {t: 0.0 for t in self.target}, "cnt": {t: 0.0 for t in self.target}}
        agg_specs = {t: ["sum", "count"] for t in self.target}
        for group in self._groups(col_selector):
            tag = self._group_tag(group)
            key_cols = ([self.fold_name] if self.kfold > 1 else []) + group
            state["groups"][tag] = GroupbyStatsAccum(key_cols, agg_specs)
        return state

    def fit_batch(self, col_selector, batch, state):
        host = batch.to_host()
        n = host.num_rows
        targets = {}
        for t in self.target:
            vals = np.asarray(host[t].values, dtype=np.float64)
            col = host[t]
            if col.validity is not None:
                vals = vals.copy()
                vals[~np.asarray(col.validity)] = np.nan
            targets[t] = vals
            valid = ~np.isnan(vals)
            state["sum"][t] += float(vals[valid].sum())
            state["cnt"][t] += float(valid.sum())
        folds = _fold_ids(host.row_offset, n, self.kfold, self.fold_seed) if self.kfold > 1 else None
        for group in self._groups(col_selector):
            tag = self._group_tag(group)
            key_arrays = [np.asarray(host[k].values) for k in group]
            if folds is not None:
                key_arrays = [folds] + key_arrays
            state["groups"][tag].update(key_arrays, targets)
        return state

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            for tag in out["groups"]:
                out["groups"][tag].merge(s["groups"][tag])
            for t in self.target:
                out["sum"][t] += s["sum"][t]
                out["cnt"][t] += s["cnt"][t]
        return out

    def fit_reduce_multihost(self, state):
        """Multi-process reduction: the k-fold group tables (kfold × groups
        rows — the heavy state) ride the all-to-all row exchange; the global
        target sums are scalars and take the allgather. Same split as
        Categorify's vocab exchange (reference reduces TE state through the
        identical distributed groupby as vocabs, target_encoding.py:199-214)."""
        from ..parallel.multihost import allgather_pyobj

        from .groupby_stats import reduce_accums_multihost

        all_scalars = allgather_pyobj({"sum": state["sum"], "cnt": state["cnt"]})
        merged_sum = {t: sum(s["sum"][t] for s in all_scalars) for t in self.target}
        merged_cnt = {t: sum(s["cnt"][t] for s in all_scalars) for t in self.target}
        groups, self.last_fit_reduce = reduce_accums_multihost(state["groups"])
        return {"groups": groups, "sum": merged_sum, "cnt": merged_cnt}

    def fit_finalize(self, state):
        import os

        import pyarrow.parquet as pq

        for t in self.target:
            if t not in self.means:
                self.means[t] = state["sum"][t] / max(state["cnt"][t], 1.0)
        out_dir = os.path.join(self.out_path, "categories")
        os.makedirs(out_dir, exist_ok=True)
        for tag, accum in state["groups"].items():
            keyed = accum.finalize()
            self.fold_stats[tag] = keyed
            self.overall_stats[tag] = _sum_over_folds(keyed, self.fold_name) if self.kfold > 1 else keyed
            path = os.path.join(out_dir, f"te_stats.{tag}.parquet")
            pq.write_table(keyed.to_arrow(), path)
            self.categories[tag] = path

    def clear(self):
        super().clear()
        self.fold_stats, self.overall_stats, self.categories = {}, {}, {}
        self.means = dict(self.target_mean or {})
        self._fold_mats = {}

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

    # --- transform -----------------------------------------------------------
    # Device design (reference target_encoding.py:301-384 does these joins
    # via cudf merge): single-key groups gather through the Categorify
    # lookup machinery; MULTI-key groups through a collision-checked hash
    # pair (KeyedStats.hashed_lookup_struct); K-FOLD OOF subtracts a
    # [kfold, groups+1] in-fold matrix gathered at (fold, group) — fold ids
    # come from the traced global row offset, so the whole encoding stays
    # inside the fused jit program.

    def _group_device_ready(self, group: List[str]) -> bool:
        keyed = self.overall_stats.get(self._group_tag(group))
        if keyed is None or not keyed.device_ready():
            return False
        if self.kfold > 1 and self._group_tag(group) not in self.fold_stats:
            return False
        return True

    def is_jit_safe(self, col_selector, input_schema):
        if not self.fitted or input_schema is None:
            return False
        for cs in input_schema:
            if cs.dtype.is_string or not cs.dtype.is_numeric:
                return False
        return all(self._group_device_ready(g) for g in self._groups(col_selector))

    def _fold_matrix(self, tag: str, stat_key: str) -> np.ndarray:
        """[kfold, num_groups+1] in-fold stat matrix aligned to the OVERALL
        group row index (pad slot = all-zero column for misses)."""
        cache = getattr(self, "_fold_mats", None)
        if cache is None:
            cache = self._fold_mats = {}
        key = (tag, stat_key)
        if key not in cache:
            overall = self.overall_stats[tag]
            fkeyed = self.fold_stats[tag]
            mat = np.zeros((self.kfold, overall.num_groups + 1), dtype=np.float32)
            folds = np.asarray(fkeyed.key_arrays[self.fold_name]).astype(np.int64)
            group_arrays = [
                np.asarray(fkeyed.key_arrays[k])
                for k in fkeyed.key_cols
                if k != self.fold_name
            ]
            idx, found = overall.row_indices(group_arrays)
            vals = np.asarray(fkeyed.stats[stat_key], dtype=np.float64)
            mat[folds[found], idx[found]] = vals[found]
            cache[key] = mat
        return cache[key]

    def device_state(self):
        state = {}
        for tag, keyed in self.overall_stats.items():
            entries = keyed.device_state_entries(f"te:{id(self)}:{tag}")
            if not entries:
                continue
            state.update(entries)
            for t in self.target:
                state[f"te:{id(self)}:{tag}:{t}.sum"] = keyed.padded_stat(f"{t}.sum", 0.0)
                state[f"te:{id(self)}:{tag}:{t}.count"] = keyed.padded_stat(f"{t}.count", 0.0)
                if self.kfold > 1:
                    state[f"te:{id(self)}:{tag}:{t}.fsum"] = self._fold_matrix(tag, f"{t}.sum")
                    state[f"te:{id(self)}:{tag}:{t}.fcnt"] = self._fold_matrix(tag, f"{t}.count")
        return state

    def _transform_device(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        import jax.numpy as jnp

        from ..dag.device_state import get_device_state, get_row_offset_dev

        out = TableBatch()
        dtype = md.to_numpy(self.out_dtype) if self.out_dtype else np.float32
        n = batch.num_rows
        folds = None
        if self.kfold > 1:
            lanes = get_row_offset_dev()
            if lanes is None:  # eager device batch: host offset is concrete
                lanes = (
                    jnp.uint32((batch.row_offset or 0) & 0xFFFFFFFF),
                    jnp.uint32((batch.row_offset or 0) >> 32),
                )
            folds = _fold_ids_dev(lanes, n, self.kfold, self.fold_seed)
        for gi, group in enumerate(self._groups(col_selector)):
            tag = self._group_tag(group)
            keyed = self.overall_stats[tag]
            idx = keyed.device_group_index(
                f"te:{id(self)}:{tag}", [batch[k] for k in group]
            )
            stride = keyed.num_groups + 1
            for ti, t in enumerate(self.target):
                mean = jnp.float32(self.means.get(t, 0.0))
                s_arr = get_device_state(f"te:{id(self)}:{tag}:{t}.sum")
                c_arr = get_device_state(f"te:{id(self)}:{tag}:{t}.count")
                if s_arr is None:
                    s_arr = jnp.asarray(keyed.padded_stat(f"{t}.sum", 0.0))
                if c_arr is None:
                    c_arr = jnp.asarray(keyed.padded_stat(f"{t}.count", 0.0))
                s = jnp.take(s_arr, idx)
                c = jnp.take(c_arr, idx)
                if folds is not None:
                    fs = get_device_state(f"te:{id(self)}:{tag}:{t}.fsum")
                    fc = get_device_state(f"te:{id(self)}:{tag}:{t}.fcnt")
                    if fs is None:
                        fs = jnp.asarray(self._fold_matrix(tag, f"{t}.sum"))
                    if fc is None:
                        fc = jnp.asarray(self._fold_matrix(tag, f"{t}.count"))
                    flat = folds * stride + idx  # (fold, group) gather
                    s = s - jnp.take(fs.reshape(-1), flat)
                    c = c - jnp.take(fc.reshape(-1), flat)
                denom = c + self.p_smooth
                te = jnp.where(
                    denom > 0,
                    (s + self.p_smooth * mean) / jnp.maximum(denom, 1e-12),
                    mean,
                )
                out[self._te_name(gi, group, ti, t)] = Column(
                    te.astype(jnp.dtype(dtype))
                )
        if folds is not None and not self.drop_folds:
            out[self.fold_name] = Column(folds.astype(jnp.int32))
        return out

    def _device_eligible(self, col_selector, batch: TableBatch) -> bool:
        from ..table import xnp

        if not self.fitted:
            return False
        for group in self._groups(col_selector):
            if not self._group_device_ready(group):
                return False
            for k in group:
                if xnp(batch[k].values) is np:
                    return False
        return True

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        if self._device_eligible(col_selector, batch):
            return self._transform_device(col_selector, batch)
        host = batch.to_host()
        n = host.num_rows
        out = TableBatch()
        dtype = md.to_numpy(self.out_dtype) if self.out_dtype else np.float32
        folds = _fold_ids(host.row_offset, n, self.kfold, self.fold_seed) if self.kfold > 1 else None
        groups = self._groups(col_selector)
        for gi, group in enumerate(groups):
            tag = self._group_tag(group)
            overall = self.overall_stats[tag]
            key_arrays = [np.asarray(host[k].values) for k in group]
            idx_all, found_all = overall.row_indices(key_arrays)
            for k in group:  # null keys never join (device path agrees)
                kv = host[k].validity
                if kv is not None:
                    found_all = found_all & np.asarray(kv)
            if folds is not None:
                fkeyed = self.fold_stats[tag]
                idx_f, found_f = fkeyed.row_indices([folds] + key_arrays)
                for k in group:  # null keys contribute no in-fold stats
                    kv = host[k].validity
                    if kv is not None:
                        found_f = found_f & np.asarray(kv)
            for ti, t in enumerate(self.target):
                mean = self.means.get(t, 0.0)
                s_all = np.where(found_all, overall.stats[f"{t}.sum"][idx_all], 0.0)
                c_all = np.where(found_all, overall.stats[f"{t}.count"][idx_all], 0.0)
                if folds is not None:
                    s_f = np.where(found_f, fkeyed.stats[f"{t}.sum"][idx_f], 0.0)
                    c_f = np.where(found_f, fkeyed.stats[f"{t}.count"][idx_f], 0.0)
                    s_oof, c_oof = s_all - s_f, c_all - c_f
                else:
                    s_oof, c_oof = s_all, c_all
                denom = c_oof + self.p_smooth
                # no OOF observations and no smoothing → fall back to the
                # global target mean instead of 0/0
                te = np.where(
                    denom > 0, (s_oof + self.p_smooth * mean) / np.maximum(denom, 1e-12), mean
                )
                out[self._te_name(gi, group, ti, t)] = Column(te.astype(dtype))
        if folds is not None and not self.drop_folds:
            out[self.fold_name] = Column(folds.astype(np.int32))
        return out

    @property
    def output_dtype(self):
        return md.normalize(self.out_dtype) if self.out_dtype else md.float32

    def _compute_dtype(self, col_schema, input_schema):
        if col_schema.name == self.fold_name:
            return col_schema.with_dtype(md.int32)
        return super()._compute_dtype(col_schema, input_schema)

    def _compute_shape(self, col_schema, input_schema):
        return col_schema.with_shape(md.Shape.scalar())

    @property
    def output_tags(self):
        from ..tags import Tags

        # continuous output; the base _compute_tags drops the inherited
        # CATEGORICAL side of the conflict pair automatically
        return [Tags.CONTINUOUS]

    # --- persistence -----------------------------------------------------
    def serialize_params(self):
        return {
            "target": self.target,
            "target_mean": self.target_mean,
            "kfold": self.kfold,
            "fold_seed": self.fold_seed,
            "p_smooth": self.p_smooth,
            "out_col": self.out_col,
            "out_dtype": md.normalize(self.out_dtype).name if self.out_dtype else None,
            "out_path": self.out_path,
            "name_sep": self.name_sep,
            "drop_folds": self.drop_folds,
        }

    def serialize_state(self):
        if not self.fitted:
            return None
        return {
            "means": self.means,
            "categories": self.categories,
            "key_cols": {tag: self.fold_stats[tag].key_cols for tag in self.fold_stats},
        }

    def deserialize_state(self, state):
        import pyarrow.parquet as pq

        self.means = dict(state["means"])
        self.categories = dict(state["categories"])
        for tag, path in self.categories.items():
            tbl = pq.read_table(path)
            keyed = KeyedStats.from_arrow(tbl, state["key_cols"][tag])
            self.fold_stats[tag] = keyed
            self.overall_stats[tag] = (
                _sum_over_folds(keyed, self.fold_name) if self.kfold > 1 else keyed
            )
        self.fitted = True


def _sum_over_folds(keyed: KeyedStats, fold_name: str) -> KeyedStats:
    """Aggregate (fold, group) stats to per-group totals."""
    import pyarrow as pa

    tbl = keyed.to_arrow()
    group_cols = [k for k in keyed.key_cols if k != fold_name]
    stat_cols = [n for n in tbl.column_names if n not in keyed.key_cols]
    agg = tbl.group_by(group_cols).aggregate([(c, "sum") for c in stat_cols])
    agg = agg.rename_columns(group_cols + stat_cols)
    # reorder columns: keys first
    agg = agg.select(group_cols + stat_cols)
    return KeyedStats.from_arrow(agg, group_cols)
