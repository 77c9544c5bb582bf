"""DataStats (reference nvtabular/ops/data_stats.py:49-113): per-column
min/max/mean/std/cardinality/%nan, feeding the dataset inspector and the
synthetic data generator."""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..dispatch import hash_array
from ..selector import ColumnSelector
from ..table import TableBatch
from .stat_operator import StatOperator
from .moments import ColumnMoments


class _ColState:
    def __init__(self):
        self.moments = ColumnMoments()
        self.hashes: set = set()  # distinct uint32 hashes ≈ cardinality
        self.str_len_sum = 0.0
        self.str_len_min = np.inf
        self.str_len_max = -np.inf
        self.list_len_sum = 0.0
        self.list_count = 0.0


class DataStats(StatOperator):
    jit_safe = True

    def __init__(self):
        super().__init__()
        self.output: Dict[str, Dict] = {}

    def fit_init(self, col_selector, input_schema):
        self._schema = input_schema
        return {name: _ColState() for name in col_selector.names}

    def fit_batch(self, col_selector, batch, state):
        for name in col_selector.names:
            col = batch[name].to_host()
            st = state[name]
            vals = np.asarray(col.values)
            if col.is_list:
                lengths = np.asarray(col.row_lengths)
                st.list_len_sum += float(lengths.sum())
                st.list_count += len(lengths)
            if vals.dtype.kind == "O":
                nulls = np.asarray(col.is_null())
                strs = vals[~nulls] if not col.is_list else vals
                if len(strs):
                    lens = np.array([len(str(s)) for s in strs])
                    st.str_len_sum += float(lens.sum())
                    st.str_len_min = min(st.str_len_min, float(lens.min()))
                    st.str_len_max = max(st.str_len_max, float(lens.max()))
                st.moments.null_count += float(nulls.sum())
                st.moments.total_rows += len(col)
                st.moments.count += len(strs)
            else:
                st.moments.update_batch(col)
            st.hashes.update(np.unique(hash_array(vals)).tolist())
        return state

    def fit_merge(self, states):
        out = states[0]
        for s in states[1:]:
            for name in out:
                out[name].moments = out[name].moments.merge(s[name].moments)
                out[name].hashes |= s[name].hashes
                out[name].str_len_sum += s[name].str_len_sum
                out[name].str_len_min = min(out[name].str_len_min, s[name].str_len_min)
                out[name].str_len_max = max(out[name].str_len_max, s[name].str_len_max)
                out[name].list_len_sum += s[name].list_len_sum
                out[name].list_count += s[name].list_count
        return out

    def fit_finalize(self, state):
        for name, st in state.items():
            cs = self._schema.get(name)
            is_string = cs is not None and cs.dtype.is_string
            mom = st.moments
            entry = {
                "dtype": cs.dtype.name if cs else "unknown",
                "cardinality": len(st.hashes),
                "per_nan": 100.0 * mom.null_count / mom.total_rows if mom.total_rows else 0.0,
            }
            if is_string:
                n = max(mom.count, 1)
                entry.update(
                    {
                        "min_entry_size": st.str_len_min if st.str_len_min is not np.inf else 0,
                        "max_entry_size": st.str_len_max if st.str_len_max is not -np.inf else 0,
                        "avg_entry_size": st.str_len_sum / n,
                    }
                )
            else:
                entry.update(
                    {
                        "min": mom.min if mom.count else 0.0,
                        "max": mom.max if mom.count else 0.0,
                        "mean": mom.mean,
                        "std": mom.std,
                    }
                )
            if st.list_count:
                entry["multi_min"] = entry["multi_max"] = None
                entry["multi_avg"] = st.list_len_sum / st.list_count
            self.output[name] = entry

    def clear(self):
        super().clear()
        self.output = {}

    def transform(self, col_selector: ColumnSelector, batch: TableBatch) -> TableBatch:
        return batch.select([n for n in col_selector.names if n in batch])

    def serialize_state(self):
        if not self.fitted:
            return None
        return {"output": self.output}

    def deserialize_state(self, state):
        self.output = dict(state["output"])
        self.fitted = True
