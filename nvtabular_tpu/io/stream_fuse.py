"""Fused transform→write stream spec extraction.

Maps a fitted Workflow's DAG onto per-output-column C++ ops (cat hash
probe / fused continuous pipe / passthrough) that the native parquet file
workers apply BETWEEN the shuffle gather and the page encode
(cpp/nvt_parquet.cc::nvtpq_write_column_op). This is the execution shape of
the reference's lazy ``to_parquet``: dask materializes the workflow
transform inside each write task (reference nvtabular/workflow/
workflow.py:239-248), so the transformed table never exists as a whole —
here likewise the raw batch flows to the file workers and each worker
gathers + transforms + encodes only its own shard, in one GIL-free native
call per column, with no intermediate transformed batch and no thread-pool
contention between a producer and the writers.

Supported graph shapes (anything else returns None → the writer falls back
to the two-phase stream, which handles every op):
  * ``ConcatColumns`` root over branches of:
  * ``Categorify`` fed directly by a column selection — single-column
    encode (or joint groups), native int hash table available (int keys,
    ``num_buckets == 1``), int32 output codes;
  * a fusable continuous chain (host_fuse.extract_chain) fed directly by a
    column selection — FillMissing/FillMedian/Clip/LogOp/Normalize/
    NormalizeMinMax in kernel stage order; also single fusable ops, except
    a lone LogOp (the unfused host path computes numpy log1p, whose
    rounding differs ≤3 ULP from the kernel — a chain of ≥2 ops already
    runs the kernel on the host path, so fused == two-phase stays
    bit-identical);
  * bare column selections (passthrough).

The fused output is bit-identical to the two-phase host path: the SAME
serving kernels (nvt_cat_encode_* / nvt_cont_pipe_*) run over the same
values, only the pass structure changes.
"""

from __future__ import annotations

import ctypes
import logging
from typing import Dict, List, Optional

import numpy as np

from .native_parquet import NvtpqOp

LOG = logging.getLogger("nvtabular_tpu")

_SUPPORTED_NP = {np.dtype(t) for t in (np.int32, np.int64, np.float32, np.float64)}
_IN_CODE = {
    np.dtype(np.int32): 0,
    np.dtype(np.int64): 1,
    np.dtype(np.float32): 2,
    np.dtype(np.float64): 3,
}


class FusedColumn:
    """One output column of the fused stream."""

    __slots__ = ("name", "source", "in_dtype", "out_dtype", "kind", "cat", "cont")

    def __init__(self, name, source, in_dtype, out_dtype, kind, cat=None, cont=None):
        self.name = name
        self.source = source          # raw input column name
        self.in_dtype = np.dtype(in_dtype)
        self.out_dtype = np.dtype(out_dtype)
        self.kind = kind              # "none" | "cat" | "cont"
        self.cat = cat                # (vocab, table) — keepalive + params
        self.cont = cont              # merged kernel params dict


class FusedStreamSpec:
    """Per-output-column fused ops, in the workflow's output order."""

    def __init__(self, columns: List[FusedColumn]):
        self.columns = columns
        self._ops = None

    @property
    def source_names(self) -> List[str]:
        seen, out = set(), []
        for c in self.columns:
            if c.source not in seen:
                seen.add(c.source)
                out.append(c.source)
        return out

    def schema(self):
        return [(c.name, c.out_dtype) for c in self.columns]

    def make_ops(self) -> List[Optional[NvtpqOp]]:
        """ctypes op structs (cached — the writer reuses them per window)."""
        if self._ops is not None:
            return self._ops
        from ..serving import native as serving

        lib = serving._build_and_load()
        addr = {
            0: ctypes.cast(lib.nvt_cat_encode_i32, ctypes.c_void_p).value,
            1: ctypes.cast(lib.nvt_cat_encode_i64, ctypes.c_void_p).value,
            2: ctypes.cast(lib.nvt_cont_pipe_f32, ctypes.c_void_p).value,
            3: ctypes.cast(lib.nvt_cont_pipe_f64, ctypes.c_void_p).value,
        }
        ops: List[Optional[NvtpqOp]] = []
        for c in self.columns:
            if c.kind == "none":
                ops.append(None)
            elif c.kind == "cat":
                from ..ops.categorify import NULL_INDEX, OOV_OFFSET

                vocab, table = c.cat
                in_code = _IN_CODE[c.in_dtype]
                ops.append(
                    NvtpqOp(
                        kind=1,
                        in_dtype=in_code,
                        fn=addr[in_code],
                        table=table.handle,
                        null_index=NULL_INDEX,
                        oov_index=OOV_OFFSET,
                        offset=int(vocab.offset),
                    )
                )
            else:  # cont
                p = c.cont
                in_code = _IN_CODE[c.in_dtype]
                ops.append(
                    NvtpqOp(
                        kind=2,
                        in_dtype=in_code,
                        fn=addr[in_code],
                        has_fill=int("fill" in p),
                        fill=float(p.get("fill", 0.0)),
                        has_lo=int("lo" in p),
                        lo=float(p.get("lo", 0.0)),
                        has_hi=int("hi" in p),
                        hi=float(p.get("hi", 0.0)),
                        do_log=int(bool(p.get("log1p"))),
                        has_norm=int("sub" in p),
                        sub=float(p.get("sub", 0.0)),
                        div=float(p.get("div", 1.0)),
                    )
                )
        self._ops = ops
        return ops


def _leaf_selection(node) -> bool:
    from ..dag.ops import SelectionOp

    return (
        isinstance(node.op, SelectionOp)
        and not node.parents
        and not node.dependencies
    )


def _schema_np_dtype(schema, name) -> Optional[np.dtype]:
    col = schema.get(name) if schema is not None else None
    if col is None:
        return None
    dt = getattr(col, "dtype", None)
    npdt = dt.to_numpy() if dt is not None else None
    return np.dtype(npdt) if npdt is not None else None


def _branch_columns(node) -> Optional[Dict[str, FusedColumn]]:
    """FusedColumns contributed by one branch, or None if unsupported."""
    from ..dag.host_fuse import _STAGE_LOG, _op_stage, extract_chain
    from ..dag.ops import SelectionOp
    from ..ops.categorify import Categorify

    out: Dict[str, FusedColumn] = {}
    if _leaf_selection(node):
        for name in node.selector.names:
            dt = _schema_np_dtype(node.output_schema, name)
            if dt is None or dt not in _SUPPORTED_NP:
                return None
            out[name] = FusedColumn(name, name, dt, dt, "none")
        return out

    if isinstance(node.op, Categorify):
        op = node.op
        if node.dependencies or len(node.parents) != 1:
            return None
        parent = node.parents[0]
        if not _leaf_selection(parent):
            return None
        if np.dtype(op._out_dtype_np()) != np.dtype(np.int32):
            return None
        try:
            if op._memory_limit_bytes() is not None:
                # the spec would pin EVERY column's native table resident
                # for the whole write, defeating the cardinality LRU budget
                # — the two-phase stream spills/reloads per column instead
                return None
        except Exception:
            return None
        for key, members in op._groups(node.selector):
            if len(members) > 1 and op.encode_type == "combo":
                return None  # combo fuses member columns into one — host path
            for mcol in members:
                src_dt = _schema_np_dtype(parent.output_schema, mcol)
                if src_dt is None or src_dt.kind not in "iu" or src_dt not in _SUPPORTED_NP:
                    return None
                vkey = op._vocab_key(key, members, mcol)
                try:
                    vocab = op._resident_vocab(vkey)
                except Exception:
                    return None
                table = vocab.native_table()
                if table is None or getattr(table, "is_str", False):
                    return None
                out[mcol] = FusedColumn(
                    mcol, mcol, src_dt, np.int32, "cat", cat=(vocab, table)
                )
        return out

    # continuous chain (>=2 fusable ops), or a single fusable non-log op
    chain = extract_chain(node)
    merged = None
    if chain is not None:
        head, names, merged = chain.head_parent, chain.names, chain.params
        casts_f32 = chain.casts_f32
    else:
        if node.dependencies or len(node.parents) != 1 or node.selector is None:
            return None
        names = list(node.selector.names)
        staged = _op_stage(node.op, names) if names else None
        if staged is None or staged[0] == _STAGE_LOG:
            # a lone LogOp on the host path runs numpy log1p (≤3 ULP from
            # the kernel) — keep fused == two-phase bit-identical
            return None
        head, merged = node.parents[0], staged[1]
        casts_f32 = False
    if not _leaf_selection(head):
        return None
    for name in names:
        src_dt = _schema_np_dtype(head.output_schema, name)
        if src_dt == np.dtype(np.float32):
            pipe_dt = np.dtype(np.float32)
        elif src_dt == np.dtype(np.float64) and not casts_f32:
            pipe_dt = np.dtype(np.float64)
        else:
            return None
        out_dt = _schema_np_dtype(node.output_schema, name)
        if out_dt != pipe_dt:
            return None
        out[name] = FusedColumn(name, name, src_dt, pipe_dt, "cont", cont=merged[name])
    return out


def extract_stream_spec(workflow) -> Optional[FusedStreamSpec]:
    """Build the fused stream spec for a fitted workflow, or None when any
    output column falls outside the supported shapes (caller then uses the
    two-phase transform→write stream)."""
    try:
        from ..dag.ops import ConcatColumns

        node = workflow.graph.output_node
        if node is None or node.output_schema is None:
            return None
        order = [c.name for c in node.output_schema]
        branches = node.parents if isinstance(node.op, ConcatColumns) else [node]
        if isinstance(node.op, ConcatColumns) and node.dependencies:
            branches = list(branches) + list(node.dependencies)
        cols: Dict[str, FusedColumn] = {}
        for br in branches:
            got = _branch_columns(br)
            if got is None:
                return None
            cols.update(got)
        out_dtypes = workflow.output_dtypes or {}
        ordered = []
        for name in order:
            fc = cols.get(name)
            if fc is None:
                return None
            want = out_dtypes.get(name)
            want_np = want.to_numpy() if want is not None else None
            if want_np is not None and np.dtype(want_np) != fc.out_dtype:
                return None
            ordered.append(fc)
        spec = FusedStreamSpec(ordered)
        spec.make_ops()  # fail fast if the native libs are unavailable
        return spec
    except Exception as e:  # never break a write over spec extraction
        LOG.debug("fused stream spec unavailable: %s", e)
        return None
