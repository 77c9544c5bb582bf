"""Executors: eager host path, jit-fused device path, streaming fit engine.

Replaces the reference's merlin.dag executors (``LocalExecutor`` eager path,
``DaskExecutor`` distributed path — call sites at reference
nvtabular/workflow/workflow.py:31,74,209,242-254).

TPU-first design
----------------
* ``LocalExecutor`` — eager numpy evaluation of the DAG per batch. Used for
  tests, string-heavy graphs, and the serving path.
* ``JitExecutor`` — when every op in the graph is jit-safe for its input
  dtypes, the WHOLE per-batch DAG walk is traced once and compiled by XLA
  into a single fused TPU program (keyed by batch shape signature). This
  replaces the reference's per-op per-partition dask task maps with one
  HBM-resident fused kernel chain — the design win over a CUDA/dask port.
  Mixed graphs run HYBRID: the jittable prefix fuses into one device
  program, host-only ops consume its results eagerly. Streaming adds a
  prepare pipeline (host work for batch i+1 overlaps device execution of
  batch i) and optional HETEROGENEOUS mode (a fraction of batches runs on
  the host C++ path concurrently — both engines busy, ~1.6x combined).
* ``FitEngine`` — phased statistics pass: ONE scan of the dataset feeds every
  StatOperator of a phase through streaming accumulators
  (fit_init/fit_batch/fit_merge/fit_finalize), with chained stat ops split
  into later phases exactly like the reference's phased dask fit
  (SURVEY.md §3.1).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..schema import Schema
from ..table import Column, TableBatch, concat_columns
from .base_operator import BaseOperator, StatOperator
from .device_state import device_state_scope, row_offset_scope
from .graph import Graph, postorder_iter_nodes
from .node import Node
from .ops import ConcatColumns, SelectionOp

LOG = logging.getLogger("nvtabular_tpu")


class LocalExecutor:
    """Eager single-batch DAG evaluation (host numpy path)."""

    def transform(self, batch: TableBatch, output_node, output_dtypes=None, capture_dtypes=False):
        nodes = output_node if isinstance(output_node, list) else [output_node]
        if len(nodes) > 1:
            root = Node(op=ConcatColumns())
            for n in nodes:
                root.add_parent(n)
        else:
            root = nodes[0]
        out = self.transform_batch(batch, root, capture_dtypes=capture_dtypes)
        if output_dtypes:
            out = _enforce_dtypes(out, output_dtypes)
        return out

    def transform_batch(self, batch: TableBatch, output_node: Node, capture_dtypes=False) -> TableBatch:
        memo: Dict[int, TableBatch] = {}
        return self._eval(output_node, batch, memo, capture_dtypes)

    def _eval(self, node: Node, root_batch: TableBatch, memo: Dict[int, TableBatch], capture_dtypes=False) -> TableBatch:
        if id(node) in memo:
            return memo[id(node)]

        if isinstance(node.op, ConcatColumns):
            inputs = [
                self._eval(p, root_batch, memo, capture_dtypes)
                for p in node.parents_with_dependencies
            ]
            out = concat_columns(inputs)
        elif not node.parents_with_dependencies:
            out = node.op.transform(node.selector, root_batch)
        else:
            parent_outs = [self._eval(p, root_batch, memo, capture_dtypes) for p in node.parents]
            dep_outs = [self._eval(d, root_batch, memo, capture_dtypes) for d in node.dependencies]
            input_batch = concat_columns(parent_outs + dep_outs)
            out = node.op.transform(node.selector, input_batch)

        if capture_dtypes and node.output_schema is not None:
            _capture_dtypes(node, out)
        elif node.output_schema is not None:
            out = _conform_to_schema(out, node.output_schema, node)
        if out.num_rows == root_batch.num_rows:
            out.row_offset = root_batch.row_offset
        memo[id(node)] = out
        return out

    def compute_node_input(self, node: Node, root_batch: TableBatch, memo: Dict[int, TableBatch]) -> TableBatch:
        """Evaluate everything upstream of `node` and return its input batch."""
        if not node.parents_with_dependencies:
            return root_batch
        parent_outs = [self._eval(p, root_batch, memo) for p in node.parents]
        dep_outs = [self._eval(d, root_batch, memo) for d in node.dependencies]
        return concat_columns(parent_outs + dep_outs)


class JitExecutor(LocalExecutor):
    """Device executor: fuses the whole DAG walk into one jitted XLA program
    when possible; falls back to hybrid eager execution otherwise.

    Static-shape discipline: batches are padded up to power-of-two row
    bucket sizes before entering jit, so XLA compiles once per bucket instead
    of once per partition shape; padding rows are sliced off after. Batches
    below `jit_min_rows` run on the host path, where compile cost would
    dominate (tiny eager/serving batches)."""

    def __init__(
        self,
        jit_min_rows: int = 16384,
        bucket: bool = True,
        mesh=None,
        data_axis: str = "data",
    ):
        self._jit_cache: Dict[Any, Any] = {}
        self._device_state_cache: Dict[int, Any] = {}
        self.jit_min_rows = jit_min_rows
        self.bucket = bucket
        # Data-parallel multi-chip transform (SURVEY §2.8 P1, reference
        # MultiGPUBench.md): rows of each batch shard over `mesh`'s
        # `data_axis`, fitted state replicates, and XLA GSPMD compiles the
        # SAME fused program SPMD — lookups are row-local gathers from
        # replicated tables, so no collectives are needed on the hot path.
        self.mesh = mesh
        self.data_axis = data_axis

    def _row_shardings(self, stacked: Dict[str, Any]):
        """Per-array NamedShardings placing the ROW axis over the mesh, or
        None when the batch can't shard evenly (ragged offsets arrays, or
        rows not divisible by the mesh). Stacked 2D arrays are [cols, rows]
        (rows last); singletons are [rows]."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = int(self.mesh.shape[self.data_axis])
        for v in stacked.values():
            if v.ndim == 0:
                continue  # scalars (row offset lanes) replicate
            rows = v.shape[-1]
            if rows % ndev != 0:
                return None
        return {
            k: NamedSharding(
                self.mesh,
                P()
                if v.ndim == 0
                else (P(self.data_axis) if v.ndim == 1 else P(None, self.data_axis)),
            )
            for k, v in stacked.items()
        }

    def _put_batch(self, stacked: Dict[str, Any]):
        """device_put of the packed batch — row-sharded over the mesh when
        one is configured, single-device otherwise."""
        import jax

        shardings = self._row_shardings(stacked)
        if shardings is None:
            return jax.device_put(stacked)
        return {k: jax.device_put(v, shardings[k]) for k, v in stacked.items()}

    def _put_state(self, state: Dict[str, Any]):
        """Fitted state (lookup tables) replicates across the mesh."""
        import jax

        if self.mesh is None:
            return jax.device_put(state)
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(state, NamedSharding(self.mesh, P()))

    def _get_or_put_device_state(self, group, host_state, make):
        """One cached device copy of fitted state PER GROUP (a graph's
        full-jit path or a frontier set): refits replace their own group's
        entry immediately (no stale multi-GB HBM generations), while
        different paths/graphs never evict each other.

        Freshness is per-key host-array IDENTITY, with the cache entry
        holding strong references to those arrays — so a refit that frees
        the old numpy arrays can never recycle an id into a false match
        (a bare id()-tuple token could)."""
        entry = self._device_state_cache.get(group)
        if entry is not None:
            cached_host = entry[0]
            if cached_host.keys() == host_state.keys() and all(
                cached_host[k] is host_state[k] for k in host_state
            ):
                return entry[1]
        dev_state = make()
        self._device_state_cache[group] = (dict(host_state), dev_state)
        return dev_state

    def _collect_device_state(self, output_node: Node) -> Dict[str, Any]:
        state: Dict[str, Any] = {}
        for node in postorder_iter_nodes(output_node):
            state.update(node.op.device_state())
        return state

    def transform_batch(self, batch: TableBatch, output_node: Node, capture_dtypes=False) -> TableBatch:
        if capture_dtypes or batch.num_rows < self.jit_min_rows:
            return super().transform_batch(batch, output_node, capture_dtypes)
        if self.graph_is_jittable(output_node, batch):
            return self._jit_transform(batch, output_node)
        # HYBRID: fuse the jittable PREFIX of the DAG (every node whose
        # whole upstream is jit-safe) into one device program, then run the
        # remaining host-only ops eagerly with the fused results memoized.
        frontier = self._jittable_frontier(output_node, batch)
        if frontier:
            memo = self._jit_frontier(batch, frontier)
            return self._eval(output_node, batch, memo)
        return super().transform_batch(batch, output_node, capture_dtypes)

    def graph_is_jittable(self, output_node: Node, batch: TableBatch) -> bool:
        for node in postorder_iter_nodes(output_node):
            schema = node.input_schema
            if not _node_jit_safe(node.op, node.selector, schema):
                return False
        return _batch_device_safe(batch)

    def _jittable_frontier(self, output_node: Node, batch: TableBatch) -> List[Node]:
        """Maximal nodes whose ENTIRE upstream closure is jit-safe and whose
        root inputs are numeric — the device islands of a mixed graph."""
        prefix_ok: Dict[int, bool] = {}
        for node in postorder_iter_nodes(output_node):  # topo order
            ok = _node_jit_safe(node.op, node.selector, node.input_schema)
            if ok and not node.parents_with_dependencies:
                # leaf: its selected root columns must be device-able
                for name in node.selector.names if node.selector else []:
                    col = batch.columns.get(name)
                    if col is None or not _col_device_safe(col):
                        ok = False
                        break
            ok = ok and all(
                prefix_ok.get(id(p), False) for p in node.parents_with_dependencies
            )
            prefix_ok[id(node)] = ok
        # frontier = jittable nodes with at least one non-jittable consumer
        # (or the output itself); keep only those worth compiling (non-leaf)
        consumers: Dict[int, List[Node]] = {}
        for node in postorder_iter_nodes(output_node):
            for p in node.parents_with_dependencies:
                consumers.setdefault(id(p), []).append(node)
        frontier = []
        for node in postorder_iter_nodes(output_node):
            if not prefix_ok.get(id(node)):
                continue
            cons = consumers.get(id(node), [])
            is_frontier = (not cons) or any(not prefix_ok.get(id(c)) for c in cons)
            if is_frontier and node.parents_with_dependencies:
                frontier.append(node)
        return frontier

    def _jit_frontier(self, batch: TableBatch, frontier: List[Node]) -> Dict[int, TableBatch]:
        """Compile+run ONE fused program producing every frontier node's
        output; returns a host-side memo for the eager remainder."""
        import jax

        # columns consumed by the frontier closure
        needed = set()
        for node in frontier:
            for up in _upstream_closure(node):
                if not up.parents_with_dependencies and up.selector is not None:
                    needed.update(up.selector.names)
        sub = batch.select([c for c in batch.column_names if c in needed])
        layout, stacked, n_rows, row_offset, meta = self._prepare(sub, None)
        device_arrays = self._put_batch(stacked)
        state: Dict[str, Any] = {}
        for node in frontier:
            for up in _upstream_closure(node):
                state.update(up.op.device_state())
        keys = tuple(sorted(id(n) for n in frontier))
        signature = (
            ("frontier",) + keys,
            tuple(_fit_generations(n) for n in frontier),
            layout,
            tuple(sorted((k, str(v.dtype), v.shape) for k, v in stacked.items())),
            tuple(sorted((k, str(v.dtype), v.shape) for k, v in state.items())),
        )
        fn = self._jit_cache.get(signature)
        if fn is None:
            frontier_nodes = list(frontier)

            def run(stacked_dict, state_dict):
                array_dict = _unstack_arrays(stacked_dict, layout)
                b = TableBatch.from_dict_of_arrays(array_dict)
                b.row_offset = 0  # absolute offsets ride as traced lanes below
                lanes = (
                    stacked_dict["__row_offset_lo__"],
                    stacked_dict["__row_offset_hi__"],
                )
                with device_state_scope(state_dict), row_offset_scope(lanes):
                    inner_memo: Dict[int, TableBatch] = {}
                    ex = LocalExecutor()
                    outs = {}
                    for i, node in enumerate(frontier_nodes):
                        out = ex._eval(node, b, inner_memo)
                        outs[str(i)] = out.to_dict_of_arrays()
                    return outs

            fn = jax.jit(run)
            self._jit_cache[signature] = fn
        dev_state = self._get_or_put_device_state(
            ("frontier",) + keys, state, lambda: self._put_state(state)
        )
        outs = fn(device_arrays, dev_state)
        memo: Dict[int, TableBatch] = {}
        for i, node in enumerate(frontier):
            out = TableBatch.from_dict_of_arrays(outs[str(i)])
            if node.output_schema is not None:  # jax sorted the dict keys
                out = out.select(
                    [c.name for c in node.output_schema if c.name in out]
                )
            out.row_offset = batch.row_offset
            if meta is not None and out.num_rows != n_rows:
                out = _unpad_batch(out, n_rows)
            memo[id(node)] = out.to_host()  # downstream ops are host ops
        return memo

    def _jit_transform(self, batch: TableBatch, output_node: Node) -> TableBatch:
        if self.mesh is not None and any(
            c.is_list for c in batch.columns.values()
        ):
            return self._shardmap_transform(batch, output_node)
        prepared = self._prepare(batch, output_node)
        return self._dispatch(prepared, output_node)

    # ------------------------------------------------------------------
    # mesh path for RAGGED batches: shard_map over per-shard-rebased lists
    # ------------------------------------------------------------------
    def _prepare_sharded(self, batch: TableBatch, ndev: int):
        """Host-side restructure of a (possibly ragged) batch into
        per-device blocks: rows pad to a power-of-two bucket and split into
        ``ndev`` contiguous ranges; each list column's values slice is
        rebased to SHARD-LOCAL offsets and padded to one common bucket, so
        every device holds a self-contained (values, offsets) pair. The
        device axis leads every array and shards over the mesh — inside
        ``shard_map`` each device sees exactly the 1D arrays the
        single-device program expects (the reference instead partitions
        list columns through dask, nvtabular/ops/list_slice.py:180-228;
        here the split is explicit so no collective ever touches the
        ragged data)."""
        n_rows = batch.num_rows
        host = batch.to_host()
        r_total = max(_next_bucket(n_rows), ndev)
        if r_total % ndev != 0:  # non-pow2 mesh: caller falls back
            return None
        r_local = r_total // ndev
        flat2d: Dict[str, Any] = {}
        for name, col in host.columns.items():
            if col.is_list:
                offs = np.asarray(col.offsets, dtype=np.int64)
                if len(offs) < r_total + 1:
                    offs = np.concatenate(
                        [offs, np.full(r_total + 1 - len(offs), offs[-1], offs.dtype)]
                    )
                starts = offs[:: r_local][: ndev + 1]  # shard boundaries
                max_len = int((starts[1:] - starts[:-1]).max()) if ndev else 0
                bucket = _next_bucket(max(max_len, 1))
                vals2d = np.zeros((ndev, bucket), dtype=col.values.dtype)
                offs2d = np.empty((ndev, r_local + 1), dtype=np.int32)
                for d in range(ndev):
                    lo, hi = int(starts[d]), int(starts[d + 1])
                    vals2d[d, : hi - lo] = col.values[lo:hi]
                    offs2d[d] = offs[d * r_local : (d + 1) * r_local + 1] - lo
                flat2d[f"{name}__values"] = vals2d
                flat2d[f"{name}__offsets"] = offs2d
            else:
                vals = col.values
                if r_total > len(vals):
                    vals = np.concatenate(
                        [vals, np.zeros(r_total - len(vals), dtype=vals.dtype)]
                    )
                flat2d[name] = vals.reshape(ndev, r_local)
            if col.validity is not None:
                valid = col.validity
                if r_total > len(valid):
                    valid = np.concatenate(
                        [valid, np.ones(r_total - len(valid), dtype=bool)]
                    )
                flat2d[f"{name}__validity"] = valid.reshape(ndev, r_local)
        # pack same-(dtype, shape) blocks: [ndev, k, X] stacks
        groups: Dict[Any, List[str]] = {}
        for key, arr in flat2d.items():
            groups.setdefault((str(arr.dtype), arr.shape[1:]), []).append(key)
        stacked: Dict[str, Any] = {}
        layout_items = []
        for (_, _), keys in groups.items():
            if len(keys) == 1:
                stacked[keys[0]] = flat2d[keys[0]]
                layout_items.append((keys[0], (keys[0],)))
            else:
                stack_key = f"__stack_{len(layout_items)}"
                stacked[stack_key] = np.stack([flat2d[k] for k in keys], axis=1)
                layout_items.append((stack_key, tuple(keys)))
        off = int(batch.row_offset or 0)
        shard_offs = off + np.arange(ndev, dtype=np.uint64) * np.uint64(r_local)
        stacked["__row_offset_lo__"] = (shard_offs & np.uint64(0xFFFFFFFF)).astype(
            np.uint32
        )
        stacked["__row_offset_hi__"] = (shard_offs >> np.uint64(32)).astype(np.uint32)
        return tuple(layout_items), stacked, n_rows, batch.row_offset, r_local

    def _shardmap_transform(self, batch: TableBatch, output_node: Node) -> TableBatch:
        """Mesh transform of a ragged batch: one jitted ``shard_map`` runs
        the SAME single-device DAG body on each device's local block —
        fitted state replicates, rows (and each list column's values+offsets)
        shard on the leading device axis, and the per-shard absolute row
        offsets ride as sharded uint32 lanes so row-identity ops (k-fold
        TE) stay correct per shard."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        ndev = int(self.mesh.shape[self.data_axis])
        prepared = self._prepare_sharded(batch, ndev)
        if prepared is None:
            LOG.warning(
                "mesh shard_map path needs a power-of-two device count; "
                "running batch on a single device"
            )
            return self._dispatch(self._prepare(batch, output_node), output_node)
        layout, stacked, n_rows, row_offset, r_local = prepared
        state = self._collect_device_state(output_node)
        signature = (
            ("shardmap", ndev, id(output_node)),
            _fit_generations(output_node),
            layout,
            tuple(sorted((k, str(v.dtype), v.shape) for k, v in stacked.items())),
            tuple(sorted((k, str(v.dtype), v.shape) for k, v in state.items())),
        )
        fn = self._jit_cache.get(signature)
        if fn is None:
            mesh, axis = self.mesh, self.data_axis

            def run_local(stacked_dict, state_dict):
                local = {
                    k: v[0] if k.startswith("__row_offset_") else jnp.squeeze(v, 0)
                    for k, v in stacked_dict.items()
                }
                lanes = (local.pop("__row_offset_lo__"), local.pop("__row_offset_hi__"))
                array_dict = _unstack_arrays(local, layout)
                b = TableBatch.from_dict_of_arrays(array_dict)
                b.row_offset = 0
                with device_state_scope(state_dict), row_offset_scope(lanes):
                    out = LocalExecutor().transform_batch(b, output_node)
                return {k: v[None] for k, v in out.to_dict_of_arrays().items()}

            sm_kwargs = dict(
                mesh=mesh,
                in_specs=(
                    {k: P(axis) for k in stacked},
                    {k: P() for k in state},
                ),
                out_specs=P(axis),
            )
            try:  # jax>=0.8 renamed check_rep -> check_vma
                wrapped = shard_map(run_local, check_vma=False, **sm_kwargs)
            except TypeError:  # pragma: no cover - older jax
                wrapped = shard_map(run_local, check_rep=False, **sm_kwargs)
            fn = jax.jit(wrapped)
            self._jit_cache[signature] = fn
        device_arrays = {
            k: jax.device_put(v, NamedSharding(self.mesh, P(self.data_axis)))
            for k, v in stacked.items()
        }
        dev_state = self._get_or_put_device_state(
            id(output_node), state, lambda: self._put_state(state)
        )
        out_arrays = fn(device_arrays, dev_state)
        return self._reassemble_sharded(
            out_arrays, output_node, n_rows, row_offset, r_local
        )

    def _reassemble_sharded(
        self, out_arrays, output_node: Node, n_rows: int, row_offset, r_local: int
    ) -> TableBatch:
        """Global batch from per-shard blocks. Scalar columns are exact
        reshapes (shard-major order IS row order). List columns compact on
        the host: the per-shard padded values blocks concatenate with their
        offsets rebased back to one contiguous values array (a pod
        deployment would keep the per-shard layout and feed the loader
        shard-locally instead)."""
        names = []
        for key in out_arrays:
            if key.endswith("__values"):
                names.append(key[: -len("__values")])
            elif not key.endswith("__offsets") and not key.endswith("__validity"):
                names.append(key)
        out = TableBatch()
        for name in names:
            valid2d = out_arrays.get(f"{name}__validity")
            validity = (
                np.asarray(valid2d).reshape(-1)[:n_rows] if valid2d is not None else None
            )
            if f"{name}__values" in out_arrays:
                vals2d = np.asarray(out_arrays[f"{name}__values"])
                offs2d = np.asarray(out_arrays[f"{name}__offsets"])
                ndev = vals2d.shape[0]
                pieces = []
                glob = np.zeros(n_rows + 1, dtype=np.int64)
                base = 0
                row = 0
                for d in range(ndev):
                    take = min(r_local, n_rows - row)
                    if take <= 0:
                        break
                    # only the values span covered by this shard's valid rows
                    end = int(offs2d[d, take])
                    pieces.append(vals2d[d, :end])
                    glob[row : row + take + 1] = offs2d[d, : take + 1].astype(np.int64) + base
                    base += end
                    row += take
                values = (
                    np.concatenate(pieces) if pieces else np.zeros(0, vals2d.dtype)
                )
                out[name] = Column(values, glob.astype(np.int32), validity)
            else:
                arr = out_arrays[name]
                out[name] = Column(np.asarray(arr).reshape(-1)[:n_rows], None, validity)
        if output_node.output_schema is not None:
            out = out.select(
                [c.name for c in output_node.output_schema if c.name in out]
            )
        out.row_offset = row_offset
        return out

    def transform_batches(self, batches, output_node: Node, hetero: Optional[float] = None):
        """Pipelined streaming transform: the HOST work (pad + column
        stacking) for batch i+1 overlaps the (async) device execution of
        batch i — the read/compute overlap the reference gets from the dask
        scheduler (SURVEY §2.8 P1). Transfers and dispatch stay on the
        calling thread: concurrent device_put segfaults some PJRT plugins
        (observed on the axon TPU tunnel).

        ``hetero``: fraction of batches (0..1) routed to the HOST executor
        on a worker thread, transforming CONCURRENTLY with the device —
        both engines of the machine stay busy (measured 13M rows/s
        combined vs 4.6M device-only on the Criteo workload), or the
        string ``"auto"`` to calibrate the split from the first batch on
        each engine (host_rate / (host_rate + device_rate)). Outputs
        yield in input order; host-routed outputs are host-resident."""
        if hetero:
            yield from self._transform_batches_hetero(batches, output_node, hetero)
            return
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            fut = None
            for batch in batches:
                if (
                    batch.num_rows < self.jit_min_rows
                    or not self.graph_is_jittable(output_node, batch)
                    # ragged batches on a mesh take the shard_map path
                    # (per-shard rebased offsets) via transform_batch
                    or (
                        self.mesh is not None
                        and any(c.is_list for c in batch.columns.values())
                    )
                ):
                    # drain pipeline, run fallback (hybrid or host) in order
                    if fut is not None:
                        yield self._dispatch(fut.result(), output_node)
                        fut = None
                    yield self.transform_batch(batch, output_node)
                    continue
                nxt = pool.submit(self._prepare, batch, output_node)
                if fut is not None:
                    yield self._dispatch(fut.result(), output_node)
                fut = nxt
            if fut is not None:
                yield self._dispatch(fut.result(), output_node)

    def _transform_batches_hetero(self, batches, output_node: Node, fraction):
        """Split the stream between the host executor (worker thread; its
        C++ encodes release the GIL) and the device path, preserving order.

        ``fraction="auto"``: the optimal host share is
        host_rate / (host_rate + device_rate) — calibrated by timing the
        first batch on each engine (the device batch is forced with a tiny
        readback once; lazy runtimes otherwise report dispatch time, not
        execution), then fixed for the rest of the stream."""
        import concurrent.futures as cf
        import time as _time

        auto = isinstance(fraction, str)
        if auto and fraction != "auto":
            raise ValueError(f"hetero must be a fraction or 'auto', got {fraction!r}")
        if not auto:
            fraction = min(max(float(fraction), 0.0), 1.0)
        if os.environ.get("NVT_HOST_FUSE", "1") != "0":
            from .host_fuse import FusedHostExecutor

            host_exec = FusedHostExecutor()
        else:
            host_exec = LocalExecutor()

        rates = {"host": None, "device": None}  # rows/s once calibrated

        def timed_host(batch):
            t0 = _time.perf_counter()
            out = host_exec.transform_batch(batch, output_node)
            if rates["host"] is None:
                rates["host"] = batch.num_rows / max(_time.perf_counter() - t0, 1e-9)
            return out

        dev_state = {"warmed": False}

        def timed_device(batch):
            t0 = _time.perf_counter()
            out = self.transform_batch(batch, output_node)
            # force execution with a scalar readback so lazy runtimes
            # report real execution time (one-time calibration cost)
            first = next(iter(out.columns.values())).values
            if hasattr(first, "block_until_ready"):
                import jax.numpy as jnp

                float(jnp.sum(first[:8].astype(jnp.float32)))
            if not dev_state["warmed"]:
                # first device batch pays the compile — never calibrate on
                # it (a cold 100s+ XLA compile would route the whole
                # stream to the host)
                dev_state["warmed"] = True
            elif rates["device"] is None:
                rates["device"] = batch.num_rows / max(_time.perf_counter() - t0, 1e-9)
            return out

        results: Dict[int, Any] = {}
        next_out = 0
        acc = 0.0
        with cf.ThreadPoolExecutor(max_workers=1) as pool:
            futures: Dict[int, Any] = {}

            def drain(final: bool = False):
                """Yield completed outputs in input order; unless final,
                stop at a pending host future while the backlog is small
                (let the device run ahead a little)."""
                nonlocal next_out
                while next_out in results or next_out in futures:
                    if next_out in results:
                        yield results.pop(next_out)
                    else:
                        fut = futures[next_out]
                        if not final and not fut.done() and (
                            len(results) + len(futures)
                        ) < 4:
                            return
                        yield futures.pop(next_out).result()
                    next_out += 1

            for i, batch in enumerate(batches):
                if auto:
                    if rates["device"] is None and self.graph_is_jittable(
                        output_node, batch
                    ) and batch.num_rows >= self.jit_min_rows:
                        results[i] = timed_device(batch)
                        yield from drain()
                        continue
                    if rates["host"] is None:
                        futures[i] = pool.submit(timed_host, batch)
                        yield from drain()
                        continue
                    h, d = rates["host"], rates["device"]
                    fraction = 0.5 if d is None else h / max(h + d, 1e-9)
                    LOG.debug("hetero auto split: host share %.2f", fraction)
                acc += fraction
                to_host = acc >= 1.0
                if to_host:
                    acc -= 1.0
                if to_host or batch.num_rows < self.jit_min_rows or not self.graph_is_jittable(
                    output_node, batch
                ):
                    futures[i] = pool.submit(host_exec.transform_batch, batch, output_node)
                else:
                    results[i] = self.transform_batch(batch, output_node)
                yield from drain()
            yield from drain(final=True)

    def _prepare(self, batch: TableBatch, output_node: Node):
        """Host-side work only (thread-safe): pad to the row bucket and pack
        same-dtype columns into a few large stacks. The batch's global row
        offset rides along as two uint32 lanes — a traced ARGUMENT, so ops
        that need absolute row indices (k-fold assignment) work inside the
        fused program without forcing a recompile per partition."""
        n_rows = batch.num_rows
        host = batch.to_host()
        padded, meta = (_pad_batch(host) if self.bucket else (host, None))
        stacked, layout = _stack_batch(padded)
        off = int(batch.row_offset or 0)
        stacked["__row_offset_lo__"] = np.uint32(off & 0xFFFFFFFF)
        stacked["__row_offset_hi__"] = np.uint32(off >> 32)
        return layout, stacked, n_rows, batch.row_offset, meta

    def stage(self, batch: TableBatch, output_node: Node):
        """Pre-transfer a batch to HBM (host prep + device_put) without
        dispatching; pass the result to ``_dispatch`` later. Lets callers
        front-load all transfers before any device readback."""
        import jax

        layout, stacked, n_rows, row_offset, meta = self._prepare(batch, output_node)
        return layout, self._put_batch(stacked), n_rows, row_offset, meta

    def _dispatch(self, prepared, output_node: Node) -> TableBatch:
        import jax

        layout, stacked, n_rows, row_offset, meta = prepared
        # ONE device_put over a few large same-dtype buffers: per-transfer
        # latency amortizes across the whole batch (no-op for staged inputs)
        device_arrays = self._put_batch(stacked)
        # fitted state (vocab tables) rides as jit arguments, NOT constants
        # (multi-MB constants stall XLA compilation; see dag/device_state.py)
        state = self._collect_device_state(output_node)
        signature = (
            id(output_node),
            _fit_generations(output_node),
            layout,
            tuple(sorted((k, str(v.dtype), v.shape) for k, v in stacked.items())),
            tuple(sorted((k, str(v.dtype), v.shape) for k, v in state.items())),
        )
        fn = self._jit_cache.get(signature)
        if fn is None:

            def run(stacked_dict, state_dict):
                array_dict = _unstack_arrays(stacked_dict, layout)
                b = TableBatch.from_dict_of_arrays(array_dict)
                # absolute offsets ride as TRACED uint32 lanes (ops needing
                # global row ids — k-fold assignment — read row_offset_dev);
                # the int row_offset stays 0 so nothing bakes a constant in
                b.row_offset = 0
                lanes = (
                    stacked_dict["__row_offset_lo__"],
                    stacked_dict["__row_offset_hi__"],
                )
                with device_state_scope(state_dict), row_offset_scope(lanes):
                    out = LocalExecutor().transform_batch(b, output_node)
                return out.to_dict_of_arrays()

            fn = jax.jit(run)
            self._jit_cache[signature] = fn
        dev_state = self._get_or_put_device_state(
            id(output_node), state, lambda: self._put_state(state)
        )
        out_arrays = fn(device_arrays, dev_state)
        out = TableBatch.from_dict_of_arrays(out_arrays)
        # jax sorts dict-pytree keys: restore the schema's column order so
        # device and host paths emit identical layouts
        if output_node.output_schema is not None:
            out = out.select(
                [c.name for c in output_node.output_schema if c.name in out]
            )
        out.row_offset = row_offset
        if meta is not None and out.num_rows != n_rows:
            out = _unpad_batch(out, n_rows)
        return out


def _fit_generations(output_node: Node) -> tuple:
    """Per-node fit generations over the upstream graph: part of the jit
    cache key so a REFIT recompiles (scalar fitted state — means, stds,
    medians — traces into the program as constants; only array state rides
    as arguments)."""
    return tuple(
        getattr(n.op, "fit_generation", 0) for n in postorder_iter_nodes(output_node)
    )


def _stack_batch(batch: TableBatch):
    """Pack the flat array dict into a few large same-dtype-and-shape host
    stacks. Returns (stacked_arrays, layout) where layout is a hashable
    recipe for `_unstack_arrays`: per stack key, the tuple of flat-dict keys
    it carries; singletons pass through unstacked."""
    flat = batch.to_dict_of_arrays()
    groups: Dict[Any, List[str]] = {}
    for key, arr in flat.items():
        groups.setdefault((str(arr.dtype), arr.shape), []).append(key)
    stacked: Dict[str, Any] = {}
    layout_items = []
    for (dtype_str, shape), keys in groups.items():
        if len(keys) == 1:
            stacked[keys[0]] = flat[keys[0]]
            layout_items.append((keys[0], (keys[0],)))
        else:
            stack_key = f"__stack_{len(layout_items)}"
            stacked[stack_key] = np.stack([flat[k] for k in keys])
            layout_items.append((stack_key, tuple(keys)))
    return stacked, tuple(layout_items)


def _unstack_arrays(stacked: Dict[str, Any], layout) -> Dict[str, Any]:
    out = {}
    for stack_key, keys in layout:
        if len(keys) == 1:
            out[keys[0]] = stacked[stack_key]
        else:
            arr = stacked[stack_key]
            for i, k in enumerate(keys):
                out[k] = arr[i]
    return out


def _next_bucket(n: int) -> int:
    """Smallest power-of-two ≥ n (min 1024): bounds distinct jit signatures
    to log2(max_rows) while wasting <2x compute on padding."""
    b = 1024
    while b < n:
        b <<= 1
    return b


def _pad_batch(batch: TableBatch) -> "tuple[TableBatch, dict]":
    n = batch.num_rows
    target = _next_bucket(n)
    meta = {"rows": n}
    if target == n and all(
        not c.is_list or _next_bucket(len(c.values)) == len(c.values)
        for c in batch.columns.values()
    ):
        return batch, meta
    out = TableBatch()
    out.row_offset = batch.row_offset
    for name, col in batch.columns.items():
        if col.is_list:
            vals = col.values
            vtarget = _next_bucket(max(len(vals), 1))
            if vtarget > len(vals):
                vals = np.concatenate([vals, np.zeros(vtarget - len(vals), dtype=vals.dtype)])
            offs = col.offsets
            if target + 1 > len(offs):
                offs = np.concatenate(
                    [offs, np.full(target + 1 - len(offs), offs[-1], dtype=offs.dtype)]
                )
            valid = col.validity
            if valid is not None and target > len(valid):
                valid = np.concatenate([valid, np.ones(target - len(valid), dtype=bool)])
            out.columns[name] = Column(vals, offs, valid)
        else:
            vals = col.values
            if target > len(vals):
                pad = np.zeros(target - len(vals), dtype=vals.dtype)
                vals = np.concatenate([vals, pad])
            valid = col.validity
            if valid is not None and target > len(valid):
                valid = np.concatenate([valid, np.ones(target - len(valid), dtype=bool)])
            out.columns[name] = Column(vals, None, valid)
    return out, meta


def _unpad_batch(batch: TableBatch, n_rows: int) -> TableBatch:
    out = TableBatch()
    out.row_offset = batch.row_offset
    for name, col in batch.columns.items():
        out.columns[name] = col.slice(0, n_rows)
    return out



def _batch_device_safe(batch: TableBatch) -> bool:
    """All columns device-safe; memoized on the batch (the hetero router
    and transform_batch both ask, and the int64 min/max scan isn't free)."""
    cached = getattr(batch, "_device_safe", None)
    if cached is None:
        cached = all(_col_device_safe(c) for c in batch.columns.values())
        batch._device_safe = cached
    return cached


def _col_device_safe(col) -> bool:
    """True when a host column can move to device without data loss:
    numeric dtype, and int64/uint64 values must fit int32 (jax x64 off
    narrows 64-bit arrays — silent truncation otherwise)."""
    kind = col.values.dtype.kind
    if kind in ("O", "U", "S", "M"):
        return False
    if col.values.dtype.itemsize == 8 and kind in ("i", "u"):
        vals = col.values
        if vals.size:
            mn, mx = vals.min(), vals.max()
            if mn < np.iinfo(np.int32).min or mx > np.iinfo(np.int32).max:
                return False
    return True


def _node_jit_safe(op: BaseOperator, selector, input_schema: Optional[Schema]) -> bool:
    checker = getattr(op, "is_jit_safe", None)
    if checker is not None:
        try:
            return bool(checker(selector, input_schema))
        except Exception:
            return False
    return bool(getattr(op, "jit_safe", False))


class FitEngine:
    """Phased streaming statistics pass over a Dataset.

    Multi-host: each process streams ITS round-robin shard of partitions,
    then per-op states are allgathered and merged with ``fit_merge`` on
    every host identically (parallel/multihost.py) — no scheduler process,
    the SPMD replacement for the reference's dask fit (SURVEY §3.1)."""

    def __init__(self, executor: Optional[LocalExecutor] = None):
        self.executor = executor or LocalExecutor()
        # stat-op INPUT chains (e.g. FillMissing->Clip->LogOp feeding the
        # Normalize moments) evaluate through the fused host executor: one
        # native pass per continuous column instead of an eager numpy op
        # walk — same values bit-for-bit (test_host_fuse asserts it), and
        # its chain cache is keyed per fit generation so phase N+1 scans
        # see phase N's freshly fitted parameters
        self._input_executor: LocalExecutor = self.executor
        if os.environ.get("NVT_HOST_FUSE", "1") != "0":
            from .host_fuse import FusedHostExecutor

            self._input_executor = FusedHostExecutor()
        # per-fit phase breakdown (scan = streaming fit_batch over rows,
        # finalize = fixed per-key cost: sorts, table builds, artifacts).
        # The split matters because scan scales with ROWS while finalize
        # scales with KEYS — the amortization argument for end-to-end ETL
        # throughput rests on it (reference's dask fit has the same split:
        # the shuffled-groupby graph vs the _write_uniques finalize).
        self.last_fit_stats: Dict[str, float] = {}

    def fit(self, dataset, graph: Graph, shard=None) -> None:
        from ..parallel.multihost import allgather_pyobj, process_count, process_index

        if graph.output_schema is None:
            graph.construct_schema(dataset.schema)

        world = process_count()
        if shard is None and world > 1:
            shard = (process_index(), world)

        import time

        from .ops import Subgraph

        stats = {"scan_seconds": 0.0, "finalize_seconds": 0.0, "reduce_seconds": 0.0, "rows_scanned": 0}
        self.last_fit_stats = stats

        phases = graph.stat_phases()
        for phase_idx, phase_nodes in enumerate(phases):
            phase_start = time.perf_counter()
            nodes = [n for n in phase_nodes if not getattr(n.op, "fitted", False)]
            if not nodes:
                continue
            # subgraph nodes fit recursively over their own input stream
            # (the reference addresses subworkflows the same way via
            # get_subworkflow().fit, workflow.py:168)
            sub_nodes = [n for n in nodes if isinstance(n.op, Subgraph)]
            for n in sub_nodes:
                inner_ds = _NodeInputDataset(dataset, self.executor, n)
                self.fit(inner_ds, n.op.graph, shard=shard)
                n.op.fitted = True
            nodes = [n for n in nodes if not isinstance(n.op, Subgraph)]
            if not nodes:
                continue
            # mesh fit: ops that can count ON the device mesh (Categorify
            # single-int-column vocabs) buffer their raw columns during the
            # scan and run one SPMD exchange+sort per column afterwards —
            # the fit scan then scales with CHIPS, not host cores (round-2
            # weak #4; reference scales this with dask workers). Opt out
            # with NVT_MESH_FIT=0 (e.g. when d2h readback is the wall).
            mesh = getattr(self.executor, "mesh", None)
            mesh_axis = getattr(self.executor, "data_axis", "data")
            mesh_plans: Dict[int, List[str]] = {}
            if mesh is not None and os.environ.get("NVT_MESH_FIT", "1") != "0":
                for n in nodes:
                    plan_fn = getattr(n.op, "fit_mesh_plan", None)
                    if plan_fn is None:
                        continue
                    plan = plan_fn(n.selector, n.input_schema)
                    if plan:
                        mesh_plans[id(n)] = plan
            mesh_buffers: Dict[int, Dict[str, List]] = {
                nid: {c: [] for c in cols} for nid, cols in mesh_plans.items()
            }

            states = {
                id(n): n.op.fit_init(n.selector, n.input_schema)
                for n in nodes
                if id(n) not in mesh_plans
            }
            # ONE sweep over the dataset per phase. (A cache-regime split —
            # counter ops and streaming moments in separate sweeps — was
            # measured NEUTRAL once MomentsState pooled its columns: all
            # scan work now flows through the one shared 4-thread pool, so
            # there is no oversubscription left for a split to fix.)
            columns = self._phase_columns(nodes)
            scan_start = time.perf_counter()
            for batch in dataset.to_batches(columns=columns, shard=shard):
                memo: Dict[int, TableBatch] = {}
                # Node-level overlap: ops whose fit_batch releases the
                # GIL (fit_batch_concurrent, e.g. Categorify's pooled
                # C++ counters) run on a side thread while the
                # remaining ops' input chains + numpy scans (e.g.
                # cont_pipe -> Normalize moments) use the main thread.
                # Concurrent nodes' inputs are computed FIRST (cheap
                # raw-column selects) so the side thread launches
                # before the serial input chains start; the memo dict
                # stays main-thread-only.
                def _concurrent_ok(n):
                    if os.environ.get("NVT_FIT_NODE_OVERLAP", "1") == "0":
                        return False
                    if id(n) in mesh_plans or id(n) not in states:
                        return False
                    probe = getattr(n.op, "fit_batch_concurrent", None)
                    return bool(probe and probe(states[id(n)]))

                conc_nodes = [n for n in nodes if _concurrent_ok(n)]
                rest = [n for n in nodes if not _concurrent_ok(n)]
                th = None
                if conc_nodes and rest:
                    conc = [
                        (n, self._input_executor.compute_node_input(n, batch, memo))
                        for n in conc_nodes
                    ]
                    import threading as _threading

                    def _run_conc():
                        for n, ib in conc:
                            states[id(n)] = n.op.fit_batch(n.selector, ib, states[id(n)])

                    th = _threading.Thread(target=_run_conc)
                    th.start()
                else:
                    rest = nodes
                for n in rest:
                    input_batch = self._input_executor.compute_node_input(n, batch, memo)
                    if id(n) in mesh_plans:
                        for cname in mesh_plans[id(n)]:
                            col = input_batch[cname].to_host()
                            vals = np.asarray(col.values)
                            validity = (
                                None
                                if col.is_list or col.validity is None
                                else np.asarray(col.validity)
                            )
                            mesh_buffers[id(n)][cname].append((vals, validity))
                        continue
                    states[id(n)] = n.op.fit_batch(n.selector, input_batch, states[id(n)])
                if th is not None:
                    th.join()
                if phase_idx == 0:
                    stats["rows_scanned"] += batch.num_rows
            for n in nodes:
                if id(n) in mesh_plans:
                    states[id(n)] = n.op.fit_mesh(
                        mesh_buffers.pop(id(n)), mesh, mesh_axis
                    )
            stats["scan_seconds"] += time.perf_counter() - scan_start
            for n in nodes:
                state = states[id(n)]
                if shard is not None and world > 1:
                    reduce_start = time.perf_counter()
                    # ops can override the reduction (Categorify exchanges
                    # large vocabs over a mesh all-to-all instead of
                    # pickling whole accumulators through the allgather)
                    reducer = getattr(n.op, "fit_reduce_multihost", None)
                    if reducer is not None:
                        state = reducer(state)
                    else:
                        state = n.op.fit_merge(allgather_pyobj(state))
                    stats["reduce_seconds"] += time.perf_counter() - reduce_start
                finalize_start = time.perf_counter()
                n.op.fit_finalize(state)
                stats["finalize_seconds"] += time.perf_counter() - finalize_start
                n.op.fitted = True
                # refit marker: SCALAR fitted state (Normalize means, fill
                # values) traces into the fused program as CONSTANTS, so the
                # jit cache key must change when an op is refitted — array
                # state already rides as arguments, scalars need this bump
                n.op.fit_generation = getattr(n.op, "fit_generation", 0) + 1
            # per-phase wall-clock (the dask-dashboard observability analog)
            LOG.info(
                "fit phase %d (%s): %.3fs",
                phase_idx,
                ",".join(n.op.label for n in nodes),
                time.perf_counter() - phase_start,
            )
        # final schema pass so downstream schemas see fitted properties
        # (embedding sizes, domains) computed during fit
        root = dataset.schema
        graph.construct_schema(root)

    def _phase_columns(self, nodes: List[Node]) -> Optional[List[str]]:
        """Union of root columns needed by the upstream closure of the phase."""
        needed = set()
        for node in nodes:
            for up in _upstream_closure(node):
                if not up.parents_with_dependencies and up.selector is not None:
                    needed.update(up.selector.names)
        return sorted(needed) if needed else None


class _NodeInputDataset:
    """Adapter presenting 'the input batches of node X' as a Dataset for the
    recursive fit of Subgraph inner graphs."""

    def __init__(self, dataset, executor: LocalExecutor, node: Node):
        self._dataset = dataset
        self._executor = executor
        self._node = node

    @property
    def schema(self):
        return self._node.input_schema or self._dataset.schema

    def to_batches(self, columns=None, prefetch: int = 2, shard=None):
        for batch in self._dataset.to_batches(prefetch=prefetch, shard=shard):
            memo: Dict[int, TableBatch] = {}
            out = self._executor.compute_node_input(self._node, batch, memo)
            if columns:
                out = out.select([c for c in columns if c in out])
            yield out


def _upstream_closure(node: Node) -> List[Node]:
    out = []
    stack = [node]
    seen = set()
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen.add(id(n))
        out.append(n)
        stack.extend(n.parents_with_dependencies)
    return out


def _capture_dtypes(node: Node, batch: TableBatch):
    """Record the dtypes actually produced into the node's output schema
    (the reference's capture_dtypes fit path, workflow.py:209)."""
    schema = node.output_schema
    for name, col in batch.columns.items():
        cs = schema.get(name)
        if cs is None:
            continue
        actual = col.dtype
        if cs.dtype.name != actual.name or cs.is_list != col.is_list:
            schema.column_schemas[name] = cs.with_dtype(
                actual, is_list=col.is_list, is_ragged=col.is_list
            )


def _conform_to_schema(batch: TableBatch, schema: Schema, node: Node) -> TableBatch:
    """Order columns per schema; verify/coerce dtypes on the host path."""
    out = TableBatch()
    for cs in schema:
        if cs.name not in batch:
            raise RuntimeError(
                f"Operator {node.op.label} promised column {cs.name!r} "
                f"but produced {batch.column_names}"
            )
        out[cs.name] = batch[cs.name]
    return out


def _enforce_dtypes(batch: TableBatch, output_dtypes: Dict[str, Any]) -> TableBatch:
    from .. import dtypes as md

    out = batch.copy()
    for name, dtype in output_dtypes.items():
        if name in out:
            want = md.normalize(dtype)
            col = out[name]
            if want.numpy_dtype is not None and col.values.dtype != want.numpy_dtype:
                if col.values.dtype.kind == "O" or want.is_string:
                    continue
                if col.backend == "jax" and np.dtype(want.numpy_dtype).itemsize == 8:
                    continue  # x64 off: device can't widen; host restores later
                out[name] = col.astype(want)
    return out
