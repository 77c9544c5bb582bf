"""Device-resident training feed: transform → shuffle → batch entirely in HBM.

The reference moves preprocessed partitions host→GPU through dlpack per
chunk (reference nvtabular/loader/tensorflow.py:113-130). Here the whole
pipeline stays on device: the workflow's fused transform leaves outputs in
HBM (`TransformedDataset.to_batches(host=False)`), each chunk is shuffled
with ONE device gather per column (a jax.random permutation), ragged
columns pad via the gather kernel (kernels/ragged.py), and batches are
free contiguous slices. Preprocessed features never touch the host.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from ..tags import Tags


def _permute_tree(arrays: Dict[str, Any], perm) -> Dict[str, Any]:
    import jax

    global _PERMUTE_JIT
    if _PERMUTE_JIT is None:
        import jax.numpy as jnp

        _PERMUTE_JIT = jax.jit(
            lambda d, p: {k: jnp.take(v, p, axis=0) for k, v in d.items()}
        )
    return _PERMUTE_JIT(arrays, perm)


_PERMUTE_JIT = None


class DeviceLoader:
    """Batch iterator over a (transformed) dataset with device-resident
    shuffle/collate. Batch layout matches ``Loader``: per-cat int arrays,
    stacked ``dense``, ``label``, multihot as padded values+mask."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        cat_names: Optional[List[str]] = None,
        cont_names: Optional[List[str]] = None,
        label_names: Optional[List[str]] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        sparse_max: Optional[Dict[str, int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sparse_max = dict(sparse_max or {})
        schema = dataset.schema
        self.cat_names = (
            list(cat_names)
            if cat_names is not None
            else [cs.name for cs in schema if Tags.CATEGORICAL in cs.tags]
        )
        self.cont_names = (
            list(cont_names)
            if cont_names is not None
            else [cs.name for cs in schema if Tags.CONTINUOUS in cs.tags]
        )
        self.label_names = (
            list(label_names)
            if label_names is not None
            else [cs.name for cs in schema if Tags.TARGET in cs.tags]
        )
        for cs in schema:
            if cs.is_list and cs.name not in self.sparse_max:
                vc = cs.properties.get("value_count") or {}
                if vc.get("max"):
                    self.sparse_max[cs.name] = int(vc["max"])
        self._epoch = 0

    def chunks(self) -> Iterator[Dict[str, Any]]:
        """Permuted FULL-chunk array dicts (no per-batch slicing): feed
        these to ``models.training.make_chunk_train_fn`` so a whole chunk
        of steps runs as ONE dispatched ``lax.scan`` program — per-step
        host dispatches (a program + ~30 slice ops each) are what cap the
        device feed over a remote/tunnel runtime."""
        import jax

        key = jax.random.PRNGKey(self.seed + self._epoch)
        self._epoch += 1
        try:
            source = self.dataset.to_batches(host=False)
        except TypeError:
            source = self.dataset.to_batches()
        for chunk in source:
            arrays = self._device_arrays(chunk)
            if not arrays:
                raise ValueError(
                    "DeviceLoader selected no columns: pass cat_names/"
                    "cont_names/label_names explicitly, or load a dataset "
                    "whose schema carries CATEGORICAL/CONTINUOUS/TARGET tags"
                )
            if self.shuffle:
                key, sub = jax.random.split(key)
                n = len(next(iter(arrays.values())))
                perm = jax.random.permutation(sub, n)
                arrays = _permute_tree(arrays, perm)
            yield arrays

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import jax
        import jax.numpy as jnp

        key = jax.random.PRNGKey(self.seed + self._epoch)
        self._epoch += 1

        carry: Optional[Dict[str, Any]] = None
        try:  # TransformedDataset supports device-resident output
            source = self.dataset.to_batches(host=False)
        except TypeError:
            source = self.dataset.to_batches()
        for chunk in source:
            arrays = self._device_arrays(chunk)
            if carry is not None:
                arrays = {
                    k: jnp.concatenate([carry[k], v]) for k, v in arrays.items()
                }
                carry = None
            n = len(next(iter(arrays.values())))
            if self.shuffle:
                key, sub = jax.random.split(key)
                perm = jax.random.permutation(sub, n)
                # ONE jitted program permutes every column (per-column eager
                # takes each pay a dispatch round trip — ~40 of them per
                # chunk costs seconds over a remote/tunnel runtime)
                arrays = _permute_tree(arrays, perm)
            full = n // self.batch_size * self.batch_size
            for start in range(0, full, self.batch_size):
                yield {
                    k: v[start : start + self.batch_size] for k, v in arrays.items()
                }
            if full < n:
                carry = {k: v[full:] for k, v in arrays.items()}
        if carry is not None and not self.drop_last:
            yield carry

    def _device_arrays(self, chunk) -> Dict[str, Any]:
        """TableBatch (device or host) → flat dict of device arrays in the
        training batch layout."""
        import jax.numpy as jnp

        from ..kernels import ragged_to_padded

        out: Dict[str, Any] = {}
        dense = []
        for name in self.cont_names:
            col = chunk[name]
            if col.is_list:
                raise NotImplementedError(
                    f"DeviceLoader does not support list-valued continuous "
                    f"column {name!r}; use the host Loader (pad_lists) or "
                    f"pre-aggregate it"
                )
            dense.append(jnp.asarray(col.values, dtype=jnp.float32))
        if dense:
            out["dense"] = jnp.stack(dense, axis=1)
        for name in self.cat_names:
            col = chunk[name]
            if col.is_list:
                max_len = self.sparse_max.get(name)
                if max_len is None:
                    raise ValueError(
                        f"multihot column {name!r} needs a static max length "
                        f"on device: pass sparse_max={{'{name}': L}} or set a "
                        f"value_count on the schema (silent truncation is "
                        f"not acceptable)"
                    )
                padded, mask = ragged_to_padded(
                    jnp.asarray(col.values), jnp.asarray(col.offsets), max_len, 0
                )
                out[f"{name}__values"] = padded
                out[f"{name}__mask"] = mask.astype(jnp.float32)
            else:
                out[name] = jnp.asarray(col.values)
        for name in self.label_names:
            key = "label" if len(self.label_names) == 1 else name
            out[key] = jnp.asarray(chunk[name].values, dtype=jnp.float32)
        return out
