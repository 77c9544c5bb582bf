"""TensorFlow adapter over the Loader — API parity with the reference's
``KerasSequenceLoader``/``KerasSequenceValidater``
(reference nvtabular/loader/tensorflow.py:105-269): dataset/paths
validation, tag- or list-based cat/cont/label selection, batches as dicts
of tf tensors (features, labels). The reference's GPU memory-cap shim
(tf_utils.configure_tensorflow) has no TPU analog — XLA owns HBM — so it
is a documented no-op here."""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..io.dataset import Dataset
from .loader import Loader


def _validate_dataset(paths_or_dataset, batch_size, buffer_size, engine, reader_kwargs):
    """reference tensorflow.py:37-67."""
    if isinstance(paths_or_dataset, Dataset):
        return paths_or_dataset
    reader_kwargs = reader_kwargs or {}
    return Dataset(paths_or_dataset, engine=engine, **reader_kwargs)


def configure_tensorflow(memory_allocation=None, device=None):
    """No-op on TPU (reference loader/tf_utils.py:28 caps TF's GPU pool so
    cudf has headroom; XLA manages TPU HBM directly)."""
    return None


class KerasSequenceLoader(Loader):
    """Batch iterator yielding (features_dict, labels) of tf tensors."""

    def __init__(
        self,
        paths_or_dataset,
        batch_size: int,
        label_names: Optional[List[str]] = None,
        feature_columns=None,
        cat_names: Optional[List[str]] = None,
        cont_names: Optional[List[str]] = None,
        engine: str = "parquet",
        shuffle: bool = True,
        seed_fn=None,
        buffer_size: float = 0.1,
        parts_per_chunk: int = 1,
        reader_kwargs: Optional[Dict] = None,
        global_size: Optional[int] = None,
        global_rank: Optional[int] = None,
        drop_last: bool = False,
        sparse_names=None,
        sparse_max=None,
        sparse_as_dense: bool = False,
        **kwargs,
    ):
        dataset = _validate_dataset(
            paths_or_dataset, batch_size, buffer_size, engine, reader_kwargs
        )
        if feature_columns is not None and (cat_names or cont_names):
            raise ValueError(
                "pass either feature_columns or explicit cat/cont names, not both"
            )
        if feature_columns is not None:
            cat_names, cont_names = _columns_from_feature_columns(feature_columns)
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
            cat_names=cat_names,
            cont_names=cont_names,
            label_names=label_names,
            sparse_max=sparse_max,
            pad_lists=True,
            stack_dense=False,  # keras consumes per-feature tensors
            device=False,
            **kwargs,
        )

    def __iter__(self) -> Iterator[Tuple[Dict[str, Any], Any]]:
        import tensorflow as tf

        for batch in super().__iter__():
            tensors = {}
            for k, v in batch.items():
                arr = np.asarray(v)
                if arr.dtype == np.object_:
                    continue
                tensors[k] = tf.convert_to_tensor(arr)
            labels = tensors.pop("label", None)
            yield tensors, labels


try:  # subclass the real Keras Callback so fit(callbacks=[...]) drives it
    from tensorflow.keras.callbacks import Callback as _CallbackBase
except Exception:  # pragma: no cover - tf absent: minimal protocol stand-in
    class _CallbackBase:
        def set_model(self, model):
            self.model = model

        def set_params(self, params):
            self.params = params


class KerasSequenceValidater(_CallbackBase):
    """Per-epoch validation callback (reference tensorflow.py:269+):
    run the model over a validation loader, log/return metrics. A real
    ``tf.keras.callbacks.Callback`` — Keras assigns ``self.model`` via
    ``set_model`` during ``fit``; pass ``model=`` for standalone use."""

    def __init__(self, dataloader: KerasSequenceLoader, model=None):
        super().__init__()
        self.dataloader = dataloader
        if model is not None:
            self.model = model

    def on_epoch_end(self, epoch, logs=None):
        import tensorflow as tf

        logs = logs if logs is not None else {}
        results = []
        for features, labels in self.dataloader:
            preds = self.model(features, training=False)
            results.append(
                tf.keras.metrics.binary_accuracy(
                    tf.cast(labels, tf.float32), tf.reshape(preds, [-1])
                )
            )
        if results:
            logs["val_accuracy"] = float(tf.reduce_mean(tf.concat(results, axis=0)))
        return logs


def _columns_from_feature_columns(feature_columns):
    """Split TF feature_columns into (cat_names, cont_names) — the loader
    side of the reference's feature-column support (tensorflow.py:70-96)."""
    cats, conts = [], []
    for fc in feature_columns:
        base = fc
        while hasattr(base, "categorical_column"):
            base = base.categorical_column
        name = getattr(base, "key", None) or getattr(base, "name", None)
        if hasattr(base, "num_buckets") or hasattr(base, "vocabulary_size"):
            cats.append(name)
        else:
            conts.append(name)
    return cats, conts
