"""TF feature-column → Workflow converter (reference
framework_utils/tensorflow/feature_column_utils.py:35-286): rebuild a
tf.feature_column preprocessing graph as an equivalent nvtabular_tpu
Workflow, so the heavy lifting moves out of the TF input layer.

Mapping (duck-typed on the feature-column attributes, so it works with any
tf.feature_column version):
  numeric_column                       → continuous passthrough
  bucketized_column(numeric, bounds)   → Bucketize
  categorical_column_with_identity     → categorical passthrough
  ..._with_vocabulary_list/file        → Categorify(vocabs=...)
  ..._with_hash_bucket                 → HashBucket
  crossed_column                       → HashedCross
  embedding_column / indicator_column  → unwrap to the inner categorical
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _unwrap(fc):
    while hasattr(fc, "categorical_column"):
        fc = fc.categorical_column
    return fc


def _name(fc) -> str:
    return getattr(fc, "key", None) or getattr(fc, "name", "")


def make_feature_column_workflow(feature_columns, label_name: str, category_dir=None):
    """→ (workflow, output_feature_columns).

    output_feature_columns reference the TRANSFORMED dataset: categorical
    transforms become identity columns (codes are already integer ids);
    numeric columns pass through.
    """
    from .. import Workflow
    from ..ops import Bucketize, Categorify, HashBucket, HashedCross

    conts: List[str] = []
    identity_cats: List[str] = []
    bucketized: Dict[str, list] = {}
    vocab_cats: Dict[str, Any] = {}
    hash_cats: Dict[str, int] = {}
    crossed: List[Tuple[Tuple[str, ...], int]] = []
    new_sizes: Dict[str, int] = {}

    for fc in feature_columns:
        base = _unwrap(fc)
        tname = type(base).__name__
        if hasattr(base, "boundaries"):  # BucketizedColumn
            src = _name(_unwrap(base.source_column if hasattr(base, "source_column") else base))
            bucketized[src] = list(base.boundaries)
            new_sizes[src] = len(base.boundaries) + 1
        elif hasattr(base, "keys") and hasattr(base, "hash_bucket_size"):  # CrossedColumn
            members = tuple(_name(_unwrap(k)) if not isinstance(k, str) else k for k in base.keys)
            crossed.append((members, int(base.hash_bucket_size)))
        elif hasattr(base, "vocabulary_list"):
            vocab_cats[_name(base)] = list(base.vocabulary_list)
            new_sizes[_name(base)] = len(base.vocabulary_list)
        elif hasattr(base, "vocabulary_file"):
            vocab_cats[_name(base)] = str(base.vocabulary_file)
        elif hasattr(base, "hash_bucket_size"):
            hash_cats[_name(base)] = int(base.hash_bucket_size)
            new_sizes[_name(base)] = int(base.hash_bucket_size)
        elif hasattr(base, "num_buckets") or "Identity" in tname:
            identity_cats.append(_name(base))
            if hasattr(base, "num_buckets"):
                new_sizes[_name(base)] = int(base.num_buckets)
        else:  # NumericColumn
            conts.append(_name(base))

    graph = None

    def _merge(node):
        nonlocal graph
        graph = node if graph is None else graph + node

    if conts:
        _merge(list(dict.fromkeys(conts)))
    if identity_cats:
        _merge(list(dict.fromkeys(identity_cats)))
    for col, bounds in bucketized.items():
        _merge([col] >> Bucketize({col: bounds}))
    if vocab_cats:
        vocabs = {
            k: np.asarray(v) for k, v in vocab_cats.items() if not isinstance(v, str)
        }
        file_vocabs = {k: v for k, v in vocab_cats.items() if isinstance(v, str)}
        if vocabs:
            _merge(list(vocabs) >> Categorify(vocabs=vocabs))
        if file_vocabs:
            _merge(list(file_vocabs) >> Categorify(vocabs=_load_file_vocabs(file_vocabs)))
    for col, nb in hash_cats.items():
        _merge([col] >> HashBucket({col: nb}))
    for members, nb in crossed:
        _merge([members] >> HashedCross({members: nb}))
    if label_name:
        _merge([label_name])

    workflow = Workflow(graph)

    # rebuild output feature columns against the transformed names
    try:
        import tensorflow as tf

        fcmod = tf.feature_column
        out_cols = []
        for fc in feature_columns:
            base = _unwrap(fc)
            nm = _name(base)
            if nm in conts and not hasattr(base, "boundaries"):
                out_cols.append(fcmod.numeric_column(nm))
            else:
                out_name = "_X_".join(m for m in (nm,)) if nm else nm
                size = new_sizes.get(nm)
                if size is None:
                    size = 1 << 20  # unknown until fit; caller re-reads schema
                out_cols.append(fcmod.categorical_column_with_identity(nm, size + 3))
        return workflow, out_cols
    except Exception:
        return workflow, feature_columns


def _load_file_vocabs(file_vocabs: Dict[str, str]) -> Dict[str, Any]:
    out = {}
    for k, path in file_vocabs.items():
        with open(path) as f:
            out[k] = np.asarray([line.rstrip("\n") for line in f if line.strip()])
    return out
