"""tfrecords → parquet converter (reference
framework_utils/tensorflow/tfrecords_to_parquet.py:1-114): ingest TFRecord
files of tf.Example protos into parquet the Dataset can stream."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def convert_tfrecords_to_parquet(
    filenames: List[str],
    output_dir: str,
    compression_type: Optional[str] = None,
    chunks: int = 100_000,
    convert_lists: bool = True,
) -> List[str]:
    """Parse tf.Example records and write one parquet per input file.

    ``convert_lists``: single-element feature lists become scalar columns
    (the usual tfrecord encoding of scalars); true variable-length features
    stay list columns.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tensorflow as tf

    os.makedirs(output_dir, exist_ok=True)
    out_paths = []
    for path in filenames:
        ds = tf.data.TFRecordDataset(path, compression_type=compression_type)
        rows: List[dict] = []
        writer = None
        out_path = os.path.join(
            output_dir, os.path.splitext(os.path.basename(path))[0] + ".parquet"
        )
        for raw in ds:
            example = tf.train.Example()
            example.ParseFromString(bytes(raw.numpy()))
            row = {}
            for name, feature in example.features.feature.items():
                kind = feature.WhichOneof("kind")
                if kind == "int64_list":
                    vals = list(feature.int64_list.value)
                elif kind == "float_list":
                    vals = list(feature.float_list.value)
                elif kind == "bytes_list":
                    vals = [v.decode("utf-8", "replace") for v in feature.bytes_list.value]
                else:
                    continue
                row[name] = vals
            rows.append(row)
            if len(rows) >= chunks:
                writer = _flush(rows, writer, out_path, convert_lists)
                rows = []
        if rows:
            writer = _flush(rows, writer, out_path, convert_lists)
        if writer is not None:
            writer.close()
            out_paths.append(out_path)
    return out_paths


def _flush(rows, writer, out_path, convert_lists):
    import pyarrow as pa
    import pyarrow.parquet as pq

    columns = {}
    names = sorted({k for r in rows for k in r})
    for name in names:
        col = [r.get(name, []) for r in rows]
        if convert_lists and all(len(v) == 1 for v in col):
            columns[name] = pa.array([v[0] for v in col])
        else:
            columns[name] = pa.array(col)
    table = pa.table(columns)
    if writer is None:
        writer = pq.ParquetWriter(out_path, table.schema)
    writer.write_table(table)
    return writer
