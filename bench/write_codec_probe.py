"""Parquet encode-codec probe on REAL transformed bench output.

The end-to-end ETL stream is CPU-bound on the parquet encode (tmpfs and
disk write rates match), so codec choice is wall-clock. This probe times
single-threaded encodes of one transformed partition under interleaved
codec configurations (A/B/A/B — single-pass host timings on this VM are
worthless, see CLAUDE.md page-fault trap) and prints rows/s + bytes/row
for each.

Usage: python bench/write_codec_probe.py [--rounds 3]
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--parts", type=int, default=2)
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    import bench as _b
    import nvtabular_tpu as nvt
    from nvtabular_tpu import ops
    from nvtabular_tpu.dag.host_fuse import FusedHostExecutor
    from nvtabular_tpu.table import TableBatch

    parts = [TableBatch.from_pydict(_b.make_part(s)) for s in range(args.parts)]
    dataset = nvt.Dataset(parts)
    cat_names = [f"C{i}" for i in range(_b.NUM_CATS)]
    cont_names = [f"I{i}" for i in range(_b.NUM_CONTS)]
    cats = cat_names >> ops.Categorify(max_size=10_000_000)
    conts = (
        cont_names >> ops.FillMissing() >> ops.Clip(min_value=0.0) >> ops.LogOp() >> ops.Normalize()
    )
    workflow = nvt.Workflow(cats + conts + ["label"])
    workflow.fit(dataset)
    host = FusedHostExecutor()
    out_node = workflow.graph.output_node
    table = host.transform_batch(parts[0], out_node).to_arrow()
    rows = table.num_rows
    int_cols = [f.name for f in table.schema if pa.types.is_integer(f.type)]
    float_cols = [f.name for f in table.schema if pa.types.is_floating(f.type)]

    delta_bss = {c: "DELTA_BINARY_PACKED" for c in int_cols}
    delta_bss.update({c: "BYTE_STREAM_SPLIT" for c in float_cols})

    def percol(int_codec, float_codec):
        d = {c: int_codec for c in int_cols}
        d.update({c: float_codec for c in float_cols})
        return d

    configs = {
        # current default: delta ints + BSS floats, zstd-1 everywhere
        "delta+bss/zstd1": dict(
            column_encoding=delta_bss, compression="zstd", compression_level=1
        ),
        # drop zstd on the delta-packed ints (already compact), keep on floats
        "delta+bss/zstd-floats-only": dict(
            column_encoding=delta_bss,
            compression=percol("NONE", "ZSTD"),
            compression_level={c: 1 for c in float_cols},
        ),
        # no codec anywhere (encodings only)
        "delta+bss/none": dict(column_encoding=delta_bss, compression="NONE"),
        # plain encodings + snappy (arrow's old default shape)
        "plain/snappy": dict(compression="snappy"),
        # plain + zstd1
        "plain/zstd1": dict(compression="zstd", compression_level=1),
    }

    results = {k: [] for k in configs}
    sizes = {}
    for _ in range(args.rounds):
        for name, kw in configs.items():
            sink = io.BytesIO()
            t0 = time.perf_counter()
            w = pq.ParquetWriter(sink, table.schema, use_dictionary=False, **kw)
            w.write_table(table)
            w.close()
            dt = time.perf_counter() - t0
            results[name].append(rows / dt)
            sizes[name] = sink.tell()

    print(f"rows={rows} cols={table.num_columns} (single-thread encode)")
    for name in configs:
        rates = sorted(results[name])
        med = rates[len(rates) // 2]
        print(
            f"{name:28s} {med/1e6:6.2f}M rows/s median "
            f"(min {rates[0]/1e6:.2f} max {rates[-1]/1e6:.2f}) | "
            f"{sizes[name]/rows:5.1f} B/row"
        )


if __name__ == "__main__":
    main()
