"""The fused transform→write stream: shuffled parquet output where the
transform runs INSIDE the file workers.

`workflow.transform(dataset).to_parquet(path, shuffle="per_worker")` is the
reference's production ETL output call (its dask graph materializes the
lazy transform inside each write task — reference nvtabular/workflow/
workflow.py:239-248). This framework reproduces that execution shape
natively: when the fitted graph is covered by the fused stream spec
(Categorify columns with native hash tables, fusable continuous chains,
passthroughs — `io/stream_fuse.py`), RAW batches flow to the per-file
writer threads and each one

    gathers its shuffled shard → hash-probes / cont-pipes it → encodes
    the parquet page,

all inside ONE GIL-free C++ call per column (`cpp/nvt_parquet.cc::
nvtpq_write_column_op`). No intermediate transformed batch ever exists,
and the output is bit-identical to the two-phase host stream (asserted in
tests/unit/test_fused_write.py). Workflows outside the spec (strings,
UDFs, multi-bucket OOV, list windows) transparently fall back to the
two-phase stream — same files, same rows.

Run: python examples/06_fused_shuffled_write.py
"""

import os
import tempfile
import time

import numpy as np

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.table import TableBatch


def main():
    rows = int(os.environ.get("NVT_EXAMPLE_ROWS", 400_000))
    parts = 4
    rng = np.random.default_rng(7)
    batches = [
        TableBatch.from_pydict(
            {
                "ad_id": rng.integers(0, 50_000, rows // parts).astype(np.int32),
                "site_id": rng.integers(0, 300, rows // parts).astype(np.int32),
                "price": rng.lognormal(0.0, 1.0, rows // parts).astype(np.float32),
                "clicks": rng.normal(2.0, 1.0, rows // parts).astype(np.float32),
                "label": rng.integers(0, 2, rows // parts).astype(np.int32),
            }
        )
        for _ in range(parts)
    ]
    dataset = nvt.Dataset(batches)

    cats = ["ad_id", "site_id"] >> ops.Categorify()
    conts = (
        ["price", "clicks"]
        >> ops.FillMissing()
        >> ops.Clip(min_value=0.0)
        >> ops.LogOp()
        >> ops.Normalize()
    )
    workflow = nvt.Workflow(cats + conts + ["label"])
    workflow.fit(dataset)

    # show whether this graph rides the fused native stream
    from nvtabular_tpu.io.stream_fuse import extract_stream_spec

    spec = extract_stream_spec(workflow)
    print(
        "fused stream spec:",
        "ACTIVE — workers transform their own shards"
        if spec is not None
        else "not applicable — two-phase stream",
    )
    if spec is not None:
        print("  per-column ops:", {c.name: c.kind for c in spec.columns})

    out_dir = tempfile.mkdtemp(prefix="nvt_example06_")
    start = time.perf_counter()
    workflow.transform(dataset).to_parquet(
        out_dir, shuffle="per_worker", output_files=4
    )
    dt = time.perf_counter() - start
    print(f"wrote {rows} shuffled rows in {dt:.2f}s -> {out_dir}")

    # read back and sanity-check the shuffle + the encoding
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    total = 0
    for f in files:
        t = pq.read_table(os.path.join(out_dir, f))
        total += t.num_rows
        codes = t.column("ad_id").to_numpy()
        assert codes.min() >= 1  # NULL=1 / OOV=2 / vocab ids from 3
    assert total == rows, (total, rows)
    print(f"{len(files)} files, {total} rows round-tripped; codes in range")


if __name__ == "__main__":
    main()
