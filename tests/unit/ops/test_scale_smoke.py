"""10M-key vocabulary smoke: the reference benchmark fits Categorify at
max_size=10_000_000 on Criteo (reference bench/datasets/tools/nvt_etl.py:
147-170); this exercises the same scale end-to-end in-process — streaming
C++ count, frequency-capped finalize, parquet artifact, cuckoo build, and
exact encode on both engines."""

import numpy as np
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.table import TableBatch


@pytest.mark.slow
def test_ten_million_key_vocab_fit_and_encode(tmp_path):
    n_unique = 10_000_000
    rows = 2_000_000
    rng = np.random.default_rng(0)
    # every id 0..n_unique-1 appears at least once (arange part), plus a
    # skewed sample so counts differ and the frequency sort is non-trivial
    ids = np.concatenate(
        [
            np.arange(n_unique, dtype=np.int64),
            (n_unique * rng.random(rows) ** 3).astype(np.int64),
        ]
    )
    # spread over int31 like hashed Criteo ids (odd multiplier: bijection)
    keys = ((ids * np.int64(2654435761)) % np.int64(2**31)).astype(np.int64)
    parts = [
        TableBatch.from_pydict({"c": chunk})
        for chunk in np.array_split(keys, 12)
    ]
    ds = nvt.Dataset(parts)
    wf = nvt.Workflow(["c"] >> ops.Categorify(max_size=10_000_000, out_path=str(tmp_path)))
    wf.fit(ds)

    cat = next(n.op for n in wf.graph.nodes if isinstance(n.op, ops.Categorify))
    vocab = cat.vocabs["c"]
    # max_size caps the vocab at 10M - start_index reserved slots
    assert vocab.size <= 10_000_000
    assert len(vocab.values_by_code) > 9_000_000

    # exact encode of seen + unseen keys on the host engine
    sample = rng.choice(np.asarray(vocab.values_by_code), 50_000)
    unseen = np.full(1000, -3, dtype=np.int64)  # negative: never generated
    q = np.concatenate([sample, unseen])
    out = wf.transform(nvt.Dataset([TableBatch.from_pydict({"c": q})]))
    codes = np.asarray(next(iter(out.to_batches()))["c"].values)
    assert (codes[-1000:] == 2).all()  # OOV
    start = vocab.start_index
    got_vals = np.asarray(vocab.values_by_code)[codes[:50_000] - start]
    np.testing.assert_array_equal(got_vals, sample)
