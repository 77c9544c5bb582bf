"""DeviceLoader: the device-resident ETL → training feed (features never
leave HBM): device shuffle, device multihot padding, direct DLRM feed,
unshuffled parity with the host Loader."""

import jax
import numpy as np
import pandas as pd

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.dag.executor import JitExecutor
from nvtabular_tpu.loader import DeviceLoader, Loader
from nvtabular_tpu.tags import Tags


def _transformed(n=6000, seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 300, n).astype(np.int64),
            "price": rng.normal(0, 1, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    df["genres"] = [list(rng.integers(0, 12, rng.integers(0, 4))) for _ in range(n)]
    cats = ["user", "genres"] >> ops.Categorify()
    conts = ["price"] >> ops.Normalize()
    wf = nvt.Workflow(
        cats + conts + (["label"] >> ops.AddTags([Tags.TARGET])),
        executor=JitExecutor(jit_min_rows=0),
    )
    return wf, wf.fit_transform(nvt.Dataset(df, part_size=64 * 1024))


def test_device_resident_batches_and_training():
    import optax

    from nvtabular_tpu.models import DLRMConfig, dlrm_init, dlrm_loss, make_step_fns

    wf, transformed = _transformed()
    dl = DeviceLoader(
        transformed, batch_size=512, shuffle=True, seed=0,
        cat_names=["user", "genres"], cont_names=["price"], label_names=["label"],
        sparse_max={"genres": 4},
    )
    batches = list(dl)
    assert len(batches) == 6000 // 512
    b = batches[0]
    assert sorted(b) == ["dense", "genres__mask", "genres__values", "label", "user"]
    assert all(isinstance(v, jax.Array) for v in b.values())  # never left device
    assert b["genres__values"].shape == (512, 4)

    config = DLRMConfig.from_schema(
        wf.output_schema, embedding_dim=8, bottom_mlp=(16,), top_mlp=(16,),
        multihot_max_len=4,
    )
    params = dlrm_init(jax.random.PRNGKey(0), config)
    opt = optax.adam(1e-2)
    st = opt.init(params)
    step, _ = make_step_fns(dlrm_loss, opt)
    for b in batches:
        params, st, loss = step(params, st, b)
    assert np.isfinite(float(loss))


def test_unshuffled_parity_with_host_loader():
    wf, transformed = _transformed(seed=1)
    dl = DeviceLoader(
        transformed, batch_size=512, shuffle=False,
        cat_names=["user"], cont_names=["price"], label_names=["label"],
    )
    hl = Loader(
        transformed, batch_size=512, shuffle=False, device=False, drop_last=True,
        cat_names=["user"], cont_names=["price"], label_names=["label"],
    )
    d0 = next(iter(dl))
    h0 = next(iter(hl))
    np.testing.assert_array_equal(np.asarray(d0["user"]), h0["user"])
    np.testing.assert_allclose(np.asarray(d0["dense"]), h0["dense"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(d0["label"]), h0["label"])


def test_device_shuffle_covers_all_rows():
    wf, transformed = _transformed(seed=2)
    dl = DeviceLoader(
        transformed, batch_size=500, shuffle=True, seed=3, drop_last=False,
        cat_names=["user"], cont_names=["price"], label_names=["label"],
    )
    users = np.concatenate([np.asarray(b["user"]) for b in dl])
    base = wf.transform(
        nvt.Dataset(transformed.base_dataset)
    )
    assert len(users) == 6000
    # permutation: same multiset of codes as unshuffled
    ref = np.concatenate([np.asarray(b["user"]) for b in DeviceLoader(
        transformed, batch_size=500, shuffle=False, drop_last=False,
        cat_names=["user"], cont_names=["price"], label_names=["label"],
    )])
    np.testing.assert_array_equal(np.sort(users), np.sort(ref))
    assert not np.array_equal(users, ref)
