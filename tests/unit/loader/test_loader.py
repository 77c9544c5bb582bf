"""Loader: batch shapes, shuffle determinism, sharding, multihot padding,
and the full ETL → Loader → DLRM training slice (the reference's north-star
pipeline, README.md:33)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import ops
from nvtabular_tpu.loader import Loader, augment_schema
from nvtabular_tpu.tags import Tags


def _dataset(n=1000, seed=0, with_lists=True):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 100, n).astype(np.int64),
            "item": rng.integers(0, 50, n).astype(np.int64),
            "price": rng.normal(0, 1, n).astype(np.float32),
            "score": rng.normal(0, 1, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    if with_lists:
        df["genres"] = [
            list(rng.integers(0, 10, rng.integers(0, 5)).astype(np.int64)) for _ in range(n)
        ]
    ds = nvt.Dataset(df, part_size=16 * 1024)  # force several partitions
    ds.schema = augment_schema(
        ds.schema,
        cats=["user", "item", "genres"] if with_lists else ["user", "item"],
        conts=["price", "score"],
        labels=["label"],
        sparse_names=["genres"] if with_lists else None,
        sparse_max={"genres": 4} if with_lists else None,
    )
    return ds


def test_batch_shapes_and_counts():
    ds = _dataset()
    loader = Loader(ds, batch_size=128, shuffle=False, device=False)
    batches = list(loader)
    assert sum(len(b["label"]) for b in batches) == 1000
    b = batches[0]
    assert b["dense"].shape == (128, 2)
    assert b["user"].shape == (128,)
    assert b["genres__values"].shape == (128, 4)
    assert b["genres__mask"].shape == (128, 4)
    assert b["label"].dtype == np.float32
    # final partial batch kept by default
    assert len(batches) == len(loader) == -(-1000 // 128)


def test_drop_last():
    ds = _dataset()
    loader = Loader(ds, batch_size=128, shuffle=False, drop_last=True, device=False)
    batches = list(loader)
    assert all(len(b["label"]) == 128 for b in batches)
    assert len(batches) == 1000 // 128 == len(loader)


def test_shuffle_deterministic_and_epoch_varying():
    ds = _dataset(with_lists=False)
    l1 = Loader(ds, batch_size=100, shuffle=True, seed=7, device=False)
    l2 = Loader(ds, batch_size=100, shuffle=True, seed=7, device=False)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["user"], b2["user"])
    # second epoch shuffles differently
    b1e2 = next(iter(l1))
    assert not np.array_equal(b1["user"], b1e2["user"])


def test_global_sharding_partitions_rows():
    ds = _dataset(with_lists=False)
    seen = []
    for rank in range(2):
        loader = Loader(
            ds, batch_size=100, shuffle=False, device=False,
            global_size=2, global_rank=rank,
        )
        for b in loader:
            seen.append(b["label"])
    total = sum(len(x) for x in seen)
    assert total == 1000  # all rows covered exactly once across ranks


def test_multihot_padding_matches_offsets():
    ds = _dataset()
    padded = Loader(ds, batch_size=1000, shuffle=False, device=False)
    b = next(iter(padded))
    ragged = Loader(ds, batch_size=1000, shuffle=False, device=False, pad_lists=False)
    br = next(iter(ragged))
    offs = br["genres__offsets"]
    vals = br["genres__values"]
    lengths = offs[1:] - offs[:-1]
    for i in [0, 5, 17, 999]:
        row_vals = vals[offs[i] : offs[i + 1]][:4]
        n = min(int(lengths[i]), 4)
        np.testing.assert_array_equal(b["genres__values"][i, :n], row_vals)
        assert b["genres__mask"][i, :n].sum() == n
        assert b["genres__mask"][i, n:].sum() == 0


def test_etl_loader_dlrm_end_to_end():
    """The minimum end-to-end slice (SURVEY §7): ETL workflow → loader →
    DLRM training step; loss decreases."""
    import jax
    import optax

    from nvtabular_tpu.models import DLRMConfig, dlrm_init, dlrm_loss

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "user": rng.choice(rng.integers(0, 1 << 28, 300), n).astype(np.int64),
            "item": rng.integers(0, 200, n).astype(np.int64),
            "price": rng.normal(5, 2, n),
            "age": rng.normal(30, 8, n),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    cats = ["user", "item"] >> ops.Categorify(freq_threshold=2)
    conts = ["price", "age"] >> ops.FillMissing() >> ops.Normalize()
    wf = nvt.Workflow(cats + conts + (["label"] >> ops.AddTags([Tags.TARGET])))
    ds = nvt.Dataset(df, part_size=32 * 1024)
    transformed = wf.fit_transform(ds)

    config = DLRMConfig.from_schema(
        wf.output_schema, embedding_dim=16, bottom_mlp=(32,), top_mlp=(32,)
    )
    assert set(config.cardinalities) == {"user", "item"}
    assert config.num_dense == 2

    loader = Loader(
        transformed, batch_size=256, shuffle=True, seed=0,
        cat_names=["user", "item"], cont_names=["price", "age"], label_names=["label"],
    )
    params = dlrm_init(jax.random.PRNGKey(0), config)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(dlrm_loss)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(3):
        for batch in loader:
            if len(batch["label"]) != 256:
                continue
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_etl_dlrm_learns_signal():
    """End-to-end learnability: labels depend on a categorical preference
    and a continuous threshold; the full ETL → Loader → DLRM pipeline must
    reach a real AUC (not just decreasing loss)."""
    import jax
    import optax

    from nvtabular_tpu.models import (
        DLRMConfig, dlrm_forward, dlrm_init, dlrm_loss, make_step_fns, process_epoch,
    )

    rng = np.random.default_rng(9)
    n = 8000
    user_pref = rng.normal(0, 1, 500)
    user = rng.integers(0, 500, n)
    price = rng.normal(0, 1, n).astype(np.float32)
    logits = 2.0 * user_pref[user] - 1.5 * price
    label = (logits + rng.normal(0, 0.5, n) > 0).astype(np.int64)
    df = pd.DataFrame({"user": user.astype(np.int64), "price": price, "label": label})

    cats = ["user"] >> ops.Categorify()
    conts = ["price"] >> ops.Normalize()
    wf = nvt.Workflow(cats + conts + (["label"] >> ops.AddTags([Tags.TARGET])))
    transformed = wf.fit_transform(nvt.Dataset(df, part_size=64 * 1024))
    config = DLRMConfig.from_schema(
        wf.output_schema, embedding_dim=16, bottom_mlp=(32,), top_mlp=(32,)
    )

    def batches():
        loader = Loader(
            transformed, batch_size=1024, shuffle=True, seed=0, drop_last=True,
            cat_names=["user"], cont_names=["price"], label_names=["label"],
        )
        return loader

    params = dlrm_init(jax.random.PRNGKey(0), config)
    opt = optax.adam(5e-3)
    opt_state = opt.init(params)
    train_step, eval_step = make_step_fns(dlrm_loss, opt, forward_fn=dlrm_forward)
    for _ in range(6):
        params, opt_state, _ = process_epoch(batches(), params, opt_state, train_step=train_step)
    _, _, metrics = process_epoch(batches(), params, opt_state, eval_step=eval_step)
    assert metrics["auc"] > 0.75, metrics
