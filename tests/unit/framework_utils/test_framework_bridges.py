"""Framework bridges: torch/TF loader adapters, tfrecords converter,
feature-column → workflow conversion, training helpers (reference
tests/unit/loader/* and framework_utils tests)."""

import numpy as np
import pandas as pd
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu.loader import Loader, augment_schema


def _ds(n=600):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 50, n).astype(np.int64),
            "price": rng.normal(0, 1, n).astype(np.float32),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    ds = nvt.Dataset(df, part_size=8 * 1024)
    ds.schema = augment_schema(ds.schema, cats=["user"], conts=["price"], labels=["label"])
    return ds


def test_torch_loader():
    torch = pytest.importorskip("torch")
    from nvtabular_tpu.loader.torch import DLDataLoader, TorchAsyncItr

    itr = TorchAsyncItr(
        _ds(), cats=["user"], conts=["price"], labels=["label"],
        batch_size=128, shuffle=False,
    )
    batches = list(itr)
    feats, labels = batches[0]
    assert isinstance(feats["user"], torch.Tensor)
    assert feats["dense"].shape == (128, 1)
    assert labels.shape == (128,)
    assert sum(len(l) for _, l in batches) == 600
    dl = DLDataLoader(itr)
    assert len(dl) == len(itr)


def test_tf_loader():
    tf = pytest.importorskip("tensorflow")
    from nvtabular_tpu.loader.tensorflow import KerasSequenceLoader

    loader = KerasSequenceLoader(
        _ds(), batch_size=200, label_names=["label"],
        cat_names=["user"], cont_names=["price"], shuffle=False,
    )
    feats, labels = next(iter(loader))
    assert feats["user"].shape == (200,)
    assert feats["price"].dtype.name == "float32"
    assert labels.shape == (200,)


def test_tfrecords_to_parquet(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from nvtabular_tpu.framework_utils import convert_tfrecords_to_parquet

    path = str(tmp_path / "data.tfrecords")
    with tf.io.TFRecordWriter(path) as w:
        for i in range(50):
            ex = tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "uid": tf.train.Feature(int64_list=tf.train.Int64List(value=[i])),
                        "score": tf.train.Feature(float_list=tf.train.FloatList(value=[i * 0.5])),
                        "tags": tf.train.Feature(int64_list=tf.train.Int64List(value=list(range(i % 4)))),
                        "name": tf.train.Feature(bytes_list=tf.train.BytesList(value=[f"u{i}".encode()])),
                    }
                )
            )
            w.write(ex.SerializeToString())
    out = convert_tfrecords_to_parquet([path], str(tmp_path / "pq"))
    assert len(out) == 1
    ds = nvt.Dataset(out)
    table = ds.to_table()
    assert table.num_rows == 50
    assert np.asarray(table["uid"].values).tolist() == list(range(50))
    assert table["tags"].is_list
    assert table["name"].values[3] == "u3"


def test_feature_column_workflow():
    tf = pytest.importorskip("tensorflow")
    from nvtabular_tpu.framework_utils import make_feature_column_workflow

    fc = tf.feature_column
    columns = [
        fc.numeric_column("price"),
        fc.bucketized_column(fc.numeric_column("age"), boundaries=[20.0, 40.0, 60.0]),
        fc.categorical_column_with_vocabulary_list("color", ["red", "green", "blue"]),
        fc.categorical_column_with_hash_bucket("device", hash_bucket_size=10),
        fc.embedding_column(fc.categorical_column_with_identity("uid", num_buckets=100), 8),
    ]
    workflow, out_cols = make_feature_column_workflow(columns, "label")
    rng = np.random.default_rng(0)
    n = 200
    df = pd.DataFrame(
        {
            "price": rng.normal(0, 1, n).astype(np.float32),
            "age": rng.uniform(0, 80, n).astype(np.float32),
            "color": rng.choice(["red", "green", "blue", "pink"], n),
            "device": rng.choice(["a", "b", "c"], n),
            "uid": rng.integers(0, 100, n).astype(np.int64),
            "label": rng.integers(0, 2, n).astype(np.int64),
        }
    )
    out = workflow.fit_transform(nvt.Dataset(df)).to_table().to_pandas()
    assert set(out.columns) == {"price", "age", "color", "device", "uid", "label"}
    assert out["age"].max() <= 3  # 4 buckets
    assert out["color"].max() <= 5  # vocab of 3 + pad/null/oov
    assert out["device"].max() < 10
    np.testing.assert_array_equal(out["uid"], df["uid"])  # identity passthrough


def test_process_epoch_and_auc():
    import jax
    import optax

    from nvtabular_tpu.models import (
        DLRMConfig, dlrm_forward, dlrm_init, dlrm_loss,
        make_step_fns, make_synthetic_batch, process_epoch, roc_auc,
    )

    assert roc_auc(np.array([0, 0, 1, 1]), np.array([0.1, 0.4, 0.35, 0.8])) == 0.75
    assert roc_auc(np.array([0, 1]), np.array([0.5, 0.5])) == 0.5  # ties

    config = DLRMConfig(cardinalities={"a": 64}, num_dense=2, embedding_dim=8,
                        bottom_mlp=(8,), top_mlp=(8,))
    params = dlrm_init(jax.random.PRNGKey(0), config)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    train_step, eval_step = make_step_fns(dlrm_loss, opt, forward_fn=dlrm_forward)
    batches = [
        {k: np.asarray(v) for k, v in make_synthetic_batch(config, 64, seed=s).items()}
        for s in range(4)
    ]
    params, opt_state, m1 = process_epoch(batches, params, opt_state, train_step=train_step)
    assert "loss" in m1
    params, _, m2 = process_epoch(batches, params, opt_state, eval_step=eval_step)
    assert 0.0 <= m2["auc"] <= 1.0
    assert m2["logloss"] > 0
