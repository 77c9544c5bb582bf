import numpy as np
import pytest

import nvtabular_tpu as nvt
from nvtabular_tpu import dtypes as md
from nvtabular_tpu.schema import ColumnSchema, Schema
from nvtabular_tpu.selector import ColumnSelector
from nvtabular_tpu.tags import Tags, TagSet


def test_tagset_compound_and_conflicts():
    ts = TagSet([Tags.USER_ID])
    assert Tags.USER in ts and Tags.ID in ts
    with pytest.raises(ValueError):
        TagSet([Tags.CATEGORICAL, Tags.CONTINUOUS])


def test_dtype_normalize():
    assert md.normalize(np.dtype("int32")) is md.int32
    assert md.normalize("float32") is md.float32
    assert md.normalize(np.float64) is md.float64
    assert md.normalize(str) is md.string
    assert md.normalize(None) is md.unknown


def test_column_schema_builders():
    cs = ColumnSchema("a", dtype="int64", tags=[Tags.CATEGORICAL])
    cs2 = cs.with_dtype("float32").with_tags(["custom"]).with_properties({"p": 1})
    assert cs2.dtype is md.float32
    assert "custom" in cs2.tags and Tags.CATEGORICAL in cs2.tags
    assert cs2.properties["p"] == 1
    assert cs.dtype is md.int64  # original untouched


def test_list_schema_value_count():
    cs = ColumnSchema("g", dtype="int64", is_list=True)
    assert cs.is_list and cs.is_ragged
    cs2 = cs.with_properties({"value_count": {"min": 3, "max": 3}})
    assert not cs2.is_ragged
    assert cs2.shape.dims[1].max == 3


def test_schema_select():
    schema = Schema(
        [
            ColumnSchema("a", tags=[Tags.CATEGORICAL]),
            ColumnSchema("b", tags=[Tags.CONTINUOUS]),
            ColumnSchema("c", tags=[Tags.CONTINUOUS, Tags.TARGET]),
        ]
    )
    assert schema.select_by_tag(Tags.CONTINUOUS).column_names == ["b", "c"]
    assert schema.select_by_name(["c", "a"]).column_names == ["c", "a"]
    assert (schema - schema.select_by_name("a")).column_names == ["b", "c"]
    assert schema.excluding_by_tag(Tags.TARGET).column_names == ["a", "b"]


def test_selector_grouping():
    sel = ColumnSelector([["a", "b"], "c"])
    assert sel.names == ["a", "b", "c"]
    assert sel.grouped_names == ["c", ("a", "b")] or sel.grouped_names == [("a", "b"), "c"]
    combined = sel + ColumnSelector(["d"])
    assert "d" in combined.names


def test_selector_tag_resolution():
    schema = Schema(
        [
            ColumnSchema("a", tags=[Tags.CATEGORICAL]),
            ColumnSchema("b", tags=[Tags.CONTINUOUS]),
        ]
    )
    sel = ColumnSelector(tags=[Tags.CATEGORICAL])
    assert sel.resolve(schema).names == ["a"]
    schema_sel = schema.apply(sel)
    assert schema_sel.column_names == ["a"]


def test_schema_serialization_roundtrip():
    schema = Schema(
        [
            ColumnSchema("a", dtype="int64", tags=[Tags.CATEGORICAL], properties={"domain": {"min": 0, "max": 10}}),
            ColumnSchema("g", dtype="float32", is_list=True),
        ]
    )
    rt = Schema.from_dict(schema.to_dict())
    assert rt == schema


def test_utils_and_dispatch_compat():
    """Reference merlin.core surface parity (utils + dispatch shims)."""
    import numpy as np

    from nvtabular_tpu import dispatch, utils
    from nvtabular_tpu.table import Column, TableBatch

    assert utils.device_mem_size(cpu=True) > 0
    assert utils.device_mem_size() > 0
    utils.set_dask_client("x")
    assert utils.global_dask_client() == "x"
    assert utils.run_on_worker(lambda a: a + 1, 41) == 42
    with utils.Serial():
        pass
    with utils.Distributed(axes={"data": -1}) as d:
        assert d.mesh.shape["data"] >= 1

    tb = dispatch.make_df({"a": [1, 2, 3]})
    assert dispatch.is_dataframe_object(tb)
    assert dispatch.is_series_object(dispatch.make_series([1.0, 2.0]))
    assert dispatch.is_cpu_object(tb)
    assert dispatch.detect_format(tb) == "table"
    import pandas as pd

    assert dispatch.detect_format(pd.DataFrame({"a": [1]})) == "pandas"
    back = dispatch.convert_data(pd.DataFrame({"a": [1, 2]}))
    assert back.num_rows == 2
    rng = dispatch.random_state(0)
    assert rng.integers(0, 10) == dispatch.random_state(0).integers(0, 10)
