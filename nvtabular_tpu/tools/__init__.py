"""Tools: synthetic data generation, dataset inspection, safe serialization.

Re-designs the reference's tools layer (nvtabular/tools/: data_gen.py,
dataset_inspector.py, inspector_script.py, serialization.py).
"""

from .data_gen import (
    CatCol,
    Col,
    ContCol,
    DatasetGen,
    LabelCol,
    PowerLawDistro,
    UniformDistro,
    cols_from_schema,
)
from .dataset_inspector import DatasetInspector

__all__ = [
    "CatCol",
    "Col",
    "ContCol",
    "DatasetGen",
    "DatasetInspector",
    "LabelCol",
    "PowerLawDistro",
    "UniformDistro",
    "cols_from_schema",
]
