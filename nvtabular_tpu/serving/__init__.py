"""Serving path: native (C++) hot-path transforms for eager inference.

Equivalent of the reference's ``nvtabular_cpp`` extension
(cpp/nvtabular/inference/ — hooked via ``Operator.inference_initialize``,
reference categorify.py:602-609, fill.py:59-65).
"""

from .native import CategorifyTransform, FillTransform, native_available

__all__ = ["CategorifyTransform", "FillTransform", "native_available"]
