"""Write-time shuffle options (reference merlin.io Shuffle enum, used at
reference tests/unit/test_dask_nvt.py:56,109 and bench nvt_etl.py:161)."""

from __future__ import annotations

import enum


class Shuffle(enum.Enum):
    PER_PARTITION = "per_partition"
    PER_WORKER = "per_worker"
    FULL = "full"


def check_shuffle_arg(shuffle):
    if shuffle is None or shuffle is False:
        return None
    if shuffle is True:
        return Shuffle.PER_WORKER
    if isinstance(shuffle, str):
        return Shuffle(shuffle.lower())
    if isinstance(shuffle, Shuffle):
        return shuffle
    raise ValueError(f"Invalid shuffle argument: {shuffle!r}")
