"""Iceberg storage adapter: interface parity + honest degradation (the
sandbox has no Iceberg runtime, so runtime behavior is validated on the
probe/raise path and the adapter's method surface against IndexStorage)."""

import inspect

import pytest

from tantiny_spark.storage import IndexStorage
from tantiny_spark.storage_iceberg import IcebergIndexStorage, iceberg_available


def test_probe_false_without_runtime(spark):
    assert iceberg_available(spark) is False
    assert iceberg_available(spark, "nonexistent_catalog") is False


def test_constructor_raises_without_runtime(spark):
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        IcebergIndexStorage(spark, "tantiny_idx")


def test_interface_parity():
    """Every IndexStorage method the Index/Snapshot layer calls exists on
    the adapter with a compatible (self-excluded) signature, so swapping
    storage backends is a constructor-arg change."""
    for name in ("current_version", "read_manifest", "commit",
                 "write_segment", "load_segment"):
        base = inspect.signature(getattr(IndexStorage, name))
        adapted = inspect.signature(getattr(IcebergIndexStorage, name))
        base_params = [p for p in base.parameters if p != "self"]
        adapted_params = [p for p in adapted.parameters if p != "self"]
        # the adapter may narrow defaults but must accept the same
        # positional call shape
        assert adapted_params[: len(base_params)] == base_params, name
