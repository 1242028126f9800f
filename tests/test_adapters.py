"""Source-adapter seam (S1): local roundtrip, registry, env gating."""

from __future__ import annotations

import pytest

from uofi_payroll_etl_main_spark.adapters import (
    BoxAdapter,
    LocalAdapter,
    SourceAdapter,
    adapter_catalog,
    get_adapter,
    register_adapter,
)


def test_local_adapter_roundtrip(tmp_path):
    a = LocalAdapter(str(tmp_path))
    a.put_bytes("sub/x.csv", b"h\n1\n")
    assert a.open_bytes("sub/x.csv") == b"h\n1\n"
    entries = list(a.list_entries())
    assert [e["file_id"] for e in entries] == ["sub/x.csv"]
    assert entries[0]["extension"] == ".csv"
    assert entries[0]["size_bytes"] == 4


def test_adapter_catalog_schema(spark, tmp_path):
    a = LocalAdapter(str(tmp_path))
    a.put_bytes("a.txt", b"hi")
    cat = adapter_catalog(spark, a)
    assert cat.columns == [
        "file_name", "file_path", "extension", "file_id",
        "size_bytes", "modified_at", "created_at",
    ]
    assert cat.count() == 1


def test_registry_constructs_by_name(tmp_path):
    a = get_adapter("local", root=str(tmp_path))
    assert isinstance(a, LocalAdapter)


def test_registry_unknown_name_lists_known():
    with pytest.raises(KeyError) as ei:
        get_adapter("gopher")
    assert "local" in str(ei.value)


def test_registry_custom_adapter():
    class Fake(SourceAdapter):
        def list_entries(self):
            return iter(())

    register_adapter("fake-test", lambda: Fake())
    assert isinstance(get_adapter("fake-test"), Fake)


def test_box_adapter_gates_on_missing_credentials():
    with pytest.raises(NotImplementedError) as ei:
        BoxAdapter("0", env={})
    assert "BOX_CLIENT_ID" in str(ei.value)


def test_box_adapter_gates_on_missing_sdk():
    fake_env = {
        "BOX_CLIENT_ID": "x", "BOX_CLIENT_SECRET": "y", "BOX_ENTERPRISE_ID": "z",
    }
    with pytest.raises(NotImplementedError) as ei:
        BoxAdapter("0", env=fake_env)
    assert "boxsdk" in str(ei.value)
