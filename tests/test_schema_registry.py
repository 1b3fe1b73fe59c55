"""DDL-event → StructType decode semantics (reference types.go:51-124;
fixture shapes from FIXTURES.md B1)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import types as T

from gomaxscale_spark.sources.schema_registry import (
    DML_ENVELOPE,
    SchemaDecodeError,
    SchemaRegistry,
    ddl_to_struct,
)

DDL_V1 = {
    "namespace": "MaxScaleChangeDataSchema.avro",
    "type": "record",
    "name": "ChangeRecord",
    "table": "users",
    "database": "example",
    "version": 1,
    "gtid": "0-1-42",
    "fields": [
        {"name": "id", "type": "int", "real_type": "int", "length": -1, "unsigned": False},
        {"name": "name", "type": ["null", "string"], "real_type": "varchar", "length": 255},
        {"name": "email", "type": "string", "real_type": "varchar", "length": 255},
        {"name": "state", "type": {"type": "enum", "name": "state", "symbols": ["active", "blocked"]}},
    ],
}


def test_simple_types_map():
    st = ddl_to_struct(DDL_V1)
    assert st["id"].dataType == T.IntegerType()
    assert st["email"].dataType == T.StringType()


def test_union_null_sets_nullable():
    st = ddl_to_struct(DDL_V1)
    assert st["name"].nullable is True
    assert st["name"].dataType == T.StringType()
    assert st["email"].nullable is False


def test_union_null_last_member():
    st = ddl_to_struct({"fields": [{"name": "x", "type": ["int", "null"]}]})
    assert st["x"].nullable is True and st["x"].dataType == T.IntegerType()


def test_enum_maps_to_string_with_symbols():
    st = ddl_to_struct(DDL_V1)
    f = st["state"]
    assert f.dataType == T.StringType()
    assert f.metadata["enum_symbols"] == ["active", "blocked"]
    assert f.metadata["enum_name"] == "state"


def test_unknown_complex_type_is_error():
    with pytest.raises(SchemaDecodeError):
        ddl_to_struct({"fields": [{"name": "x", "type": {"type": "map", "values": "int"}}]})


def test_invalid_union_member_is_error():
    with pytest.raises(SchemaDecodeError):
        ddl_to_struct({"fields": [{"name": "x", "type": ["null", 42]}]})


def test_metadata_carry():
    st = ddl_to_struct(DDL_V1)
    assert st["name"].metadata["real_type"] == "varchar"
    assert st["name"].metadata["length"] == 255


def test_unsigned_widens():
    st = ddl_to_struct(
        {
            "fields": [
                {"name": "a", "type": "int", "unsigned": True},
                {"name": "b", "type": "long", "unsigned": True},
            ]
        }
    )
    assert st["a"].dataType == T.LongType()
    assert st["b"].dataType == T.DecimalType(20, 0)


def test_unknown_primitive_falls_back_to_string():
    st = ddl_to_struct({"fields": [{"name": "x", "type": "decimal"}]})
    assert st["x"].dataType == T.StringType()
    assert st["x"].metadata["avro_type"] == "decimal"


def test_registry_versioning_and_pinning():
    reg = SchemaRegistry()
    reg.register(DDL_V1)
    v2 = dict(DDL_V1, version=2)
    v2["fields"] = DDL_V1["fields"] + [{"name": "age", "type": ["null", "int"]}]
    reg.register(json.dumps(v2))  # raw JSON accepted too

    assert reg.versions("example", "users") == [1, 2]
    assert "age" not in reg.schema("example", "users", version=1).fieldNames()
    assert "age" in reg.schema("example", "users").fieldNames()  # latest


def test_full_dml_schema_prepends_envelope():
    reg = SchemaRegistry()
    reg.register(DDL_V1)
    full = reg.full_dml_schema("example", "users")
    names = full.fieldNames()
    assert names[: len(DML_ENVELOPE.fields)] == DML_ENVELOPE.fieldNames()
    assert "email" in names
