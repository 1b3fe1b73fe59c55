"""DDL-event → Spark StructType conversion + versioned schema registry.

Re-expresses the reference's Avro-ish field decode
(/root/reference/types.go:51-124) in Spark's type system per the
mapping in SURVEY.md §1.4:

- simple Avro primitive names → Spark atomic types;
- union arrays: a ``"null"`` member ⇒ nullable; the effective type is
  the last non-null member (the reference keeps the *last* member it
  sees — types.go:74-87 — we skip the "null" literal when it is last,
  which is the only sane reading for ["int","null"]);
- enums {type:"enum", name, symbols} → StringType, symbols carried in
  field metadata (+ a domain-check helper);
- unknown complex types → error (types.go:115-117);
- real_type / length / unsigned carried losslessly in field metadata;
  unsigned integers widen (int→long, long→decimal(20,0)) since Spark
  has no unsigned types.

The registry keys schemas by (database, table, version) — the
subscription coordinates of the reference (gomaxscale.go:96-107) — and
serves "latest or pinned" lookups (gomaxscale_options.go:84-88).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field
from typing import Any

from pyspark.sql import types as T

#: Avro primitive → Spark type (public MaxScale avrorouter surface).
AVRO_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}

#: Widening for unsigned MariaDB integers (no unsigned types in Spark).
UNSIGNED_WIDEN: dict[str, T.DataType] = {
    "int": T.LongType(),
    "long": T.DecimalType(20, 0),
}

#: Fixed envelope of every DML event (/root/reference/types.go:172-179);
#: (domain, server_id, sequence, event_number) is the GTID/binlog
#: position = the stream offset; timestamp is epoch seconds.
DML_ENVELOPE = T.StructType(
    [
        T.StructField("domain", T.IntegerType(), True),
        T.StructField("server_id", T.IntegerType(), True),
        T.StructField("sequence", T.IntegerType(), True),
        T.StructField("event_number", T.IntegerType(), True),
        T.StructField("timestamp", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
    ]
)


class SchemaDecodeError(ValueError):
    pass


def _decode_field(f: dict[str, Any]) -> T.StructField:
    name = f.get("name")
    if not isinstance(name, str):
        raise SchemaDecodeError(f"field without a string name: {f!r}")
    ftype = f.get("type")
    nullable = False
    metadata: dict[str, Any] = {}
    for carry in ("real_type", "length", "unsigned"):
        if f.get(carry) is not None:
            metadata[carry] = f[carry]

    if isinstance(ftype, str):
        type_name = ftype
    elif isinstance(ftype, list):
        type_name = ""
        for member in ftype:
            if not isinstance(member, str):
                raise SchemaDecodeError(f"invalid union member of type {type(member).__name__}")
            if member.lower() == "null":
                nullable = True
            else:
                type_name = member
        if not type_name:
            raise SchemaDecodeError(f"union with no concrete type: {ftype!r}")
    elif isinstance(ftype, dict):
        complex_type = str(ftype.get("type", "")).lower()
        if complex_type != "enum":
            raise SchemaDecodeError(f"unknown complex type {complex_type!r} in {ftype!r}")
        if "name" not in ftype:
            raise SchemaDecodeError(f"enum without a name: {ftype!r}")
        symbols = ftype.get("symbols")
        if not isinstance(symbols, list) or not all(isinstance(s, str) for s in symbols):
            raise SchemaDecodeError(f"enum with invalid symbols: {ftype!r}")
        metadata["enum_name"] = ftype["name"]
        metadata["enum_symbols"] = symbols
        return T.StructField(name, T.StringType(), nullable, metadata=metadata)
    else:
        raise SchemaDecodeError(f"unknown type {type(ftype).__name__!r} in column definition")

    spark_type = AVRO_TO_SPARK.get(type_name.lower())
    if spark_type is None:
        # the reference accepts any primitive name string (types.go:85);
        # map unknowns to string rather than failing the stream
        spark_type = T.StringType()
        metadata["avro_type"] = type_name
    if metadata.get("unsigned") and type_name.lower() in UNSIGNED_WIDEN:
        spark_type = UNSIGNED_WIDEN[type_name.lower()]
    return T.StructField(name, spark_type, nullable, metadata=metadata)


def ddl_to_struct(ddl_event: dict[str, Any] | str | bytes) -> T.StructType:
    """Convert one DDL event (dict or raw JSON) to the payload StructType."""
    if isinstance(ddl_event, (str, bytes)):
        ddl_event = json.loads(ddl_event)
    fields = ddl_event.get("fields")
    if not isinstance(fields, list):
        raise SchemaDecodeError("ddl event has no fields array")
    return T.StructType([_decode_field(f) for f in fields])


@dataclass
class SchemaVersion:
    database: str
    table: str
    version: int
    gtid: str
    struct: T.StructType


@dataclass
class SchemaRegistry:
    """Versioned schema registry keyed by (database, table, version)."""

    _versions: dict[tuple[str, str, int], SchemaVersion] = dc_field(default_factory=dict)

    def register(self, ddl_event: dict[str, Any] | str | bytes) -> SchemaVersion:
        if isinstance(ddl_event, (str, bytes)):
            ddl_event = json.loads(ddl_event)
        sv = SchemaVersion(
            database=ddl_event.get("database", ""),
            table=ddl_event.get("table", ""),
            version=int(ddl_event.get("version", 1)),
            gtid=ddl_event.get("gtid", ""),
            struct=ddl_to_struct(ddl_event),
        )
        self._versions[(sv.database, sv.table, sv.version)] = sv
        return sv

    def schema(self, database: str, table: str, version: int | None = None) -> T.StructType:
        """Pinned version, or the latest registered one (version=None)."""
        if version is not None:
            return self._versions[(database, table, version)].struct
        matching = [
            sv for (db, tb, _), sv in self._versions.items() if db == database and tb == table
        ]
        if not matching:
            raise KeyError(f"no schema registered for {database}.{table}")
        return max(matching, key=lambda sv: sv.version).struct

    def versions(self, database: str, table: str) -> list[int]:
        return sorted(
            v for (db, tb, v) in self._versions if db == database and tb == table
        )

    def full_dml_schema(
        self, database: str, table: str, version: int | None = None
    ) -> T.StructType:
        """Envelope + payload columns — the from_json target for RawData
        (C3 typed projection; payload fields ride in the same JSON object
        as the envelope, FIXTURES.md B2)."""
        payload = self.schema(database, table, version)
        return T.StructType(list(DML_ENVELOPE.fields) + list(payload.fields))


def enum_domain_check(col_name: str, symbols: list[str]):
    """Boolean Column: value ∈ enum symbols (NULL passes, like SQL)."""
    from pyspark.sql import functions as F

    c = F.col(col_name)
    return c.isNull() | c.isin(*symbols)
