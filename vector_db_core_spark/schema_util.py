"""Schema reflection — the `#[derive(CheckDynamicSize)]` analog (M1).

The reference's proc-macro classifies each struct field as fixed-size
(ints, bool — /root/reference/tools/dynamic-vector-macro/src/lib.rs:
133-142) vs dynamic-size (str/String/Vec/slices — :144-150) and
generates ``is_dynamic_structure / get_dynamic_fields /
get_dynamic_values / get_dynamic_map`` reflection (:159-194, trait at
tools/dynamic-vector/src/traits.rs:1-10). The classification decided
which physical layout a record could use (fixed-slot vs
offset-indexed).

On Spark the same question is answered from ``df.schema`` at runtime:
variable-width Catalyst types (string/binary/array/map/struct) are the
"dynamic" fields. Parquet subsumes the layout decision per column, so
this surface is introspection-only — but it's the exact information a
storage planner would use (e.g. dictionary/RLE candidates vs plain
fixed-width encodings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DataType,
    MapType,
    StringType,
    StructType,
)

#: Catalyst types with variable-width encodings — the Spark analog of
#: the macro's dynamic classification (lib.rs:144-150).
_DYNAMIC_TYPES = (StringType, BinaryType, ArrayType, MapType, StructType)


def is_dynamic_type(dt: DataType) -> bool:
    return isinstance(dt, _DYNAMIC_TYPES)


def is_dynamic_structure(df: DataFrame) -> bool:
    """True iff any field is variable-width — `is_dynamic_structure()`
    (lib.rs:161-166). Decides fixed-slot eligibility in the reference;
    here it flags whether a row has a fixed serialized width."""
    return any(is_dynamic_type(f.dataType) for f in df.schema.fields)


def dynamic_fields(df: DataFrame) -> list[str]:
    """Names of variable-width fields — `get_dynamic_fields()` (lib.rs:168-176)."""
    return [f.name for f in df.schema.fields if is_dynamic_type(f.dataType)]


def fixed_fields(df: DataFrame) -> list[str]:
    """Names of fixed-width fields (ints/floats/bool/date/timestamp/decimal)."""
    return [f.name for f in df.schema.fields if not is_dynamic_type(f.dataType)]


def schema_report(df: DataFrame) -> list[dict]:
    """Per-field classification — `get_dynamic_map()`'s role
    (lib.rs:187-192), with Spark type names instead of byte encoders
    (Parquet encodes natively; the macro's `to_bytes_vector` has no
    useful analog)."""
    return [
        {
            "name": f.name,
            "type": f.dataType.simpleString(),
            "nullable": f.nullable,
            "dynamic_size": is_dynamic_type(f.dataType),
        }
        for f in df.schema.fields
    ]
