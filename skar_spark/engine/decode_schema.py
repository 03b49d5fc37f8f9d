"""typecode → Spark DDL mapping for the scan path."""

from __future__ import annotations

_SPARK = {
    "i8": "byte", "i16": "short", "i32": "int", "i64": "long",
    "u8": "short", "u16": "int", "u32": "long", "u64": "long",
    "f32": "float", "f64": "double", "bool": "boolean",
    "date32": "date",
    "str": "string", "lstr": "string", "bin": "binary", "lbin": "binary",
}


def spark_type_for(code: str) -> str:
    if code in _SPARK:
        return _SPARK[code]
    if code.startswith("ts:"):
        return "timestamp"
    raise TypeError(f"no spark type for {code}")


def spark_ddl_for(schema: dict[str, str], columns: list[str]) -> str:
    return ", ".join(f"{c} {spark_type_for(schema[c])}" for c in columns)
