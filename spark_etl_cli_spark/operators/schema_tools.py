"""Schema-structural operators: flatten, flatten-explode, complex→JSON.

Re-expresses (Spark-first, single-pass selects instead of per-column
rewrites) the reference's structural transforms:

- recursive struct flatten — reference ``core/.../TransformerParser.scala:34-58``
- flatten + explode loop (arrays exploded, structs flattened, until the
  schema is flat) — reference ``core/.../TransformerParser.scala:60-144``
- complex columns → JSON strings for flat sinks — reference
  ``core/.../DataFrameUtils.scala:8-14``

All of these are pure ``df.select`` / ``F.explode`` compositions:
Catalyst sees ordinary projections, so column pruning and pushdown
still apply, and nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_encode_complex(df: DataFrame) -> DataFrame:
    """Serialize every top-level struct/array/map column to a JSON string."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, T.StructType | T.ArrayType | T.MapType):
            cols.append(F.to_json(F.col(f"`{f.name}`")).alias(f.name))
        else:
            cols.append(F.col(f"`{f.name}`"))
    return df.select(*cols)


def _flatten_cols(schema: T.StructType, prefix_path: str = "", prefix_name: str = ""):
    """Yield (column_expr_path, flat_name) for all leaf (non-struct) fields."""
    for f in schema.fields:
        path = f"{prefix_path}`{f.name}`" if not prefix_path else f"{prefix_path}.`{f.name}`"
        name = f.name if not prefix_name else f"{prefix_name}_{f.name}"
        if isinstance(f.dataType, T.StructType):
            yield from _flatten_cols(f.dataType, path, name)
        else:
            yield path, name


def flatten(df: DataFrame) -> DataFrame:
    """Recursively flatten nested structs to top-level ``a_b_c`` columns.

    Arrays/maps are left as-is (matching the reference's ``flatten://``).
    Single ``select`` → one projection node for Catalyst.
    """
    cols = [F.col(path).alias(name) for path, name in _flatten_cols(df.schema)]
    return df.select(*cols)


def _first_array_field(schema: T.StructType) -> str | None:
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            return f.name
    return None


def _has_struct(schema: T.StructType) -> bool:
    return any(isinstance(f.dataType, T.StructType) for f in schema.fields)


def flatten_explode(df: DataFrame, max_iterations: int = 50) -> DataFrame:
    """Flatten structs and explode arrays repeatedly until the schema is flat.

    Equivalent semantics to the reference's ``flatten-explode://`` loop
    (``TransformerParser.scala:60-144``): structs flatten to ``a_b``
    columns; each array column is exploded (one row per element, outer —
    empty arrays keep a null row); arrays-of-struct then flatten on the
    next pass. Bounded by ``max_iterations`` to guard pathological
    schemas.
    """
    for _ in range(max_iterations):
        if _has_struct(df.schema):
            df = flatten(df)
            continue
        arr = _first_array_field(df.schema)
        if arr is None:
            return df
        others = [F.col(f"`{c}`") for c in df.columns if c != arr]
        df = df.select(*others, F.explode_outer(F.col(f"`{arr}`")).alias(arr))
    return df
