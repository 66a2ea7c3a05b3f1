"""Vector (embedding) columns: the FixedSizeList table property.

The reference declares vector columns via the table property
`vector_columns='embedding:768'` and materializes them as Arrow
`FixedSizeList<float/double>[dim]` (`LanceTableProperties.java:33-57,96-137`,
`LancePageToArrowConverter.java:190-230`), rejecting non-float element types
and wrong-length values (`LancePageToArrowConverter.java:251-269`).

Spark re-expression: the column stays `ArrayType(Float/DoubleType)` (Spark
has no fixed-size list — SURVEY §1.3 "dimension kept as table property") and
the DIMENSION is enforced at write time by wrapping the column in an inline
`assert`-style expression: `CASE WHEN size(c) = dim THEN c ELSE raise_error`.
The check runs inside the same projection as the fragment write — zero extra
scan, fails the write task (and therefore the commit) on the first bad row,
exactly like the reference's FixedSizeList conversion failure."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, FloatType, StructType

VECTOR_PROP = "vector_columns"


def parse_vector_columns(spec: str) -> dict[str, int]:
    """'embedding:64,other:128' → {'embedding': 64, 'other': 128}."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, dim = part.partition(":")
        if not dim.isdigit() or int(dim) <= 0:
            raise ValueError(
                f"vector column spec {part!r} must be '<name>:<positive dim>'"
            )
        out[name.strip()] = int(dim)
    if not out:
        raise ValueError(f"empty vector_columns spec: {spec!r}")
    return out


def validate_vector_schema(schema: StructType, spec: dict[str, int]) -> None:
    """Declared vector columns must exist and be ARRAY(FLOAT)/ARRAY(DOUBLE)
    (`LancePageToArrowConverter.java:251-269`)."""
    by_name = {f.name: f for f in schema.fields}
    for name in spec:
        f = by_name.get(name)
        if f is None:
            raise ValueError(f"vector column {name!r} not in schema")
        dt = f.dataType
        if not (
            isinstance(dt, ArrayType)
            and isinstance(dt.elementType, (FloatType, DoubleType))
        ):
            raise ValueError(
                f"vector column {name!r} must be array<float>/array<double>, "
                f"got {dt.simpleString()}"
            )


def enforce_vector_columns(df: DataFrame, spec: dict[str, int]) -> DataFrame:
    """Wrap each vector column so any row whose length != dim fails the
    write (inline, no extra pass). NULL vectors are allowed (NULLs allowed
    everywhere — SURVEY §1.3)."""
    validate_vector_schema(df.schema, spec)
    for name, dim in spec.items():
        c = F.col(name)
        df = df.withColumn(
            name,
            F.when(c.isNull() | (F.size(c) == dim), c).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"vector column '{name}' requires dimension {dim},"
                            " got "
                        ),
                        F.size(c).cast("string"),
                    )
                )
            ),
        )
    return df


__all__ = [
    "VECTOR_PROP",
    "enforce_vector_columns",
    "parse_vector_columns",
    "validate_vector_schema",
]
