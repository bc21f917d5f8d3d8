"""NaN/null arithmetic helpers.

The engine encodes "no data" as SQL NULL (see SURVEY §4.3 #1): Spark's
aggregate functions skip nulls, which matches the reference's `addNaN`
fold semantics (`atlas-core/.../util/Math.scala:48-52`).  The strict
`:f*` operators propagate missing values like IEEE NaN.

All helpers take/return `pyspark.sql.Column`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# |v| < 1e-12 (or missing) is "false" (Math.scala:28-38)
_ZERO_TOL = 1e-12


def truthy(c: Column) -> Column:
    """Math.toBoolean: NaN and nearly-zero are false (Math.scala:35-38)."""
    return F.when(c.isNull(), F.lit(False)).otherwise(F.abs(c) >= _ZERO_TOL)


def add_nan(a: Column, b: Column) -> Column:
    """addNaN: missing counts as 0 unless both missing (Math.scala:48-50)."""
    return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(a + b)


def subtract_nan(a: Column, b: Column) -> Column:
    """subtractNaN = addNaN(a, -b) (Math.scala:53)."""
    return add_nan(a, -b)


def max_nan(a: Column, b: Column) -> Column:
    return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(F.greatest(a, b))


def min_nan(a: Column, b: Column) -> Column:
    return F.when(a.isNull(), b).when(b.isNull(), a).otherwise(F.least(a, b))


def binary_op(op: str, a: Column, b: Column) -> Column:
    """Pointwise binary op table (MathExpr.scala:578-710)."""
    if op == "add":
        return add_nan(a, b)
    if op == "sub":
        return subtract_nan(a, b)
    if op == "mul":
        return a * b  # strict: NaN propagates (MathExpr.scala:594-597)
    if op == "div":
        # 0/0 -> 0, x/0 -> NaN, strict NaN propagation otherwise
        # (MathExpr.scala:599-622)
        return (
            F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
            .when((b == 0.0) & (a == 0.0), F.lit(0.0))
            .when(b == 0.0, F.lit(None).cast("double"))
            .otherwise(a / b)
        )
    if op == "pow":
        # java Math.pow: pow(x, 0) == 1 even for NaN x (MathExpr.scala:624-635)
        return F.when(b == 0.0, F.lit(1.0)).otherwise(F.pow(a, b))
    if op in ("gt", "ge", "lt", "le"):
        # strict java comparison: NaN compares false -> 0.0
        cmp = {"gt": a > b, "ge": a >= b, "lt": a < b, "le": a <= b}[op]
        return F.coalesce(cmp.cast("double"), F.lit(0.0))
    if op == "fadd":
        return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(a + b)
    if op == "fsub":
        return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(a - b)
    if op == "fmul":
        return a * b
    if op == "fdiv":
        # Reference FDivide is raw IEEE v1/v2 (MathExpr.scala:686-692), but
        # Spark's Divide returns NULL for a zero divisor regardless of type
        # (non-ANSI), so the zero-divisor cases need explicit handling:
        # x/0 = ±Infinity by the sign of x; 0/0 = NaN (NULL in our encoding).
        inf = F.lit(float("inf"))
        return (
            F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
            .when((b == 0.0) & (a > 0.0), inf)
            .when((b == 0.0) & (a < 0.0), -inf)
            .when(b == 0.0, F.lit(None).cast("double"))
            .otherwise(a / b)
        )
    if op == "and":
        return (truthy(a) & truthy(b)).cast("double")
    if op == "or":
        return (truthy(a) | truthy(b)).cast("double")
    raise ValueError(f"unknown binary op {op}")


def unary_op(op: str, c: Column, param: float | None = None) -> Column:
    """Unary op table (MathExpr.scala:310-454); nulls propagate (NaN in -> NaN out)."""
    if op == "abs":
        return F.abs(c)
    if op == "neg":
        return -c
    if op == "sin":
        return F.sin(c)
    if op == "sqrt":
        return F.sqrt(c)
    if op == "clamp-min":
        # v < min -> min; NaN stays NaN (MathExpr.scala:310-338)
        return F.when(c.isNull(), c).otherwise(F.greatest(c, F.lit(float(param))))
    if op == "clamp-max":
        return F.when(c.isNull(), c).otherwise(F.least(c, F.lit(float(param))))
    raise ValueError(f"unknown unary op {op}")
