"""HLL-style distinct-count sketch over max-rho registers.

Register model matches the reference's `:approx-distinct` input
(`MathExpr.scala:1053-1181`): series tagged `distinct=R##` (hex register
index) whose value is the max rho (leading-zero count + 1) seen for that
register in the interval.  The estimator is standard HyperLogLog
(Flajolet et al. 2007): E = alpha_m * m^2 / sum_j 2^-M_j with the
small-range linear-counting correction.

M = 64 registers.  Missing registers count as rho = 0 (2^0 = 1 mass,
and as zeros for linear counting).
"""

from __future__ import annotations

import math

M = 64  # registers
ALPHA = 0.7213 / (1.0 + 1.079 / M)


def cardinality(registers: dict[int, float]) -> float:
    """Estimate from {register index: max rho}; python reference used by
    tests — the engine and oracle compute the identical formula in
    Spark/DuckDB expressions."""
    present = {j: r for j, r in registers.items() if r is not None and r > 0}
    sum_pow = sum(2.0 ** -r for r in present.values()) + (M - len(present))
    zeros = M - len(present)
    e = ALPHA * M * M / sum_pow
    if e <= 2.5 * M and zeros > 0:
        return M * math.log(M / zeros)
    return e


def rho_from_hex(h: str) -> int:
    """rho of a 32-bit value given as 8 hex chars: leading zero bits + 1."""
    v = int(h, 16)
    if v == 0:
        return 33
    return 32 - v.bit_length() + 1
