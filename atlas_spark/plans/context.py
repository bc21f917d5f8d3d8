"""Evaluation context — the step grid.

Mirrors `atlas-core/.../model/EvalContext.scala:24-78`: a query is always
evaluated on a fixed grid `[start, end)` with step `step`.  The reference
uses epoch milliseconds; this engine canonicalizes to epoch **seconds**
(column `t`), which is exact in both Spark and DuckDB integer arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EvalContext:
    start: int  # epoch seconds, inclusive, step aligned
    end: int  # epoch seconds, exclusive
    step: int  # seconds

    def __post_init__(self):
        assert self.start % self.step == 0, "start must be step aligned"
        assert self.end > self.start

    @property
    def n_steps(self) -> int:
        return (self.end - self.start) // self.step

    def with_offset(self, steps: int) -> "EvalContext":
        """Shifted context for `:offset` reads (MemoryDatabase.scala:288-297)."""
        d = steps * self.step
        return EvalContext(self.start - d, self.end - d, self.step)
