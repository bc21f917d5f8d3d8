"""Graph step-size ladder and auto-step computation.

The reference derives the EFFECTIVE step of a graph from the canvas
width and the time window so each rendered datapoint gets at least one
pixel: `Step.compute` rounds the requested step UP an allowed ladder of
"nice" sizes (divisors of a minute / hour / day), and `GraphConfig`
feeds it `min(max-datapoints, width)` as the pixel budget.

Parity spec (no code reused):
  - ladder + round/compute: atlas-core util/Step.scala:42-83
  - forBlockStep filter:    atlas-core util/Step.scala:89-99
  - wiring + 1440 cap:      atlas-eval graph/GraphConfig.scala:70-82,
                            atlas-eval reference.conf:148 (max-datapoints)

All values here are MILLISECONDS like the reference (the ladder has
sub-second rungs); the engine's second-domain API layer converts at the
boundary.
"""

from __future__ import annotations

ONE_SECOND = 1000
ONE_MINUTE = 60 * ONE_SECOND
ONE_HOUR = 60 * ONE_MINUTE
ONE_DAY = 24 * ONE_HOUR

# graph.max-datapoints (atlas-eval reference.conf:148): the pixel budget
# is min(this, width) so ultra-wide canvases can't explode the row count
MAX_DATAPOINTS = 1440

_DIV60 = (1, 2, 3, 4, 5, 6, 10, 12, 15, 20, 30)

# sub-second sizes, divisors of a minute (s and m), divisors of a day (h)
ALLOWED_STEP_SIZES: tuple[int, ...] = (
    (1, 5, 10, 50, 100, 500)
    + tuple(s * ONE_SECOND for s in _DIV60)
    + tuple(m * ONE_MINUTE for m in _DIV60)
    + tuple(h * ONE_HOUR for h in (1, 2, 3, 4, 6, 8, 12))
)


def _round_to_day_boundary(step: int) -> int:
    return step if step % ONE_DAY == 0 else (step // ONE_DAY) * ONE_DAY + ONE_DAY


class Step:
    """Ladder scoped to one block (storage chunk) step: allowed sizes
    must divide the block step or be whole multiples of it, so every
    effective step lines up with storage cell boundaries."""

    def __init__(self, allowed: tuple[int, ...]):
        self._allowed = allowed

    @classmethod
    def for_block_step(cls, block_step: int) -> "Step":
        return cls(
            tuple(
                s
                for s in ALLOWED_STEP_SIZES
                if (block_step % s == 0 if s <= block_step else s % block_step == 0)
            )
        )

    def round(self, primary: int, step: int) -> int:
        """Round an arbitrary step UP to the next allowed size (never
        below the primary storage step).  Beyond the ladder's top rung,
        round up to a whole-day multiple."""
        need = max(primary, step)
        for s in self._allowed:
            if s >= need:
                return s
        return _round_to_day_boundary(step)

    def compute(self, primary: int, width: int, start: int, end: int) -> int:
        """Effective step for a graph: at least one datapoint per pixel.
        `primary` is the storage (or explicitly requested, pre-rounded)
        step; `width` the pixel budget; start/end the raw window."""
        datapoints = (end - start) // primary
        # ceil-divide, guarded so a window smaller than the primary step
        # can't produce a zero step
        per_pixel = max(1, -(-datapoints // max(1, width)))
        return self.round(primary, per_pixel * primary)
