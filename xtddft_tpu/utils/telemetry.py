"""Phase timing telemetry.

Replaces the reference's ad-hoc ``TimeCounter`` attribute bags and printed
breakdowns (`xtddft/XTDA_GPU.py:18-21, 481-499`; sTDA per-stage table
`os_sTDA.py:1319-1332`) with one small context-manager based recorder.
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Accumulating phase timer.

    >>> t = Timer()
    >>> with t("sigma"):
    ...     ...
    >>> print(t.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[phase] = self.totals.get(phase, 0.0) + dt
            self.counts[phase] = self.counts.get(phase, 0) + 1

    @property
    def wall(self) -> float:
        return time.perf_counter() - self._t0

    def report(self) -> str:
        lines = [f"{'phase':<24}{'calls':>7}{'total(s)':>12}{'mean(s)':>12}"]
        for k in self.totals:
            n = self.counts[k]
            lines.append(
                f"{k:<24}{n:>7}{self.totals[k]:>12.4f}{self.totals[k] / n:>12.4f}"
            )
        lines.append(f"{'wall':<24}{'':>7}{self.wall:>12.4f}")
        return "\n".join(lines)
