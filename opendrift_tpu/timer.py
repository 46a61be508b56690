"""Hierarchical wall-clock timers.

TPU-aware equivalent of the reference's ``Timeable`` mixin (reference:
opendrift/timer.py:4-34).  Categories nest with ``:`` separators, e.g.
``main loop:readers:norkyst``.  Because JAX dispatch is asynchronous, timed
sections that end at a device boundary should call
``jax.block_until_ready`` on their result before ``timer_end`` for the
numbers to be meaningful; the run loop in this package does so at output
boundaries only, so per-step categories measure *dispatch* cost while the
top-level category measures true wall clock.
"""

import time
from collections import OrderedDict


class Timeable:
    """Mixin providing nested named timers and a text report."""

    @property
    def timers(self):
        if not hasattr(self, "_timers"):
            self._timers = OrderedDict()
        return self._timers

    @property
    def _timer_start_times(self):
        if not hasattr(self, "_timer_starts"):
            self._timer_starts = {}
        return self._timer_starts

    def timer_start(self, category):
        if category not in self.timers:
            self.timers[category] = 0.0
        self._timer_start_times[category] = time.perf_counter()

    def timer_end(self, category):
        start = self._timer_start_times.pop(category, None)
        if start is not None:
            self.timers[category] += time.perf_counter() - start

    def performance(self):
        """Return a text report of accumulated timers (indented by nesting)."""
        lines = []
        for cat, secs in self.timers.items():
            parts = cat.split(":")
            indent = "    " * (len(parts) - 1)
            lines.append(f"{secs:10.1f} {indent}{parts[-1]}")
        return "\n".join(lines) + "\n"
