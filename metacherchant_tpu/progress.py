"""Progress/ETA reporting (itmo:utils/tool/Progress.java:11-72 semantics:
periodic 'N done, M%, ETA' log lines rendered through Tool.showProgress)."""
from __future__ import annotations

import logging
import time

logger = logging.getLogger("metacherchant")


class Progress:
    def __init__(self, total: int | None = None, label: str = "",
                 log_every: int = 2_500_000):
        self.total = total
        self.label = label
        self.done = 0
        self.log_every = log_every
        self._next = log_every
        self.t0 = time.time()

    def update(self, n: int = 1) -> None:
        self.done += n
        if self.done >= self._next:
            self._next += self.log_every
            self.show()

    def show(self) -> None:
        elapsed = time.time() - self.t0
        if self.total:
            frac = self.done / self.total
            eta = elapsed / frac - elapsed if frac > 0 else float("inf")
            logger.info("%s: %d done (%.1f%%), ETA %.0fs",
                        self.label, self.done, 100 * frac, eta)
        else:
            rate = self.done / elapsed if elapsed > 0 else 0
            logger.info("%s: %d done (%.0f/s)", self.label, self.done, rate)
