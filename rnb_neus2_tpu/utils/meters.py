"""EMA meters and a tiny logger (reference: Ema in common.h:245+, tinylogger;
Python SimpleLogger in rnb_neus2/pipeline.py:15-24)."""

from __future__ import annotations

import math
import sys
import time


class Ema:
    """Half-life based exponential moving average (common.h EEmaType)."""

    def __init__(self, half_life_steps: float = 50.0):
        self.alpha = 0.5 ** (1.0 / max(half_life_steps, 1e-9))
        self.value = 0.0
        self._initialized = False

    def update(self, x: float) -> float:
        if not self._initialized:
            self.value = float(x)
            self._initialized = True
        else:
            self.value = self.alpha * self.value + (1 - self.alpha) * float(x)
        return self.value

    def set(self, x: float):
        self.value = float(x)
        self._initialized = True


class Logger:
    """[INFO]/[WARN]/[ERROR]-prefixed logger matching the pipeline's."""

    def __init__(self, stream=None):
        self.stream = stream or sys.stdout

    def _emit(self, tag, msg):
        print(f"[{tag}] {msg}", file=self.stream, flush=True)

    def info(self, msg):
        self._emit("INFO", msg)

    def warning(self, msg):
        self._emit("WARN", msg)

    def error(self, msg):
        self._emit("ERROR", msg)


class StageTimer:
    """Wall-clock EMA per named stage (reference: m_training_prep_ms etc.,
    testbed.h:863-871)."""

    def __init__(self):
        self.meters = {}

    def observe(self, name: str, ms: float):
        self.meters.setdefault(name, Ema()).update(ms)

    def summary(self) -> dict:
        return {k: v.value for k, v in self.meters.items()}
