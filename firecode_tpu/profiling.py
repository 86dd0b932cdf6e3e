"""Lightweight run profiling: named timers + end-of-run report.

Replaces the reference's ad-hoc timing wrappers and checkpoint speedup
reports (firecode/utils.py:457-491, firecode/embedder.py:2233-2252) with a
process-global registry the driver can render at termination.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@dataclass
class _Entry:
    total: float = 0.0
    count: int = 0


@dataclass
class Profiler:
    entries: dict[str, _Entry] = field(default_factory=dict)
    t_start: float = field(default_factory=time.perf_counter)

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            entry = self.entries.setdefault(name, _Entry())
            entry.total += time.perf_counter() - t0
            entry.count += 1

    def add(self, name: str, seconds: float) -> None:
        entry = self.entries.setdefault(name, _Entry())
        entry.total += seconds
        entry.count += 1

    def report(self) -> str:
        if not self.entries:
            return ""
        elapsed = time.perf_counter() - self.t_start
        lines = ["--> Timing breakdown:"]
        pad = max(len(k) for k in self.entries)
        for name, entry in sorted(
            self.entries.items(), key=lambda kv: -kv[1].total
        ):
            share = 100.0 * entry.total / max(elapsed, 1e-9)
            lines.append(
                f"    {name:<{pad}} {entry.total:8.2f} s  x{entry.count:<4} ({share:4.1f}%)"
            )
        lines.append(f"    {'total elapsed':<{pad}} {elapsed:8.2f} s")
        return "\n".join(lines)

    def reset(self) -> None:
        self.entries.clear()
        self.t_start = time.perf_counter()


profiler = Profiler()


def loadbar(iteration: int, total: int, prefix: str = "", width: int = 30) -> None:
    """Terminal progress bar (reference firecode/utils.py:202): overwrites the
    current line; prints a newline when complete. No-op for total <= 0."""
    import sys

    if total <= 0:
        return
    frac = min(max(iteration / total, 0.0), 1.0)
    filled = int(width * frac)
    bar = "#" * filled + "-" * (width - filled)
    end = "\n" if iteration >= total else "\r"
    sys.stdout.write(f"\r{prefix} |{bar}| {100.0 * frac:5.1f}%{end}")
    sys.stdout.flush()


def eta_report(done: int, total: int, elapsed_s: float) -> str:
    """Progress line with average time per item and ETA (reference
    firecode/embedder.py:2233-2252 checkpoint reports)."""
    avg = elapsed_s / max(done, 1)
    eta = avg * (total - done)
    return (
        f"{done}/{total} structures done ({avg:.3f} s/structure avg, "
        f"ETA {eta:.0f} s)"
    )
