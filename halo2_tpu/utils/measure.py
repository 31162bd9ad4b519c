"""Env-gated timing spans and kernel-time counters.

Replaces the reference's measurement harness (`plonk.rs:48-140`:
`start_measure`/`stop_measure` with a global indent counter printed under
MEASURE=1, `log_info` under INFO=1, and the unsafe FFT_TOTAL_TIME /
MULTIEXP_TOTAL_TIME globals reset per proof, `poly/domain.rs:21`,
`arithmetic.rs:39`).

TPU-native additions: spans also emit `jax.profiler` named traces (so the
same instrumentation shows up in TensorBoard profiles), and the counters
are thread-safe.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager

_state = threading.local()
_totals_lock = threading.Lock()
_totals = {"fft": 0.0, "msm": 0.0}
_records: dict = {}  # span name -> accumulated wall seconds (always on)


def measure_enabled() -> bool:
    return os.environ.get("MEASURE", "0") not in ("", "0")


def info_enabled() -> bool:
    return os.environ.get("INFO", "0") not in ("", "0")


def log_info(msg: str):
    """Gated print (reference plonk.rs:127-140)."""
    if info_enabled():
        print(msg)


def _indent() -> int:
    return getattr(_state, "indent", 0)


@contextmanager
def span(name: str, category: str = None):
    """Wall-clock span, printed with indentation under MEASURE=1 and traced
    via jax.profiler; optionally accumulates into a kernel counter
    ('fft' | 'msm')."""
    enabled = measure_enabled()
    if enabled:
        print("  " * _indent() + f"{name} ...")
        _state.indent = _indent() + 1
    start = time.perf_counter()
    try:
        try:
            import jax

            with jax.profiler.TraceAnnotation(name):
                yield
        except ImportError:  # pragma: no cover
            yield
    finally:
        dt = time.perf_counter() - start
        with _totals_lock:
            if category in _totals:
                _totals[category] += dt
            _records[name] = _records.get(name, 0.0) + dt
        if enabled:
            _state.indent = _indent() - 1
            print("  " * _indent() + f"{name}: {dt * 1e3:.2f} ms")


def reset_totals():
    """Reset per-proof kernel totals (reference prover.rs:63-67)."""
    with _totals_lock:
        for k in _totals:
            _totals[k] = 0.0


def reset_records():
    """Clear the per-span-name accumulated wall-clock records."""
    with _totals_lock:
        _records.clear()


def get_records() -> dict:
    """Per-span-name accumulated wall seconds since the last reset.

    Machine-readable counterpart of the MEASURE=1 prints; bench.py attaches
    this as the prover stage breakdown (reference plonk.rs:48-125 span
    placement)."""
    with _totals_lock:
        return dict(_records)


def get_totals() -> dict:
    with _totals_lock:
        return dict(_totals)


def report_totals():
    """Print per-proof totals (reference prover.rs:697-704)."""
    if measure_enabled():
        t = get_totals()
        print(f"FFT total: {t['fft'] * 1e3:.2f} ms; MSM total: {t['msm'] * 1e3:.2f} ms")
