"""Steady-state device timing for tunneled TPU hosts.

Every dispatch on an axon-tunneled chip pays ~25 ms of fixed RPC latency,
so timing a single call conflates link latency with device time. The
honest throughput measurement enqueues M independent runs back-to-back
and forces completion of the LAST output with a device-to-host read —
device execution is ordered, so that read bounds all M runs. See
PERFORMANCE.md "Dispatch latency vs device time".
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np


def steady_state(launch: Callable[[int], object], m_pipe: int = 8,
                 rounds: int = 3) -> float:
    """Best-of-``rounds`` steady-state seconds per task.

    ``launch(i)`` must enqueue task ``i`` and return a device array from
    it (NOT call ``block_until_ready`` — that would serialize the pipe).
    The caller is responsible for one warmup ``launch`` + D2H read first,
    so compilation stays out of the timing.
    """
    times = []
    for r in range(rounds):
        t0 = time.perf_counter()
        out = None
        for i in range(m_pipe):
            out = launch(r * m_pipe + i)
        np.asarray(out)  # D2H read: forces true completion of all m_pipe
        times.append((time.perf_counter() - t0) / m_pipe)
    return min(times)
