"""Failure detection: NaN / blow-up watchdog with auto-recovery.

The reference has no failure handling beyond exit-on-failure allocation
wrappers (``/root/reference/src/errorfunc.cpp:8-31``); a diverging run
produces NaN positions silently.  Here the runner checks cheap invariants at
every output boundary and can roll back to the last good checkpoint:

* finite positions/velocities,
* max speed below a CFL-style bound (c0-scaled),
* neighbor-count / cell-occupancy sanity.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


@dataclasses.dataclass
class WatchdogConfig:
    max_speed_factor: float = 2.0  # x the fastest sound speed in the case
    enabled: bool = True


@dataclasses.dataclass
class WatchdogReport:
    ok: bool
    reason: str = ""
    max_speed: float = 0.0


def sound_speed_bound(cfg) -> float:
    """Fastest acoustic speed over fluid/solid types: sqrt(K/rho) and
    sqrt(E/rho)."""
    best = 0.0
    for t in range(len(cfg.density)):
        rho = cfg.density[t]
        if rho <= 0:
            continue
        best = max(best, math.sqrt(cfg.bulk_modulus[t] / rho))
        if cfg.young_modulus[t] > 0:
            best = max(best, math.sqrt(cfg.young_modulus[t] / rho))
    return best if best > 0 else 1.0


def check_state(pos, vel, valid_mask, *, speed_limit: float) -> WatchdogReport:
    pos = np.asarray(pos)[valid_mask]
    vel = np.asarray(vel)[valid_mask]
    if not np.isfinite(pos).all():
        return WatchdogReport(False, "non-finite positions")
    if not np.isfinite(vel).all():
        return WatchdogReport(False, "non-finite velocities")
    max_speed = float(np.sqrt((vel * vel).sum(axis=1)).max()) if vel.size else 0.0
    if max_speed > speed_limit:
        return WatchdogReport(
            False, f"max speed {max_speed:.3g} exceeds limit {speed_limit:.3g}",
            max_speed,
        )
    return WatchdogReport(True, "", max_speed)
