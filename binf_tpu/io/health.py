"""Device-health canary: verify the compile->execute->fetch round trip.

Failure detection for remote/tunneled accelerators (SURVEY.md section 5: the
reference has none; a production sampler must not silently record garbage).
Observed failure mode of a tunneled TPU backend: the device->host path wedges
so that (a) any ``np.asarray``/``float()`` of a device array blocks forever
in ``jax.Array._value`` and (b) ``block_until_ready`` returns WITHOUT
waiting -- wall-clock "timings" taken in that state are pure dispatch time
and meaningless (observed: a 1.9 ms kernel "measuring" 0.05 ms).

The canary runs the full round trip in a SUBPROCESS because a hung d2h
fetch cannot be interrupted in-process (the runtime lock is held inside the
PJRT client); a subprocess can simply be killed on timeout.

Use :func:`wait_for_device_health` at the top of any benchmark/measurement
entry point; use :func:`device_health_canary` for a one-shot probe.
"""

from __future__ import annotations

import subprocess
import sys
import time

__all__ = ["device_health_canary", "wait_for_device_health"]

_CANARY_CODE = """
import jax{platform_line}
import jax.numpy as jnp
v = float(jax.jit(lambda: jnp.arange(3.0).sum())())
assert v == 3.0, v
print("ok")
"""


def device_health_canary(timeout: float = 90.0, platform: str | None = None) -> bool:
    """One-shot probe: compile + execute + device->host fetch, in a
    subprocess with a hard timeout.  Returns True iff the round trip
    completed and produced the right value.  ``platform`` pins the probe's
    jax platform (e.g. "cpu" in tests) -- by default the subprocess probes
    whatever backend the environment selects (the one being measured)."""
    platform_line = (
        f"; jax.config.update('jax_platforms', {platform!r})" if platform else ""
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CANARY_CODE.format(platform_line=platform_line)],
            capture_output=True,
            timeout=timeout,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "ok" in proc.stdout


def wait_for_device_health(
    max_wait: float = 900.0,
    poll: float = 45.0,
    timeout: float = 90.0,
    log=None,
    platform: str | None = None,
) -> bool:
    """Block until the canary passes or ``max_wait`` elapses.

    Returns True when healthy.  Returns False (after logging) if the device
    never became healthy -- callers should abort their measurement rather
    than record garbage."""
    if log is None:
        log = lambda m: print(m, file=sys.stderr, flush=True)
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        t = time.monotonic()
        if device_health_canary(timeout=timeout, platform=platform):
            if attempt > 1:
                log(f"# device health: recovered after {t - t0:.0f}s "
                    f"({attempt} probes)")
            return True
        waited = time.monotonic() - t0
        if waited >= max_wait:
            log(f"# device health: STILL BROKEN after {waited:.0f}s -- "
                "device->host path is down; refusing to measure")
            return False
        log(f"# device health: round trip failed (probe {attempt}, "
            f"{waited:.0f}s elapsed); retrying in {poll:.0f}s")
        time.sleep(poll)
