"""Device-health canary (io/health.py): subprocess round-trip probe."""

import time

from binf_tpu.io.health import device_health_canary, wait_for_device_health


def test_canary_passes_on_cpu():
    assert device_health_canary(timeout=120.0, platform="cpu")


def test_canary_times_out_cleanly():
    # an impossible timeout must yield False, not hang or raise
    assert device_health_canary(timeout=0.01, platform="cpu") is False


def test_wait_for_health_immediate():
    t0 = time.monotonic()
    ok = wait_for_device_health(
        max_wait=120.0, poll=1.0, timeout=120.0, platform="cpu",
        log=lambda m: None,
    )
    assert ok
    assert time.monotonic() - t0 < 120.0


def test_wait_for_health_gives_up():
    msgs = []
    ok = wait_for_device_health(
        max_wait=0.0, poll=0.1, timeout=0.01, platform="cpu",
        log=msgs.append,
    )
    assert ok is False
    assert any("BROKEN" in m for m in msgs)
