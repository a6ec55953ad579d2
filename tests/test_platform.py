"""utils/platform.py: bounded first contact with the device backend.

The axon TPU relay hangs ``jax.devices()`` forever when it is down
(CLAUDE.md); driver-facing entry points bound that first contact via
``probe_devices_or_exit`` so an outage becomes a fast exit(17) with a
diagnostic rather than an indefinite hang.  These tests exercise the
timeout machinery with injected probes — no relay involved.
"""

import time

import pytest

import aaclip_tpu.utils.platform as platform_mod
from aaclip_tpu.utils.platform import probe_devices_or_exit, wait_for_devices


def test_wait_for_devices_fast_probe_returns_true():
    assert wait_for_devices(5.0, probe=lambda: None) is True


def test_wait_for_devices_hanging_probe_times_out():
    start = time.monotonic()
    ok = wait_for_devices(0.2, probe=lambda: time.sleep(30))
    elapsed = time.monotonic() - start
    assert ok is False
    assert elapsed < 5.0  # returned at the bound, not after the sleep


def test_wait_for_devices_raising_probe_counts_as_answered():
    """A probe that RAISES still proves the backend answered (it did not
    hang) — wait_for_devices only bounds wall time; callers see the
    failure when they touch jax themselves."""
    def boom():
        raise RuntimeError("backend raised promptly")

    assert wait_for_devices(5.0, probe=boom) is True


def test_probe_or_exit_noops_when_cpu_pinned(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    def forbidden(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("probe ran despite a CPU-pinned environment")

    monkeypatch.setattr(platform_mod, "wait_for_devices", forbidden)
    probe_devices_or_exit(timeout_s=0.01)  # returns, no probe, no exit


def test_probe_or_exit_exits_17_on_timeout(monkeypatch, capsys):
    monkeypatch.setenv("JAX_PLATFORMS", "")  # unset-equivalent: would dial
    monkeypatch.setattr(platform_mod, "wait_for_devices", lambda t: False)

    class _Exited(Exception):
        pass

    codes = []

    def fake_exit(code):
        codes.append(code)
        raise _Exited

    monkeypatch.setattr(platform_mod.os, "_exit", fake_exit)
    with pytest.raises(_Exited):
        probe_devices_or_exit(timeout_s=0.01)
    assert codes == [17]


def test_probe_or_exit_timeout_env_override(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "")
    monkeypatch.setenv("AACLIP_DEVICE_PROBE_TIMEOUT", "123.5")
    seen = []
    monkeypatch.setattr(platform_mod, "wait_for_devices",
                        lambda t: seen.append(t) or True)
    probe_devices_or_exit()
    assert seen == [123.5]
