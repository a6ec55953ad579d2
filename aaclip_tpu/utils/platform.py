"""Platform-selection shim for CLIs and tools.

The axon TPU plugin wins JAX's platform selection even when
``JAX_PLATFORMS=cpu`` is set in the environment; the config flag must also
be set before the backend initializes (CLAUDE.md).  Every CLI entry point
calls :func:`honor_env_platform` first so
``JAX_PLATFORMS=cpu python tools/predict_folder.py ...`` behaves as
documented.
"""

from __future__ import annotations

import os
import sys


def honor_env_platform() -> None:
    """Mirror the ``JAX_PLATFORMS`` env var into jax's config flag.

    No-op when the var is unset or the backend is already initialized with
    the requested platform.  Must run before the first call that touches
    ``jax.devices()``.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        # backend already initialized (some import touched jax.devices()
        # before this shim ran).  That is NOT harmless here: the axon
        # plugin wins selection over the env var, so the run may be on
        # TPU despite JAX_PLATFORMS=cpu — say so instead of silence.
        try:
            actual = jax.devices()[0].platform
        except Exception:
            actual = "unknown"
        if actual != plat.split(",")[0]:
            import logging
            logging.getLogger("aaclip").warning(
                "JAX_PLATFORMS=%s requested but the %s backend is already "
                "initialized — call honor_env_platform() before anything "
                "that touches jax.devices()", plat, actual)


def wait_for_devices(timeout_s: float, probe=None) -> bool:
    """Return True once the JAX backend answers, False on timeout.

    On this rig the axon TPU plugin dials a relay during backend init, and
    a dead relay makes ``jax.devices()`` hang FOREVER rather than raise
    (observed during round-3 outages).  Driver-facing entry points (bench)
    call this with a bound so a dead relay becomes a fast, diagnosable
    failure instead of an indefinite hang.

    The probe runs in a daemon thread; on timeout the thread is abandoned
    (it is blocked in native code and cannot be cancelled), so a caller
    that intends to keep running must treat the backend as poisoned —
    the CLI wrapper below exits the process instead.
    """
    import threading

    if probe is None:
        def probe():
            import jax
            jax.devices()

    done = threading.Event()

    def _run():
        try:
            probe()
        except Exception:
            pass  # raised-promptly still means "answered"; callers see the
            # real failure when they touch jax themselves
        finally:
            done.set()

    t = threading.Thread(target=_run, daemon=True, name="device-probe")
    t.start()
    return done.wait(timeout_s)


def probe_devices_or_exit(timeout_s: float | None = None) -> None:
    """Bound the first backend contact; exit(17) with a diagnostic on hang.

    No-op when the environment pins a CPU platform (tests, virtual meshes)
    — a CPU backend cannot hang on the relay and probing it would burn a
    thread for nothing.  Timeout defaults to ``AACLIP_DEVICE_PROBE_TIMEOUT``
    (seconds, default 900 — a healthy relay answers jax.devices() well
    under 90 s, so 900 distinguishes "slow" from "down" conservatively).
    """
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and all(p in ("cpu", "") for p in plat.split(",")):
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("AACLIP_DEVICE_PROBE_TIMEOUT", "900"))
    if not wait_for_devices(timeout_s):
        sys.stderr.write(
            f"FATAL: jax.devices() did not answer within {timeout_s:.0f}s — "
            "the TPU relay is unreachable (a dead relay hangs backend init "
            "rather than raising). Set JAX_PLATFORMS=cpu to run on CPU, or "
            "raise AACLIP_DEVICE_PROBE_TIMEOUT if the relay is just slow.\n")
        sys.stderr.flush()
        os._exit(17)
