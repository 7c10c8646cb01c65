"""Transient-backend retry hardening (favae_tpu/utils/backend.py).

Round-3 postmortem: bench.py died on a bare `Unable to initialize backend
'axon': UNAVAILABLE` traceback, losing the driver-captured perf artifact.
These tests simulate that failure mode without a TPU."""

import pytest

from favae_tpu.utils.backend import (call_with_backend_retry,
                                     is_transient_backend_error)


def _unavailable():
    return RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
        "setup/compile error (Unavailable).")


def test_retries_transient_then_succeeds():
    calls, sleeps = [], []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise _unavailable()
        return "ok"

    out = call_with_backend_retry(fn, tries=4, delay_s=7.0,
                                  sleep=sleeps.append)
    assert out == "ok"
    assert len(calls) == 3
    assert sleeps == [7.0, 7.0]  # no sleep after the success


def test_exhausted_retries_raise_last_transient():
    sleeps = []

    def fn():
        raise _unavailable()

    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        call_with_backend_retry(fn, tries=3, delay_s=1.0, sleep=sleeps.append)
    assert sleeps == [1.0, 1.0]  # tries-1 backoffs, none after the last try


def test_non_transient_propagates_immediately():
    calls = []

    def fn():
        calls.append(1)
        raise RuntimeError("shape mismatch: got (3,) expected (4,)")

    with pytest.raises(RuntimeError, match="shape mismatch"):
        call_with_backend_retry(fn, tries=5, delay_s=1.0,
                                sleep=lambda _: None)
    assert len(calls) == 1


def test_non_runtime_errors_propagate():
    with pytest.raises(ValueError):
        call_with_backend_retry(lambda: (_ for _ in ()).throw(ValueError("x")),
                                tries=3, delay_s=1.0, sleep=lambda _: None)


def test_classifier():
    assert is_transient_backend_error(_unavailable())
    assert is_transient_backend_error(
        RuntimeError("DEADLINE_EXCEEDED: relay dial timed out"))
    assert not is_transient_backend_error(RuntimeError("NaN in loss"))
    assert not is_transient_backend_error(ValueError("UNAVAILABLE"))


def test_wait_for_backend_hang_then_recover():
    """A probe that hangs (TimeoutExpired) is killed and retried; a later
    clean probe reports the relay back."""
    import subprocess

    calls, sleeps = [], []

    def runner(timeout):
        calls.append(timeout)
        if len(calls) < 3:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)
        return 0

    from favae_tpu.utils.backend import wait_for_backend
    assert wait_for_backend(tries=4, delay_s=5.0, probe_timeout_s=7.0,
                            sleep=sleeps.append, runner=runner)
    assert calls == [7.0, 7.0, 7.0]
    assert sleeps == [5.0, 5.0]


def test_wait_for_backend_exhausted():
    import subprocess

    def runner(timeout):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

    from favae_tpu.utils.backend import wait_for_backend
    sleeps = []
    assert not wait_for_backend(tries=3, delay_s=1.0, sleep=sleeps.append,
                                runner=runner)
    assert sleeps == [1.0, 1.0]


def test_wait_for_backend_nonzero_rc_retries():
    from favae_tpu.utils.backend import wait_for_backend
    rcs = iter([1, 0])
    assert wait_for_backend(tries=2, delay_s=0.0, sleep=lambda _: None,
                            runner=lambda t: next(rcs))


def test_no_import_time_device_ops():
    """Importing any favae_tpu module must not touch the backend: a
    module-level jnp constant dials the TPU relay at import, crashing
    bench/entry BEFORE their backend probing can run (this bit lpips.py
    during the r4 relay outage).

    Runs in a FRESH subprocess: in-process importlib.reload would replace
    class objects under the rest of the suite (breaking e.g. process-pool
    pickling of PklImageDataset), and already-imported modules would not
    re-execute their top level."""
    import os
    import subprocess
    import sys

    script = r"""
import importlib, pkgutil, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as xb
calls = []
orig = xb.get_backend
def spy(*a, **k):
    calls.append(a)
    return orig(*a, **k)
xb.get_backend = spy
import favae_tpu
bad = []
for m in pkgutil.walk_packages(favae_tpu.__path__, favae_tpu.__name__ + "."):
    before = len(calls)
    try:
        importlib.import_module(m.name)
    except ImportError:
        continue  # optional deps
    if len(calls) > before:
        bad.append(m.name)
xb.get_backend = orig
if bad:
    print("BACKEND-AT-IMPORT:" + ",".join(bad))
    sys.exit(1)
print("CLEAN")
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0 and "CLEAN" in out.stdout, (
        f"import-time backend use detected: {out.stdout} {out.stderr[-500:]}")


# ---- chip lock (host-wide TPU mutual exclusion) ---------------------------

def test_chip_lock_acquire_and_contention(tmp_path):
    from favae_tpu.utils.backend import acquire_chip_lock
    lock = str(tmp_path / "chip.lock")
    held = acquire_chip_lock(path=lock, timeout_s=1.0)
    assert held is not None
    # a second open-file-description on the same file must NOT get the lock
    msgs = []
    second = acquire_chip_lock(path=lock, timeout_s=0.0, poll_s=0.01,
                               sleep=lambda s: None, log=msgs.append)
    assert second is None
    assert any("proceeding WITHOUT" in m for m in msgs)
    held.close()  # release
    third = acquire_chip_lock(path=lock, timeout_s=1.0)
    assert third is not None
    third.close()


def test_chip_lock_waits_until_freed(tmp_path):
    from favae_tpu.utils.backend import acquire_chip_lock
    lock = str(tmp_path / "chip.lock")
    held = acquire_chip_lock(path=lock, timeout_s=1.0)

    def sleep_then_release(_s):
        held.close()  # holder exits while the second caller polls

    second = acquire_chip_lock(path=lock, timeout_s=30.0, poll_s=0.01,
                               sleep=sleep_then_release)
    assert second is not None
    second.close()


def test_chip_lock_skip_env(tmp_path, monkeypatch):
    from favae_tpu.utils.backend import acquire_chip_lock
    monkeypatch.setenv("FAVAE_SKIP_CHIP_LOCK", "1")
    lock = str(tmp_path / "chip.lock")
    held = acquire_chip_lock(path=lock, timeout_s=1.0)
    h2 = acquire_chip_lock(path=lock, timeout_s=0.0)  # no contention: no-op
    assert held is not None and h2 is not None
    held.close(); h2.close()
