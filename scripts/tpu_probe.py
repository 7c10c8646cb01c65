"""Killable relay probe: print `OK ...` iff the axon TPU backend comes up.

The relay's failure mode is a HANG (backend init blocks at 0% CPU holding the
init lock — observed >10 h continuously, r3 close -> r4), so the probe must
run in its own process under `timeout`; an in-process try/except never fires.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 300 python scripts/tpu_probe.py

Used by scripts/r4_chip_queue.sh (pre-row guard + the /tmp probe loop that
fires it) and mirrors favae_tpu.utils.backend.wait_for_backend's subprocess
probe.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
t0 = time.time()
try:
    import jax
    d = jax.devices()
    print(f"OK {time.time() - t0:.0f}s {d}", flush=True)
except Exception as e:  # noqa: BLE001 — any init failure means "down"
    print(f"FAIL {time.time() - t0:.0f}s {str(e).splitlines()[0][:150]}",
          flush=True)
    sys.exit(1)
