"""Persistent XLA compilation cache — cross-process hit behavior.

VERDICT r4 #6: the r4 chip queue burned ~9 minutes of scarce relay window
on a cold compile despite ``enable_persistent_cache()``.  Root cause (r5):
nothing was wrong with the cache *mechanism* — the r4 favae_step edits
(codebook telemetry) changed the step HLO, so every r5 first-run was a
legitimate miss; identical re-runs hit (verified on the live relay:
the re-fired ``cat_realvocab`` row compiled with 0 persistent-cache
misses vs 876 on its first run — docs/ROADMAP.md round-5 section).

This test pins the mechanism itself so a regression (e.g. a cache key
that starts depending on process-varying state) is caught on CPU: two
fresh interpreter processes compile the same jitted function against the
same cache dir; the first must MISS and write, the second must not MISS.
"""

import subprocess
import sys

PROG = """
import logging, sys
logging.basicConfig(level=logging.DEBUG, stream=sys.stderr)
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

def train_step(x):
    return jnp.tanh(x @ x.T).sum()

print(float(jax.jit(train_step)(jnp.ones((64, 64)))))
"""


def _run(cache_dir):
    prog = f"CACHE_DIR = {str(cache_dir)!r}\n" + PROG
    res = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True, text=True, timeout=300,
        # isolate from the suite's JAX_PLATFORMS/XLA_FLAGS conftest env
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "HOME": "/root"},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    return res.stderr


def test_second_process_hits_persistent_cache(tmp_path):
    cache = tmp_path / "xla_cache"
    cache.mkdir()

    first = _run(cache)
    assert "PERSISTENT COMPILATION CACHE MISS for 'jit_train_step'" in first
    entries = [p.name for p in cache.iterdir()]
    assert any("jit_train_step" in n for n in entries), entries

    second = _run(cache)
    assert "CACHE MISS for 'jit_train_step'" not in second
