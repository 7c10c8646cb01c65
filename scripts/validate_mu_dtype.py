"""bf16 Adam-mu convergence validation: f32 vs bf16 first-moment loss curves.

The bf16 first moment (`CATConfig.adam_mu_dtype`) is a measured -17% CAT
step-time win (docs/ROADMAP.md) but was kept opt-in at round 3 because its
convergence evidence was 3 toy steps. This script runs the SAME N-step CAT
training twice on the chip — identical init, identical data order, only
mu_dtype differs — over a small fixed corpus the model can actually fit
(losses decrease ~monotonically), and reports windowed loss-curve statistics
so the default can be flipped on evidence (VERDICT r3 next-round #2a).

Decision rule printed with the JSON: if the final-window mean losses differ
by < the within-run step-to-step noise, bf16 mu is convergence-neutral at
this horizon.

Each dtype's curve runs in its OWN subprocess: the first r5 chip attempt
died with RESOURCE_EXHAUSTED at step 0 even though the identical step had
just benched green (docs/data/r5_chip/validate_mu.log) — a poisoned relay
device heap in the parent would otherwise sink both curves and every
in-process retry. The child writes its curve to an .npy; the parent only
aggregates.

    STEPS=500 B=16 python scripts/validate_mu_dtype.py

WHAT=nu runs the same A/B for the SECOND moment (`CATConfig.adam_nu_dtype`,
r5: `cat_step.scale_by_adam_nu`): both arms hold mu at the production bf16
and differ only in nu storage. bf16 nu is riskier than bf16 mu — sqrt(nu)
scales the step size directly — hence the same evidence gate before any
recommendation.
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

STEPS = int(os.environ.get("STEPS", "500"))
B = int(os.environ.get("B", "16"))
CORPUS = 128
LR = 1e-4
WINDOW = 100


def child(spec: str, out_path: str) -> None:
    """Run one loss curve on the chip and save it to out_path (.npy).

    ``spec`` is "<mu_dtype>:<nu_dtype>" (plain "<mu_dtype>" = f32 nu)."""
    mu_dtype, _, nu_dtype = spec.partition(":")
    nu_dtype = nu_dtype or "float32"
    import dataclasses
    import time

    from favae_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from favae_tpu.config import cat_celebahq
    from favae_tpu.models.txt_cond import build_cat
    from favae_tpu.train.cat_step import (
        create_cat_state, make_cat_optimizer, make_cat_train_step)

    cfg = cat_celebahq()
    cfg = dataclasses.replace(
        cfg, adam_mu_dtype=mu_dtype, adam_nu_dtype=nu_dtype,
        gpt=dataclasses.replace(cfg.gpt, remat="dots_nb", train_unroll=24))
    cat, gpt_params = build_cat(cfg, jax.random.PRNGKey(0))
    tx = make_cat_optimizer(cfg, optax.constant_schedule(LR))
    state = create_cat_state(cat, gpt_params, tx)
    del gpt_params  # the state holds the live copy; don't pin a second one
    frozen = cat.frozen_params()
    step = jax.jit(make_cat_train_step(cat, tx), donate_argnums=0)

    # fixed learnable corpus: images and captions are deterministic functions
    # of the sample id, so the mapping is memorizable and the loss decreases
    rs = np.random.RandomState(0)
    imgs = (rs.rand(CORPUS, 256, 256, 3).astype(np.float32) * 2 - 1)
    caps = rs.randint(1, 40000, (CORPUS, 77)).astype(np.int32)

    losses = np.zeros(STEPS, np.float64)
    t0 = time.perf_counter()
    for i in range(STEPS):
        sel = (np.arange(B) + i * B) % CORPUS
        x = jnp.asarray(imgs[sel])
        ids = jnp.asarray(caps[sel])
        state, m = step(state, frozen, x, ids, jax.random.PRNGKey(i))
        losses[i] = float(m["loss_gpt"])
        if i % 100 == 0:
            print(f"# [{spec}] step {i} loss {losses[i]:.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr,
                  flush=True)
    np.save(out_path, losses)


def run(spec: str) -> np.ndarray:
    tag = spec.replace(":", "_")
    out = os.path.join(tempfile.gettempdir(), f"mu_curve_{tag}.npy")
    if os.path.exists(out):
        os.unlink(out)
    env = dict(os.environ, FAVAE_MU_CHILD=spec, FAVAE_MU_OUT=out)
    for attempt in (1, 2):
        rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                            env=env).returncode
        if rc == 0:
            return np.load(out)
        print(f"# child [{spec}] attempt {attempt} rc={rc}",
              file=sys.stderr, flush=True)
    raise RuntimeError(f"both child attempts failed for {spec}")


def main():
    # WHAT=mu (default): f32 vs bf16 FIRST moment, nu f32 in both arms.
    # WHAT=nu: f32 vs bf16 SECOND moment, mu at the production bf16 in both.
    what = os.environ.get("WHAT", "mu")
    if what == "nu":
        arm_a, arm_b = "bfloat16:float32", "bfloat16:bfloat16"
    else:
        arm_a, arm_b = "float32", "bfloat16"
    curves = {d: run(d) for d in (arm_a, arm_b)}
    f32, bf16 = curves[arm_a], curves[arm_b]

    def window_means(c):
        return [round(float(c[i:i + WINDOW].mean()), 5)
                for i in range(0, STEPS, WINDOW)]

    final_f32 = f32[-WINDOW:]
    final_bf16 = bf16[-WINDOW:]
    # within-run noise: stdev of the per-step loss inside the final window
    # (the corpus cycles every CORPUS/B steps, so the window covers full
    # epochs of the fixed data)
    noise = float(np.std(final_f32))
    gap = float(abs(final_f32.mean() - final_bf16.mean()))
    print(json.dumps({
        "metric": f"CAT bf16-Adam-{what} convergence validation",
        "arms": [arm_a, arm_b],
        "steps": STEPS, "batch": B, "corpus": CORPUS, "lr": LR,
        "window_means_f32": window_means(f32),
        "window_means_bf16": window_means(bf16),
        "final_window_gap": round(gap, 5),
        "final_window_noise_std_f32": round(noise, 5),
        "gap_over_noise": round(gap / max(noise, 1e-9), 3),
        "neutral": bool(gap < noise),
    }))


if __name__ == "__main__":
    if os.environ.get("FAVAE_MU_CHILD"):
        child(os.environ["FAVAE_MU_CHILD"], os.environ["FAVAE_MU_OUT"])
        sys.exit(0)
    from favae_tpu.utils.backend import wait_for_backend
    _log = lambda m: print(f"# {m}", file=sys.stderr, flush=True)
    if not wait_for_backend(tries=4, delay_s=90.0, log=_log):
        print(json.dumps({"metric": "CAT bf16-Adam-mu convergence validation",
                          "error": "TPU backend unavailable"}))
        sys.exit(1)
    main()
