"""A/B the dropout-mask PRNG on the flagship train step: threefry (jax
default; generates random bits on the VPU with long fused chains) vs the
TPU-native 'rbg' generator (XLA RngBitGenerator instruction).

Motivation: PROFILE_r4.md attributes ~0.5 ms of the 4.24 ms step to
fusions labeled with the joint-head FF ops whose time is ~15x their
bandwidth bound — the signature of threefry mask generation fused into
them (the step draws ~10 dropout masks over [16K, 128..256] tensors).

Prints one JSON line per variant. TPU-exclusive: run alone under timeout.
"""
import functools
import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/caster_dta_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(impl: str):
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch, _trained_config_model
    from caster_dta_tpu.train.loop import TrainConfig, Trainer

    B, N_P, E_P, N_M, E_M = 32, 512, 4096, 64, 256
    batch = _synthetic_batch(b=B, n_p=N_P, e_p=E_P, n_m=N_M, e_m=E_M, seed=0)
    model = _trained_config_model()
    cfg = TrainConfig(seed=0, optimizer="adam", lr=1e-4,
                      compute_dtype="bfloat16")
    trainer = Trainer(model, cfg, batch)
    rng = jax.random.key(0, impl=impl)
    lr = np.float32(cfg.lr)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(4,))
    def scan_steps(p, o, rng, lrs, k):
        def body(carry, lr_i):
            p, o, rng = carry
            p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr_i)
            return (p, o, rng), loss

        (p, o, rng), losses = jax.lax.scan(body, (p, o, rng), lrs, length=k)
        return p, o, rng, losses

    n_steps, n_windows = 50, 4
    lrs = jnp.full((n_steps,), lr, jnp.float32)
    p, o = trainer.params, trainer.opt_state
    t0 = time.perf_counter()
    p, o, rng, losses = scan_steps(p, o, rng, lrs, n_steps)   # compile
    jax.block_until_ready(losses)
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        p, o, rng, losses = scan_steps(p, o, rng, lrs, n_steps)
        jax.block_until_ready(losses)
        dt = min(dt, (time.perf_counter() - t0) / n_steps)
    edges = 115382
    print(json.dumps({"prng_impl": impl, "step_ms": round(dt * 1e3, 3),
                      "edges_per_s": round(edges / dt, 1),
                      "compile_s": round(compile_s, 1),
                      "loss_last": float(losses[-1])}), flush=True)
    return dt


def main():
    dt_threefry = run("threefry2x32")
    dt_rbg = run("rbg")
    print(json.dumps({"speedup_rbg": round(dt_threefry / dt_rbg, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
