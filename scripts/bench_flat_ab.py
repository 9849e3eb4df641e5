"""A/B: flat-vector param carry (TrainConfig.flat_params) on the flagship
train step — scan-dispatch wall time per step + device step, both configs.

Usage: timeout 900 python scripts/bench_flat_ab.py
TPU-exclusive: run alone.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(flat: bool):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch, _trained_config_model
    from caster_dta_tpu.train.loop import TrainConfig, Trainer

    batch = _synthetic_batch(b=32, n_p=512, e_p=4096, n_m=64, e_m=256, seed=0)
    model = _trained_config_model()
    cfg = TrainConfig(seed=0, optimizer="adam", lr=1e-4,
                      compute_dtype="bfloat16", flat_params=flat)
    trainer = Trainer(model, cfg, batch)
    rng = jax.random.key(0, impl=cfg.prng_impl)
    lr = np.float32(cfg.lr)
    p, o, loss, _, rng = trainer._train_step(
        trainer.params, trainer.opt_state, batch, rng, lr)
    jax.block_until_ready(loss)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(4,))
    def scan_steps(p, o, rng, lrs, k):
        def body(carry, lr_i):
            p, o, rng = carry
            p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr_i)
            return (p, o, rng), loss

        (p, o, rng), losses = jax.lax.scan(body, (p, o, rng), lrs, length=k)
        return p, o, rng, losses

    # deliberately mirrors bench.py main()'s scan_steps/window harness so
    # the two numbers stay comparable; if that harness changes, change this
    n_steps, n_windows = 50, 5
    lrs = jnp.full((n_steps,), lr, jnp.float32)
    p, o, rng, losses = scan_steps(p, o, rng, lrs, n_steps)
    jax.block_until_ready(losses)
    dt = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        p, o, rng, losses = scan_steps(p, o, rng, lrs, n_steps)
        jax.block_until_ready(losses)
        dt = min(dt, (time.perf_counter() - t0) / n_steps)

    # device-time of the standalone step via trace
    from bench import _device_step_ms
    dev = _device_step_ms(trainer._train_step, (p, o, batch, rng, lr))
    edges = (int(np.asarray(batch.protein.edge_mask).sum())
             + int(np.asarray(batch.molecule.edge_mask).sum()))
    last_loss = float(np.asarray(losses)[-1])
    # 1 warmup + the compile-call scan + n_windows timed scans, all of which
    # advance params/opt_state.
    total_steps = 1 + n_steps * (1 + n_windows)
    return {"flat": flat, "wall_ms_per_step": round(dt * 1e3, 3),
            "device_step_ms": dev,
            "edges_per_s": round(edges / dt, 1),
            f"loss_after_{total_steps}_steps": last_loss}


def main():
    out = [measure(flat=False), measure(flat=True)]
    print(json.dumps(out, indent=1))
    with open("docs/bench/flat_ab_r5.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
