"""Measure the blockwise Pallas attention (ops/pallas_attention.py) vs the
XLA materialized-logits path at the production cross-attention tiers — the
case the kernel was written for (SURVEY §2.4 CP row: R x A = 4608 x 384 ≈
1.8M logits/pair/head; VERDICT round-2 missing item 4, round-3 missing #3).

Runs BOTH attention directions of the joint model's cross-attention
(residues->atoms: Lq=4608/Lk=384; atoms->residues: Lq=384/Lk=4608),
forward+backward (value_and_grad over q/k/v), bf16 operands like the
training step. Cheap flagship tiers first and every stage AOT-compiled with
its compile time printed, so a bounded (timeout) run still records partial
evidence — round 3's attempt died silently inside a >15-min Mosaic compile.

Prints one JSON line per configuration. TPU-exclusive: run alone under
timeout.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_compiled(fn_c, args, n=30, windows=3):
    out = jax.block_until_ready(fn_c(*args))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_c(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3   # ms


def compile_timed(fn, args, tag):
    t0 = time.perf_counter()
    c = jax.jit(fn).lower(*args).compile()
    dt = time.perf_counter() - t0
    print(json.dumps({"compile": tag, "seconds": round(dt, 1)}), flush=True)
    return c, dt


def xla_mha(q, k, v, pad):
    hd = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(q.dtype)
    logits = jnp.where(pad[:, None, None, :], -1e9, logits)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def main():
    import os

    cache = os.path.join(os.path.expanduser("~"), ".cache", "caster_dta_jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from caster_dta_tpu.ops.pallas_attention import flash_mha

    H, HD = 8, 16                # 8 heads x 16 = 128 embed dim
    R, A = 4608, 384             # KIBA-top tier, bucket batch 4
    RF, AF = 512, 64             # flagship BindingDB tier, bucket batch 32
    results = []
    # cheap flagship tiers first so a bounded run still records data
    for tag, B, lq, lk in (("flagship res->atoms", 32, RF, AF),
                           ("flagship atoms->res", 32, AF, RF),
                           ("kiba res->atoms", 4, R, A),
                           ("kiba atoms->res", 4, A, R)):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(B, H, lq, HD)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, lk, HD)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, lk, HD)), jnp.bfloat16)
        pad = jnp.zeros((B, lk), bool).at[:, lk - lk // 8:].set(True)

        def loss_xla(q, k, v):
            return (xla_mha(q, k, v, pad).astype(jnp.float32) ** 2).sum()

        def loss_flash(q, k, v):
            return (flash_mha(q, k, v, pad).astype(jnp.float32) ** 2).sum()

        fwd_xla_c, _ = compile_timed(loss_xla, (q, k, v), f"{tag} xla fwd")
        fwd_fla_c, cf = compile_timed(loss_flash, (q, k, v),
                                      f"{tag} flash fwd")
        g_xla_c, _ = compile_timed(
            jax.value_and_grad(loss_xla, argnums=(0, 1, 2)), (q, k, v),
            f"{tag} xla fwd+bwd")
        g_fla_c, cfb = compile_timed(
            jax.value_and_grad(loss_flash, argnums=(0, 1, 2)), (q, k, v),
            f"{tag} flash fwd+bwd")

        # numerics cross-check
        (lx, gx), (lf, gf) = g_xla_c(q, k, v), g_fla_c(q, k, v)
        rel = abs(float(lx) - float(lf)) / abs(float(lx))
        gerr = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b.astype(jnp.float32))))
                   for a, b in zip(gx, gf))

        fwd_xla = bench_compiled(fwd_xla_c, (q, k, v))
        fwd_fla = bench_compiled(fwd_fla_c, (q, k, v))
        fb_xla = bench_compiled(g_xla_c, (q, k, v))
        fb_fla = bench_compiled(g_fla_c, (q, k, v))
        row = {"dir": tag, "shape": [B, H, lq, lk, HD],
               "fwd_ms": {"xla": round(fwd_xla, 3), "flash": round(fwd_fla, 3)},
               "fwd_bwd_ms": {"xla": round(fb_xla, 3),
                              "flash": round(fb_fla, 3)},
               "flash_compile_s": {"fwd": round(cf, 1), "fwd_bwd": round(cfb, 1)},
               "loss_rel_err": round(rel, 6), "grad_max_abs_err": round(gerr, 4),
               "speedup_fwd_bwd": round(fb_xla / fb_fla, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    logits_mb = 4 * H * R * A * 2 / 1e6
    print(json.dumps({"kiba_logit_tensor_mb_per_direction": round(logits_mb, 1),
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
