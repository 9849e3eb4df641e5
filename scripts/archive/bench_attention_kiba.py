"""ARCHIVED (round 5): flash_mha was retired after this benchmark's
round-4 measurements (see nn/attention.py header + RESULTS.md); the
flash imports below no longer resolve. Kept for provenance of
docs/bench/bench_attention_r4*.out.

Measure the blockwise Pallas attention (ops/pallas_attention.py) vs the
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

        # each stage guarded: a failing flash compile (the KIBA-tier bwd
        # kernel exceeds VMEM and Mosaic errors out) records the failure
        # and still benches every stage that works
        row = {"dir": tag, "shape": [B, H, lq, lk, HD],
               "fwd_ms": {}, "fwd_bwd_ms": {}, "flash_compile_s": {}}

        def stage(key, fn, compile_key=None):
            try:
                c, dt = compile_timed(fn, (q, k, v), f"{tag} {key}")
                if compile_key:
                    row["flash_compile_s"][compile_key] = round(dt, 1)
                return c
            except Exception as e:
                msg = str(e).splitlines()[0][:160]
                row.setdefault("errors", {})[key] = msg
                print(json.dumps({"compile_failed": f"{tag} {key}",
                                  "error": msg}), flush=True)
                return None

        comps = {
            "fwd_xla": stage("xla fwd", loss_xla),
            "fwd_fla": stage("flash fwd", loss_flash, "fwd"),
            "fb_xla": stage("xla fwd+bwd",
                            jax.value_and_grad(loss_xla, argnums=(0, 1, 2))),
            "fb_fla": stage("flash fwd+bwd",
                            jax.value_and_grad(loss_flash, argnums=(0, 1, 2)),
                            "fwd_bwd"),
        }

        if comps["fb_xla"] and comps["fb_fla"]:
            (lx, gx), (lf, gf) = (comps["fb_xla"](q, k, v),
                                  comps["fb_fla"](q, k, v))
            row["loss_rel_err"] = round(
                abs(float(lx) - float(lf)) / abs(float(lx)), 6)
            row["grad_max_abs_err"] = round(
                max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                          - b.astype(jnp.float32))))
                    for a, b in zip(gx, gf)), 4)
        if comps["fwd_xla"]:
            row["fwd_ms"]["xla"] = round(bench_compiled(comps["fwd_xla"],
                                                        (q, k, v)), 3)
        if comps["fwd_fla"]:
            row["fwd_ms"]["flash"] = round(bench_compiled(comps["fwd_fla"],
                                                          (q, k, v)), 3)
        if comps["fb_xla"]:
            row["fwd_bwd_ms"]["xla"] = round(bench_compiled(comps["fb_xla"],
                                                            (q, k, v)), 3)
        if comps["fb_fla"]:
            row["fwd_bwd_ms"]["flash"] = round(bench_compiled(comps["fb_fla"],
                                                              (q, k, v)), 3)
            if comps["fb_xla"]:
                row["speedup_fwd_bwd"] = round(
                    row["fwd_bwd_ms"]["xla"] / row["fwd_bwd_ms"]["flash"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    logits_mb = 4 * H * R * A * 2 / 1e6
    print(json.dumps({"kiba_logit_tensor_mb_per_direction": round(logits_mb, 1),
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()
