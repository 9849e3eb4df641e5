"""A/B bench for the hot Pallas gather/scatter kernels at the flagship
train-step shapes (PROFILE_r5.md rows 1-10: the 8 protein-tower custom-calls
are 27% of the device step, running at 126-175 GB/s fusion-boundary).

Sweeps the one-hot compare dtype (OH_DTYPE: int32 baseline vs int16/float16
— the compare is VPU-lane-bound, narrower lanes double throughput) and the
chunk sizes (CEG/CED/CE,BN). Each variant is checked bitwise against the
int32 baseline (one-hot selection is exact in every dtype tried).

Usage: timeout 1200 python scripts/bench_segment_kernels.py [out_json]
TPU-exclusive: run alone.
"""
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

from micro_gather import sustained  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from caster_dta_tpu.ops import pallas_segment as ps

    out_json = sys.argv[1] if len(sys.argv) > 1 else "docs/bench/segment_kernels_r5.json"
    B, N, E, F = 32, 512, 4096, 28
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(B, N, F))).astype(jnp.bfloat16)
    dst = jnp.asarray(np.sort(rng.integers(0, N, (B, E)).astype(np.int32), axis=1))
    src = jnp.asarray(rng.integers(0, N, (B, E)).astype(np.int32))
    both = jnp.concatenate([src, dst], axis=1)              # [B, 2E]
    mask = jnp.ones((B, E), bool)
    msgs = jnp.asarray(rng.normal(size=(B, E, F))).astype(jnp.bfloat16)
    rows2e = jnp.asarray(rng.normal(size=(B, 2 * E, F))).astype(jnp.bfloat16)

    cases = {
        "gather_both_8192": lambda: ps.onehot_gather(table, both),
        "gather_dst_4096": lambda: ps.onehot_gather(table, dst),
        "segsum_sorted_4096": lambda: ps.pallas_segment_sum(msgs, dst, mask, N),
        "unsorted_segsum_8192": lambda: ps.unsorted_segment_sum_rows(
            rows2e, both, N),
    }

    defaults = dict(OH_DTYPE=ps.OH_DTYPE, CEG=ps.CEG, CED=ps.CED,
                    BN=ps.BN, CE=ps.CE, BND=ps.BND)
    dtypes = {"i32": jnp.int32, "i16": jnp.int16, "f16": jnp.float16}

    variants = []
    for dt in ("i32", "i16", "f16"):
        variants.append((f"oh={dt}", {"OH_DTYPE": dtypes[dt]}))
    variants += [
        ("oh=i16,CEG=1024", {"OH_DTYPE": jnp.int16, "CEG": 1024}),
        ("oh=i16,CED=2048", {"OH_DTYPE": jnp.int16, "CED": 2048}),
        ("oh=i16,CE=1024,BN=256", {"OH_DTYPE": jnp.int16, "CE": 1024, "BN": 256}),
        ("CEG=1024", {"CEG": 1024}),
        ("CED=2048", {"CED": 2048}),
        ("CE=1024,BN=256", {"CE": 1024, "BN": 256}),
    ]

    def apply(patch):
        for k, v in defaults.items():
            setattr(ps, k, v)
        for k, v in patch.items():
            setattr(ps, k, v)

    # int32-baseline outputs for bitwise checks
    apply({})
    baseline_out = {name: jax.device_get(jax.jit(fn)())
                    for name, fn in cases.items()}

    results = {}
    for vname, patch in variants:
        apply(patch)
        for cname, fn in cases.items():
            # skip chunk-size patches irrelevant to this case (avoid
            # re-measuring the baseline under a different label)
            relevant = {"gather_both_8192": ("OH_DTYPE", "CEG"),
                        "gather_dst_4096": ("OH_DTYPE", "CEG"),
                        "segsum_sorted_4096": ("OH_DTYPE", "CE", "BN"),
                        "unsorted_segsum_8192": ("OH_DTYPE", "CED")}[cname]
            if not all(k in relevant for k in patch):
                continue
            key = f"{cname} [{vname}]"
            try:
                out = jax.device_get(jax.jit(fn)())
                exact = bool(np.array_equal(out, baseline_out[cname]))
                us = sustained(fn)
                results[key] = {"us": round(us, 1), "bitwise_exact": exact}
                print(f"{key}: {us:.1f} us exact={exact}", flush=True)
            except Exception as e:  # compile failures are results too
                results[key] = {"error": str(e)[:500]}
                print(f"{key}: FAILED {str(e)[:200]}", flush=True)
    apply({})

    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump({"shapes": {"B": B, "N": N, "E": E, "F": F,
                              "dtype": "bfloat16"},
                   "results": results}, fh, indent=1)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
