"""Device-time breakdown by HLO op for the bench train step.

Usage: python scripts/op_breakdown.py [B N_P E_P N_M E_M]
Prints the top ops by total TPU time over 20 steps.
"""
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from __graft_entry__ import _trained_config_model, _synthetic_batch
    from caster_dta_tpu.train.loop import TrainConfig, Trainer

    vals = [32, 512, 4096, 64, 256]
    user = [int(a) for a in sys.argv[1:6]]
    vals[:len(user)] = user
    B, N_P, E_P, N_M, E_M = vals
    batch = _synthetic_batch(b=B, n_p=N_P, e_p=E_P, n_m=N_M, e_m=E_M, seed=0)
    model = _trained_config_model()
    cfg = TrainConfig(seed=0, optimizer="adam", lr=1e-4,
                      compute_dtype="bfloat16")
    trainer = Trainer(model, cfg, batch)
    rng = jax.random.key(0, impl=cfg.prng_impl)
    lr = np.float32(cfg.lr)
    p, o = trainer.params, trainer.opt_state
    p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr)
    jax.block_until_ready(loss)

    n = 20
    d = tempfile.mkdtemp(prefix="opbreak")
    with jax.profiler.trace(d):
        for _ in range(n):
            p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr)
        jax.block_until_ready(loss)

    f = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    names = {e["pid"]: e["args"]["name"] for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    by_op = defaultdict(float)
    total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in names.get(e["pid"], ""):
            continue
        if e["name"].startswith("jit_step") or e["name"].isdigit():
            continue  # outer step envelopes
        dur = e["dur"]
        by_op[e["name"]] += dur
        total += dur
    print(f"total device us over {n} steps: {total:.0f}  "
          f"({total/n/1000:.2f} ms/step)")
    cum = 0.0
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:60]:
        cum += v
        print(f"{v/n:10.1f} us/step  {100*v/total:5.1f}%  cum {100*cum/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
