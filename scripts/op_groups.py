"""Grouped device-time breakdown for the flagship train step.

Same 20-step jax.profiler trace as scripts/op_table.py, but instead of a
top-N table it writes EVERY op row to JSON (so later analysis needs no
re-run) plus aggregates: by HLO kind, by jax module scope, forward vs
backward vs untagged tail, and a small-op histogram — the evidence base for
attacking the per-op sequencing tail (VERDICT r04 next-round #1).

Usage: python scripts/op_groups.py [out_json] [B N_P E_P N_M E_M]
TPU-exclusive: run alone under timeout.
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


def classify_module(jax_op: str, kind: str) -> str:
    s = jax_op or ""
    if kind == "custom-call" or "pallas_call" in s:
        return "pallas"
    for key, label in (
            ("searchsorted", "searchsorted"),
            ("cross_attn", "cross_attn"),
            ("embed1_to_2", "cross_attn"),
            ("embed2_to_1", "cross_attn"),
            ("molecule_gnn", "molecule_gnn"),
            ("protein_gnn", "protein_gnn"),
            ("conv_", "protein_gnn"),
            ("message_", "protein_gnn"),
            ("gvp", "protein_gnn"),
            ("_lin_stack", "joint_head"),
            ("ff_", "joint_head"),
            ("dropout", "dropout"),
    ):
        if key in s:
            return label
    if kind in ("reshape", "transpose", "concatenate", "copy", "copy-done",
                "copy-start", "bitcast", "slice"):
        return "layout"
    if not s:
        return "unattributed"
    return "untagged_tail"


def main():
    import jax

    from __graft_entry__ import _synthetic_batch, _trained_config_model
    from caster_dta_tpu.train.loop import TrainConfig, Trainer
    from caster_dta_tpu.utils import hlo_traffic

    out_json = sys.argv[1] if len(sys.argv) > 1 else "docs/bench/op_groups_r5.json"
    vals = [32, 512, 4096, 64, 256]
    user = [int(a) for a in sys.argv[2:7]]
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

    comp = trainer._train_step.lower(p, o, batch, rng, lr).compile()
    traffic = hlo_traffic.entry_traffic(comp.as_text())

    n = 20
    d = tempfile.mkdtemp(prefix="opgroups")
    with jax.profiler.trace(d):
        for _ in range(n):
            p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr)
        jax.block_until_ready(loss)

    f = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    names = {e["pid"]: e["args"]["name"] for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    by_op = defaultdict(lambda: [0.0, 0])
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in names.get(e["pid"], ""):
            continue
        if e["name"].startswith("jit_step") or e["name"].isdigit():
            continue
        by_op[e["name"]][0] += e["dur"]
        by_op[e["name"]][1] += 1

    rows = []
    for name, (us, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0]):
        t = traffic.get(name)
        jax_op = (t.get("jax_op") or "") if t else ""
        kind = t["op"] if t else "?"
        rows.append({
            "op": name, "us_per_step": us / n, "calls_per_step": cnt / n,
            "hbm_bytes": t["bytes"] if t else None, "kind": kind,
            "jax_op": jax_op,
            "module": classify_module(jax_op, kind),
            "direction": ("bwd" if "transpose(jvp" in jax_op
                          else "fwd" if jax_op else "untagged"),
        })

    total = sum(r["us_per_step"] for r in rows)
    agg = lambda key: sorted(
        ((k, round(sum(r["us_per_step"] for r in g), 1), len(g))
         for k, g in _groupby(rows, key).items()),
        key=lambda kv: -kv[1])
    small = [r for r in rows if r["us_per_step"] / max(r["calls_per_step"], 1) < 5.0]
    summary = {
        "batch": {"B": B, "N_p": N_P, "E_p": E_P, "N_m": N_M, "E_m": E_M},
        "device_step_ms": round(total / 1e3, 3),
        "n_ops": len(rows),
        "by_module": agg(lambda r: r["module"]),
        "by_kind": agg(lambda r: r["kind"]),
        "by_direction": agg(lambda r: r["direction"]),
        "sub5us_ops": {"n": len(small),
                       "us_per_step": round(sum(r["us_per_step"] for r in small), 1)},
        "device": str(jax.devices()[0]),
    }
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump({"summary": summary, "rows": rows}, fh)
    print(json.dumps(summary, indent=1))
    print(f"wrote {out_json}")


def _groupby(rows, key):
    out = defaultdict(list)
    for r in rows:
        out[key(r)].append(r)
    return out


if __name__ == "__main__":
    main()
