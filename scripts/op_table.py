"""Per-op device table for the flagship train step: MEASURED TPU time per
HLO op (jax.profiler trace) joined with fusion-boundary HBM bytes
(utils/hlo_traffic.py) -> achieved GB/s per op and a hardware-grounded
roofline (VERDICT r03 item 4).

Usage: python scripts/op_table.py [out_md] [B N_P E_P N_M E_M]
Writes a markdown table (default PROFILE_r4.md) and prints a JSON summary.
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


def main():
    import jax

    from __graft_entry__ import _synthetic_batch, _trained_config_model
    from caster_dta_tpu.train.loop import TrainConfig, Trainer
    from caster_dta_tpu.utils import hlo_traffic

    out_md = sys.argv[1] if len(sys.argv) > 1 else "PROFILE_r4.md"
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

    # fusion-boundary bytes per ENTRY instruction of the compiled step
    comp = trainer._train_step.lower(p, o, batch, rng, lr).compile()
    traffic = hlo_traffic.entry_traffic(comp.as_text())

    n = 20
    d = tempfile.mkdtemp(prefix="optable")
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
    total_us = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in names.get(e["pid"], ""):
            continue
        if e["name"].startswith("jit_step") or e["name"].isdigit():
            continue
        by_op[e["name"]][0] += e["dur"]
        by_op[e["name"]][1] += 1
        total_us += e["dur"]

    total_us = max(total_us, 1e-9)
    matched_bytes = 0
    rows = []
    for name, (us, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0]):
        t = traffic.get(name)
        b = t["bytes"] if t else None
        if b is not None:
            matched_bytes += b * (cnt // n if cnt >= n else 1)
        gbs = (b / (us / cnt * 1e-6) / 1e9) if (b and us) else None
        rows.append({"op": name, "us_per_step": us / n, "pct": 100 * us / total_us,
                     "calls_per_step": cnt / n, "hbm_bytes": b,
                     "achieved_gbs": gbs,
                     "kind": t["op"] if t else "?",
                     "jax_op": (t.get("jax_op") or "") if t else ""})

    step_ms = max(total_us / n / 1e3, 1e-9)
    total_traffic = sum(v["bytes"] for v in traffic.values())
    # the fusion-boundary total over-counts true HBM traffic
    # (multi-consumer re-reads, async copy pairs, DMA prefetch overlap);
    # the physical ceiling bounds what the chip could actually stream
    ceiling = step_ms * 1e-3 * 819e9
    summary = {
        "batch": {"B": B, "N_p": N_P, "E_p": E_P, "N_m": N_M, "E_m": E_M},
        "device_step_ms": round(step_ms, 3),
        "fusion_boundary_bytes_upper_bound": total_traffic,
        "hbm_bytes_physical_ceiling": round(ceiling),
        "trace_matched_ops": sum(1 for r in rows if r["hbm_bytes"] is not None),
        "trace_total_ops": len(rows),
        # fusion-boundary bytes of the trace-matched ops (coverage check
        # against fusion_boundary_bytes_upper_bound)
        "trace_matched_bytes": matched_bytes,
        "device": str(jax.devices()[0]),
    }

    with open(out_md, "w") as fh:
        fh.write("# Flagship train step — per-op device profile (measured)\n\n"
                 f"Batch B={B} N_p={N_P} E_p={E_P} N_m={N_M} E_m={E_M}, "
                 f"bf16 compute, {n}-step jax.profiler trace on "
                 f"{summary['device']}.\n\n"
                 f"- device step: **{step_ms:.3f} ms** (sum of op durations)\n"
                 f"- fusion-boundary byte count (optimized ENTRY, "
                 f"utils/hlo_traffic.py): **{total_traffic/1e6:.1f} MB/step** "
                 f"— an UPPER BOUND on true HBM traffic (multi-consumer "
                 f"re-reads / async copy pairs counted fully); the physical "
                 f"ceiling at 819 GB/s peak for this step time is "
                 f"{ceiling/1e6:.0f} MB\n\n"
                 "Per-op HBM bytes are operand+result sizes at the fusion "
                 "boundary; within-fusion intermediates stay in VMEM. "
                 "Per-op `GB/s` is bytes/duration — meaningful for the big "
                 "sequential kernels (Pallas custom-calls, large fusions); "
                 "values above peak mark ops whose operands were already "
                 "resident/prefetched, so treat those as overlap artifacts, "
                 "not measurements.\n\n"
                 "| us/step | % | calls | HBM MB | GB/s | kind | op "
                 "| jax op |\n"
                 "|---:|---:|---:|---:|---:|---|---|---|\n")
        cum = 0.0
        for r in rows[:80]:
            cum += r["pct"]
            mb = f"{r['hbm_bytes']/1e6:.2f}" if r["hbm_bytes"] else "-"
            gbs = f"{r['achieved_gbs']:.0f}" if r["achieved_gbs"] else "-"
            jop = ("/".join(r["jax_op"].split("/")[-3:])[-64:]
                   if r["jax_op"] else "-")
            fh.write(f"| {r['us_per_step']:.1f} | {r['pct']:.1f} | "
                     f"{r['calls_per_step']:.0f} | {mb} | {gbs} | "
                     f"{r['kind']} | `{r['op'][:60]}` | `{jop}` |\n")
        fh.write(f"\n(top 80 of {len(rows)} ops; cumulative "
                 f"{cum:.1f}% of device time)\n")
    print(json.dumps(summary))
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
