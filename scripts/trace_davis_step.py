"""Op-level device-time breakdown of one real Davis train step.

Usage: python scripts/trace_davis_step.py [bucket_index]
"""
import collections
import glob
import gzip
import json
import os
import pickle
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/caster_dta_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    path = ("/tmp/davis_structs/00_datasetobj__84f81e58d17456264bf36d8186"
            "01e61dc06f91a696c9b5d8e8595c2ab3b4bd6a_1f3c8728fef7a4075ba05f"
            "c42c45491d39a774398e3214a7d5a26d880fb5fc95.pkl")
    with open(path, "rb") as f:
        dataset = pickle.load(f)

    from caster_dta_tpu.data.batching import BucketedLoader, dataset_budgets
    from caster_dta_tpu.train.loop import TrainConfig, Trainer, split_dataset
    import __graft_entry__ as ge

    max_num, max_bs = dataset_budgets("davis")
    train_idx, _, _ = split_dataset(dataset, 9)
    dl = BucketedLoader(dataset, train_idx, max_num=max_num,
                        max_batch_size=max_bs, shuffle=False, seed=9)

    # pick a batch from the most populous bucket (or argv override)
    want = int(sys.argv[1]) if len(sys.argv) > 1 else None
    target_bucket = sorted(dl.buckets().items(),
                           key=lambda kv: -len(kv[1]))[want or 0][0]
    batch = None
    for b in dl:
        if batch is None:
            batch = b
        if b.protein.node_s.shape[1] == target_bucket[0] \
                and b.protein.edge_src.shape[1] == target_bucket[1]:
            batch = b
            break
    print("batch shapes: p", batch.protein.node_s.shape,
          batch.protein.edge_src.shape,
          "m", batch.molecule.node_s.shape, batch.molecule.edge_src.shape)

    model = ge._trained_config_model()
    cfg = TrainConfig(seed=9, compute_dtype="bfloat16")
    trainer = Trainer(model, cfg, batch)
    p, o, rng = trainer.params, trainer.opt_state, trainer.rng
    lr = np.float32(1e-4)

    p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(10):
        p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr)
    jax.block_until_ready(loss)
    print(f"steady step: {(time.perf_counter()-t0)/10*1e3:.1f} ms wall")

    d = tempfile.mkdtemp(prefix="davistrace")
    with jax.profiler.trace(d):
        for _ in range(5):
            p, o, loss, _, rng = trainer._train_step(p, o, batch, rng, lr)
        jax.block_until_ready(loss)
    f = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))[-1]
    with gzip.open(f) as fh:
        tr = json.load(fh)
    names = {e["pid"]: e["args"]["name"] for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    per_op = collections.Counter()
    tot = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in names.get(e["pid"], ""):
            per_op[e["name"]] += e["dur"]
            tot += e["dur"]
    print(f"\ntotal device us over 5 steps: {tot:.0f} ({tot/5/1e3:.1f} ms/step)")
    for name, us in per_op.most_common(40):
        print(f"  {us/5:10.0f} us/step  {100*us/tot:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
