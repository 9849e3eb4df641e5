"""Break a Davis train epoch into host-assembly vs dispatch vs fetch time.

Usage: python scripts/profile_epoch.py [n_batches]
"""
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/caster_dta_jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_cap = int(sys.argv[1]) if len(sys.argv) > 1 else 10 ** 9

    path = ("/tmp/davis_structs/00_datasetobj__84f81e58d17456264bf36d8186"
            "01e61dc06f91a696c9b5d8e8595c2ab3b4bd6a_1f3c8728fef7a4075ba05f"
            "c42c45491d39a774398e3214a7d5a26d880fb5fc95.pkl")
    t0 = time.time()
    with open(path, "rb") as f:
        dataset = pickle.load(f)
    print(f"dataset load {time.time()-t0:.1f}s; {len(dataset)} pairs")

    from caster_dta_tpu.data.batching import BucketedLoader, dataset_budgets
    from caster_dta_tpu.data.device_cache import DeviceResidentLoader
    from caster_dta_tpu.train.loop import TrainConfig, Trainer, split_dataset
    from caster_dta_tpu.models.joint import make_joint_gnn
    import __graft_entry__ as ge

    max_num, max_bs = dataset_budgets("davis")
    train_idx, _, _ = split_dataset(dataset, 9)
    t0 = time.time()
    dl = BucketedLoader(dataset, train_idx, max_num=max_num,
                        max_batch_size=max_bs, shuffle=True, seed=9)
    print(f"loader build {time.time()-t0:.1f}s; "
          f"{len(dl)} batches, {len(dl.buckets())} buckets")
    for b, idxs in sorted(dl.buckets().items()):
        print(f"  bucket {b}: {len(idxs)} pairs, bs={dl.bucket_batch_size(b)}"
              f" -> {(len(idxs)+dl.bucket_batch_size(b)-1)//dl.bucket_batch_size(b)} batches")
    est = DeviceResidentLoader.estimate_store_bytes(dl)
    print(f"device store estimate: {est/1e9:.2f} GB")
    t0 = time.time()
    dl = DeviceResidentLoader.maybe(dl, 4_000_000_000)
    resident = not isinstance(dl, BucketedLoader)
    print(f"device-resident: {resident} (build {time.time()-t0:.1f}s)")

    model = ge._trained_config_model()
    cfg = TrainConfig(seed=9, compute_dtype="bfloat16")
    example = next(iter(dl))
    getattr(dl, "loader", dl).epoch = 0
    t0 = time.time()
    trainer = Trainer(model, cfg, example)
    print(f"trainer init {time.time()-t0:.1f}s")

    # --- epochs with phase timers ---
    from caster_dta_tpu.train.loop import _PredAccumulator, _max_batch_width
    for ep in range(3):
        t_host = t_disp = 0.0
        n = 0
        acc = _PredAccumulator(len(dl), _max_batch_width(dl))
        it = iter(dl)
        t_epoch0 = time.time()
        per_bucket = {}
        while True:
            t0 = time.time()
            try:
                batch = next(it)
            except StopIteration:
                break
            t_host += time.time() - t0
            t0 = time.time()
            trainer.params, trainer.opt_state, _, pred, trainer.rng = \
                trainer._train_step(trainer.params, trainer.opt_state, batch,
                                    trainer.rng, np.float32(1e-4))
            acc.append(pred)
            dt = time.time() - t0
            t_disp += dt
            b = (batch.p_store.node_s.shape if resident
                 else batch.protein.node_s.shape)
            per_bucket.setdefault(str(b), []).append(dt)
            n += 1
            if n >= n_cap:
                break
        t0 = time.time()
        jax.block_until_ready(trainer.params)
        t_block = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(acc.buf)
        t_block2 = time.time() - t0
        t0 = time.time()
        acc.to_host()
        t_fetch = time.time() - t0
        total = time.time() - t_epoch0
        print(f"\nEPOCH {ep}: {n} batches: total {total:.1f}s | "
              f"host-assembly {t_host:.1f}s | dispatch {t_disp:.1f}s | "
              f"block(params) {t_block:.1f}s | block(buf) {t_block2:.1f}s | "
              f"pred fetch {t_fetch:.1f}s")
        print("dispatch per shape (first call = compile):")
        for k, v in sorted(per_bucket.items()):
            v = np.array(v)
            print(f"  {k}: n={len(v)} first={v[0]*1e3:.0f}ms "
                  f"median={np.median(v)*1e3:.1f}ms sum={v.sum():.1f}s")


if __name__ == "__main__":
    main()
