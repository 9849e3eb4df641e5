"""Wall-time Davis train+val epochs through Trainer.train_epoch (production
path: device-resident store + per-bucket lax.scan dispatch).

Usage: python scripts/time_scan_epoch.py [n_epochs] [scan:0|1]
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

    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scan = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True

    path = ("/tmp/davis_structs/00_datasetobj__84f81e58d17456264bf36d8186"
            "01e61dc06f91a696c9b5d8e8595c2ab3b4bd6a_1f3c8728fef7a4075ba05f"
            "c42c45491d39a774398e3214a7d5a26d880fb5fc95.pkl")
    with open(path, "rb") as f:
        dataset = pickle.load(f)

    from caster_dta_tpu.data.batching import BucketedLoader, dataset_budgets
    from caster_dta_tpu.data.device_cache import DeviceResidentLoader
    from caster_dta_tpu.train.loop import TrainConfig, Trainer, split_dataset
    import __graft_entry__ as ge

    max_num, max_bs = dataset_budgets("davis")
    train_idx, val_idx, _ = split_dataset(dataset, 9)
    train_dl = DeviceResidentLoader.maybe(
        BucketedLoader(dataset, train_idx, max_num=max_num,
                       max_batch_size=max_bs, shuffle=True, seed=9),
        4_000_000_000)
    val_dl = DeviceResidentLoader.maybe(
        BucketedLoader(dataset, val_idx, max_num=max_num,
                       max_batch_size=max_bs, shuffle=False, seed=10),
        4_000_000_000)
    print(f"{len(train_dl)} train batches; scan={scan}")

    model = ge._trained_config_model()
    cfg = TrainConfig(seed=9, compute_dtype="bfloat16", scan_steps=scan)
    example = next(iter(train_dl))
    getattr(train_dl, "loader", train_dl).epoch = 0
    t0 = time.time()
    trainer = Trainer(model, cfg, example)
    print(f"trainer init {time.time()-t0:.1f}s")

    unscale = dataset.unscale_target
    lr = 1e-4
    for ep in range(n_epochs):
        t0 = time.time()
        tr_loss, lr = trainer.train_epoch(train_dl, lr, epoch=ep,
                                          total_train=len(train_idx),
                                          unscale=unscale)
        t_tr = time.time() - t0
        t0 = time.time()
        val_loss, *_ = trainer.eval_epoch(val_dl, unscale=unscale)
        t_val = time.time() - t0
        print(f"epoch {ep}: train {t_tr:.1f}s (loss {tr_loss:.4f}) "
              f"val {t_val:.1f}s (loss {val_loss:.4f})", flush=True)


if __name__ == "__main__":
    main()
