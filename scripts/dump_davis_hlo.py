"""Dump optimized HLO for the train step on a Davis bucket shape and print
the biggest fusion computations."""
import os
import pickle
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

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
    batch = None
    for b in dl:
        if b.protein.node_s.shape[1] == 768:
            batch = b
            break
    print("batch shapes: p", batch.protein.node_s.shape,
          batch.protein.edge_src.shape)

    model = ge._trained_config_model()
    cfg = TrainConfig(seed=9, compute_dtype="bfloat16")
    trainer = Trainer(model, cfg, batch)
    lowered = trainer._train_step.lower(
        trainer.params, trainer.opt_state, batch, trainer.rng,
        np.float32(1e-4))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/davis_step.hlo", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} chars")

    # print the definitions of the named big fusions
    for name in ["fusion.6", "fusion.7", "fusion.13", "fusion.14",
                 "fusion.4", "fusion.5"]:
        m = re.search(rf"%{re.escape(name)} = [^\n]*", txt)
        if m:
            print("\n===", name)
            print(m.group(0)[:2000])


if __name__ == "__main__":
    main()
