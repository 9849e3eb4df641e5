"""Dump optimized HLO for the train step at the bench shape; print gathers."""
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from __graft_entry__ import _trained_config_model, _synthetic_batch
    from caster_dta_tpu.train.loop import TrainConfig, Trainer

    batch = _synthetic_batch(b=32, n_p=512, e_p=4096, n_m=64, e_m=256, seed=0)
    model = _trained_config_model()
    cfg = TrainConfig(seed=0, optimizer="adam", lr=1e-4,
                      compute_dtype="bfloat16")
    trainer = Trainer(model, cfg, batch)
    lowered = trainer._train_step.lower(
        trainer.params, trainer.opt_state, batch, trainer.rng,
        np.float32(1e-4))
    txt = lowered.compile().as_text()
    with open("/tmp/bench_step.hlo", "w") as f:
        f.write(txt)
    print(f"HLO dumped: {len(txt)} chars")
    for m in re.finditer(r"%gather\.\d+ = [^\n]*", txt):
        line = m.group(0)
        if "take_along_axis" in line or "gather" in line:
            print(line[:300], "\n")


if __name__ == "__main__":
    main()
