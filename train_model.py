"""CLI shim matching the reference's entry point:
python train_model.py --dataset davis --seed 9 --out-folder F
(behavioral spec: reference train_model.py:23-32)."""
from caster_dta_tpu.train.driver import main

if __name__ == "__main__":
    main()
