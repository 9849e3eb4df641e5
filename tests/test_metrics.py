"""Metric parity: the O(n log n) concordance index must match the reference's
O(n²) formula (train_model.py:773-790) on random data with ties."""
import numpy as np

from caster_dta_tpu.train import metrics
from caster_dta_tpu.train.optim import (CosineAnnealingWarmRestartsDecay,
                                        ReduceLROnPlateau)


def _reference_ci(y_true, y_pred):
    """Direct transcription of the published O(n²) formula semantics."""
    summ, pair = 0.0, 0
    for i in range(1, len(y_true)):
        for j in range(0, i):
            pair += 1
            if y_true[i] > y_true[j]:
                summ += 1 * (y_pred[i] > y_pred[j]) + 0.5 * (y_pred[i] == y_pred[j])
            elif y_true[i] < y_true[j]:
                summ += 1 * (y_pred[i] < y_pred[j]) + 0.5 * (y_pred[i] == y_pred[j])
            else:
                pair -= 1
    return summ / pair if pair else 0.0


def test_concordance_matches_reference(rng):
    for trial in range(5):
        n = 60
        y_true = rng.choice([1.0, 2.0, 3.0, 4.5, 5.0], size=n)  # heavy ties
        y_pred = np.round(rng.normal(size=n), 1)                # pred ties too
        fast = metrics.concordance_index(y_true, y_pred)
        slow = _reference_ci(y_true, y_pred)
        np.testing.assert_allclose(fast, slow, rtol=1e-12)


def test_concordance_perfect_and_inverted(rng):
    y = np.arange(10.0)
    assert metrics.concordance_index(y, y) == 1.0
    assert metrics.concordance_index(y, -y) == 0.0


def test_regression_report(rng):
    t = rng.normal(size=100)
    p = t + rng.normal(scale=0.1, size=100)
    rep = metrics.regression_report(p, t)
    assert rep["pearson"] > 0.9
    assert rep["concordance_index"] > 0.9
    assert rep["rmse"] == np.sqrt(rep["mse"])


def test_plateau_scheduler():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=2)
    lrs = [s.step(metric=1.0) for _ in range(10)]  # never improves after first
    # first sets best; then 2 bad epochs tolerated, 3rd decays
    assert lrs[0] == 1.0 and lrs[3] == 0.5 and min(lrs) < 0.5


def test_warm_restart_decay_cycles():
    s = CosineAnnealingWarmRestartsDecay(1.0, T_0=10, decay_rate=0.5)
    assert abs(s.step(0.0) - 1.0) < 1e-9          # cycle 0 start
    near_end = s.step(9.999)
    assert near_end < 0.01                        # cosine bottom
    restart = s.step(10.0)                        # cycle 1 restarts at decayed base
    assert abs(restart - 0.5) < 1e-6


def test_orbax_checkpoint_roundtrip(tmp_path):
    import os
    import jax
    import jax.numpy as jnp
    from caster_dta_tpu.train import checkpoints as C

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    p = os.path.join(str(tmp_path), "ck")
    C.save_params_orbax(params, p)
    tpl = jax.tree_util.tree_map(jnp.zeros_like, params)
    got = C.load_params_orbax(tpl, p)
    np.testing.assert_array_equal(np.asarray(got["a"]["w"]),
                                  np.asarray(params["a"]["w"]))
