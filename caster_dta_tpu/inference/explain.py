"""Node-mask explanation (GNNExplainer-equivalent).

Behavioral spec: reference explanation/explain_wrapper.py (pyg GNNExplainer,
10 epochs, lr 0.01, explaining one tower at a time). JAX redesign: the mask
optimization is a differentiable program — per-node mask logits multiply the
tower's node features through sigmoid; the loss pulls the masked prediction
toward the full prediction with size and entropy regularizers (pyg
GNNExplainer coefficients), optimized with Adam under jit.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import optax


class DTAModelExplainer:
    """explain_model(variables, protein, molecule) -> per-node masks [B, N]."""

    def __init__(self, model, n_epochs: int = 10, lr: float = 0.01,
                 coeff_size: float = 0.005, coeff_ent: float = 0.1):
        self.model = model
        self.n_epochs = n_epochs
        self.lr = lr
        self.coeff_size = coeff_size
        self.coeff_ent = coeff_ent
        self._jit_explain = jax.jit(self._explain, static_argnames=("side",))

    def _masked_forward(self, variables, protein, molecule, mask_logits, side):
        m = jax.nn.sigmoid(mask_logits)[..., None]
        if side == "protein":
            protein = protein.replace(node_s=protein.node_s * m,
                                      node_v=protein.node_v * m[..., None])
        else:
            molecule = molecule.replace(node_s=molecule.node_s * m)
        pred, _ = self.model.apply(variables, protein, molecule,
                                   deterministic=True)
        return pred[:, 0]

    def _explain(self, variables, protein, molecule, side):
        graph = protein if side == "protein" else molecule
        full_pred, _ = self.model.apply(variables, protein, molecule,
                                        deterministic=True)
        full_pred = full_pred[:, 0]

        # pyg GNNExplainer init: N(1, 0.1)-ish small random logits
        logits0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                          graph.node_mask.shape)
        tx = optax.adam(self.lr)
        opt_state = tx.init(logits0)

        def loss_fn(logits):
            pred = self._masked_forward(variables, protein, molecule, logits, side)
            m = jax.nn.sigmoid(logits)
            valid = graph.node_mask
            fit = jnp.mean((pred - full_pred) ** 2)
            size = jnp.sum(jnp.where(valid, m, 0.0)) / jnp.maximum(valid.sum(), 1)
            ent = -m * jnp.log(m + 1e-10) - (1 - m) * jnp.log(1 - m + 1e-10)
            ent = jnp.sum(jnp.where(valid, ent, 0.0)) / jnp.maximum(valid.sum(), 1)
            return fit + self.coeff_size * size + self.coeff_ent * ent

        def step(carry, _):
            logits, opt_state = carry
            grads = jax.grad(loss_fn)(logits)
            updates, opt_state = tx.update(grads, opt_state)
            logits = optax.apply_updates(logits, updates)
            return (logits, opt_state), None

        (logits, _), _ = jax.lax.scan(step, (logits0, opt_state),
                                      None, length=self.n_epochs)
        return jax.nn.sigmoid(logits)

    def explain_model(self, variables, protein, molecule,
                      side: Literal["protein", "molecule", "both"] = "both"):
        out = {}
        if side in ("protein", "both"):
            out["protein"] = self._jit_explain(variables, protein, molecule,
                                               side="protein")
        if side in ("molecule", "both"):
            out["molecule"] = self._jit_explain(variables, protein, molecule,
                                                side="molecule")
        return out
