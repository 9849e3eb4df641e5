"""Node- and edge-mask explanation (GNNExplainer-equivalent).

Behavioral spec: reference explanation/explain_wrapper.py (pyg GNNExplainer,
10 epochs, lr 0.01, explaining one tower at a time; pyg's algorithm learns a
node-feature mask AND an edge mask jointly). JAX redesign: the mask
optimization is a differentiable program — per-node mask logits multiply the
tower's node features and per-edge logits multiply its edge features through
sigmoids; the loss pulls the masked prediction toward the full prediction
with size and entropy regularizers (pyg GNNExplainer coefficients), optimized
with Adam under a jitted lax.scan.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
import optax


def _mask_reg(m, valid, coeff_size, coeff_ent):
    size = jnp.sum(jnp.where(valid, m, 0.0)) / jnp.maximum(valid.sum(), 1)
    ent = -m * jnp.log(m + 1e-10) - (1 - m) * jnp.log(1 - m + 1e-10)
    ent = jnp.sum(jnp.where(valid, ent, 0.0)) / jnp.maximum(valid.sum(), 1)
    return coeff_size * size + coeff_ent * ent


class DTAModelExplainer:
    """explain_model(variables, protein, molecule) -> dict of masks:
    'protein'/'molecule' per-node [B, N] and 'protein_edges'/'molecule_edges'
    per-edge [B, E] (both in [0, 1], sigmoid of learned logits)."""

    def __init__(self, model, n_epochs: int = 10, lr: float = 0.01,
                 coeff_size: float = 0.005, coeff_ent: float = 0.1,
                 coeff_edge_size: float = 0.005, coeff_edge_ent: float = 1.0):
        self.model = model
        self.n_epochs = n_epochs
        self.lr = lr
        self.coeff_size = coeff_size
        self.coeff_ent = coeff_ent
        self.coeff_edge_size = coeff_edge_size
        self.coeff_edge_ent = coeff_edge_ent
        self._jit_explain = jax.jit(self._explain, static_argnames=("side",))

    def _masked_forward(self, variables, protein, molecule, logits, side):
        m = jax.nn.sigmoid(logits["node"])[..., None]
        em = jax.nn.sigmoid(logits["edge"])[..., None]
        if side == "protein":
            protein = protein.replace(
                node_s=protein.node_s * m,
                node_v=protein.node_v * m[..., None],
                edge_s=protein.edge_s * em,
                edge_v=protein.edge_v * em[..., None])
        else:
            molecule = molecule.replace(node_s=molecule.node_s * m,
                                        edge_s=molecule.edge_s * em)
        pred, _ = self.model.apply(variables, protein, molecule,
                                   deterministic=True)
        return pred[:, 0]

    def _explain(self, variables, protein, molecule, side):
        graph = protein if side == "protein" else molecule
        full_pred, _ = self.model.apply(variables, protein, molecule,
                                        deterministic=True)
        full_pred = full_pred[:, 0]

        # pyg GNNExplainer init: small random logits
        k_n, k_e = jax.random.split(jax.random.PRNGKey(0))
        logits0 = {
            "node": 0.1 * jax.random.normal(k_n, graph.node_mask.shape),
            "edge": 0.1 * jax.random.normal(k_e, graph.edge_mask.shape),
        }
        tx = optax.adam(self.lr)
        opt_state = tx.init(logits0)

        def loss_fn(logits):
            pred = self._masked_forward(variables, protein, molecule,
                                        logits, side)
            fit = jnp.mean((pred - full_pred) ** 2)
            reg_n = _mask_reg(jax.nn.sigmoid(logits["node"]), graph.node_mask,
                              self.coeff_size, self.coeff_ent)
            reg_e = _mask_reg(jax.nn.sigmoid(logits["edge"]), graph.edge_mask,
                              self.coeff_edge_size, self.coeff_edge_ent)
            return fit + reg_n + reg_e

        def step(carry, _):
            logits, opt_state = carry
            grads = jax.grad(loss_fn)(logits)
            updates, opt_state = tx.update(grads, opt_state)
            logits = optax.apply_updates(logits, updates)
            return (logits, opt_state), None

        (logits, _), _ = jax.lax.scan(step, (logits0, opt_state),
                                      None, length=self.n_epochs)
        return (jax.nn.sigmoid(logits["node"]),
                jax.nn.sigmoid(logits["edge"]))

    def explain_model(self, variables, protein, molecule,
                      side: Literal["protein", "molecule", "both"] = "both"):
        out = {}
        if side in ("protein", "both"):
            nm, em = self._jit_explain(variables, protein, molecule,
                                       side="protein")
            out["protein"], out["protein_edges"] = nm, em
        if side in ("molecule", "both"):
            nm, em = self._jit_explain(variables, protein, molecule,
                                       side="molecule")
            out["molecule"], out["molecule_edges"] = nm, em
        return out
