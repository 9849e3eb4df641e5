"""Transplant reference PyTorch checkpoints into caster_dta_tpu JAX params.

The reference saves plain ``state_dict`` files (train_model.py:672-682) with a
``_orig_mod.`` prefix when torch.compile was used (inference_utils.py:52-66).
This module maps those tensors onto the flax param tree of models.joint.JointGNN
for the GVP(lbamodel) + GINE trained architecture, enabling bit-level model
parity checks and reuse of pretrained reference models on TPU.

torch Linear stores weight [out, in]; flax Dense kernel is [in, out] -> transpose.
torch MultiheadAttention packs q/k/v into in_proj_weight when kdim==embed_dim.
"""
from __future__ import annotations

import numpy as np


def load_state_dict(path: str) -> dict:
    """Load a reference .pt state dict to numpy, stripping compile prefixes."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        k = k.replace("_orig_mod.", "")
        if k.endswith("dummy_param"):
            continue
        out[k] = np.asarray(v.detach().numpy())
    return out


class _Mapper:
    def __init__(self, sd: dict):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing torch key: {key}")
        self.used.add(key)
        return self.sd[key]

    def linear(self, prefix: str, bias: bool = True) -> dict:
        out = {"kernel": self.take(f"{prefix}.weight").T}
        if bias:
            out["bias"] = self.take(f"{prefix}.bias")
        return out

    def layernorm(self, prefix: str) -> dict:
        return {"scale": self.take(f"{prefix}.weight"),
                "bias": self.take(f"{prefix}.bias")}

    def gvp(self, prefix: str) -> dict:
        """Map one torch GVP module (gvp_layers.py:111-141)."""
        out = {}
        for name in ("wh", "wv"):
            if f"{prefix}.{name}.weight" in self.sd:
                out[name] = self.linear(f"{prefix}.{name}", bias=False)
        if f"{prefix}.ws.weight" in self.sd:
            out["ws"] = self.linear(f"{prefix}.ws",
                                    bias=f"{prefix}.ws.bias" in self.sd)
        if f"{prefix}.wsv.weight" in self.sd:
            out["wsv"] = self.linear(f"{prefix}.wsv")
        return out

    def gvp_layernorm(self, prefix: str) -> dict:
        return {"scalar_norm": self.layernorm(f"{prefix}.scalar_norm")}

    def gvp_conv_layer(self, prefix: str, n_message=3, n_feedforward=2) -> dict:
        out = {"conv": {}}
        for j in range(n_message):
            out["conv"][f"message_{j}"] = self.gvp(f"{prefix}.conv.message_func.{j}")
        out["norm0"] = self.gvp_layernorm(f"{prefix}.norm.0")
        out["norm1"] = self.gvp_layernorm(f"{prefix}.norm.1")
        for j in range(n_feedforward):
            out[f"ff_{j}"] = self.gvp(f"{prefix}.ff_func.{j}")
        return out

    def mha(self, prefix: str, embed_dim: int) -> dict:
        """torch nn.MultiheadAttention -> q/k/v/out projections."""
        out = {}
        if f"{prefix}.in_proj_weight" in self.sd:
            w = self.take(f"{prefix}.in_proj_weight")
            b = self.take(f"{prefix}.in_proj_bias")
            wq, wk, wv = np.split(w, 3, axis=0)
            bq, bk, bv = np.split(b, 3, axis=0)
        else:  # kdim != embed_dim: separate projection weights
            wq = self.take(f"{prefix}.q_proj_weight")
            wk = self.take(f"{prefix}.k_proj_weight")
            wv = self.take(f"{prefix}.v_proj_weight")
            b = self.take(f"{prefix}.in_proj_bias")
            bq, bk, bv = np.split(b, 3, axis=0)
        out["q_proj"] = {"kernel": wq.T, "bias": bq}
        out["k_proj"] = {"kernel": wk.T, "bias": bk}
        out["v_proj"] = {"kernel": wv.T, "bias": bv}
        out["out_proj"] = self.linear(f"{prefix}.out_proj")
        return out

    def gine_conv(self, prefix: str) -> dict:
        out = {
            "eps": self.take(f"{prefix}.eps").reshape(1),
            "edge_lin": self.linear(f"{prefix}.lin"),
            "mlp": {
                "lin0": self.linear(f"{prefix}.nn.lins.0"),
                "lin1": self.linear(f"{prefix}.nn.lins.1"),
            },
        }
        return out


def import_joint_gnn(state_dict: dict, model_kwargs: dict) -> dict:
    """Build the flax params tree for models.joint.JointGNN from a reference
    state dict. Supports the trained architecture family: lbamodel protein
    tower + gine molecule tower (+ any depth/stack sizes)."""
    m = _Mapper(state_dict)
    pk = model_kwargs["protein_gnn_kwargs"]
    mk = model_kwargs["molecule_gnn_kwargs"]
    jk = model_kwargs["joint_gnn_kwargs"]
    if pk["base_conv"] != "lbamodel" or mk["base_conv"] != "gine":
        raise NotImplementedError(
            "transplant currently supports base_conv lbamodel (protein) + gine "
            f"(molecule); got {pk['base_conv']}/{mk['base_conv']}")

    params: dict = {}

    # protein tower
    pg = "protein_gnn.gnn_model"
    prot = {
        "gvp_node_gvp": m.gvp(f"{pg}.gvp_node.0"),
        "gvp_node_norm": m.gvp_layernorm(f"{pg}.gvp_node.1"),
        "gvp_edge_gvp": m.gvp(f"{pg}.gvp_edge.0"),
        "gvp_edge_norm": m.gvp_layernorm(f"{pg}.gvp_edge.1"),
        "gvp_norm_before_scalar": m.gvp_layernorm(f"{pg}.gvp_norm_before_scalar"),
        "gvp_to_scalar": m.gvp(f"{pg}.gvp_to_scalar"),
    }
    for i in range(pk["num_convs"]):
        prot[f"conv_{i}"] = m.gvp_conv_layer(f"{pg}.conv_list.{i}")
    if pk.get("ntype_emb_dim") is not None:
        prot["ntype_embedding"] = {"embedding":
                                   {"embedding": m.take(f"{pg}.ntype_embedding.weight")}}
    if pk.get("etype_emb_dim") is not None:
        prot["etype_embedding"] = {"embedding":
                                   {"embedding": m.take(f"{pg}.etype_embedding.weight")}}
    params["protein_gnn"] = prot

    # molecule tower
    mg = "molecule_gnn.gnn_model"
    mol = {}
    for i in range(mk["num_convs"]):
        mol[f"conv_{i}"] = m.gine_conv(f"{mg}.conv_list.{i}")
    if mk.get("ntype_emb_dim") is not None:
        mol["ntype_embedding"] = {"embedding":
                                  {"embedding": m.take(f"{mg}.ntype_embedding.weight")}}
    if mk.get("etype_emb_dim") is not None:
        mol["etype_embedding"] = {"embedding":
                                  {"embedding": m.take(f"{mg}.etype_embedding.weight")}}
    params["molecule_gnn"] = mol

    # joint head
    for i in range(jk["residue_lin_depth"]):
        params[f"residue_lin{i}"] = m.linear(f"residue_lins.{i}")
    for i in range(jk["atom_lin_depth"]):
        params[f"atom_lin{i}"] = m.linear(f"atom_lins.{i}")

    embed_dim = state_dict["residue_lins.0.weight"].shape[0] \
        if "residue_lins.0.weight" in state_dict else jk["pairwise_embedding_dim"]
    for i in range(jk.get("num_cross_attn_layers", 1)):
        ca = f"cross_attn_module.cross_attn_layers.{i}"
        layer = {
            "preattn_norm1": m.layernorm(f"{ca}.preattn_norm1"),
            "preattn_norm2": m.layernorm(f"{ca}.preattn_norm2"),
            "embed1_to_2": m.mha(f"{ca}.embed1_to_2", embed_dim),
            "embed2_to_1": m.mha(f"{ca}.embed2_to_1", embed_dim),
        }
        if jk.get("include_residual_stream", True):
            layer.update({
                "ff_norm1": m.layernorm(f"{ca}.ff_norm1"),
                "ff_norm2": m.layernorm(f"{ca}.ff_norm2"),
                "ff1_lin0": m.linear(f"{ca}.ff1.0"),
                "ff1_lin1": m.linear(f"{ca}.ff1.3"),
                "ff2_lin0": m.linear(f"{ca}.ff2.0"),
                "ff2_lin1": m.linear(f"{ca}.ff2.3"),
            })
        params[f"cross_attn_{i}"] = layer

    for i in range(jk["protein_lin_depth"]):
        params[f"protein_lin{i}"] = m.linear(f"protein_lins.{i}")
    for i in range(jk["molecule_lin_depth"]):
        params[f"molecule_lin{i}"] = m.linear(f"molecule_lins.{i}")
    params["pm_embed_lin"] = m.linear("pm_embed_lin")
    for i in range(jk["out_lin_depth"]):
        params[f"out_fc_lin{i}"] = m.linear(f"out_fc_layers.{i}")
        if jk.get("out_lin_norm_type") == "layer":
            params[f"out_fc_norm{i}"] = m.layernorm(f"out_fc_norms.{i}")
    params["output_layer"] = m.linear("output_layer")

    unused = set(m.sd) - m.used
    if unused:
        raise ValueError(f"unmapped torch tensors: {sorted(unused)}")
    return {"params": params}


def load_reference_checkpoint(checkpoint_path: str, model_kwargs: dict) -> dict:
    """One-call convenience: .pt path + model_kwargs.json dict -> flax variables."""
    return import_joint_gnn(load_state_dict(checkpoint_path), model_kwargs)
