"""Pure-torch re-execution of the reference CASTER-DTA(2,2) forward pass.

A from-scratch torch implementation of the reference model semantics
(gvp_layers.py:111-415, protein_gnn.py:289-388, molecule_gnn.py:208-280,
joint_gnn.py:15-452) with torch_scatter/PyG replaced by index_add — module
and parameter names match the reference state dict exactly, so the pretrained
checkpoint loads with ``load_state_dict`` and the forward can be compared
activation-by-activation against the transplanted JAX model. Test-only code;
the framework itself never imports this.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


def _norm_no_nan(x, axis=-1, keepdims=False, eps=1e-8, sqrt=True):
    out = torch.clamp(torch.sum(torch.square(x), axis, keepdims), min=eps)
    return torch.sqrt(out) if sqrt else out


class TorchGVP(nn.Module):
    """Reference GVP (gvp_layers.py:111-175): wh lift, row norms into ws,
    wv output, optional vector gate wsv."""

    def __init__(self, in_dims, out_dims, h_dim=None,
                 activations=(F.relu, torch.sigmoid), vector_gate=False):
        super().__init__()
        self.si, self.vi = in_dims
        self.so, self.vo = out_dims
        self.vector_gate = vector_gate
        if self.vi:
            self.h_dim = h_dim or max(self.vi, self.vo)
            self.wh = nn.Linear(self.vi, self.h_dim, bias=False)
            self.ws = nn.Linear(self.h_dim + self.si, self.so)
            if self.vo:
                self.wv = nn.Linear(self.h_dim, self.vo, bias=False)
                if vector_gate:
                    self.wsv = nn.Linear(self.so, self.vo)
        else:
            self.ws = nn.Linear(self.si, self.so)
        self.scalar_act, self.vector_act = activations
        self.dummy_param = nn.Parameter(torch.empty(0))

    def forward(self, x):
        if self.vi:
            s, v = x
            v = torch.transpose(v, -1, -2)            # [..., 3, vi]
            vh = self.wh(v)
            vn = _norm_no_nan(vh, axis=-2)
            s = self.ws(torch.cat([s, vn], -1))
            if self.vo:
                v = torch.transpose(self.wv(vh), -1, -2)
                if self.vector_gate:
                    gate = (self.wsv(self.vector_act(s)) if self.vector_act
                            else self.wsv(s))
                    v = v * torch.sigmoid(gate).unsqueeze(-1)
                elif self.vector_act:
                    v = v * self.vector_act(
                        _norm_no_nan(v, axis=-1, keepdims=True))
        else:
            s = self.ws(x)
            if self.vo:
                v = torch.zeros(s.shape[0], self.vo, 3)
        if self.scalar_act:
            s = self.scalar_act(s)
        return (s, v) if self.vo else s


class TorchGVPLayerNorm(nn.Module):
    """Reference LayerNorm (gvp_layers.py:221-242): scalar LN + vector RMS."""

    def __init__(self, dims):
        super().__init__()
        self.s, self.v = dims
        self.scalar_norm = nn.LayerNorm(self.s)

    def forward(self, x):
        if not self.v:
            return self.scalar_norm(x)
        s, v = x
        vn = _norm_no_nan(v, axis=-1, keepdims=True, sqrt=False)
        vn = torch.sqrt(torch.mean(vn, dim=-2, keepdim=True))
        return self.scalar_norm(s), v / vn


def _tuple_cat(*args):
    s_args, v_args = zip(*args)
    return torch.cat(s_args, -1), torch.cat(v_args, -2)


class TorchGVPConv(nn.Module):
    """Reference GVPConv (gvp_layers.py:244-308) with propagate/scatter
    replaced by gather + index_add (aggr: 'add'/'sum' or 'mean')."""

    def __init__(self, in_dims, out_dims, edge_dims, n_layers=3, aggr="mean",
                 activations=(F.relu, torch.sigmoid), vector_gate=False):
        super().__init__()
        self.so, self.vo = out_dims
        self.aggr = aggr
        si, vi = in_dims
        se, ve = edge_dims
        mk = lambda i, o, act: TorchGVP(i, o, activations=act,
                                        vector_gate=vector_gate)
        mods = []
        if n_layers == 1:
            mods.append(mk((2 * si + se, 2 * vi + ve), out_dims, (None, None)))
        else:
            mods.append(mk((2 * si + se, 2 * vi + ve), out_dims, activations))
            for _ in range(n_layers - 2):
                mods.append(mk(out_dims, out_dims, activations))
            mods.append(mk(out_dims, out_dims, (None, None)))
        self.message_func = nn.Sequential(*mods)

    def forward(self, x, edge_index, edge_attr):
        s, v = x
        src, dst = edge_index[0], edge_index[1]
        msg = _tuple_cat((s[src], v[src]), edge_attr, (s[dst], v[dst]))
        for m in self.message_func:
            msg = m(msg)
        m_s, m_v = msg
        n = s.shape[0]
        out_s = torch.zeros(n, m_s.shape[-1]).index_add_(0, dst, m_s)
        out_v = torch.zeros(n, m_v.shape[-2], 3).index_add_(0, dst, m_v)
        if self.aggr == "mean":
            cnt = torch.zeros(n).index_add_(
                0, dst, torch.ones_like(dst, dtype=torch.float32))
            cnt = cnt.clamp(min=1)
            out_s = out_s / cnt[:, None]
            out_v = out_v / cnt[:, None, None]
        return out_s, out_v


class TorchGVPConvLayer(nn.Module):
    """Reference GVPConvLayer (gvp_layers.py:311-415), eval mode (dropout
    off); autoregressive/node_mask paths omitted (unused in trained config)."""

    def __init__(self, node_dims, edge_dims, n_message=3, n_feedforward=2,
                 activations=(F.relu, torch.sigmoid), vector_gate=False,
                 aggr=None):
        super().__init__()
        aggr = aggr or "mean"
        self.conv = TorchGVPConv(node_dims, node_dims, edge_dims, n_message,
                                 aggr=aggr, activations=activations,
                                 vector_gate=vector_gate)
        self.norm = nn.ModuleList([TorchGVPLayerNorm(node_dims)
                                   for _ in range(2)])
        # reference Dropout(_VDropout) carries a dummy_param (gvp_layers.py:179)
        def _drop():
            d = nn.Module()
            d.vdropout = nn.Module()
            d.vdropout.dummy_param = nn.Parameter(torch.empty(0))
            return d
        self.dropout = nn.ModuleList([_drop(), _drop()])
        ff = []
        if n_feedforward == 1:
            ff.append(TorchGVP(node_dims, node_dims, activations=(None, None),
                               vector_gate=vector_gate))
        else:
            hid = (4 * node_dims[0], 2 * node_dims[1])
            ff.append(TorchGVP(node_dims, hid, activations=activations,
                               vector_gate=vector_gate))
            for _ in range(n_feedforward - 2):
                ff.append(TorchGVP(hid, hid, activations=activations,
                                   vector_gate=vector_gate))
            ff.append(TorchGVP(hid, node_dims, activations=(None, None),
                               vector_gate=vector_gate))
        self.ff_func = nn.Sequential(*ff)

    def forward(self, x, edge_index, edge_attr):
        dh = self.conv(x, edge_index, edge_attr)
        x = self.norm[0]((x[0] + dh[0], x[1] + dh[1]))
        dh = x
        for m in self.ff_func:
            dh = m(dh)
        return self.norm[1]((x[0] + dh[0], x[1] + dh[1]))


class TorchLBAModel(nn.Module):
    """Reference VectorProteinGNN_LBAModel (protein_gnn.py:289-388)."""

    def __init__(self, in_channels, edge_dim, num_ntypes, num_etypes,
                 num_convs, hidden_channels, edge_hidden_channels,
                 out_channels, aggr="mean", **_):
        super().__init__()
        self.num_ntypes, self.num_etypes = num_ntypes, num_etypes
        node_in = (in_channels[0] + num_ntypes, in_channels[1])
        edge_in = (edge_dim[0] + num_etypes, edge_dim[1])
        hidden = tuple(hidden_channels)
        out = (out_channels, 0)
        relu = nn.ReLU()
        self.gvp_node = nn.Sequential(
            TorchGVP(node_in, hidden, activations=(None, None),
                     vector_gate=True),
            TorchGVPLayerNorm(hidden))
        self.gvp_edge = nn.Sequential(
            TorchGVP(edge_in, tuple(edge_hidden_channels),
                     activations=(None, None), vector_gate=True),
            TorchGVPLayerNorm(tuple(edge_hidden_channels)))
        self.conv_list = nn.ModuleList([
            TorchGVPConvLayer(hidden, tuple(edge_hidden_channels),
                              activations=(relu, None), vector_gate=True,
                              aggr=aggr)
            for _ in range(num_convs)])
        self.gvp_norm_before_scalar = TorchGVPLayerNorm(hidden)
        self.gvp_to_scalar = TorchGVP(hidden, out, activations=(relu, None),
                                      vector_gate=True)

    def forward(self, x, edge_index, ntypes, etypes, eattr):
        x_s, x_v = x
        e_s, e_v = eattr
        x_s = torch.cat([F.one_hot(ntypes, self.num_ntypes), x_s], -1)
        e_s = torch.cat([F.one_hot(etypes, self.num_etypes), e_s], -1)
        x = (x_s, x_v)
        eattr = (e_s, e_v)
        for m in self.gvp_node:
            x = m(x)
        for m in self.gvp_edge:
            eattr = m(eattr)
        for conv in self.conv_list:
            x = conv(x, edge_index, eattr)
        x = self.gvp_norm_before_scalar(x)
        return self.gvp_to_scalar(x)     # scalar-only (out vector dim 0)


class _GINEConvMirror(nn.Module):
    """PyG GINEConv semantics with edge_dim projection: out = mlp((1+eps)*x +
    sum_j relu(x_j + lin(e_ji))); mlp = lins.1(act(lins.0(.)))."""

    def __init__(self, in_ch, out_ch, edge_dim, act):
        super().__init__()
        self.eps = nn.Parameter(torch.zeros(1))
        mlp = nn.Module()
        mlp.lins = nn.ModuleList([nn.Linear(in_ch, out_ch),
                                  nn.Linear(out_ch, out_ch)])
        self.nn = mlp
        self.lin = nn.Linear(edge_dim, in_ch)
        self.act = act

    def forward(self, x, edge_index, edge_attr):
        src, dst = edge_index[0], edge_index[1]
        msg = F.relu(x[src] + self.lin(edge_attr))
        agg = torch.zeros_like(x).index_add_(0, dst, msg)
        h = (1 + self.eps) * x + agg
        return self.nn.lins[1](self.act(self.nn.lins[0](h)))


class TorchGINEModel(nn.Module):
    """Reference HomoMoleculeGNN_GINE (molecule_gnn.py:208-280), eval mode."""

    def __init__(self, in_channels, edge_dim, num_ntypes, num_etypes,
                 num_convs, hidden_channels, out_channels,
                 activation="leaky_relu", **_):
        super().__init__()
        self.num_ntypes, self.num_etypes = num_ntypes, num_etypes
        self.act = (nn.LeakyReLU() if activation == "leaky_relu"
                    else nn.ReLU())
        dims = ([in_channels + num_ntypes]
                + [hidden_channels] * (num_convs - 1) + [out_channels])
        self.conv_list = nn.ModuleList([
            _GINEConvMirror(dims[i], dims[i + 1], edge_dim + num_etypes,
                            self.act)
            for i in range(num_convs)])

    def forward(self, x, edge_index, ntypes, etypes, eattr):
        x = torch.cat([F.one_hot(ntypes, self.num_ntypes).float(), x], -1)
        eattr = torch.cat([F.one_hot(etypes, self.num_etypes).float(),
                           eattr], -1)
        for conv in self.conv_list[:-1]:
            x = self.act(conv(x, edge_index, eattr))
        return self.act(self.conv_list[-1](x, edge_index, eattr))


def _to_dense_batch(x, batch, b):
    """PyG to_dense_batch equivalent: [Ntot, D] + graph ids -> [B, R, D], mask."""
    counts = torch.bincount(batch, minlength=b)
    r = int(counts.max())
    out = torch.zeros(b, r, x.shape[-1])
    mask = torch.zeros(b, r, dtype=torch.bool)
    for g in range(b):
        n = int(counts[g])
        out[g, :n] = x[batch == g]
        mask[g, :n] = True
    return out, mask


class _CrossAttnMirror(nn.Module):
    """Reference CrossAttentionModule (joint_gnn.py:321-408), eval mode."""

    def __init__(self, d1, d2, heads, ff_scale):
        super().__init__()
        self.preattn_norm1 = nn.LayerNorm(d1)
        self.preattn_norm2 = nn.LayerNorm(d2)
        self.embed1_to_2 = nn.MultiheadAttention(d1, heads, kdim=d2, vdim=d2,
                                                 batch_first=True)
        self.embed2_to_1 = nn.MultiheadAttention(d2, heads, kdim=d1, vdim=d1,
                                                 batch_first=True)
        self.ff_norm1 = nn.LayerNorm(d1)
        self.ff_norm2 = nn.LayerNorm(d2)
        self.ff1 = nn.Sequential(nn.Linear(d1, d1 * ff_scale), nn.ReLU(),
                                 nn.Dropout(0.0),
                                 nn.Linear(d1 * ff_scale, d1))
        self.ff2 = nn.Sequential(nn.Linear(d2, d2 * ff_scale), nn.ReLU(),
                                 nn.Dropout(0.0),
                                 nn.Linear(d2 * ff_scale, d2))

    def forward(self, e1, e2, mask1, mask2):
        x1n, x2n = self.preattn_norm1(e1), self.preattn_norm2(e2)
        x1a, w1 = self.embed1_to_2(x1n, x2n, x2n, key_padding_mask=~mask2)
        x2a, w2 = self.embed2_to_1(x2n, x1n, x1n, key_padding_mask=~mask1)
        e1 = e1 + x1a
        e1 = e1 + self.ff1(self.ff_norm1(e1))
        e2 = e2 + x2a
        e2 = e2 + self.ff2(self.ff_norm2(e2))
        return e1, e2, (w1, w2)


class _Holder(nn.Module):
    pass


class TorchJointGNN(nn.Module):
    """Reference JointGNN (joint_gnn.py:15-317) for the trained config
    family (lbamodel + gine, one-hot type embeds), eval mode. Parameter
    names match the reference state dict exactly."""

    def __init__(self, protein_gnn_kwargs, molecule_gnn_kwargs,
                 residue_lin_depth, atom_lin_depth, n_attention_heads,
                 protein_lin_depth, molecule_lin_depth,
                 pairwise_embedding_dim, out_lin_depth, out_lin_factor=0.5,
                 activation="leaky_relu", residual_dim_ff_scale=2,
                 num_cross_attn_layers=1, **_):
        super().__init__()
        self.activation = (nn.LeakyReLU() if activation == "leaky_relu"
                           else nn.ReLU())
        self.protein_gnn = _Holder()
        self.protein_gnn.gnn_model = TorchLBAModel(**protein_gnn_kwargs)
        self.molecule_gnn = _Holder()
        self.molecule_gnn.gnn_model = TorchGINEModel(**molecule_gnn_kwargs)

        def lins(depth, d_in, factor=2):
            mods, d = [], d_in
            for _ in range(depth):
                d_out = int(d * factor)
                mods.append(nn.Linear(d, d_out))
                d = d_out
            return nn.ModuleList(mods), d

        p_out = protein_gnn_kwargs["out_channels"]
        m_out = molecule_gnn_kwargs["out_channels"]
        self.residue_lins, d1 = lins(residue_lin_depth, p_out)
        self.atom_lins, d2 = lins(atom_lin_depth, m_out)
        self.cross_attn_module = _Holder()
        self.cross_attn_module.cross_attn_layers = nn.ModuleList([
            _CrossAttnMirror(d1, d2, n_attention_heads,
                             residual_dim_ff_scale)
            for _ in range(num_cross_attn_layers)])
        self.protein_lins, dp = lins(protein_lin_depth, d1)
        self.molecule_lins, dm = lins(molecule_lin_depth, d2)
        self.pm_embed_lin = nn.Linear(dp + dm, pairwise_embedding_dim)
        self.out_fc_layers, do = lins(out_lin_depth, pairwise_embedding_dim,
                                      out_lin_factor)
        self.output_layer = nn.Linear(do, 1)

    def forward(self, pdata, mdata, b):
        """pdata/mdata: dicts with x/edge_index/ntypes/etypes/eattr/batch
        (concatenated multi-graph COO, the reference's collated format).
        Returns (score, intermediates dict)."""
        inter = {}
        res = self.protein_gnn.gnn_model(
            pdata["x"], pdata["edge_index"], pdata["ntypes"],
            pdata["etypes"], pdata["eattr"])
        atom = self.molecule_gnn.gnn_model(
            mdata["x"], mdata["edge_index"], mdata["ntypes"],
            mdata["etypes"], mdata["eattr"])
        inter["residue_embed"] = res
        inter["atom_embed"] = atom
        for lin in self.residue_lins:
            res = self.activation(lin(res))
        for lin in self.atom_lins:
            atom = self.activation(lin(atom))
        res, rmask = _to_dense_batch(res, pdata["batch"], b)
        atom, amask = _to_dense_batch(atom, mdata["batch"], b)
        for layer in self.cross_attn_module.cross_attn_layers:
            res, atom, attn = layer(res, atom, rmask, amask)
        p = (res * rmask.unsqueeze(-1)).sum(1) / rmask.sum(1, keepdim=True)
        m = (atom * amask.unsqueeze(-1)).sum(1) / amask.sum(1, keepdim=True)
        inter["protein_pooled"] = p
        inter["molecule_pooled"] = m
        p = self.activation(p)
        m = self.activation(m)
        for lin in self.protein_lins:
            p = self.activation(lin(p))
        for lin in self.molecule_lins:
            m = self.activation(lin(m))
        x = self.activation(self.pm_embed_lin(torch.cat([p, m], -1)))
        for lin in self.out_fc_layers:
            x = self.activation(lin(x))
        return self.output_layer(x), inter


def load_reference_into_mirror(ckpt_path: str, model_kwargs: dict):
    """Build the mirror and load the reference checkpoint strictly (every
    tensor must land on an identically-named, identically-shaped param)."""
    model = TorchJointGNN(model_kwargs["protein_gnn_kwargs"],
                          model_kwargs["molecule_gnn_kwargs"],
                          **model_kwargs["joint_gnn_kwargs"])
    sd = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = {k.replace("_orig_mod.", ""): v for k, v in sd.items()}
    # our mirror's eval-mode dropout-free modules have no extra params;
    # strict load is THE transplant check on the torch side
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model
