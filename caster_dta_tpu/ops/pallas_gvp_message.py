"""Pallas TPU kernel: the fused GVP message MLP.

The GVPConv hot path (reference models/gvp_layers.py:291-308) computes, per
edge, a 3-layer gated Geometric Vector Perceptron MLP over
``cat((s_j, v_j), edge_attr, (s_i, v_i))`` and aggregates the result. Under
XLA this lowers to ~10 HBM-materialized [B, E, ·] intermediates per conv
(forward activations + AD residuals), and — worse — XLA's layout assignment
picks an edge-minor layout for the gathered endpoint tensor to please the
small-K message matmuls, which turns the endpoint gather into strided
2-byte-element reads (~92 us vs ~22 us for the same gather with row-major
output at the flagship BindingDB bucket).

This kernel runs the whole message MLP as ONE Pallas program per
(graph, edge-block): the gathered endpoints, edge scalars and edge vectors
stream in once, every intermediate lives in VMEM, and only the final
[E, so+3*vo] merged message is written back. A hand-derived backward kernel
(custom VJP) recomputes the forward in VMEM and emits input grads plus
per-weight grads accumulated across the sequential grid. Because Pallas
operands are row-major, the gather feeding this kernel also reverts to the
fast row-gather path.

Vector-channel math on the MXU: vectors are handled in a *planar* layout
(all-x | all-y | all-z lanes), so the channel lifts ``wh``/``wv`` become
block-diagonal ``kron(I_3, W)`` matmuls. The interleaved->planar input
permutation and the planar->interleaved output permutation are folded into
the expanded weights, which are built OUTSIDE the custom_vjp boundary in
differentiable XLA ops — so gradients w.r.t. the original flax parameters
come out of jax.grad with no extra plumbing.

Numerics match nn/gvp.GVP exactly up to mixed-precision rounding:
norm_no_nan's eps=1e-8 clamp (with the matching zero-derivative inside the
clamp), pre-activation vector gating, and bias placement all mirror
gvp_layers.py:111-175 of the reference.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-8


# --------------------------------------------------------------------- utils
def _kron3(w: jnp.ndarray) -> jnp.ndarray:
    """Planar-in/planar-out channel lift: block_diag(w, w, w)."""
    return jnp.kron(jnp.eye(3, dtype=w.dtype), w)


def expand_weights(layer_params: Sequence[dict], v_parts: Sequence[int]):
    """Build the kernel's expanded weight list from the three GVP param
    subtrees (keys wh/ws/wv/wsv as created by nn/gvp.GVP) — differentiable.

    v_parts: channel counts of the concatenated vector input (vj, ve, vi);
    the interleaved->planar permutation of that concatenation is folded into
    layer 0's lift, and planar->interleaved is folded into the final wv.
    """
    n_vin = sum(v_parts)
    # interleaved layout of cat(vj_int, ve_int, vi_int): build permutation
    parts_perm = np.zeros((3 * n_vin, 3 * n_vin), np.float32)
    col = 0
    ch_base = 0
    for npart in v_parts:
        for c in range(npart):
            for d in range(3):
                parts_perm[col, d * n_vin + (ch_base + c)] = 1.0
                col += 1
        ch_base += npart
    ws = []
    n_layers = len(layer_params)
    for k, p in enumerate(layer_params):
        wh = p["wh"]["kernel"]                      # [vi, h]
        lift = _kron3(wh)                           # [3vi, 3h]
        if k == 0:
            lift = jnp.asarray(parts_perm, wh.dtype) @ lift
        wv = p["wv"]["kernel"]                      # [h, vo]
        wvo = _kron3(wv)                            # [3h, 3vo] planar out
        ws.extend([
            lift,
            p["ws"]["kernel"],                      # [s_in + h, so]
            p["ws"]["bias"].reshape(1, -1),
            wvo,
            p["wsv"]["kernel"],                     # [so, vo]
            p["wsv"]["bias"].reshape(1, -1),
        ])
    return ws


def _dot(a, b, cdt):
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tile3(x):
    """[E, c] -> planar [E, 3c] (same values per plane)."""
    return jnp.concatenate([x, x, x], axis=1)


def _planar_to_int_mat(vo: int) -> jnp.ndarray:
    """[3vo, 3vo] permutation matrix, planar (d*vo+c) -> interleaved (c*3+d),
    built from iotas so it can live inside a kernel as a constant."""
    n = 3 * vo
    p = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)   # planar index
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)   # interleaved index
    return ((p // vo == i % 3) & (p % vo == i // 3)).astype(jnp.float32)


def _act(name, x):
    if name == "relu":
        return jnp.maximum(x, 0.0)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    return x


def _dact(name, x):
    """Derivative of _act evaluated at pre-activation x."""
    if name == "relu":
        return (x > 0.0).astype(x.dtype)
    if name == "sigmoid":
        s = jax.nn.sigmoid(x)
        return s * (1.0 - s)
    return jnp.ones_like(x)


def _layer_fwd(s, vpl, w, acts, cdt, keep=False):
    """One gated GVP layer on planar vectors. Returns (s_out [E,so],
    v_out planar-or-interleaved [E,3vo], cache for backward)."""
    lift, wsk, wsb, wvo, wsvk, wsvb = w
    sact, vact = acts
    h = lift.shape[1] // 3
    vh = _dot(vpl, lift, cdt)                       # [E, 3h] f32
    q = vh[:, :h] ** 2 + vh[:, h:2 * h] ** 2 + vh[:, 2 * h:] ** 2
    vn = jnp.sqrt(jnp.maximum(q, EPS))              # [E, h]
    sin_full = jnp.concatenate([s.astype(jnp.float32), vn], axis=1)
    spre = _dot(sin_full, wsk, cdt) + wsb.astype(jnp.float32)   # [E, so]
    vraw = _dot(vh.astype(cdt), wvo, cdt)           # [E, 3vo]
    gi = _act(vact, spre)
    z = _dot(gi, wsvk, cdt) + wsvb.astype(jnp.float32)          # [E, vo]
    g = jax.nn.sigmoid(z)
    vout = vraw * _tile3(g)
    sout = _act(sact, spre)
    cache = (s, vpl, vh, q, vn, spre, vraw, gi, g) if keep else None
    return sout, vout, cache


def _layer_bwd(cache, w, acts, cdt, dsout, dvout):
    """Backward of _layer_fwd. Returns (ds_in, dv_in_planar, dW tuple)."""
    lift, wsk, wsb, wvo, wsvk, wsvb = w
    sact, vact = acts
    h = lift.shape[1] // 3
    s, vpl, vh, q, vn, spre, vraw, gi, g = cache
    vo = g.shape[1]

    dspre = dsout * _dact(sact, spre)
    dvraw = dvout * _tile3(g)
    dg = (dvout[:, :vo] * vraw[:, :vo]
          + dvout[:, vo:2 * vo] * vraw[:, vo:2 * vo]
          + dvout[:, 2 * vo:] * vraw[:, 2 * vo:])
    dz = dg * g * (1.0 - g)
    # weight grads via [in, E] x [E, out] contractions
    dwsvk = jax.lax.dot_general(
        gi.astype(cdt), dz.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [so, vo]
    dwsvb = jnp.sum(dz, axis=0, keepdims=True)
    dgi = _dot(dz, wsvk.T, cdt)
    dspre = dspre + dgi * _dact(vact, spre)

    sin_full = jnp.concatenate([s.astype(jnp.float32), vn], axis=1)
    dwsk = jax.lax.dot_general(
        sin_full.astype(cdt), dspre.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [s_in+h, so]
    dwsb = jnp.sum(dspre, axis=0, keepdims=True)
    dsin = _dot(dspre, wsk.T, cdt)                   # [E, s_in+h]
    s_in_dim = sin_full.shape[1] - h
    ds = dsin[:, :s_in_dim]
    dvn = dsin[:, s_in_dim:]

    dvh = _dot(dvraw, wvo.T, cdt)                    # [E, 3h]
    dwvo = jax.lax.dot_general(
        vh.astype(cdt), dvraw.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [3h, 3vo]
    coef = jnp.where(q > EPS, dvn / vn, 0.0)         # [E, h]
    dvh = dvh + vh * _tile3(coef)

    dvpl = _dot(dvh, lift.T, cdt)                    # [E, 3vi]
    dlift = jax.lax.dot_general(
        vpl.astype(cdt), dvh.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [3vi, 3h]
    return ds, dvpl, (dlift, dwsk, dwsb, dwvo, dwsvk, dwsvb)


def _assemble(bj_ref, bi_ref, es_ref, ev_ref, ns, cdt):
    """Build the concatenated message input from per-block refs."""
    bj = bj_ref[0]
    bi = bi_ref[0]
    es = es_ref[0]
    ev = ev_ref[0]
    s_cat = jnp.concatenate(
        [bj[:, :ns], es, bi[:, :ns]], axis=1).astype(cdt)
    v_int = jnp.concatenate(
        [bj[:, ns:], ev, bi[:, ns:]], axis=1).astype(cdt)  # interleaved cat
    return s_cat, v_int


# ----------------------------------------------------------------- layout pin
def _ident_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def _cast_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0].astype(o_ref.dtype)


def _pallas_copy(x, dtype=None):
    dtype = dtype or x.dtype
    return pl.pallas_call(
        _cast_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        grid_spec=pl.GridSpec(
            grid=(x.shape[0],),
            in_specs=[pl.BlockSpec((1,) + x.shape[1:],
                                   lambda i, nd=x.ndim: (i,) + (0,) * (nd - 1),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,) + x.shape[1:],
                                   lambda i, nd=x.ndim: (i,) + (0,) * (nd - 1),
                                   memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def layout_pin(x, dtype=None):
    """Identity(+cast) that forces default (row-major) layout on its operand
    and result, in both passes.

    XLA's layout assignment puts the node dim minor on the [B, N, F] node
    table (to please the downstream small-K matmuls), which turns the
    per-edge endpoint gather into F strided element reads per row (~92 us
    vs ~22 us at the flagship bucket). Pallas operands are always row-major,
    so copying the 0.9 MB node table through VMEM (~3 us) pins the fast
    row-gather path; the backward pin does the same for the scatter-add's
    output. An optional dtype cast rides along for free (e.g. f32 -> bf16 so
    the downstream gather moves half the bytes).
    """
    return _pallas_copy(x, dtype)


def _pin_fwd(x, dtype):
    return _pallas_copy(x, dtype), jnp.zeros((0,), x.dtype)


def _pin_bwd(dtype, res, g):
    return (_pallas_copy(g, res.dtype),)


layout_pin.defvjp(_pin_fwd, _pin_bwd)


# ------------------------------------------------------------------- kernels
def _fwd_kernel(bj_ref, bi_ref, es_ref, ev_ref, *rest, ns, nv,
                acts_mid, acts_last, n_layers, cdt_name):
    w_refs, out_ref = rest[:-1], rest[-1]
    cdt = jnp.dtype(cdt_name)
    s, v = _assemble(bj_ref, bi_ref, es_ref, ev_ref, ns, cdt)
    # layer 0's lift includes the interleaved->planar permutation
    for k in range(n_layers):
        w = [w_refs[6 * k + i][:] for i in range(6)]
        acts = acts_mid if k < n_layers - 1 else acts_last
        s_f32, vout, _ = _layer_fwd(s, v, w, acts, cdt)
        s, v = s_f32.astype(cdt), vout.astype(cdt)
    vo = v.shape[1] // 3
    v_int = _dot(v, _planar_to_int_mat(vo), jnp.float32)
    out_ref[0] = jnp.concatenate(
        [s.astype(out_ref.dtype), v_int.astype(out_ref.dtype)], axis=1)


def _bwd_kernel(bj_ref, bi_ref, es_ref, ev_ref, *rest, ns, nv,
                acts_mid, acts_last, n_layers, cdt_name, nw):
    w_refs = rest[:nw]
    dout_ref = rest[nw]
    dbj_ref, dbi_ref, des_ref, dev_ref = rest[nw + 1:nw + 5]
    dw_refs = rest[nw + 5:]
    cdt = jnp.dtype(cdt_name)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    s, v = _assemble(bj_ref, bi_ref, es_ref, ev_ref, ns, cdt)
    ws = [[w_refs[6 * k + i][:] for i in range(6)] for k in range(n_layers)]

    # forward recompute, keeping caches
    caches = []
    si, vi = s, v
    for k in range(n_layers):
        acts = acts_mid if k < n_layers - 1 else acts_last
        s_f32, vout, cache = _layer_fwd(si, vi, ws[k], acts, cdt, keep=True)
        caches.append(cache)
        si, vi = s_f32.astype(cdt), vout.astype(cdt)

    dout = dout_ref[0]
    so_last = caches[-1][5].shape[1]
    dsout = dout[:, :so_last].astype(jnp.float32)
    dv_int = dout[:, so_last:].astype(jnp.float32)
    vo_last = dv_int.shape[1] // 3
    dvout = _dot(dv_int, _planar_to_int_mat(vo_last).T, jnp.float32)
    all_dw = []
    for k in reversed(range(n_layers)):
        acts = acts_mid if k < n_layers - 1 else acts_last
        dsout, dvout, dwk = _layer_bwd(caches[k], ws[k], acts, cdt,
                                       dsout, dvout)
        all_dw.append(dwk)
    all_dw.reverse()

    # input grads: split the concatenations (layer 0's lift folded the
    # interleave permutation, so dvout is already the interleaved cat grad)
    se = des_ref.shape[-1]
    dsj, dse, dsi = (dsout[:, :ns], dsout[:, ns:ns + se],
                     dsout[:, ns + se:])
    v_j3, v_e3 = 3 * nv, dev_ref.shape[-1]
    dvj = dvout[:, :v_j3]
    dve = dvout[:, v_j3:v_j3 + v_e3]
    dvi = dvout[:, v_j3 + v_e3:]

    odt = dbj_ref.dtype
    dbj_ref[0] = jnp.concatenate([dsj, dvj], axis=1).astype(odt)
    dbi_ref[0] = jnp.concatenate([dsi, dvi], axis=1).astype(odt)
    des_ref[0] = dse.astype(des_ref.dtype)
    dev_ref[0] = dve.astype(dev_ref.dtype)

    flat_dw = [d for dwk in all_dw for d in dwk]

    @pl.when(first)
    def _():
        for ref, val in zip(dw_refs, flat_dw):
            ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        for ref, val in zip(dw_refs, flat_dw):
            ref[:] = ref[:] + val


# ------------------------------------------------------------- pallas setup
def _pick_blk(e: int, cap: int = 512) -> int:
    for blk in (512, 256, 128, 64, 32, 16, 8):
        if blk <= cap and e % blk == 0:
            return blk
    return e


def _specs(e, fb, fs, fv, weights, blk):
    """Input specs: both[j rows], both[i rows] (same array, two block
    views offset by E), edge scalars, edge vectors, then the weights."""
    nblk = e // blk
    wspecs = [pl.BlockSpec(w.shape, lambda bi, ei, n=w.ndim: (0,) * n,
                           memory_space=pltpu.VMEM) for w in weights]
    in_specs = [
        pl.BlockSpec((1, blk, fb), lambda bi, ei: (bi, ei, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, fb), lambda bi, ei, n=nblk: (bi, ei + n, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, fs), lambda bi, ei: (bi, ei, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, blk, fv), lambda bi, ei: (bi, ei, 0),
                     memory_space=pltpu.VMEM),
    ] + wspecs
    return in_specs


def _interpret() -> bool:
    return jax.devices()[0].platform not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnames=(
    "ns", "nv", "acts_mid", "acts_last", "n_layers", "cdt_name", "fo"))
def _fused_fwd(both, es, ev, weights, ns, nv, acts_mid, acts_last,
               n_layers, cdt_name, fo):
    b, e2, fb = both.shape
    e = es.shape[1]
    blk = _pick_blk(e)
    kern = functools.partial(
        _fwd_kernel, ns=ns, nv=nv, acts_mid=acts_mid,
        acts_last=acts_last, n_layers=n_layers, cdt_name=cdt_name)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, e, fo), both.dtype),
        grid_spec=pl.GridSpec(
            grid=(b, e // blk),
            in_specs=_specs(e, fb, es.shape[-1], ev.shape[-1], weights, blk),
            out_specs=pl.BlockSpec((1, blk, fo), lambda bi, ei: (bi, ei, 0),
                                   memory_space=pltpu.VMEM)),
        interpret=_interpret(),
    )(both, both, es, ev, *weights)


@functools.partial(jax.jit, static_argnames=(
    "ns", "nv", "acts_mid", "acts_last", "n_layers", "cdt_name"))
def _fused_bwd(both, es, ev, weights, dout, ns, nv, acts_mid, acts_last,
               n_layers, cdt_name):
    b, e2, fb = both.shape
    e = es.shape[1]
    fo = dout.shape[-1]
    # the unrolled per-layer caches make the backward's VMEM footprint ~4x
    # the forward's — use a smaller edge block
    blk = _pick_blk(e, cap=256)
    nw = len(weights)
    kern = functools.partial(
        _bwd_kernel, ns=ns, nv=nv, acts_mid=acts_mid,
        acts_last=acts_last, n_layers=n_layers, cdt_name=cdt_name, nw=nw)
    in_specs = _specs(e, fb, es.shape[-1], ev.shape[-1], weights, blk)
    in_specs.append(pl.BlockSpec((1, blk, fo), lambda bi, ei: (bi, ei, 0),
                                 memory_space=pltpu.VMEM))
    out_shapes = [
        jax.ShapeDtypeStruct((b, e, fb), both.dtype),   # d_both, src rows
        jax.ShapeDtypeStruct((b, e, fb), both.dtype),   # d_both, dst rows
        jax.ShapeDtypeStruct(es.shape, es.dtype),
        jax.ShapeDtypeStruct(ev.shape, ev.dtype),
    ] + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    blk_spec = lambda f: pl.BlockSpec((1, blk, f), lambda bi, ei: (bi, ei, 0),
                                      memory_space=pltpu.VMEM)
    out_specs = [
        blk_spec(fb), blk_spec(fb),
        blk_spec(es.shape[-1]), blk_spec(ev.shape[-1]),
    ] + [pl.BlockSpec(w.shape, lambda bi, ei, n=w.ndim: (0,) * n,
                      memory_space=pltpu.VMEM) for w in weights]
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shapes),
        grid_spec=pl.GridSpec(grid=(b, e // blk), in_specs=in_specs,
                              out_specs=tuple(out_specs)),
        interpret=_interpret(),
    )(both, both, es, ev, *weights, dout)


# ------------------------------------------------------------- public entry
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _fused_core(both, es, ev, weights, ns, nv, acts_mid, acts_last,
                n_layers, cdt_name, fo):
    return _fused_fwd(both, es, ev, tuple(weights), ns, nv, acts_mid,
                      acts_last, n_layers, cdt_name, fo)


def _core_fwd(both, es, ev, weights, ns, nv, acts_mid, acts_last,
              n_layers, cdt_name, fo):
    out = _fused_core(both, es, ev, weights, ns, nv, acts_mid, acts_last,
                      n_layers, cdt_name, fo)
    return out, (both, es, ev, tuple(weights))


def _core_bwd(ns, nv, acts_mid, acts_last, n_layers, cdt_name, fo,
              res, g):
    both, es, ev, weights = res
    outs = _fused_bwd(both, es, ev, weights, g, ns, nv, acts_mid,
                      acts_last, n_layers, cdt_name)
    # the two row halves concatenate back into the [B, 2E, F] cotangent of
    # the combined src||dst endpoint gather (a layout no-op for XLA)
    dboth = jnp.concatenate([outs[0], outs[1]], axis=1)
    des, dev = outs[2], outs[3]
    dws = [d.astype(w.dtype) for d, w in zip(outs[4:], weights)]
    return dboth, des, dev, list(dws)


_fused_core.defvjp(_core_fwd, _core_bwd)


def fused_message_mlp(both, edge_s, edge_v, layer_params,
                      ns: int, nv: int, v_parts, activations,
                      compute_dtype=None):
    """Fused per-edge GVP message MLP.

    both:    [B, 2E, ns+3nv]  gathered (s,v)-merged endpoint rows, src rows
             then dst rows (see nn/gvp.GVPConv).
    edge_s:  [B, E, se];  edge_v: [B, E, ve, 3] interleaved.
    layer_params: list of GVP param subtrees (wh/ws/wv/wsv dicts).
    activations: (scalar_act, vector_act) for the non-final layers; the
    final layer is (None, None) with vector gating, as in GVPConv.
    Returns the merged message [B, E, so+3vo] (same (s,v) layout as the
    inputs — split with nn.gvp.split_sv).
    """
    b, e, ve = edge_v.shape[0], edge_v.shape[1], edge_v.shape[2]
    ev = edge_v.reshape(b, e, 3 * ve)
    weights = expand_weights(layer_params, tuple(v_parts))
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else jnp.dtype(both.dtype)
    so = layer_params[-1]["ws"]["kernel"].shape[1]
    vo = layer_params[-1]["wv"]["kernel"].shape[1]
    fo = so + 3 * vo
    acts = (activations[0], activations[1])
    out = _fused_core(both, edge_s, ev, weights, ns, nv, acts,
                      (None, None), len(layer_params), cdt.name, fo)
    return out
