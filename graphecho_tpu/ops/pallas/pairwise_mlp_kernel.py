"""Fused pairwise-MLP Pallas kernel with custom VJP — the affinity hot op.

Computes M[i,j] = sum_k w2[k] * relu(a[i,k] + b[j,k]) (+ b2) without ever
materializing the (N1, N2, K) broadcast. XLA's blocked fallback
(`graphecho_tpu.ops.pairwise_mlp`) writes that intermediate to HBM
(~640 MB at production node counts) — measured 1.76 ms fwd / 3.9 ms fwd+bwd
at (560, 560, 512) on v5e, which is HBM-bandwidth-bound. This kernel streams
(BM, BN, KC) tiles through VMEM.

Backward (per the VJP):
  dA[i,k] = sum_j g[i,j] * w2[k] * 1[a_ik + b_jk > 0]
  dB[j,k] = sum_i g[i,j] * w2[k] * 1[...]
  dw2[k]  = sum_ij g[i,j] * relu(a_ik + b_jk)
  db2     = sum_ij g[i,j]
computed by two gridded kernels that recompute the relu mask per tile (cheaper
than storing it): one accumulates dA/dw2 over the fast j axis, the mirrored
one accumulates dB over the fast i axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# BM bounds the (BM, BN, KC) temporaries to the 16MB VMEM budget (several are
# live at once per chunk iteration). BN and KC must stay multiples of the
# 128-lane tile (output block last dim / dynamic lane-dim slicing).
BM = 64
BN = 128
KC = 128


def _fwd_kernel(a_ref, b_ref, w2_ref, out_ref):
    k = a_ref.shape[1]
    bm, bn = a_ref.shape[0], b_ref.shape[0]

    def body(ci, acc):
        # fori_loop (not an unrolled Python loop): the big (BM, BN, KC)
        # temporaries must share one buffer across chunk iterations or the
        # kernel blows the VMEM stack
        a_c = a_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        b_c = b_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        w_c = w2_ref[0, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        t = a_c[:, None, :] + b_c[None, :, :]  # (BM, BN, KC)
        t = jnp.maximum(t, 0.0) * w_c[None, None, :]
        return acc + jnp.sum(t, axis=-1)

    out_ref[...] = jax.lax.fori_loop(
        0, k // KC, body, jnp.zeros((bm, bn), jnp.float32))


def _bwd_da_kernel(a_ref, b_ref, w2_ref, g_ref, da_ref, dw2_ref, db2_ref):
    """Grid (N1/BM, N2/BN), j fast. Accumulates dA over j; dw2/db2 over all."""
    j = pl.program_id(1)
    i = pl.program_id(0)
    g = g_ref[...]  # (BM, BN)
    k = a_ref.shape[1]

    @pl.when((i == 0) & (j == 0))
    def _():
        db2_ref[...] = jnp.zeros_like(db2_ref)

    @pl.when(j == 0)
    def _():
        da_ref[...] = jnp.zeros_like(da_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    def body(ci, _):
        a_c = a_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        b_c = b_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        w_c = w2_ref[0, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        t = a_c[:, None, :] + b_c[None, :, :]
        gm = g[:, :, None] * jnp.maximum(jnp.sign(t), 0.0)
        # dA[:, chunk] += sum_j g * mask * w2
        da_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)] += jnp.sum(gm, axis=1) * w_c[None, :]
        # dw2[chunk] += sum_ij g * relu(t)
        dw2_ref[0, pl.ds(pl.multiple_of(ci * KC, KC), KC)] += jnp.sum(gm * t, axis=(0, 1))
        return 0

    jax.lax.fori_loop(0, k // KC, body, 0)
    db2_ref[...] = db2_ref[...] + jnp.sum(g)


def _bwd_db_kernel(a_ref, b_ref, w2_ref, g_ref, db_ref):
    """Grid (N2/BN, N1/BM), i fast. Accumulates dB over i."""
    i = pl.program_id(1)
    g = g_ref[...]  # (BM, BN)
    k = a_ref.shape[1]

    @pl.when(i == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    def body(ci, _):
        a_c = a_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        b_c = b_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        w_c = w2_ref[0, pl.ds(pl.multiple_of(ci * KC, KC), KC)]
        t = a_c[:, None, :] + b_c[None, :, :]
        mask = (t > 0.0).astype(jnp.float32)
        db_ref[:, pl.ds(pl.multiple_of(ci * KC, KC), KC)] += (
            jnp.sum(g[:, :, None] * mask, axis=0) * w_c[None, :])
        return 0

    jax.lax.fori_loop(0, k // KC, body, 0)


def _pad_rows(x, block):
    pad = (-x.shape[0]) % block
    return (jnp.pad(x, ((0, pad), (0, 0))), x.shape[0] + pad) if pad else (x, x.shape[0])


def _pad_k(x, block=KC):
    pad = (-x.shape[-1]) % block
    if pad:
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _forward(a, b, w2, interpret=False):
    a32 = _pad_k(a.astype(jnp.float32))
    b32 = _pad_k(b.astype(jnp.float32))
    w232 = _pad_k(w2.astype(jnp.float32)[None, :])
    a_p, n1p = _pad_rows(a32, BM)
    b_p, n2p = _pad_rows(b32, BN)
    k = a_p.shape[1]
    grid = (n1p // BM, n2p // BN)
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n1p, n2p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_p, b_p, w232)
    return out[: a.shape[0], : b.shape[0]]


def _backward(a, b, w2, g, interpret=False):
    n1, n2 = a.shape[0], b.shape[0]
    a32 = _pad_k(a.astype(jnp.float32))
    b32 = _pad_k(b.astype(jnp.float32))
    w232 = _pad_k(w2.astype(jnp.float32)[None, :])
    a_p, n1p = _pad_rows(a32, BM)
    b_p, n2p = _pad_rows(b32, BN)
    k = a_p.shape[1]
    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, n1p - n1), (0, n2p - n2)))

    da, dw2, db2 = pl.pallas_call(
        _bwd_da_kernel,
        out_shape=(jax.ShapeDtypeStruct((n1p, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        grid=(n1p // BM, n2p // BN),
        in_specs=[
            pl.BlockSpec((BM, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BM, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(a_p, b_p, w232, g_p)

    db = pl.pallas_call(
        _bwd_db_kernel,
        out_shape=jax.ShapeDtypeStruct((n2p, k), jnp.float32),
        grid=(n2p // BN, n1p // BM),
        in_specs=[
            pl.BlockSpec((BM, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, k), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, BN), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, k), lambda j, i: (j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a_p, b_p, w232, g_p)

    kk = a.shape[1]
    return (da[:n1, :kk].astype(a.dtype), db[:n2, :kk].astype(b.dtype),
            dw2[0, :kk].astype(w2.dtype), db2[0, 0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_pairwise_mlp(a, b, w2, b2, interpret=False):
    """M[i,j] = sum_k w2[k]*relu(a[i,k]+b[j,k]) + b2 — fused, differentiable."""
    return _forward(a, b, w2, interpret) + b2


def _fwd_rule(a, b, w2, b2, interpret):
    return _forward(a, b, w2, interpret) + b2, (a, b, w2)


def _bwd_rule(interpret, res, g):
    a, b, w2 = res
    da, db, dw2, db2 = _backward(a, b, w2, g, interpret)
    return da, db, dw2, db2.astype(jnp.float32)


pallas_pairwise_mlp.defvjp(_fwd_rule, _bwd_rule)
