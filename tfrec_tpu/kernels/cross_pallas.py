"""Fused Pallas DCN-v1 cross stack (BASELINE.json R4, SURVEY.md §2c.2).

All L cross layers run in one kernel: the activation tile x stays resident
in VMEM across layers, so HBM traffic is one read of x0 and one write of
x_L per tile instead of 2L round-trips — the cross stack is bandwidth-bound
(each layer is only a matvec + elementwise chain), so this is the win.

Layer recurrence (rank-one cross):
    s_l = x_l . w_l              (per-row scalar)
    x_{l+1} = x0 * s_l + b_l + x_l

Backward (custom VJP, layers replayed forward in-kernel to recover x_l,
then reversed):
    ds   = sum_j g_j * x0_j
    dw_l = sum_batch x_l * ds
    db_l = sum_batch g
    dx0 += g * s_l
    g    = g + w_l * ds          (grad w.r.t. x_l)
finally dx0 += g (the l=0 input is x0 itself).

Falls back to interpret mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the 16MB scoped limit


def _block_b(dim: int, n_live_bufs: int, reserved: int = 0) -> int:
    """Largest batch-tile whose live VMEM footprint fits the budget.

    n_live_bufs counts [tb, dim] f32 buffers live at once including the
    pipeline's double buffering: forward ~4 (x0 in x2, out x2); backward
    ~2*(L+4) (x0/g in, dx0 out, replayed xs, temporaries). ``reserved``
    subtracts bytes held by batch-independent resident blocks (the v2
    low-rank weight stacks). Callers pad the batch up to a tile multiple
    (a non-divisible grid would silently skip tail rows).
    """
    budget = _VMEM_BUDGET - reserved
    for cand in (1024, 512, 256, 128, 64, 32, 16):
        if cand * dim * 4 * n_live_bufs <= budget:
            return cand
    return 8


def _pad_batch(x: jnp.ndarray, tb: int) -> jnp.ndarray:
    return _pad_to(x, tb, axis=0)


def _row_dot(x, w_row):
    """Per-row dot x . w as a VPU multiply+reduce in FULL f32.

    Hardware finding: an MXU matvec (jnp.dot) inside the kernel runs at
    the backend's default (bf16) precision and diverged from the XLA
    reference by ~1e-1 at d~1000 on real TPU; the VPU reduction keeps f32
    and a matvec has no MXU advantage anyway (it is bandwidth-bound).
    """
    return jnp.sum(x * w_row[None, :], axis=1, keepdims=True)


def _fwd_kernel(x0_ref, w_ref, b_ref, out_ref, *, num_layers):
    x0 = x0_ref[:]
    x = x0
    for l in range(num_layers):
        s = _row_dot(x, w_ref[l, :])
        x = x0 * s + b_ref[l, :][None, :] + x
    out_ref[:] = x


def _bwd_kernel(x0_ref, w_ref, b_ref, g_ref, dx0_ref, dw_ref, db_ref, *, num_layers):
    x0 = x0_ref[:]
    # Replay forward to collect per-layer inputs (L is small and static).
    xs = [x0]
    x = x0
    ss = []
    for l in range(num_layers):
        s = _row_dot(x, w_ref[l, :])
        ss.append(s)
        x = x0 * s + b_ref[l, :][None, :] + x
        xs.append(x)
    g = g_ref[:]
    dx0 = jnp.zeros_like(x0)
    # dw/db accumulate across batch tiles: same output block every grid
    # step, so zero them on the first step and add afterwards.
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    dws = []
    dbs = []
    for l in range(num_layers - 1, -1, -1):
        ds = jnp.sum(g * x0, axis=1, keepdims=True)  # [TB, 1]
        dws.append((l, jnp.sum(xs[l] * ds, axis=0)))
        dbs.append((l, jnp.sum(g, axis=0)))
        dx0 = dx0 + g * ss[l]
        g = g + ds * w_ref[l, :][None, :]
    dx0_ref[:] = dx0 + g
    for l, dw in dws:
        dw_ref[l, :] += dw
    for l, db in dbs:
        db_ref[l, :] += db


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cross_stack_pallas(x0: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    return _cross_fwd_impl(x0, params["w"], params["b"])


def _cross_fwd_impl(x0, w, b):
    if w.ndim != 2:
        raise NotImplementedError(
            "pallas cross kernel covers DCN-v1 (rank-one) and v2 LOW-RANK "
            "(cross_stack_pallas_v2); v2 full-rank stays on XLA — its "
            "[L, d, d] weight stack alone exceeds the 16MB scoped-VMEM "
            "limit at production dims (d=896, L=3 -> 9.6MB x pipeline "
            "buffers), so the x-resident fusion cannot hold it"
        )
    batch, dim = x0.shape
    num_layers = w.shape[0]
    tb = _block_b(dim, n_live_bufs=4 + num_layers)
    x0p = _pad_batch(x0, tb)
    padded = x0p.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_layers=num_layers),
        grid=(padded // tb,),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, dim), x0.dtype),
        interpret=_interpret(),
    )(x0p, w, b)
    return out[:batch]


def _cross_fwd_rule(x0, params):
    out = _cross_fwd_impl(x0, params["w"], params["b"])
    return out, (x0, params["w"], params["b"])


def _cross_bwd_rule(res, g):
    x0, w, b = res
    batch, dim = x0.shape
    num_layers = w.shape[0]
    tb = _block_b(dim, n_live_bufs=2 * (num_layers + 5))
    x0p = _pad_batch(x0, tb)
    gp = _pad_batch(g, tb)  # zero rows contribute nothing to dw/db
    padded = x0p.shape[0]
    dx0, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, num_layers=num_layers),
        grid=(padded // tb,),
        in_specs=[
            pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_layers, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, dim), x0.dtype),
            jax.ShapeDtypeStruct((num_layers, dim), w.dtype),
            jax.ShapeDtypeStruct((num_layers, dim), b.dtype),
        ],
        interpret=_interpret(),
    )(x0p, w, b, gp)
    return dx0[:batch], {"w": dw, "b": db}


cross_stack_pallas.defvjp(_cross_fwd_rule, _cross_bwd_rule)


# ---------------------------------------------------------------------------
# DCN-v2 LOW-RANK fused cross stack (VERDICT r3 item 10).
#
# Layer recurrence (rank-r cross, Wang et al. 2021):
#     f_l = (x_l @ V_l) @ U_l^T + b_l          (two MXU matmuls)
#     x_{l+1} = x0 * f_l + x_l
#
# Fusion win: same as v1 — x stays resident in VMEM across all L layers
# (one HBM read of x0, one write of x_L per tile instead of 2L [B, d]
# round-trips). The weight stacks U/V ([L, d, r]) are small enough to stay
# resident (r <= 128: ~1.4MB at d=896, L=3), unlike full-rank's [L, d, d].
#
# Backward (custom VJP, forward replayed in-kernel):
#     df    = g * x0
#     db_l  = sum_batch df
#     t     = df @ U_l                          [TB, r]
#     dU_l  = df^T @ (x_l @ V_l)                [d, r]
#     dV_l  = x_l^T @ t                         [d, r]
#     dx0  += g * f_l
#     g     = g + t @ V_l^T                     (grad w.r.t. x_l)
# finally dx0 += g.
#
# Matmul precision: jnp.dot inside the kernel runs at the backend default
# (bf16 passes on the TPU MXU) — the SAME default as the XLA reference
# path, so the A/B is like-for-like; interpret mode (CPU tests) is exact
# f32. Dims are zero-padded to lane multiples in the wrapper; padded
# lanes provably stay zero through the recurrence (b/w pads are zero, so
# f's pad lanes are 0 and x0's pad lanes are 0).
# ---------------------------------------------------------------------------


def _pad_to(x: jnp.ndarray, mult: int, axis: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel_v2(x0_ref, u_ref, v_ref, b_ref, out_ref, *, num_layers):
    x0 = x0_ref[:]
    x = x0
    for l in range(num_layers):
        xv = jnp.dot(x, v_ref[l], preferred_element_type=jnp.float32)
        f = (
            jnp.dot(xv, u_ref[l].T, preferred_element_type=jnp.float32)
            + b_ref[l, :][None, :]
        )
        x = x0 * f + x
    out_ref[:] = x


def _bwd_kernel_v2(
    x0_ref, u_ref, v_ref, b_ref, g_ref,
    dx0_ref, du_ref, dv_ref, db_ref, *, num_layers,
):
    x0 = x0_ref[:]
    xs = [x0]
    fs = []
    x = x0
    for l in range(num_layers):
        xv = jnp.dot(x, v_ref[l], preferred_element_type=jnp.float32)
        f = (
            jnp.dot(xv, u_ref[l].T, preferred_element_type=jnp.float32)
            + b_ref[l, :][None, :]
        )
        fs.append(f)
        x = x0 * f + x
        xs.append(x)
    g = g_ref[:]
    dx0 = jnp.zeros_like(x0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        du_ref[:] = jnp.zeros_like(du_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    for l in range(num_layers - 1, -1, -1):
        df = g * x0  # [TB, d]
        db_ref[l, :] += jnp.sum(df, axis=0)
        xv = jnp.dot(xs[l], v_ref[l], preferred_element_type=jnp.float32)
        du_ref[l] += jnp.dot(df.T, xv, preferred_element_type=jnp.float32)
        t = jnp.dot(df, u_ref[l], preferred_element_type=jnp.float32)  # [TB, r]
        dv_ref[l] += jnp.dot(xs[l].T, t, preferred_element_type=jnp.float32)
        dx0 = dx0 + g * fs[l]
        g = g + jnp.dot(t, v_ref[l].T, preferred_element_type=jnp.float32)
    dx0_ref[:] = dx0 + g


def _v2_prep(x0, u, v, b):
    """Lane-pad d and r; returns (x0p, up, vp, bp, d, r, dp, rp)."""
    num_layers, d, r = u.shape
    x0p = _pad_to(x0, 128, axis=1)
    up = _pad_to(_pad_to(u, 128, axis=1), 128, axis=2)
    vp = _pad_to(_pad_to(v, 128, axis=1), 128, axis=2)
    bp = _pad_to(b, 128, axis=1)
    return x0p, up, vp, bp, d, r, x0p.shape[1], up.shape[2]


def _v2_weight_spec(num_layers, a, bdim):
    return pl.BlockSpec(
        (num_layers, a, bdim), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )


def _cross_v2_fwd_impl(x0, u, v, b):
    batch = x0.shape[0]
    x0p, up, vp, bp, d, r, dp, rp = _v2_prep(x0, u, v, b)
    num_layers = u.shape[0]
    # Resident weights: U + V. Constant-index blocks are revisited, not
    # re-streamed, so budget them at 1.25x (headroom for Mosaic's
    # bookkeeping) — the round-4 on-chip A/B showed the original 2x
    # reserve starved the batch tile (hardware re-validated via
    # benchmarks/exp_cross_check.py after this change).
    reserved = int(1.25 * (2 * num_layers * dp * rp * 4))
    tb = _block_b(dp, n_live_bufs=6, reserved=reserved)
    x0p = _pad_batch(x0p, tb)
    padded = x0p.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_v2, num_layers=num_layers),
        grid=(padded // tb,),
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _v2_weight_spec(num_layers, dp, rp),
            _v2_weight_spec(num_layers, dp, rp),
            pl.BlockSpec((num_layers, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, dp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, dp), x0.dtype),
        interpret=_interpret(),
    )(x0p, up, vp, bp)
    return out[:batch, :d]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cross_stack_pallas_v2(x0: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Fused LOW-RANK DCN-v2 cross stack; params: {"u": [L, d, r],
    "v": [L, d, r], "b": [L, d]} (cross_rank > 0)."""
    return _cross_v2_fwd_impl(x0, params["u"], params["v"], params["b"])


def _cross_v2_fwd_rule(x0, params):
    out = _cross_v2_fwd_impl(x0, params["u"], params["v"], params["b"])
    return out, (x0, params["u"], params["v"], params["b"])


def _cross_v2_bwd_rule(res, g):
    x0, u, v, b = res
    batch = x0.shape[0]
    x0p, up, vp, bp, d, r, dp, rp = _v2_prep(x0, u, v, b)
    num_layers = u.shape[0]
    gp = _pad_to(g, 128, axis=1)  # lane-pad grads
    # u, v, du, dv resident; 1.25x headroom (see the forward's note) —
    # the original 2x reserve exceeded the whole budget at the flagship
    # dims (dp=896, rp=128, L=3) and forced tb=8, a 1024-step grid the
    # round-4 A/B measured as the kernel's drag.
    reserved = int(1.25 * (4 * num_layers * dp * rp * 4))
    tb = _block_b(dp, n_live_bufs=2 * (num_layers + 5), reserved=reserved)
    x0p = _pad_batch(x0p, tb)
    gp = _pad_batch(gp, tb)  # zero rows contribute nothing to du/dv/db
    padded = x0p.shape[0]
    dx0, du, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, num_layers=num_layers),
        grid=(padded // tb,),
        in_specs=[
            pl.BlockSpec((tb, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _v2_weight_spec(num_layers, dp, rp),
            _v2_weight_spec(num_layers, dp, rp),
            pl.BlockSpec((num_layers, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, dp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            _v2_weight_spec(num_layers, dp, rp),
            _v2_weight_spec(num_layers, dp, rp),
            pl.BlockSpec((num_layers, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded, dp), x0.dtype),
            jax.ShapeDtypeStruct((num_layers, dp, rp), u.dtype),
            jax.ShapeDtypeStruct((num_layers, dp, rp), v.dtype),
            jax.ShapeDtypeStruct((num_layers, dp), b.dtype),
        ],
        interpret=_interpret(),
    )(x0p, up, vp, bp, gp)
    return (
        dx0[:batch, :d],
        {"u": du[:, :d, :r], "v": dv[:, :d, :r], "b": db[:, :d]},
    )


cross_stack_pallas_v2.defvjp(_cross_v2_fwd_rule, _cross_v2_bwd_rule)
