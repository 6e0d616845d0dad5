"""DCN cross-layer stack: x_{l+1} = x0 * f_l(x_l) + b_l + x_l.

DCN-v1: f_l(x) = (x . w_l) — a rank-one interaction, so the whole layer is
one VPU-friendly fused elementwise chain; the outer product x0 (x^T w) is
never materialized (SURVEY.md §2c item 2).
DCN-v2: f_l(x) = W_l x (optionally low-rank U_l V_l^T x) — MXU matmuls.

The ``xla`` backend below is the semantic reference; the fused Pallas kernel
(kernels/cross_pallas.py) keeps x resident in VMEM across all L layers and
is validated against this path.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def cross_stack(
    x0: jnp.ndarray, params: Dict[str, jnp.ndarray], *, backend: str = "xla"
) -> jnp.ndarray:
    """Apply all cross layers.

    params: {"w": [L, d] (v1) or [L, d, d] (v2 full) or
             {"u": [L, d, r], "v": [L, d, r]} via keys u/v (v2 low-rank),
             "b": [L, d]}.
    """
    if backend == "pallas" and "w" in params and params["w"].ndim == 2:
        # Fused kernel covers DCN-v1 (rank-one crosses).
        from tfrec_tpu.kernels.cross_pallas import cross_stack_pallas

        return cross_stack_pallas(x0, params)
    if backend == "pallas" and "u" in params:
        # v2 LOW-RANK: fused rank-r kernel (x resident across layers,
        # U/V stacks resident in VMEM).
        from tfrec_tpu.kernels.cross_pallas import cross_stack_pallas_v2

        return cross_stack_pallas_v2(x0, params)
    # v2 FULL-RANK stays on XLA: the [L, d, d] weight stack exceeds the
    # scoped-VMEM budget at production dims (see cross_pallas.py).
    return cross_stack_xla(x0, params)


def cross_stack_xla(x0: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    b = params["b"]
    num_layers = b.shape[0]
    x = x0
    if "u" in params:  # DCN-v2 low-rank
        u, v = params["u"], params["v"]
        for l in range(num_layers):
            f = (x @ v[l]) @ u[l].T + b[l]
            x = x0 * f + x
        return x
    w = params["w"]
    if w.ndim == 3:  # DCN-v2 full-rank
        for l in range(num_layers):
            f = x @ w[l].T + b[l]
            x = x0 * f + x
        return x
    for l in range(num_layers):  # DCN-v1
        xw = x @ w[l]  # [B]
        x = x0 * xw[:, None] + b[l][None, :] + x
    return x
