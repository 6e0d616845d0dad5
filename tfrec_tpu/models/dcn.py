"""Deep & Cross Network (DCN v1 and v2) — the flagship CTR model.

Capability target: the reference family's ``DCN`` ([CONTRACT
BASELINE.json:10]): explicit feature crosses x_{l+1} = x0*f(x_l)+b+x_l next
to a deep MLP tower, both over concatenated field embeddings (+ dense
features). v1 uses rank-one cross weights; v2 (cross_rank=0 full matrix,
>0 low-rank) follows Wang et al. 2021.

The cross stack runs through tfrec_tpu/kernels/cross.py so the fused Pallas
kernel and the XLA reference stay interchangeable (TrainConfig.kernels).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.kernels.cross import cross_stack
from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ctr_base import CTRBase
from tfrec_tpu.models.layers import apply_mlp, glorot, init_mlp


class DCN(CTRBase):
    supports_mixed_dims = True  # cross/deep towers work on the concat

    def __init__(
        self,
        data_spec: DataSpec,
        embed_dim: int,
        num_cross_layers: int,
        mlp_dims,
        *,
        v2: bool = False,
        cross_rank: int = 0,
        backend: str = "xla",
        dropout: float = 0.0,
        field_dims=None,
    ):
        super().__init__(data_spec, embed_dim, field_dims)
        self.num_cross_layers = num_cross_layers
        self.mlp_dims = tuple(mlp_dims)
        self.v2 = v2
        self.cross_rank = cross_rank
        self.backend = backend
        self.dropout = dropout

    @property
    def input_dim(self) -> int:
        return sum(self.field_dims) + self.data_spec.num_dense

    def init_dense(self, rng: jax.Array):
        d0, nl = self.input_dim, self.num_cross_layers
        k_cross, k_mlp, k_out = jax.random.split(rng, 3)
        cross = {"b": jnp.zeros((nl, d0))}
        if not self.v2:
            cross["w"] = jax.random.normal(k_cross, (nl, d0)) / d0**0.5
        elif self.cross_rank > 0:
            ku, kv = jax.random.split(k_cross)
            r = self.cross_rank
            cross["u"] = jax.random.normal(ku, (nl, d0, r)) / d0**0.5
            cross["v"] = jax.random.normal(kv, (nl, d0, r)) / d0**0.5
        else:
            cross["w"] = jax.random.normal(k_cross, (nl, d0, d0)) / d0**0.5
        head_in = d0 + (self.mlp_dims[-1] if self.mlp_dims else 0)
        return {
            "cross": cross,
            "mlp": init_mlp(k_mlp, d0, self.mlp_dims) if self.mlp_dims else [],
            "w_out": glorot(k_out, (head_in, 1)),
            "b_out": jnp.zeros(()),
        }

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        x0 = self.flat_input(gathered, batch)
        x_cross = cross_stack(x0, dense["cross"], backend=self.backend)
        if self.mlp_dims:
            deep = apply_mlp(
                dense["mlp"], x0, final_linear=False,
                dropout=self.dropout, rng=rng,
            )
            fused = jnp.concatenate([x_cross, deep], axis=-1)
        else:
            fused = x_cross
        return (fused @ dense["w_out"])[:, 0] + dense["b_out"]
