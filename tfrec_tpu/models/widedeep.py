"""Wide & Deep (Cheng et al. 2016): a linear "wide" path over raw
categorical ids + dense features, summed with a deep MLP over field
embeddings."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ctr_base import CTRBase
from tfrec_tpu.models.layers import apply_mlp, init_mlp


class WideDeep(CTRBase):
    use_linear_tables = True
    supports_mixed_dims = True  # deep tower works on the concat

    def __init__(self, data_spec: DataSpec, embed_dim: int, mlp_dims,
                 dropout: float = 0.0, field_dims=None):
        super().__init__(data_spec, embed_dim, field_dims)
        self.mlp_dims = tuple(mlp_dims)
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        in_dim = sum(self.field_dims) + self.data_spec.num_dense
        d = {
            "b": jnp.zeros(()),
            "mlp": init_mlp(rng, in_dim, self.mlp_dims, out_dim=1),
        }
        if self.data_spec.num_dense > 0:
            d["w_dense"] = jnp.zeros((self.data_spec.num_dense,))
        return d

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        wide = dense["b"] + self.linear_sum(gathered, batch)
        if self.data_spec.num_dense > 0:
            wide = wide + batch["dense"] @ dense["w_dense"]
        deep = apply_mlp(
            dense["mlp"], self.flat_input(gathered, batch),
            dropout=self.dropout, rng=rng,
        )[:, 0]
        return wide + deep
