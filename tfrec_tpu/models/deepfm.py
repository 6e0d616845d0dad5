"""DeepFM: FM linear + second-order terms plus a deep tower over the SAME
field embeddings (Guo et al. 2017) — the standard shared-embedding extension
of the reference family's FM (SURVEY.md §2a "other zoo models")."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ctr_base import CTRBase, fm_second_order
from tfrec_tpu.models.layers import apply_mlp, init_mlp


class DeepFM(CTRBase):
    use_linear_tables = True

    def __init__(self, data_spec: DataSpec, embed_dim: int, mlp_dims,
                 dropout: float = 0.0):
        super().__init__(data_spec, embed_dim)
        self.mlp_dims = tuple(mlp_dims)
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        in_dim = sum(self.field_dims) + self.data_spec.num_dense
        d = {
            "w0": jnp.zeros(()),
            "mlp": init_mlp(rng, in_dim, self.mlp_dims, out_dim=1),
        }
        if self.data_spec.num_dense > 0:
            d["w_dense"] = jnp.zeros((self.data_spec.num_dense,))
        return d

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        fields = self.field_stack(gathered, batch)
        logit = dense["w0"] + self.linear_sum(gathered, batch) + fm_second_order(fields)
        if self.data_spec.num_dense > 0:
            logit = logit + batch["dense"] @ dense["w_dense"]
        deep = apply_mlp(
            dense["mlp"], self.flat_input(gathered, batch),
            dropout=self.dropout, rng=rng,
        )[:, 0]
        return logit + deep
