"""NFM — Neural Factorization Machine (He & Chua 2017), the deep
extension of the reference family's FM (SURVEY.md §2a "other zoo
models"): FM's scalar second-order term is kept as a VECTOR
(bi-interaction pooling, the same O(F*D) identity per dimension) and fed
through an MLP, so feature interactions get a nonlinear combiner while
the embedding/sparse path stays identical to FM's.

TPU framing: bi-interaction is two reductions over the [B, F, D] field
stack (no pairwise materialization), fused by XLA into the surrounding
elementwise chain; the MLP is the only added MXU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ctr_base import CTRBase
from tfrec_tpu.models.layers import apply_mlp, init_mlp


def bi_interaction(field_vecs: jnp.ndarray) -> jnp.ndarray:
    """0.5 * ((sum_f v_f)^2 - sum_f v_f^2) per dimension: [B, F, D] ->
    [B, D] — fm_second_order before its final D-reduction."""
    total = jnp.sum(field_vecs, axis=1)
    sq = jnp.sum(field_vecs * field_vecs, axis=1)
    return 0.5 * (total * total - sq)


class NFM(CTRBase):
    use_linear_tables = True

    def __init__(self, data_spec: DataSpec, embed_dim: int, mlp_dims,
                 dropout: float = 0.0):
        # Bi-interaction needs one shared width across fields.
        super().__init__(data_spec, embed_dim)
        self.mlp_dims = tuple(mlp_dims)
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        in_dim = self.embed_dim + self.data_spec.num_dense
        d = {
            "w0": jnp.zeros(()),
            "mlp": init_mlp(rng, in_dim, self.mlp_dims, out_dim=1),
        }
        if self.data_spec.num_dense > 0:
            d["w_dense"] = jnp.zeros((self.data_spec.num_dense,))
        return d

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        fields = self.field_stack(gathered, batch)
        logit = dense["w0"] + self.linear_sum(gathered, batch)
        if self.data_spec.num_dense > 0:
            logit = logit + batch["dense"] @ dense["w_dense"]
        x = bi_interaction(fields)
        if self.data_spec.num_dense > 0:
            x = jnp.concatenate([x, batch["dense"]], axis=-1)
        return logit + apply_mlp(
            dense["mlp"], x, dropout=self.dropout, rng=rng
        )[:, 0]
