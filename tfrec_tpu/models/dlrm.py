"""DLRM (Naumov et al. 2019): bottom MLP over dense features, explicit
pairwise dot-product interactions among {bottom output, field embeddings},
top MLP over [bottom ; interactions].

The interaction op is one [B, F', D] x [B, D, F'] MXU batch-matmul with the
strict lower triangle gathered by a static index — no Python pair loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ctr_base import CTRBase
from tfrec_tpu.models.layers import apply_mlp, init_mlp


class DLRM(CTRBase):
    def __init__(
        self,
        data_spec: DataSpec,
        embed_dim: int,
        bottom_dims=(64,),
        top_dims=(256, 128),
        dropout: float = 0.0,
    ):
        super().__init__(data_spec, embed_dim)
        self.bottom_dims = tuple(bottom_dims)
        self.top_dims = tuple(top_dims)
        self.dropout = dropout
        self.has_bottom = data_spec.num_dense > 0

    def _num_vectors(self) -> int:
        return self.num_fields + (1 if self.has_bottom else 0)

    def init_dense(self, rng: jax.Array):
        k_bot, k_top = jax.random.split(rng)
        nv = self._num_vectors()
        num_pairs = nv * (nv - 1) // 2
        top_in = num_pairs + (self.embed_dim if self.has_bottom else 0)
        d = {"top": init_mlp(k_top, top_in, self.top_dims, out_dim=1)}
        if self.has_bottom:
            # Bottom MLP projects dense features into embedding space.
            d["bottom"] = init_mlp(
                k_bot,
                self.data_spec.num_dense,
                self.bottom_dims,
                out_dim=self.embed_dim,
            )
        return d

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        vecs = [self.field_stack(gathered, batch)]  # [B, F, D]
        bottom = None
        if self.has_bottom:
            bottom = apply_mlp(dense["bottom"], batch["dense"])  # [B, D]
            vecs.insert(0, bottom[:, None, :])
        z = jnp.concatenate(vecs, axis=1)  # [B, F', D]
        inter = jnp.einsum("bfd,bgd->bfg", z, z)  # MXU batch-matmul
        nv = self._num_vectors()
        rows, cols = np.tril_indices(nv, k=-1)
        pairs = inter[:, rows, cols]  # [B, nv*(nv-1)/2]
        top_in = jnp.concatenate([bottom, pairs], axis=-1) if bottom is not None else pairs
        return apply_mlp(dense["top"], top_in, dropout=self.dropout, rng=rng)[:, 0]
