"""ConvNCF — outer-product convolutional NCF (He et al. 2018), the CNN
member of the reference family's zoo (SURVEY.md §2a "other zoo models").

Each (user, item) pair is scored from the OUTER PRODUCT of its factor
vectors — a [D, D] interaction map whose (a, b) cell is p_ua * q_ib —
passed through a stack of 2x2 stride-2 convolutions (one halving per
layer, log2(D) layers) down to a [C]-vector and a linear readout. The
map encodes every pairwise dimension-product, so the CNN can learn
high-order correlations GMF's elementwise product cannot.

TPU framing: the map is a rank-1 broadcast (never materialized beyond
the conv input), convs are `lax.conv_general_dilated` NHWC — XLA lowers
small-spatial convs onto the MXU as implicit GEMMs; all shapes static.
Full-catalog eval reuses _NCFBase's lax.scan chunking with a smaller
chunk (the [B*C, D, D] conv input is the cost driver).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ncf import _NCFBase
from tfrec_tpu.ops.embedding import TableSpec


class ConvNCF(_NCFBase):
    eval_chunk = 128

    def __init__(self, data_spec: DataSpec, embed_dim: int = 64,
                 channels: int = 32, dropout: float = 0.0):
        assert data_spec.kind == "interaction"
        assert embed_dim >= 2 and (embed_dim & (embed_dim - 1)) == 0, (
            f"ConvNCF halves the {embed_dim}x{embed_dim} map 2x per layer; "
            "embed_dim must be a power of two"
        )
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.channels = channels
        self.dropout = dropout
        self.num_layers = embed_dim.bit_length() - 1  # log2(D)

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v, d = self.data_spec.num_users, self.data_spec.num_items, self.embed_dim
        return (TableSpec("user_emb", u, d), TableSpec("item_emb", v, d))

    def init_dense(self, rng: jax.Array):
        c = self.channels
        keys = jax.random.split(rng, self.num_layers + 1)
        dense = {}
        for l in range(self.num_layers):
            cin = 1 if l == 0 else c
            lim = jnp.sqrt(6.0 / (4 * cin + 4 * c))
            dense[f"k{l}"] = jax.random.uniform(
                keys[l], (2, 2, cin, c), jnp.float32, -lim, lim
            )
            dense[f"kb{l}"] = jnp.zeros((c,))
        lim = jnp.sqrt(6.0 / (c + 1))
        dense["w"] = jax.random.uniform(keys[-1], (c,), jnp.float32, -lim, lim)
        dense["b"] = jnp.zeros(())
        return dense

    def _pair_logit(self, dense, u_g: Dict, i_g: Dict, rng=None) -> jnp.ndarray:
        u, i = u_g["user_emb"], i_g["item_emb"]
        x = (u[:, :, None] * i[:, None, :])[..., None]  # [N, D, D, 1]
        for l in range(self.num_layers):
            x = jax.lax.conv_general_dilated(
                x, dense[f"k{l}"], window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x + dense[f"kb{l}"])
        x = x.reshape(x.shape[0], self.channels)  # [N, C] (1x1 spatial)
        if rng is not None and self.dropout > 0.0:
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - self.dropout), 0.0)
        return x @ dense["w"] + dense["b"]
