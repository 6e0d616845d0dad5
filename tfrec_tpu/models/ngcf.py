"""NGCF — neural graph collaborative filtering (Wang et al. 2019), the
transform-and-nonlinearity predecessor of LightGCN in the reference
lineage's graph group (SURVEY.md §2a "other zoo models"; LightGCN is the
ablation of exactly these transforms).

Per layer k over the symmetrically-normalized bipartite graph:

    agg_u   = Σ_{i∈N(u)} e_i / sqrt(|N_u||N_i|)
    e_u^k+1 = LeakyReLU( W1 (e_u + agg_u) + W2 (agg_u ⊙ e_u) )

and the final representation is the CONCAT of layers 0..K (scoring dots
the concatenated vectors).

TPU-native framing: the bi-interaction message Σ coef (e_i ⊙ e_u)
factors as (Σ coef e_i) ⊙ e_u because e_u is constant per destination —
so each layer needs exactly ONE gather + segment-sum per side (the same
edge-list kernel as LightGCN) followed by two [D,D] matmuls on the MXU;
no per-edge elementwise products are ever materialized. Message dropout
(cfg.dropout) applies to each layer's output at train time only.
Like LightGCN, propagation touches every node, so embeddings live in
the dense pytree (models/lightgcn.py's cost-structure note)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.lightgcn import LightGCN


class NGCF(LightGCN):
    def __init__(self, data_spec: DataSpec, embed_dim: int = 64,
                 num_layers: int = 3, dropout: float = 0.1):
        super().__init__(data_spec, embed_dim, num_layers=num_layers)
        self.dropout = dropout

    def init_dense(self, rng: jax.Array):
        dense = super().init_dense(rng)
        d = self.embed_dim
        ks = jax.random.split(jax.random.fold_in(rng, 7), 2 * self.num_layers)
        lim = jnp.sqrt(6.0 / (2 * d))
        for k in range(self.num_layers):
            dense[f"w1_{k}"] = jax.random.uniform(
                ks[2 * k], (d, d), jnp.float32, -lim, lim)
            dense[f"w2_{k}"] = jax.random.uniform(
                ks[2 * k + 1], (d, d), jnp.float32, -lim, lim)
            dense[f"b1_{k}"] = jnp.zeros((d,))
            dense[f"b2_{k}"] = jnp.zeros((d,))
        return dense

    def propagate(self, dense, *, rng=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self._edges is None:
            raise ValueError(
                "NGCF.propagate needs attach_graph(train_users, train_items) "
                "(the trainer does this from the train split)"
            )
        e = self._edges
        eu, ei = dense["user_emb"], dense["item_emb"]
        outs_u, outs_i = [eu], [ei]
        for k in range(self.num_layers):
            agg_u = jax.ops.segment_sum(
                jnp.take(ei, e["u_src"], axis=0) * e["u_coef"][:, None],
                e["u_dst"], num_segments=eu.shape[0], indices_are_sorted=True,
            )
            agg_i = jax.ops.segment_sum(
                jnp.take(eu, e["i_src"], axis=0) * e["i_coef"][:, None],
                e["i_dst"], num_segments=ei.shape[0], indices_are_sorted=True,
            )
            w1, w2 = dense[f"w1_{k}"], dense[f"w2_{k}"]
            b1, b2 = dense[f"b1_{k}"], dense[f"b2_{k}"]

            def layer(x, agg):
                return jax.nn.leaky_relu(
                    jnp.dot(x + agg, w1) + b1
                    + jnp.dot(agg * x, w2) + b2,
                    negative_slope=0.2,
                )

            eu, ei = layer(eu, agg_u), layer(ei, agg_i)
            if rng is not None and self.dropout > 0.0:
                rng, ku, ki = jax.random.split(rng, 3)
                keep = 1.0 - self.dropout
                eu = eu * jax.random.bernoulli(ku, keep, eu.shape) / keep
                ei = ei * jax.random.bernoulli(ki, keep, ei.shape) / keep
            outs_u.append(eu)
            outs_i.append(ei)
        return jnp.concatenate(outs_u, axis=-1), jnp.concatenate(outs_i, axis=-1)

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        pu, qi = self.propagate(dense, rng=rng)
        u = jnp.take(pu, batch["user"], axis=0)
        if self.is_pairwise(batch):
            pos = jnp.take(qi, batch["pos"], axis=0)
            neg = jnp.take(qi, batch["neg"], axis=0)
            return jnp.sum(u * pos, axis=-1) - jnp.sum(u * neg, axis=-1)
        item = jnp.take(qi, batch["item"], axis=0)
        return jnp.sum(u * item, axis=-1)
