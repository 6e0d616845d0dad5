"""LightGCN — simplified graph convolution for collaborative filtering
(He et al. 2020), the graph-recommender family of the reference lineage
(the TFRec/NeuRec family's NGCF/LightGCN group; SURVEY.md §2a "other
zoo models").

Embeddings are propagated over the symmetrically-normalized user-item
bipartite graph, E^(k+1) = A_hat E^(k) with no transforms or
nonlinearities, and the final representation is the mean over layers
0..K. Scoring is a plain dot product, trained pairwise (BPR).

TPU-native framing:
- The propagation is an EDGE-LIST computation at static shapes: per
  layer, gather the E source rows, scale by the per-edge coefficient
  1/sqrt(deg_u * deg_i), and segment-sum into the destination nodes —
  two gathers + two segment-sums per layer, no sparse-matrix type and
  no dynamic shapes. Edges are sorted by destination once at attach
  time so the segment-sums take ``indices_are_sorted``.
- Because every training step touches EVERY node (propagation reads the
  full tables), the embeddings live in the DENSE parameter pytree (the
  sparse "touch only gathered rows" path would be pure overhead here);
  ``table_specs()`` is empty and the dense optimizer owns them. This is
  the honest cost structure of graph CF, not a framework limitation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.models.base import DataSpec, DotRetrieval, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class LightGCN(RecModel):
    def __init__(self, data_spec: DataSpec, embed_dim: int = 64,
                 num_layers: int = 3):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.num_layers = num_layers
        self._edges = None

    # ---- graph attach (trainer calls with the TRAIN interactions) ----

    def needs_graph(self) -> bool:
        return True

    def attach_graph(self, users: np.ndarray, items: np.ndarray) -> None:
        """Build the static edge lists + normalization coefficients from
        the train split. Sorted by destination for hinted segment-sums."""
        u = np.asarray(users, np.int32)
        i = np.asarray(items, np.int32)
        # The adjacency is 0/1: duplicate interactions are one edge.
        keys = np.unique(u.astype(np.int64) * self.data_spec.num_items + i)
        u = (keys // self.data_spec.num_items).astype(np.int32)
        i = (keys % self.data_spec.num_items).astype(np.int32)
        du = np.bincount(u, minlength=self.data_spec.num_users).astype(np.float32)
        di = np.bincount(i, minlength=self.data_spec.num_items).astype(np.float32)
        coef = 1.0 / np.sqrt(
            np.maximum(du[u], 1.0) * np.maximum(di[i], 1.0)
        )
        by_u = np.argsort(u, kind="stable")
        by_i = np.argsort(i, kind="stable")
        self._edges = {
            # item -> user aggregation (dest sorted by user)
            "u_dst": jnp.asarray(u[by_u]),
            "u_src": jnp.asarray(i[by_u]),
            "u_coef": jnp.asarray(coef[by_u]),
            # user -> item aggregation (dest sorted by item)
            "i_dst": jnp.asarray(i[by_i]),
            "i_src": jnp.asarray(u[by_i]),
            "i_coef": jnp.asarray(coef[by_i]),
        }

    # ---- protocol ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        return ()  # propagation touches every row: dense-optimizer territory

    def init_dense(self, rng: jax.Array):
        ku, ki = jax.random.split(rng)
        d = self.embed_dim
        return {
            "user_emb": jax.random.normal(ku, (self.data_spec.num_users, d)) * 0.1,
            "item_emb": jax.random.normal(ki, (self.data_spec.num_items, d)) * 0.1,
        }

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        return {}

    def propagate(self, dense) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean over layers 0..K of the normalized propagation."""
        if self._edges is None:
            raise ValueError(
                "LightGCN.propagate needs attach_graph(train_users, "
                "train_items) (the trainer does this from the train split)"
            )
        e = self._edges
        eu, ei = dense["user_emb"], dense["item_emb"]
        acc_u, acc_i = eu, ei
        for _ in range(self.num_layers):
            new_u = jax.ops.segment_sum(
                jnp.take(ei, e["u_src"], axis=0) * e["u_coef"][:, None],
                e["u_dst"], num_segments=eu.shape[0], indices_are_sorted=True,
            )
            new_i = jax.ops.segment_sum(
                jnp.take(eu, e["i_src"], axis=0) * e["i_coef"][:, None],
                e["i_dst"], num_segments=ei.shape[0], indices_are_sorted=True,
            )
            eu, ei = new_u, new_i
            acc_u = acc_u + eu
            acc_i = acc_i + ei
        k1 = 1.0 / (self.num_layers + 1)
        return acc_u * k1, acc_i * k1

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        pu, qi = self.propagate(dense)
        u = jnp.take(pu, batch["user"], axis=0)
        if self.is_pairwise(batch):
            pos = jnp.take(qi, batch["pos"], axis=0)
            neg = jnp.take(qi, batch["neg"], axis=0)
            return jnp.sum(u * pos, axis=-1) - jnp.sum(u * neg, axis=-1)
        item = jnp.take(qi, batch["item"], axis=0)
        return jnp.sum(u * item, axis=-1)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        pu, qi = self.propagate(params["dense"])
        u = jnp.take(pu, user_ids, axis=0)
        return jnp.dot(u, qi.T, preferred_element_type=jnp.float32)

    def dot_decomposition(self) -> DotRetrieval | None:
        return None  # propagated embeddings live in dense params, not tables
