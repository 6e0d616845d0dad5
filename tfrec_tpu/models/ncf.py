"""Neural collaborative filtering trio: GMF, MLP, NeuMF.

Capability target: the reference family's NCF models ([CONTRACT
BASELINE.json:9]): GMF scores via a learned-weighted elementwise product,
MLP via a tower over concatenated user/item embeddings, NeuMF fuses both
with separate embedding sets. Trained pointwise (logloss over sampled
negatives) or pairwise (BPR).

TPU framing: full-catalog scoring runs as a ``lax.scan`` over item chunks so
the [B, V, D] intermediate never materializes; for GMF the chunk scorer is a
pure MXU matmul of h-scaled user vectors against the item table.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.models.layers import apply_mlp, glorot, init_mlp
from tfrec_tpu.ops.embedding import TableSpec


class _NCFBase(RecModel):
    """Shared pairwise/pointwise plumbing + chunked full-catalog scoring."""

    eval_chunk: int = 1024

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        items = self.pair_item_ids(batch) if self.is_pairwise(batch) else batch["item"]
        ids: Dict[str, jnp.ndarray] = {}
        for spec in self.table_specs():
            ids[spec.name] = batch["user"] if spec.name.startswith("user") else items
        return ids

    def _pair_logit(self, dense, u_g: Dict, i_g: Dict, rng=None) -> jnp.ndarray:
        raise NotImplementedError

    def in_batch_scores(self, dense, u_g: Dict, i_g: Dict) -> jnp.ndarray:
        raise NotImplementedError(
            f"{type(self).__name__} does not support in_batch_softmax "
            "(dot-product scorers only: mf, gmf)"
        )

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        user_keys = [k for k in gathered if k.startswith("user")]
        item_keys = [k for k in gathered if k.startswith("item")]
        u_g = {k: gathered[k] for k in user_keys}
        if self.is_pairwise(batch):
            if "neg" not in batch and "negs" not in batch:
                return self.in_batch_scores(
                    dense, u_g, {k: gathered[k] for k in item_keys}
                )
            bsz = batch["user"].shape[0]
            if "negs" in batch:  # [B, 1+K] score matrix for sampled softmax
                k = batch["negs"].shape[1]
                u_rep = {
                    key: jnp.concatenate([v, jnp.repeat(v, k, axis=0)])
                    for key, v in u_g.items()
                }
                i_g = {key: gathered[key] for key in item_keys}
                s = self._pair_logit(dense, u_rep, i_g, rng)
                return jnp.concatenate(
                    [s[:bsz, None], s[bsz:].reshape(bsz, k)], axis=1
                )
            pos = {k: gathered[k][:bsz] for k in item_keys}
            neg = {k: gathered[k][bsz:] for k in item_keys}
            r1, r2 = (None, None) if rng is None else jax.random.split(rng)
            return self._pair_logit(dense, u_g, pos, r1) - self._pair_logit(
                dense, u_g, neg, r2
            )
        i_g = {k: gathered[k] for k in item_keys}
        return self._pair_logit(dense, u_g, i_g, rng)

    def score_items(self, params, user_ids, item_ids) -> jnp.ndarray:
        """[B, C]: every user in the batch scored against a shared item chunk."""
        t = params["tables"]
        bsz, csz = user_ids.shape[0], item_ids.shape[0]
        u_g = {
            k: jnp.take(t[k], user_ids, axis=0) for k in t if k.startswith("user")
        }
        i_g = {
            k: jnp.take(t[k], item_ids, axis=0) for k in t if k.startswith("item")
        }
        u_rep = {k: jnp.repeat(v, csz, axis=0) for k, v in u_g.items()}  # [B*C, D]
        i_rep = {k: jnp.tile(v, (bsz, 1)) for k, v in i_g.items()}  # [B*C, D]
        return self._pair_logit(params["dense"], u_rep, i_rep).reshape(bsz, csz)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        v = self.data_spec.num_items
        chunk = min(self.eval_chunk, v)
        num_chunks = -(-v // chunk)
        starts = jnp.arange(num_chunks) * chunk

        def body(_, start):
            ids = jnp.minimum(start + jnp.arange(chunk), v - 1)
            return None, self.score_items(params, user_ids, ids)

        _, chunks = jax.lax.scan(body, None, starts)  # [N, B, C]
        return jnp.transpose(chunks, (1, 0, 2)).reshape(user_ids.shape[0], -1)[:, :v]


class GMF(_NCFBase):
    """Generalized MF: logit = h . (p_u * q_i) + b."""

    def __init__(self, data_spec: DataSpec, embed_dim: int):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v, d = self.data_spec.num_users, self.data_spec.num_items, self.embed_dim
        return (TableSpec("user_emb", u, d), TableSpec("item_emb", v, d))

    def init_dense(self, rng: jax.Array):
        return {"h": jnp.ones((self.embed_dim,)) / self.embed_dim, "b": jnp.zeros(())}

    def _pair_logit(self, dense, u_g, i_g, rng=None) -> jnp.ndarray:
        return (u_g["user_emb"] * i_g["item_emb"]) @ dense["h"] + dense["b"]

    def in_batch_scores(self, dense, u_g, i_g) -> jnp.ndarray:
        # h.(u*v) = (u*h).v: [B, B] via one MXU matmul.
        u = u_g["user_emb"] * dense["h"][None, :]
        return jnp.dot(u, i_g["item_emb"].T, preferred_element_type=jnp.float32) + dense["b"]

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        # h.(u*v) = (u*h).v — one MXU matmul against the item table.
        t, d = params["tables"], params["dense"]
        u = jnp.take(t["user_emb"], user_ids, axis=0) * d["h"][None, :]
        return (
            jnp.dot(u, t["item_emb"].T, preferred_element_type=jnp.float32) + d["b"]
        )

    def dot_decomposition(self):
        # Scores on the sharded path omit the rank-invariant scalar b.
        from tfrec_tpu.models.base import DotRetrieval

        return DotRetrieval(
            "user_emb", "item_emb", None,
            transform=lambda dense, u: u * dense["h"][None, :],
        )


class MLP(_NCFBase):
    """NCF-MLP: logit = MLP([p_u ; q_i])."""

    def __init__(
        self, data_spec: DataSpec, embed_dim: int, mlp_dims: Tuple[int, ...],
        dropout: float = 0.0,
    ):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.embed_dim = embed_dim
        self.mlp_dims = tuple(mlp_dims)
        self.dropout = dropout

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v, d = self.data_spec.num_users, self.data_spec.num_items, self.embed_dim
        return (TableSpec("user_emb", u, d), TableSpec("item_emb", v, d))

    def init_dense(self, rng: jax.Array):
        return {"mlp": init_mlp(rng, 2 * self.embed_dim, self.mlp_dims, out_dim=1)}

    def _pair_logit(self, dense, u_g, i_g, rng=None) -> jnp.ndarray:
        z = jnp.concatenate([u_g["user_emb"], i_g["item_emb"]], axis=-1)
        return apply_mlp(dense["mlp"], z, dropout=self.dropout, rng=rng)[:, 0]


class NeuMF(_NCFBase):
    """NeuMF: GMF tower + MLP tower over separate embeddings, fused head."""

    def __init__(
        self,
        data_spec: DataSpec,
        gmf_dim: int,
        mlp_embed_dim: int,
        mlp_dims: Tuple[int, ...],
        dropout: float = 0.0,
    ):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.gmf_dim = gmf_dim
        self.mlp_embed_dim = mlp_embed_dim
        self.mlp_dims = tuple(mlp_dims)
        self.dropout = dropout

    def table_specs(self) -> Tuple[TableSpec, ...]:
        u, v = self.data_spec.num_users, self.data_spec.num_items
        return (
            TableSpec("user_gmf", u, self.gmf_dim),
            TableSpec("item_gmf", v, self.gmf_dim),
            TableSpec("user_mlp", u, self.mlp_embed_dim),
            TableSpec("item_mlp", v, self.mlp_embed_dim),
        )

    def warm_start_aliases(self):
        # The paper's pretraining protocol: both towers seed from a
        # pretrained factorization's user_emb/item_emb (GMF or MF run —
        # train.init_from); dims that don't match are skipped loudly.
        return {
            "user_gmf": "user_emb", "item_gmf": "item_emb",
            "user_mlp": "user_emb", "item_mlp": "item_emb",
        }

    def init_dense(self, rng: jax.Array):
        k_mlp, k_out = jax.random.split(rng)
        head_in = self.gmf_dim + self.mlp_dims[-1]
        return {
            "mlp": init_mlp(k_mlp, 2 * self.mlp_embed_dim, self.mlp_dims),
            "w_out": glorot(k_out, (head_in, 1)),
            "b_out": jnp.zeros(()),
        }

    def _pair_logit(self, dense, u_g, i_g, rng=None) -> jnp.ndarray:
        gmf_vec = u_g["user_gmf"] * i_g["item_gmf"]
        z = jnp.concatenate([u_g["user_mlp"], i_g["item_mlp"]], axis=-1)
        # All layers of the tower are "hidden": ReLU on the last too, per NCF.
        mlp_vec = apply_mlp(
            dense["mlp"], z, final_linear=False, dropout=self.dropout, rng=rng
        )
        fused = jnp.concatenate([gmf_vec, mlp_vec], axis=-1)
        return (fused @ dense["w_out"])[:, 0] + dense["b_out"]
