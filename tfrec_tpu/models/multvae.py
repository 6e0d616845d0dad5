"""MultVAE — variational autoencoder over implicit-feedback user vectors
(Liang et al. 2018's Mult-VAE^PR), the strong non-factorization
retrieval baseline of the reference family's long-tail zoo
(SURVEY.md §2a "other zoo": CDAE/VAE-CF lineage).

TPU-native framing: the encoder's first layer W1^T x over a multi-hot
user vector x IS an embedding-bag — table "enc1" [V, H1] on the sparse
path, summed over the sentinel-padded [B, H] history ids from the batch
(data/samplers.py UserHistorySampler) and scaled by 1/sqrt(n) (the
paper's L2 input normalization). The decoder's [H1, V] output matmul
stays a dense param: the softmax over V makes every output column's
gradient dense by construction, so the MXU matmul + Adam is the right
path, not a scatter.

forward returns {"logits": [B, V], "kl": [B]} with kl pre-scaled by the
model's beta; the "multvae" loss (train/losses.py) adds the multinomial
NLL over the history ids. Training batches ARE the reconstruction
target (input dropout provides the denoising signal); beta is fixed
(Mult-VAE^PR without the anneal schedule — pass model.vae_beta).

Eval: ``score_all`` reconstructs from the attached full history matrix
(z = mu, no sampling) — same O(U*H) footprint note as FISM.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class MultVAE(RecModel):
    def __init__(self, data_spec: DataSpec, hidden_dim: int = 256,
                 latent_dim: int = 64, beta: float = 0.2,
                 dropout: float = 0.5, max_history: int = 50,
                 variational: bool = True):
        assert data_spec.kind == "interaction"
        self.data_spec = data_spec
        self.hidden_dim = hidden_dim
        self.latent_dim = latent_dim
        self.beta = beta
        self.dropout = dropout
        self.max_history = max_history
        # variational=False is Mult-DAE (Liang et al. 2018's denoising
        # sibling): deterministic bottleneck, no KL — the input dropout
        # alone provides the denoising signal. model.name="multdae".
        self.variational = variational
        self._hist = None
        self._hist_len = None

    # ---- protocol ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        return (TableSpec("enc1", self.data_spec.num_items, self.hidden_dim),)

    def init_dense(self, rng: jax.Array):
        v, h, z = self.data_spec.num_items, self.hidden_dim, self.latent_dim
        ks = jax.random.split(rng, 3)

        def glorot(k, fan_in, fan_out):
            lim = jnp.sqrt(6.0 / (fan_in + fan_out))
            return jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -lim, lim)

        z_out = 2 * z if self.variational else z
        return {
            "b_enc1": jnp.zeros((h,)),
            "w_enc2": glorot(ks[0], h, z_out),
            "b_enc2": jnp.zeros((z_out,)),
            "w_dec1": glorot(ks[1], z, h),
            "b_dec1": jnp.zeros((h,)),
            "w_out": glorot(ks[2], h, v),
            "b_out": jnp.zeros((v,)),
        }

    def needs_history(self) -> bool:
        return True

    def attach_history(self, hist, hist_len) -> None:
        self._hist = jnp.asarray(hist)
        self._hist_len = jnp.asarray(hist_len)

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        return {"enc1": batch["hist"].reshape(-1)}

    # ---- network ----

    def _encode_decode(self, dense, bag_rows, hist, *, rng):
        """bag_rows: [B*H, H1] gathered enc1 rows. Returns (logits, kl)."""
        v = self.data_spec.num_items
        b, h = hist.shape
        rows = bag_rows.reshape(b, h, -1)
        valid = (hist < v).astype(rows.dtype)  # [B, H]
        if rng is not None and self.dropout > 0.0:
            # Input dropout on history ITEMS (the denoising signal): each
            # kept with prob 1-p, bag rescaled — dropout on the multi-hot
            # input, expressed on the bag members.
            k_drop, rng = jax.random.split(rng)
            keep = jax.random.bernoulli(
                k_drop, 1.0 - self.dropout, valid.shape
            ).astype(rows.dtype)
            valid = valid * keep / (1.0 - self.dropout)
        n = jnp.maximum(valid.sum(axis=1), 1.0)
        x = jnp.einsum("bh,bhd->bd", valid, rows) / jnp.sqrt(n)[:, None]
        h1 = jnp.tanh(x + dense["b_enc1"])
        stats = jnp.dot(h1, dense["w_enc2"]) + dense["b_enc2"]
        if self.variational:
            mu, logvar = jnp.split(stats, 2, axis=-1)
            logvar = jnp.clip(logvar, -10.0, 10.0)
            if rng is not None:
                eps = jax.random.normal(rng, mu.shape, mu.dtype)
                z = mu + eps * jnp.exp(0.5 * logvar)
            else:
                z = mu
            kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
        else:  # Mult-DAE: deterministic tanh bottleneck, no KL
            z = jnp.tanh(stats)
            kl = jnp.zeros(stats.shape[0], stats.dtype)
        h3 = jnp.tanh(jnp.dot(z, dense["w_dec1"]) + dense["b_dec1"])
        logits = (
            jnp.dot(h3, dense["w_out"], preferred_element_type=jnp.float32)
            + dense["b_out"]
        )
        return logits, kl

    def forward(self, dense, gathered, batch, *, rng=None):
        logits, kl = self._encode_decode(
            dense, gathered["enc1"], batch["hist"], rng=rng
        )
        return {"logits": logits, "kl": self.beta * kl}

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        if self._hist is None:
            raise ValueError(
                "MultVAE.score_all needs attach_history(hist, hist_len) "
                "(the trainer does this from the train split)"
            )
        hist = jnp.take(self._hist, user_ids, axis=0)
        rows = jnp.take(
            params["tables"]["enc1"], hist.reshape(-1), axis=0, mode="clip"
        )
        logits, _ = self._encode_decode(params["dense"], rows, hist, rng=None)
        return logits
