"""EASE — embarrassingly shallow autoencoder (Steck 2019), the strongest
closed-form item-item baseline of the modern recsys literature; joins
WRMF in this framework's closed-form family (no SGD — the Trainer's
``make_solver`` hook, train/trainer.py).

The model is one item-item weight matrix with zero diagonal:

    B = argmin ||X - XB||² + λ||B||²  s.t. diag(B) = 0
      = I - P · diag(1/diag(P)),   P = (XᵀX + λI)⁻¹

TPU-native framing: the whole "training run" is one Gram matmul
``XᵀX`` (MXU) plus ONE [V, V] Cholesky solve against the identity —
the canonical dense-linear-algebra shape XLA excels at. Scoring a user
batch is a [B, V] multi-hot times [V, V] matmul (never the [B, H, V]
gather form). Memory scales as V² (f32): fine through V ≈ 30k on one
v5e chip, refused loudly above ``max_items`` rather than silently
spilling — EASE at Criteo-scale vocabularies is the wrong algorithm,
not a framework gap.

Eval/serving read the solved matrix from ``params["tables"]["ease_bt"]``
(stored TRANSPOSED so pointwise predict can gather score columns as
rows through the standard lookup seam) and the user's exact (never
truncated) train history attached by the solver.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.models.base import DataSpec, RecModel
from tfrec_tpu.ops.embedding import TableSpec


class EASETrainer:
    """One-shot ridge solve; epoch() is idempotent (preset epochs=1)."""

    def __init__(self, dataset, model: "EASE", reg: float):
        self.model = model
        self.reg = reg
        nu, ni = dataset.num_users, dataset.num_items
        x = np.zeros((nu, ni), np.float32)
        x[dataset.train.users, dataset.train.items] = 1.0
        self.x = jnp.asarray(x)
        self.b = jnp.zeros((ni, ni), jnp.float32)
        model.attach_history_matrix(self.x)

        @jax.jit
        def solve(x_mat):
            gram = jnp.dot(x_mat.T, x_mat, preferred_element_type=jnp.float32)
            gram = gram + reg * jnp.eye(gram.shape[0], dtype=gram.dtype)
            # P = gram^-1 via Cholesky (gram is SPD for reg > 0).
            c, low = jax.scipy.linalg.cho_factor(gram)
            p = jax.scipy.linalg.cho_solve(
                (c, low), jnp.eye(gram.shape[0], dtype=gram.dtype)
            )
            b = jnp.eye(p.shape[0], dtype=p.dtype) - p / jnp.diag(p)[None, :]
            recon = jnp.dot(x_mat, b, preferred_element_type=jnp.float32)
            loss = (
                jnp.sum((x_mat - recon) ** 2) + reg * jnp.sum(b * b)
            )
            return b, loss

        self._solve = solve

    def epoch(self) -> Dict[str, float]:
        self.b, loss = self._solve(self.x)
        self.model.attach_solution(self.b)
        return {"loss": float(loss)}

    def tables(self) -> Dict[str, jnp.ndarray]:
        return {"ease_bt": self.b.T}

    def load(self, tables: Dict[str, jnp.ndarray]) -> None:
        self.b = tables["ease_bt"].T
        self.model.attach_solution(self.b)


class EASE(RecModel):
    solver_loss_name = "ease"

    def __init__(self, data_spec: DataSpec, reg: float = 100.0,
                 max_items: int = 32768):
        assert data_spec.kind == "interaction"
        if data_spec.num_items > max_items:
            raise ValueError(
                f"EASE holds a dense [V, V] item matrix; V="
                f"{data_spec.num_items} exceeds max_items={max_items} "
                "(V^2 memory). Use wrmf/mf for large catalogs."
            )
        self.data_spec = data_spec
        self.reg = reg
        self._x = None  # [U, V] binary train matrix (solver attaches)
        self._b = None  # solved [V, V] (solver attaches; info only)

    def make_solver(self, dataset, *, batch: int, seed: int):
        return EASETrainer(dataset, self, self.reg)

    def attach_history_matrix(self, x: jnp.ndarray) -> None:
        self._x = x

    def attach_solution(self, b: jnp.ndarray) -> None:
        self._b = b

    def pointwise_batch_extras(self, user_ids: jnp.ndarray):
        """serve.Recommender predict(): the user's multi-hot train row
        rides as a jit ARGUMENT (the serving history convention)."""
        if self._x is None:
            raise ValueError(
                "EASE scoring needs the train matrix; run the Trainer "
                "(its solver attaches it) before evaluate/serve"
            )
        return {"hist_x": jnp.take(self._x, user_ids, axis=0)}

    # ---- protocol (eval/serving only; no SGD path) ----

    def table_specs(self) -> Tuple[TableSpec, ...]:
        return ()

    def init_dense(self, rng: jax.Array):
        return {}

    def lookup_ids(self, batch) -> Dict[str, jnp.ndarray]:
        if "item" in batch and "hist_x" in batch:
            # Pointwise predict: row i of B^T is score column i of B.
            return {"ease_bt": batch["item"]}
        return {}

    def _scores(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        if self._x is None:
            raise ValueError(
                "EASE scoring needs the train matrix; run the Trainer "
                "(its solver attaches it) before evaluate/serve"
            )
        x = jnp.take(self._x, user_ids, axis=0)  # [B, V] multi-hot
        return jnp.dot(x, params["tables"]["ease_bt"].T,
                       preferred_element_type=jnp.float32)

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        # Pointwise predict for serving; no train-time forward exists.
        if self.is_pairwise(batch):
            raise ValueError("EASE has no SGD objective; it trains closed-form")
        return jnp.sum(batch["hist_x"] * gathered["ease_bt"], axis=-1)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        return self._scores(params, user_ids)
