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
        # HIGHEST matmul precision: the solve feeds a matrix inverse, and
        # TPU's default bf16 MXU inputs would perturb the normal equations
        # (CLAUDE.md gotcha 5); these are one-shot ops, the cost is nil.
        hi = jax.lax.Precision.HIGHEST

        @jax.jit
        def solve(x_mat):
            gram = jnp.dot(x_mat.T, x_mat, precision=hi,
                           preferred_element_type=jnp.float32)
            gram = gram + reg * jnp.eye(gram.shape[0], dtype=gram.dtype)
            # P = gram^-1 via Cholesky (gram is SPD for reg > 0).
            c, low = jax.scipy.linalg.cho_factor(gram)
            p = jax.scipy.linalg.cho_solve(
                (c, low), jnp.eye(gram.shape[0], dtype=gram.dtype)
            )
            b = jnp.eye(p.shape[0], dtype=p.dtype) - p / jnp.diag(p)[None, :]
            recon = jnp.dot(x_mat, b, precision=hi,
                            preferred_element_type=jnp.float32)
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
        # ease_x (the binary train matrix) rides in the state so eval
        # programs receive it as a jit ARGUMENT (never a trace-time
        # closure constant) and checkpoints are self-contained.
        return {"ease_bt": self.b.T, "ease_x": self.x}

    def load(self, tables: Dict[str, jnp.ndarray]) -> None:
        self.b = tables["ease_bt"].T
        self.x = tables["ease_x"]
        self.model.attach_solution(self.b)
        self.model.attach_history_matrix(self.x)


class EASE(RecModel):
    solver_loss_name = "ease"

    # Dense-matrix budgets, refused loudly (f32 elements): the [V,V]
    # solve and the [U,V] train matrix BOTH must fit.
    MAX_ITEMS = 32768
    MAX_ELEMENTS = 1 << 28  # ~1 GB f32 for the [U,V] matrix

    def __init__(self, data_spec: DataSpec, reg: float = 100.0,
                 max_items: int | None = None):
        assert data_spec.kind == "interaction"
        max_items = self.MAX_ITEMS if max_items is None else max_items
        if data_spec.num_items > max_items:
            raise ValueError(
                f"EASE holds a dense [V, V] item matrix; V="
                f"{data_spec.num_items} exceeds max_items={max_items} "
                "(V^2 memory). Use wrmf/mf for large catalogs."
            )
        if data_spec.num_users * data_spec.num_items > self.MAX_ELEMENTS:
            raise ValueError(
                f"EASE builds a dense [U, V] train matrix; "
                f"{data_spec.num_users} x {data_spec.num_items} exceeds "
                f"{self.MAX_ELEMENTS} f32 elements (~1 GB). Use wrmf/mf "
                "for this scale."
            )
        self.data_spec = data_spec
        self.reg = reg
        self._x = None  # [U, V] binary train matrix (solver attaches)
        self._b = None  # solved [V, V] (solver attaches; info only)

    def make_solver(self, dataset, *, batch: int, seed: int, mesh=None):
        # mesh ignored: the [V,V] solve is one dense op; XLA/GSPMD can
        # shard it internally if the arrays are ever sharded, but at the
        # guarded sizes replication is optimal.
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
        # ease_x arrives through params (a jit argument), never through
        # self._x (a [U,V] trace-time constant would be baked into the
        # compiled eval program — the repo's jit-closure bug class).
        x = jnp.take(params["tables"]["ease_x"], user_ids, axis=0)
        return jnp.dot(x, params["tables"]["ease_bt"].T,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        # Pointwise predict for serving; no train-time forward exists.
        if self.is_pairwise(batch):
            raise ValueError("EASE has no SGD objective; it trains closed-form")
        return jnp.sum(batch["hist_x"] * gathered["ease_bt"], axis=-1)

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        return self._scores(params, user_ids)

    def score_user_items(self, params, user_ids, item_ids) -> jnp.ndarray:
        """Sampled-eval fast path (eval/sampled.py): full-catalog row per
        user (one [B,V]x[V,V] matmul), then gather the candidates."""
        scores = self._scores(params, user_ids)  # [B, V]
        return jnp.take_along_axis(scores, item_ids, axis=1)
