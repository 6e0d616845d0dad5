"""Alternating least squares for implicit feedback (WRMF — Hu, Koren,
Volinsky 2008), the classic non-SGD trainer of the reference family's
``WRMF`` recommender (SURVEY.md §2a family long tail).

TPU-native framing: one ALS sweep is a batched closed-form ridge solve —
exactly the shape the MXU likes:

- the Gram matrix ``G = Yᵀ Y`` of the frozen side is ONE [D, D] matmul;
- a batch of B users solves ``(G + α·Yᵤᵀ Yᵤ + λI) xᵤ = (1+α)·Yᵤᵀ 1``
  as a [B, D, D] ``jnp.linalg.solve`` over einsum-built normal matrices,
  with the per-user observed rows gathered from a sentinel-padded
  history matrix (static shapes; padding rows solve to 0 and are
  discarded);
- the full weighted objective is evaluated EXACTLY per sweep via the
  trace identity ``Σ_{all ui} sᵤᵢ² = trace((XᵀX)(YᵀY))`` plus a gathered
  pass over the nnz positives — O(nnz·D + (U+V)·D²), no U×V matrix —
  and must decrease monotonically (pinned by tests/test_wrmf.py).

No SGD, no sampler, no sparse-optimizer state: the Trainer's
closed-form hook (``WRMF.make_solver``) routes here (train/trainer.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def padded_lists(rows: np.ndarray, cols: np.ndarray, num_rows: int,
                 sentinel: int) -> Tuple[np.ndarray, np.ndarray]:
    """CSR-style (row -> padded col list). Width = max row degree (exact,
    never truncated — a dropped interaction would silently change the
    solution). Returns (hist [num_rows, H] int32 sentinel-padded, lens)."""
    order = np.argsort(rows, kind="stable")
    r, c = rows[order], cols[order]
    lens = np.bincount(r, minlength=num_rows)
    width = max(int(lens.max()) if len(r) else 0, 1)
    hist = np.full((num_rows, width), sentinel, np.int32)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    intra = np.arange(len(r)) - np.repeat(starts, lens)
    hist[r, intra] = c
    return hist, lens.astype(np.int32)


# HIGHEST matmul precision throughout: these products feed matrix
# inverses and the exact-objective trace identity; TPU's default bf16
# MXU inputs would perturb the normal equations and could break the
# monotone-objective invariant tests pin (CLAUDE.md gotcha 5). The
# solver is a tiny fraction of sweep cost, so this is nearly free.
_HI = jax.lax.Precision.HIGHEST


def _solve_batch(other: jnp.ndarray, gram: jnp.ndarray, hist: jnp.ndarray,
                 alpha: float, reg: float) -> jnp.ndarray:
    """Closed-form rows for one batch: hist [B, H] indexes ``other`` [N, D]
    (sentinel N = padding). Returns [B, D]."""
    n, d = other.shape
    valid = (hist < n)[..., None]                       # [B, H, 1]
    y = jnp.take(other, jnp.minimum(hist, n - 1), axis=0) * valid  # [B, H, D]
    a = (
        gram[None]
        + alpha * jnp.einsum("bhd,bhe->bde", y, y, precision=_HI,
                             preferred_element_type=jnp.float32)
        + reg * jnp.eye(d, dtype=other.dtype)[None]
    )
    b = (1.0 + alpha) * jnp.sum(y, axis=1)              # [B, D]
    return jnp.linalg.solve(a, b[..., None])[..., 0]


def sweep_body(alpha: float, reg: float):
    """Raw (unjitted) half-sweep — for callers composing sweeps inside a
    larger program (bench.py's chained-sweep slope protocol)."""

    def sweep(other: jnp.ndarray, hist_batches: jnp.ndarray) -> jnp.ndarray:
        gram = jnp.dot(other.T, other, precision=_HI,
                       preferred_element_type=jnp.float32)

        def body(_, h):
            return None, _solve_batch(other, gram, h, alpha, reg)

        _, out = jax.lax.scan(body, None, hist_batches)
        return out.reshape(-1, other.shape[1])

    return sweep


def make_sweep(alpha: float, reg: float, mesh=None):
    """One jitted half-sweep: re-solve every row of one side against the
    frozen other side, scanning [num_batches, batch]-padded histories.

    ``mesh``: the per-row solves are embarrassingly parallel, so on a
    device mesh the batch dimension shards over the 'data' axis (frozen
    side replicated) and GSPMD inserts ONE all-gather for the returned
    table — the closed-form family's multi-chip form. Equivalence with
    the single-device sweep is pinned on the 8-device virtual mesh
    (tests/test_wrmf.py)."""
    sweep = sweep_body(alpha, reg)
    if mesh is None:
        return jax.jit(sweep)
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    rows = NamedSharding(mesh, PartitionSpec(None, "data", None))
    return jax.jit(sweep, in_shardings=(rep, rows), out_shardings=rep)


def make_objective(alpha: float, reg: float):
    """Exact WRMF objective J = Σ_ui c_ui (p_ui - xᵤᵀy_i)² + λ(‖X‖²+‖Y‖²)
    with c=1 for unobserved and 1+α for observed, via the trace identity
    (no U×V materialization). ``pos_u/pos_i`` are the nnz train pairs."""

    @jax.jit
    def objective(x: jnp.ndarray, y: jnp.ndarray, pos_u: jnp.ndarray,
                  pos_i: jnp.ndarray) -> jnp.ndarray:
        gx = jnp.dot(x.T, x, precision=_HI,
                     preferred_element_type=jnp.float32)
        gy = jnp.dot(y.T, y, precision=_HI,
                     preferred_element_type=jnp.float32)
        all_sq = jnp.sum(gx * gy)  # Σ over ALL (u,i) of (xᵤᵀy_i)²
        s = jnp.sum(jnp.take(x, pos_u, axis=0) * jnp.take(y, pos_i, axis=0),
                    axis=-1)
        # observed pairs: replace the background s² term by (1+α)(1-s)².
        pos_term = jnp.sum((1.0 + alpha) * (1.0 - s) ** 2 - s**2)
        return (
            all_sq + pos_term
            + reg * (jnp.sum(x * x) + jnp.sum(y * y))
        )

    return objective


class ALSTrainer:
    """Drives WRMF sweeps over a train split (users half, then items half).

    Batching pads each side's row count up to a multiple of ``batch`` with
    all-sentinel histories (their solves are exactly 0 and sliced off).
    """

    def __init__(self, dataset, embed_dim: int, alpha: float, reg: float,
                 batch: int = 1024, seed: int = 0, mesh=None):
        nu, ni = dataset.num_users, dataset.num_items
        tr = dataset.train
        self.num_users, self.num_items = nu, ni
        if mesh is not None:
            # Solve-batch rows shard over 'data'; round the batch up so
            # every shard is equal (padding rows solve to 0 regardless).
            n_data = mesh.shape["data"]
            batch = -(-batch // n_data) * n_data
        u_hist, _ = padded_lists(tr.users, tr.items, nu, sentinel=ni)
        i_hist, _ = padded_lists(tr.items, tr.users, ni, sentinel=nu)
        self.u_hist = self._batched(u_hist, batch, ni)
        self.i_hist = self._batched(i_hist, batch, nu)
        self.pos_u = jnp.asarray(tr.users.astype(np.int32))
        self.pos_i = jnp.asarray(tr.items.astype(np.int32))
        self.sweep = make_sweep(alpha, reg, mesh=mesh)
        self.objective = make_objective(alpha, reg)
        k = jax.random.PRNGKey(seed)
        ku, ki = jax.random.split(k)
        scale = 1.0 / np.sqrt(embed_dim)
        self.x = jax.random.normal(ku, (nu, embed_dim), jnp.float32) * scale
        self.y = jax.random.normal(ki, (ni, embed_dim), jnp.float32) * scale

    @staticmethod
    def _batched(hist: np.ndarray, batch: int, sentinel: int) -> jnp.ndarray:
        n, w = hist.shape
        pad = (-n) % batch
        if pad:
            hist = np.concatenate(
                [hist, np.full((pad, w), sentinel, np.int32)]
            )
        return jnp.asarray(hist.reshape(-1, batch, w))

    def epoch(self) -> Dict[str, float]:
        """One full sweep (users then items); returns the exact objective."""
        self.x = self.sweep(self.y, self.u_hist)[: self.num_users]
        self.y = self.sweep(self.x, self.i_hist)[: self.num_items]
        j = float(self.objective(self.x, self.y, self.pos_u, self.pos_i))
        return {"loss": j}

    def tables(self) -> Dict[str, jnp.ndarray]:
        return {"user_emb": self.x, "item_emb": self.y}

    def load(self, tables: Dict[str, jnp.ndarray]) -> None:
        """Checkpoint-resume hook (train/trainer.py closed-form path)."""
        self.x = tables["user_emb"]
        self.y = tables["item_emb"]
