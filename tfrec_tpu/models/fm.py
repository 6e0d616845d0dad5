"""Factorization machine — pointwise CTR over multi-field categoricals.

Capability target: the reference family's ``FM`` recommender ([CONTRACT
BASELINE.json:8]). logit = w0 + w_d.x_dense + sum_f lin_f[id_f]
+ 0.5(||sum v||^2 - sum ||v||^2). The second-order term uses the O(F*D)
identity (models/ctr_base.py) — no pairwise loop, pure VPU.

For the 2-field (user, item) instantiation used on MovieLens, FM is also a
retrieval model: score_all reduces to an MF-style MXU matmul plus biases.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfrec_tpu.models.base import DataSpec
from tfrec_tpu.models.ctr_base import CTRBase, fm_second_order


class FM(CTRBase):
    use_linear_tables = True

    def init_dense(self, rng: jax.Array):
        d = {"w0": jnp.zeros(())}
        if self.data_spec.num_dense > 0:
            d["w_dense"] = jnp.zeros((self.data_spec.num_dense,))
        return d

    def forward(self, dense, gathered, batch, *, rng=None) -> jnp.ndarray:
        logit = dense["w0"] + self.linear_sum(gathered, batch)
        if self.data_spec.num_dense > 0:
            logit = logit + batch["dense"] @ dense["w_dense"]
        return logit + fm_second_order(self.field_stack(gathered, batch))

    def dot_decomposition(self):
        # 2-field (u, i) form only: scores differ from score_all by the
        # rank-invariant per-user constant u_lin + w0. The stacked/packed
        # layouts have no per-field table names for the sharded-topk path
        # to address (they target the many-field CTR configs; auto lane
        # packing skips retrieval-capable models for exactly this reason —
        # models/__init__.lane_pack_applies).
        if (self.num_fields != 2 or self.data_spec.num_dense != 0
                or self.stack_tables or self.lane_pack):
            return None
        from tfrec_tpu.models.base import DotRetrieval

        return DotRetrieval("field_0", "field_1", "lin_1")

    def _table_view(self, tables, f: int, prefix: str = "field"):
        """Field f's [V_f, d] table in any layout (static slices of the
        stacked/packed tables — eval-path only)."""
        if self.lane_pack:
            if prefix == "field":
                k, slot = self._pack_of[f]
                d = self.field_dims[0]
                t = tables[f"pack_{k}"]
            else:
                k, slot = self._lin_pack_of[f]
                d = 1
                t = tables[f"linpack_{k}"]
            vf = self.data_spec.field_vocabs[f]
            return t[:vf, slot * d : (slot + 1) * d]
        if self.stack_tables:
            key = "fields" if prefix == "field" else "lin"
            off = self._voffsets[f]
            return tables[key][off : off + self.data_spec.field_vocabs[f]]
        return tables[f"{prefix}_{f}"]

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        """Full-catalog scores for the (user, item) 2-field case: the only
        cross-field second-order term is <v_u, v_i>."""
        if self.num_fields != 2 or self.data_spec.num_dense != 0:
            raise NotImplementedError("score_all requires the 2-field (u,i) form")
        t, d = params["tables"], params["dense"]
        u = jnp.take(self._table_view(t, 0), user_ids, axis=0)
        u_lin = jnp.take(self._table_view(t, 0, "lin"), user_ids, axis=0)[:, 0]
        items = self._table_view(t, 1)
        scores = jnp.dot(u, items.T, preferred_element_type=jnp.float32)
        it_lin = self._table_view(t, 1, "lin")[:, 0]
        return scores + u_lin[:, None] + it_lin[None, :] + d["w0"]
