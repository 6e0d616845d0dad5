"""Model protocol: tables + dense params + pure forward functions.

The reference family's ``AbstractRecommender`` couples graph construction,
training, and prediction into one TF-session class (SURVEY.md §1a).  Here a
model is a thin declarative object over pure functions, so one generic
jit/pjit train step serves the whole zoo and the embedding path can be
swapped (local gather / Pallas kernel / sharded all-to-all lookup) without
touching model code:

- ``table_specs()``        — which embedding tables exist (vocab, dim).
- ``init_dense(rng)``      — dense-tower params as a pytree (may be empty).
- ``lookup_ids(batch)``    — {table: flat int32 ids} needed for this batch.
- ``forward(dense, gathered, batch)`` — logits from gathered rows.
    * pairwise batches {user,pos,neg}: returns s(u,pos) - s(u,neg), shape [B]
    * pointwise/CTR batches: returns logits, shape [B]
- retrieval models add ``score_all(params, user_ids)`` -> [B, num_items]
  for full-catalog top-k evaluation.

``params`` pytree convention everywhere: {"tables": {name: [V,D]},
"dense": <model pytree>}.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from tfrec_tpu.ops.embedding import TableSpec, init_tables


@dataclasses.dataclass(frozen=True)
class DataSpec:
    """Shape description of the data a model is built for."""

    kind: str  # "interaction" (user/item) | "ctr" (dense + categorical fields)
    num_users: int = 0
    num_items: int = 0
    field_vocabs: Tuple[int, ...] = ()
    num_dense: int = 0
    # Multi-hot bag width per field (1 = single-hot). A width-W field
    # occupies W columns of batch["cat"], padded with the sentinel value
    # ``vocab`` (one past the end); embeddings are mean-combined over the
    # valid ids (SURVEY.md §5: bag width is the recsys sequence-length
    # analog — scaled by sharding, not sequence parallelism).
    field_widths: Tuple[int, ...] = ()

    @staticmethod
    def interaction(num_users: int, num_items: int) -> "DataSpec":
        return DataSpec(kind="interaction", num_users=num_users, num_items=num_items)

    @staticmethod
    def ctr(
        field_vocabs: Sequence[int],
        num_dense: int,
        field_widths: Sequence[int] | None = None,
    ) -> "DataSpec":
        vocabs = tuple(field_vocabs)
        widths = tuple(field_widths) if field_widths else (1,) * len(vocabs)
        assert len(widths) == len(vocabs), (widths, vocabs)
        return DataSpec(
            kind="ctr", field_vocabs=vocabs, num_dense=num_dense,
            field_widths=widths,
        )


@dataclasses.dataclass(frozen=True)
class DotRetrieval:
    """Dot-product decomposition of a retrieval scorer, for the sharded
    top-k path (parallel/topk.py): score_all(params, u) equals
    ``transform(dense, take(tables[user_table], u)) @ tables[item_table].T
    (+ tables[bias_table][:, 0])`` up to a rank-invariant constant.

    ``transform`` (optional) maps gathered user rows to query vectors using
    dense params (e.g. GMF's elementwise ``h`` weighting); identity if None.
    """

    user_table: str
    item_table: str
    bias_table: str | None = None
    transform: "Callable | None" = None

    def user_vecs(self, dense, user_rows: jnp.ndarray) -> jnp.ndarray:
        return user_rows if self.transform is None else self.transform(dense, user_rows)


class RecModel(abc.ABC):
    """Base class; subclasses are stateless describers of one architecture."""

    data_spec: DataSpec

    @abc.abstractmethod
    def table_specs(self) -> Tuple[TableSpec, ...]:
        ...

    @abc.abstractmethod
    def init_dense(self, rng: jax.Array):
        ...

    @abc.abstractmethod
    def lookup_ids(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        ...

    @abc.abstractmethod
    def forward(
        self, dense, gathered: Dict[str, jnp.ndarray], batch, *, rng=None
    ) -> jnp.ndarray:
        """Logits. ``rng`` is supplied only on training steps (enables
        dropout); eval paths omit it."""
        ...

    def init(self, rng: jax.Array):
        """Full params pytree: {"tables": ..., "dense": ...}."""
        k_tables, k_dense = jax.random.split(rng)
        return {
            "tables": init_tables(k_tables, self.table_specs()),
            "dense": self.init_dense(k_dense),
        }

    # ---- retrieval-eval surface (interaction models override) ----

    def score_all(self, params, user_ids: jnp.ndarray) -> jnp.ndarray:
        """[B, num_items] scores of the full catalog for a user batch."""
        raise NotImplementedError(f"{type(self).__name__} is not a retrieval model")

    def dot_decomposition(self) -> "DotRetrieval | None":
        """Non-None when score_all is a plain dot product against one item
        table — enables the distributed top-k eval/serving path on sharded
        tables without materializing them (BASELINE.json R7)."""
        return None

    def warm_start_aliases(self) -> Dict[str, str]:
        """target-table-name -> source-table-name map for cross-model
        warm starts (train.init_from). Unmapped tables match by name."""
        return {}

    # ---- helpers shared by pairwise-capable models ----

    @staticmethod
    def is_pairwise(batch) -> bool:
        return "pos" in batch

    @staticmethod
    def pair_item_ids(batch) -> jnp.ndarray:
        """Item-id vector for a pairwise batch: [pos; negs...], length
        B*(1+K). Single-negative batches have "neg" [B]; multi-negative
        batches (sampled softmax) have "negs" [B, K]; in-batch-negative
        batches have only "pos" (each row's positive is every other row's
        negative)."""
        if "negs" in batch:
            return jnp.concatenate([batch["pos"], batch["negs"].reshape(-1)])
        if "neg" in batch:
            return jnp.concatenate([batch["pos"], batch["neg"]])
        return batch["pos"]
