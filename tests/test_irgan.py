"""IRGAN: the minimax structure must hold inside ONE step (disjoint
player gradients), the generator's Gumbel draw must follow its own
softmax, and the game must still produce a useful recommender."""

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.losses import make_loss
from tfrec_tpu.train.trainer import run


def _pool_batch(rng, nu, ni, b, k):
    return {
        "user": jnp.asarray(rng.integers(0, nu, b, dtype=np.int32)),
        "pos": jnp.asarray(rng.integers(0, ni, b, dtype=np.int32)),
        "negs": jnp.asarray(rng.integers(0, ni, (b, k), dtype=np.int32)),
    }


def _gathered(m, params, batch):
    return {
        k: jnp.take(params["tables"][k], v, axis=0)
        for k, v in m.lookup_ids(batch).items()
    }


def test_irgan_player_gradients_are_disjoint():
    """The discriminator term must not reach generator tables and the
    REINFORCE term must not reach discriminator tables — this is what
    makes the simultaneous one-program step equal to the reference
    family's alternating D/G phases on the same batch."""
    m = build_model(
        ModelConfig(name="irgan", embed_dim=16), DataSpec.interaction(32, 64)
    )
    params = m.init(jax.random.PRNGKey(0))
    batch = _pool_batch(np.random.default_rng(0), 32, 64, 64, 8)
    rng = jax.random.PRNGKey(7)

    def part(g, which):
        out = m.forward({}, g, batch, rng=rng)
        d = jnp.mean(
            jax.nn.softplus(-out["d_pos"]) + jax.nn.softplus(out["d_sel"])
        )
        adv = out["reward"] - jnp.mean(out["reward"])
        gl = -jnp.mean(adv * out["logp"])
        return d if which == "d" else gl

    g0 = _gathered(m, params, batch)
    grad_d = jax.grad(lambda g: part(g, "d"))(g0)
    grad_g = jax.grad(lambda g: part(g, "g"))(g0)
    for name in ("user_g", "item_g", "bias_g"):
        assert float(jnp.abs(grad_d[name]).max()) == 0.0, name
    for name in ("user_d", "item_d", "bias_d"):
        assert float(jnp.abs(grad_g[name]).max()) == 0.0, name
    # ... and each player's own gradient is live.
    assert float(jnp.abs(grad_d["user_d"]).max()) > 0.0
    assert float(jnp.abs(grad_g["user_g"]).max()) > 0.0

    # The combined registered loss is exactly the sum of the two parts.
    out = m.forward({}, g0, batch, rng=rng)
    total = make_loss("irgan")(out, batch)
    np.testing.assert_allclose(
        float(total), float(part(g0, "d") + part(g0, "g")), rtol=1e-6
    )


def test_irgan_sampling_follows_generator_softmax():
    """Make one pool column dominate the generator's logits; the
    Gumbel-max draw must pick it at close to its softmax probability."""
    m = build_model(
        ModelConfig(name="irgan", embed_dim=8), DataSpec.interaction(4, 32)
    )
    params = m.init(jax.random.PRNGKey(0))
    b, k = 64, 4
    batch = _pool_batch(np.random.default_rng(1), 4, 32, b, k)
    g = _gathered(m, params, batch)
    # Force column 2 of every pool to score ~+4 against ~0 others.
    item_g = jnp.zeros_like(g["item_g"])
    boosted = item_g.at[b + 2 :: k].set(4.0 / m.embed_dim)
    g = {**g, "item_g": boosted, "user_g": jnp.ones_like(g["user_g"]),
         "bias_g": jnp.zeros_like(g["bias_g"])}
    picks = []
    for s in range(50):
        out = m.forward({}, g, batch, rng=jax.random.PRNGKey(s))
        picks.append(np.asarray(out["sample"]))
    rate = float(np.mean(np.concatenate(picks) == 2))
    # softmax prob of the boosted column at temperature 1: e^4/(e^4+3)
    expect = float(np.exp(4.0) / (np.exp(4.0) + 3.0))
    assert abs(rate - expect) < 0.05, (rate, expect)

    # rng=None (eval-style) degrades to the greedy argmax pick.
    out = m.forward({}, g, batch, rng=None)
    assert int(np.asarray(out["sample"]).min()) == 2
    assert int(np.asarray(out["sample"]).max()) == 2


def test_irgan_learns_above_random_and_coerces_loss():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=256,
                        num_items=512, interactions_per_user=24, seed=1),
        model=ModelConfig(name="irgan", embed_dim=32),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=256, epochs=10, eval_every_epochs=10,
                          eval_topk=(20,), num_negatives=8, loss="bpr"),
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "irgan"
    # random recall@20 on 512 items ~ 0.039
    assert hist[-1]["recall@20"] > 0.12, hist[-1]
