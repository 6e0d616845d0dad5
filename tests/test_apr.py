"""APR (adversarial personalized ranking): the fast-gradient inner
maximization must actually be adversarial, and the minimax objective
must still learn."""

import jax
import jax.numpy as jnp
import numpy as np

from tfrec_tpu.configs import Config, DataConfig, ModelConfig, OptimConfig, TrainConfig
from tfrec_tpu.models import DataSpec, build_model
from tfrec_tpu.train.trainer import run


def _pair_batch(rng, nu, ni, b):
    return {
        "user": jnp.asarray(rng.integers(0, nu, b, dtype=np.int32)),
        "pos": jnp.asarray(rng.integers(0, ni, b, dtype=np.int32)),
        "neg": jnp.asarray(rng.integers(0, ni, b, dtype=np.int32)),
    }


def test_apr_perturbation_is_adversarial():
    """The fast-gradient perturbation maximizes BPR loss locally: the
    perturbed loss must exceed the clean loss, and shrinking eps must
    shrink the gap."""
    m = build_model(
        ModelConfig(name="apr", embed_dim=16, apr_eps=0.5),
        DataSpec.interaction(32, 64),
    )
    params = m.init(jax.random.PRNGKey(0))
    batch = _pair_batch(np.random.default_rng(0), 32, 64, 64)
    ids = m.lookup_ids(batch)
    g = {k: jnp.take(params["tables"][k], v, axis=0) for k, v in ids.items()}
    out = m.forward(params["dense"], g, batch)

    def mean_bpr(diff):
        return float(jnp.mean(jax.nn.softplus(-diff)))

    clean, adv = mean_bpr(out["diff"]), mean_bpr(out["diff_adv"])
    assert adv > clean, (clean, adv)

    m.eps = 0.05
    out_small = m.forward(params["dense"], g, batch)
    np.testing.assert_allclose(
        np.asarray(out_small["diff"]), np.asarray(out["diff"]), rtol=1e-6
    )
    assert clean < mean_bpr(out_small["diff_adv"]) < adv


def test_apr_eval_scores_as_plain_mf():
    """score_all / pointwise paths must be untouched MF (adversarial
    training changes the objective, not the scorer)."""
    spec = DataSpec.interaction(16, 40)
    m = build_model(ModelConfig(name="apr", embed_dim=8), spec)
    params = m.init(jax.random.PRNGKey(1))
    users = jnp.asarray([0, 3, 7], jnp.int32)
    scores = m.score_all(params, users)
    assert scores.shape == (3, 40)
    assert m.dot_decomposition() is not None  # sharded top-k eligible


def test_apr_learns_above_random_and_coerces_loss():
    cfg = Config(
        data=DataConfig(source="synthetic_implicit", num_users=256,
                        num_items=512, interactions_per_user=24, seed=1),
        model=ModelConfig(name="apr", embed_dim=32, apr_eps=0.3),
        optim=OptimConfig(learning_rate=0.05),
        train=TrainConfig(batch_size=256, epochs=10, eval_every_epochs=10,
                          eval_topk=(20,), loss="bpr"),
    )
    t, hist = run(cfg, quiet=True)
    assert t.loss_name == "apr"
    # random recall@20 on 512 items ~ 0.039; measured 0.22
    assert hist[-1]["recall@20"] > 0.12, hist[-1]
