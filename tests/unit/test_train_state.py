"""Optimizer-factory semantics: masked decoupled weight decay (SURVEY.md §2
#21 — the reference's plain optimizers never decayed embeddings either, since
it set weight decay to zero; the knob here must be safe to turn on)."""

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.config import TrainConfig
from seqrec_tpu.train.state import decay_mask, make_optimizer


def _params():
    return {
        "item_embedding": jnp.ones((10, 4)),
        "output_bias": jnp.ones((10,)),
        "tower": {
            "w_x": jnp.full((4, 12), 2.0),
            "b_x": jnp.ones((12,)),
        },
    }


def test_decay_mask_excludes_embeddings_and_vectors():
    mask = decay_mask(_params())
    assert mask["item_embedding"] is False  # embedding table
    assert mask["output_bias"] is False  # 1-D
    assert mask["tower"]["w_x"] is True  # plain matrix
    assert mask["tower"]["b_x"] is False  # bias


def test_weight_decay_is_decoupled_and_masked():
    """With zero gradients, adam's scaled update is exactly zero, so the only
    parameter motion is the decoupled decay term -lr*wd*param — and only on
    masked-in leaves."""
    cfg = TrainConfig(optimizer="adam", learning_rate=0.5, weight_decay=0.01,
                      grad_clip_norm=0.0)
    opt = make_optimizer(cfg)
    params = _params()
    opt_state = opt.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(grads, opt_state, params)

    np.testing.assert_allclose(
        np.asarray(updates["tower"]["w_x"]),
        -0.5 * 0.01 * np.asarray(params["tower"]["w_x"]),
        rtol=1e-6,
    )
    for leaf in (updates["item_embedding"], updates["output_bias"],
                 updates["tower"]["b_x"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_zero_weight_decay_matches_plain_adam():
    """wd=0 must reproduce optax.adam exactly (the split scaler/lr chain is a
    pure refactor)."""
    import optax

    cfg = TrainConfig(optimizer="adam", learning_rate=0.1, weight_decay=0.0,
                      grad_clip_norm=0.0)
    ours = make_optimizer(cfg)
    ref = optax.adam(0.1)
    params = _params()
    grads = jax.tree.map(lambda p: 0.3 * jnp.ones_like(p), params)
    s_ours, s_ref = ours.init(params), ref.init(params)
    for _ in range(3):
        u_ours, s_ours = ours.update(grads, s_ours, params)
        u_ref, s_ref = ref.update(grads, s_ref, params)
    for a, b in zip(jax.tree.leaves(u_ours), jax.tree.leaves(u_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
