"""Model-tier tests: shapes, causal-leak, loss-decreases, overfit sanity
(SURVEY.md §4 model tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from seqrec_tpu.config import ModelConfig
from seqrec_tpu.models import build_model


ARCHS = ["gru4rec", "lstm", "sasrec"]  # "lstm" = gru4rec arch, lstm cell


def _make(arch, vocab=50, **kw):
    if arch == "lstm":
        arch, kw["cell_type"] = "gru4rec", "lstm"
    kw = {"embed_dim": 32, "num_layers": 2, "max_len": 16,
          "compute_dtype": "float32", "use_pallas": False, **kw}
    cfg = ModelConfig(arch=arch, **kw)
    return build_model(cfg, vocab)


def _batch(rng, B=4, T=16, vocab=50):
    inputs = rng.integers(1, vocab, size=(B, T)).astype(np.int32)
    targets = rng.integers(1, vocab, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.float32)
    mask[:, T // 2:] = 0.0
    inputs[mask == 0] = 0
    targets[mask == 0] = 0
    return {"inputs": jnp.asarray(inputs), "targets": jnp.asarray(targets),
            "mask": jnp.asarray(mask)}


@pytest.mark.parametrize("arch", ARCHS)
def test_encode_shapes(arch, rng):
    model = _make(arch)
    batch = _batch(rng)
    params = model.init(jax.random.key(0), batch["inputs"], batch["mask"])
    h = model.apply(params, batch["inputs"], batch["mask"])
    assert h.shape == (4, 16, 32)
    assert jnp.isfinite(h).all()


@pytest.mark.parametrize("arch", ARCHS)
def test_causal_no_future_leak(arch, rng):
    """Changing items at positions > t must not change h[:, t]."""
    model = _make(arch)
    batch = _batch(rng)
    params = model.init(jax.random.key(0), batch["inputs"], batch["mask"])
    h1 = model.apply(params, batch["inputs"], batch["mask"])
    t = 5
    perturbed = batch["inputs"].at[:, t + 1:].set(
        (batch["inputs"][:, t + 1:] % 49) + 1
    )
    h2 = model.apply(params, perturbed, batch["mask"])
    np.testing.assert_allclose(
        np.asarray(h1[:, : t + 1]), np.asarray(h2[:, : t + 1]), atol=1e-5
    )
    # And the perturbation does change later positions (test is non-vacuous).
    assert not np.allclose(np.asarray(h1[:, t + 1:]), np.asarray(h2[:, t + 1:]))


@pytest.mark.parametrize(
    "loss", ["full_softmax", "sampled_softmax", "bpr", "top1", "bpr_max"]
)
def test_loss_finite_and_masked(loss, rng):
    model = _make("gru4rec", loss=loss)
    batch = _batch(rng)
    params = model.init(jax.random.key(0), batch["inputs"], batch["mask"])
    kw = {}
    if loss != "full_softmax":
        kw["neg_ids"] = jnp.asarray(rng.integers(1, 50, size=32), jnp.int32)
    loss_sum, w_sum = model.apply(
        params, batch, method=model.loss, deterministic=True, **kw
    )
    assert jnp.isfinite(loss_sum)
    assert float(w_sum) == float(batch["mask"].sum())


def test_masked_positions_do_not_affect_loss(rng):
    """Changing target ids at masked positions leaves the loss unchanged."""
    model = _make("gru4rec")
    batch = _batch(rng)
    params = model.init(jax.random.key(0), batch["inputs"], batch["mask"])
    l1, _ = model.apply(params, batch, method=model.loss, deterministic=True)
    batch2 = dict(batch, targets=batch["targets"].at[:, -1].set(7))
    l2, _ = model.apply(params, batch2, method=model.loss, deterministic=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


@pytest.mark.parametrize("arch", ARCHS)
def test_overfits_tiny_data(arch, rng):
    """10 fixed sequences: loss must drop by >30% in 60 steps."""
    vocab = 30
    model = _make(arch, vocab=vocab)
    seqs = rng.integers(1, vocab, size=(10, 12)).astype(np.int32)
    batch = {
        "inputs": jnp.asarray(seqs[:, :-1]),
        "targets": jnp.asarray(seqs[:, 1:]),
        "mask": jnp.ones((10, 11), jnp.float32),
    }
    params = model.init(jax.random.key(1), batch["inputs"], batch["mask"])
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            s, w = model.apply(p, batch, method=model.loss, deterministic=True)
            return s / w
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(60):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.7 * first


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_residual_stack(cell, rng):
    """Residual RNN stack: same param tree shape, output differs from
    non-residual, and deep-stack grads stay finite."""
    model_r = _make("gru4rec", cell_type=cell, residual=True, num_layers=3)
    model_p = _make("gru4rec", cell_type=cell, residual=False, num_layers=3)
    batch = _batch(rng)
    params = model_r.init(jax.random.key(0), batch["inputs"], batch["mask"])
    h_r = model_r.apply(params, batch["inputs"], batch["mask"])
    h_p = model_p.apply(params, batch["inputs"], batch["mask"])
    assert h_r.shape == h_p.shape
    assert not np.allclose(np.asarray(h_r), np.asarray(h_p))

    def loss_fn(p):
        s, w = model_r.apply(p, batch, method=model_r.loss, deterministic=True)
        return s / w

    grads = jax.grad(loss_fn)(params)
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(grads)
    )


def test_scores_shapes(rng):
    model = _make("gru4rec")
    batch = _batch(rng)
    params = model.init(jax.random.key(0), batch["inputs"], batch["mask"])
    full = model.apply(params, batch["inputs"], batch["mask"], method=model.scores)
    assert full.shape == (4, 50)
    cands = jnp.asarray(rng.integers(1, 50, size=(4, 7)), jnp.int32)
    sampled = model.apply(
        params, batch["inputs"], batch["mask"], method=model.scores,
        candidates=cands,
    )
    assert sampled.shape == (4, 7)
    # Candidate scores match the corresponding full-catalog columns.
    np.testing.assert_allclose(
        np.asarray(sampled),
        np.take_along_axis(np.asarray(full), np.asarray(cands), axis=1),
        rtol=2e-4, atol=2e-4,
    )


def test_scores_use_last_real_position(rng):
    model = _make("gru4rec")
    batch = _batch(rng)  # mask zeroes the tail half
    params = model.init(jax.random.key(0), batch["inputs"], batch["mask"])
    s1 = model.apply(params, batch["inputs"], batch["mask"], method=model.scores)
    # Changing pad-region inputs must not change scores.
    perturbed = batch["inputs"].at[:, -1].set(3)
    s2 = model.apply(params, perturbed, batch["mask"], method=model.scores)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
