"""Remat produces identical outputs and gradients (only memory changes)."""

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.config import ModelConfig
from seqrec_tpu.models import build_model


def test_remat_identical_values_and_grads(rng):
    inputs = jnp.asarray(rng.integers(1, 40, size=(4, 12)), jnp.int32)
    mask = jnp.ones((4, 12), jnp.float32)
    batch = {
        "inputs": inputs,
        "targets": jnp.asarray(rng.integers(1, 40, size=(4, 12)), jnp.int32),
        "mask": mask,
    }
    models = {}
    for remat in (False, True):
        cfg = ModelConfig(arch="sasrec", embed_dim=32, num_layers=2,
                          max_len=16, dropout_rate=0.0,
                          compute_dtype="float32", use_pallas=False,
                          remat=remat)
        models[remat] = build_model(cfg, 40)
    params = models[False].init(jax.random.key(0), inputs, mask)

    outs, grads = {}, {}
    for remat, model in models.items():
        def loss_fn(p):
            s, w = model.apply(p, batch, method=model.loss,
                               deterministic=True)
            return s / w
        outs[remat], grads[remat] = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(outs[True]), float(outs[False]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(grads[True]),
                    jax.tree.leaves(grads[False])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
