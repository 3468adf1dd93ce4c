"""Kernel-dispatch switch (inklayer_tpu.runtime).

Training differentiates the model forwards; the Pallas kernels have no
VJPs, so the Trainer traces its step inside disable_pallas() and the
models must honor it (a real-TPU train step would otherwise die with
"Linearization failed to produce known values for all output primals").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import inklayer_tpu.runtime as rt


def test_switch_toggles(monkeypatch):
    monkeypatch.setattr(rt, "_backend_is_tpu", lambda: True)
    assert rt.pallas_enabled()
    with rt.disable_pallas():
        assert not rt.pallas_enabled()
        with rt.disable_pallas():  # reentrant
            assert not rt.pallas_enabled()
        assert not rt.pallas_enabled()
    assert rt.pallas_enabled()


def test_switch_false_off_tpu(monkeypatch):
    monkeypatch.setattr(rt, "_backend_is_tpu", lambda: False)
    assert not rt.pallas_enabled()


@pytest.mark.slow
def test_sam_attention_grad_protected(monkeypatch):
    """With the backend reporting TPU, a differentiated SAM global-attention
    forward picks the (non-differentiable) Pallas path and grad fails;
    under disable_pallas() the same grad succeeds via the XLA path."""
    from inklayer_tpu.models.sam.image_encoder import Attention

    monkeypatch.setattr(rt, "_backend_is_tpu", lambda: True)
    attn = Attention(dim=32, num_heads=2, input_size=(32, 32),
                     use_rel_pos=True, use_flash=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 32, 32, 32)),
                    jnp.float32)
    with rt.disable_pallas():
        params = attn.init(jax.random.key(0), x)
        g = jax.grad(lambda p: attn.apply(p, x).sum())(params)
        leaves = jax.tree.leaves(g)
        assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # without the switch the fused path is taken and reverse-mode fails
    # at trace time (before any TPU lowering)
    with pytest.raises(Exception):
        jax.grad(lambda p: attn.apply(p, x).sum())(params)


def test_trainer_step_runs_with_tpu_backend_reported(monkeypatch):
    """Trainer.train_step must trace grads cleanly even when the dispatch
    gates would pick Pallas kernels (it wraps tracing in disable_pallas)."""
    from jax.sharding import Mesh

    from inklayer_tpu.models.sam.image_encoder import Attention
    from inklayer_tpu.parallel.train import Trainer

    monkeypatch.setattr(rt, "_backend_is_tpu", lambda: True)
    attn = Attention(dim=32, num_heads=2, input_size=(32, 32),
                     use_rel_pos=True, use_flash=True)
    x0 = jnp.zeros((1, 32, 32, 32), jnp.float32)
    with rt.disable_pallas():
        params = attn.init(jax.random.key(0), x0)

    def loss_fn(params, batch):
        return (attn.apply(params, batch["x"]) ** 2).mean()

    devs = np.asarray(jax.devices()[:1]).reshape(1, 1, 1)
    mesh = Mesh(devs, ("dp", "fsdp", "tp"))
    tr = Trainer(loss_fn, params, mesh)
    loss = tr.train_step({"x": x0 + 0.1})
    assert np.isfinite(float(loss))
