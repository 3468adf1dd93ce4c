import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from inklayer_tpu.config import DiffusionConfig
from inklayer_tpu.models.diffusion import (
    AutoencoderKL,
    CLIPTextEncoder,
    CLIPTokenizer,
    ControlNet,
    ControlNetInpaintPipeline,
    DPMSolverMultistepScheduler,
    UNet2DCondition,
)

pytestmark = pytest.mark.slow  # heavyweight module: excluded from the -m quick tier

TINY = DiffusionConfig(
    resolution=64,
    num_steps=3,
    num_passes=1,
    unet_block_channels=(8, 16, 16, 16),
    cross_attention_dim=16,
    latent_channels=4,
    vae_channels=(8, 8, 8, 8),
    text_maxlen=16,
)


def test_scheduler_perfect_model_recovers_x0(rng):
    """With a perfect epsilon oracle, DPM-Solver++ must converge to x0."""
    sched = DPMSolverMultistepScheduler()
    x0 = rng.standard_normal((4, 4)).astype(np.float32)
    state = sched.set_timesteps(20)
    t0 = int(state.timesteps[0])
    noise = rng.standard_normal((4, 4)).astype(np.float32)
    x = sched.add_noise(x0, noise, t0)
    for _ in range(len(state.timesteps)):
        t = int(state.timesteps[state.step_index])
        eps = (x - sched.alpha_t[t] * x0) / sched.sigma_t[t]
        x, state = sched.step(state, eps, x)
    # the final state sits at t=0 which still carries sigma_0 ~= 0.029 of
    # noise scale; convergence from ~0.85 to below that bound is the check
    np.testing.assert_allclose(x, x0, atol=0.06)


def test_solver_tables_match_stepper(rng):
    from inklayer_tpu.models.diffusion.pipeline import _solver_tables

    sched = DPMSolverMultistepScheduler()
    steps = 8
    ts, a_t, s_t, c_sample, c_x0, c_d = _solver_tables(sched, steps)
    x0 = rng.standard_normal((3, 3)).astype(np.float32)
    x = sched.add_noise(x0, rng.standard_normal((3, 3)).astype(np.float32),
                        int(ts[0]))
    x_tab = x.copy()
    x0_prev = np.zeros_like(x0)
    state = sched.set_timesteps(steps)
    for i in range(steps):
        t = int(ts[i])
        eps = (x - sched.alpha_t[t] * x0) / sched.sigma_t[t]
        x, state = sched.step(state, eps, x)
        # table path
        eps_t = (x_tab - a_t[i] * x0) / s_t[i]
        x0_est = (x_tab - s_t[i] * eps_t) / a_t[i]
        x_tab = c_sample[i] * x_tab + c_x0[i] * x0_est + c_d[i] * (x0_est - x0_prev)
        x0_prev = x0_est
    np.testing.assert_allclose(x, x_tab, rtol=1e-4, atol=1e-5)


def test_vae_roundtrip_shapes(rng):
    vae = AutoencoderKL((8, 8, 8, 8), 4)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    params = vae.init(jax.random.key(0), x)
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (1, 4, 4, 4)
    out = vae.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == (1, 32, 32, 3)


def test_unet_shapes(rng):
    unet = UNet2DCondition(block_channels=(8, 16, 16, 16), context_dim=16)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 9)), jnp.float32)
    t = jnp.asarray([10, 10], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    params = unet.init(jax.random.key(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_residual_shapes(rng):
    cn = ControlNet(block_channels=(8, 16, 16, 16), context_dim=16)
    unet = UNet2DCondition(block_channels=(8, 16, 16, 16), context_dim=16)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    x9 = jnp.asarray(rng.standard_normal((1, 16, 16, 9)), jnp.float32)
    t = jnp.asarray([5], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 16)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    cparams = cn.init(jax.random.key(0), x, t, ctx, cond)
    down, mid = cn.apply(cparams, x, t, ctx, cond)
    # zero-initialised output convs -> residuals are exactly zero at init
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert float(jnp.abs(mid).max()) == 0.0
    # residuals plug into the unet
    uparams = unet.init(jax.random.key(1), x9, t, ctx)
    out = unet.apply(uparams, x9, t, ctx, down_residuals=down, mid_residual=mid)
    assert out.shape == (1, 16, 16, 4)


def test_clip_tokenizer_fixed_len():
    tok = CLIPTokenizer()
    ids = tok.encode("a clean line drawing", max_len=16)
    assert ids.shape == (1, 16)
    assert ids[0, 0] == CLIPTokenizer.BOS
    assert ids[0, -1] == CLIPTokenizer.EOS


@pytest.mark.slow
def test_pipeline_end_to_end_tiny(rng):
    cfg = TINY
    pipe_models = {}
    text = CLIPTextEncoder(hidden=16, heads=1, max_len=16)
    tparams = text.init(jax.random.key(0), jnp.zeros((2, 16), jnp.int32))
    unet = UNet2DCondition(block_channels=cfg.unet_block_channels, context_dim=16)
    x9 = jnp.zeros((2, 8, 8, 9))
    uparams = unet.init(jax.random.key(1), x9, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 16, 16)))
    cn = ControlNet(block_channels=cfg.unet_block_channels, context_dim=16)
    cparams = cn.init(jax.random.key(2), jnp.zeros((2, 8, 8, 4)),
                      jnp.zeros((2,), jnp.int32), jnp.zeros((2, 16, 16)),
                      jnp.zeros((2, 64, 64, 3)))
    vae = AutoencoderKL(cfg.vae_channels, 4)
    vparams = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    params = {"text": tparams, "unet": uparams, "controlnet": cparams,
              "vae": vparams}
    pipe = ControlNetInpaintPipeline(params, cfg)
    img = Image.fromarray(
        (rng.random((64, 64, 3)) * 255).astype(np.uint8))
    mask = Image.fromarray((np.eye(64) > 0.5).astype(np.uint8) * 255)
    out = pipe.generate(img, mask)
    assert out.size == (64, 64)
    fn = pipe.inpaint_fn()
    out2 = fn(img, mask)
    assert out2.size == (64, 64)
    assert out2.mode == "RGB"


def test_sdxl_tiny_end_to_end(rng):
    from inklayer_tpu.models.diffusion.sdxl import (
        SDXLConfig, SDXLInpaintPipeline, build_sdxl_models)

    cfg = SDXLConfig(
        resolution=64, num_steps=3, strength=0.9,
        block_channels=(8, 16, 16), transformer_layers=(0, 1, 2),
        context_dim=24, pooled_dim=16, vae_channels=(8, 8, 8, 8),
        text_l_hidden=8, text_g_hidden=16, text_l_layers=2, text_g_layers=2)
    unet, vae, text_l, text_g = build_sdxl_models(cfg)
    # head_dim=64 would zero out heads at tiny dims; rebuild with head_dim=8
    from inklayer_tpu.models.diffusion.unet import UNet2DCondition
    unet = UNet2DCondition(
        in_channels=9, block_channels=cfg.block_channels,
        transformer_layers=cfg.transformer_layers, linear_proj=True,
        head_dim=8, context_dim=cfg.context_dim,
        addition_embed_dim=4, addition_proj_dim=cfg.pooled_dim + 24)

    key = jax.random.key(0)
    params = {
        "unet": unet.init(key, jnp.zeros((2, 8, 8, 9)),
                          jnp.zeros((2,), jnp.int32), jnp.zeros((2, 7, 24)),
                          pooled_text=jnp.zeros((2, 16)),
                          time_ids=jnp.zeros((2, 6))),
        "vae": vae.init(key, jnp.zeros((1, 64, 64, 3))),
        "text_l": text_l.init(key, jnp.zeros((2, 77), jnp.int32)),
        "text_g": text_g.init(key, jnp.zeros((2, 77), jnp.int32)),
    }
    pipe = SDXLInpaintPipeline(params, cfg)
    pipe.unet = unet  # match the tiny head_dim build
    from PIL import Image as PILImage
    img = PILImage.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    mask = PILImage.fromarray((np.eye(64) > 0.5).astype(np.uint8) * 255)
    out = pipe.generate(img, mask)
    assert out.size == (64, 64)


def test_unet_sd15_layout_unchanged(rng):
    """The generalized UNet must keep the SD1.5 parameter layout (checkpoint
    rules depend on it)."""
    unet = UNet2DCondition(block_channels=(8, 16, 16, 16), context_dim=16)
    params = unet.init(jax.random.key(0), jnp.zeros((1, 16, 16, 9)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 16)))
    p = params["params"]
    # attn params live directly under the transformer block (depth-1 layout)
    assert "attn1" in p["down_0_attn_0"]
    assert "to_q" in p["down_0_attn_0"]["attn1"]
    assert "block_0" not in p["down_0_attn_0"]
    # final down block has no attention
    assert not any(k.startswith("down_3_attn") for k in p)


def _tiny_pipe(rng):
    cfg = TINY
    text = CLIPTextEncoder(hidden=16, heads=1, max_len=16)
    tparams = text.init(jax.random.key(0), jnp.zeros((2, 16), jnp.int32))
    unet = UNet2DCondition(block_channels=cfg.unet_block_channels,
                           context_dim=16)
    x9 = jnp.zeros((2, 8, 8, 9))
    uparams = unet.init(jax.random.key(1), x9, jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 16, 16)))
    cn = ControlNet(block_channels=cfg.unet_block_channels, context_dim=16)
    cparams = cn.init(jax.random.key(2), jnp.zeros((2, 8, 8, 4)),
                      jnp.zeros((2,), jnp.int32), jnp.zeros((2, 16, 16)),
                      jnp.zeros((2, 64, 64, 3)))
    vae = AutoencoderKL(cfg.vae_channels, 4)
    vparams = vae.init(jax.random.key(3), jnp.zeros((1, 64, 64, 3)))
    params = {"text": tparams, "unet": uparams, "controlnet": cparams,
              "vae": vparams}
    return ControlNetInpaintPipeline(params, cfg)


def test_generate_batch_matches_independent_generates(rng):
    """Batched layer sampling (one UNet launch per step for B layers) is
    semantically identical to B independent generate() calls — same
    per-layer noise (the reference seeds its generator per call), same
    two-pass control rebuild per layer."""
    pipe = _tiny_pipe(rng)
    imgs = [Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8))
            for _ in range(3)]
    masks = [Image.fromarray(
        (rng.random((64, 64)) > 0.5).astype(np.uint8) * 255)
        for _ in range(3)]
    solo = [pipe.generate(im, mk, num_passes=2)
            for im, mk in zip(imgs, masks)]
    batched = pipe.generate_batch(imgs, masks, num_passes=2)
    assert len(batched) == 3
    for i, (a, b) in enumerate(zip(solo, batched)):
        aa = np.asarray(a, np.float32)
        bb = np.asarray(b, np.float32)
        # identical math up to batched-vs-single fusion reassociation; the
        # uint8 quantization leaves at most off-by-one pixels
        assert np.abs(aa - bb).max() <= 1.0, i


def test_inpainter_batches_layers(tmp_path, rng):
    """run_on_sketch_dir routes multi-layer inpainting through the batched
    backend in ONE call and writes the identical per-layer contract."""
    from inklayer_tpu.pipeline.inpaint.orchestrate import Inpainter

    h = w = 48
    sketch = np.full((h, w, 3), 255, np.uint8)
    sketch[5:40, 5:8] = 0
    sketch[5:8, 5:40] = 0
    sketch[20:44, 20:23] = 0
    sketch[41:44, 20:44] = 0
    # m1 and m2 both overlap m0's bbox -> BOTH need inpainting (one
    # batched call); m0 is front-most (never inpainted)
    m0 = np.zeros((h, w), bool); m0[4:30, 4:41] = True
    m1 = np.zeros((h, w), bool); m1[10:45, 19:45] = True
    m2 = np.zeros((h, w), bool); m2[8:45, 4:10] = True
    masks = [m0, m1, m2]
    d = tmp_path / "scene"
    (d / "masks_final").mkdir(parents=True)
    for i, m in enumerate(masks):
        Image.fromarray(m.astype(np.uint8) * 255).save(
            d / "masks_final" / f"mask_{i}.png")
    Image.fromarray(sketch).save(d / "input.png")

    calls = {"batch": 0, "single": 0}

    def single(im, mk):
        calls["single"] += 1
        return im.copy()

    def batch(pairs):
        calls["batch"] += 1
        return [im.copy() for im, _ in pairs]

    inp = Inpainter(single, inpaint_batch_func=batch)
    layers_dir = inp.run_on_sketch_dir(str(d))
    assert calls["batch"] == 1 and calls["single"] == 0
    import glob as g
    import os
    assert len(g.glob(os.path.join(layers_dir, "layer_*.png"))) == 3
    assert os.path.isdir(str(d / "complete_layers_rgba"))
