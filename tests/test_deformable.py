import jax.numpy as jnp
import numpy as np
import pytest

from inklayer_tpu.ops.deformable import ms_deform_attn, ms_deform_attn_ref


def test_ms_deform_attn_matches_oracle(rng):
    b, heads, d = 2, 2, 4
    shapes = ((6, 8), (3, 4))
    n_tokens = sum(h * w for h, w in shapes)
    lq, n_points = 5, 3
    value = rng.standard_normal((b, n_tokens, heads, d)).astype(np.float32)
    # locations straddling the [0,1] range incl. out-of-bounds
    locs = rng.uniform(-0.2, 1.2, (b, lq, heads, len(shapes), n_points, 2)).astype(np.float32)
    wts = rng.random((b, lq, heads, len(shapes), n_points)).astype(np.float32)
    wts /= wts.sum(axis=(-1, -2), keepdims=True)

    out = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(wts))
    ref = ms_deform_attn_ref(value, shapes, locs, wts)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_ms_deform_attn_exact_center(rng):
    # a sample exactly at a pixel center returns that pixel's value
    shapes = ((4, 4),)
    value = rng.standard_normal((1, 16, 1, 2)).astype(np.float32)
    # pixel (1, 2): center = ((2+0.5)/4, (1+0.5)/4)
    locs = np.array([[[[[(2.5 / 4, 1.5 / 4)]]]]], np.float32)
    wts = np.ones((1, 1, 1, 1, 1), np.float32)
    out = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(wts))
    np.testing.assert_allclose(np.asarray(out)[0, 0], value[0, 1 * 4 + 2, 0], atol=1e-6)


def test_dense_impl_matches_oracle(rng):
    from inklayer_tpu.ops.deformable import _ms_deform_attn_dense

    b, heads, d = 2, 2, 4
    shapes = ((6, 8), (3, 4))
    n_tokens = sum(h * w for h, w in shapes)
    lq, n_points = 5, 3
    value = rng.standard_normal((b, n_tokens, heads, d)).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, (b, lq, heads, len(shapes), n_points, 2)
                       ).astype(np.float32)
    wts = rng.random((b, lq, heads, len(shapes), n_points)).astype(np.float32)
    out = _ms_deform_attn_dense(jnp.asarray(value), shapes, jnp.asarray(locs),
                                jnp.asarray(wts))
    ref = ms_deform_attn_ref(value, shapes, locs, wts)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_impl_dispatch(rng):
    shapes = ((4, 4),)
    value = jnp.asarray(rng.standard_normal((1, 16, 1, 2)), jnp.float32)
    locs = jnp.asarray(rng.random((1, 3, 1, 1, 2, 2)), jnp.float32)
    wts = jnp.asarray(rng.random((1, 3, 1, 1, 2)), jnp.float32)
    a = ms_deform_attn(value, shapes, locs, wts, impl="gather")
    b = ms_deform_attn(value, shapes, locs, wts, impl="dense")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pallas_impl_matches_oracle_interpret(rng):
    from inklayer_tpu.ops.deformable import _ms_deform_attn_pallas

    b, heads, d = 1, 2, 8
    shapes = ((10, 12), (5, 6))
    n_tokens = sum(h * w for h, w in shapes)
    lq, n_points = 9, 2
    value = rng.standard_normal((b, n_tokens, heads, d)).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, (b, lq, heads, len(shapes), n_points, 2)
                       ).astype(np.float32)
    wts = rng.random((b, lq, heads, len(shapes), n_points)).astype(np.float32)
    out = _ms_deform_attn_pallas(jnp.asarray(value), shapes, jnp.asarray(locs),
                                 jnp.asarray(wts), block_q=8, interpret=True)
    ref = ms_deform_attn_ref(value, shapes, locs, wts)
    # kernel uses bf16 weight/value matmuls by design
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.05, rtol=0.05)


def test_pallas_fused_v3_matches_oracle_interpret(rng):
    """Point-concat fused all-levels kernel (the TPU default path)."""
    from inklayer_tpu.ops.deformable import _ms_deform_attn_pallas_fused

    b, heads, d = 1, 2, 8
    shapes = ((10, 12), (5, 6))
    n_tokens = sum(h * w for h, w in shapes)
    lq, n_points = 9, 4
    value = rng.standard_normal((b, n_tokens, heads, d)).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, (b, lq, heads, len(shapes), n_points, 2)
                       ).astype(np.float32)
    wts = rng.random((b, lq, heads, len(shapes), n_points)).astype(np.float32)
    ref = ms_deform_attn_ref(value, shapes, locs, wts)
    for kv in (2, 3, 4):
        out = _ms_deform_attn_pallas_fused(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(wts),
            block_q=8, interpret=True, kernel_version=kv)
        np.testing.assert_allclose(np.asarray(out), ref, atol=0.05, rtol=0.05)


@pytest.mark.slow
def test_pallas_tiled_matches_oracle_interpret(rng):
    """Tiled-window kernel (v5) vs the numpy oracle, interpret mode.

    Shapes trigger the full plan: level-0 windowed (ww>48), level-0/1
    queries tiled, levels 2-3 through the dense tail path.  Two offset
    regimes: small (pure windowed path) and huge (escape correction)."""
    from inklayer_tpu.ops.deformable import (_ms_deform_attn_pallas_tiled,
                                             _tiled_plan)

    b, heads, d = 1, 2, 8
    shapes = ((64, 64), (32, 32), (16, 16), (8, 8))
    assert _tiled_plan(shapes) is not None
    n_tokens = sum(h * w for h, w in shapes)
    lq, n_points = n_tokens, 2

    # reference points = raster centers per level (encoder layout)
    refs = []
    for hh, ww in shapes:
        yy, xx = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
        refs.append(np.stack([(xx.ravel() + 0.5) / ww,
                              (yy.ravel() + 0.5) / hh], -1))
    ref = np.concatenate(refs, 0)  # (lq, 2)

    value = rng.standard_normal((b, n_tokens, heads, d)).astype(np.float32)
    wts = rng.random((b, lq, heads, len(shapes), n_points)).astype(np.float32)
    wts /= wts.sum(axis=(-1, -2), keepdims=True)

    for scale in (0.03, 0.6):  # ~2px offsets vs escape-forcing offsets
        offs = rng.uniform(-scale, scale,
                           (b, lq, heads, len(shapes), n_points, 2))
        locs = (ref[None, :, None, None, None, :] + offs).astype(np.float32)
        out = _ms_deform_attn_pallas_tiled(
            jnp.asarray(value).astype(jnp.bfloat16), shapes,
            jnp.asarray(locs), jnp.asarray(wts), interpret=True)
        ref_out = ms_deform_attn_ref(value, shapes, locs, wts)
        np.testing.assert_allclose(np.asarray(out, np.float32), ref_out,
                                   atol=0.03, rtol=0.05)
