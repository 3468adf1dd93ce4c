"""Window-kernel softmax experiments, kernel-only timing on the chip.

V0: current _window_block_kernel (baseline).
V1: exp2 with log2e folded into the augmented QK operands + softmax
    denominator computed on the MXU (ones column appended to V) — removes
    the full-width multiply and the lane-reduction sum passes.
V2: V1 + phase split (all-head QK matmuls, then all softmaxes, then all PV)
    to give Mosaic freedom to overlap MXU and VPU chains.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inklayer_tpu.models.sam.image_encoder import _gather_rel_pos
from inklayer_tpu.ops.attention import sam_window_block_attention

LOG2E = 1.4426950408889634


def _v1_kernel(qkv_ref, rh_ref, rw_ref, o_ref, *, scale: float,
               win: int, gw: int, heads: int, head_dim: int):
    n = win * win
    c = heads * head_dim
    band = qkv_ref[0]
    rh_band = rh_ref[0]
    rw_band = rw_ref[0]
    colx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 0)
    rowx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1)
    expand_h_t = (colx // win == rowx).astype(jnp.bfloat16)
    expand_w_t = (colx % win == rowx).astype(jnp.bfloat16)
    ones_col = jnp.ones((n, 1), jnp.bfloat16)
    for j in range(gw):
        qkv = jnp.concatenate(
            [band[r, j * win:(j + 1) * win, :] for r in range(win)], axis=0)
        rh_all = jnp.concatenate(
            [rh_band[r, j * win:(j + 1) * win, :] for r in range(win)],
            axis=0)
        rw_all = jnp.concatenate(
            [rw_band[r, j * win:(j + 1) * win, :] for r in range(win)],
            axis=0)
        outs = []
        for h in range(heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, c + h * head_dim:c + (h + 1) * head_dim]
            v = qkv[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
            rh = (rh_all[:, h * win:(h + 1) * win].astype(jnp.float32)
                  * LOG2E).astype(jnp.bfloat16)
            rw = (rw_all[:, h * win:(h + 1) * win].astype(jnp.float32)
                  * LOG2E).astype(jnp.bfloat16)
            aug_q = jnp.concatenate(
                [(q.astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16),
                 rh, rw], axis=1)
            aug_k = jnp.concatenate([k, expand_h_t, expand_w_t], axis=1)
            s = jax.lax.dot_general(
                aug_q, aug_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp2(s)
            aug_v = jnp.concatenate([v, ones_col], axis=1)  # (n, hd+1)
            o = jnp.dot(p.astype(v.dtype), aug_v,
                        preferred_element_type=jnp.float32)
            l = o[:, head_dim:head_dim + 1]
            outs.append((o[:, :head_dim] / l).astype(o_ref.dtype))
        o_win = jnp.concatenate(outs, axis=1)
        for r in range(win):
            o_ref[0, r, j * win:(j + 1) * win, :] = \
                o_win[r * win:(r + 1) * win, :]


def _v2_kernel(qkv_ref, rh_ref, rw_ref, o_ref, *, scale: float,
               win: int, gw: int, heads: int, head_dim: int):
    n = win * win
    c = heads * head_dim
    band = qkv_ref[0]
    rh_band = rh_ref[0]
    rw_band = rw_ref[0]
    colx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 0)
    rowx = jax.lax.broadcasted_iota(jnp.int32, (n, win), 1)
    expand_h_t = (colx // win == rowx).astype(jnp.bfloat16)
    expand_w_t = (colx % win == rowx).astype(jnp.bfloat16)
    ones_col = jnp.ones((n, 1), jnp.bfloat16)
    for j in range(gw):
        qkv = jnp.concatenate(
            [band[r, j * win:(j + 1) * win, :] for r in range(win)], axis=0)
        rh_all = jnp.concatenate(
            [rh_band[r, j * win:(j + 1) * win, :] for r in range(win)],
            axis=0)
        rw_all = jnp.concatenate(
            [rw_band[r, j * win:(j + 1) * win, :] for r in range(win)],
            axis=0)
        ss = []
        for h in range(heads):
            q = qkv[:, h * head_dim:(h + 1) * head_dim]
            k = qkv[:, c + h * head_dim:c + (h + 1) * head_dim]
            rh = (rh_all[:, h * win:(h + 1) * win].astype(jnp.float32)
                  * LOG2E).astype(jnp.bfloat16)
            rw = (rw_all[:, h * win:(h + 1) * win].astype(jnp.float32)
                  * LOG2E).astype(jnp.bfloat16)
            aug_q = jnp.concatenate(
                [(q.astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16),
                 rh, rw], axis=1)
            aug_k = jnp.concatenate([k, expand_h_t, expand_w_t], axis=1)
            ss.append(jax.lax.dot_general(
                aug_q, aug_k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        ps = [jnp.exp2(s - jnp.max(s, axis=-1, keepdims=True)) for s in ss]
        outs = []
        for h in range(heads):
            v = qkv[:, 2 * c + h * head_dim:2 * c + (h + 1) * head_dim]
            aug_v = jnp.concatenate([v, ones_col], axis=1)
            o = jnp.dot(ps[h].astype(v.dtype), aug_v,
                        preferred_element_type=jnp.float32)
            l = o[:, head_dim:head_dim + 1]
            outs.append((o[:, :head_dim] / l).astype(o_ref.dtype))
        o_win = jnp.concatenate(outs, axis=1)
        for r in range(win):
            o_ref[0, r, j * win:(j + 1) * win, :] = \
                o_win[r * win:(r + 1) * win, :]


def make_variant(kernel_fn):
    @functools.partial(jax.jit, static_argnames=("scale", "win", "heads",
                                                 "head_dim"))
    def run(qkv_sp, tab_h, tab_w, *, scale, win, heads, head_dim):
        b, hp, wp, c3 = qkv_sp.shape
        c = heads * head_dim
        gw = wp // win
        qg = qkv_sp[..., :c].reshape(b, hp, wp, heads, head_dim)
        th_exp = jnp.tile(tab_h, (hp // win, 1, 1)).astype(qkv_sp.dtype)
        tw_exp = jnp.tile(tab_w, (wp // win, 1, 1)).astype(qkv_sp.dtype)
        rel_h = jnp.einsum("bIJhc,Ikc->bIJhk", qg, th_exp).reshape(
            b, hp, wp, heads * win)
        rel_w = jnp.einsum("bIJhc,Jkc->bIJhk", qg, tw_exp).reshape(
            b, hp, wp, heads * win)
        kernel = functools.partial(kernel_fn, scale=scale, win=win,
                                   gw=gw, heads=heads, head_dim=head_dim)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), qkv_sp.dtype),
            grid=(b, hp // win),
            in_specs=[
                pl.BlockSpec((1, win, wp, c3), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win, wp, heads * win),
                             lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, win, wp, heads * win),
                             lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, win, wp, c), lambda bi, i: (bi, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2 ** 20),
        )(qkv_sp, rel_h, rel_w)
    return run


def main():
    win, heads, hd = 14, 16, 80
    c = heads * hd
    hp = wp = 70
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(1, hp, wp, 3 * c) * 0.3, jnp.bfloat16)
    rel_pos = jnp.asarray(rng.randn(2 * win - 1, hd), jnp.float32) * 0.1
    tab = _gather_rel_pos(rel_pos, win, win).astype(jnp.bfloat16)
    scale = hd ** -0.5
    REPS = 20

    v0 = lambda x: sam_window_block_attention(
        x, tab, tab, scale=scale, win=win, heads=heads, head_dim=hd)
    v1_fn = make_variant(_v1_kernel)
    v2_fn = make_variant(_v2_kernel)
    v1 = lambda x: v1_fn(x, tab, tab, scale=scale, win=win, heads=heads,
                         head_dim=hd)
    v2 = lambda x: v2_fn(x, tab, tab, scale=scale, win=win, heads=heads,
                         head_dim=hd)

    ref = np.asarray(v0(qkv)[0, :2, :2, :4], np.float32)
    for name, fn in [("v0", v0), ("v1", v1), ("v2", v2)]:
        got = np.asarray(fn(qkv)[0, :2, :2, :4], np.float32)
        err = np.abs(got - ref).max()

        @jax.jit
        def loop(x, fn=fn):
            acc = jnp.float32(0)
            for _ in range(REPS):
                o = fn(x)
                acc = acc + jnp.sum(o.astype(jnp.float32))
                x = x + 0.0 * acc.astype(x.dtype)
            return acc

        float(loop(qkv))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            float(loop(qkv))
            ts.append((time.perf_counter() - t0) * 1e3)
        p50 = float(np.percentile(ts, 50)) / REPS
        print(f"{name}: {p50 * 1e3:7.0f} us/layer   max_err={err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
