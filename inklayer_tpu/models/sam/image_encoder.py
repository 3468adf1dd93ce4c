"""SAM image encoder: ViT-H/L/B with windowed + global attention, TPU-native.

Functional parity target: segment-anything ``modeling/image_encoder.py``
(ImageEncoderViT.forward :106-116, Block :166-182, Attention :224-240,
add_decomposed_rel_pos :325-361) — re-designed for TPU:

  * NHWC layout end to end (XLA's native TPU conv layout);
  * global-attention blocks (4096 tokens for 1024^2 input) run through the
    Pallas flash kernel with the decomposed relative-position bias computed
    inside the kernel — the reference materialises a (B*heads, 4096, 4096)
    bias tensor (~1GB fp32 per image per layer) that never exists here;
  * windowed blocks (14x14=196 tokens) stay on the fused-XLA sdpa path where
    the tiny attention matrix fuses into surrounding ops;
  * bfloat16 compute / float32 params and softmax statistics.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from inklayer_tpu.nn.layers import LayerNorm, MLP, PatchEmbed, window_partition, window_unpartition
from inklayer_tpu.ops.attention import flash_attention, sdpa


def _gather_rel_pos(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    """Build the (q_size, k_size, head_dim) relative-position table slice.

    Mirrors segment-anything get_rel_pos (image_encoder.py:292-322) for the
    q_size == k_size case used throughout the encoder: entry [i, j] is
    rel_pos[i - j + k_size - 1].  Resizes the table if it was trained for a
    different resolution.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    rel_pos = _resize_rel_table(rel_pos, q_size, k_size)
    qi = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    ki = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (qi - ki + (k_size - 1) * max(q_size / k_size, 1.0)).astype(jnp.int32)
    del max_rel_dist
    return rel_pos[idx]  # (q, k, head_dim)


def _resize_rel_table(rel_pos: jax.Array, q_size: int, k_size: int) -> jax.Array:
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32),
            (max_rel_dist, rel_pos.shape[1]),
            method="linear",
        )
    return rel_pos


def _rel_term(qg: jax.Array, table: jax.Array, axis: int) -> jax.Array:
    """q-dependent decomposed rel-pos term without per-row tiny matmuls.

    qg: (b, n, h, w, c); table: (2*s-1, c) where s = size along `axis`
    (3 for h, 4... i.e. axis in {2, 3} of qg).  Returns (b, n, h, w, s) with
    out[..., i_axis, ..., k] = qg . table[i_axis - k + s - 1].

    One MXU-friendly fat matmul P = qg @ table^T (lane = 2s-1) followed by
    static diagonal slices — replaces the per-row (s, c) @ (c, s) einsum that
    lowers to thousands of 14-lane matmuls in the 14x14-window blocks.
    (A take_along_axis diagonal gather is NOT faster: it lowers to a real
    gather that costs ~8x the whole encoder on v5e — measured 2026-08-16.)
    """
    s = qg.shape[axis]
    p = jnp.einsum("bnhwc,rc->bnhwr", qg, table.astype(qg.dtype))
    # out[..., i, ..., k] = p[..., i, ..., i + (s-1-k)]  (r = i - k + s - 1)
    slices = []
    for i in range(s):
        sl = jax.lax.slice_in_dim(p, i, i + s, axis=4)  # (..., s) over r
        sl = jnp.flip(sl, axis=4)
        # pick row i along `axis`
        sl = jax.lax.slice_in_dim(sl, i, i + 1, axis=axis)
        slices.append(sl)
    return jnp.concatenate(slices, axis=axis)


class Attention(nn.Module):
    """Multi-head attention over a (B, H, W, C) feature map with decomposed
    relative position bias."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = True  # route long sequences through the Pallas kernel
    fused_window: bool = False  # spatial-window path: x is (B, Hp, Wp, C)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.fused_window:
            return self._fused_window_spatial(x)
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        qkv_raw = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                           dtype=self.dtype, name="qkv")(x)

        from inklayer_tpu.runtime import pallas_enabled

        n_tokens = h * w
        on_tpu = pallas_enabled()
        if (self.use_flash and on_tpu and b > 1 and 64 <= n_tokens < 1024
                and self.use_rel_pos and head_dim <= 128):
            # Windowed blocks: one fused kernel program per window computes
            # all heads straight from the raw qkv dense output — replaces
            # the aug-matmul sdpa path whose concats/transposes and fp32
            # (nw, heads, 196, 196) logits dominate HBM traffic
            out = self._fused_window(qkv_raw, h, w, head_dim, scale)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        qkv = qkv_raw.reshape(b, h * w, 3, self.num_heads, head_dim)
        if (self.use_flash and on_tpu and n_tokens >= 1024
                and self.use_rel_pos and head_dim <= 128):
            # Fused token-major global attention: rel bias computed inside the
            # kernel, operands stay in the layout the qkv dense produces (the
            # fold-to-(B*H,N,D) path forces ~9ms/block of XLA layout copies
            # at the Pallas boundary on v5e — measured scripts/ablate_sam4.py)
            out = self._fused_global(qkv, h, w, head_dim, scale)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (b, hw, heads, hd)
        q = q.transpose(0, 2, 1, 3)  # (b, heads, hw, hd)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)

        rel_h = rel_w = None
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim))
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim))
            qg = q.reshape(b, self.num_heads, h, w, head_dim)
            # bias terms from UNSCALED q (reference applies scale to q@k only)
            if max(h, w) <= 32:
                # windowed blocks: fat-matmul against the raw (2s-1, c)
                # table + static diagonal slices — the per-row einsum lowers
                # to thousands of 14-lane matmuls (measured ~1.5ms/block)
                rel_h = _rel_term(qg, _resize_rel_table(rel_pos_h, h, h), 2)
                rel_w = _rel_term(qg, _resize_rel_table(rel_pos_w, w, w), 3)
            else:
                rh_tab = _gather_rel_pos(rel_pos_h, h, h).astype(self.dtype)
                rw_tab = _gather_rel_pos(rel_pos_w, w, w).astype(self.dtype)
                rel_h = jnp.einsum("bnhwc,hkc->bnhwk", qg, rh_tab)
                rel_w = jnp.einsum("bnhwc,wkc->bnhwk", qg, rw_tab)

        n_tokens = h * w
        # (pallas_enabled() from the dispatch block above)
        # global blocks only: for the 196-token windows the fused-XLA path is
        # faster end-to-end (flash's 400-program grid per block loses to
        # XLA's batched einsum despite materializing the rel-pos bias;
        # measured 159 vs 222 ms full-encoder on v5e)
        if self.use_flash and on_tpu and n_tokens >= 1024:
            fold = lambda t: t.reshape(b * self.num_heads, n_tokens, head_dim)
            if rel_h is not None:
                rh = rel_h.reshape(b * self.num_heads, n_tokens, h)
                rw = rel_w.reshape(b * self.num_heads, n_tokens, w)
                out = flash_attention(fold(q), fold(k), fold(v), rel_h=rh,
                                      rel_w=rw, kh=h, kw=w, scale=scale)
            else:
                out = flash_attention(fold(q), fold(k), fold(v), scale=scale)
            out = out.reshape(b, self.num_heads, n_tokens, head_dim)
        elif rel_h is not None:
            # Fold the decomposed bias INTO the QK contraction instead of
            # materializing the (nq, nk) bias in HBM (measured +1.4ms/block
            # for the broadcast-add path on v5e):
            #   logits[t, u] = scale*q[t].k[u] + rel_h[t, u//w] + rel_w[t, u%w]
            #               = [scale*q[t], rel_h[t], rel_w[t]] . [k[u], 1_h(u), 1_w(u)]
            # contraction width hd + kh + kw = 80+14+14 = 108 -> one 128-lane
            # matmul; the bias tensor never exists outside registers.
            eh = (jax.lax.broadcasted_iota(jnp.int32, (n_tokens, h), 0) // w ==
                  jax.lax.broadcasted_iota(jnp.int32, (n_tokens, h), 1)
                  ).astype(q.dtype)
            ew = (jax.lax.broadcasted_iota(jnp.int32, (n_tokens, w), 0) % w ==
                  jax.lax.broadcasted_iota(jnp.int32, (n_tokens, w), 1)
                  ).astype(q.dtype)
            rh = rel_h.reshape(b, self.num_heads, n_tokens, h).astype(q.dtype)
            rw = rel_w.reshape(b, self.num_heads, n_tokens, w).astype(q.dtype)
            aug_q = jnp.concatenate([q * scale, rh, rw], axis=-1)
            aug_k = jnp.concatenate([
                k,
                jnp.broadcast_to(eh, (b, self.num_heads) + eh.shape),
                jnp.broadcast_to(ew, (b, self.num_heads) + ew.shape)], axis=-1)
            # fp32 softmax: measured FASTER than bf16 at model scale on v5e
            # (160 vs 233 ms full encoder) and more accurate
            out = sdpa(aug_q, aug_k, v, scale=1.0)
        else:
            out = sdpa(q, k, v, scale=scale)

        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

    def _fused_window_spatial(self, x):
        """Partition-free windowed attention: x is the UNPADDED spatial LN
        output (B, H, W, C).  The Pallas kernel addresses each window of the
        zero-padded map by BlockSpec indexing, so the window_partition/
        unpartition transpose copies never exist.

        TPU-economy layout of the surrounding matmuls (round-2 profile):
          * the spatial map is padded in the ROW direction only (cheap,
            1280-wide); a column-padded qkv map never exists — the kernel
            synthesises the last window's overhang columns in VMEM from the
            dense bias + rel bias folds (materialising a 70x72x3840 padded
            map costs ~2 ms/fwd however XLA expresses it — pad, or
            broadcast + dynamic-update-slice — all profiled 2026-08-19);
          * the qkv dense runs on the row-padded token stream (7.7% pad-row
            tax instead of the 23% full-pad tax on the encoder's
            second-biggest matmul).  Zero pad rows produce qkv = bias
            THROUGH the dense itself — exactly the reference's
            window_partition-then-linear pad semantics (segment-anything
            image_encoder.py:166-182), so rows need no fixup anywhere;
          * the decomposed rel-pos q-terms are computed from the row-padded
            x with the rel tables folded into the q projection
            (window_rel_terms_from_x) rather than from the qkv output (an
            N=14-lane einsum XLA tiles poorly);
          * the attention output is cropped back to (H, W) BEFORE the proj
            dense (a prefix-row slice — near-free) removing the same pad
            tax from the proj matmul."""
        from inklayer_tpu.nn.layers import _DenseParams
        from inklayer_tpu.ops.attention import (sam_window_block_attention,
                                                window_rel_terms_from_x)

        win = self.input_size[0]
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5
        b, h, w, c = x.shape
        hp = -(-h // win) * win
        gw = -(-w // win)
        # win >= 8 keeps the row bands sublane-friendly (every band starts
        # on an 8-row boundary only when win % 8 == 0; win=14 bands are
        # still fine — the DMA engine handles 14-row blocks, profiled)
        assert win >= 8, win
        x = x.astype(self.dtype)
        if hp != h:
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
        wqkv, bqkv = _DenseParams(self.dim * 3, name="qkv")(self.dim)
        if not self.qkv_bias:
            bqkv = jnp.zeros_like(bqkv)
        qkv_sp = (jnp.dot(x.reshape(b, hp * w, c), wqkv.astype(self.dtype))
                  + bqkv.astype(self.dtype)).reshape(b, hp, w, 3 * self.dim)
        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * win - 1, head_dim))
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * win - 1, head_dim))
        tab_h = _gather_rel_pos(rel_pos_h, win, win)  # (win, win, hd)
        tab_w = _gather_rel_pos(rel_pos_w, win, win)
        rel_h, rel_w, b_rh, b_rw = window_rel_terms_from_x(
            x, wqkv[:, : self.dim], bqkv[: self.dim],
            tab_h, tab_w, win=win, heads=self.num_heads, head_dim=head_dim)
        out = sam_window_block_attention(
            qkv_sp, tab_h.astype(self.dtype), tab_w.astype(self.dtype),
            scale=scale, win=win, heads=self.num_heads, head_dim=head_dim,
            gw=gw, rel_h=rel_h, rel_w=rel_w, bias=bqkv.astype(self.dtype),
            rel_bias_h=b_rh, rel_bias_w=b_rw, valid_w=w)
        out = out[:, :h]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

    def _fused_window(self, qkv_raw, h, w, head_dim, scale):
        """All-heads-per-window fused attention (ops.attention
        sam_window_attention): consumes the qkv dense output as-is."""
        from inklayer_tpu.ops.attention import sam_window_attention

        nw = qkv_raw.shape[0]
        n = h * w
        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros,
            (2 * self.input_size[0] - 1, head_dim))
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros,
            (2 * self.input_size[1] - 1, head_dim))
        rh_tab = _gather_rel_pos(rel_pos_h, h, h).astype(self.dtype)
        rw_tab = _gather_rel_pos(rel_pos_w, w, w).astype(self.dtype)
        # bias terms from UNSCALED q (reference scales q@k only)
        qg = qkv_raw[..., :self.dim].reshape(nw, h, w, self.num_heads,
                                             head_dim)
        rel_h = jnp.einsum("bijhc,ikc->bijhk", qg, rh_tab).reshape(
            nw, n, self.num_heads * h)
        rel_w = jnp.einsum("bijhc,jkc->bijhk", qg, rw_tab).reshape(
            nw, n, self.num_heads * w)
        out = sam_window_attention(
            qkv_raw.reshape(nw, n, 3 * self.dim), rel_h, rel_w, scale=scale,
            kh=h, kw=w, heads=self.num_heads, head_dim=head_dim)
        return out.reshape(nw, h, w, self.dim)

    def _fused_global(self, qkv, h, w, head_dim, scale):
        """Token-major fused global attention (ops.attention
        sam_global_attention2): no (B*H, N, D) transposes; the aug fold
        (scale*q | rel terms vs k | 0/1 expansion) is prebuilt by XLA
        fusions so the kernel is pure matmul-softmax-matmul."""
        from inklayer_tpu.ops.attention import (sam_global_attention,
                                                sam_global_attention2)

        b, n = qkv.shape[0], h * w
        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros,
            (2 * self.input_size[0] - 1, head_dim))
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros,
            (2 * self.input_size[1] - 1, head_dim))
        rh_tab = _gather_rel_pos(rel_pos_h, h, h).astype(self.dtype)
        rw_tab = _gather_rel_pos(rel_pos_w, w, w).astype(self.dtype)
        # bias terms from UNSCALED q (reference scales q@k only)
        qg = qkv[:, :, 0].reshape(b, h, w, self.num_heads, head_dim)
        pad = 128 - head_dim
        qkv_p = jnp.pad(qkv, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad))) \
            if pad > 0 else qkv
        hp = qkv_p.shape[-1]
        q2 = qkv_p[:, :, 0].reshape(b, n, self.num_heads * hp)
        k2 = qkv_p[:, :, 1].reshape(b, n, self.num_heads * hp)
        v2 = qkv_p[:, :, 2].reshape(b, n, self.num_heads * hp)

        if (h + w) % 128 == 0:
            # v2 wants (N, heads, kh) rel layout (lane-interleaved aug) and
            # per-head aug width 128+kh+kw on the 128-lane grid
            rel_h = jnp.einsum("bijhc,ikc->bijhk", qg, rh_tab).reshape(
                b, n, self.num_heads, h)
            rel_w = jnp.einsum("bijhc,jkc->bijhk", qg, rw_tab).reshape(
                b, n, self.num_heads, w)

            def one(q2b, k2b, v2b, rhb, rwb):
                return sam_global_attention2(
                    q2b, k2b, v2b, rhb, rwb, scale=scale, kh=h, kw=w,
                    heads=self.num_heads)
        else:  # fallback: in-kernel aug build (any kh/kw)
            rel_h = jnp.einsum("bijhc,ikc->bhijk", qg, rh_tab).reshape(
                b, self.num_heads, n, h)
            rel_w = jnp.einsum("bijhc,jkc->bhijk", qg, rw_tab).reshape(
                b, self.num_heads, n, w)

            def one(q2b, k2b, v2b, rhb, rwb):
                return sam_global_attention(
                    q2b, k2b, v2b, rhb, rwb, scale=scale, kh=h, kw=w,
                    heads=self.num_heads)

        out2 = jax.vmap(one)(q2, k2, v2, rel_h, rel_w)
        out = out2.reshape(b, n, self.num_heads, hp)[..., :head_dim]
        return out.reshape(b, h, w, self.dim)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 14  # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)
    use_rel_pos: bool = True
    use_flash: bool = True
    fused_mlp: bool = True  # Pallas fc1->GELU->fc2 (TPU bf16 only)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, delta: Optional[jax.Array] = None):
        """Token-major (B, N, C) residual stream END TO END: the 4D spatial
        tensor only exists transiently around the attention — a
        global-attention block in the graph otherwise flips the 4D layout
        model-wide and every LN/elementwise op pays transposes
        (perfetto-profiled on v5e).

        Pair interface: the PENDING residual delta from the previous block
        (its MLP output, or the pos embedding for block 0) is fused into
        this block's first LayerNorm (one Pallas pass computes
        sum = x + delta and LN(sum)); returns (sum', mlp_out) with the add
        again left pending.  Pass delta=None / take [0]+[1] summed for the
        standalone layout."""
        h, w = self.input_size
        b, n, c = x.shape
        if delta is None:
            delta = jnp.zeros_like(x)
        shortcut, y = LayerNorm(dtype=self.dtype, name="norm1")(x, delta)
        y = y.reshape(b, h, w, c)
        # the token-count floor keeps tiny dryrun/test configs (e.g. the
        # 2x2-window multichip dryrun, which runs on a CPU mesh while the
        # default backend is still the TPU plugin) off the Pallas path
        from inklayer_tpu.runtime import pallas_enabled

        fused_window = (
            self.window_size > 0 and self.use_flash and self.use_rel_pos
            and pallas_enabled()
            and self.window_size * self.window_size >= 64
            and self.dim // self.num_heads <= 128)
        if fused_window:
            # partition-free path: the Attention module pads/crops the
            # spatial map internally (qkv runs on the unpadded token stream;
            # pad tokens become qkv-bias vectors, reproducing
            # window_partition + linear)
            y = Attention(
                dim=self.dim, num_heads=self.num_heads,
                input_size=(self.window_size, self.window_size),
                use_rel_pos=self.use_rel_pos,
                use_flash=self.use_flash, dtype=self.dtype,
                fused_window=True, name="attn")(y)
        elif self.window_size > 0:
            y, padded_hw = window_partition(y, self.window_size)
            y = Attention(
                dim=self.dim, num_heads=self.num_heads,
                input_size=(self.window_size, self.window_size),
                use_rel_pos=self.use_rel_pos, use_flash=self.use_flash,
                dtype=self.dtype, name="attn")(y)
            y = window_unpartition(y, self.window_size, padded_hw, (h, w))
        else:
            y = Attention(
                dim=self.dim, num_heads=self.num_heads,
                input_size=self.input_size, use_rel_pos=self.use_rel_pos,
                use_flash=self.use_flash, dtype=self.dtype, name="attn")(y)
        x, y = LayerNorm(dtype=self.dtype, name="norm2")(
            shortcut, y.reshape(b, n, c))
        y = MLP(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                fused=self.fused_mlp, name="mlp")(y)
        return x, y


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_rel_pos: bool = True  # ablation knob; SAM checkpoints require True
    use_flash: bool = True  # ablation knob: global blocks via Pallas kernel
    patch_matmul: bool = True  # patch embed as space-to-depth + matmul
    fused_mlp: bool = True  # Pallas fc1->GELU->fc2 (TPU bf16 only)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, img_size, img_size, 3) preprocessed pixels ->
        (B, img_size/16, img_size/16, out_chans) embedding."""
        grid = self.img_size // self.patch_size
        x = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype,
                       as_matmul=self.patch_matmul, name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid, grid, self.embed_dim))
        b = x.shape[0]
        n = grid * grid
        # token-major stream + pending-residual pairs: block i's trailing
        # MLP output is fused into block i+1's first LayerNorm (one Pallas
        # pass) instead of a standalone add; the pos embedding rides the
        # same mechanism into block 0
        x = x.reshape(b, n, self.embed_dim)
        delta = jnp.broadcast_to(
            pos.astype(self.dtype).reshape(1, n, self.embed_dim), x.shape)
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block)
        for i in range(self.depth):
            x, delta = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(grid, grid),
                use_rel_pos=self.use_rel_pos,
                use_flash=self.use_flash,
                fused_mlp=self.fused_mlp,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, delta)
        x = x + delta
        # neck: 1x1 conv -> LN -> 3x3 conv -> LN (image_encoder.py:85-104).
        # The 1x1 conv and its LN run token-major ((B, N, 1, C) is the same
        # buffer); only the 256-channel tensor pays the spatial-layout copy
        # for the 3x3 conv (the 1280-channel copy_add fusion cost 2.6ms/fwd)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    name="neck_conv1")(x.reshape(b, n, 1, self.embed_dim))
        x = LayerNorm(dtype=self.dtype, name="neck_ln1")(
            x.reshape(b, n, self.out_chans))
        x = x.reshape(b, grid, grid, self.out_chans)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="neck_conv2")(x)
        x = LayerNorm(dtype=self.dtype, name="neck_ln2")(x)
        return x
