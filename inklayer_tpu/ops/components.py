"""Connected components + per-component stats, fully on device.

Replaces cv2.connectedComponentsWithStats (mask_cleaner.py:17) and
scipy.ndimage.label (refiner.py:151).

TPU-native design: min-label propagation where each outer iteration does one
8-neighbour min step (merges runs across rows/columns/diagonals) followed by
log-doubling *segmented scans* along rows and columns (spreads the min across
an entire run in log2(n) shifted-min steps, gated on precomputed run
lengths).  Everything is rolls/compares/mins — **no gathers, no scatters** —
the two ops that made the previous pointer-doubling formulation ~465 ms per
750^2 mask on v5e (vs ~20 ms for this one).  Runs inside one jit with a
bounded while_loop and early exit on fixpoint.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2 ** 30)


def _run_lengths(mask: jax.Array, axis: int) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel run statistics along `axis` for True runs of `mask`.

    Returns (r, l): r[x] = number of consecutive True pixels ending at x
    (inclusive; 0 on background), l[x] = number starting at x.  Computed with
    two associative scans (count-trailing-ones trick: c = cumsum(m);
    r = c - cummax(c where background else 0)).
    """
    m = mask.astype(jnp.int32)
    c = jnp.cumsum(m, axis=axis)
    z = jnp.where(mask, 0, c)
    zmax = jax.lax.associative_scan(jnp.maximum, z, axis=axis)
    r = jnp.where(mask, c - zmax, 0)
    flip = jnp.flip(mask, axis=axis)
    cf = jnp.cumsum(flip.astype(jnp.int32), axis=axis)
    zf = jnp.where(flip, 0, cf)
    zfmax = jax.lax.associative_scan(jnp.maximum, zf, axis=axis)
    l = jnp.flip(jnp.where(flip, cf - zfmax, 0), axis=axis)
    return r, l


def _axis_doubling_min(val: jax.Array, r: jax.Array, l: jax.Array,
                       axis: int) -> jax.Array:
    """Min-propagate `val` within True-runs along `axis` via log-doubling.

    Gate: pulling from distance d is allowed iff the run extends at least d
    pixels in that direction (r/l >= d+1), which also rules out jnp.roll
    wrap-around reads (a run cannot cross the array edge).
    """
    n = val.shape[axis]
    d = 1
    while d < n:
        fwd = jnp.roll(val, d, axis=axis)
        val = jnp.where(r > d, jnp.minimum(val, fwd), val)
        bwd = jnp.roll(val, -d, axis=axis)
        val = jnp.where(l > d, jnp.minimum(val, bwd), val)
        d *= 2
    return val


def _edge_guard(shape, dy: int, dx: int) -> jax.Array:
    """True where a (dy, dx) roll does NOT wrap (batch-agnostic)."""
    h, w = shape[-2], shape[-1]
    ok = jnp.ones(shape[-2:], bool)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    if dy == 1:
        ok &= yy > 0
    elif dy == -1:
        ok &= yy < h - 1
    if dx == 1:
        ok &= xx > 0
    elif dx == -1:
        ok &= xx < w - 1
    return ok


def _neighbor_min(lbl: jax.Array, mask: jax.Array, connectivity: int) -> jax.Array:
    """Min label over the pixel's neighborhood (masked pixels only)."""
    x = jnp.where(mask, lbl, _BIG)
    shifts = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]
    out = x
    for dy, dx in shifts:
        shifted = jnp.roll(x, (dy, dx), axis=(-2, -1))
        guard = _edge_guard(x.shape, dy, dx)
        out = jnp.minimum(out, jnp.where(guard, shifted, _BIG))
    return jnp.where(mask, out, _BIG)


@functools.partial(jax.jit, static_argnames=("connectivity", "max_iters",
                                             "with_stats"))
def connected_components(mask: jax.Array, connectivity: int = 8,
                         max_iters: int = 64,
                         with_stats: bool = False) -> jax.Array:
    """mask: (..., H, W) bool -> (..., H, W) int32 labels; background = -1,
    components labelled by the flat index of their minimum pixel (stable,
    not compacted).  with_stats=True additionally returns (capped bool,
    n_iters int32): capped means the propagation was still changing when it
    hit `max_iters` — labels may be split (observability for the CC cap,
    VERDICT r03 #8)."""
    h, w = mask.shape[-2], mask.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    lbl = jnp.where(mask, idx, _BIG)
    rr, lr = _run_lengths(mask, -1)
    rc, lc = _run_lengths(mask, -2)

    def body(state):
        lbl, _, i = state
        new = _neighbor_min(lbl, mask, connectivity)
        new = _axis_doubling_min(new, rr, lr, -1)
        new = _axis_doubling_min(new, rc, lc, -2)
        return new, jnp.any(new != lbl), i + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lbl, changed, n_it = jax.lax.while_loop(
        cond, body, (lbl, jnp.bool_(True), jnp.int32(0)))
    out = jnp.where(mask, lbl, -1)
    if with_stats:
        return out, changed, n_it
    return out


_PBIG = 2 ** 30  # python int: a jnp scalar would be a captured constant


def _cc_label_body(mask, h: int, w: int, w_orig: int, connectivity: int,
                   iters: int):
    """In-kernel CC propagation for ONE (h, w) bool mask held in VMEM.
    Same algorithm as the XLA version (8-neighbour min + run-gated
    log-doubling scans).  Returns int32 labels with _PBIG at background.
    Labels use the ORIGINAL row stride (y * w_orig + x) so results match the
    XLA path on the unpadded image exactly."""
    from jax.experimental.pallas import tpu as pltpu

    big = _PBIG

    def _roll(x, s, axis):
        n = h if axis == 0 else w
        return pltpu.roll(x, s % n, axis=axis)  # pltpu.roll needs s >= 0

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mi = mask.astype(jnp.int32)  # Mosaic rotate needs 32-bit data

    def run_len(m32, axis):
        """Count of consecutive mask pixels ending at x along `axis`
        (Hillis-Steele), as a fori over the exponent with DYNAMIC roll
        shifts: an unrolled chain keeps ~20 (H, W) i32 transients live
        and blows the 16MB scoped-VMEM budget."""
        n = h if axis == 0 else w
        pos = yy if axis == 0 else xx
        ksteps = max(1, (n - 1).bit_length())

        def step(k, r):
            d = jax.lax.shift_left(jnp.int32(1), k)
            shifted = pltpu.roll(r, d, axis=axis)
            ok = (r == d) & (pos >= d)
            return r + jnp.where(ok, shifted, 0)

        return jax.lax.fori_loop(0, ksteps, step, m32)

    rr = run_len(mi, 1)
    rc = run_len(mi, 0)

    lbl0 = jnp.where(mask, yy * w_orig + xx, big)

    shifts = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    if connectivity == 8:
        shifts += [(1, 1), (1, -1), (-1, 1), (-1, -1)]

    def body(_, lbl):
        out = lbl
        for dy, dx in shifts:
            s = lbl
            if dy:
                s = _roll(s, dy, 0)
            if dx:
                s = _roll(s, dx, 1)
            guard = jnp.full((h, w), True)
            if dy == 1:
                guard &= yy > 0
            elif dy == -1:
                guard &= yy < h - 1
            if dx == 1:
                guard &= xx > 0
            elif dx == -1:
                guard &= xx < w - 1
            out = jnp.minimum(out, jnp.where(guard, s, big))
        lbl = jnp.where(mask, out, big)

        def axis_pass(lbl, gate, axis, n):
            ksteps = max(1, (n - 1).bit_length())

            def step(k, lbl):
                d = jax.lax.shift_left(jnp.int32(1), k)
                fwd = pltpu.roll(lbl, d, axis=axis)
                lbl = jnp.where(gate > d, jnp.minimum(lbl, fwd), lbl)
                bwd = pltpu.roll(lbl, n - d, axis=axis)
                # x may pull from x+d iff [x, x+d] is one run iff
                # gate[x+d] > d; wrap-safe: gate[y] <= y+1 along the axis
                gshift = pltpu.roll(gate, n - d, axis=axis)
                return jnp.where(gshift > d, jnp.minimum(lbl, bwd), lbl)

            return jax.lax.fori_loop(0, ksteps, step, lbl)

        lbl = axis_pass(lbl, rr, 1, w)
        lbl = axis_pass(lbl, rc, 0, h)
        return lbl

    # early exit on fixpoint: blob-like masks converge in 2-4 iterations
    # (and empty/tiny masks in 1), vs the worst-case `iters` bound
    def wcond(state):
        i, changed, _ = state
        return changed & (i < iters)

    def wbody(state):
        i, _, lbl = state
        new = body(0, lbl)
        return i + 1, jnp.any(new != lbl), new

    _, changed, lbl = jax.lax.while_loop(
        wcond, wbody, (jnp.int32(0), jnp.bool_(True), lbl0))
    # changed True on exit => the cap (not the fixpoint) ended the loop
    return lbl, changed


def _cc_pallas_kernel(h: int, w: int, w_orig: int, connectivity: int,
                      iters: int):
    """Whole CC for ONE mask in VMEM: one HBM read + one write per mask
    instead of ~40 HBM passes per iteration in the XLA formulation."""

    def kern(m_ref, o_ref):
        mask = m_ref[0] != 0  # (h, w) padded
        lbl, _capped = _cc_label_body(mask, h, w, w_orig, connectivity, iters)
        o_ref[0] = jnp.where(mask, lbl, -1)

    return kern


@functools.partial(jax.jit, static_argnames=("connectivity", "iters"))
def _connected_components_pallas(masks: jax.Array, connectivity: int = 8,
                                 iters: int = 16) -> jax.Array:
    """masks: (N, H, W) bool -> (N, H, W) int32 labels (same semantics as
    `connected_components`), one grid program per mask, VMEM-resident."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w = masks.shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    m = masks.astype(jnp.int8)
    if (hp, wp) != (h, w):
        m = jnp.pad(m, ((0, 0), (0, hp - h), (0, wp - w)))
    kern = _cc_pallas_kernel(hp, wp, w, connectivity, iters)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.int32),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # live set (mask + 2 run-length gates + labels + loop transients)
        # exceeds the default 16MB scoped budget at 750^2; v5e has 128MB
        # physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(m)
    return out[:, :h, :w]


def _clean_keep_kernel(h: int, w: int, w_orig: int, connectivity: int,
                       iters: int, min_area: int, min_aspect: float,
                       max_components: int):
    """Fused CC + component-keep for ONE mask in VMEM: labels never touch
    HBM.  After labelling, loops over actual components (extract min
    remaining label -> stats -> keep decision) with early exit when
    exhausted — real cleaned masks have a handful of components, so this
    beats the fixed 16x(8,H,W) chunked reduction it replaces by ~an order
    of magnitude.  Components beyond `max_components` are conservatively
    KEPT, matching `component_keep` semantics."""

    def kern(m_ref, o_ref, c_ref):
        mask = m_ref[0] != 0  # (h, w) padded
        lbl, capped = _cc_label_body(mask, h, w, w_orig, connectivity, iters)
        c_ref[0] = jnp.full((8, 128), capped.astype(jnp.int32))
        big = _PBIG
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

        def cond(state):
            i, r, _, _ = state
            return (r < big) & (i < max_components)

        # keep is carried as i32 (0/1): Mosaic rejects i1 vectors in
        # while_loop carries (vpad layout mismatch on scf.yield)
        def body(state):
            i, r, rem, keep = state
            eq = lbl == r
            area = jnp.sum(eq.astype(jnp.int32))
            ymin = jnp.min(jnp.where(eq, yy, big))
            ymax = jnp.max(jnp.where(eq, yy, -1))
            xmin = jnp.min(jnp.where(eq, xx, big))
            xmax = jnp.max(jnp.where(eq, xx, -1))
            ww = (xmax - xmin + 1).astype(jnp.float32)
            hh = (ymax - ymin + 1).astype(jnp.float32)
            aspect = jnp.maximum(ww, hh) / (jnp.minimum(ww, hh) + 1e-5)
            keep_c = (area > min_area) | (aspect > min_aspect)
            keep = jnp.where(eq & keep_c, 1, keep)
            rem = jnp.where(eq, big, rem)
            return i + 1, jnp.min(rem), rem, keep

        rem0 = lbl  # big at background already
        state = (jnp.int32(0), jnp.min(rem0), rem0,
                 jnp.zeros((h, w), jnp.int32))
        _, _, rem, keep = jax.lax.while_loop(cond, body, state)
        # leftover components past the cap: conservatively keep
        o_ref[0] = ((keep != 0) | (rem < big)).astype(jnp.int8)

    return kern


@functools.partial(jax.jit, static_argnames=("connectivity", "iters",
                                             "min_area", "min_aspect",
                                             "max_components"))
def _clean_components_pallas(masks: jax.Array, min_area: int,
                             min_aspect: float, connectivity: int = 8,
                             iters: int = 16,
                             max_components: int = 256):
    """masks: (N, H, W) bool -> ((N, H, W) bool, (N,) bool cap-hit flags),
    keeping only components with area > min_area OR bbox aspect >
    min_aspect.  One grid program per mask, everything VMEM-resident."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w = masks.shape
    hp = ((h + 7) // 8) * 8
    wp = ((w + 127) // 128) * 128
    m = masks.astype(jnp.int8)
    if (hp, wp) != (h, w):
        m = jnp.pad(m, ((0, 0), (0, hp - h), (0, wp - w)))
    kern = _clean_keep_kernel(hp, wp, w, connectivity, iters, min_area,
                              min_aspect, max_components)
    out, capped = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((n, hp, wp), jnp.int8),
                   jax.ShapeDtypeStruct((n, 8, 128), jnp.int32)),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(m)
    return out[:, :h, :w] != 0, capped[:, 0, 0] != 0


def clean_components_batch(masks: jax.Array, min_area: int,
                           min_aspect: float, connectivity: int = 8,
                           max_iters: int = 64,
                           with_stats: bool = False):
    """(N, H, W) bool -> (N, H, W) bool: drop components failing
    area > min_area OR aspect > min_aspect (clean_up_mask :24-33).  Fused
    Pallas path on TPU; CC + component_keep composition elsewhere.
    with_stats=True additionally returns (N,) bool cap-hit flags: True
    means that mask's CC propagation was still changing at the iteration
    cap (labels may be split -> cleaning may keep fragments it shouldn't).
    Compact real-weight masks converge in 2-4 iterations; only
    placeholder-noise masks have been observed to hit the cap."""
    n, h, w = masks.shape
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and n > 0 and h * w * 4 <= 5 * 2 ** 20:
        cleaned, capped = _clean_components_pallas(masks, min_area,
                                                   min_aspect, connectivity)
        return (cleaned, capped) if with_stats else cleaned
    labels, capped, _it = jax.vmap(
        lambda m: connected_components(m, connectivity, max_iters,
                                       with_stats=True))(masks)
    keep = jax.vmap(
        lambda l: component_keep(l, min_area, min_aspect))(labels)
    cleaned = masks & keep
    return (cleaned, capped) if with_stats else cleaned


def connected_components_batch(masks: jax.Array, connectivity: int = 8,
                               max_iters: int = 64) -> jax.Array:
    """(N, H, W) bool -> (N, H, W) int32 labels.  Routes to the Pallas
    whole-mask-in-VMEM kernel on TPU (fits VMEM up to ~1100^2), else the
    XLA propagation."""
    n, h, w = masks.shape
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and n > 0 and h * w * 4 <= 5 * 2 ** 20:
        return _connected_components_pallas(masks, connectivity)
    return jax.vmap(
        lambda m: connected_components(m, connectivity, max_iters))(masks)


@jax.jit
def component_stats(labels: jax.Array) -> Tuple[jax.Array, ...]:
    """Per-pixel component stats maps: (area, width, height) of each pixel's
    component (0 at background).  Exact for any component count (segment
    ops); intended for once-per-image use — for the per-mask batched cleanup
    decision use `component_keep` (segment/scatter-free)."""
    h, w = labels.shape
    flat = labels.reshape(-1)
    seg = jnp.where(flat >= 0, flat, 0)
    valid = (flat >= 0).astype(jnp.int32)
    n = h * w
    area = jax.ops.segment_sum(valid, seg, num_segments=n)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).reshape(-1)
    big = jnp.int32(1 << 30)
    ymin = jax.ops.segment_min(jnp.where(valid == 1, ys, big), seg, num_segments=n)
    ymax = jax.ops.segment_max(jnp.where(valid == 1, ys, -1), seg, num_segments=n)
    xmin = jax.ops.segment_min(jnp.where(valid == 1, xs, big), seg, num_segments=n)
    xmax = jax.ops.segment_max(jnp.where(valid == 1, xs, -1), seg, num_segments=n)
    width = (xmax - xmin + 1).clip(0)
    height = (ymax - ymin + 1).clip(0)

    def lookup(stats):
        per_px = stats[seg].reshape(h, w)
        return jnp.where(labels >= 0, per_px, 0)

    return lookup(area), lookup(width), lookup(height)


@functools.partial(jax.jit,
                   static_argnames=("min_area", "min_aspect",
                                    "max_components", "chunk"))
def component_keep(labels: jax.Array, min_area: int, min_aspect: float,
                   max_components: int = 128, chunk: int = 8) -> jax.Array:
    """Per-pixel keep decision: True where the pixel's component has
    area > min_area OR bbox aspect > min_aspect (clean_up_mask :24-33).

    Scatter/gather-free: extracts up to `max_components` component roots with
    one top_k, then computes each root's stats with chunked masked
    reductions.  Exact when the mask has <= max_components components;
    components beyond the cap are conservatively KEPT (never dropped) —
    real cleaned masks have tens of components, the cap exists only to bound
    compute.
    """
    h, w = labels.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    fg = labels >= 0
    is_root = fg & (labels == idx)
    roots, _ = jax.lax.top_k(jnp.where(is_root, idx, -1).reshape(-1),
                             max_components)  # (K,), -1 padded
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    big = jnp.int32(1 << 30)

    keep_map = jnp.zeros((h, w), bool)
    covered = jnp.zeros((h, w), bool)
    for c0 in range(0, max_components, chunk):
        rc = roots[c0:c0 + chunk]  # (chunk,)
        eq = labels[None] == rc[:, None, None]  # (chunk, h, w)
        eq &= rc[:, None, None] >= 0
        area = jnp.sum(eq, axis=(1, 2))
        ymin = jnp.min(jnp.where(eq, yy[None], big), axis=(1, 2))
        ymax = jnp.max(jnp.where(eq, yy[None], -1), axis=(1, 2))
        xmin = jnp.min(jnp.where(eq, xx[None], big), axis=(1, 2))
        xmax = jnp.max(jnp.where(eq, xx[None], -1), axis=(1, 2))
        width = (xmax - xmin + 1).clip(0)
        height = (ymax - ymin + 1).clip(0)
        aspect = jnp.maximum(width, height) / (jnp.minimum(width, height)
                                               + 1e-5)
        keep_c = (area > min_area) | (aspect > min_aspect)
        keep_map |= jnp.any(eq & keep_c[:, None, None], axis=0)
        covered |= jnp.any(eq, axis=0)
    # components beyond the root cap: conservatively keep
    return keep_map | (fg & ~covered)


@functools.partial(jax.jit, static_argnames=("min_area",))
def large_component_mask(mask: jax.Array, min_area: int) -> jax.Array:
    """True where the pixel belongs to a component of area > min_area
    (refiner.py:154-160 large-region detection)."""
    labels = connected_components(mask)
    area, _, _ = component_stats(labels)
    return (area > min_area) & mask
