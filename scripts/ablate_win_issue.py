"""SAM window-attention kernel issue-floor decomposition (VERDICT r02 weak #3).

The windowed blocks cost ~0.25 ms/block vs a ~0.07 ms pure-FLOP roofline
(400 attention units of (196,108)@(108,196) + softmax + (196,196)@(196,80)
per block).  Claim to test: the residual is a per-small-matmul issue floor
that cannot be amortised.  Experiments:

  full     production sam_window_block_attention (1 row band / program)
  kband5   SAME kernel, 5 row bands (25 windows) per grid step — amortises
           program prologue/epilogue across k windows (the untried lever
           named by the r02 verdict)
  dots     pure-matmul control at IDENTICAL shapes: the exact dot sequence
           (80 units x 2 dots per program, same VMEM layouts) with no
           softmax and no window assembly — the silicon floor for the
           matmul work
  dots+sm  control + fp32 softmax between the two dots — isolates softmax
           VPU cost; (full - dots+sm) ~= in-kernel window assembly cost
  aligned  dots with head slices at 128-aligned lane offsets
  headmaj  dots with (window*head) as a leading dim (no lane offsets)

MEASUREMENT PROTOCOL (hard-won, round 3): wall-clock loop timing is USELESS
for sub-ms kernels through the axon tunnel — one jit invocation pays a
~24 ms RTT, and a fori_loop harness adds ~0.3 ms/iter of loop-dependence
glue (sum + add), which буried the 0.26 ms kernel under 6x of harness.
(The first capture was worse still: without a loop-carried dependence XLA
hoists the pure pallas_call out of the fori_loop entirely and all variants
measure RTT + ONE kernel.)  So: chain 20 kernel calls back-to-back inside
one jit (output feeding the next input), trace with jax.profiler, and read
the PER-CALL CUSTOM-CALL DURATIONS from the trace.  In-model cross-check:
profile_sam.py --depth 32 gives sam_window_block_attention 6.95 ms / 28
blocks = 0.248 ms/block — the standalone chained trace must (and does)
reproduce it.

Measured 2026-08-20 (v5e, chained-trace protocol, median per-call device
time from the profiler; in-model cross-check profile_sam.py gives
sam_window_block_attention 6.95 ms / 28 blocks = 0.248 ms/block):

  full     0.260 ms/block  (== in-model 0.248: protocol validated)
  kband5   0.285 ms/block  -> k-bands-per-program amortisation: NULL
  dots     0.157 ms/block  -> bare 80x2 small-dot sequence, production
                              layout (lane slices at 80h/108h offsets)
  dots+sm  0.336 ms/block  -> anomalous (exceeds full, which does a
                              superset) — Mosaic scheduling noise on this
                              variant's wider input blocks; treat +-0.08
  aligned  0.099 ms/block  -> 128-aligned lane slices: 1.6x faster dots
  headmaj  0.064 ms/block  -> (window*head) leading-dim layout: 2.5x
                              faster; ~= the padded-FLOP+issue floor

Conclusions:
  * The r02-suggested lever (k>=2 windows per grid step) is a measured
    NULL — the floor is per-DOT, not per-program.
  * 60% of the kernel is the bare dot sequence; the misaligned lane
    slices the qkv-dense layout forces cost it ~0.09 ms/block vs the
    head-major control.  Capturing that would need head-major qkv in
    HBM: either XLA transposes (~2 ms/fwd, the cost the partition-free
    design removed) or an N=80/128-padded qkv dense (+0.13 ms/block on
    the dense — more than the 0.09 saved).  Aligned-slot padding loses
    the same way (dense +60% FLOPs).  The production kernel is within
    ~25% of the practically reachable floor; total window headroom is
    ~2.5 ms/fwd and requires a layout no producer can supply for free.
  * Achievable-MFU accounting from these controls is written into
    BASELINE.md next to the 80% north star.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import collections
import functools
import glob
import gzip
import json
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from inklayer_tpu.ops.attention import sam_window_block_attention

WIN, HEADS, HD, GW = 14, 16, 80, 5
HP, W = 70, 64
N = WIN * WIN
C = HEADS * HD
C3 = 3 * C
AW = HD + 2 * WIN  # aug contraction width 108
CHAIN = 20


def _dots_kernel(aq_ref, ak_ref, v_ref, o_ref, *, softmax: bool):
    for j in range(GW):
        for h in range(HEADS):
            aq = aq_ref[j, :, h * AW:(h + 1) * AW]
            ak = ak_ref[j, :, h * AW:(h + 1) * AW]
            s = jax.lax.dot_general(
                aq, ak, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (n, n)
            if softmax:
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                l = jnp.sum(p, axis=-1, keepdims=True)
            else:
                p, l = s, 1.0
            v = v_ref[j, :, h * HD:(h + 1) * HD]
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[j, :, h * HD:(h + 1) * HD] = (o / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("softmax",))
def dots_control(aq, ak, v, softmax=False):
    """Exact dot sequence of one windowed block: grid (5,), each program =
    one row band = 5 windows x 16 heads x (aug-QK, PV)."""
    nw = aq.shape[0]
    return pl.pallas_call(
        functools.partial(_dots_kernel, softmax=softmax),
        out_shape=jax.ShapeDtypeStruct((nw, N, C), v.dtype),
        grid=(nw // GW,),
        in_specs=[
            pl.BlockSpec((GW, N, HEADS * AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, HEADS * AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GW, N, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )(aq, ak, v)


def _dots_aligned_kernel(aq_ref, ak_ref, v_ref, o_ref):
    """Same dot sequence, head slices at 128-aligned lane offsets."""
    for j in range(GW):
        for h in range(HEADS):
            aq = aq_ref[j, :, h * 128:h * 128 + AW]
            ak = ak_ref[j, :, h * 128:h * 128 + AW]
            s = jax.lax.dot_general(
                aq, ak, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            v = v_ref[j, :, h * 128:h * 128 + HD]
            o = jnp.dot(s.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[j, :, h * 128:h * 128 + HD] = o.astype(o_ref.dtype)


@jax.jit
def dots_aligned(aq, ak, v):
    nw = aq.shape[0]
    return pl.pallas_call(
        _dots_aligned_kernel,
        out_shape=jax.ShapeDtypeStruct((nw, N, HEADS * 128), v.dtype),
        grid=(nw // GW,),
        in_specs=[
            pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GW, N, HEADS * 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
    )(aq, ak, v)


def _dots_headmajor_kernel(aq_ref, ak_ref, v_ref, o_ref):
    """Same dot sequence, (window*head) as a leading dim — every slice
    starts at lane 0 (no lane rotates)."""
    for u in range(GW * HEADS):
        aq = aq_ref[u]  # (n, AW)
        ak = ak_ref[u]
        s = jax.lax.dot_general(
            aq, ak, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        v = v_ref[u]
        o = jnp.dot(s.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[u] = o.astype(o_ref.dtype)


@jax.jit
def dots_headmajor(aq, ak, v):
    nu = aq.shape[0]  # nw*heads
    blk = GW * HEADS
    return pl.pallas_call(
        _dots_headmajor_kernel,
        out_shape=jax.ShapeDtypeStruct((nu, N, HD), v.dtype),
        grid=(nu // blk,),
        in_specs=[
            pl.BlockSpec((blk, N, AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, N, AW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, N, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
    )(aq, ak, v)


def traced_kernel_ms(name, chain_fn, args):
    """Run a CHAIN-deep back-to-back chain of the kernel once under the
    profiler; return the median per-call custom-call duration (device us
    from the trace, converted to ms)."""
    f = jax.jit(chain_fn)
    float(f(*args))  # compile + warm
    float(f(*args))
    tdir = tempfile.mkdtemp(prefix=f"win_{name}_")
    with jax.profiler.trace(tdir):
        float(f(*args))
    files = glob.glob(_os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(files, key=_os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        events = json.load(fh).get("traceEvents", [])
    durs = collections.defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            base = e["name"].split(".")[0]
            durs[base].append(e["dur"])
    # the kernel custom-call is the op with the largest total device time
    # that occurs >= CHAIN/2 times (jit wrapper spans occur once)
    cands = {k: v for k, v in durs.items() if len(v) >= CHAIN // 2}
    best = max(cands, key=lambda k: sum(cands[k]))
    med = float(np.median(cands[best])) / 1e3
    print(f"{name:8s} {med:6.3f} ms/call  (op '{best}' x{len(cands[best])})",
          flush=True)
    return med


def main():
    r = np.random.RandomState(0)
    qkv = jnp.asarray(r.randn(1, HP, W, C3) * 0.3, jnp.bfloat16)
    rel_h = jnp.asarray(r.randn(1, HP, W, HEADS * WIN) * 0.1, jnp.bfloat16)
    rel_w = jnp.asarray(r.randn(1, HP, W, HEADS * WIN) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(r.randn(C3) * 0.1, jnp.bfloat16)
    brh = jnp.asarray(r.randn(WIN, HEADS * WIN) * 0.1, jnp.bfloat16)
    brw = jnp.asarray(r.randn(WIN, HEADS * WIN) * 0.1, jnp.bfloat16)
    tab = jnp.zeros((WIN, WIN, HD), jnp.bfloat16)
    kw = dict(scale=HD ** -0.5, win=WIN, heads=HEADS, head_dim=HD, gw=GW,
              rel_h=rel_h, rel_w=rel_w, bias=bias, rel_bias_h=brh,
              rel_bias_w=brw, valid_w=W)

    def chain_full(q, **extra):
        for _ in range(CHAIN):
            o = sam_window_block_attention(q, tab, tab, **extra, **kw)
            q = jnp.concatenate([o, q[..., C:]], axis=-1)
        return jnp.sum(o.astype(jnp.float32))

    traced_kernel_ms("full", chain_full, (qkv,))
    traced_kernel_ms("kband5",
                     functools.partial(chain_full, bands_per_program=5),
                     (qkv,))

    nw = GW * (HP // WIN)
    aq = jnp.asarray(r.randn(nw, N, HEADS * AW) * 0.3, jnp.bfloat16)
    ak = jnp.asarray(r.randn(nw, N, HEADS * AW) * 0.3, jnp.bfloat16)
    v = jnp.asarray(r.randn(nw, N, C) * 0.3, jnp.bfloat16)

    def chain_dots(aq, ak, v, softmax):
        for _ in range(CHAIN):
            v = dots_control(aq, ak, v, softmax=softmax)  # o.shape == v.shape
        return jnp.sum(v.astype(jnp.float32))

    traced_kernel_ms("dots", functools.partial(chain_dots, softmax=False),
                     (aq, ak, v))
    traced_kernel_ms("dots+sm", functools.partial(chain_dots, softmax=True),
                     (aq, ak, v))

    aqA = jnp.asarray(r.randn(nw, N, HEADS * 128) * 0.3, jnp.bfloat16)
    akA = jnp.asarray(r.randn(nw, N, HEADS * 128) * 0.3, jnp.bfloat16)
    vA = jnp.asarray(r.randn(nw, N, HEADS * 128) * 0.3, jnp.bfloat16)

    def chain_aligned(aq, ak, v):
        for _ in range(CHAIN):
            v = dots_aligned(aq, ak, v)
        return jnp.sum(v.astype(jnp.float32))

    traced_kernel_ms("aligned", chain_aligned, (aqA, akA, vA))

    aqH = jnp.asarray(r.randn(nw * HEADS, N, AW) * 0.3, jnp.bfloat16)
    akH = jnp.asarray(r.randn(nw * HEADS, N, AW) * 0.3, jnp.bfloat16)
    vH = jnp.asarray(r.randn(nw * HEADS, N, HD) * 0.3, jnp.bfloat16)

    def chain_headmaj(aq, ak, v):
        for _ in range(CHAIN):
            v = dots_headmajor(aq, ak, v)
        return jnp.sum(v.astype(jnp.float32))

    traced_kernel_ms("headmaj", chain_headmaj, (aqH, akH, vH))


if __name__ == "__main__":
    main()
