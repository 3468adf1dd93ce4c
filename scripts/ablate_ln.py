"""LayerNorm microbenchmarks: the depth-8 profile attributes ~13ms of
39.5ms to convert/multiply-reduce fusions (≈0.7ms per LN over (1,64,64,1280)
— 36x off the HBM roofline).  Isolate whether the LN op itself is slow or
its in-graph layout is."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/inklayer_tpu_xla"))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.nn.layers import LayerNorm


def timeit(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    float(fn(*args))
    c = time.perf_counter() - t0
    for _ in range(3):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t) * 1e3)
    print(f"{name:44s} p50 {float(np.percentile(ts, 50)):8.2f} ms "
          f"(compile {c:.0f}s)", flush=True)


x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 1280), jnp.bfloat16)

ln = LayerNorm(dtype=jnp.bfloat16)
p = ln.init(jax.random.key(0), x)

# 16 chained LNs approximates the model's LN load (reads are dependent)
@jax.jit
def ours16(p, x):
    y = x
    for _ in range(16):
        y = ln.apply(p, y) + 1.0
    return jnp.sum(y.astype(jnp.float32))


fl = nn.LayerNorm(epsilon=1e-6, use_fast_variance=True, dtype=jnp.bfloat16)
pf = fl.init(jax.random.key(0), x)


@jax.jit
def flax16(pf, x):
    y = x
    for _ in range(16):
        y = fl.apply(pf, y) + 1.0
    return jnp.sum(y.astype(jnp.float32))


def manual_ln(y, scale, bias):
    yf = y.astype(jnp.float32)
    n = yf.shape[-1]
    s1 = jnp.sum(yf, -1, keepdims=True)
    s2 = jnp.sum(yf * yf, -1, keepdims=True)
    mean = s1 / n
    var = s2 / n - mean * mean
    return ((yf - mean) * jax.lax.rsqrt(var + 1e-6) * scale + bias
            ).astype(y.dtype)


@jax.jit
def manual16(p, x):
    scale = p["params"]["scale"]
    bias = p["params"]["bias"]
    y = x
    for _ in range(16):
        y = manual_ln(y, scale, bias) + 1.0
    return jnp.sum(y.astype(jnp.float32))


@jax.jit
def baseline16(x):
    y = x
    for _ in range(16):
        y = y * 1.0001 + 1.0
    return jnp.sum(y.astype(jnp.float32))


timeit("16x elementwise only (baseline)", baseline16, x)
timeit("16x our LayerNorm", ours16, p, x)
timeit("16x flax LayerNorm fast-var", flax16, pf, x)
timeit("16x manual one-pass fp32 LN", manual16, p, x)
x2 = x.reshape(4096, 1280)
ln2 = LayerNorm(dtype=jnp.bfloat16)
p2 = ln2.init(jax.random.key(0), x2)


@jax.jit
def ours16_2d(p2, x2):
    y = x2
    for _ in range(16):
        y = ln2.apply(p2, y) + 1.0
    return jnp.sum(y.astype(jnp.float32))


timeit("16x our LN on (4096,1280)", ours16_2d, p2, x2)
