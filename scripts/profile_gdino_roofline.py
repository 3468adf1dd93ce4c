"""Honest roofline accounting for the detect stage (VERDICT r03 #5).

The round-3 "~40% MXU" figure for the deformable kernel measured against
the DENSE-formulation FLOPs (an inflated basis).  This script produces the
honest budget at the (800, 800) bucket:
  * XLA cost-analysis FLOPs of the full compiled forward (dense matmuls,
    convs, attentions — Pallas custom calls excluded by construction)
  * analytic IRREDUCIBLE FLOPs of the deformable kernel (4 bilinear taps ×
    K samples × heads × head_dim MACs per query — what any implementation
    must compute, NOT the separable-matmul formulation's dense FLOPs)
  * warm p50 of the full forward + a full-name per-op device trace bucketed
    into deformable / fusion / text-enhancer / decoder / Swin / BERT / glue

Results are written up in BASELINE.md ("Detect stage roofline").
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/inklayer_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import collections
import glob
import gzip
import json
import tempfile
import time

import numpy as np

V5E_BF16_PEAK = 197e12


def main():
    import jax
    import jax.numpy as jnp

    from inklayer_tpu.config import GDinoConfig
    from inklayer_tpu.models.gdino import GroundingDINO
    from inklayer_tpu.models.gdino.bert import subsentence_masks

    cfg = GDinoConfig()
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = GroundingDINO(cfg, dtype=dt)
    img = jax.jit(lambda k: jax.random.normal(k, (1, 800, 800, 3), jnp.float32))(
        jax.random.key(0))
    pad = jnp.zeros((1, 800, 800), bool)
    ids = np.asarray([[101, 4874, 1012, 102]], np.int32)
    attn, pos = subsentence_masks(ids)
    args = (img, pad, jnp.asarray(ids), jnp.asarray(attn),
            jnp.asarray(pos.astype(np.int32)))
    shapes = jax.eval_shape(lambda k: model.init(k, *args), jax.random.key(0))
    params = jax.tree.map(lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    @jax.jit
    def fwd(p, *a):
        logits, boxes = model.apply(p, *a)
        return (jnp.sum(logits.astype(jnp.float32))
                + jnp.sum(boxes.astype(jnp.float32)))

    t0 = time.perf_counter()
    float(fwd(params, *args))
    print(f"compile {time.perf_counter() - t0:.0f}s")
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        float(fwd(params, *args))
        ts.append((time.perf_counter() - t0) * 1e3)
    wall = float(np.percentile(ts, 50))

    # transport RTT to subtract
    f0 = jax.jit(lambda x: x + 1)
    float(f0(jnp.float32(0)))
    rts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(f0(jnp.float32(0)))
        rts.append((time.perf_counter() - t0) * 1e3)
    rtt = float(np.median(rts))
    print(f"full forward p50 {wall:.1f} ms incl rtt {rtt:.1f} "
          f"-> device ~{wall - rtt:.1f} ms")

    comp = jax.jit(fwd).lower(params, *args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops = float(ca.get("flops", 0.0))

    # analytic irreducible deformable work (ms_deform_im2col semantics):
    # per query: heads*levels*points samples, 4 bilinear taps each, head_dim
    # MACs per tap (value gather-multiply) + tap-weight accumulation
    lvl_hw = [(100, 100), (50, 50), (25, 25), (13, 13)]
    nq_enc = sum(h * w for h, w in lvl_hw)
    hd = cfg.hidden_dim // cfg.nheads
    samples = cfg.nheads * cfg.num_feature_levels * cfg.enc_n_points
    per_query = samples * 4 * hd * 2 * 2  # 4 taps, MAC=2, interp+weight ≈ 2
    deform_enc = cfg.enc_layers * nq_enc * per_query
    deform_dec = cfg.dec_layers * cfg.num_queries * samples * 4 * hd * 2 * 2
    deform_flops = deform_enc + deform_dec
    total = xla_flops + deform_flops
    dev_s = (wall - rtt) / 1e3
    print(f"XLA flops {xla_flops / 1e9:.1f} G + deformable irreducible "
          f"{deform_flops / 1e9:.1f} G = {total / 1e9:.1f} G")
    print(f"useful MFU {total / dev_s / V5E_BF16_PEAK * 100:.1f}% "
          f"(vs dense-formulation basis it would read higher)")

    # per-op trace, full fusion names
    tdir = tempfile.mkdtemp(prefix="gdino_trace_")
    with jax.profiler.trace(tdir):
        float(fwd(params, *args))
    files = glob.glob(_os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    path = max(files, key=_os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "Chip" in n or "/device" in n.lower()}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e):
            nm = e["name"]
            if nm.startswith(("jit_", "while")):
                continue
            agg[nm] += e["dur"]
            cnt[nm] += 1
    print("top 30 device ops:")
    for name, dur in agg.most_common(30):
        print(f"  {dur / 1e3:8.2f} ms x{cnt[name]:3d}  {name[:80]}")

    # class totals over the WHOLE tail (VERDICT r04 #6: the sub-ms tail is
    # where the Swin/decoder/glue budget hides)
    def klass(nm):
        base = nm.split(".")[0]
        if base in ("self_attn", "cross_attn"):
            return "pallas attn (enc deform + dec)"
        if base in ("copy", "reshape", "transpose", "bitcast", "pad",
                    "slice", "concatenate", "dynamic-slice"):
            return "layout/copy glue"
        if base.startswith("convert"):
            return "convert fusions"
        if "conv" in base:
            return "convolution fusions"
        if base in ("dot", "custom-call"):
            return "bare dots/custom"
        if "fusion" in base:
            return "other fusions (matmul+elementwise)"
        return "misc: " + base
    classes = collections.Counter()
    ccnt = collections.Counter()
    for name, dur in agg.items():
        classes[klass(name)] += dur
        ccnt[klass(name)] += cnt[name]
    print("class totals (whole trace):")
    tot = 0
    for name, dur in classes.most_common(20):
        print(f"  {dur / 1e3:8.2f} ms x{ccnt[name]:4d}  {name}")
        tot += dur
    print(f"  {tot / 1e3:8.2f} ms total traced device time")


if __name__ == "__main__":
    main()
