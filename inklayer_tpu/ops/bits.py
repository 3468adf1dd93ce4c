"""Bit-packing for host<->device boolean mask transfers.

The axon tunnel moves ~1.4MB/s; a (30, 750, 750) bool mask stack is 17MB
(12s).  Packing bits on device before readback (and on host before upload)
cuts transfers 8x; masks are the only bulk payload crossing the boundary in
the steady-state pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pack_bits(masks: jax.Array) -> jax.Array:
    """(..., W) bool -> (..., ceil(W/8)) uint8, bit order matching
    np.packbits (MSB first)."""
    w = masks.shape[-1]
    pad = (8 - w % 8) % 8
    if pad:
        widths = [(0, 0)] * (masks.ndim - 1) + [(0, pad)]
        masks = jnp.pad(masks, widths)
    shaped = masks.reshape(*masks.shape[:-1], -1, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (shaped * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_bits_host(packed: np.ndarray, width: int) -> np.ndarray:
    """(..., ceil(W/8)) uint8 host array -> (..., W) bool."""
    bits = np.unpackbits(packed, axis=-1)
    return bits[..., :width].astype(bool)


def masks_to_host(masks_dev: jax.Array) -> np.ndarray:
    """Device (..., H, W) bool -> host bool via packed transfer."""
    if masks_dev.size == 0:
        return np.zeros(masks_dev.shape, bool)
    w = masks_dev.shape[-1]
    packed = np.asarray(pack_bits(masks_dev))
    return unpack_bits_host(packed, w)


@jax.jit
def _label_map_u8(masks: jax.Array):
    """(N, H, W) bool -> ((H, W) uint8 label map with 0 = background and
    i+1 = mask i, scalar disjoint-ok flag).  For DISJOINT mask stacks this is
    an 8x smaller readback than even the bit-packed planes (1 byte/px vs
    N/8 bytes/px)."""
    n = masks.shape[0]
    idx = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    lab = jnp.max(jnp.where(masks, idx, 0), axis=0)
    ok = (masks.astype(jnp.int32).sum(axis=0) <= 1).all()
    return lab.astype(jnp.uint8), ok


def disjoint_masks_to_host(masks_dev: jax.Array) -> np.ndarray:
    """Device (N, H, W) bool DISJOINT masks -> host bool via a single uint8
    label-map transfer (masks_disjoint / masks_final stages — disjoint by
    construction).  Falls back to the packed-bits path when masks overlap or
    N > 255."""
    n = masks_dev.shape[0]
    if n == 0:
        return np.zeros(masks_dev.shape, bool)
    if n > 255:
        return masks_to_host(masks_dev)
    lab, ok = _label_map_u8(masks_dev)
    if not bool(ok):
        return masks_to_host(masks_dev)
    lab = np.asarray(lab)
    return lab[None, :, :] == np.arange(1, n + 1, dtype=np.uint8)[:, None, None]


def batched_final_readback(stacks, arrays=(), with_labels=False):
    """Read several DISJOINT mask stacks plus extra device arrays in ONE
    tunnel round-trip.

    Each separate np.asarray(device_arr) pays a full ~35ms RTT through the
    axon tunnel; jax.device_get on the combined list batches them.  Returns
    (list of (N, H, W) bool host stacks, list of host extras); with
    with_labels=True additionally returns the per-stack uint8 label maps
    (0 = background, i+1 = stack[i]; None for empty/packed/overlapping
    stacks) so consumers like the LUT colorizer skip re-deriving them."""
    reqs = []
    payload = []
    for stk in stacks:
        n = stk.shape[0]
        if n == 0:
            reqs.append(("empty", stk.shape))
        elif n > 255:
            reqs.append(("packed", stk.shape[-1]))
            payload.append(pack_bits(stk))
        else:
            reqs.append(("label", (n, stk)))
            lab, ok = _label_map_u8(stk)
            payload.extend((lab, ok))
    payload.extend(arrays)
    flat = jax.device_get(payload)
    out, labels, i = [], [], 0
    for kind, meta in reqs:
        if kind == "empty":
            out.append(np.zeros(meta, bool))
            labels.append(None)
        elif kind == "packed":
            out.append(unpack_bits_host(flat[i], meta))
            labels.append(None)
            i += 1
        else:
            n, stk = meta
            lab, ok = flat[i], flat[i + 1]
            i += 2
            if bool(ok):
                out.append(lab[None, :, :] ==
                           np.arange(1, n + 1, dtype=np.uint8)[:, None, None])
                labels.append(lab)
            else:  # overlapping stack (shouldn't happen): packed fallback
                out.append(masks_to_host(stk))
                labels.append(None)
    if with_labels:
        return out, list(flat[i:]), labels
    return out, list(flat[i:])


def masks_to_device(masks_np: np.ndarray) -> jax.Array:
    """Host bool -> device bool via packed upload."""
    if masks_np.size == 0:
        return jnp.zeros(masks_np.shape, bool)
    w = masks_np.shape[-1]
    packed = jnp.asarray(np.packbits(masks_np, axis=-1))
    return _unpack_device(packed, width=w)


@functools.partial(jax.jit, static_argnames=("width",))
def _unpack_device(packed: jax.Array, width: int) -> jax.Array:
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    bits = (packed[..., None] & weights) > 0
    bits = bits.reshape(*packed.shape[:-1], -1)
    return bits[..., :width]
