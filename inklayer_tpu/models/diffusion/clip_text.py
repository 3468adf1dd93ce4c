"""CLIP ViT-L/14 text encoder (SD1.5's conditioning model) + BPE tokenizer.

Encoder: vocab 49408, hidden 768, 12 layers / 12 heads, quick-GELU, causal
attention, final LayerNorm; SD uses the last hidden state (77 tokens).

Tokenizer: full byte-level BPE; loads vocab.json/merges.txt when provided
(paths to the public openai/clip-vit-large-patch14 files) for exact ids.
Without them it falls back to deterministic hashed ids — fine for random
weights, NOT for converted checkpoints (pass the files then).
"""

from __future__ import annotations

import functools
import gzip
import json
import os
import re
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.nn.layers import LayerNorm
from inklayer_tpu.ops.attention import sdpa


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    act: str = "quick_gelu"  # CLIP-L: quick_gelu; OpenCLIP bigG (SDXL): gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        b, n, _ = x.shape
        hd = self.hidden // self.heads
        y = LayerNorm(eps=1e-5, dtype=self.dtype, name="layer_norm1")(x)

        def heads(z):
            return z.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(y))
        k = heads(nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(y))
        v = heads(nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(y))
        attn = sdpa(q, k, v, mask=causal_mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, self.hidden)
        attn = nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(attn)
        x = x + attn
        y = LayerNorm(eps=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        y = nn.Dense(self.hidden * 4, dtype=self.dtype, name="fc1")(y)
        if self.act == "quick_gelu":
            y = quick_gelu(y)
        else:
            from inklayer_tpu.nn.layers import gelu_exact
            y = gelu_exact(y)
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(y)
        return x + y


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 77
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        """(B, 77) int32 -> (B, 77, hidden) last hidden state."""
        b, n = input_ids.shape
        x = nn.Embed(self.vocab_size, self.hidden, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (self.max_len, self.hidden))
        x = x + pos[None, :n].astype(self.dtype)
        causal = jnp.tril(jnp.ones((n, n), bool))[None, None]
        for i in range(self.layers):
            x = CLIPTextLayer(self.hidden, self.heads, dtype=self.dtype,
                              name=f"layers_{i}")(x, causal)
        return LayerNorm(eps=1e-5, dtype=self.dtype, name="final_layer_norm")(x)


# ---------------------------------------------------------------------------
# BPE tokenizer
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


_PAT = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|"
    r"[\p{N}]|[^\s\p{L}\p{N}]+"
    if False else
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|"
    r"[0-9]|[^\sa-zA-Z0-9]+",
    re.IGNORECASE,
)


class CLIPTokenizer:
    BOS = 49406
    EOS = 49407

    def __init__(self, vocab_path: Optional[str] = None,
                 merges_path: Optional[str] = None):
        self.byte_encoder = _bytes_to_unicode()
        self.vocab = None
        self.bpe_ranks = {}
        self.bos = self.BOS
        self.eos = self.EOS
        if vocab_path and os.path.exists(vocab_path):
            with open(vocab_path, encoding="utf-8") as f:
                self.vocab = json.load(f)
            self.bos = self.vocab.get("<|startoftext|>", self.BOS)
            self.eos = self.vocab.get("<|endoftext|>", self.EOS)
        if merges_path and os.path.exists(merges_path):
            with open(merges_path, encoding="utf-8") as f:
                merges = f.read().split("\n")
            merges = [m for m in merges if m and not m.startswith("#")]
            self.bpe_ranks = {tuple(m.split()): i for i, m in enumerate(merges)}
        self._cache = {}
        self._warned_fallback = False

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = list(token[:-1]) + [token[-1] + "</w>"]
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            first, second = best
            merged = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = merged
        self._cache[token] = word
        return word

    def encode(self, text: str, max_len: int = 77) -> np.ndarray:
        if self.vocab is None and text and not self._warned_fallback:
            self._warned_fallback = True
            import sys

            # stderr: bench.py's stdout must stay a single JSON line
            print("[tokenizer] WARNING: no CLIP vocab.json/merges.txt "
                  "provided — prompt ids are deterministic hashes, NOT real "
                  "CLIP ids (fine for placeholder weights only).  Fetch them "
                  "with scripts/download_checkpoints.sh.", file=sys.stderr)
        text = re.sub(r"\s+", " ", text.lower().strip())
        ids: List[int] = []
        for tok in _PAT.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(tok):
                if self.vocab is not None:
                    ids.append(self.vocab.get(piece, 0))
                else:
                    # deterministic placeholder id (no vocab file present);
                    # crc32 is stable across processes (str hash is seeded)
                    import zlib

                    ids.append(zlib.crc32(piece.encode()) % 49000 + 300)
        ids = [self.bos] + ids[: max_len - 2] + [self.eos]
        # CLIP pads with EOS
        ids = ids + [self.eos] * (max_len - len(ids))
        return np.asarray([ids], np.int32)
