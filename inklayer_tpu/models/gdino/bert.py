"""BERT-base text encoder with GroundingDINO's sub-sentence masking.

Parity targets: HF BertModel as re-plumbed by GroundingDINO's
``bertwarper.py:17-167`` (custom position_ids + block-diagonal attention
mask) and ``generate_masks_with_special_tokens_and_transfer_map``
(:224-273): the caption is split at [CLS]/[SEP]/./? into independent spans;
each span attends only within itself and to the special tokens, and position
ids restart from 0 inside each span.

Implemented from scratch in flax (no HF dependency at runtime); the mask /
position-id bookkeeping is host-side numpy over the tokenised caption
(captions are host strings; the pipeline's caption is the constant "object").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from inklayer_tpu.config import BertConfig
from inklayer_tpu.nn.layers import LayerNorm
from inklayer_tpu.ops.attention import sdpa


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):
        """attn_mask: (B, 1, N, N) bool, True = attend."""
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        b, n, _ = x.shape

        def heads(y):
            return y.reshape(b, n, c.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x))
        k = heads(nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(x))
        v = heads(nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(x))
        out = sdpa(q, k, v, mask=attn_mask)
        return out.transpose(0, 2, 1, 3).reshape(b, n, c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask):
        c = self.cfg
        attn = BertSelfAttention(c, dtype=self.dtype, name="attention_self")(x, attn_mask)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="attention_output_dense")(attn)
        x = LayerNorm(eps=c.layer_norm_eps, dtype=self.dtype,
                      name="attention_output_norm")(x + attn)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="output_dense")(h)
        return LayerNorm(eps=c.layer_norm_eps, dtype=self.dtype,
                         name="output_norm")(x + h)


class BertEncoder(nn.Module):
    cfg: BertConfig = BertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attn_mask, position_ids, token_type_ids=None):
        """input_ids: (B, N) int32; attn_mask: (B, N, N) bool;
        position_ids: (B, N) int32.  Returns last hidden state (B, N, H)."""
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       dtype=self.dtype, name="position_embeddings")(position_ids)
        typ = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = LayerNorm(eps=c.layer_norm_eps, dtype=self.dtype,
                      name="embeddings_norm")(word + pos + typ)
        mask4 = attn_mask[:, None]  # (B,1,N,N)
        for i in range(c.num_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, mask4)
        return x


# ---------------------------------------------------------------------------
# Sub-sentence mask bookkeeping (host-side)
# ---------------------------------------------------------------------------

# bert-base-uncased ids of GroundingDINO's special/split tokens
# (bertwarper.py:224: specical_tokens = [CLS], [SEP], '.', '?')
CLS_ID, SEP_ID, PAD_ID, DOT_ID, QMARK_ID = 101, 102, 0, 1012, 1029
SPLIT_IDS = (CLS_ID, SEP_ID, DOT_ID, QMARK_ID)


def subsentence_masks(input_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(B, N) token ids -> (attention_mask (B, N, N) bool,
    position_ids (B, N) int).

    Semantics of generate_masks_with_special_tokens_and_transfer_map:
    special tokens attend only to themselves (identity); tokens strictly
    between consecutive special tokens form a block that self-attends
    (including the previous special token); position ids restart at 0 for
    each span.
    """
    b, n = input_ids.shape
    special = np.isin(input_ids, SPLIT_IDS)
    attn = np.tile(np.eye(n, dtype=bool), (b, 1, 1))
    pos = np.zeros((b, n), np.int64)
    for bi in range(b):
        prev = 0
        for col in np.nonzero(special[bi])[0]:
            if col in (0, n - 1):
                attn[bi, col, col] = True
                pos[bi, col] = 0
            else:
                attn[bi, prev + 1: col + 1, prev + 1: col + 1] = True
                pos[bi, prev + 1: col + 1] = np.arange(0, col - prev)
            prev = int(col)
    return attn, pos


def text_token_mask(input_ids: np.ndarray) -> np.ndarray:
    """(B, N) bool — True for real (non-pad) tokens."""
    return input_ids != PAD_ID
