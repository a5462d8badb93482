"""SimBERT-style sentence encoder (standard BERT) in flax.

Parity target: reference `models/prompt_tts_modified/simbert.py:33-72` —
a HF `AutoModel` BERT whose `pooler_output` (tanh(dense(CLS))) is the style /
content embedding, plus four classification heads used only for style-encoder
pretraining.

Weights convert from the reference `checkpoint_163431` (a torch state dict
under key 'model' with DataParallel 'module.' prefixes, see
`train_am_vocoder_joint.py:214-220`) via `emotivoice_tpu.convert`.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from emotivoice_tpu.config import StyleBertConfig
from emotivoice_tpu.utils.masks import NEG_INF

LN_EPS = 1e-12


class BertSelfAttention(nn.Module):
    cfg: StyleBertConfig

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        c = self.cfg
        h = c.num_heads
        d = c.hidden_size // h
        q = nn.Dense(c.hidden_size, name="query")(x)
        k = nn.Dense(c.hidden_size, name="key")(x)
        v = nn.Dense(c.hidden_size, name="value")(x)
        b, t, _ = x.shape
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, h, d)
        v = v.reshape(b, t, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(d, jnp.float32)
        )
        if attn_mask is not None:
            scores = jnp.where(attn_mask[:, None, None, :], scores, NEG_INF)
        probs = nn.softmax(scores, axis=-1)
        probs = nn.Dropout(c.attention_dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.reshape(b, t, c.hidden_size).astype(x.dtype)


class BertLayer(nn.Module):
    cfg: StyleBertConfig

    @nn.compact
    def __call__(self, x, attn_mask, deterministic=True):
        c = self.cfg
        attn = BertSelfAttention(c, name="attention")(x, attn_mask, deterministic)
        attn = nn.Dense(c.hidden_size, name="attention_output")(attn)
        attn = nn.Dropout(c.hidden_dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, name="attention_ln")(x + attn)

        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output")(h)
        h = nn.Dropout(c.hidden_dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, name="output_ln")(x + h)


class BertModel(nn.Module):
    cfg: StyleBertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, T)
        token_type_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,  # (B, T) 1=valid
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        b, t = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        pos_ids = jnp.arange(t)[None, :]

        x = (
            nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings")(input_ids)
            + nn.Embed(c.max_position_embeddings, c.hidden_size,
                       name="position_embeddings")(pos_ids)
            + nn.Embed(c.type_vocab_size, c.hidden_size,
                       name="token_type_embeddings")(token_type_ids)
        )
        x = nn.LayerNorm(epsilon=LN_EPS, name="embeddings_ln")(x)
        x = nn.Dropout(c.hidden_dropout)(x, deterministic=deterministic)

        mask = attention_mask.astype(bool) if attention_mask is not None else None
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layer_{i}")(x, mask, deterministic)

        pooled = jnp.tanh(nn.Dense(c.hidden_size, name="pooler")(x[:, 0]))
        return {"last_hidden_state": x, "pooler_output": pooled}


class StyleEncoder(nn.Module):
    """BERT + pretraining classification heads (reference simbert.py:33-72)."""

    cfg: StyleBertConfig

    @nn.compact
    def __call__(
        self,
        input_ids,
        token_type_ids=None,
        attention_mask=None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        bert_out = BertModel(c, name="bert")(
            input_ids, token_type_ids, attention_mask, deterministic
        )
        pooled = bert_out["pooler_output"]

        def head(n_labels, name):
            h = nn.Dropout(0.1)(pooled, deterministic=deterministic)
            return nn.Dense(n_labels, name=name)(h)

        return {
            "pooled_output": pooled,
            "pitch_outputs": head(c.pitch_n_labels, "pitch_clf"),
            "speed_outputs": head(c.speed_n_labels, "speed_clf"),
            "energy_outputs": head(c.energy_n_labels, "energy_clf"),
            "emotion_outputs": head(c.emotion_n_labels, "emotion_clf"),
        }
