"""Style/content embedding service: text -> SimBERT pooler vector.

Counterpart of the reference's `get_style_embedding`
(`inference_am_vocoder_joint.py:27-37`): HF tokenizer -> BERT ->
pooler_output. The tokenizer stays on host (pure Python); the BERT forward
is a jitted flax model, batched over prompt strings.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Optional

import numpy as np

from emotivoice_tpu.config import StyleBertConfig
from emotivoice_tpu.models.bert import StyleEncoder


class StyleEmbedder:
    def __init__(
        self,
        params,
        cfg: StyleBertConfig,
        tokenizer=None,
        max_len: int = 64,
    ):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self.model = StyleEncoder(cfg)

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path: str,
        cfg: StyleBertConfig,
        tokenizer_path: Optional[str] = None,
    ) -> "StyleEmbedder":
        from emotivoice_tpu.convert.from_torch import (
            convert_style_encoder,
            load_torch_checkpoint,
        )

        params = convert_style_encoder(
            load_torch_checkpoint(ckpt_path), cfg.num_layers
        )
        tokenizer = None
        if tokenizer_path:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        return cls({"params": params}, cfg, tokenizer)

    @functools.cached_property
    def _jitted(self):
        import jax

        def fn(params, ids, type_ids, mask):
            out = self.model.apply(params, ids, type_ids, mask)
            return out["pooled_output"]

        return jax.jit(fn)

    def _tokenize(self, texts: List[str]):
        assert self.tokenizer is not None, (
            "StyleEmbedder needs a tokenizer (pass tokenizer_path pointing at "
            "the simbert vocab) for raw-text input"
        )
        enc = self.tokenizer(
            texts,
            padding="max_length",
            truncation=True,
            max_length=self.max_len,
            return_tensors="np",
        )
        return (
            enc["input_ids"].astype(np.int32),
            enc.get(
                "token_type_ids", np.zeros_like(enc["input_ids"])
            ).astype(np.int32),
            enc["attention_mask"].astype(np.int32),
        )

    def embed_batch(self, texts: List[str]) -> np.ndarray:
        ids, type_ids, mask = self._tokenize(texts)
        return np.asarray(self._jitted(self.params, ids, type_ids, mask))

    def embed(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]
