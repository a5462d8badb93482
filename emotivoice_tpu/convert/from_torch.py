"""Reference PyTorch checkpoint -> emotivoice_tpu param pytree conversion.

Checkpoint layouts handled (see SURVEY.md §5 / reference
`train_am_vocoder_joint.py:255-276,444-452`, `predict.py:30-55`):
  - ``g_{step:08d}``: {"generator": state_dict} — JETSGenerator (keys ``am.*``
    for PromptTTS, ``generator.*`` for HiFi-GAN G)
  - ``do_{step:08d}``: {"discriminator": state_dict, "optim_g", "optim_d",
    "steps", "epoch"}
  - ``checkpoint_163431``: {"model": state_dict} with DataParallel
    ``module.`` prefixes — StyleEncoder (SimBERT)

Torch tensors are converted to numpy; torch itself is only needed for
deserialization (`torch.load(map_location='cpu')`). Weight-norm tensors are
kept as (g, v) pairs matching our explicit parametrization; use
``fold_weight_norm=True`` to bake W = g * v/||v|| for inference-only params
(the analogue of the reference's `remove_weight_norm`).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu", weights_only=True)


def strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove DataParallel 'module.' prefixes (reference
    train_am_vocoder_joint.py:216-219)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _set(tree: Dict[str, Any], path: str, value: np.ndarray):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _dense(tree, prefix, sd, key):
    _set(tree, f"{prefix}/kernel", _np(sd[f"{key}.weight"]).T)
    if f"{key}.bias" in sd:
        _set(tree, f"{prefix}/bias", _np(sd[f"{key}.bias"]))


def _conv1d(tree, prefix, sd, key):
    """torch Conv1d (Co, Ci, K) -> flax nn.Conv kernel (K, Ci, Co)."""
    _set(tree, f"{prefix}/kernel", _np(sd[f"{key}.weight"]).transpose(2, 1, 0))
    if f"{key}.bias" in sd:
        _set(tree, f"{prefix}/bias", _np(sd[f"{key}.bias"]))


def _ln(tree, prefix, sd, key):
    _set(tree, f"{prefix}/scale", _np(sd[f"{key}.weight"]))
    _set(tree, f"{prefix}/bias", _np(sd[f"{key}.bias"]))


def _emb(tree, prefix, sd, key):
    _set(tree, f"{prefix}/embedding", _np(sd[f"{key}.weight"]))


def _wn(sd: Mapping[str, Any], key: str):
    """Return (g, v) for a weight-normed torch conv under either naming:
    new parametrize (`parametrizations.weight.original0/1`) or legacy
    (`weight_g`/`weight_v`)."""
    new_g = f"{key}.parametrizations.weight.original0"
    if new_g in sd:
        return _np(sd[new_g]), _np(sd[f"{key}.parametrizations.weight.original1"])
    if f"{key}.weight_g" in sd:
        return _np(sd[f"{key}.weight_g"]), _np(sd[f"{key}.weight_v"])
    # Plain (already folded) weight.
    w = _np(sd[f"{key}.weight"])
    return None, w


def _wn_conv(tree, prefix, sd, key, fold=False):
    g, v = _wn(sd, key)
    b = _np(sd[f"{key}.bias"])
    if g is None or fold:
        if g is not None:
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
            v = g * v / np.maximum(norm, 1e-12)
        _set(tree, f"{prefix}/v", v)
        _set(tree, f"{prefix}/b", b)
    else:
        _set(tree, f"{prefix}/v", v)
        _set(tree, f"{prefix}/g", g)
        _set(tree, f"{prefix}/b", b)


# ---------------------------------------------------------------------------
# Transformer encoder (reference modules/encoder.py) -> models.transformer
# ---------------------------------------------------------------------------

def convert_encoder(sd: Mapping[str, Any], prefix: str, n_layers: int) -> Dict:
    """prefix e.g. 'encoder' for keys like 'encoder.encoders.0...'; '' for a
    bare Encoder state dict."""
    p = f"{prefix}." if prefix else ""
    tree: Dict[str, Any] = {}
    _set(tree, "pos_enc/alpha", _np(sd[f"{p}embed.0.alpha"]))
    for i in range(n_layers):
        base = f"{p}encoders.{i}"
        lp = f"layer_{i}"
        for name in ("linear_q", "linear_k", "linear_v", "linear_out"):
            _dense(tree, f"{lp}/self_attn/{name}", sd, f"{base}.self_attn.{name}")
        _conv1d(tree, f"{lp}/feed_forward/w_1/conv", sd, f"{base}.feed_forward.w_1")
        _conv1d(tree, f"{lp}/feed_forward/w_2/conv", sd, f"{base}.feed_forward.w_2")
        _ln(tree, f"{lp}/norm1", sd, f"{base}.norm1")
        _ln(tree, f"{lp}/norm2", sd, f"{base}.norm2")
    _ln(tree, "after_norm", sd, f"{p}after_norm")
    return tree


def _predictor(tree, prefix, sd, key, n_layers):
    k = f"{key}." if key else ""
    for i in range(n_layers):
        _conv1d(tree, f"{prefix}/conv/conv_{i}/conv", sd, f"{k}conv.{i}.0")
        _ln(tree, f"{prefix}/conv/ln_{i}", sd, f"{k}conv.{i}.2")
    _dense(tree, f"{prefix}/linear", sd, f"{k}linear")


def convert_prompt_tts(
    sd: Mapping[str, Any],
    prefix: str = "am.",
    enc_layers: int = 4,
    dec_layers: int = 4,
    dur_layers: int = 2,
    pitch_layers: int = 3,
    energy_layers: int = 2,
) -> Dict:
    """PromptTTS state dict (reference model_open_source.py) -> our params."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tree: Dict[str, Any] = {}
    _emb(tree, "src_word_emb", sd, "src_word_emb")
    _emb(tree, "spk_tokenizer", sd, "spk_tokenizer")
    _dense(tree, "embed_projection1", sd, "embed_projection1")
    tree["encoder"] = convert_encoder(sd, "encoder", enc_layers)
    tree["decoder"] = convert_encoder(sd, "decoder", dec_layers)
    _predictor(tree, "duration_predictor", sd, "duration_predictor", dur_layers)
    _predictor(tree, "pitch_predictor", sd, "pitch_predictor", pitch_layers)
    _predictor(tree, "energy_predictor", sd, "energy_predictor", energy_layers)
    _conv1d(tree, "pitch_embed/conv/conv", sd, "pitch_embed.0")
    _conv1d(tree, "energy_embed/conv/conv", sd, "energy_embed.0")
    for name in ("t_conv1", "t_conv2", "f_conv1", "f_conv2", "f_conv3"):
        _conv1d(tree, f"alignment_module/{name}/conv", sd, f"alignment_module.{name}")
    _dense(tree, "to_mel", sd, "to_mel")
    return tree


# ---------------------------------------------------------------------------
# HiFi-GAN generator (reference models/hifigan/models.py:90-140)
# ---------------------------------------------------------------------------

def convert_hifigan_generator(
    sd: Mapping[str, Any],
    prefix: str = "generator.",
    n_ups: int = 4,
    n_resblocks: int = 12,
    resblock_type: str = "1",
    fold: bool = False,
) -> Dict:
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    tree: Dict[str, Any] = {}
    _wn_conv(tree, "conv_pre", sd, "conv_pre", fold)
    _wn_conv(tree, "conv_post", sd, "conv_post", fold)
    for i in range(n_ups):
        _wn_conv(tree, f"ups_{i}", sd, f"ups.{i}", fold)
    for i in range(n_resblocks):
        if resblock_type == "1":
            for j in range(3):
                _wn_conv(tree, f"resblocks_{i}/convs1_{j}", sd,
                         f"resblocks.{i}.convs1.{j}", fold)
                _wn_conv(tree, f"resblocks_{i}/convs2_{j}", sd,
                         f"resblocks.{i}.convs2.{j}", fold)
        else:
            for j in range(2):
                _wn_conv(tree, f"resblocks_{i}/convs_{j}", sd,
                         f"resblocks.{i}.convs.{j}", fold)
    return tree


def convert_jets_generator(ckpt: Mapping[str, Any], cfg, fold: bool = False) -> Dict:
    """Full g_XXXXXXXX checkpoint -> {'am': ..., 'generator': ...} params."""
    sd = ckpt["generator"] if "generator" in ckpt else ckpt
    sd = strip_module_prefix(sd)
    n_res = len(cfg.vocoder.upsample_rates) * len(cfg.vocoder.resblock_kernel_sizes)
    return {
        "am": convert_prompt_tts(
            sd,
            "am.",
            cfg.am.encoder_n_layers,
            cfg.am.decoder_n_layers,
            cfg.am.duration_n_layers,
            cfg.am.variance_n_layers,
            cfg.am.energy_n_layers,
        ),
        "generator": convert_hifigan_generator(
            sd, "generator.", len(cfg.vocoder.upsample_rates), n_res,
            cfg.vocoder.resblock, fold,
        ),
    }


# ---------------------------------------------------------------------------
# Discriminator (reference models/hifigan/models.py:143-277)
# ---------------------------------------------------------------------------

_MPD_PERIODS = (2, 3, 5, 7, 11)


def convert_discriminator(ckpt: Mapping[str, Any]) -> Dict:
    sd = ckpt["discriminator"] if "discriminator" in ckpt else ckpt
    sd = strip_module_prefix(sd)
    tree: Dict[str, Any] = {}
    spectral: Dict[str, Any] = {}
    for pi, p in enumerate(_MPD_PERIODS):
        base = f"mpd.discriminators.{pi}"
        for i in range(5):
            _wn_conv(tree, f"mpd_{p}/convs_{i}", sd, f"{base}.convs.{i}")
        _wn_conv(tree, f"mpd_{p}/conv_post", sd, f"{base}.conv_post")
    for si in range(3):
        base = f"msd.discriminators.{si}"
        for i in range(7):
            key = f"{base}.convs.{i}"
            if si == 0:  # spectral norm
                _set(tree, f"msd_{si}/convs_{i}/w", _np(sd[f"{key}.weight_orig"])
                     if f"{key}.weight_orig" in sd else _np(sd[f"{key}.weight"]))
                _set(tree, f"msd_{si}/convs_{i}/b", _np(sd[f"{key}.bias"]))
                if f"{key}.weight_u" in sd:
                    _set(spectral, f"msd_{si}/convs_{i}/u", _np(sd[f"{key}.weight_u"]))
                if f"{key}.weight_v" in sd:
                    _set(spectral, f"msd_{si}/convs_{i}/v", _np(sd[f"{key}.weight_v"]))
            else:
                _wn_conv(tree, f"msd_{si}/convs_{i}", sd, key)
        key = f"{base}.conv_post"
        if si == 0:
            _set(tree, f"msd_{si}/conv_post/w", _np(sd[f"{key}.weight_orig"])
                 if f"{key}.weight_orig" in sd else _np(sd[f"{key}.weight"]))
            _set(tree, f"msd_{si}/conv_post/b", _np(sd[f"{key}.bias"]))
            if f"{key}.weight_u" in sd:
                _set(spectral, f"msd_{si}/conv_post/u", _np(sd[f"{key}.weight_u"]))
            if f"{key}.weight_v" in sd:
                _set(spectral, f"msd_{si}/conv_post/v", _np(sd[f"{key}.weight_v"]))
        else:
            _wn_conv(tree, f"msd_{si}/conv_post", sd, key)
    return {"params": tree, "spectral": spectral}


# ---------------------------------------------------------------------------
# StyleEncoder / SimBERT (reference simbert.py; HF BERT state dict)
# ---------------------------------------------------------------------------

def convert_bert(sd: Mapping[str, Any], prefix: str, n_layers: int) -> Dict:
    tree: Dict[str, Any] = {}
    e = f"{prefix}embeddings"
    _emb(tree, "word_embeddings", sd, f"{e}.word_embeddings")
    _emb(tree, "position_embeddings", sd, f"{e}.position_embeddings")
    _emb(tree, "token_type_embeddings", sd, f"{e}.token_type_embeddings")
    _ln(tree, "embeddings_ln", sd, f"{e}.LayerNorm")
    for i in range(n_layers):
        base = f"{prefix}encoder.layer.{i}"
        lp = f"layer_{i}"
        for name in ("query", "key", "value"):
            _dense(tree, f"{lp}/attention/{name}", sd, f"{base}.attention.self.{name}")
        _dense(tree, f"{lp}/attention_output", sd, f"{base}.attention.output.dense")
        _ln(tree, f"{lp}/attention_ln", sd, f"{base}.attention.output.LayerNorm")
        _dense(tree, f"{lp}/intermediate", sd, f"{base}.intermediate.dense")
        _dense(tree, f"{lp}/output", sd, f"{base}.output.dense")
        _ln(tree, f"{lp}/output_ln", sd, f"{base}.output.LayerNorm")
    _dense(tree, "pooler", sd, f"{prefix}pooler.dense")
    return tree


def convert_style_encoder(ckpt: Mapping[str, Any], n_layers: int = 12) -> Dict:
    sd = ckpt["model"] if "model" in ckpt else ckpt
    sd = strip_module_prefix(sd)
    tree: Dict[str, Any] = {"bert": convert_bert(sd, "bert.", n_layers)}
    for head in ("pitch_clf", "speed_clf", "energy_clf", "emotion_clf"):
        if f"{head}.classifier.weight" in sd:
            _dense(tree, head, sd, f"{head}.classifier")
    return tree


def grow_speaker_embedding(params: Dict, n_new: int, seed: int = 0) -> Dict:
    """Append random rows to the speaker embedding for voice cloning —
    the reference's `prepare_for_training.py:91-97` surgery."""
    emb = params["am"]["spk_tokenizer"]["embedding"]
    rng = np.random.RandomState(seed)
    new_rows = rng.randn(n_new, emb.shape[1]).astype(emb.dtype)
    params = dict(params)
    params["am"] = dict(params["am"])
    params["am"]["spk_tokenizer"] = {
        "embedding": np.concatenate([np.asarray(emb), new_rows], axis=0)
    }
    return params
