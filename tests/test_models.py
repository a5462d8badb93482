"""Model-library tests: conv parity vs torch, module shapes, end-to-end JETS."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from emotivoice_tpu.config import tiny_test_config
from emotivoice_tpu.models.hifigan import (
    Discriminator,
    HiFiGANGenerator,
    WNConv1d,
    WNConvTranspose1d,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from emotivoice_tpu.models.acoustic import PromptTTS
from emotivoice_tpu.models.bert import StyleEncoder
from emotivoice_tpu.models.jets import JETSGenerator
from emotivoice_tpu.models.transformer import TransformerEncoder

torch = pytest.importorskip("torch")


def _set_wn_params(params, torch_mod, transposed=False):
    """Copy torch weight-norm (g, v) into our param dict layout."""
    g = torch_mod.parametrizations.weight.original0.detach().numpy()
    v = torch_mod.parametrizations.weight.original1.detach().numpy()
    b = torch_mod.bias.detach().numpy()
    return {"v": jnp.asarray(v), "g": jnp.asarray(g), "b": jnp.asarray(b)}


class TestConvParity:
    def test_wnconv1d_matches_torch(self):
        torch.manual_seed(0)
        for groups, dilation, stride in [(1, 1, 1), (1, 3, 1), (4, 1, 2)]:
            ci, co, k = 8, 16, 5
            tconv = torch.nn.utils.parametrizations.weight_norm(
                torch.nn.Conv1d(ci, co, k, stride=stride, dilation=dilation,
                                groups=groups, padding=(k - 1) // 2 * dilation)
            )
            x = torch.randn(2, ci, 32)
            ref = tconv(x).detach().numpy()

            mod = WNConv1d(ci, co, k, stride=stride, dilation=dilation, groups=groups)
            params = mod.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, ci)))
            params = {"params": _set_wn_params(None, tconv)}
            ours = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 2, 1), ref, atol=2e-5
            )

    def test_wnconvtranspose1d_matches_torch(self):
        torch.manual_seed(1)
        for u, k in [(8, 16), (2, 4)]:
            ci, co = 6, 4
            tconv = torch.nn.utils.parametrizations.weight_norm(
                torch.nn.ConvTranspose1d(ci, co, k, stride=u, padding=(k - u) // 2)
            )
            x = torch.randn(2, ci, 10)
            ref = tconv(x).detach().numpy()

            mod = WNConvTranspose1d(ci, co, k, stride=u, padding=(k - u) // 2)
            params = {"params": _set_wn_params(None, tconv)}
            ours = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
            assert ours.shape[1] == 10 * u
            np.testing.assert_allclose(
                np.asarray(ours).transpose(0, 2, 1), ref, atol=2e-5
            )


class TestHiFiGAN:
    def test_generator_upsamples_256x(self):
        cfg = tiny_test_config()
        gen = HiFiGANGenerator(cfg.vocoder)
        mel = jnp.zeros((2, 13, cfg.vocoder.initial_channel))
        params = gen.init(jax.random.PRNGKey(0), mel)
        wav = gen.apply(params, mel)
        assert wav.shape == (2, 13 * 256)
        assert np.abs(np.asarray(wav)).max() <= 1.0

    def test_discriminator_shapes_and_losses(self):
        cfg = tiny_test_config()
        disc = Discriminator()
        t = cfg.train.segment_size * 256
        y = jnp.asarray(np.random.RandomState(0).randn(2, t).astype(np.float32)) * 0.1
        yh = y * 0.5
        variables = disc.init(jax.random.PRNGKey(0), y, yh)
        (ro, fo, rf, ff), new_vars = disc.apply(
            variables, y, yh, update_stats=True, mutable=["spectral"]
        )
        assert len(ro) == 8 and len(fo) == 8  # 5 MPD + 3 MSD
        d_loss = discriminator_loss(ro, fo)
        g_loss = generator_loss(fo)
        fm = feature_loss(rf, ff)
        for val in (d_loss, g_loss, fm):
            assert np.isfinite(float(val))
        # spectral-norm u stats updated
        flat_old = jax.tree_util.tree_leaves(variables["spectral"])
        flat_new = jax.tree_util.tree_leaves(new_vars["spectral"])
        assert any(
            not np.allclose(a, b) for a, b in zip(flat_old, flat_new)
        )


class TestTransformer:
    def test_attention_ignores_padded_keys(self):
        """Masked attention must not attend to padded key positions.

        (Full-encoder invariance does not hold — the conv-FFN's receptive
        field legitimately sees the padding boundary, exactly like the
        reference's MultiLayeredConv1d.)
        """
        from emotivoice_tpu.models.transformer import MultiHeadedAttention

        attn = MultiHeadedAttention(n_heads=2, d_model=16)
        x = np.random.RandomState(0).randn(1, 10, 16).astype(np.float32)
        params = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), None)
        valid = jnp.asarray(np.arange(10)[None] < 6)
        out1 = attn.apply(params, jnp.asarray(x), valid)
        x2 = x.copy()
        x2[:, 6:] = 99.0  # corrupt padded positions
        out2 = attn.apply(params, jnp.asarray(x2), valid)
        np.testing.assert_allclose(
            np.asarray(out1)[:, :6], np.asarray(out2)[:, :6], atol=2e-5
        )


class TestPromptTTS:
    def _inputs(self, cfg, b=2, t=11):
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t)))
        text_lens = jnp.asarray([t, t - 4])
        speaker = jnp.asarray([1, 2])
        style = jnp.asarray(rng.randn(b, cfg.am.bert_embedding).astype(np.float32))
        content = jnp.asarray(rng.randn(b, cfg.am.bert_embedding).astype(np.float32))
        return tokens, text_lens, speaker, style, content

    def test_inference_branch(self):
        cfg = tiny_test_config()
        model = PromptTTS(cfg.am)
        tokens, text_lens, speaker, style, content = self._inputs(cfg)
        params = model.init(
            jax.random.PRNGKey(0), tokens, text_lens, speaker, style, content,
            max_frames=40,
        )
        out = model.apply(
            params, tokens, text_lens, speaker, style, content, max_frames=40
        )
        assert out["dec_outputs"].shape == (2, 40, cfg.am.n_mels)
        assert out["durations"].shape == tokens.shape
        ml = np.asarray(out["output_lengths"])
        assert (ml >= 1).all() and (ml <= 40).all()
        # mel beyond each utterance's length is zeroed
        mel = np.asarray(out["dec_outputs"])
        for i in range(2):
            assert np.allclose(mel[i, ml[i]:], 0.0)

    def test_training_branch(self):
        cfg = tiny_test_config()
        model = PromptTTS(cfg.am)
        tokens, text_lens, speaker, style, content = self._inputs(cfg)
        rng = np.random.RandomState(1)
        t_feats = 30
        mel_t = jnp.asarray(rng.randn(2, t_feats, cfg.am.n_mels).astype(np.float32))
        feats_lens = jnp.asarray([30, 18])
        pitch = jnp.asarray(rng.randn(2, t_feats).astype(np.float32))
        energy = jnp.asarray(rng.randn(2, t_feats).astype(np.float32))
        params = model.init(
            jax.random.PRNGKey(0), tokens, text_lens, speaker, style, content,
            mel_targets=mel_t, feats_lengths=feats_lens,
            pitch_targets=pitch, energy_targets=energy,
        )
        out = model.apply(
            params, tokens, text_lens, speaker, style, content,
            mel_targets=mel_t, feats_lengths=feats_lens,
            pitch_targets=pitch, energy_targets=energy,
        )
        assert out["dec_outputs"].shape == (2, t_feats, cfg.am.n_mels)
        ds = np.asarray(out["duration_targets"])
        np.testing.assert_array_equal(ds.sum(1), np.asarray(feats_lens))
        assert np.isfinite(float(out["bin_loss"]))
        assert out["pitch_targets"].shape == tokens.shape


class TestJETS:
    def test_end_to_end_inference(self):
        cfg = tiny_test_config()
        model = JETSGenerator(cfg)
        rng = np.random.RandomState(0)
        tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (1, 7)))
        args = (
            tokens,
            jnp.asarray([7]),
            jnp.asarray([0]),
            jnp.asarray(rng.randn(1, cfg.am.bert_embedding).astype(np.float32)),
            jnp.asarray(rng.randn(1, cfg.am.bert_embedding).astype(np.float32)),
        )
        params = model.init(jax.random.PRNGKey(0), *args, max_frames=24)
        out = model.apply(params, *args, max_frames=24)
        assert out["wav_predictions"].shape == (1, 24 * 256)

    def test_training_with_segments(self):
        cfg = tiny_test_config()
        model = JETSGenerator(cfg)
        rng = np.random.RandomState(0)
        b, t, t_feats = 2, 9, 24
        tokens = jnp.asarray(rng.randint(0, cfg.am.n_vocab, (b, t)))
        kwargs = dict(
            mel_targets=jnp.asarray(
                rng.randn(b, t_feats, cfg.am.n_mels).astype(np.float32)
            ),
            feats_lengths=jnp.asarray([24, 16]),
            pitch_targets=jnp.asarray(rng.randn(b, t_feats).astype(np.float32)),
            energy_targets=jnp.asarray(rng.randn(b, t_feats).astype(np.float32)),
            segment_rng=jax.random.PRNGKey(7),
        )
        args = (
            tokens,
            jnp.asarray([9, 5]),
            jnp.asarray([0, 1]),
            jnp.asarray(rng.randn(b, cfg.am.bert_embedding).astype(np.float32)),
            jnp.asarray(rng.randn(b, cfg.am.bert_embedding).astype(np.float32)),
        )
        params = model.init(jax.random.PRNGKey(0), *args, **kwargs)
        out = model.apply(params, *args, **kwargs)
        seg = cfg.train.segment_size
        assert out["wav_predictions"].shape == (b, seg * 256)
        assert out["z_start_idxs"].shape == (b,)


class TestStyleEncoder:
    def test_forward(self):
        cfg = tiny_test_config()
        enc = StyleEncoder(cfg.bert)
        ids = jnp.asarray(np.random.RandomState(0).randint(0, cfg.bert.vocab_size, (2, 9)))
        mask = jnp.ones((2, 9), jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids, attention_mask=mask)
        out = enc.apply(params, ids, attention_mask=mask)
        assert out["pooled_output"].shape == (2, cfg.bert.hidden_size)
        assert out["emotion_outputs"].shape == (2, cfg.bert.emotion_n_labels)


class TestCheckpointRoundtrip:
    def test_orbax_save_restore(self, tmp_path):
        import jax

        from emotivoice_tpu.config import tiny_test_config
        from emotivoice_tpu.training.loop import CheckpointManager
        from emotivoice_tpu.training.step import init_train_state

        cfg = tiny_test_config()
        up = cfg.vocoder.upsample_factor
        b, t_text, t_feats = 2, 8, 16
        rng = np.random.RandomState(0)
        batch = {
            "tokens": np.zeros((b, t_text), np.int32),
            "text_lengths": np.full((b,), t_text, np.int32),
            "speaker": np.zeros((b,), np.int32),
            "style_embedding": rng.randn(b, cfg.am.bert_embedding).astype(np.float32),
            "content_embedding": rng.randn(b, cfg.am.bert_embedding).astype(np.float32),
            "mel": rng.randn(b, t_feats, cfg.am.n_mels).astype(np.float32),
            "mel_lengths": np.full((b,), t_feats, np.int32),
            "pitch": rng.randn(b, t_feats).astype(np.float32),
            "energy": rng.randn(b, t_feats).astype(np.float32),
            "wav": (0.1 * rng.randn(b, t_feats * up)).astype(np.float32),
        }
        state, model, disc = init_train_state(cfg, jax.random.PRNGKey(0), batch)
        state = state.replace(step=state.step + 7)

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(7, state)
        assert mgr.latest_step() == 7

        template, _, _ = init_train_state(cfg, jax.random.PRNGKey(1), batch)
        restored = mgr.restore(template)
        assert int(restored.step) == 7
        leaves_a = jax.tree_util.tree_leaves(state.g_params)
        leaves_b = jax.tree_util.tree_leaves(restored.g_params)
        for a, b_ in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


class TestBF16TrainStep:
    def test_bf16_step_runs_finite_with_f32_masters(self):
        """compute_dtype=bf16 training (training/step.py:init_train_state):
        one GAN step runs, every metric is finite, and the master params /
        optimizer moments stay f32 (mixed-precision contract; measured perf
        in tools/exp_train_attrib.py)."""
        import jax

        from emotivoice_tpu.config import tiny_test_config
        from emotivoice_tpu.training.step import (
            init_train_state, make_train_step,
        )

        cfg = tiny_test_config()
        up = cfg.vocoder.upsample_factor
        b, t_text, t_feats = 2, 8, 16
        rng = np.random.RandomState(0)
        batch = {
            "tokens": np.zeros((b, t_text), np.int32),
            "text_lengths": np.full((b,), t_text, np.int32),
            "speaker": np.zeros((b,), np.int32),
            "style_embedding": rng.randn(b, cfg.am.bert_embedding).astype(np.float32),
            "content_embedding": rng.randn(b, cfg.am.bert_embedding).astype(np.float32),
            "mel": rng.randn(b, t_feats, cfg.am.n_mels).astype(np.float32),
            "mel_lengths": np.full((b,), t_feats, np.int32),
            "pitch": rng.randn(b, t_feats).astype(np.float32),
            "energy": rng.randn(b, t_feats).astype(np.float32),
            "wav": (0.1 * rng.randn(b, t_feats * up)).astype(np.float32),
        }
        state, model, disc = init_train_state(
            cfg, jax.random.PRNGKey(0), batch, compute_dtype=jnp.bfloat16
        )
        step = jax.jit(make_train_step(cfg, model, disc))
        new_state, metrics = step(state, batch)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        for leaf in jax.tree_util.tree_leaves(new_state.g_params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(new_state.opt_g):
            if hasattr(leaf, "dtype") and leaf.ndim > 0:
                assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype


class TestVoiceCloning:
    def test_grow_speaker_embedding(self):
        from emotivoice_tpu.convert.from_torch import grow_speaker_embedding

        emb = np.arange(12, dtype=np.float32).reshape(4, 3)
        params = {"am": {"spk_tokenizer": {"embedding": emb},
                         "other": {"w": np.ones(2)}}}
        grown = grow_speaker_embedding(params, 2, seed=0)
        new = grown["am"]["spk_tokenizer"]["embedding"]
        assert new.shape == (6, 3)
        np.testing.assert_array_equal(new[:4], emb)  # old voices untouched
        assert np.abs(new[4:]).sum() > 0  # new rows initialized
        # original dict not mutated
        assert params["am"]["spk_tokenizer"]["embedding"].shape == (4, 3)
        assert grown["am"]["other"] is params["am"]["other"]


class TestStylePretrainStep:
    def test_one_step_runs_and_improves(self):
        import jax
        import dataclasses

        from emotivoice_tpu.config import StyleBertConfig
        from emotivoice_tpu.models.bert import StyleEncoder
        from emotivoice_tpu.training.style_pretrain import make_pretrain_step

        cfg = StyleBertConfig(
            vocab_size=50, hidden_size=16, num_layers=1, num_heads=2,
            intermediate_size=32, max_position_embeddings=32,
        )
        model = StyleEncoder(cfg)
        rng = np.random.RandomState(0)
        b, t = 4, 10
        batch = {
            "input_ids": rng.randint(0, 50, (b, t)).astype(np.int32),
            "token_type_ids": np.zeros((b, t), np.int32),
            "attention_mask": np.ones((b, t), np.int32),
            "pitch": rng.randint(0, cfg.pitch_n_labels, (b,)).astype(np.int32),
            "speed": rng.randint(0, cfg.speed_n_labels, (b,)).astype(np.int32),
            "energy": rng.randint(0, cfg.energy_n_labels, (b,)).astype(np.int32),
            "emotion": rng.randint(0, cfg.emotion_n_labels, (b,)).astype(np.int32),
        }
        variables = model.init(
            jax.random.PRNGKey(0), batch["input_ids"],
            batch["token_type_ids"], batch["attention_mask"],
        )
        params = variables["params"]
        step, opt = make_pretrain_step(model, learning_rate=1e-3)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(1)
        params, opt_state, key, m0 = step(params, opt_state, key, batch)
        for _ in range(4):
            params, opt_state, key, m = step(params, opt_state, key, batch)
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss"]) < float(m0["loss"])  # memorizes tiny batch


class TestTConvMatmulForm:
    def test_matmul_form_matches_lax_form(self):
        import jax
        import jax.numpy as jnp

        from emotivoice_tpu.models.hifigan import WNConvTranspose1d

        # ci*stride >= 4096 selects the matmul lowering...
        big = WNConvTranspose1d(512, 64, 16, stride=8, padding=4)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 24, 512), jnp.float32
        )
        params = big.init(jax.random.PRNGKey(0), x)
        y_mm = big.apply(params, x)
        # ...force the lax path on the same weights by shrinking the
        # heuristic trigger: same module logic, stride unchanged, but call
        # the internal lax branch via a module whose ci*stride < 4096 is
        # impossible here — instead compute the lax reference directly.
        w = params["params"]["g"] * params["params"]["v"] / jnp.sqrt(
            jnp.sum(params["params"]["v"] ** 2, axis=(1, 2), keepdims=True)
        )
        kernel = jnp.flip(jnp.transpose(w, (2, 0, 1)), axis=0)
        y_lax = jax.lax.conv_general_dilated(
            x, kernel, (1,), [(16 - 1 - 4, 16 - 1 - 4)], lhs_dilation=(8,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32,
        ) + params["params"]["b"]
        assert y_mm.shape == y_lax.shape
        np.testing.assert_allclose(
            np.asarray(y_mm), np.asarray(y_lax), atol=2e-5
        )


class TestPackedConv:
    def test_matches_lax_conv_across_shapes(self):
        """Lane-packed dilated conv (ops/packed_conv.py) is numerically
        exact vs lax.conv at every MRF (K, dilation) and both small-channel
        stage widths, including non-multiple-of-pack lengths."""
        import jax.numpy as jnp

        from emotivoice_tpu.ops.packed_conv import packed_dilated_conv

        rng = np.random.RandomState(0)
        for t, c, pack in ((256, 32, 4), (250, 32, 4), (128, 64, 2)):
            for k, d in ((3, 1), (7, 3), (11, 5), (11, 1)):
                x = jnp.asarray(rng.randn(2, t, c), jnp.float32)
                w = jnp.asarray(0.1 * rng.randn(k, c, c), jnp.float32)
                bias = jnp.asarray(rng.randn(c), jnp.float32)
                pad = (k - 1) // 2 * d
                ref = jax.lax.conv_general_dilated(
                    x, w, (1,), [(pad, pad)], rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                ) + bias
                got = packed_dilated_conv(x, w, d, pack, bias=bias)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), atol=2e-5,
                    err_msg=f"T{t} C{c} K{k} d{d}",
                )


class TestS2DConv:
    def test_matches_lax_conv(self):
        """Space-to-depth conv (ops/s2d_conv.py) is exact vs lax.conv at
        every MRF (K, d) pair and pack factor."""
        import jax.numpy as jnp

        from emotivoice_tpu.ops.s2d_conv import s2d_conv

        rng = np.random.RandomState(0)
        for c, s in ((32, 4), (32, 8), (64, 2)):
            for k, d in ((3, 1), (7, 3), (11, 5), (11, 1)):
                x = jnp.asarray(rng.randn(2, 256, c), jnp.float32)
                w = jnp.asarray(0.1 * rng.randn(k, c, c), jnp.float32)
                pad = (k - 1) // 2 * d
                ref = jax.lax.conv_general_dilated(
                    x, w, (1,), [(pad, pad)], rhs_dilation=(d,),
                    dimension_numbers=("NHC", "HIO", "NHC"),
                )
                got = s2d_conv(x, w, d, s)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(ref), atol=2e-5,
                    err_msg=f"C{c} K{k} d{d} s{s}",
                )

    def test_stage_packed_generator_matches_stock(self):
        """The production default (use_s2d=True: whole MRF stages in packed
        layout, ResBlock1(packed=s)) is numerically identical to the stock
        lowering on the full V1 topology."""
        from emotivoice_tpu.config import EmotiVoiceConfig
        from emotivoice_tpu.models.hifigan import HiFiGANGenerator

        cfg = EmotiVoiceConfig().vocoder
        rng = np.random.RandomState(0)
        mel = jnp.asarray(rng.randn(2, 8, cfg.initial_channel), jnp.float32)
        g_off = HiFiGANGenerator(cfg, use_s2d=False)
        g_on = HiFiGANGenerator(cfg, use_s2d=True)
        params = g_off.init(jax.random.PRNGKey(0), mel)
        a = np.asarray(g_off.apply(params, mel))
        b = np.asarray(g_on.apply(params, mel))
        assert a.shape == b.shape == (2, 8 * 256)
        np.testing.assert_allclose(a, b, atol=2e-5)

    def test_tconv_packed_matches_stock(self):
        """Packed-in/packed-out transposed conv (ops/s2d_conv.py:
        tconv_packed) is exact vs the stock ConvTranspose1d lowering for
        the production (stride, kernel, s_in, s_out) combinations:
        stage3 (u=2 k=4, s_in=1 -> s_out=2) and stage4 (s_in=2 -> s_out=4)
        plus a larger-kernel case."""
        from emotivoice_tpu.models.hifigan import WNConvTranspose1d

        rng = np.random.RandomState(0)
        for ci, co, k, u, s_in, s_out in (
            (128, 64, 4, 2, 1, 2),   # stage3 entry
            (64, 32, 4, 2, 2, 4),    # stage4 entry (consumes stage3 pack)
            (64, 32, 8, 2, 1, 4),    # rho=2: strided packed conv
        ):
            t = 64
            tc = WNConvTranspose1d(ci, co, k, stride=u, padding=(k - u) // 2)
            x = jnp.asarray(rng.randn(2, t, ci), jnp.float32)
            params = tc.init(jax.random.PRNGKey(0), x)
            ref = tc.apply(params, x)  # (2, t*u, co)
            xp = x.reshape(2, t // s_in, s_in * ci)
            got = tc.apply(params, xp, s_in=s_in, s_out=s_out)
            got = np.asarray(got).reshape(2, t * u, co)
            np.testing.assert_allclose(
                got, np.asarray(ref), atol=2e-5,
                err_msg=f"ci{ci} k{k} u{u} s_in{s_in} s_out{s_out}",
            )

    def test_conv_post_packed_matches_stock(self):
        """WNConv1d.packed (conv_post consuming the packed stage-4 layout)
        is exact vs the plain call."""
        from emotivoice_tpu.models.hifigan import WNConv1d

        rng = np.random.RandomState(1)
        conv = WNConv1d(32, 1, 7, padding=3)
        x = jnp.asarray(rng.randn(2, 256, 32), jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x)
        ref = conv.apply(params, x)
        xp = x.reshape(2, 64, 4 * 32)
        got = conv.apply(params, xp, 4, method=WNConv1d.packed)
        got = np.asarray(got).reshape(2, 256, 1)
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-5)

    def test_generator_stage_truncation(self):
        """stages= profiling knob returns intermediate activations with the
        right shapes."""
        from emotivoice_tpu.config import tiny_test_config
        from emotivoice_tpu.models.hifigan import HiFiGANGenerator

        cfg = tiny_test_config().vocoder
        gen = HiFiGANGenerator(cfg)
        mel = jnp.zeros((1, 8, cfg.initial_channel))
        params = gen.init(jax.random.PRNGKey(0), mel)
        x0 = gen.apply(params, mel, stages=0)
        assert x0.shape == (1, 8, cfg.upsample_initial_channel)
        x2 = gen.apply(params, mel, stages=2)
        assert x2.shape == (1, 8 * 64, cfg.upsample_initial_channel // 4)
        full = gen.apply(params, mel)
        assert full.shape == (1, 8 * cfg.upsample_factor)
