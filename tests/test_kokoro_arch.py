"""Faithful Kokoro-82M architecture: torch/transformers parity for every
primitive the checkpoint mapping touches, plus a synthetic-checkpoint
end-to-end synthesis (tts/kokoro/{arch,checkpoint}.py; reference:
src/pygpukit/tts/kokoro/ — whose decoder mapping was left unfinished)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pygpukit_tpu.tts.kokoro import arch
from pygpukit_tpu.tts.kokoro.checkpoint import (
    KokoroDims, init_random_flat, load_params, select_ref_s, state_dict_spec,
)

torch = pytest.importorskip("torch")


class TestPrimitivesVsTorch:
    def test_conv1d(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 8, 32)).astype(np.float32)
        w = rng.standard_normal((12, 8, 5)).astype(np.float32)
        b = rng.standard_normal(12).astype(np.float32)
        want = torch.nn.functional.conv1d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b),
            stride=2, padding=3, dilation=2).numpy()
        got = np.asarray(arch.conv1d(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), stride=2, padding=3,
                                     dilation=2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conv_transpose1d(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 6, 20)).astype(np.float32)
        w = rng.standard_normal((6, 4, 12)).astype(np.float32)  # [I,O,K]
        b = rng.standard_normal(4).astype(np.float32)
        want = torch.nn.functional.conv_transpose1d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b),
            stride=6, padding=3).numpy()
        got = np.asarray(arch.conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=6,
            padding=3))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_conv_transpose1d_grouped(self):
        """The AdainResBlk1d pool: grouped (depthwise) stride-2 transpose."""
        rng = np.random.default_rng(2)
        ch = 6
        x = rng.standard_normal((1, ch, 16)).astype(np.float32)
        w = rng.standard_normal((ch, 1, 3)).astype(np.float32)
        b = rng.standard_normal(ch).astype(np.float32)
        want = torch.nn.functional.conv_transpose1d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=2,
            padding=1, output_padding=1, groups=ch).numpy()
        got = np.asarray(arch.conv_transpose1d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2,
            padding=1, output_padding=1, groups=ch))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bilstm(self):
        rng = np.random.default_rng(3)
        inp, hid, s = 10, 7, 13
        x = rng.standard_normal((s, inp)).astype(np.float32)
        m = torch.nn.LSTM(inp, hid, bidirectional=True)
        want, _ = m(torch.tensor(x)[:, None, :])
        want = want[:, 0].detach().numpy()
        sd = m.state_dict()
        p = {"fwd": {"w_ih": jnp.asarray(sd["weight_ih_l0"].numpy()),
                     "w_hh": jnp.asarray(sd["weight_hh_l0"].numpy()),
                     "b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
                     "b_hh": jnp.asarray(sd["bias_hh_l0"].numpy())},
             "bwd": {"w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].numpy()),
                     "w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].numpy()),
                     "b_ih": jnp.asarray(sd["bias_ih_l0_reverse"].numpy()),
                     "b_hh": jnp.asarray(sd["bias_hh_l0_reverse"].numpy())}}
        got = np.asarray(arch.bilstm(jnp.asarray(x), p))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_instance_and_ada_norms(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal((1, 5, 24)).astype(np.float32)
        want = torch.nn.functional.instance_norm(torch.tensor(x)).numpy()
        got = np.asarray(arch.instance_norm(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_stft_istft_roundtrip_vs_torch(self):
        rng = np.random.default_rng(5)
        n = 600
        x = rng.standard_normal(n).astype(np.float32)
        n_fft, hop = 20, 5
        win = torch.hann_window(n_fft)
        spec_t = torch.stft(torch.tensor(x), n_fft, hop, n_fft, win,
                            return_complex=True)
        mag_w, ph_w = spec_t.abs().numpy(), spec_t.angle().numpy()
        mag, ph = arch._stft_mag_phase(jnp.asarray(x), n_fft, hop)
        np.testing.assert_allclose(np.asarray(mag), mag_w, rtol=1e-3,
                                   atol=1e-4)
        # istft parity on a synthetic magnitude/phase pair
        out_w = torch.istft(torch.tensor(mag_w) * torch.exp(
            1j * torch.tensor(ph_w)), n_fft, hop, n_fft, win).numpy()
        out = np.asarray(arch._istft(jnp.asarray(mag_w), jnp.asarray(ph_w),
                                     n_fft, hop))
        m = min(len(out), len(out_w))
        np.testing.assert_allclose(out[:m], out_w[:m], rtol=1e-3, atol=1e-4)

    def test_albert_vs_transformers(self):
        transformers = pytest.importorskip("transformers")
        cfg = transformers.AlbertConfig(
            vocab_size=50, embedding_size=16, hidden_size=32,
            num_attention_heads=4, intermediate_size=64,
            num_hidden_layers=3, max_position_embeddings=40,
            hidden_act="gelu_new", attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0, classifier_dropout_prob=0.0)
        hf = transformers.AlbertModel(cfg).eval()
        ids = np.array([2, 7, 19, 4, 33, 1], np.int64)
        with torch.no_grad():
            want = hf(torch.tensor(ids)[None]).last_hidden_state[0].numpy()

        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        lp = "encoder.albert_layer_groups.0.albert_layers.0"

        def lin(prefix):
            return {"w": jnp.asarray(sd[f"{prefix}.weight"].T),
                    "b": jnp.asarray(sd[f"{prefix}.bias"])}

        p = {"word_emb": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
             "pos_emb": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
             "type_emb": jnp.asarray(sd["embeddings.token_type_embeddings.weight"]),
             "emb_ln_w": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
             "emb_ln_b": jnp.asarray(sd["embeddings.LayerNorm.bias"]),
             "map": lin("encoder.embedding_hidden_mapping_in"),
             "q": lin(f"{lp}.attention.query"),
             "k": lin(f"{lp}.attention.key"),
             "v": lin(f"{lp}.attention.value"),
             "dense": lin(f"{lp}.attention.dense"),
             "attn_ln_w": jnp.asarray(sd[f"{lp}.attention.LayerNorm.weight"]),
             "attn_ln_b": jnp.asarray(sd[f"{lp}.attention.LayerNorm.bias"]),
             "ffn": lin(f"{lp}.ffn"),
             "ffn_out": lin(f"{lp}.ffn_output"),
             "full_ln_w": jnp.asarray(sd[f"{lp}.full_layer_layer_norm.weight"]),
             "full_ln_b": jnp.asarray(sd[f"{lp}.full_layer_layer_norm.bias"])}
        got = np.asarray(arch.albert_forward(
            jnp.asarray(ids, jnp.int32), p, n_layers=3, n_heads=4,
            act="gelu_new"))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestAdainBlocksVsTorch:
    """The composite StyleTTS2 blocks, cross-checked against a direct torch
    transcription of istftnet.py semantics."""

    def _torch_adain(self, x, s, fc_w, fc_b):
        h = torch.nn.functional.linear(s, fc_w, fc_b)
        gamma, beta = torch.chunk(h, 2, dim=-1)
        xn = torch.nn.functional.instance_norm(x)
        return (1 + gamma.unsqueeze(-1)) * xn + beta.unsqueeze(-1)

    def test_adain_resblk1d_plain(self):
        rng = np.random.default_rng(6)
        din, dout, sty, w = 8, 8, 5, 16
        x = rng.standard_normal((1, din, w)).astype(np.float32)
        s = rng.standard_normal((1, sty)).astype(np.float32)
        p = {"conv1_w": rng.standard_normal((dout, din, 3)).astype(np.float32) * 0.2,
             "conv1_b": rng.standard_normal(dout).astype(np.float32) * 0.1,
             "conv2_w": rng.standard_normal((dout, dout, 3)).astype(np.float32) * 0.2,
             "conv2_b": rng.standard_normal(dout).astype(np.float32) * 0.1,
             "norm1": {"fc": {"w": jnp.asarray(rng.standard_normal((sty, 2 * din)).astype(np.float32)),
                              "b": jnp.asarray(rng.standard_normal(2 * din).astype(np.float32))}},
             "norm2": {"fc": {"w": jnp.asarray(rng.standard_normal((sty, 2 * dout)).astype(np.float32)),
                              "b": jnp.asarray(rng.standard_normal(2 * dout).astype(np.float32))}}}
        got = np.asarray(arch.adain_resblk1d(
            jnp.asarray(x), jnp.asarray(s),
            {**p, "conv1_w": jnp.asarray(p["conv1_w"]),
             "conv1_b": jnp.asarray(p["conv1_b"]),
             "conv2_w": jnp.asarray(p["conv2_w"]),
             "conv2_b": jnp.asarray(p["conv2_b"])}))

        xt, st = torch.tensor(x), torch.tensor(s)
        h = self._torch_adain(xt, st,
                              torch.tensor(np.asarray(p["norm1"]["fc"]["w"]).T),
                              torch.tensor(np.asarray(p["norm1"]["fc"]["b"])))
        h = torch.nn.functional.leaky_relu(h, 0.2)
        h = torch.nn.functional.conv1d(h, torch.tensor(p["conv1_w"]),
                                       torch.tensor(p["conv1_b"]), padding=1)
        h = self._torch_adain(h, st,
                              torch.tensor(np.asarray(p["norm2"]["fc"]["w"]).T),
                              torch.tensor(np.asarray(p["norm2"]["fc"]["b"])))
        h = torch.nn.functional.leaky_relu(h, 0.2)
        h = torch.nn.functional.conv1d(h, torch.tensor(p["conv2_w"]),
                                       torch.tensor(p["conv2_b"]), padding=1)
        want = ((h + xt) / np.sqrt(2.0)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_snake_resblock_residual_structure(self):
        """AdaINResBlock1: identity weights -> residual sums stay finite and
        snake(0-conv) reduces to x + x_t where x_t = 0."""
        rng = np.random.default_rng(7)
        ch, sty, w = 6, 4, 12
        x = rng.standard_normal((1, ch, w)).astype(np.float32)
        s = rng.standard_normal((1, sty)).astype(np.float32)
        conv = {"c1_w": jnp.zeros((ch, ch, 3)), "c1_b": jnp.zeros(ch),
                "c2_w": jnp.zeros((ch, ch, 3)), "c2_b": jnp.zeros(ch),
                "adain1": {"fc": {"w": jnp.zeros((sty, 2 * ch)),
                                  "b": jnp.zeros(2 * ch)}},
                "adain2": {"fc": {"w": jnp.zeros((sty, 2 * ch)),
                                  "b": jnp.zeros(2 * ch)}},
                "alpha1": jnp.ones((1, ch, 1)), "alpha2": jnp.ones((1, ch, 1)),
                "dilation": 1, "padding1": 1, "padding2": 1}
        got = np.asarray(arch.adain_resblock1(
            jnp.asarray(x), jnp.asarray(s), {"convs": [conv] * 3}))
        np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-6)


class TestSyntheticCheckpoint:
    """Full pipeline from a randomly-initialised checkpoint in the REAL key
    layout, through torch.save round-trip and the loader."""

    @pytest.fixture(scope="class")
    def params(self):
        return load_params(init_random_flat(seed=11, scale=0.05))

    def test_spec_and_loader_agree(self):
        flat = init_random_flat(seed=0)
        assert len(flat) == len(state_dict_spec())
        load_params(flat)  # must consume every mapped name without KeyError

    def test_pth_roundtrip(self, tmp_path):
        """Save in the on-disk nested .pth format (sub-dicts + module.
        prefixes) and load through load_checkpoint_file."""
        from pygpukit_tpu.tts.kokoro.checkpoint import load_checkpoint_file
        flat = init_random_flat(seed=1, scale=0.05)
        nested: dict = {}
        for name, arr in flat.items():
            top, rest = name.split(".", 1)
            nested.setdefault(top, {})[f"module.{rest}"] = torch.tensor(arr)
        nested["bert_encoder"] = {
            "module." + k.split(".", 1)[1]: v
            for k, v in nested["bert_encoder"].items()}
        # bert_encoder keys are "bert_encoder.weight" -> rest is "weight"
        path = tmp_path / "kokoro-v1_0.pth"
        torch.save(nested, path)
        flat2 = load_checkpoint_file(path)
        assert set(flat2) == set(flat)
        for k in flat:
            np.testing.assert_array_equal(flat2[k], flat[k])

    def test_full_synthesis(self, params):
        ids = jnp.asarray([10, 43, 57, 61, 47], jnp.int32)
        voice = np.random.default_rng(2).standard_normal(
            (510, 1, 256)).astype(np.float32) * 0.1
        ref_s = jnp.asarray(select_ref_s(voice, 5))
        audio, pred_dur, true_total = arch.kmodel_forward(
            ids, ref_s, params, total_frames=64,
            key=jax.random.PRNGKey(0))
        audio = np.asarray(audio)
        assert np.isfinite(audio).all()
        # samples = frames * 2 (decoder up) * 10 * 6 (generator ups) * hop 5
        assert audio.shape[0] == 64 * 600
        assert pred_dur.shape[0] == 7          # S + bos/eos
        assert 7 <= int(true_total) <= 64

    def test_duration_speed_scaling(self, params):
        ids = jnp.asarray([10, 43, 57], jnp.int32)
        voice = np.zeros((510, 1, 256), np.float32)
        ref_s = jnp.asarray(select_ref_s(voice, 3))
        _, d1, _ = arch.kmodel_forward(ids, ref_s, params, total_frames=48,
                                       speed=1.0, key=jax.random.PRNGKey(0))
        _, d2, _ = arch.kmodel_forward(ids, ref_s, params, total_frames=48,
                                       speed=2.0, key=jax.random.PRNGKey(0))
        assert int(jnp.sum(d2)) <= int(jnp.sum(d1))


class TestG2P:
    def test_lexicon_and_rules(self):
        from pygpukit_tpu.tts.kokoro.g2p import text_to_ipa, word_to_ipa
        assert text_to_ipa("Hello world") == "həloʊ wɜɹld"
        # rule-based fallback on an out-of-lexicon word
        assert word_to_ipa("cat") == "kæt"
        assert word_to_ipa("ship") == "ʃɪp"
        assert word_to_ipa("phone") == "foʊn"      # ph + magic-e
        assert word_to_ipa("church") == "tʃɜɹtʃ"

    def test_number_expansion(self):
        from pygpukit_tpu.tts.kokoro.g2p import normalize
        assert normalize("I have 21 cats") == "i have twenty one cats"
        assert "hundred" in normalize("142")

    def test_encode_roundtrip(self):
        from pygpukit_tpu.tts.kokoro.g2p import Phonemizer
        p = Phonemizer()
        ids = p.encode("Hello world, how are you?")
        assert len(ids) > 8 and all(i > 0 for i in ids)
        # raw-phoneme passthrough for external misaki/espeak users
        ids2 = p.encode(phonemes="həloʊ")
        assert len(ids2) == 5

    def test_custom_vocab(self):
        from pygpukit_tpu.tts.kokoro.g2p import Phonemizer
        p = Phonemizer(vocab={"h": 7, "i": 3})
        assert p.encode(phonemes="hi") == [7, 3]

    def test_checkpoint_true_vocab_ids(self):
        """Default vocab must be the published Kokoro-82M v1.0 table
        (hexgrad config.json) — wrong ids would synthesize garbage from a
        real checkpoint even with a faithful architecture (VERDICT r2 #8)."""
        from pygpukit_tpu.tts.kokoro.g2p import KOKORO_VOCAB, Phonemizer
        # spot-check published ids across the table's regions
        assert KOKORO_VOCAB[";"] == 1 and KOKORO_VOCAB[" "] == 16
        assert KOKORO_VOCAB["a"] == 43 and KOKORO_VOCAB["z"] == 68
        assert "g" not in KOKORO_VOCAB          # misaki uses ɡ (U+0261)
        assert KOKORO_VOCAB["ɑ"] == 69 and KOKORO_VOCAB["ə"] == 83
        assert KOKORO_VOCAB["ŋ"] == 112 and KOKORO_VOCAB["ʃ"] == 131
        assert KOKORO_VOCAB["ˈ"] == 156 and KOKORO_VOCAB["ˌ"] == 157
        assert KOKORO_VOCAB["ᵻ"] == 177
        assert max(KOKORO_VOCAB.values()) == 177    # 178-row embedding
        # fixture: misaki-style IPA for "hello world" -> known-good ids
        p = Phonemizer()
        ids = p.encode(phonemes="həlˈoʊ wˈɜːld")
        assert ids == [50, 83, 54, 156, 57, 135, 16,
                       65, 156, 87, 158, 54, 46]
        # G2P path end-to-end lands in the same table
        assert p.encode("hello") == [50, 83, 54, 57, 135]


class TestKokoro82M:
    def test_random_init_synthesize(self):
        from pygpukit_tpu.tts.kokoro import Kokoro82M
        m = Kokoro82M.random_init(seed=0)
        r = m.synthesize("hi")
        assert r.sample_rate == 24000
        assert np.isfinite(r.audio).all() and r.audio.shape[0] > 0
        assert r.phonemes  # IPA string recorded

    def test_from_pretrained_dir(self, tmp_path):
        """End-to-end: real on-disk layout (nested .pth + config.json +
        voices/*.pt) -> from_pretrained -> synthesize."""
        import json
        from pygpukit_tpu.tts.kokoro import Kokoro82M
        from pygpukit_tpu.tts.kokoro.g2p import default_vocab
        flat = init_random_flat(seed=5, scale=0.05)
        nested: dict = {}
        for name, arr in flat.items():
            top, rest = name.split(".", 1)
            nested.setdefault(top, {})[f"module.{rest}"] = torch.tensor(arr)
        torch.save(nested, tmp_path / "kokoro-v1_0.pth")
        (tmp_path / "config.json").write_text(json.dumps({
            "n_token": 178, "style_dim": 128, "hidden_dim": 512,
            "vocab": default_vocab()}))
        vdir = tmp_path / "voices"
        vdir.mkdir()
        v = np.random.default_rng(0).standard_normal(
            (510, 1, 256)).astype(np.float32) * 0.1
        torch.save(torch.tensor(v), vdir / "af_heart.pt")
        m = Kokoro82M.from_pretrained(tmp_path, voice="af_heart")
        assert m.available_voices == ["af_heart"]
        assert m.current_voice == "af_heart"
        r = m.synthesize("test", speed=1.2)
        assert np.isfinite(r.audio).all() and r.audio.shape[0] > 0
