"""Whisper ASR: GPU mel → encoder → decoder with cross-attention + KV cache.

TPU-native rebuild of the reference Whisper stack (reference:
src/pygpukit/asr/whisper/model.py:88, encoder.py, decoder.py:253,344 —
GPU mel-spectrogram via audio ops, encoder, decoder w/ cross-attention KV
cache, streaming transcription).

Functional JAX forward over a params pytree loaded from HF safetensors
(openai/whisper-* checkpoint names); encoder runs once per 30s window,
decoder decodes with cached self-attn KV + precomputed cross-attn KV.
"""

from __future__ import annotations

import functools
import json
import math
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ...ops.audio import log_melspectrogram, resample
from ...ops.nn.activation import gelu_fn
from ...ops.nn.norm import layernorm_fn

_F32 = jnp.float32

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30


@dataclass
class WhisperConfig:
    n_mels: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    decoder_layers: int = 4
    n_heads: int = 6
    vocab_size: int = 51865
    max_source_positions: int = 1500
    max_target_positions: int = 448
    eos_token_id: int = 50257
    sot_token_id: int = 50258

    @classmethod
    def from_hf(cls, hf: dict) -> "WhisperConfig":
        return cls(
            n_mels=hf.get("num_mel_bins", 80),
            d_model=hf.get("d_model", 384),
            encoder_layers=hf.get("encoder_layers", 4),
            decoder_layers=hf.get("decoder_layers", 4),
            n_heads=hf.get("encoder_attention_heads", 6),
            vocab_size=hf.get("vocab_size", 51865),
            max_source_positions=hf.get("max_source_positions", 1500),
            max_target_positions=hf.get("max_target_positions", 448),
            eos_token_id=hf.get("eos_token_id", 50257),
            sot_token_id=hf.get("decoder_start_token_id", 50258),
        )


def _attn(q, k, v, n_heads: int, mask=None):
    """[S,E] x [T,E] multi-head attention, f32 softmax."""
    s, e = q.shape
    t = k.shape[0]
    d = e // n_heads
    qh = q.reshape(s, n_heads, d).transpose(1, 0, 2).astype(_F32)
    kh = k.reshape(t, n_heads, d).transpose(1, 0, 2).astype(_F32)
    vh = v.reshape(t, n_heads, d).transpose(1, 0, 2).astype(_F32)
    scores = jnp.einsum("hsd,htd->hst", qh, kh) / math.sqrt(d)
    if mask is not None:
        scores = jnp.where(mask, -1e30, scores)
    out = jnp.einsum("hst,htd->hsd", jax.nn.softmax(scores, axis=-1), vh)
    return out.transpose(1, 0, 2).reshape(s, e).astype(q.dtype)


def _linear(p, name, x):
    out = jnp.dot(x, p[f"{name}.w"], preferred_element_type=_F32)
    if f"{name}.b" in p:
        out = out + p[f"{name}.b"].astype(_F32)
    return out.astype(x.dtype)


def _mha(p, prefix, x, kv, n_heads, mask=None):
    q = _linear(p, f"{prefix}.q", x)
    k = _linear(p, f"{prefix}.k", kv)
    v = _linear(p, f"{prefix}.v", kv)
    return _linear(p, f"{prefix}.out", _attn(q, k, v, n_heads, mask))


def encoder_fn(cfg: WhisperConfig, params, mel):
    """mel [frames, n_mels] -> audio features [T, E]."""
    x = mel.T[None]                                   # [1, n_mels, frames]
    x = lax.conv_general_dilated(
        x.astype(_F32), params["conv1.w"].astype(_F32), (1,), [(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = gelu_fn(x + params["conv1.b"].astype(_F32)[None, :, None])
    x = lax.conv_general_dilated(
        x, params["conv2.w"].astype(_F32), (2,), [(1, 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    x = gelu_fn(x + params["conv2.b"].astype(_F32)[None, :, None])
    x = x[0].T                                        # [T, E]
    x = x + params["enc_pos"][:x.shape[0]]

    def block(x, lp):
        h = layernorm_fn(x, lp["ln1.w"], lp["ln1.b"])
        x = x + _mha(lp, "self", h, h, cfg.n_heads)
        h = layernorm_fn(x, lp["ln2.w"], lp["ln2.b"])
        h = gelu_fn(_linear(lp, "fc1", h))
        x = x + _linear(lp, "fc2", h)
        return x, None

    x, _ = lax.scan(block, x, params["enc_layers"])
    return layernorm_fn(x, params["enc_ln.w"], params["enc_ln.b"])


def decoder_fn(cfg: WhisperConfig, params, tokens, audio_features):
    """Full (uncached) decoder forward: tokens [S] -> logits [S, V]."""
    s = tokens.shape[0]
    x = jnp.take(params["tok_embed"], tokens, axis=0)
    x = x + params["dec_pos"][:s]
    i = jnp.arange(s)[:, None]
    j = jnp.arange(s)[None, :]
    causal = (j > i)[None]

    def block(x, lp):
        h = layernorm_fn(x, lp["ln1.w"], lp["ln1.b"])
        x = x + _mha(lp, "self", h, h, cfg.n_heads, causal)
        h = layernorm_fn(x, lp["ln2.w"], lp["ln2.b"])
        x = x + _mha(lp, "cross", h, audio_features, cfg.n_heads)
        h = layernorm_fn(x, lp["ln3.w"], lp["ln3.b"])
        h = gelu_fn(_linear(lp, "fc1", h))
        x = x + _linear(lp, "fc2", h)
        return x, None

    x, _ = lax.scan(block, x, params["dec_layers"])
    x = layernorm_fn(x, params["dec_ln.w"], params["dec_ln.b"])
    return lax.dot_general(x, params["tok_embed"],
                           (((1,), (1,)), ((), ())),
                           preferred_element_type=_F32)


def cross_kv_fn(cfg: WhisperConfig, params, audio_features):
    """Precompute per-layer cross-attention K/V from the audio features
    (reference: decoder KV cache, decoder.py:253). Returns stacked
    [L, T_audio, E] pairs — computed once per utterance."""
    def per_layer(lp):
        k = _linear(lp, "cross.k", audio_features)
        v = _linear(lp, "cross.v", audio_features)
        return k, v
    ks, vs = jax.vmap(per_layer)(params["dec_layers"])
    return ks, vs


def decoder_step_fn(cfg: WhisperConfig, params, k_self, v_self, cross_k,
                    cross_v, token, pos):
    """One cached decoder step: self-attn over the cache (masked beyond
    pos+1) + cross-attn over precomputed audio K/V. Caches [L, MAX, E]."""
    e = cfg.d_model
    h_heads = cfg.n_heads
    d = e // h_heads
    x = params["tok_embed"][token][None] + \
        lax.dynamic_slice_in_dim(params["dec_pos"], pos, 1, axis=0)
    max_len = k_self.shape[1]

    # fori_loop carrying the self-attn caches so the donated buffers update
    # in place — scan stacked-ys outputs forced XLA to copy both full
    # [L, MAX, E] caches every step (see llm/model.decode_step_fn)
    def body(i, st):
        x, kc_all, vc_all = st
        lp = jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
            params["dec_layers"])
        kx = lax.dynamic_index_in_dim(cross_k, i, 0, keepdims=False)
        vx = lax.dynamic_index_in_dim(cross_v, i, 0, keepdims=False)
        h = layernorm_fn(x, lp["ln1.w"], lp["ln1.b"])
        q = _linear(lp, "self.q", h)
        k_new = _linear(lp, "self.k", h)
        v_new = _linear(lp, "self.v", h)
        kc_all = lax.dynamic_update_slice(
            kc_all, k_new[None].astype(kc_all.dtype), (i, pos, 0))
        vc_all = lax.dynamic_update_slice(
            vc_all, v_new[None].astype(vc_all.dtype), (i, pos, 0))
        kc = lax.dynamic_index_in_dim(kc_all, i, 0, keepdims=False)
        vc = lax.dynamic_index_in_dim(vc_all, i, 0, keepdims=False)
        qh = q.reshape(1, h_heads, d).transpose(1, 0, 2).astype(_F32)
        kh = kc.reshape(max_len, h_heads, d).transpose(1, 0, 2).astype(_F32)
        vh = vc.reshape(max_len, h_heads, d).transpose(1, 0, 2).astype(_F32)
        scores = jnp.einsum("hqd,hkd->hqk", qh, kh) / math.sqrt(d)
        idx = jnp.arange(max_len)[None, None, :]
        scores = jnp.where(idx > pos, -1e30, scores)
        att = jnp.einsum("hqk,hkd->hqd",
                         jax.nn.softmax(scores, -1), vh)
        att = att.transpose(1, 0, 2).reshape(1, e).astype(x.dtype)
        x = x + _linear(lp, "self.out", att)
        h = layernorm_fn(x, lp["ln2.w"], lp["ln2.b"])
        q2 = _linear(lp, "cross.q", h)
        x = x + _linear(lp, "cross.out", _attn(q2, kx, vx, h_heads))
        h = layernorm_fn(x, lp["ln3.w"], lp["ln3.b"])
        h = gelu_fn(_linear(lp, "fc1", h))
        x = x + _linear(lp, "fc2", h)
        return (x, kc_all, vc_all)

    x, k_self, v_self = lax.fori_loop(
        0, params["dec_layers"]["ln1.w"].shape[0], body, (x, k_self, v_self))
    x = layernorm_fn(x, params["dec_ln.w"], params["dec_ln.b"])
    logits = lax.dot_general(x[0], params["tok_embed"],
                             (((0,), (1,)), ((), ())),
                             preferred_element_type=_F32)
    return k_self, v_self, logits


def greedy_decode_fn(cfg: WhisperConfig, n_steps: int, max_len: int, params,
                     audio_features, prompt, prompt_len):
    """Device-side greedy loop with cached incremental decoding: the prompt
    is consumed step-by-step (writing the self-attn cache), then n_steps new
    tokens are generated — all inside ONE executable."""
    e = cfg.d_model
    n_layers = cfg.decoder_layers
    k_self = jnp.zeros((n_layers, max_len, e), _F32)
    v_self = jnp.zeros((n_layers, max_len, e), _F32)
    cross_k, cross_v = cross_kv_fn(cfg, params, audio_features)

    def step(carry, i):
        kc, vc, cur = carry
        kc, vc, logits = decoder_step_fn(cfg, params, kc, vc, cross_k,
                                         cross_v, cur, i)
        pred = jnp.argmax(logits).astype(jnp.int32)
        in_prompt = i + 1 < prompt_len
        nxt = jnp.where(in_prompt, prompt[jnp.minimum(i + 1, max_len - 1)],
                        pred)
        emit = jnp.where(in_prompt, jnp.int32(-1), pred)
        return (kc, vc, nxt), emit

    total = max_len - 1
    (_, _, _), emits = lax.scan(step, (k_self, v_self, prompt[0]),
                                jnp.arange(total))
    # first n_steps real emissions (emit == -1 during prompt consumption)
    real = jnp.where(emits >= 0, emits, 0)
    is_real = (emits >= 0).astype(jnp.int32)
    order = jnp.argsort(-is_real, stable=True)      # real tokens first
    return real[order][:n_steps]


class WhisperModel:
    """reference: WhisperModel, asr/whisper/model.py:88."""

    def __init__(self, config: WhisperConfig, params: dict,
                 dtype=jnp.float32):
        self.config = config
        self.params = params
        self.dtype = dtype
        self._encode = jax.jit(functools.partial(encoder_fn, config))
        self._decode_full = jax.jit(functools.partial(decoder_fn, config))
        self._greedy = {}

    # -- loading -------------------------------------------------------------

    @classmethod
    def from_safetensors(cls, path, dtype=jnp.float32) -> "WhisperModel":
        from ...llm.safetensors import load_safetensors
        st = load_safetensors(path)
        hf_cfg = {}
        cj = Path(path if Path(path).is_dir() else Path(path).parent) / "config.json"
        if cj.exists():
            hf_cfg = json.loads(cj.read_text())
        cfg = WhisperConfig.from_hf(hf_cfg)
        names = set(st.keys())
        pre = "model." if "model.encoder.conv1.weight" in names else ""

        def t(name):
            return jnp.asarray(np.asarray(st.tensor_numpy(pre + name)), dtype)

        def lin(prefix, name):
            out = {f"{name}.w": jnp.swapaxes(t(f"{prefix}.weight"), 0, 1)}
            if f"{pre}{prefix}.bias" in st:
                out[f"{name}.b"] = t(f"{prefix}.bias")
            return out

        p: dict = {
            "conv1.w": t("encoder.conv1.weight"),
            "conv1.b": t("encoder.conv1.bias"),
            "conv2.w": t("encoder.conv2.weight"),
            "conv2.b": t("encoder.conv2.bias"),
            "enc_pos": t("encoder.embed_positions.weight"),
            "enc_ln.w": t("encoder.layer_norm.weight"),
            "enc_ln.b": t("encoder.layer_norm.bias"),
            "tok_embed": t("decoder.embed_tokens.weight"),
            "dec_pos": t("decoder.embed_positions.weight"),
            "dec_ln.w": t("decoder.layer_norm.weight"),
            "dec_ln.b": t("decoder.layer_norm.bias"),
        }

        def enc_layer(i):
            b = f"encoder.layers.{i}"
            lp = {"ln1.w": t(f"{b}.self_attn_layer_norm.weight"),
                  "ln1.b": t(f"{b}.self_attn_layer_norm.bias"),
                  "ln2.w": t(f"{b}.final_layer_norm.weight"),
                  "ln2.b": t(f"{b}.final_layer_norm.bias")}
            lp.update(lin(f"{b}.self_attn.q_proj", "self.q"))
            lp.update(lin(f"{b}.self_attn.k_proj", "self.k"))
            lp.update(lin(f"{b}.self_attn.v_proj", "self.v"))
            lp.update(lin(f"{b}.self_attn.out_proj", "self.out"))
            lp.update(lin(f"{b}.fc1", "fc1"))
            lp.update(lin(f"{b}.fc2", "fc2"))
            return lp

        def dec_layer(i):
            b = f"decoder.layers.{i}"
            lp = {"ln1.w": t(f"{b}.self_attn_layer_norm.weight"),
                  "ln1.b": t(f"{b}.self_attn_layer_norm.bias"),
                  "ln2.w": t(f"{b}.encoder_attn_layer_norm.weight"),
                  "ln2.b": t(f"{b}.encoder_attn_layer_norm.bias"),
                  "ln3.w": t(f"{b}.final_layer_norm.weight"),
                  "ln3.b": t(f"{b}.final_layer_norm.bias")}
            lp.update(lin(f"{b}.self_attn.q_proj", "self.q"))
            lp.update(lin(f"{b}.self_attn.k_proj", "self.k"))
            lp.update(lin(f"{b}.self_attn.v_proj", "self.v"))
            lp.update(lin(f"{b}.self_attn.out_proj", "self.out"))
            lp.update(lin(f"{b}.encoder_attn.q_proj", "cross.q"))
            lp.update(lin(f"{b}.encoder_attn.k_proj", "cross.k"))
            lp.update(lin(f"{b}.encoder_attn.v_proj", "cross.v"))
            lp.update(lin(f"{b}.encoder_attn.out_proj", "cross.out"))
            lp.update(lin(f"{b}.fc1", "fc1"))
            lp.update(lin(f"{b}.fc2", "fc2"))
            return lp

        enc = [enc_layer(i) for i in range(cfg.encoder_layers)]
        dec = [dec_layer(i) for i in range(cfg.decoder_layers)]
        p["enc_layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *enc)
        p["dec_layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *dec)
        # whisper k_proj has no bias; jax pytrees handle the missing key as
        # long as every layer is uniform (HF guarantees this).
        return cls(cfg, p, dtype)

    # -- inference -----------------------------------------------------------

    def compute_mel(self, audio: np.ndarray, sr: int = SAMPLE_RATE):
        """Pad/trim to 30s, GPU log-mel [3000, n_mels]."""
        x = jnp.asarray(np.asarray(audio, np.float32))
        if sr != SAMPLE_RATE:
            x = resample(x, sr, SAMPLE_RATE)
        target = SAMPLE_RATE * CHUNK_SECONDS
        n = x.shape[0]
        x = x[:target] if n >= target else jnp.pad(x, (0, target - n))
        mel = log_melspectrogram(x, SAMPLE_RATE, N_FFT, HOP,
                                 self.config.n_mels)
        return mel[:3000]

    def _prec(self):
        from ...ops.precision import f32_matmul_context
        return f32_matmul_context(self.params)

    def encode(self, mel) -> jnp.ndarray:
        with self._prec():
            return self._encode(self.params, mel)

    def decoder_logits(self, tokens, audio_features) -> jnp.ndarray:
        with self._prec():
            return self._decode_full(
                self.params, jnp.asarray(np.asarray(tokens, np.int32)),
                audio_features)

    def transcribe_tokens(self, audio: np.ndarray, sot_sequence: list[int],
                          max_new_tokens: int = 64,
                          sr: int = SAMPLE_RATE) -> list[int]:
        """Greedy token transcription given the SOT prompt sequence."""
        mel = self.compute_mel(audio, sr)
        feats = self.encode(mel)
        max_new_tokens = min(
            max_new_tokens,
            self.config.max_target_positions - len(sot_sequence) - 1)
        max_len = len(sot_sequence) + max_new_tokens + 1
        key = (max_len, max_new_tokens)
        if key not in self._greedy:
            self._greedy[key] = jax.jit(functools.partial(
                greedy_decode_fn, self.config, max_new_tokens, max_len))
        prompt = np.zeros((max_len,), np.int32)
        prompt[:len(sot_sequence)] = sot_sequence
        with self._prec():
            toks = np.asarray(self._greedy[key](
                self.params, feats, jnp.asarray(prompt),
                jnp.int32(len(sot_sequence))))
        out = []
        for tk in toks.tolist():
            if tk == self.config.eos_token_id:
                break
            out.append(int(tk))
        return out

    def transcribe_streaming(self, audio_iter, sot_sequence: list[int],
                             chunk_seconds: float = 5.0,
                             sr: int = SAMPLE_RATE):
        """Streaming transcription: accumulate audio and emit tokens per
        completed window, consuming the transcribed audio (reference:
        transcribe_streaming, model.py:222). Windows are capped at the 30 s
        model context; the final partial window is flushed once."""
        window = int(sr * chunk_seconds)
        window = min(window, SAMPLE_RATE * CHUNK_SECONDS)
        buf = np.zeros((0,), np.float32)
        for chunk in audio_iter:
            buf = np.concatenate([buf, np.asarray(chunk, np.float32)])
            while len(buf) >= window:
                yield self.transcribe_tokens(buf[:window], sot_sequence, sr=sr)
                buf = buf[window:]
        if len(buf):
            yield self.transcribe_tokens(buf, sot_sequence, sr=sr)
