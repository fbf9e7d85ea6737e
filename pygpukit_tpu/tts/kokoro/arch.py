"""Faithful Kokoro-82M architecture (StyleTTS2 inference stack) in functional
JAX.

Reference: src/pygpukit/tts/kokoro/{model,layers,loader}.py (whose decoder /
vocoder mapping was left unfinished — "will be implemented as the weight
structure is verified", model.py:268) and the upstream checkpoint structure of
hexgrad/Kokoro-82M: a .pth dict with five sub-state-dicts
{bert, bert_encoder, predictor, text_encoder, decoder}, torch ``module.``
prefixes, and weight-normalised convs stored as (weight_g, weight_v).

Components (exact Kokoro-82M dims):
- ALBERT text encoder: embedding 128 -> hidden 768, 12 shared layers,
  12 heads, FFN 2048 (checkpoint keys mirror transformers' AlbertModel).
- bert_encoder: Linear 768 -> 512.
- prosody predictor: DurationEncoder (3x [BiLSTM(640->512), AdaLayerNorm]),
  duration BiLSTM + sigmoid-sum duration head (max_dur 50), shared BiLSTM,
  F0/N branches of AdainResBlk1d stacks (512->512, 512->256 up2x, 256->256)
  with 1x1 projections.
- text_encoder: embedding 512 + 3x [weight-norm Conv1d k5, channel
  LayerNorm(gamma/beta), leaky_relu(0.2)] + BiLSTM.
- decoder (iSTFTNet): F0/N stride-2 convs, AdainResBlk1d encode (514->1024),
  3x decode blocks (1090->1024) + upsampling block (1090->512), asr 1x1
  residual, and the hn-NSF generator: harmonic source (SineGen + linear+tanh)
  -> STFT(20/5) harmonic spectrum feeding per-scale noise convs/resblocks,
  ConvTranspose ups (10,6), snake-activated AdaIN resblocks (kernels 3/7/11,
  dilations 1/3/5), conv_post -> exp-magnitude + sin-phase -> iSTFT.

Everything is pure-functional over a nested param pytree whose structure
mirrors the checkpoint names (see checkpoint.py for the mapping); linear
weights are stored [in, out] (TPU contraction layout), convs in torch
[O, I/g, K] layout. All forward paths are jit-compatible with static frame
budgets (dynamic durations become masked fixed-length alignments).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32


# ---------------------------------------------------------------- primitives

def linear(x, p):
    """x [..., in] @ p["w"] [in, out] + p["b"]."""
    y = jnp.dot(x, p["w"], precision=jax.lax.Precision.HIGHEST)
    return y + p["b"] if p.get("b") is not None else y


def layer_norm(x, w, b, eps=1e-12):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def conv1d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """torch-layout conv1d: x [N,C,W], w [O,I/g,K]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b[None, :, None] if b is not None else y


def conv_transpose1d(x, w, b=None, stride=1, padding=0, output_padding=0,
                     groups=1):
    """torch ConvTranspose1d: x [N,C,W], w [I, O/g, K]."""
    # torch transposed conv == gradient of conv: implement via lhs dilation
    i, og, k = w.shape
    if groups == 1:
        wt = jnp.flip(w, -1).transpose(1, 0, 2)            # [O, I, K]
    else:
        # grouped: block-diagonal over groups; w [I, O/g, K] with I = groups*ig
        ig = i // groups
        wt = jnp.flip(w, -1).reshape(groups, ig, og, k).transpose(0, 2, 1, 3)
        wt = wt.reshape(groups * og, ig, k)                # [O, I/g, K]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, wt, window_strides=(1,), padding=[(pad, pad + output_padding)],
        lhs_dilation=(stride,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST)
    return y + b[None, :, None] if b is not None else y


def leaky_relu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def gelu_exact(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def lstm_cell_scan(x, p, reverse=False):
    """Unidirectional LSTM over x [S, I] with torch gate order (i,f,g,o).
    p: w_ih [4H, I], w_hh [4H, H], b_ih, b_hh [4H]."""
    h4 = p["w_ih"].shape[0]
    hid = h4 // 4
    xs = jnp.flip(x, 0) if reverse else x
    gates_x = xs @ p["w_ih"].T + p["b_ih"] + p["b_hh"]     # [S, 4H]

    def step(carry, gx):
        h, c = carry
        g = gx + h @ p["w_hh"].T
        i = jax.nn.sigmoid(g[:hid])
        f = jax.nn.sigmoid(g[hid:2 * hid])
        gg = jnp.tanh(g[2 * hid:3 * hid])
        o = jax.nn.sigmoid(g[3 * hid:])
        c = f * c + i * gg
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros(hid, x.dtype), jnp.zeros(hid, x.dtype))
    _, hs = jax.lax.scan(step, init, gates_x)
    return jnp.flip(hs, 0) if reverse else hs


def bilstm(x, p):
    """x [S, I] -> [S, 2H]; p keys: fwd{w_ih,...}, bwd{w_ih,...}."""
    fwd = lstm_cell_scan(x, p["fwd"])
    bwd = lstm_cell_scan(x, p["bwd"], reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


def instance_norm(x, eps=1e-5):
    """Non-affine instance norm over W: x [N, C, W]."""
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def ada_in(x, s, p):
    """AdaIN1d: x [N,C,W], s [N,S]; p["fc"] -> [N, 2C]."""
    h = linear(s, p["fc"])
    gamma, beta = jnp.split(h, 2, axis=-1)
    return ((1 + gamma[:, :, None]) * instance_norm(x) + beta[:, :, None])


def ada_layer_norm(x, s, p, eps=1e-5):
    """AdaLayerNorm: x [..., C], s [S_dim]; non-affine LN then styled."""
    h = linear(s, p["fc"])
    gamma, beta = jnp.split(h, 2, axis=-1)
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return (1 + gamma) * xn + beta


# ------------------------------------------------------------------- ALBERT

def albert_forward(ids, p, *, n_layers=12, n_heads=12, act="gelu_new"):
    """ids [S] -> [S, hidden]. Checkpoint-shaped param dict (see docstring)."""
    s = ids.shape[0]
    x = (p["word_emb"][ids] + p["pos_emb"][:s] + p["type_emb"][0])
    x = layer_norm(x, p["emb_ln_w"], p["emb_ln_b"])
    x = linear(x, p["map"])                                # 128 -> 768
    hidden = x.shape[-1]
    d = hidden // n_heads
    act_fn = gelu_new if act == "gelu_new" else gelu_exact

    def one_layer(x, _):
        q = linear(x, p["q"]).reshape(s, n_heads, d)
        k = linear(x, p["k"]).reshape(s, n_heads, d)
        v = linear(x, p["v"]).reshape(s, n_heads, d)
        scores = jnp.einsum("qhd,khd->hqk", q, k,
                            precision=jax.lax.Precision.HIGHEST)
        scores = scores / math.sqrt(d)
        attn = jnp.einsum("hqk,khd->qhd", jax.nn.softmax(scores, -1), v,
                          precision=jax.lax.Precision.HIGHEST)
        attn = linear(attn.reshape(s, hidden), p["dense"])
        x = layer_norm(x + attn, p["attn_ln_w"], p["attn_ln_b"])
        f = act_fn(linear(x, p["ffn"]))
        f = linear(f, p["ffn_out"])
        x = layer_norm(x + f, p["full_ln_w"], p["full_ln_b"])
        return x, None

    x, _ = jax.lax.scan(one_layer, x, None, length=n_layers)
    return x


# ------------------------------------------------------------- text encoder

def text_encoder_forward(ids, p):
    """StyleTTS2 TextEncoder: ids [S] -> [1, 512, S]."""
    x = p["emb"][ids].T[None]                              # [1, 512, S]
    for cnn in p["cnn"]:
        x = conv1d(x, cnn["w"], cnn["b"], padding=(cnn["w"].shape[-1] - 1) // 2)
        # channel LayerNorm (StyleTTS2 LayerNorm: over C with gamma/beta)
        xt = x.transpose(0, 2, 1)                          # [1, S, C]
        xt = layer_norm(xt, cnn["gamma"], cnn["beta"], eps=1e-5)
        x = leaky_relu(xt.transpose(0, 2, 1), 0.2)
    h = bilstm(x[0].T, p["lstm"])                          # [S, 512]
    return h.T[None]                                       # [1, 512, S]


# --------------------------------------------------------- prosody predictor

def duration_encoder_forward(d_en, style, p):
    """DurationEncoder: d_en [1, 512, S], style [128] -> [1, S, 640]."""
    s_len = d_en.shape[-1]
    sty = jnp.broadcast_to(style, (s_len, style.shape[0]))  # [S, 128]
    x = jnp.concatenate([d_en[0].T, sty], axis=-1)          # [S, 640]
    for block in p["blocks"]:
        x = bilstm(x, block["lstm"])                        # [S, 512]
        x = ada_layer_norm(x, style, block["aln"])          # [S, 512]
        x = jnp.concatenate([x, sty], axis=-1)              # [S, 640]
    return x[None]                                          # [1, S, 640]


def adain_resblk1d(x, s, p, *, upsample=False):
    """istftnet.py AdainResBlk1d. x [N,C,W], s [N,S]."""
    def residual(x):
        h = ada_in(x, s, p["norm1"])
        h = leaky_relu(h, 0.2)
        if upsample:
            h = conv_transpose1d(h, p["pool_w"], p["pool_b"], stride=2,
                                 padding=1, output_padding=1,
                                 groups=h.shape[1])
        h = conv1d(h, p["conv1_w"], p["conv1_b"], padding=1)
        h = ada_in(h, s, p["norm2"])
        h = leaky_relu(h, 0.2)
        return conv1d(h, p["conv2_w"], p["conv2_b"], padding=1)

    def shortcut(x):
        if upsample:  # nearest 2x
            x = jnp.repeat(x, 2, axis=-1)
        if "sc_w" in p:
            x = conv1d(x, p["sc_w"], None)
        return x

    return (residual(x) + shortcut(x)) / math.sqrt(2.0)


def f0n_train(en, style, p):
    """F0Ntrain: en [1, 640, T] -> (F0 [1, 2T], N [1, 2T])."""
    x = bilstm(en[0].T, p["shared"])                        # [T, 512]
    s = style[None]

    def branch(bp):
        h = x.T[None]                                       # [1, 512, T]
        h = adain_resblk1d(h, s, bp["blocks"][0])
        h = adain_resblk1d(h, s, bp["blocks"][1], upsample=True)
        h = adain_resblk1d(h, s, bp["blocks"][2])
        return conv1d(h, bp["proj_w"], bp["proj_b"])[:, 0]  # [1, 2T]

    return branch(p["F0"]), branch(p["N"])


def predict_durations(d_en, style, p, speed):
    """-> (d [1, S, 640], durations [S] float)."""
    d = duration_encoder_forward(d_en, style, p["text_encoder"])
    x = bilstm(d[0], p["lstm"])                             # [S, 512]
    dur = linear(x, p["duration_proj"])                     # [S, max_dur]
    dur = jax.nn.sigmoid(dur).sum(axis=-1) / speed
    return d, dur


# ----------------------------------------------------------------- vocoder

def _stft_mag_phase(x, n_fft, hop):
    """torch.stft(center=True, hann) magnitudes+phase: x [T] -> ([bins,F],)"""
    pad = n_fft // 2
    xp = jnp.pad(x, (pad, pad), mode="reflect")
    n_frames = (xp.shape[0] - n_fft) // hop + 1
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :])
    frames = xp[idx] * _hann(n_fft)
    spec = jnp.fft.rfft(frames, axis=-1)                    # [F, bins]
    return jnp.abs(spec).T, jnp.angle(spec).T               # [bins, F]


def _hann(n):
    # torch.hann_window(periodic=True)
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / n)


def _istft(mag, phase, n_fft, hop, length=None):
    """torch.istft(center=True): mag/phase [bins, F] -> [T]."""
    spec = (mag * jnp.exp(1j * phase)).T                    # [F, bins]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * _hann(n_fft)
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros(out_len, _F32).at[idx].add(frames.reshape(-1))
    wsq = jnp.zeros(out_len, _F32).at[idx].add(
        jnp.tile(_hann(n_fft) ** 2, (n_frames,)))
    sig = sig / jnp.maximum(wsq, 1e-11)
    sig = sig[n_fft // 2:out_len - n_fft // 2]
    return sig if length is None else sig[:length]


def sine_source(f0_up, p, key, *, sampling_rate=24000, upsample_scale=300,
                harmonic_num=8, sine_amp=0.1, noise_std=0.003,
                voiced_threshold=10.0):
    """SourceModuleHnNSF: f0_up [samples] -> harmonic source [samples].

    SineGen with the interpolated-phase formulation (istftnet.py SineGen):
    per-harmonic rad values are linearly downsampled by ``upsample_scale``,
    cumulatively summed at frame rate, then the phase is linearly upsampled
    back — matching torch's F.interpolate(mode='linear',
    align_corners=False) semantics via jax.image.resize.
    """
    n = f0_up.shape[0]
    harmonics = jnp.arange(1, harmonic_num + 2, dtype=_F32)  # [9]
    fn = f0_up[:, None] * harmonics[None, :]                 # [n, 9]
    rad = (fn / sampling_rate) % 1.0
    k1, k2 = jax.random.split(key)
    rand_ini = jax.random.uniform(k1, (harmonic_num + 1,))
    rand_ini = rand_ini.at[0].set(0.0)
    rad = rad.at[0, :].add(rand_ini)
    # downsample to frame rate (linear), cumsum, upsample phase
    frames = n // upsample_scale
    rad_ds = jax.image.resize(rad, (frames, rad.shape[1]), "linear")
    phase = jnp.cumsum(rad_ds, axis=0) * 2 * jnp.pi
    phase_up = jax.image.resize(phase * upsample_scale, (n, rad.shape[1]),
                                "linear") / upsample_scale
    sines = jnp.sin(phase_up * upsample_scale)
    uv = (f0_up > voiced_threshold).astype(_F32)[:, None]
    sine_waves = sines * sine_amp
    noise_amp = uv * noise_std + (1 - uv) * sine_amp / 3
    noise = noise_amp * jax.random.normal(k2, sine_waves.shape)
    sine_waves = sine_waves * uv + noise
    merged = jnp.tanh(linear(sine_waves, p["l_linear"]))[:, 0]  # [n]
    return merged


def generator_forward(x, s, f0, p, key, *, n_fft=20, hop=5,
                      upsample_rates=(10, 6), num_kernels=3):
    """iSTFTNet generator: x [1, 512, 2T], s [1,128], f0 [1, 2T] -> audio."""
    upsample_scale = int(np.prod(upsample_rates)) * hop      # 300
    f0_up = jnp.repeat(f0[0], upsample_scale)                # nearest
    har = sine_source(f0_up, p["m_source"], key,
                      upsample_scale=upsample_scale)
    har_spec, har_phase = _stft_mag_phase(har, n_fft, hop)
    har_cat = jnp.concatenate([har_spec, har_phase], axis=0)[None]  # [1,22,F]

    n_up = len(upsample_rates)
    for i in range(n_up):
        x = leaky_relu(x, 0.1)
        nc = p["noise_convs"][i]
        if i + 1 < n_up:
            stride_f0 = int(np.prod(upsample_rates[i + 1:]))
            x_source = conv1d(har_cat, nc["w"], nc["b"], stride=stride_f0,
                              padding=(stride_f0 + 1) // 2)
        else:
            x_source = conv1d(har_cat, nc["w"], nc["b"])
        x_source = adain_resblock1(x_source, s, p["noise_res"][i])
        up = p["ups"][i]
        k = up["w"].shape[-1]
        x = conv_transpose1d(x, up["w"], up["b"],
                             stride=upsample_rates[i],
                             padding=(k - upsample_rates[i]) // 2)
        if i == n_up - 1:
            x = jnp.pad(x, ((0, 0), (0, 0), (1, 0)), mode="reflect")
        x = x + x_source
        xs = None
        for j in range(num_kernels):
            r = adain_resblock1(x, s, p["resblocks"][i * num_kernels + j])
            xs = r if xs is None else xs + r
        x = xs / num_kernels
    x = leaky_relu(x, 0.01)
    x = conv1d(x, p["conv_post_w"], p["conv_post_b"], padding=3)
    half = n_fft // 2 + 1
    spec = jnp.exp(x[0, :half])
    phase = jnp.sin(x[0, half:])
    return _istft(spec, phase, n_fft, hop)


def snake(x, alpha):
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


def adain_resblock1(x, s, p, dilations=(1, 3, 5)):
    """Generator AdaINResBlock1 (snake + AdaIN, 3 dilated conv pairs).
    Dilations/paddings are static (derived from the conv kernel shapes) —
    int leaves in the jitted param pytree would trace and break conv
    geometry arguments."""
    for conv, dil in zip(p["convs"], dilations):
        k = conv["c1_w"].shape[-1]
        xt = ada_in(x, s, conv["adain1"])
        xt = snake(xt, conv["alpha1"])
        xt = conv1d(xt, conv["c1_w"], conv["c1_b"], dilation=dil,
                    padding=(k - 1) * dil // 2)
        xt = ada_in(xt, s, conv["adain2"])
        xt = snake(xt, conv["alpha2"])
        xt = conv1d(xt, conv["c2_w"], conv["c2_b"], padding=(k - 1) // 2)
        x = xt + x
    return x


# ----------------------------------------------------------------- decoder

def decoder_forward(asr, f0_curve, n_curve, s, p, key):
    """istftnet Decoder: asr [1,512,T], F0/N [1,2T], s [1,128] -> audio."""
    f0 = conv1d(f0_curve[:, None, :], p["F0_conv_w"], p["F0_conv_b"],
                stride=2, padding=1)                         # [1,1,T]
    n = conv1d(n_curve[:, None, :], p["N_conv_w"], p["N_conv_b"],
               stride=2, padding=1)
    x = jnp.concatenate([asr, f0, n], axis=1)                # [1,514,T]
    x = adain_resblk1d(x, s, p["encode"])
    asr_res = conv1d(asr, p["asr_res_w"], p["asr_res_b"])    # [1,64,T]
    res = True
    for i, blk in enumerate(p["decode"]):
        up = (i == len(p["decode"]) - 1)
        if res:
            x = jnp.concatenate([x, asr_res, f0, n], axis=1)
        x = adain_resblk1d(x, s, blk, upsample=up)
        if up:
            res = False
    return generator_forward(x, s, f0_curve, p["generator"], key)


# -------------------------------------------------------------- full model

def kmodel_forward(ids, ref_s, params, *, speed=1.0, total_frames=None,
                   n_albert_layers=12, albert_heads=12, albert_act="gelu_new",
                   max_frames_per_token=20, key=None):
    """Full Kokoro forward: phoneme ids [S] (without bos/eos), voice ref_s
    [256] -> (audio [samples], pred_dur [S+2]).

    ``total_frames`` is the static alignment budget (defaults to
    S*max_frames_per_token); the true duration sum is clamped into it and
    the audio is valid for the first ``sum(dur)*600`` samples.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    ids_b = jnp.concatenate([jnp.zeros(1, jnp.int32), ids,
                             jnp.zeros(1, jnp.int32)])
    s_len = ids_b.shape[0]
    total = total_frames or s_len * max_frames_per_token

    bert = albert_forward(ids_b, params["bert"], n_layers=n_albert_layers,
                          n_heads=albert_heads, act=albert_act)  # [S, 768]
    d_en = linear(bert, params["bert_encoder"]).T[None]          # [1,512,S]

    style = ref_s[128:]                                          # prosody
    d, dur = predict_durations(d_en, style, params["predictor"], speed)
    pred_dur = jnp.clip(jnp.round(dur), 1, max_frames_per_token).astype(jnp.int32)
    true_total = jnp.minimum(jnp.sum(pred_dur), total)
    idx = jnp.repeat(jnp.arange(s_len), pred_dur, total_repeat_length=total)
    frame_valid = (jnp.arange(total) < true_total)[None, None, :]

    en = d[0][idx].T[None] * frame_valid                         # [1,640,T]
    f0_pred, n_pred = f0n_train(en, style, params["predictor"])  # [1,2T]

    t_en = text_encoder_forward(ids_b, params["text_encoder"])   # [1,512,S]
    asr = t_en[0].T[idx].T[None] * frame_valid                   # [1,512,T]

    audio = decoder_forward(asr, f0_pred, n_pred, ref_s[None, :128],
                            params["decoder"], key)
    return audio, pred_dur, true_total
