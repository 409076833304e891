"""Localize the rerank-path HTSAT divergence (VERDICT round-2 weak #6).

The e2e rerank parity shows cosine-similarity errors up to 5e-3 while every
other path matches at ~3e-7 — and the error is common-mode across candidates
(differential error ~2e-5). This tool feeds ONE waveform through the PyTorch
reference HTSAT (random weights) and through our tower, comparing every
stage:

    power-spec -> logmel -> bn0 -> folded image -> patch_embed ->
    swin layer 0..3 -> final norm -> embedding

Run on CPU:  python tools/rerank_divergence.py  [--seconds 1.0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=1.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    import _reference
    from audioldm2_tpu import convert_htsat
    from audioldm2_tpu.models import htsat as jh
    from audioldm2_tpu.ops import nn as jnn

    htsat_mod = _reference.load("audioldm2.clap.open_clip.htsat")
    torch.manual_seed(0)

    class _AudioCfg(dict):
        __getattr__ = dict.__getitem__

    cfg_t = _AudioCfg(
        audio_length=1024, clip_samples=480000, mel_bins=64, sample_rate=48000,
        window_size=1024, hop_size=480, fmin=50, fmax=14000, class_num=527,
        model_type="HTSAT", model_name="base",
    )
    m = htsat_mod.create_htsat_model(cfg_t).eval()
    params = convert_htsat.convert_htsat(
        {k: np.asarray(v) for k, v in m.state_dict().items()}
    )
    cfg = jh.BASE

    rng = np.random.default_rng(0)
    n = int(48000 * args.seconds)
    wav = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
    wav_t = torch.from_numpy(wav)

    def diff(name, ours, ref):
        ours = np.asarray(ours, np.float32).reshape(-1)
        ref = np.asarray(ref, np.float32).reshape(-1)
        d = np.abs(ours - ref)
        scale = max(np.abs(ref).max(), 1e-12)
        print(f"{name:<28} max_abs={d.max():.3e}  rel={d.max() / scale:.3e}  "
              f"ref_absmax={scale:.3e}")

    # ---------------- reference stages ----------------
    with torch.no_grad():
        spec_r = m.spectrogram_extractor(wav_t)          # [B,1,T,F] power
        lm_r = m.logmel_extractor(spec_r)                # [B,1,T,64]
        xb = lm_r.transpose(1, 3)
        xb = m.bn0(xb)
        bn_r = xb.transpose(1, 3)                        # [B,1,T,64]
        img_r = m.reshape_wav2img(bn_r)                  # [B,1,256,256]
        pe_r = m.patch_embed(img_r)                      # [B,N,C]
        stages_r = []
        y = pe_r
        for layer in m.layers:
            y, _ = layer(y)
            stages_r.append(y)
        yn_r = m.norm(y)
        out_r = m({"waveform": wav_t}, device="cpu")

    # ---------------- our stages ----------------
    basis = jnp.asarray(jh.stft_ops.stft_basis(cfg.n_fft, cfg.n_fft))
    mag = jh.stft_ops.stft_magnitude(jnp.asarray(wav), basis, cfg.n_fft, cfg.hop_size)
    power = jnp.square(mag)                              # [B,F,T]
    diff("power spectrogram", jnp.transpose(power, (0, 2, 1)), spec_r[:, 0])

    mel_fb = jnp.asarray(jh.stft_ops.librosa_mel_filters(
        cfg.sample_rate, cfg.n_fft, cfg.mel_bins, cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,bft->btm", mel_fb, power, preferred_element_type=jnp.float32)
    logmel = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    diff("logmel", logmel, lm_r[:, 0])

    bn = params["bn0"]
    bno = (logmel - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5) * bn["scale"] + bn["bias"]
    diff("bn0", bno, bn_r[:, 0])

    t_frames = wav.shape[-1] // cfg.hop_size + 1
    interp = jh.bicubic_matrix(t_frames, cfg.spec_size * cfg.freq_ratio)
    img = jh.mel_image(params, cfg, jnp.asarray(wav), interp)  # [B,256,256,1]
    diff("folded image", jnp.transpose(img[..., 0], (0, 1, 2)), img_r[:, 0])

    x = jnn.conv2d(params["patch_embed"]["proj"], img,
                   stride=(cfg.patch_stride, cfg.patch_stride), padding="VALID")
    b, gh, gw, c = x.shape
    x = x.reshape(b, gh * gw, c)
    x = jnn.layer_norm(params["patch_embed"]["norm"], x)
    diff("patch_embed", x, pe_r)

    res = cfg.grid
    for i_layer, layer in enumerate(params["layers"]):
        heads = cfg.num_heads[i_layer]
        window = min(cfg.window_size, res)
        shift_base = window // 2 if res > cfg.window_size else 0
        rel_idx = jnp.asarray(jh._rel_pos_index(window))
        mask = (jnp.asarray(jh._swin_attn_mask(res, window, shift_base))
                if shift_base > 0 else None)
        for j, blk in enumerate(layer["blocks"]):
            shift = 0 if j % 2 == 0 else shift_base
            x = jh._swin_block(blk, x, res, heads, window, shift,
                               mask if shift > 0 else None, rel_idx)
        if "downsample" in layer:
            x = jh._patch_merge(layer["downsample"], x, res)
            res //= 2
        diff(f"swin layer {i_layer}", x, stages_r[i_layer])

    x = jnn.layer_norm(params["norm"], x)
    diff("final norm", x, yn_r)

    emb = jh.encode(params, wav, cfg)
    diff("embedding", emb, out_r["embedding"])


if __name__ == "__main__":
    main()
