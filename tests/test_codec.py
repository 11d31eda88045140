"""Encodec encoder & Vocos vocoder: primitive-level oracles vs torch + invariants.

The encodec/vocos pip packages are not installed in this image, so full-model
weight parity is exercised via the converters' naming contract and primitive-level
golden tests against torch (Conv1d, LSTM, cdist-argmin RVQ, ConvNeXt block,
overlap-add iSTFT) — each primitive is the exact op the external package executes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_causal_conv_matches_torch():
    import torch
    from mars5_tts_tpu.models.encodec import sconv1d

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    for (cin, cout, k, stride, dil, t) in [(4, 8, 7, 1, 1, 50), (8, 16, 8, 4, 1, 50),
                                           (4, 4, 3, 1, 2, 37), (6, 2, 10, 5, 1, 43)]:
        w = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.3
        b = rng.standard_normal(cout).astype(np.float32)
        x = rng.standard_normal((2, cin, t)).astype(np.float32)

        # torch oracle: encodec SConv1d = ONE reflect pad of (total, extra) + conv
        # (upstream pad1d applies left and right padding together in reflect mode)
        eff_k = (k - 1) * dil + 1
        padding_total = eff_k - stride
        n_frames = (t - eff_k + padding_total) / stride + 1
        ideal = (int(np.ceil(n_frames)) - 1) * stride + (eff_k - padding_total)
        extra = max(ideal - t, 0)
        xt = torch.tensor(x)
        xt = torch.nn.functional.pad(xt, (padding_total, extra), mode="reflect")
        ref = torch.nn.functional.conv1d(xt, torch.tensor(w), torch.tensor(b),
                                         stride=stride, dilation=dil)
        ours = sconv1d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                       jnp.asarray(x), stride=stride, dilation=dil)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                                   err_msg=f"conv k={k} s={stride} d={dil}")


def test_lstm_matches_torch():
    import torch
    from mars5_tts_tpu.models.encodec import slstm

    torch.manual_seed(1)
    d, t, b = 12, 20, 2
    lstm = torch.nn.LSTM(d, d, num_layers=2)
    x = torch.randn(t, b, d)
    with torch.inference_mode():
        y_ref, _ = lstm(x)
    y_ref = y_ref + x  # encodec SLSTM skip

    p = {"layers": [
        {"w_ih": lstm.weight_ih_l0.detach().numpy(), "w_hh": lstm.weight_hh_l0.detach().numpy(),
         "b_ih": lstm.bias_ih_l0.detach().numpy(), "b_hh": lstm.bias_hh_l0.detach().numpy()},
        {"w_ih": lstm.weight_ih_l1.detach().numpy(), "w_hh": lstm.weight_hh_l1.detach().numpy(),
         "b_ih": lstm.bias_ih_l1.detach().numpy(), "b_hh": lstm.bias_hh_l1.detach().numpy()},
    ]}
    x_bct = jnp.asarray(x.numpy().transpose(1, 2, 0))  # (B, C, T)
    ours = slstm(p, x_bct)  # (B, C, T)
    np.testing.assert_allclose(np.asarray(ours).transpose(2, 0, 1), y_ref.numpy(),
                               atol=2e-5)


def test_rvq_matches_torch_cdist():
    import torch
    from mars5_tts_tpu.models.encodec import rvq_encode

    rng = np.random.default_rng(2)
    nq, bins, d, t = 4, 32, 16, 25
    codebooks = rng.standard_normal((nq, bins, d)).astype(np.float32)
    emb = rng.standard_normal((2, d, t)).astype(np.float32)

    # torch oracle: sequential nearest-neighbor on residuals
    x = torch.tensor(emb).permute(0, 2, 1)
    codes_ref = []
    residual = x
    for q in range(nq):
        e = torch.tensor(codebooks[q])
        dist = torch.cdist(residual.reshape(-1, d), e)
        idx = dist.argmin(-1).reshape(2, t)
        codes_ref.append(idx)
        residual = residual - e[idx]
    codes_ref = torch.stack(codes_ref, dim=1).numpy()

    ours = rvq_encode(jnp.asarray(codebooks), jnp.asarray(emb), nq)
    np.testing.assert_array_equal(np.asarray(ours), codes_ref)


@pytest.mark.slow
def test_encodec_encode_shapes_and_range():
    from mars5_tts_tpu.models.encodec import EncodecConfig, encodec_encode, init_encodec

    cfg = EncodecConfig.tiny()
    params = init_encodec(jax.random.PRNGKey(0), cfg)
    t = 24 * cfg.hop_length + 3  # non-multiple of hop: extra padding path
    audio = jnp.asarray(np.random.default_rng(3).standard_normal((1, 1, t)),
                        jnp.float32) * 0.1
    codes = encodec_encode(params, cfg, audio)
    assert codes.shape == (1, cfg.n_q, int(np.ceil(t / cfg.hop_length)))
    assert codes.min() >= 0 and codes.max() < cfg.codebook_size


@pytest.mark.heavy
def test_encodec_streaming_causality():
    """Causal encoder: truncating the input does not change earlier frames."""
    from mars5_tts_tpu.models.encodec import EncodecConfig, encoder_forward, init_encodec

    cfg = EncodecConfig.tiny()
    params = init_encodec(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(4)
    audio = rng.standard_normal((1, 1, 40 * cfg.hop_length)).astype(np.float32) * 0.1
    full = np.asarray(encoder_forward(params, cfg, jnp.asarray(audio)))
    half = np.asarray(encoder_forward(params, cfg, jnp.asarray(audio[..., : 20 * cfg.hop_length])))
    np.testing.assert_allclose(full[..., : half.shape[-1] - 1], half[..., :-1],
                               atol=1e-4)


def test_convnext_block_matches_torch():
    import torch
    from mars5_tts_tpu.models.vocos import VocosConfig, convnext_block

    torch.manual_seed(5)
    cfg = VocosConfig.tiny()
    d, inter, t = cfg.dim, cfg.intermediate_dim, 11
    rng = np.random.default_rng(5)
    p = {
        "dwconv_w": rng.standard_normal((d, 1, 7)).astype(np.float32) * 0.2,
        "dwconv_b": rng.standard_normal(d).astype(np.float32),
        "norm": {"scale": rng.standard_normal((4, d)).astype(np.float32),
                 "shift": rng.standard_normal((4, d)).astype(np.float32)},
        "pwconv1_w": rng.standard_normal((inter, d)).astype(np.float32) * 0.2,
        "pwconv1_b": rng.standard_normal(inter).astype(np.float32),
        "pwconv2_w": rng.standard_normal((d, inter)).astype(np.float32) * 0.2,
        "pwconv2_b": rng.standard_normal(d).astype(np.float32),
        "gamma": rng.standard_normal(d).astype(np.float32),
    }
    x = rng.standard_normal((2, d, t)).astype(np.float32)
    cond = 1

    # torch oracle (vocos ConvNeXtBlock forward)
    xt = torch.tensor(x)
    h = torch.nn.functional.conv1d(xt, torch.tensor(p["dwconv_w"]),
                                   torch.tensor(p["dwconv_b"]), padding=3, groups=d)
    h = h.transpose(1, 2)
    h = torch.nn.functional.layer_norm(h, (d,), eps=1e-6)
    h = h * torch.tensor(p["norm"]["scale"][cond]) + torch.tensor(p["norm"]["shift"][cond])
    h = h @ torch.tensor(p["pwconv1_w"]).T + torch.tensor(p["pwconv1_b"])
    h = torch.nn.functional.gelu(h)
    h = h @ torch.tensor(p["pwconv2_w"]).T + torch.tensor(p["pwconv2_b"])
    h = torch.tensor(p["gamma"]) * h
    ref = xt + h.transpose(1, 2)

    ours = convnext_block(jax.tree.map(jnp.asarray, p), jnp.asarray(x), cond, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_istft_same_matches_torch_fold_oracle():
    import torch
    from mars5_tts_tpu.models.vocos import istft_same

    n_fft, hop, t = 64, 16, 12
    rng = np.random.default_rng(6)
    spec = (rng.standard_normal((2, n_fft // 2 + 1, t))
            + 1j * rng.standard_normal((2, n_fft // 2 + 1, t))).astype(np.complex64)
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)

    # torch oracle replicating vocos spectral_ops.ISTFT(padding="same")
    st = torch.tensor(spec)
    ifft = torch.fft.irfft(st, n_fft, dim=1, norm="backward")
    ifft = ifft * torch.tensor(window)[None, :, None]
    output_size = (t - 1) * hop + n_fft
    y = torch.nn.functional.fold(
        ifft, output_size=(1, output_size), kernel_size=(1, n_fft), stride=(1, hop),
    )[:, 0, 0, :]
    win_sq = torch.tensor(window ** 2).expand(t, -1).T.unsqueeze(0)
    env = torch.nn.functional.fold(
        win_sq, output_size=(1, output_size), kernel_size=(1, n_fft), stride=(1, hop),
    ).squeeze()
    pad = (n_fft - hop) // 2
    ref = (y / env.clamp(min=1e-11))[:, pad:-pad]

    ours = istft_same(jnp.asarray(spec), n_fft, hop, jnp.asarray(window))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_istft_roundtrip_reconstruction():
    """iSTFT(STFT(x)) == x in the interior (perfect-reconstruction window/hop)."""
    import torch
    from mars5_tts_tpu.models.vocos import istft_same

    n_fft, hop = 64, 16
    rng = np.random.default_rng(7)
    x = rng.standard_normal(16 * hop).astype(np.float32)
    window = torch.hann_window(n_fft)
    spec = torch.stft(torch.tensor(x), n_fft, hop, window=window, center=True,
                      pad_mode="reflect", return_complex=True)
    # vocos "same" crop corresponds to torch center padding of n_fft//2 up to
    # (n_fft-hop)//2 — compare the interior region
    ours = np.asarray(istft_same(jnp.asarray(spec.numpy())[None], n_fft, hop,
                                 jnp.asarray(window.numpy())))[0]
    lead = n_fft // 2 - (n_fft - hop) // 2
    core = slice(n_fft, len(x) - n_fft)
    np.testing.assert_allclose(ours[lead:][: len(x)][core], x[core], atol=1e-4)


def test_vocos_vocode_end_to_end_shape():
    from mars5_tts_tpu.models.vocos import VocosConfig, init_vocos, vocos_vocode

    cfg = VocosConfig.tiny()
    p = init_vocos(jax.random.PRNGKey(2), cfg)
    t = 19
    tokens = jnp.asarray(np.random.default_rng(8).integers(0, cfg.codebook_size,
                                                           (t, cfg.n_codebooks)))
    audio = vocos_vocode(p, cfg, tokens, bandwidth_id=1)
    assert audio.shape == (t * cfg.hop_length,)  # one hop of samples per frame
    assert np.isfinite(np.asarray(audio)).all()


def test_encodec_converter_naming_contract():
    """convert_encodec consumes the official checkpoint naming (synthetic sd)."""
    import torch
    from mars5_tts_tpu.models.encodec import (EncodecConfig, convert_encodec,
                                              encodec_encode)

    cfg = EncodecConfig.tiny()
    rng = np.random.default_rng(9)
    nf = cfg.n_filters
    sd = {}

    def add_conv(prefix, cout, cin, k, weight_norm=True):
        v = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.2
        if weight_norm:
            g = np.linalg.norm(v, axis=(1, 2), keepdims=True) * 0.9
            sd[f"{prefix}.weight_g"] = torch.tensor(g)
            sd[f"{prefix}.weight_v"] = torch.tensor(v)
        else:
            sd[f"{prefix}.weight"] = torch.tensor(v)
        sd[f"{prefix}.bias"] = torch.tensor(rng.standard_normal(cout).astype(np.float32))

    add_conv("encoder.model.0.conv.conv", nf, 1, cfg.kernel_size)
    idx, mult = 1, 1
    for ratio in reversed(cfg.ratios):
        d = mult * nf
        add_conv(f"encoder.model.{idx}.block.1.conv.conv", d // 2, d, 3)
        add_conv(f"encoder.model.{idx}.block.3.conv.conv", d, d // 2, 1)
        add_conv(f"encoder.model.{idx}.shortcut.conv.conv", d, d, 1)
        add_conv(f"encoder.model.{idx + 2}.conv.conv", d * 2, d, ratio * 2)
        idx += 3
        mult *= 2
    d = mult * nf
    for l in range(cfg.lstm_layers):
        sd[f"encoder.model.{idx}.lstm.weight_ih_l{l}"] = torch.randn(4 * d, d) * 0.05
        sd[f"encoder.model.{idx}.lstm.weight_hh_l{l}"] = torch.randn(4 * d, d) * 0.05
        sd[f"encoder.model.{idx}.lstm.bias_ih_l{l}"] = torch.zeros(4 * d)
        sd[f"encoder.model.{idx}.lstm.bias_hh_l{l}"] = torch.zeros(4 * d)
    add_conv(f"encoder.model.{idx + 2}.conv.conv", cfg.dimension, d, cfg.last_kernel_size)
    for q in range(cfg.n_q):
        sd[f"quantizer.vq.layers.{q}._codebook.embed"] = torch.randn(
            cfg.codebook_size, cfg.dimension)

    params = convert_encodec(sd, cfg)
    audio = jnp.asarray(rng.standard_normal((1, 1, 10 * cfg.hop_length)), jnp.float32) * 0.1
    codes = encodec_encode(jax.tree.map(jnp.asarray, params), cfg, audio)
    assert codes.shape == (1, cfg.n_q, 10)

    # weight-norm folding: ||w|| per out-channel equals g
    w0 = params["init"]["w"]
    g0 = sd["encoder.model.0.conv.conv.weight_g"].numpy()
    np.testing.assert_allclose(np.linalg.norm(w0, axis=(1, 2)), g0[:, 0, 0], rtol=1e-5)
