"""Pure-torch whole-model replicas of the Encodec encoder and Vocos vocoder.

LICENSE NOTE: these test-only fixtures restate the architectures of Meta's
encodec (MIT, github.com/facebookresearch/encodec) and charactr's vocos (MIT,
github.com/gemelo-ai/vocos) in plain torch, by necessity mirroring those
projects' documented module semantics. If this file ever leaves the test
sandbox, carry the upstream MIT attributions with it.

The ``encodec`` and ``vocos`` pip packages are not installed in this image, so
these modules restate their architectures in plain torch as INDEPENDENT test
oracles for the JAX implementations (mars5_tts_tpu/models/{encodec,vocos}.py).
They follow the upstream sources' documented semantics:

* SEANet encoder (encodec/modules/seanet.py + conv.py): causal SConv1d pads
  (padding_total, extra_padding) in ONE reflect pad1d call — so the trailing
  "extra" padding that covers the final partial frame is REFLECT, not zeros —
  with pad1d's short-input zero-extension fallback; ResnetBlock with
  true_skip=False (1x1 shortcut conv); 2-layer residual LSTM; weight-normed
  convs (the replicas use torch's legacy weight_norm so their state_dicts carry
  the official ``weight_g``/``weight_v`` keys the converter must fold).
* Residual VQ (encodec/quantization/core_vq.py): per-stage L2
  nearest-neighbour on the running residual.
* Vocos backbone + ISTFT head (vocos/models.py + heads.py + spectral_ops.py):
  k7 embed conv (same padding), AdaLayerNorm conditioned on bandwidth id,
  ConvNeXt-1d blocks, exp-magnitude/phase head, hann-windowed overlap-add
  inverse STFT with "same" padding crop and squared-window envelope
  normalization.

State-dict key names match the official checkpoints exactly, so the converter
round-trip (convert_encodec / convert_vocos) is exercised on authentically
shaped inputs.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Encodec SEANet encoder + RVQ


def get_extra_padding_for_conv1d(x, kernel_size: int, stride: int,
                                 padding_total: int) -> int:
    length = x.shape[-1]
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal_length = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return max(ideal_length - length, 0)


def pad1d(x, paddings, mode: str = "zero", value: float = 0.0):
    """encodec's pad1d: reflect mode zero-extends inputs shorter than the pad."""
    length = x.shape[-1]
    if mode == "reflect":
        max_pad = max(paddings)
        extra_pad = 0
        if length <= max_pad:
            extra_pad = max_pad - length + 1
            x = F.pad(x, (0, extra_pad))
        padded = F.pad(x, paddings, mode)
        end = padded.shape[-1] - extra_pad
        return padded[..., :end]
    return F.pad(x, paddings, mode, value)


class SConv1dReplica(nn.Module):
    """Causal weight-normed conv with encodec's padding semantics."""

    def __init__(self, cin, cout, kernel, stride=1, dilation=1,
                 pad_mode="reflect"):
        super().__init__()
        # nesting matches encodec: SConv1d.conv = NormConv1d, NormConv1d.conv =
        # weight_norm(nn.Conv1d) -> keys "...conv.conv.weight_g/weight_v/bias"
        class NormConv1d(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv = torch.nn.utils.weight_norm(
                    nn.Conv1d(cin, cout, kernel, stride, dilation=dilation))

            def forward(self, x):
                return self.conv(x)

        self.conv = NormConv1d()
        self.stride = stride
        self.dilation = dilation
        self.kernel = kernel
        self.pad_mode = pad_mode

    def forward(self, x):
        eff_k = (self.kernel - 1) * self.dilation + 1
        padding_total = eff_k - self.stride
        extra = get_extra_padding_for_conv1d(x, eff_k, self.stride, padding_total)
        x = pad1d(x, (padding_total, extra), mode=self.pad_mode)
        return self.conv(x)


class ResnetBlockReplica(nn.Module):
    def __init__(self, dim, compress=2, res_kernel=3):
        super().__init__()
        hidden = dim // compress
        self.block = nn.Sequential(
            nn.ELU(), SConv1dReplica(dim, hidden, res_kernel),
            nn.ELU(), SConv1dReplica(hidden, dim, 1))
        self.shortcut = SConv1dReplica(dim, dim, 1)  # true_skip=False

    def forward(self, x):
        return self.shortcut(x) + self.block(x)


class SLSTMReplica(nn.Module):
    def __init__(self, dim, num_layers=2):
        super().__init__()
        self.lstm = nn.LSTM(dim, dim, num_layers)

    def forward(self, x):
        x = x.permute(2, 0, 1)
        y, _ = self.lstm(x)
        y = y + x  # skip=True
        return y.permute(1, 2, 0)


class SEANetEncoderReplica(nn.Module):
    """Matches SEANetEncoder(...) of encodec_model_24khz: n_filters=32,
    ratios=[8,5,4,2] (used reversed), dimension=128, causal."""

    def __init__(self, channels=1, dimension=128, n_filters=32,
                 ratios=(8, 5, 4, 2), kernel_size=7, last_kernel_size=7,
                 residual_kernel_size=3, compress=2, lstm=2):
        super().__init__()
        mult = 1
        model = [SConv1dReplica(channels, mult * n_filters, kernel_size)]
        for ratio in reversed(ratios):
            model += [
                ResnetBlockReplica(mult * n_filters, compress, residual_kernel_size),
                nn.ELU(),
                SConv1dReplica(mult * n_filters, mult * n_filters * 2,
                               ratio * 2, stride=ratio),
            ]
            mult *= 2
        model += [SLSTMReplica(mult * n_filters, lstm), nn.ELU(),
                  SConv1dReplica(mult * n_filters, dimension, last_kernel_size)]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


def rvq_encode_torch(codebooks, emb):
    """codebooks: (n_q, bins, D) tensor; emb: (B, D, T) -> (B, n_q, T)."""
    residual = emb.permute(0, 2, 1)  # (B, T, D)
    out = []
    for q in range(codebooks.shape[0]):
        e = codebooks[q]
        dist = torch.cdist(residual.reshape(-1, e.shape[-1]), e)
        idx = dist.argmin(-1).reshape(residual.shape[:2])
        residual = residual - e[idx]
        out.append(idx)
    return torch.stack(out, 1)


def make_encodec_state_dict(cfg, seed=0):
    """Random official-shaped encodec state_dict (+ the torch replica itself)."""
    torch.manual_seed(seed)
    enc = SEANetEncoderReplica(
        channels=cfg.channels, dimension=cfg.dimension, n_filters=cfg.n_filters,
        ratios=tuple(cfg.ratios), kernel_size=cfg.kernel_size,
        last_kernel_size=cfg.last_kernel_size,
        residual_kernel_size=cfg.residual_kernel_size, compress=cfg.compress,
        lstm=cfg.lstm_layers)
    enc = enc.eval()
    codebooks = torch.randn(cfg.n_q, cfg.codebook_size, cfg.dimension)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    for q in range(cfg.n_q):
        sd[f"quantizer.vq.layers.{q}._codebook.embed"] = codebooks[q]
    return enc, codebooks, sd


# ---------------------------------------------------------------------------
# Vocos


class AdaLayerNormReplica(nn.Module):
    def __init__(self, num_embeddings, dim, eps=1e-6):
        super().__init__()
        self.eps = eps
        self.dim = dim
        self.scale = nn.Embedding(num_embeddings, dim)
        self.shift = nn.Embedding(num_embeddings, dim)
        nn.init.ones_(self.scale.weight)
        nn.init.zeros_(self.shift.weight)

    def forward(self, x, cond_id):
        x = F.layer_norm(x, (self.dim,), eps=self.eps)
        return x * self.scale(cond_id) + self.shift(cond_id)


class ConvNeXtBlockReplica(nn.Module):
    def __init__(self, dim, intermediate_dim, num_embeddings, layer_scale=1e-6):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.norm = AdaLayerNormReplica(num_embeddings, dim)
        self.pwconv1 = nn.Linear(dim, intermediate_dim)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(intermediate_dim, dim)
        self.gamma = nn.Parameter(torch.full((dim,), layer_scale))

    def forward(self, x, cond_id):
        residual = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.norm(x, cond_id)
        x = self.pwconv2(self.act(self.pwconv1(x)))
        x = self.gamma * x
        return residual + x.transpose(1, 2)


class VocosBackboneReplica(nn.Module):
    def __init__(self, input_channels, dim, intermediate_dim, num_layers,
                 num_embeddings, eps=1e-6):
        super().__init__()
        self.embed = nn.Conv1d(input_channels, dim, 7, padding=3)
        self.norm = AdaLayerNormReplica(num_embeddings, dim, eps)
        self.convnext = nn.ModuleList(
            [ConvNeXtBlockReplica(dim, intermediate_dim, num_embeddings)
             for _ in range(num_layers)])
        self.final_layer_norm = nn.LayerNorm(dim, eps=eps)

    def forward(self, x, bandwidth_id):
        x = self.embed(x)
        x = self.norm(x.transpose(1, 2), bandwidth_id).transpose(1, 2)
        for block in self.convnext:
            x = block(x, bandwidth_id)
        return self.final_layer_norm(x.transpose(1, 2))


class ISTFTHeadReplica(nn.Module):
    def __init__(self, dim, n_fft, hop_length):
        super().__init__()
        self.out = nn.Linear(dim, n_fft + 2)
        self.n_fft = n_fft
        self.hop = hop_length
        self.register_buffer("window", torch.hann_window(n_fft))

    def forward(self, x):
        x = self.out(x).transpose(1, 2)
        mag, p = x.chunk(2, dim=1)
        mag = torch.exp(mag).clamp(max=1e2)
        spec = mag * (torch.cos(p) + 1j * torch.sin(p))
        # vocos spectral_ops.ISTFT, padding="same"
        pad = (self.n_fft - self.hop) // 2
        ifft = torch.fft.irfft(spec, self.n_fft, dim=1, norm="backward")
        ifft = ifft * self.window[None, :, None]
        b, _, t = ifft.shape
        output_size = (t - 1) * self.hop + self.n_fft
        y = F.fold(ifft, output_size=(1, output_size), kernel_size=(1, self.n_fft),
                   stride=(1, self.hop))[:, 0, 0, pad:-pad]
        win_sq = self.window.square().expand(1, t, -1).transpose(1, 2)
        env = F.fold(win_sq, output_size=(1, output_size),
                     kernel_size=(1, self.n_fft), stride=(1, self.hop))[0, 0, 0]
        env = env[pad:-pad]
        return y / env.clamp(min=1e-11)


class VocosReplica(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.backbone = VocosBackboneReplica(
            cfg.input_channels, cfg.dim, cfg.intermediate_dim, cfg.num_layers,
            cfg.adanorm_num_embeddings, cfg.eps)
        self.head = ISTFTHeadReplica(cfg.dim, cfg.n_fft, cfg.hop_length)

    def forward(self, features, bandwidth_id):
        return self.head(self.backbone(features, bandwidth_id))


def make_vocos_state_dict(cfg, seed=0):
    """Random official-shaped vocos state_dict (+ the torch replica itself)."""
    torch.manual_seed(seed)
    voc = VocosReplica(cfg).eval()
    # perturb the Ada/gamma params so parity is non-trivial
    with torch.no_grad():
        for m in voc.modules():
            if isinstance(m, AdaLayerNormReplica):
                m.scale.weight.add_(0.1 * torch.randn_like(m.scale.weight))
                m.shift.weight.add_(0.1 * torch.randn_like(m.shift.weight))
            if isinstance(m, ConvNeXtBlockReplica):
                m.gamma.add_(0.1 * torch.rand_like(m.gamma))
    # official names: backbone.*, head.out.* (the hann window buffer is not a key)
    sd = {k: v for k, v in voc.state_dict().items() if "window" not in k}
    codebooks = torch.randn(cfg.n_codebooks, cfg.codebook_size, cfg.input_channels)
    for k in range(cfg.n_codebooks):
        sd[f"feature_extractor.encodec.quantizer.vq.layers.{k}._codebook.embed"] = codebooks[k]
    return voc, codebooks, sd
