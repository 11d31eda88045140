"""Real-checkpoint readiness drill (VERDICT r2 Next #5).

One command that, given the released MARS5 artifacts, proves this framework
loads and reproduces them:

    python scripts/verify_release.py --ar mars5_ar.safetensors --nar mars5_nar.safetensors \
        [--encodec encodec.ckpt --vocos vocos.ckpt] \
        [--ref-wav /root/reference/docs/assets/example_ref.wav]

Steps (each prints PASS/FAIL; nonzero exit on any failure):
  1. checkpoint + metadata-vocab load (reference wire format,
     /root/reference/inference.py:143-158, hubconf.py:11-15);
  2. forward conversion to native params (models/convert.py);
  3. strict reverse-load: convert back -> the actual reference torch modules
     with load_state_dict(strict=True) -> logit cross-check;
  4. AR shared-uniform token parity vs the mounted reference ar_generate;
  5. NAR shared-uniform grid parity vs the mounted reference diffuser;
  6. codec grids on --ref-wav through the converted Encodec/Vocos (printed +
     optionally compared against --expect-grid .npy).

Zero-egress today, so ``--synthesize tiny|full`` builds reference-exported
synthetic checkpoints first and runs the same drill against them — the day
real artifacts land, only the paths change.
"""

import argparse
import json
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_ROOT = "/root/reference"


def _add_reference():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "torchaudio" not in sys.modules:  # imported-but-unused by ar_generate
        sys.modules["torchaudio"] = types.ModuleType("torchaudio")


class Drill:
    def __init__(self):
        self.failures = []

    def check(self, name, fn):
        t0 = time.perf_counter()
        try:
            detail = fn()
            dt = time.perf_counter() - t0
            print(f"PASS  {name}  ({dt:.1f}s){': ' + str(detail) if detail else ''}")
        except Exception as e:  # noqa: BLE001 — drill reports and continues
            dt = time.perf_counter() - t0
            print(f"FAIL  {name}  ({dt:.1f}s): {type(e).__name__}: {e}")
            self.failures.append(name)


def synthesize(kind: str, outdir: Path):
    """Export reference-module random weights as release-shaped checkpoints."""
    import torch

    _add_reference()
    import mars5.model as ref_model

    from mars5_tts_tpu.hub import save_checkpoint
    from tests.fixtures import make_tokenizer_strings

    torch.manual_seed(0)
    texttok, speechtok, text_str, speech_str = make_tokenizer_strings()
    n_vocab = len(texttok.vocab) + len(speechtok.vocab)
    n_text_vocab = len(texttok.vocab) + 1
    vocab = {"texttok.model": text_str, "speechtok.model": speech_str}

    if kind == "full":
        ar = ref_model.CodecLM(n_vocab=n_vocab, dim=1536, dim_ff_scale=7 / 3)
        nar = ref_model.ResidualTransformer(n_text_vocab=n_text_vocab,
                                            n_quant=1025, p_cond_drop=0,
                                            dropout=0)
        cfgs = (None, None)  # released geometry is inferable from shapes
    else:
        ar = ref_model.CodecLM(n_vocab=n_vocab, dim=64, nhead=2, n_layers=2,
                               n_spk_layers=2, dim_ff_scale=1.5,
                               sliding_window=64)
        nar = ref_model.ResidualTransformer(n_text_vocab=n_text_vocab,
                                            n_quant=1025, dim=64, nhead=4,
                                            enc_layers=2, dec_layers=2,
                                            n_spk_layers=2, t_emb_dim=64,
                                            p_cond_drop=0, dropout=0)
        from mars5_tts_tpu.models.ar import CodecLMConfig
        from mars5_tts_tpu.models.nar import ResidualTransformerConfig
        ar_cfg = CodecLMConfig.tiny(n_vocab=n_vocab)
        nar_cfg = ResidualTransformerConfig.tiny(n_text_vocab=n_text_vocab)
        cfgs = (ar_cfg.__dict__, nar_cfg.__dict__)

    outdir.mkdir(parents=True, exist_ok=True)
    ar_path = outdir / "mars5_ar.safetensors"
    nar_path = outdir / "mars5_nar.safetensors"
    save_checkpoint(ar_path, {k: v.numpy() for k, v in ar.state_dict().items()},
                    vocab, config=cfgs[0])
    save_checkpoint(nar_path, {k: v.numpy() for k, v in nar.state_dict().items()},
                    vocab, config=cfgs[1])

    # official-shaped (weight-normed) codec state dicts exercise the on-the-fly
    # converters in load_codec_params exactly as real artifacts will
    from mars5_tts_tpu.models.encodec import EncodecConfig
    from mars5_tts_tpu.models.vocos import VocosConfig
    from tests.torch_replicas import (make_encodec_state_dict,
                                      make_vocos_state_dict)
    enc_cfg = EncodecConfig.mars5() if kind == "full" else EncodecConfig.tiny()
    voc_cfg = VocosConfig.mars5() if kind == "full" else VocosConfig.tiny()
    enc_path = outdir / "encodec.pt"
    voc_path = outdir / "vocos.pt"
    torch.save(make_encodec_state_dict(enc_cfg, seed=1)[2], enc_path)
    torch.save(make_vocos_state_dict(voc_cfg, seed=2)[2], voc_path)
    print(f"synthesized {kind} checkpoints in {outdir}")
    return ar_path, nar_path, enc_path, voc_path, enc_cfg, voc_cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ar")
    ap.add_argument("--nar")
    ap.add_argument("--encodec")
    ap.add_argument("--vocos")
    ap.add_argument("--ref-wav", default=f"{REF_ROOT}/docs/assets/example_ref.wav")
    ap.add_argument("--expect-grid", help=".npy of the expected codec grid")
    ap.add_argument("--synthesize", choices=["tiny", "full"],
                    help="build synthetic reference-exported ckpts first")
    ap.add_argument("--outdir", default="/tmp/mars5_release_drill")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # the drill is a numerics check

    codec_cfgs = [None, None]  # None -> released (mars5) geometry
    if args.synthesize:
        (args.ar, args.nar, enc_p, voc_p,
         codec_cfgs[0], codec_cfgs[1]) = synthesize(args.synthesize,
                                                    Path(args.outdir))
        args.encodec = args.encodec or str(enc_p)
        args.vocos = args.vocos or str(voc_p)
    if not (args.ar and args.nar):
        ap.error("--ar/--nar required (or --synthesize)")

    import torch

    _add_reference()
    import mars5.model as ref_model

    from mars5_tts_tpu.hub import load_checkpoint, load_tokenizers
    from mars5_tts_tpu.models.ar import CodecLMConfig, codeclm_forward
    from mars5_tts_tpu.models.convert import (convert_codeclm,
                                              convert_codeclm_back,
                                              convert_nar, convert_nar_back,
                                              infer_codeclm_config,
                                              infer_nar_config)
    from mars5_tts_tpu.models.nar import (ResidualTransformerConfig,
                                          nar_forward)

    drill = Drill()
    state = {}

    def step_load():
        state["ar_ckpt"] = load_checkpoint(args.ar)
        state["nar_ckpt"] = load_checkpoint(args.nar)
        texttok, speechtok = load_tokenizers(state["ar_ckpt"])
        state["texttok"], state["speechtok"] = texttok, speechtok
        state["n_text"] = len(texttok.vocab)
        state["n_vocab"] = len(texttok.vocab) + len(speechtok.vocab)
        return (f"text vocab {len(texttok.vocab)}, speech vocab "
                f"{len(speechtok.vocab)}")

    drill.check("load checkpoints + metadata vocabs", step_load)

    def step_convert():
        ar_sd = state["ar_ckpt"]["model"]
        nar_sd = state["nar_ckpt"]["model"]
        if state["ar_ckpt"].get("config"):
            ar_cfg = CodecLMConfig(**state["ar_ckpt"]["config"])
        else:
            ar_cfg = infer_codeclm_config(ar_sd, n_vocab=state["n_vocab"])
        if state["nar_ckpt"].get("config"):
            nar_cfg = ResidualTransformerConfig(**state["nar_ckpt"]["config"])
        else:
            nar_cfg = infer_nar_config(nar_sd)
        state["ar_cfg"], state["nar_cfg"] = ar_cfg, nar_cfg
        state["ar_params"] = convert_codeclm(ar_sd, ar_cfg)
        state["nar_params"] = convert_nar(nar_sd, nar_cfg)
        return f"AR dim {ar_cfg.dim}/{ar_cfg.n_layers}L, NAR dim {nar_cfg.dim}"

    drill.check("convert to native params", step_convert)
    if drill.failures:
        print(json.dumps({"drill": "verify_release", "failed": drill.failures}))
        sys.exit(1)

    ar_cfg, nar_cfg = state["ar_cfg"], state["nar_cfg"]

    def build_ref_modules():
        dff = ar_cfg.hidden_dim / ar_cfg.dim
        ar_ref = ref_model.CodecLM(
            n_vocab=ar_cfg.n_vocab, dim=ar_cfg.dim, nhead=ar_cfg.n_heads,
            n_layers=ar_cfg.n_layers, n_spk_layers=ar_cfg.n_spk_layers,
            dim_ff_scale=dff, sliding_window=ar_cfg.sliding_window).eval()
        nar_ref = ref_model.ResidualTransformer(
            n_text_vocab=nar_cfg.n_text_vocab, n_quant=nar_cfg.n_quant,
            dim=nar_cfg.dim, nhead=nar_cfg.nhead,
            enc_layers=nar_cfg.enc_layers, dec_layers=nar_cfg.dec_layers,
            n_spk_layers=nar_cfg.n_spk_layers, t_emb_dim=nar_cfg.t_emb_dim,
            p_cond_drop=0, dropout=0).eval()
        return ar_ref, nar_ref

    def step_strict_reverse():
        import jax.numpy as jnp
        ar_ref, nar_ref = build_ref_modules()
        ar_sd = {k: torch.tensor(np.asarray(v)) for k, v in
                 convert_codeclm_back(state["ar_params"], ar_cfg).items()}
        nar_sd = {k: torch.tensor(np.asarray(v)) for k, v in
                  convert_nar_back(state["nar_params"], nar_cfg).items()}
        ar_ref.load_state_dict(ar_sd, strict=True)
        nar_ref.load_state_dict(nar_sd, strict=True)
        state["ar_ref"], state["nar_ref"] = ar_ref, nar_ref
        # logit cross-checks on short sequences
        rng = np.random.default_rng(0)
        tokens = rng.integers(0, ar_cfg.n_vocab, (1, 6))
        spk = rng.integers(0, 1024, (1, 4, 8))
        with torch.inference_mode():
            t_out = ar_ref(torch.tensor(tokens), spk_reference=torch.tensor(spk))
        j_out = codeclm_forward(state["ar_params"], ar_cfg, jnp.asarray(tokens),
                                spk_codes=jnp.asarray(spk))
        ar_err = float(np.abs(np.asarray(j_out) - t_out.numpy()).max())
        assert ar_err < 5e-3, f"AR logit err {ar_err}"
        lt, lc, lx = 5, 4, 6
        c_text = rng.integers(0, nar_cfg.n_text_vocab, (1, lt))
        c_codes = rng.integers(0, 1024, (1, lc, 8))
        x = rng.integers(0, 1024, (1, lx, 8))
        with torch.inference_mode():
            t_nar = state["nar_ref"].forward(
                torch.tensor(c_text), torch.tensor(c_codes),
                torch.tensor([lt]), torch.tensor([lc]), torch.tensor(x),
                torch.zeros(1, lx, dtype=torch.bool),
                t=torch.tensor([1]), drop_cond=False)
        j_nar = nar_forward(state["nar_params"], nar_cfg, jnp.asarray(c_text),
                            jnp.asarray(c_codes), jnp.asarray([lt]),
                            jnp.asarray([lc]), jnp.asarray(x),
                            jnp.zeros((1, lx), bool), jnp.asarray([1]))
        nar_err = float(np.abs(np.asarray(j_nar)
                               - t_nar.permute(0, 1, 3, 2).numpy()).max())
        assert nar_err < 5e-3, f"NAR logit err {nar_err}"
        return f"strict=True ok; AR logit err {ar_err:.2e}, NAR {nar_err:.2e}"

    drill.check("strict reverse-load into reference modules", step_strict_reverse)

    def step_ar_parity():
        from mars5.ar_generate import ar_generate as ref_gen

        from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate

        texttok, speechtok = state["texttok"], state["speechtok"]
        n_text = len(texttok.vocab)
        n_speech = len(speechtok.vocab)
        rng = np.random.default_rng(7)
        prompt = np.concatenate([
            rng.integers(0, n_text, 6),
            rng.integers(n_text, n_text + n_speech - 2, 4)]).astype(np.int64)
        spk_codes = rng.integers(0, 1024, size=(5, 8))
        max_len = len(prompt) + 16
        uniforms = rng.random(max_len + 5)

        class MPatch:
            def __init__(self):
                self.i = 0

            def __call__(self, probs, num_samples=1, replacement=False):
                p = probs.detach().cpu().numpy().astype(np.float64)
                cdf = np.cumsum(p)
                u = uniforms[self.i]
                self.i += 1
                idx = int(np.searchsorted(cdf, u * cdf[-1], side="right"))
                return torch.tensor([idx], dtype=torch.long)

        kwargs = dict(temperature=0.7, topk=10, top_p=0.9, typical_p=1.0,
                      alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                      eos_penalty_factor=1.0, eos_penalty_decay=0.5,
                      n_phones_gen=10)
        orig = torch.multinomial
        try:
            torch.multinomial = MPatch()
            ref_tokens = ref_gen(texttok, speechtok, state["ar_ref"],
                                 torch.tensor(prompt), torch.tensor(spk_codes),
                                 7, max_len=max_len, fp16=False, vocode=False,
                                 use_kv_cache=True, beam_width=1,
                                 beam_length_penalty=1, **kwargs).numpy()
        finally:
            torch.multinomial = orig
        eos = n_text + speechtok.special_tokens["<|endofspeech|>"]
        s = ArSampling(temperature=0.7, top_k=10, top_p=0.9, typical_p=1.0,
                       alpha_frequency=1.0, alpha_presence=0.4,
                       penalty_window=5, eos_penalty_decay=0.5,
                       eos_penalty_factor=1.0, n_phones_gen=10, eos_idx=eos,
                       valid_start=n_text, valid_end=n_text + n_speech + 1,
                       max_len=max_len)
        ours, _ = ar_generate(state["ar_params"], ar_cfg, prompt, spk_codes,
                              sampling=s, uniforms=uniforms[:max_len])
        assert ours.tolist() == ref_tokens.tolist(), "AR token divergence"
        return f"{len(ref_tokens)} tokens identical"

    drill.check("AR shared-uniform token parity", step_ar_parity)

    def step_nar_parity():
        import mars5.diffuser as ref_diffuser

        from mars5_tts_tpu.config import DSH
        from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                             build_step_plan,
                                             perform_simple_inference)

        K, T = nar_cfg.n_quant, 6
        rng = np.random.default_rng(5)
        lt, lc, lx = 7, 5, 6
        c_text = rng.integers(0, nar_cfg.n_text_vocab, size=(1, lt))
        c_codes = rng.integers(0, K - 1, size=(1, lc, 8))
        x = rng.integers(0, K - 1, size=(1, lx, 8))
        xpm = np.zeros((1, lx), bool)
        t_lasts, is_rev, _ = build_step_plan(T, 1, 1)
        n = len(t_lasts)
        uniforms = rng.random((n, 2, 1, lx + lc, 8, K)).astype(np.float32)
        queue = []
        for i in range(n):
            queue.append(uniforms[i, 0])
            if is_rev[i] and t_lasts[i] != 0:
                queue.append(uniforms[i, 1])
        x_init = rng.integers(0, K, size=(1, lx, 8))

        orig_rand_like, orig_randint = torch.rand_like, torch.randint
        qi = iter(queue)

        def fake_rand_like(x, **kw):
            return torch.tensor(next(qi)[:, : x.shape[1]])

        def fake_randint(low, high, size, **kw):
            return torch.tensor(x_init)

        dsh_ref = ref_diffuser.DSH(last_greedy=True, x_0_temp=0.7,
                                   guidance_w=3.0, deep_clone=True, jump_len=1,
                                   jump_n_sample=1, q0_override_steps=2,
                                   enable_kevin_scaled_inference=True,
                                   progress=False)
        ref_diff = ref_diffuser.MultinomialDiffusion(K, timesteps=T)
        batch_t = (torch.tensor(c_text), torch.tensor(c_codes),
                   torch.tensor([lt]), torch.tensor([lc]), torch.tensor(x),
                   torch.tensor(xpm))
        try:
            torch.rand_like, torch.randint = fake_rand_like, fake_randint
            ref_out = ref_diffuser.perform_simple_inference(
                state["nar_ref"], batch_t, ref_diff, T, torch.float32,
                dsh=dsh_ref, retain_quant0=True).numpy()
        finally:
            torch.rand_like, torch.randint = orig_rand_like, orig_randint

        dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0,
                  deep_clone=True, jump_len=1, jump_n_sample=1,
                  q0_override_steps=2, enable_kevin_scaled_inference=True)
        diff = MultinomialDiffusion(K, timesteps=T)
        ours = perform_simple_inference(
            state["nar_params"], nar_cfg, (c_text, c_codes, [lt], [lc], x, xpm),
            diff, T, dsh, retain_quant0=True, uniforms=uniforms, x_init=x_init)
        np.testing.assert_array_equal(np.asarray(ours), ref_out)
        return f"{ref_out.shape} grid identical"

    drill.check("NAR shared-uniform grid parity", step_nar_parity)

    def step_codec():
        if not args.encodec:
            return "skipped (no --encodec; supply the released ckpt when it lands)"
        from mars5_tts_tpu.audio.io import read_wav
        from mars5_tts_tpu.hub import load_codec_params
        from mars5_tts_tpu.models.encodec import (EncodecConfig, encodec_encode)
        import jax.numpy as jnp

        enc_cfg = codec_cfgs[0] or EncodecConfig.mars5()
        enc = load_codec_params(args.encodec, "encodec", cfg=enc_cfg)
        wav, _sr = read_wav(args.ref_wav, target_sr=24000)
        grid = np.asarray(encodec_encode(enc, enc_cfg,
                                         jnp.asarray(wav, jnp.float32)[None, None]))
        msg = f"grid {grid.shape}, checksum {int(grid.sum())}"
        if args.expect_grid:
            want = np.load(args.expect_grid)
            np.testing.assert_array_equal(grid, want)
            msg += ", matches expected grid"
        if args.vocos:
            from mars5_tts_tpu.models.vocos import VocosConfig, vocos_vocode
            voc_cfg = codec_cfgs[1] or VocosConfig.mars5()
            voc = load_codec_params(args.vocos, "vocos", cfg=voc_cfg)
            audio = np.asarray(vocos_vocode(voc, voc_cfg,
                                            jnp.asarray(grid[0].T),
                                            bandwidth_id=1))
            msg += f", vocoded {audio.shape[-1]} samples"
        return msg

    drill.check("codec grids on reference wav", step_codec)

    ok = not drill.failures
    print(json.dumps({"drill": "verify_release", "ok": ok,
                      "failed": drill.failures}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
