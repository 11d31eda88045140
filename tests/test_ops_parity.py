"""Direct parity of low-level ops vs the reference torch implementations."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def test_length_to_mask_parity():
    import torch
    add_reference_to_path()
    from mars5.utils import length_to_mask as ref_mask

    import jax.numpy as jnp
    from mars5_tts_tpu.utils.masks import length_to_mask

    lengths = np.array([5, 9, 1])
    offsets = np.array([0, 2, 0])
    ref = ref_mask(torch.tensor(lengths), torch.tensor(offsets), max_len=10)
    ours = length_to_mask(jnp.asarray(lengths), jnp.asarray(offsets), 10)
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_construct_padding_mask_parity():
    import torch
    add_reference_to_path()
    from mars5.utils import construct_padding_mask as ref_mask

    import jax.numpy as jnp
    from mars5_tts_tpu.utils.masks import construct_padding_mask

    x = np.array([[1, 2, 1024, 5, 1024], [1024, 1, 2, 3, 4]])
    ref = ref_mask(torch.tensor(x), 1024)
    ours = construct_padding_mask(jnp.asarray(x), 1024)
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_timestep_embedding_parity():
    import torch
    add_reference_to_path()
    from mars5.model import timestep_embedding as ref_emb

    import jax.numpy as jnp
    from mars5_tts_tpu.ops.embeddings import timestep_embedding

    t = np.array([0, 1, 13, 199])
    for dim in (64, 63):
        ref = ref_emb(torch.tensor(t), dim)
        ours = timestep_embedding(jnp.asarray(t), dim)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5,
                                   err_msg=f"dim={dim}")


def test_sine_pe_parity():
    import torch
    add_reference_to_path()
    from mars5.nn_future import SinePositionalEmbedding

    import jax.numpy as jnp
    from mars5_tts_tpu.ops.embeddings import add_sine_pe

    dim = 32
    mod = SinePositionalEmbedding(dim, scale=False, alpha=True)
    with torch.no_grad():
        mod.alpha.fill_(1.7)
    x = np.random.default_rng(0).standard_normal((2, 11, dim)).astype(np.float32)
    ref = mod(torch.tensor(x))
    ours = add_sine_pe(jnp.asarray(x), jnp.asarray([1.7], jnp.float32))
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)


def test_rope_equivalence_to_reference_complex():
    """half-split rope on permuted inputs == reference complex rope scores."""
    import torch
    add_reference_to_path()
    from mars5.nn_future import apply_rotary_emb, precompute_freqs_cis

    import jax.numpy as jnp
    from mars5_tts_tpu.models.convert import permute_rope_rows
    from mars5_tts_tpu.ops.rope import apply_rope_halfsplit, rope_angles

    rng = np.random.default_rng(1)
    bs, L, H, D = 1, 6, 2, 16
    q = rng.standard_normal((bs, L, H, D)).astype(np.float32)
    k = rng.standard_normal((bs, L, H, D)).astype(np.float32)

    freqs = precompute_freqs_cis(D, 32)[:L]
    tq, tk = apply_rotary_emb(torch.tensor(q), torch.tensor(k), freqs)
    ref_scores = np.einsum("blhd,bmhd->bhlm", tq.numpy(), tk.numpy())

    # our basis: permute the per-head feature axis as the converter permutes rows
    perm = np.concatenate([np.arange(0, D, 2), np.arange(1, D, 2)])
    cos, sin = rope_angles(jnp.arange(L), D)
    jq = apply_rope_halfsplit(jnp.asarray(q[..., perm]), cos, sin)
    jk = apply_rope_halfsplit(jnp.asarray(k[..., perm]), cos, sin)
    our_scores = np.einsum("blhd,bmhd->bhlm", np.asarray(jq), np.asarray(jk))

    np.testing.assert_allclose(our_scores, ref_scores, atol=1e-4)
