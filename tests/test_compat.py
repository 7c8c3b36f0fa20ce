"""Reference-checkpoint compatibility: torch .pth → flax tree round-trip.

Builds torch modules with the reference's exact naming (transcribed from
models/transformer.py and models/mamba.py state-dict layouts), converts, and
checks that the converted tree drives this framework's models to the same
outputs as hand-computed torch equivalents where cheap — plus structural
round-trips for every rule.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tlie_tpu.analysis.compat import torch_state_dict_to_flax, _split_complex


def _torch_transformer_sd(num_layers=2, d=8, d_qk=8, heads=2, vocab=32, mixer="mlp"):
    sd = {}
    sd["encoder.word_embeddings.weight"] = torch.randn(vocab, d)
    sd["encoder.position_embeddings.weight"] = torch.randn(16, d)
    for i in range(num_layers):
        sd[f"layers.{i}.attention.Wqkv.weight"] = torch.randn(2 * d_qk + d, d)
        sd[f"layers.{i}.attention.Wqkv.bias"] = torch.randn(2 * d_qk + d)
        sd[f"layers.{i}.attention.out_proj.weight"] = torch.randn(d, d)
        sd[f"layers.{i}.attention.out_proj.bias"] = torch.randn(d)
        sd[f"layers.{i}.attention.conv1d.weight"] = torch.randn(2 * d_qk + d, 1, 4)
        sd[f"layers.{i}.attention.conv1d.bias"] = torch.randn(2 * d_qk + d)
        sd[f"layers.{i}.norm.weight"] = torch.randn(d)
        sd[f"layers.{i}.norm.bias"] = torch.randn(d)
        if mixer == "mlp":
            sd[f"layers.{i}.mixer.encoder.weight"] = torch.randn(16, d)
            sd[f"layers.{i}.mixer.encoder.bias"] = torch.randn(16)
            sd[f"layers.{i}.mixer.decoder.weight"] = torch.randn(d, 16)
            sd[f"layers.{i}.mixer.decoder.bias"] = torch.randn(d)
    sd["norm.weight"] = torch.randn(d)
    sd["norm.bias"] = torch.randn(d)
    sd["decoder.weight"] = torch.randn(vocab, d)
    return sd


def test_transformer_statedict_converts_completely():
    sd = _torch_transformer_sd()
    params = torch_state_dict_to_flax(sd, "transformer")
    assert params["encoder"]["word_embeddings"]["embedding"].shape == (32, 8)
    # Dense kernels transposed
    np.testing.assert_allclose(
        params["layers_0"]["attention"]["Wqkv"]["kernel"],
        sd["layers.0.attention.Wqkv.weight"].numpy().T,
    )
    # depthwise conv weight re-laid out: ours[k, c] == torch[c, 0, k]
    np.testing.assert_allclose(
        params["layers_1"]["attention"]["conv1d"]["weight"],
        sd["layers.1.attention.conv1d.weight"].numpy()[:, 0, :].T,
    )
    assert params["norm"]["scale"].shape == (8,)
    assert "decoder" in params and "bias" not in params["decoder"]


def test_converted_conv_matches_torch_forward():
    """The re-laid-out conv weights must produce torch's causal conv output."""
    from tlie_tpu.ops.conv import depthwise_causal_conv1d

    C, K, L = 6, 4, 12
    conv = torch.nn.Conv1d(C, C, K, groups=C, padding=K - 1)
    x = torch.randn(2, L, C)
    with torch.no_grad():
        y_t = conv(x.transpose(1, 2))[..., :L].transpose(1, 2).numpy()
    w = conv.weight.detach().numpy()[:, 0, :].T  # our layout
    b = conv.bias.detach().numpy()
    y = depthwise_causal_conv1d(jnp.asarray(x.numpy()), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(y), y_t, rtol=1e-4, atol=1e-5)


def test_converted_linear_matches_torch_forward():
    lin = torch.nn.Linear(8, 24)
    x = torch.randn(3, 8)
    with torch.no_grad():
        y_t = lin(x).numpy()
    k = lin.weight.detach().numpy().T
    b = lin.bias.detach().numpy()
    y = np.asarray(jnp.asarray(x.numpy()) @ jnp.asarray(k) + jnp.asarray(b))
    np.testing.assert_allclose(y, y_t, rtol=1e-5, atol=1e-5)


def test_mamba_statedict_converts():
    d, n, heads = 8, 4, 2
    conv_dim = d + 2 * n
    sd = {
        "encoder.word_embeddings.weight": torch.randn(32, d),
        "decoder.weight": torch.randn(32, d),
        "decoder.bias": torch.randn(32),
    }
    for i in range(2):
        sd[f"blocks.{i}.mamba.in_proj.weight"] = torch.randn(d + 2 * n + heads, d)
        sd[f"blocks.{i}.mamba.out_proj.weight"] = torch.randn(d, d)
        sd[f"blocks.{i}.mamba.conv1d.weight"] = torch.randn(conv_dim, 1, 4)
        sd[f"blocks.{i}.mamba.conv1d.bias"] = torch.randn(conv_dim)
        sd[f"blocks.{i}.mamba.dt_bias"] = torch.randn(heads)
        sd[f"blocks.{i}.mamba.A_log"] = torch.randn(heads)
        sd[f"blocks.{i}.mamba.D"] = torch.randn(heads)
        sd[f"blocks.{i}.glu.linear.weight"] = torch.randn(2 * d, d)
        sd[f"blocks.{i}.glu.linear.bias"] = torch.randn(2 * d)
        sd[f"blocks.{i}.norm.weight"] = torch.randn(d)
        sd[f"blocks.{i}.norm.bias"] = torch.randn(d)
        sd[f"blocks.{i}.mamba.beta"] = torch.ones(heads)  # buffer: dropped
    params = torch_state_dict_to_flax(sd, "mamba")
    assert params["blocks_0"]["mamba"]["A_log"].shape == (heads,)
    assert params["blocks_1"]["glu_layer"]["linear"]["kernel"].shape == (d, 2 * d)
    assert params["blocks_0"]["norm_layer"]["scale"].shape == (d,)


def test_unmapped_keys_raise():
    with pytest.raises(ValueError, match="Unmapped"):
        torch_state_dict_to_flax({"mystery.weight": torch.randn(3, 3)}, "transformer")


def test_split_complex_for_reference_s4_orbax():
    tree = {
        "P": (np.random.randn(4, 3) + 1j * np.random.randn(4, 3)).astype(np.complex64),
        "C": np.random.randn(4, 3, 2).astype(np.float32),
    }
    out = _split_complex(tree)
    assert out["P"].shape == (4, 3, 2)
    np.testing.assert_allclose(out["P"][..., 0], tree["P"].real)
    np.testing.assert_allclose(out["P"][..., 1], tree["P"].imag)
    np.testing.assert_allclose(out["C"], tree["C"])


def test_params_only_host_restore(tmp_path):
    """The standalone analysis restore (load_params_any on an orbax dir)
    must read ONLY the params subtree, as host numpy — not the full
    TrainState with its two param-sized AdamW moments."""
    from tlie_tpu.analysis.compat import load_params_any
    from tlie_tpu.training.checkpoint import save_checkpoint

    params = {"encoder": {"kernel": np.arange(12.0, dtype=np.float32).reshape(3, 4)},
              # reference S4 checkpoints carry complex arrays — the partial
              # restore must hand them to _split_complex intact
              "P": (np.random.randn(2, 3) + 1j * np.random.randn(2, 3))
              .astype(np.complex64)}

    tree = {
        "params": params,
        "opt_state": {"mu": jax.tree.map(np.ones_like, params),
                      "nu": jax.tree.map(np.zeros_like, params)},
        "step": 7,
    }
    ck = save_checkpoint(str(tmp_path / "ck"), tree, {"model": {}, "train": {}})
    out = load_params_any(ck, {"layer": "lru"})
    assert isinstance(out["encoder"]["kernel"], np.ndarray)
    np.testing.assert_array_equal(out["encoder"]["kernel"],
                                  params["encoder"]["kernel"])
    assert set(out.keys()) == {"encoder", "P"}
    # complex restores intact and splits into the trailing (re, im) axis
    assert out["P"].shape == (2, 3, 2)
    np.testing.assert_allclose(out["P"][..., 0], params["P"].real, rtol=1e-6)
    np.testing.assert_allclose(out["P"][..., 1], params["P"].imag, rtol=1e-6)
