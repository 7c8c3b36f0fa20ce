"""Pretrained-LM spectroscopy: hooks, resume cache, η parity with a tiny
torch transformer (the notebook flow without downloads)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tlie_tpu.analysis.lm_spectra import (
    QKHooks,
    bin_lm_spectra,
    eta_from_torch_qk,
    lm_attention_spectra,
)


class TinyAttn(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.q_proj = torch.nn.Linear(d, d)
        self.k_proj = torch.nn.Linear(d, d)
        self.v_proj = torch.nn.Linear(d, d)

    def forward(self, x):
        return self.v_proj(x) + self.q_proj(x) * 0 + self.k_proj(x) * 0


class TinyLayer(torch.nn.Module):
    def __init__(self, d):
        super().__init__()
        self.self_attn = TinyAttn(d)

    def forward(self, x):
        return x + self.self_attn(x)


class TinyLM(torch.nn.Module):
    """Llama-shaped skeleton: model.layers[i].self_attn.{q,k,v}_proj."""

    def __init__(self, vocab=50, d=16, n_layers=2):
        super().__init__()
        self.embed = torch.nn.Embedding(vocab, d)
        body = torch.nn.Module()
        body.layers = torch.nn.ModuleList([TinyLayer(d) for _ in range(n_layers)])
        self.model = body

    def forward(self, ids):
        x = self.embed(ids)
        for layer in self.model.layers:
            x = layer(x)
        return x


def test_hooks_capture_qk_per_layer():
    lm = TinyLM()
    hooks = QKHooks(lm)
    ids = torch.randint(0, 50, (2, 12))
    lm(ids)
    qks = hooks.pop_qk(num_heads=2)
    assert len(qks) == 2
    q, k = qks[0]
    assert q.shape == (2, 12, 2, 8) and k.shape == (2, 12, 2, 8)
    hooks.remove()


def test_eta_matches_manual_qk_computation():
    rng = np.random.RandomState(0)
    q = rng.randn(1, 10, 2, 4).astype(np.float32)
    k = rng.randn(1, 10, 2, 4).astype(np.float32)
    eta = eta_from_torch_qk(q, k)
    # float64 manual reference (notebook cell 13: the subtracted row-max is
    # zero-masked too, so masked entries contribute exp(0)=1 to nu)
    mask = np.tril(np.ones((10, 10)))[None, :, :, None]
    scores = np.einsum("bthd,bshd->btsh", q.astype(np.float64), k.astype(np.float64))
    scores = scores * mask
    m = scores.max(2)
    nu = np.exp(scores - m[:, :, None, :] * mask).sum(2)
    eta_ref = nu[:, :-1] / nu[:, 1:] * np.exp(m[:, :-1] - m[:, 1:])
    np.testing.assert_allclose(eta, eta_ref, rtol=1e-4, atol=1e-5)


def test_lm_spectra_resumable_cache(tmp_path):
    lm = TinyLM()
    rng = np.random.RandomState(0)
    batches = [rng.randint(0, 50, (2, 8)) for _ in range(3)]
    cache = str(tmp_path / "eigs")
    all1 = lm_attention_spectra(lm, batches, num_heads=2, cache_dir=cache)
    assert all1.shape == (6, 7, 2, 2)  # (3 batches × B2, L−1, H, layers)
    # adding batches resumes: only new indices are computed
    batches2 = batches + [rng.randint(0, 50, (2, 8))]
    all2 = lm_attention_spectra(lm, batches2, num_heads=2, cache_dir=cache)
    assert all2.shape == (8, 7, 2, 2)
    np.testing.assert_allclose(all2[:6], all1)
    stats = bin_lm_spectra(all2)
    assert stats["percentage"].shape == (7, 8, 2, 2)
    assert stats["percentage_mean"].shape == (7, 2, 2)
