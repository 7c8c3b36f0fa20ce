"""Golden-spectra regression tests (SURVEY.md §4.5).

Init-time eigenspectra for fixed seeds, stored as .npy goldens.  Any change
to the initializers, discretization, or extractors that perturbs spectra
beyond 1e-5 (the BASELINE.md parity budget) fails here.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.analysis.eval_eig import _extract_ssm_family, _ssm_layer_params
from tlie_tpu.models import init_LRU, init_S4, init_S5
from tlie_tpu.models.backbone import BatchClassificationModel

GOLDEN = Path(__file__).parent / "golden"

CASES = {
    "lru": (init_LRU, {"r_min": 0.6, "r_max": 0.95}),
    "s5": (init_S5, {"num_blocks": 4, "C_init": "lecun_normal"}),
    "s4": (init_S4, {}),
}


def _spectra(layer):
    init_fn, extra = CASES[layer]
    mc = {"layer": layer, "state_dim": 16, "hidden_dim": 8, "num_layers": 2,
          "seq_len": 32, "input_dim": 8, "output_dim": 4, "activation": "gelu",
          "dropout": 0.0, "pooling": "mean", "prenorm": True, "norm": "layer",
          **extra}
    ssm = init_fn(16, 8, **mc)
    model = BatchClassificationModel(
        ssm=ssm, d_output=4, d_model=8, n_layers=2, activation="gelu",
        dropout=0.0, training=False, pooling="mean", prenorm=True,
        norm="layer", d_input=8,
    )
    rng = jax.random.PRNGKey(1234)
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init({"params": p_rng, "dropout": d_rng}, jnp.ones((2, 32, 8)))
    return _extract_ssm_family(_ssm_layer_params(variables["params"]), mc)


@pytest.mark.parametrize("layer", ["lru", "s5", "s4"])
def test_init_spectra_match_golden(layer):
    w = _spectra(layer)
    golden = np.load(GOLDEN / f"{layer}_init_spectra.npy")
    # S4 goes through a dense eigendecomposition whose conditioning inflates
    # pointwise error; its radii are compared instead (see README deviations)
    if layer == "s4":
        np.testing.assert_allclose(
            np.sort(np.abs(w), axis=0), np.sort(np.abs(golden), axis=0), atol=1e-4
        )
    else:
        np.testing.assert_allclose(w, golden, atol=1e-5)


# ----------------------------------------------------- attention families

_ATT_BASE = {
    "input_dim": 1, "output_dim": 32, "num_layers": 2, "hidden_dim": 16,
    "state_dim": 8, "num_heads": 2, "att_dropout": 0.0, "norm": "layer",
    "dropout": 0.0, "embedding": True, "vocab_size": 32, "max_pos_embed": 16,
    "mixer": "none", "mixer_dim": 16, "classifier": False, "pooling": "none",
    "dual": False, "seq_len": 16, "use_flash": False,
}

ATT_CASES = {
    "sm": {"layer": "transformer", "attention_fn": "sm-attention", **_ATT_BASE},
    "lin": {"layer": "transformer", "attention_fn": "lin-attention", **_ATT_BASE},
    "norm": {
        "layer": "transformer", "attention_fn": "norm-attention",
        "mode": "attention", "norm_fn": "softplus", "approx_fn": "elu",
        "scale_B": True, "offset": True, "offset_init": "exp",
        "learn_A": False, "dim_conv": 4, **_ATT_BASE,
    },
    "mamba2": {
        "layer": "mamba", "version": "mamba2", "conv_dim": 4, "expansion": 1,
        "glu": True, "prenorm": True, "token_embedding": True, **_ATT_BASE,
    },
}


def _att_spectra(fam):
    from tlie_tpu.analysis.eval_eig import _extract_attention_family
    from tlie_tpu.models.registry import build_models

    mc = dict(ATT_CASES[fam])
    _, eval_model, _ = build_models(mc, padded=False)
    x = jnp.asarray(np.random.RandomState(99).randint(0, 32, size=(2, 16)))
    params = eval_model.init(jax.random.PRNGKey(4321), x)["params"]
    return _extract_attention_family(eval_model, params, x, mc)


@pytest.mark.parametrize("fam", ["sm", "lin", "norm", "mamba2"])
def test_attention_init_spectra_match_golden(fam):
    """η goldens for the four torch-side families (completes SURVEY §4.5):
    extractor or init regressions in sm/lin/norm/mamba2 fail loudly, like
    the lru/s5/s4 set above."""
    w = _att_spectra(fam)
    golden = np.load(GOLDEN / f"att_{fam}_init_spectra.npy")
    np.testing.assert_allclose(w, golden, atol=1e-5)
