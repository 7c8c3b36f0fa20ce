"""Autoregressive decode / serving path: O(1)-state per-token generation.

The reference is a training+analysis framework with no inference story —
every forward is a full-sequence pass (ref train.py:87-212).  For serving,
recurrent families shouldn't pay O(L) work per emitted token: each family
here exposes a constant-size decode state (the recurrent state the
eigen-analysis studies, plus conv tail buffers / KV caches) and a step
function computing exactly one token — the TPU-native serving counterpart
of the training stack:

  family        decode state per layer
  ------        ----------------------
  lru           complex diagonal state h (B, N) as (re, im) planes
  s5            discretized diagonal state (B, P) pair (Λ̄/B̄ precomputed once)
  s4            DPLR dense recurrence x (B, H, N) pair (Ā/B̄/C̄ precomputed)
  mamba2 (SSD)  h (B, H, N, P) + conv tail (B, K−1, d_inner+2·g·n)
  mamba1        h (B, d_inner, N) + conv tail (B, K−1, d_inner)
  lin-attention running KV state S (B, H, Dk, Dv) + k-sum (B, H, Dk) [+ conv tail]
  norm-attention same S state (no normalizer division; learned decay) [+ conv tail]
  sm-attention  KV cache (B, L_max, H, D) — the only O(L) family

Implementation style follows ``analysis/extractors.py``: pure functions over
the checkpoint parameter tree (whose layout is a framework invariant pinned
by tests/test_reference_parity.py), so no flax module changes are needed and
recurrence constants (S5 discretization, S4's per-channel (Ā, B̄, C̄)) are
precomputed once per ``Decoder`` instead of per token.  Teacher-forced
parity with the full parallel forward is pinned per family in
tests/test_decode.py.

Decoding targets per-position token-LM heads (``pooling: none`` /
``classifier: false`` with a token encoder) — the WikiText/MQAR model
shapes.  Classifier/dual/pooled models have no autoregressive semantics and
are rejected.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.attention_layers import approx_fn_by_name, norm_fn_by_name
from ..models.s4 import discrete_dplr

# ---------------------------------------------------------------------------
# small positionwise helpers over parameter subtrees
# ---------------------------------------------------------------------------


def _dense(x, p):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def _bn_eval(x, p, stats, eps=1e-5):
    """flax BatchNorm in eval mode (running stats)."""
    y = (x - stats["mean"]) * jax.lax.rsqrt(stats["var"] + eps)
    return y * p["scale"] + p["bias"]


def _conv_step(buf, x_t, p):
    """One step of the depthwise causal conv (ops/conv.py tap layout:
    tap K−1 multiplies the current timestep).

    buf: (B, K−1, C) trailing window of past inputs; x_t: (B, C).
    Returns (new_buf, y_t)."""
    w = p["weight"]  # (K, C)
    window = jnp.concatenate([buf, x_t[:, None, :]], axis=1)  # (B, K, C)
    y = jnp.einsum("bkc,kc->bc", window, w) + p["bias"]
    return window[:, 1:], y


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# attention-family cores (one token)
# ---------------------------------------------------------------------------


def _split_heads_t(x, num_heads):
    b, d = x.shape
    return x.reshape(b, num_heads, d // num_heads)


def _n_pos_args(fn) -> int:
    """Positional arity of a (possibly functools.partial-wrapped) fn."""
    import inspect

    sig = inspect.signature(fn)
    return sum(
        1 for prm in sig.parameters.values()
        if prm.kind in (prm.POSITIONAL_ONLY, prm.POSITIONAL_OR_KEYWORD)
    )


class Decoder:
    """Per-token decoder for a trained checkpoint.

    >>> dec = Decoder(model_cfg, params)
    >>> out = dec.generate(prompt_tokens, n_new=64)        # greedy
    >>> out = dec.generate(prompt, 64, temperature=0.8, rng=key)

    ``stepwise_logits(tokens)`` returns the per-position logits of a
    teacher-forced scan — the parity surface against the full forward.
    """

    def __init__(
        self,
        model_cfg: Dict[str, Any],
        params: Dict[str, Any],
        batch_stats: Optional[Dict[str, Any]] = None,
        state_dtype: Any = jnp.float32,
        mesh: Optional[Any] = None,
    ):
        """``state_dtype=jnp.bfloat16`` stores the LARGE decode states (the
        SSD / Mamba-1 state lattices and the linear/norm-attention KV
        states — the HBM-bound per-step tensors) in bf16, halving the
        per-token state traffic; the update arithmetic stays f32.  Small
        diagonal states (LRU/S5/S4) and conv tails stay f32 — they are
        bandwidth-trivial, and the diagonal recurrences are
        rounding-sensitive.  Opt-in: long recurrent accumulation in a bf16
        state costs accuracy (the logits drift ~1e-2-relative over hundreds
        of steps); measure on your task before serving with it.

        ``mesh``: a 1-axis ``jax.sharding.Mesh`` — generation shards the
        BATCH axis of the prompt, cache and logits over it (params
        replicated), the data-parallel serving layout; per-example math is
        unchanged, so mesh and single-device decode emit identical
        tokens."""
        cfg = dict(model_cfg)
        self.cfg = cfg
        self.params = params
        self.batch_stats = batch_stats
        self.state_dtype = state_dtype
        self.mesh = mesh
        if mesh is not None and len(mesh.axis_names) != 1:
            raise ValueError("serving mesh must have exactly one axis")
        fam = cfg["layer"]
        if cfg.get("classifier", False) or cfg.get("dual", False):
            raise ValueError("decode targets per-position LM heads "
                             "(classifier/dual models have no AR semantics)")
        if fam in ("lru", "s4", "s5"):
            if cfg.get("pooling", "none") != "none":
                raise ValueError("decode requires pooling: none")
            self.family = fam
            self._prep_ssm()
        elif fam == "transformer":
            if not cfg.get("embedding", False):
                raise ValueError("transformer decode requires a token encoder")
            self.family = "attention"
        elif fam == "mamba":
            if cfg.get("pooling", "none") != "none":
                raise ValueError("decode requires pooling: none")
            self.family = "mamba"
        else:
            raise ValueError(f"unknown family {fam}")
        self._gen_cache: Dict[Tuple, Any] = {}

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "Decoder":
        """Build a decoder from a training checkpoint (the orbax
        ``{"model", "config"}`` layout of training/checkpoint.py).
        ``kwargs`` (``state_dtype``, ``mesh``) pass through to the ctor.

        Note: this restores the full TrainState tree (including optimizer
        moments); for repeated serving loads prefer restoring params once
        and constructing ``Decoder(model_cfg, params)`` directly."""
        from ..training.checkpoint import restore_checkpoint

        ckpt = restore_checkpoint(path)
        model = ckpt["model"]
        return cls(
            ckpt["config"]["model"], model["params"],
            batch_stats=model.get("batch_stats"), **kwargs,
        )

    # -- per-family recurrence constants (computed once) -------------------

    def _prep_ssm(self):
        cfg, params = self.cfg, self.params
        enc = params["encoder"]
        self._ssm_consts = []
        for i in range(cfg["num_layers"]):
            p = enc[f"layers_{i}"]["seq"]
            if self.family == "lru":
                mag = jnp.exp(-jnp.exp(p["nu_log"]))
                phase = jnp.exp(p["theta_log"])
                gamma = jnp.exp(p["gamma_log"])[:, None]
                self._ssm_consts.append(dict(
                    lam=(mag * jnp.cos(phase), mag * jnp.sin(phase)),
                    bn=(p["B_re"] * gamma, p["B_im"] * gamma),
                    c=(p["C_re"], p["C_im"]), d=p["D"],
                ))
            elif self.family == "s5":
                if cfg.get("bidirectional", False):
                    raise ValueError("bidirectional S5 cannot decode causally")
                from ..models.s5 import discretize_bilinear, discretize_zoh
                lam_re = p["Lambda_re"]
                if cfg.get("clip_eigs", False):
                    lam_re = jnp.clip(lam_re, max=-1e-4)
                lam = (lam_re, p["Lambda_im"])
                b_tilde = (p["B"][..., 0], p["B"][..., 1])
                step = jnp.exp(p["log_step"][:, 0])
                disc = (discretize_zoh
                        if cfg.get("discretization", "zoh") == "zoh"
                        else discretize_bilinear)
                lam_bar, b_bar = disc(lam, b_tilde, step)
                self._ssm_consts.append(dict(
                    lam=lam_bar, b=b_bar, c=(p["C"][..., 0], p["C"][..., 1]),
                    d=p["D"], mult=2.0 if cfg.get("conj_sym", True) else 1.0,
                ))
            else:  # s4: per-channel dense DPLR recurrence (models/s4.py RNN mode)
                lam = (jnp.clip(p["Lambda_re"], max=-1e-4), p["Lambda_im"])
                pp = (p["P"][..., 0], p["P"][..., 1])
                bb_ = (p["B"][..., 0], p["B"][..., 1])
                cc = (p["C"][..., 0], p["C"][..., 1])
                step = jnp.exp(p["log_step"][0])
                l_max = cfg["seq_len"]
                per_channel = jax.vmap(
                    lambda l, q, b, c, s: discrete_dplr(l, q, q, b, c, s, l_max),
                    in_axes=(1, 1, 1, 1, 0), out_axes=0,
                )
                ab, bbar, cbar = per_channel(lam, pp, bb_, cc, step)
                self._ssm_consts.append(dict(ab=ab, bb=bbar, cb=cbar, d=p["D"][0]))

    # -- cache construction -------------------------------------------------

    def init_cache(self, bsz: int, max_len: int, params=None):
        params = self.params if params is None else params
        cfg = self.cfg
        f32 = jnp.float32
        layers = []
        if self.family in ("lru", "s4", "s5"):
            for i in range(cfg["num_layers"]):
                if self.family == "lru":
                    n = cfg["state_dim"]
                    layers.append((jnp.zeros((bsz, n), f32),
                                   jnp.zeros((bsz, n), f32)))
                elif self.family == "s5":
                    pshape = self._ssm_consts[i]["lam"][0].shape[0]
                    layers.append((jnp.zeros((bsz, pshape), f32),
                                   jnp.zeros((bsz, pshape), f32)))
                else:
                    h = cfg["hidden_dim"]
                    n = self._ssm_consts[i]["ab"][0].shape[-1]
                    layers.append((jnp.zeros((bsz, h, n), f32),
                                   jnp.zeros((bsz, h, n), f32)))
            return tuple(layers)
        if self.family == "mamba":
            d = cfg["hidden_dim"]
            expand = cfg["expansion"]
            d_inner = expand * d
            n = cfg["state_dim"]
            K = cfg["conv_dim"]
            g = cfg.get("ngroups", 1)
            H = cfg["num_heads"] * expand  # d_inner // headdim
            P = d_inner // H
            for i in range(cfg["num_layers"]):
                if cfg["version"] == "mamba1":
                    buf = jnp.zeros((bsz, max(K - 1, 0), d_inner), f32)
                    h = jnp.zeros((bsz, d_inner, n), self.state_dtype)
                else:
                    conv_dim = d_inner + 2 * g * n
                    buf = jnp.zeros((bsz, max(K - 1, 0), conv_dim), f32)
                    pm = params[f"blocks_{i}"]["mamba"]
                    if "init_states" in pm:
                        h = jnp.broadcast_to(
                            jnp.swapaxes(pm["init_states"], -1, -2),
                            (bsz, H, n, P),
                        ).astype(self.state_dtype)
                    else:
                        h = jnp.zeros((bsz, H, n, P), self.state_dtype)
                layers.append((buf, h))
            return tuple(layers)
        # attention
        d_model = cfg["hidden_dim"]
        d_qk = cfg["state_dim"]
        Hh = cfg["num_heads"]
        att = cfg["attention_fn"]
        K = cfg.get("dim_conv", 0)
        for i in range(cfg["num_layers"]):
            if att == "sm-attention":
                hd, vd = d_qk // Hh, d_model // Hh
                c = (jnp.zeros((bsz, max_len, Hh, hd), f32),
                     jnp.zeros((bsz, max_len, Hh, vd), f32))
            elif att == "lin-attention":
                hd, vd = d_qk // Hh, d_model // Hh
                c = (jnp.zeros((bsz, Hh, hd, vd), self.state_dtype),
                     jnp.zeros((bsz, Hh, hd), f32))
            else:  # norm-attention
                hd, vd = d_qk // Hh, d_model // Hh
                c = (jnp.zeros((bsz, Hh, hd, vd), self.state_dtype),)
            if K > 0:
                if cfg.get("conv_type", "full") == "full":
                    cw = d_model + 2 * d_qk
                else:
                    cw = 2 * d_qk
                c = (jnp.zeros((bsz, K - 1, cw), f32),) + c
            layers.append(c)
        return tuple(layers)

    # -- one-token steps -----------------------------------------------------

    def step(self, cache, tok, pos, params=None):
        """(cache, tokens (B,), pos) → (cache, logits (B, V)).

        ``params`` defaults to the tree bound at construction; the jitted
        generation paths pass it explicitly so the parameter arrays are jit
        ARGUMENTS, not trace-time constants (big closures blow the remote
        compile size limit — see CLAUDE.md)."""
        params = self.params if params is None else params
        if self.family in ("lru", "s4", "s5"):
            return self._ssm_step(params, cache, tok, pos)
        if self.family == "mamba":
            return self._mamba_step(params, cache, tok, pos)
        return self._tf_step(params, cache, tok, pos)

    # SSM backbone (ClassificationModel, models/backbone.py)
    def _ssm_step(self, params, cache, tok, pos):
        cfg = self.cfg
        enc = params["encoder"]
        ep = enc["encoder"]
        x = jnp.take(ep["kernel"], tok, axis=0) + ep["bias"]
        act = cfg["activation"]
        prenorm = cfg["prenorm"]
        norm = cfg.get("norm", "layer")
        new = []
        for i in range(cfg["num_layers"]):
            p = enc[f"layers_{i}"]
            skip = x
            if prenorm:
                x = self._backbone_norm(x, p, i, norm)
            x, c = self._ssm_core_step(self._ssm_consts[i], cache[i], x)
            new.append(c)
            # the backbone's gelu is flax's default tanh-approximate form
            # (models/backbone.py), unlike the torch-parity families' exact erf
            if act == "full_glu":
                x = jax.nn.gelu(x)
                x = _dense(x, p["out1"]) * jax.nn.sigmoid(_dense(x, p["out2"]))
            elif act == "half_glu1":
                x = jax.nn.gelu(x)
                x = x * jax.nn.sigmoid(_dense(x, p["out2"]))
            elif act == "half_glu2":
                x1 = jax.nn.gelu(x)
                x = x * jax.nn.sigmoid(_dense(x1, p["out2"]))
            elif act == "gelu":
                x = jax.nn.gelu(x)
            else:
                raise NotImplementedError(act)
            x = skip + x
            if not prenorm:
                x = self._backbone_norm(x, p, i, norm)
        logits = _dense(x, params["decoder"])
        return tuple(new), logits

    def _backbone_norm(self, x, p, i, norm):
        if norm == "batch":
            stats = self.batch_stats["encoder"][f"layers_{i}"]["normalize"]
            return _bn_eval(x, p["normalize"], stats)
        return _ln(x, p["normalize"], 1e-6)  # flax LayerNorm default eps

    def _ssm_core_step(self, consts, c, u):
        if self.family == "lru":
            lam = consts["lam"]
            br, bi = consts["bn"]
            hr, hi = c
            bur, bui = u @ br.T, u @ bi.T
            nr = lam[0] * hr - lam[1] * hi + bur
            ni = lam[0] * hi + lam[1] * hr + bui
            cr, ci = consts["c"]
            y = nr @ cr.T - ni @ ci.T
            return y + consts["d"] * u, (nr, ni)
        if self.family == "s5":
            lam = consts["lam"]
            br, bi = consts["b"]
            hr, hi = c
            bur, bui = u @ br.T, u @ bi.T
            nr = lam[0] * hr - lam[1] * hi + bur
            ni = lam[0] * hi + lam[1] * hr + bui
            cr, ci = consts["c"]
            y = consts["mult"] * (nr @ cr.T - ni @ ci.T)
            return y + consts["d"] * u, (nr, ni)
        # s4 dense DPLR (models/s4.py time_step)
        ab, bb, cb = consts["ab"], consts["bb"], consts["cb"]
        xr, xi = c
        nr = (jnp.einsum("hnm,bhm->bhn", ab[0], xr)
              - jnp.einsum("hnm,bhm->bhn", ab[1], xi)
              + bb[0][..., 0] * u[..., None])
        ni = (jnp.einsum("hnm,bhm->bhn", ab[0], xi)
              + jnp.einsum("hnm,bhm->bhn", ab[1], xr)
              + bb[1][..., 0] * u[..., None])
        y = (jnp.einsum("hn,bhn->bh", cb[0][:, 0, :], nr)
             - jnp.einsum("hn,bhn->bh", cb[1][:, 0, :], ni))
        return y + consts["d"] * u, (nr, ni)

    # Mamba families (models/mamba2.py)
    def _mamba_step(self, params, cache, tok, pos):
        cfg = self.cfg
        enc = params["encoder"]
        if cfg.get("token_embedding", False):
            x = jnp.take(enc["word_embeddings"]["embedding"], tok, axis=0)
        else:
            raise ValueError("mamba decode requires token_embedding")
        new = []
        for i in range(cfg["num_layers"]):
            p = params[f"blocks_{i}"]
            skip = x
            if cfg["prenorm"]:
                x = _ln(x, p["norm_layer"], 1e-5)
            if cfg["version"] == "mamba1":
                x, c = self._mamba1_core_step(p["mamba"], cache[i], x)
            else:
                x, c = self._ssd_core_step(p["mamba"], cache[i], x)
            new.append(c)
            x = _gelu_exact(x)
            if cfg["glu"]:
                gp = p["glu_layer"]["linear"]
                h = _dense(x, gp)
                d = x.shape[-1]
                x = h[..., :d] * jax.nn.sigmoid(h[..., d:])
            x = x + skip
            if not cfg["prenorm"]:
                x = _ln(x, p["norm_layer"], 1e-5)
        logits = _dense(x, params["decoder"])
        return tuple(new), logits

    def _ssd_core_step(self, p, c, u):
        cfg = self.cfg
        d = cfg["hidden_dim"]
        expand = cfg["expansion"]
        d_inner = expand * d
        headdim = d // cfg["num_heads"]
        H = d_inner // headdim
        n = cfg["state_dim"]
        g = cfg.get("ngroups", 1)
        conv_dim = d_inner + 2 * g * n
        pseudo = cfg.get("pseudoLTI", False)
        dt_limit = tuple(cfg.get("dt_limit", (0.0, float("inf"))))

        buf, h = c
        xbcdt = _dense(u, p["in_proj"])
        xBC = xbcdt[:, :conv_dim]
        dt_raw = xbcdt[:, conv_dim:]  # (B, nheads) for SSD, (B, g) for SSD_LTI
        dt = jax.nn.softplus(dt_raw + p["dt_bias"])  # (B, H)
        if cfg["conv_dim"] > 0:
            buf, xBC = _conv_step(buf, xBC, p["conv1d"])
            xBC = jax.nn.silu(xBC)
        x = xBC[:, :d_inner].reshape(-1, H, headdim)
        B_flat = xBC[:, d_inner : d_inner + g * n]  # (B, g*n)
        C_m = xBC[:, d_inner + g * n :].reshape(-1, g, n)
        rep = H // g
        Ch = jnp.repeat(C_m, rep, axis=1)
        if pseudo:
            # SSD_LTI (models/mamba2.py): input-dependent dt folds into B;
            # the scan's step is the constant β=1, which is what dt_limit
            # clamps (ref models/mamba.py:264-268 semantics)
            A = -jax.nn.softplus(p["A"])  # (H,)
            khead = (n * g) // H
            dt_full = jnp.repeat(dt, khead, axis=-1)  # (B, g*n)
            Bh = jnp.repeat((dt_full * B_flat).reshape(-1, g, n), rep, axis=1)
            beta = 1.0
            if dt_limit != (0.0, float("inf")):
                beta = float(np.clip(1.0, dt_limit[0], dt_limit[1]))
            decay = jnp.exp(beta * A)[None, :, None, None]
            upd = beta * Bh[..., :, None] * x[..., None, :]
        else:
            if dt_limit != (0.0, float("inf")):
                dt = jnp.clip(dt, dt_limit[0], dt_limit[1])
            A = -jnp.exp(p["A_log"])  # (H,)
            Bh = jnp.repeat(B_flat.reshape(-1, g, n), rep, axis=1)
            decay = jnp.exp(dt * A)[..., None, None]
            upd = (dt[..., None, None] * Bh[..., :, None]) * x[..., None, :]
        hf = decay * h.astype(jnp.float32) + upd  # (B, H, N, P) f32 math
        y = jnp.einsum("bhn,bhnp->bhp", Ch, hf) + p["D"][None, :, None] * x
        out = _dense(y.reshape(y.shape[0], d_inner), p["out_proj"])
        return out, (buf, hf.astype(self.state_dtype))

    def _mamba1_core_step(self, p, c, u):
        cfg = self.cfg
        n = cfg["state_dim"]  # MambaBlock forwards state_dim as d_state
        buf, h = c
        xz = _dense(u, p["in_proj"])
        x, z = jnp.split(xz, 2, axis=-1)
        if cfg["conv_dim"] > 0:
            buf, x = _conv_step(buf, x, p["conv1d"])
            x = jax.nn.silu(x)
        x_db = _dense(x, p["x_proj"])
        r = x_db.shape[-1] - 2 * n
        dt = jax.nn.softplus(_dense(x_db[:, :r], p["dt_proj"]))  # (B, d_inner)
        B_m = x_db[:, r : r + n]
        C_m = x_db[:, r + n :]
        A = -jnp.exp(p["A_log"])  # (d_inner, n)
        a = jnp.exp(dt[..., None] * A)
        hf = a * h.astype(jnp.float32) + (dt * x)[..., None] * B_m[:, None, :]
        y = jnp.einsum("bdn,bn->bd", hf, C_m) + p["D"] * x
        y = y * jax.nn.silu(z)
        return _dense(y, p["out_proj"]), (buf, hf.astype(self.state_dtype))

    # Transformer attention families (models/transformer.py)
    def _tf_step(self, params, cache, tok, pos):
        cfg = self.cfg
        enc = params["encoder"]
        x = jnp.take(enc["word_embeddings"]["embedding"], tok, axis=0)
        if cfg.get("max_pos_embed", 0) > 0:
            x = x + jnp.take(enc["position_embeddings"]["embedding"], pos, axis=0)
        new = []
        for i in range(cfg["num_layers"]):
            p = params[f"layers_{i}"]
            x, c = self._tf_block_step(p, cache[i], x, pos)
            new.append(c)
        x = _ln(x, params["norm"], 1e-5)
        logits = _dense(x, params["decoder"])
        return tuple(new), logits

    def _tf_block_step(self, p, c, x, pos):
        cfg = self.cfg
        use_gate = cfg.get("use_gate", False)
        if use_gate:
            z = _dense(x, p["Wz"])
        skip = x
        x = _ln(x, p["norm"], 1e-5)
        att = cfg["attention_fn"]
        if att == "norm-attention":
            x, c = self._mhna_step(p["attention"], c, x)
        else:
            x, c = self._mha_step(p["attention"], c, x, pos)
        x = x + skip

        y = _ln(x, p["norm"], 1e-5)
        mixer = cfg["mixer"]
        if mixer == "mlp":
            m = p["mixer"]
            y = _dense(_gelu_exact(_dense(y, m["encoder"])), m["decoder"])
        elif mixer == "glu":
            m = p["mixer"]["linear"]
            h = _dense(y, m)
            d = y.shape[-1]
            y = h[..., :d] * jax.nn.sigmoid(h[..., d:])
        elif mixer == "hybrid":
            m = p["mixer"]
            xz = _dense(y, m["encoder"])
            d = y.shape[-1]
            a = jax.nn.sigmoid(m["alpha"])
            glu_out = xz[..., :d] * jax.nn.sigmoid(xz[..., d:])
            mlp_out = _dense(_gelu_exact(xz), m["decoder"])
            y = a * glu_out + (1 - a) * mlp_out
        # mixer == "none": y stays norm(x)

        if mixer == "none":
            if use_gate:
                y = y * jax.nn.silu(z)
        else:
            if use_gate:
                y = (x + y) * jax.nn.silu(z)
            else:
                y = x + y
        return y, c

    def _att_conv(self, p, c, qkv, d_qk, layout):
        """Shared conv-branch step.  layout 'qkv' (MHA: [q k | v]) or 'vqk'
        (MHNA: [v | q k]); returns (rest_of_cache, transformed qkv)."""
        cfg = self.cfg
        if cfg.get("dim_conv", 0) <= 0:
            return c, qkv
        buf, rest = c[0], c[1:]
        if cfg.get("conv_type", "full") == "full":
            buf, y = _conv_step(buf, qkv, p["conv1d"])
            return ((buf,) + rest, jax.nn.silu(y))
        if layout == "qkv":
            qk, v = qkv[:, : 2 * d_qk], qkv[:, 2 * d_qk :]
            buf, qk = _conv_step(buf, qk, p["conv1d"])
            return ((buf,) + rest, jnp.concatenate([jax.nn.silu(qk), v], axis=-1))
        v, qk = qkv[:, : -2 * d_qk], qkv[:, -2 * d_qk :]
        buf, qk = _conv_step(buf, qk, p["conv1d"])
        return ((buf,) + rest, jnp.concatenate([v, jax.nn.silu(qk)], axis=-1))

    def _mha_step(self, p, c, x, pos):
        cfg = self.cfg
        d_model = cfg["hidden_dim"]
        d_qk = cfg["state_dim"]
        Hh = cfg["num_heads"]
        hd = d_qk // Hh

        qkv = _dense(x, p["Wqkv"])
        if cfg.get("dim_conv", 0) > 0:
            c, qkv = self._att_conv(p, c, qkv, d_qk, "qkv")
        q = _split_heads_t(qkv[:, :d_qk], Hh)
        k = _split_heads_t(qkv[:, d_qk : 2 * d_qk], Hh)
        v = _split_heads_t(qkv[:, 2 * d_qk :], Hh)

        if cfg["attention_fn"] == "lin-attention":
            q = jax.nn.elu(q) + 1
            k = jax.nn.elu(k) + 1
            S, ksum = c[-2], c[-1]
            Sf = S.astype(jnp.float32) + k[..., :, None] * v[..., None, :]
            S = Sf.astype(S.dtype)
            ksum = ksum + k
            num = jnp.einsum("bhd,bhde->bhe", q, Sf)
            nrm = jnp.einsum("bhd,bhd->bh", q.astype(jnp.float32),
                             ksum.astype(jnp.float32))
            ctx = num / nrm[..., None].astype(num.dtype)
            c = c[:-2] + (S, ksum)
        else:
            kc, vc = c[-2], c[-1]
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k[:, None], pos, axis=1)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v[:, None], pos, axis=1)
            scores = jnp.einsum("bhd,blhd->bhl", q, kc) / math.sqrt(hd)
            mask = jnp.arange(kc.shape[1]) <= pos
            scores = jnp.where(mask[None, None, :], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("bhl,blhd->bhd", probs, vc)
            c = c[:-2] + (kc, vc)
        out = ctx.reshape(ctx.shape[0], -1)
        return _dense(out, p["out_proj"]), c

    def _mhna_step(self, p, c, x):
        cfg = self.cfg
        d_model = cfg["hidden_dim"]
        d_qk = cfg["state_dim"]
        Hh = cfg["num_heads"]
        hd = d_qk // Hh

        vqkn = _dense(x, p["Wvqkn"])
        vqk = vqkn[:, : d_model + 2 * d_qk]
        nproj = vqkn[:, d_model + 2 * d_qk :].astype(jnp.float32)  # (B, H)
        if cfg.get("dim_conv", 0) > 0:
            c, vqk = self._att_conv(p, c, vqk, d_qk, "vqk")
        v = _split_heads_t(vqk[:, :d_model], Hh)
        q = _split_heads_t(vqk[:, d_model : d_model + d_qk], Hh)
        k = _split_heads_t(vqk[:, d_model + d_qk :], Hh)

        fn = approx_fn_by_name(cfg["approx_fn"])
        q, k = fn(q), fn(k)
        scale = 1.0 / math.sqrt(hd) if cfg["scale_B"] else 1.0
        k = k * scale

        S = c[-1]
        Sf = S.astype(jnp.float32) + k[..., :, None] * v[..., None, :]
        S = Sf.astype(S.dtype)
        out = jnp.einsum("bhd,bhde->bhe", q, Sf)

        nf = norm_fn_by_name(cfg["norm_fn"])
        if cfg["offset"]:
            nproj = nproj + p["offset"]
        n_decay = jnp.exp(-nf(nproj))
        out = n_decay[..., None].astype(out.dtype) * out
        c = c[:-1] + (S,)
        return _dense(out.reshape(out.shape[0], -1), p["out_proj"]), c

    # -- teacher-forced scan (parity surface) and generation -----------------

    def stepwise_logits(self, tokens):
        """tokens (B, L) → per-position logits (B, L, V) via the step path."""
        tokens = jnp.asarray(tokens)
        if "stepwise" not in self._gen_cache:
            self._gen_cache["stepwise"] = self._jit(self._stepwise_impl)
        return self._gen_cache["stepwise"](self.params, tokens)

    def _stepwise_impl(self, params, tokens):
        B, L = tokens.shape
        cache = self.init_cache(B, L, params)

        def body(carry, tok_t):
            cache, pos = carry
            cache, logits = self.step(cache, tok_t, pos, params)
            return (cache, pos + 1), logits

        (_, _), logits = jax.lax.scan(
            body, (cache, jnp.asarray(0, jnp.int32)), tokens.T
        )
        return jnp.moveaxis(logits, 0, 1)

    def generate(
        self,
        prompt,
        n_new: int,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
        top_k: int = 0,
        top_p: float = 0.0,
    ):
        """Greedy (temperature 0) or sampled generation.

        prompt: (B, L0) int tokens → (B, L0 + n_new).  ``top_k > 0``
        restricts sampling to the k highest logits; ``0 < top_p < 1``
        applies nucleus sampling (smallest logit set with cumulative
        probability ≥ top_p).  Both compose with ``temperature``."""
        prompt = jnp.asarray(prompt)
        B, L0 = prompt.shape
        sample = temperature > 0.0
        if sample and rng is None:
            raise ValueError("sampling requires rng")
        key = (L0, int(n_new), bool(sample), float(temperature), B,
               int(top_k), float(top_p))
        if key not in self._gen_cache:
            self._gen_cache[key] = self._jit(
                partial(self._generate_impl, L0=L0, n_new=int(n_new),
                        temperature=float(temperature), sample=sample,
                        top_k=int(top_k), top_p=float(top_p))
            )
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._gen_cache[key](self.params, prompt, rng)

    def _jit(self, fn):
        """jit an (params, tokens[, rng]) function; with a serving mesh,
        params are replicated and the token batch axis is sharded."""
        if self.mesh is None:
            return jax.jit(fn)
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(self.mesh, PartitionSpec())
        data = NamedSharding(self.mesh, PartitionSpec(self.mesh.axis_names[0]))
        return jax.jit(fn, in_shardings=(repl, data, repl)[: _n_pos_args(fn)])

    @staticmethod
    def _filter_logits(logits, top_k, top_p):
        if top_k > 0:
            kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        if 0.0 < top_p < 1.0:
            sorted_l = jnp.sort(logits, axis=-1)[..., ::-1]
            probs = jax.nn.softmax(sorted_l, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # keep the smallest prefix whose mass reaches top_p (the first
            # token is always kept); threshold = smallest kept logit
            keep = cum - probs < top_p
            thresh = jnp.min(jnp.where(keep, sorted_l, jnp.inf), axis=-1,
                             keepdims=True)
            logits = jnp.where(logits < thresh, -jnp.inf, logits)
        return logits

    def _generate_impl(self, params, prompt, rng, *, L0, n_new, temperature,
                       sample, top_k=0, top_p=0.0):
        B = prompt.shape[0]
        if self.family == "s4":
            # S4's CNN mode exposes no state: stepwise prefill scan
            cache = self.init_cache(B, L0 + n_new, params)

            def pre(carry, tok_t):
                cache, pos = carry
                cache, logits = self.step(cache, tok_t, pos, params)
                return (cache, pos + 1), logits

            (cache, pos), logits_all = jax.lax.scan(
                pre, (cache, jnp.asarray(0, jnp.int32)), prompt.T
            )
            logits = logits_all[-1]
        else:
            # chunked/MXU prefill: the prompt runs through the full-sequence
            # kernels in O(L/chunk) matmuls, not L sequential steps
            cache, logits = self.prefill(prompt, L0 + n_new, params)
            pos = jnp.asarray(L0, jnp.int32)

        def gen_body(carry, rng_t):
            cache, pos, logits = carry
            if sample:
                lg = self._filter_logits(logits, top_k, top_p)
                tok = jax.random.categorical(rng_t, lg / temperature, axis=-1)
            else:
                tok = jnp.argmax(logits, axis=-1)
            tok = tok.astype(prompt.dtype)
            cache, logits = self.step(cache, tok, pos, params)
            return (cache, pos + 1, logits), tok

        rngs = jax.random.split(rng, n_new)
        (_, _, _), toks = jax.lax.scan(gen_body, (cache, pos, logits), rngs)
        return jnp.concatenate([prompt, toks.T], axis=1)

    # -- parallel (chunked / MXU) prefill ------------------------------------

    def prefill(self, prompt, max_len: Optional[int] = None, params=None):
        """Process the prompt with the framework's FULL-SEQUENCE ops (the
        K1 chunked SSD scan, K3 chunked linear attention, K5 diagonal
        associative scan, flash attention, grouped conv) and construct the
        decode cache directly — O(L/chunk) MXU work instead of L sequential
        steps.  Returns (cache, logits at the last prompt position).

        S4 has no exposed state in CNN mode; ``prefill`` raises there and
        ``generate`` falls back to the stepwise scan."""
        params = self.params if params is None else params
        prompt = jnp.asarray(prompt)
        max_len = int(prompt.shape[1]) if max_len is None else max_len
        if self.family == "s4":
            raise NotImplementedError("S4 prefill falls back to stepwise")
        if self.family in ("lru", "s5"):
            return self._ssm_prefill(params, prompt)
        if self.family == "mamba":
            return self._mamba_prefill(params, prompt)
        return self._tf_prefill(params, prompt, max_len)

    @staticmethod
    def _conv_tail(pre, K):
        """Trailing K−1 pre-conv inputs, front-padded for short prompts."""
        B, L, C = pre.shape
        if K <= 1:
            return jnp.zeros((B, 0, C), pre.dtype)
        if L >= K - 1:
            return pre[:, L - (K - 1):]
        pad = jnp.zeros((B, K - 1 - L, C), pre.dtype)
        return jnp.concatenate([pad, pre], axis=1)

    def _ssm_prefill(self, params, prompt):
        from ..ops.scan import diag_linear_scan

        cfg = self.cfg
        enc = params["encoder"]
        ep = enc["encoder"]
        x = jnp.take(ep["kernel"], prompt, axis=0) + ep["bias"]  # (B, L, d)
        act, prenorm = cfg["activation"], cfg["prenorm"]
        norm = cfg.get("norm", "layer")
        L = prompt.shape[1]
        cache = []
        for i in range(cfg["num_layers"]):
            p = enc[f"layers_{i}"]
            skip = x
            if prenorm:
                x = self._backbone_norm(x, p, i, norm)
            consts = self._ssm_consts[i]
            lam, cpair, dvec = consts["lam"], consts["c"], consts["d"]
            br, bi = consts["bn"] if self.family == "lru" else consts["b"]
            bu = (x @ br.T, x @ bi.T)  # (B, L, N) pair
            a = (jnp.broadcast_to(lam[0], (L,) + lam[0].shape),
                 jnp.broadcast_to(lam[1], (L,) + lam[1].shape))
            hr, hi = diag_linear_scan(a, bu)
            cache.append((hr[:, -1], hi[:, -1]))
            y = hr @ cpair[0].T - hi @ cpair[1].T
            if self.family == "s5":
                y = consts["mult"] * y
            x2 = y + dvec * x
            if act == "full_glu":
                x2 = jax.nn.gelu(x2)
                x2 = _dense(x2, p["out1"]) * jax.nn.sigmoid(_dense(x2, p["out2"]))
            elif act == "half_glu1":
                x2 = jax.nn.gelu(x2)
                x2 = x2 * jax.nn.sigmoid(_dense(x2, p["out2"]))
            elif act == "half_glu2":
                x1 = jax.nn.gelu(x2)
                x2 = x2 * jax.nn.sigmoid(_dense(x1, p["out2"]))
            elif act == "gelu":
                x2 = jax.nn.gelu(x2)
            else:
                raise NotImplementedError(act)
            x = skip + x2
            if not prenorm:
                x = self._backbone_norm(x, p, i, norm)
        logits = _dense(x[:, -1], params["decoder"])
        return tuple(cache), logits

    def _mamba_prefill(self, params, prompt):
        from ..ops.conv import depthwise_causal_conv1d
        from ..ops.scan import diag_linear_scan
        from ..ops.ssd import ssd_chunked_scan

        cfg = self.cfg
        d = cfg["hidden_dim"]
        expand = cfg["expansion"]
        d_inner = expand * d
        headdim = d // cfg["num_heads"]
        H = d_inner // headdim
        n = cfg["state_dim"]
        g = cfg.get("ngroups", 1)
        K = cfg["conv_dim"]
        pseudo = cfg.get("pseudoLTI", False)
        dt_limit = tuple(cfg.get("dt_limit", (0.0, float("inf"))))
        conv_dim = d_inner + 2 * g * n

        x = jnp.take(params["encoder"]["word_embeddings"]["embedding"],
                     prompt, axis=0)
        bsz, L = prompt.shape
        cache = []
        for i in range(cfg["num_layers"]):
            p = params[f"blocks_{i}"]
            skip = x
            if cfg["prenorm"]:
                x = _ln(x, p["norm_layer"], 1e-5)
            pm = p["mamba"]
            if cfg["version"] == "mamba1":
                xz = _dense(x, pm["in_proj"])
                xi, z = jnp.split(xz, 2, axis=-1)
                buf = self._conv_tail(xi, K)
                if K > 0:
                    cw = pm["conv1d"]
                    xi = jax.nn.silu(
                        depthwise_causal_conv1d(xi, cw["weight"], cw["bias"])
                    )
                x_db = _dense(xi, pm["x_proj"])
                r = x_db.shape[-1] - 2 * n
                dt = jax.nn.softplus(_dense(x_db[..., :r], pm["dt_proj"]))
                B_m = x_db[..., r : r + n]
                C_m = x_db[..., r + n :]
                A = -jnp.exp(pm["A_log"])  # (d_inner, n)
                a = jnp.exp(dt[..., None] * A)
                bx = (dt * xi)[..., None] * B_m[..., None, :]
                h = diag_linear_scan(a, bx, axis=1)  # (B, L, d_inner, n)
                cache.append((buf, h[:, -1].astype(self.state_dtype)))
                y = jnp.einsum("bldn,bln->bld", h, C_m) + pm["D"] * xi
                y = y * jax.nn.silu(z)
                y = _dense(y, pm["out_proj"])
            else:
                xbcdt = _dense(x, pm["in_proj"])
                xBC = xbcdt[..., :conv_dim]
                dt = jax.nn.softplus(xbcdt[..., conv_dim:] + pm["dt_bias"])
                buf = self._conv_tail(xBC, K)
                if K > 0:
                    cw = pm["conv1d"]
                    xBC = jax.nn.silu(
                        depthwise_causal_conv1d(xBC, cw["weight"], cw["bias"])
                    )
                xr = xBC[..., :d_inner].reshape(bsz, L, H, headdim)
                B_flat = xBC[..., d_inner : d_inner + g * n]
                C_m = xBC[..., d_inner + g * n :].reshape(bsz, L, g, n)
                h0 = None
                if "init_states" in pm:
                    h0 = jnp.broadcast_to(
                        pm["init_states"], (bsz,) + pm["init_states"].shape
                    )
                if pseudo:
                    A = -jax.nn.softplus(pm["A"])
                    khead = (n * g) // H
                    dt_full = jnp.repeat(dt, khead, axis=-1)
                    B_m = (dt_full * B_flat).reshape(bsz, L, g, n)
                    beta = jnp.ones((bsz, L, H))
                    y, hfin = ssd_chunked_scan(
                        xr, beta, A, B_m, C_m, D=pm["D"],
                        initial_states=h0, dt_limit=dt_limit,
                        return_final_state=True,
                    )
                else:
                    A = -jnp.exp(pm["A_log"])
                    y, hfin = ssd_chunked_scan(
                        xr, dt, A, B_flat.reshape(bsz, L, g, n), C_m,
                        D=pm["D"], initial_states=h0, dt_limit=dt_limit,
                        return_final_state=True,
                    )
                # reference layout (B, H, P, N) → decode layout (B, H, N, P)
                cache.append((buf, jnp.swapaxes(hfin, -1, -2)
                              .astype(self.state_dtype)))
                y = _dense(y.reshape(bsz, L, d_inner), pm["out_proj"])
            x = _gelu_exact(y)
            if cfg["glu"]:
                gp = p["glu_layer"]["linear"]
                hh = _dense(x, gp)
                x = hh[..., : x.shape[-1]] * jax.nn.sigmoid(hh[..., x.shape[-1]:])
            x = x + skip
            if not cfg["prenorm"]:
                x = _ln(x, p["norm_layer"], 1e-5)
        logits = _dense(x[:, -1], params["decoder"])
        return tuple(cache), logits

    def _tf_prefill(self, params, prompt, max_len):
        from ..ops.attention import causal_softmax_attention
        from ..ops.conv import depthwise_causal_conv1d
        from ..ops.linear_attention import chunked_linear_attention

        cfg = self.cfg
        d_model = cfg["hidden_dim"]
        d_qk = cfg["state_dim"]
        Hh = cfg["num_heads"]
        hd, vd = d_qk // Hh, d_model // Hh
        att = cfg["attention_fn"]
        K = cfg.get("dim_conv", 0)
        conv_full = cfg.get("conv_type", "full") == "full"
        bsz, L = prompt.shape

        enc = params["encoder"]
        x = jnp.take(enc["word_embeddings"]["embedding"], prompt, axis=0)
        if cfg.get("max_pos_embed", 0) > 0:
            x = x + jnp.take(enc["position_embeddings"]["embedding"],
                             jnp.arange(L), axis=0)

        def split3(t):
            return t.reshape(bsz, L, Hh, t.shape[-1] // Hh)

        cache = []
        for i in range(cfg["num_layers"]):
            p = params[f"layers_{i}"]
            pa = p["attention"]
            if cfg.get("use_gate", False):
                z = _dense(x, p["Wz"])
            skip = x
            xn = _ln(x, p["norm"], 1e-5)

            c = ()
            if att == "norm-attention":
                vqkn = _dense(xn, pa["Wvqkn"])
                vqk = vqkn[..., : d_model + 2 * d_qk]
                nproj = vqkn[..., d_model + 2 * d_qk :].astype(jnp.float32)
                if K > 0:
                    pre = vqk if conv_full else vqk[..., d_model:]
                    c = (self._conv_tail(pre, K),)
                    cw = pa["conv1d"]
                    conv = jax.nn.silu(depthwise_causal_conv1d(
                        pre, cw["weight"], cw["bias"]))
                    vqk = conv if conv_full else jnp.concatenate(
                        [vqk[..., :d_model], conv], axis=-1)
                v = split3(vqk[..., :d_model])
                q = split3(vqk[..., d_model : d_model + d_qk])
                k = split3(vqk[..., d_model + d_qk :])
                fn = approx_fn_by_name(cfg["approx_fn"])
                q, k = fn(q), fn(k)
                scale = 1.0 / math.sqrt(hd) if cfg["scale_B"] else 1.0
                out = chunked_linear_attention(q, k, v, scale=scale)
                S = jnp.einsum("blhd,blhe->bhde",
                               (k * scale).astype(jnp.float32),
                               v.astype(jnp.float32))
                c = c + (S.astype(self.state_dtype),)
                nf = norm_fn_by_name(cfg["norm_fn"])
                if cfg["offset"]:
                    nproj = nproj + pa["offset"]
                out = jnp.exp(-nf(nproj))[..., None].astype(out.dtype) * out
            else:
                qkv = _dense(xn, pa["Wqkv"])
                if K > 0:
                    pre = qkv if conv_full else qkv[..., : 2 * d_qk]
                    c = (self._conv_tail(pre, K),)
                    cw = pa["conv1d"]
                    conv = jax.nn.silu(depthwise_causal_conv1d(
                        pre, cw["weight"], cw["bias"]))
                    qkv = conv if conv_full else jnp.concatenate(
                        [conv, qkv[..., 2 * d_qk :]], axis=-1)
                q = split3(qkv[..., :d_qk])
                k = split3(qkv[..., d_qk : 2 * d_qk])
                v = split3(qkv[..., 2 * d_qk :])
                if att == "lin-attention":
                    q = jax.nn.elu(q) + 1
                    k = jax.nn.elu(k) + 1
                    num, nrm = chunked_linear_attention(
                        q, k, v, scale=1.0, return_normalizer=True)
                    out = num / nrm[..., None].astype(num.dtype)
                    S = jnp.einsum("blhd,blhe->bhde",
                                   k.astype(jnp.float32),
                                   v.astype(jnp.float32))
                    c = c + (S.astype(self.state_dtype),
                             k.astype(jnp.float32).sum(axis=1))
                else:
                    impl = None
                    if not cfg.get("use_flash", False) or hd != vd:
                        impl = "xla"
                    out = causal_softmax_attention(
                        q, k, v, scale=1.0 / math.sqrt(hd), impl=impl)
                    kc = jnp.zeros((bsz, max_len, Hh, hd), jnp.float32)
                    vc = jnp.zeros((bsz, max_len, Hh, vd), jnp.float32)
                    kc = jax.lax.dynamic_update_slice_in_dim(kc, k, 0, axis=1)
                    vc = jax.lax.dynamic_update_slice_in_dim(vc, v, 0, axis=1)
                    c = c + (kc, vc)
            cache.append(c)
            x = _dense(out.reshape(bsz, L, -1), pa["out_proj"]) + skip

            y = _ln(x, p["norm"], 1e-5)
            mixer = cfg["mixer"]
            if mixer == "mlp":
                m = p["mixer"]
                y = _dense(_gelu_exact(_dense(y, m["encoder"])), m["decoder"])
            elif mixer == "glu":
                m = p["mixer"]["linear"]
                hh = _dense(y, m)
                y = hh[..., :d_model] * jax.nn.sigmoid(hh[..., d_model:])
            elif mixer == "hybrid":
                m = p["mixer"]
                xz = _dense(y, m["encoder"])
                a = jax.nn.sigmoid(m["alpha"])
                glu_out = xz[..., :d_model] * jax.nn.sigmoid(xz[..., d_model:])
                mlp_out = _dense(_gelu_exact(xz), m["decoder"])
                y = a * glu_out + (1 - a) * mlp_out
            if mixer == "none":
                if cfg.get("use_gate", False):
                    y = y * jax.nn.silu(z)
            else:
                if cfg.get("use_gate", False):
                    y = (x + y) * jax.nn.silu(z)
                else:
                    y = x + y
            x = y
        x = _ln(x, params["norm"], 1e-5)
        logits = _dense(x[:, -1], params["decoder"])
        return tuple(cache), logits
