"""Mesh sweep runner: seed×LR grids vmapped over devices.

Replaces the reference's serial sweep loop (ref launch.py:167-178) with the
TPU-native scheme from SURVEY.md §2.4 / BASELINE.md: sweep points whose
array shapes agree are stacked on a leading *grid* axis, initialised with
per-point seeds via ``vmap``, sharded across a 1-D device mesh, and trained
with the on-device scanned block vmapped over the grid — one XLA program
trains every point simultaneously.

Per-point early stopping (``stop_criterion``, ref train.py:683-688) is
masked: points that have hit the criterion keep their parameters frozen by
zeroing their injected learning rate, so grid points finishing at different
steps never force a reshape.  Points share a compiled group only when their
configs agree on EVERY key except the per-point-threaded ones (seed, lr,
ssm_lr) — sweeping any other parameter (num_layers, wd, norm_fn, …)
partitions the grid into groups compiled and trained separately, each with
its own correct config (round-5 fix: the previous shape-key grouping
silently trained the leader's value for non-shape params).

Per-point completion is journaled so a preempted sweep resumes where it
stopped (the reference loses the whole grid on a crash).
"""

from __future__ import annotations

import copy
import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig, apply_sweep_point
from ..models.registry import build_models
from ..training.checkpoint import save_checkpoint
from ..training.loop import _family_norm
from ..training.scan_loop import (
    batch_indices,
    eval_indices,
    make_eval_block,
    make_train_block,
    put_dataset,
)
from ..training.state import (
    create_train_state,
    create_train_state_adamw,
    create_train_state_s5,
)
from .mesh import default_mesh, replicate, shard_leading_axis

# Per-point quantities the stacked trainer genuinely threads through the
# grid axis: the init/dropout seed and the two learning rates (injected as
# dynamic scalars each block).  EVERYTHING else — wd, schedule, model
# hyperparameters, … — is read once from the group leader, so two points may
# share a compiled group only if their configs agree on every other key.
# Grouping by the full masked config (rather than a fixed shape-key list)
# makes ``--sweep_parallel`` correct for arbitrary sweep parameters: sweeping
# e.g. ``train.wd`` or ``model.norm_fn`` simply yields one group per value,
# each trained with its own config (reference serial semantics,
# ref launch.py:19-49,167-178).
_PER_POINT_KEYS = (("seed",), ("train", "lr"), ("train", "ssm_lr"))


def _group_signature(cfg: ExperimentConfig) -> str:
    masked = copy.deepcopy(cfg.raw)
    for path in _PER_POINT_KEYS:
        node = masked
        for key in path[:-1]:
            node = node.get(key, {})
        node.pop(path[-1], None)
    return json.dumps(masked, sort_keys=True, default=str)


def _journal_path(cfg: ExperimentConfig) -> str:
    stem = cfg.save or "./checkpoint/sweep"
    return stem + ".sweep_journal.jsonl"


def _load_journal(path: str) -> Dict[str, Dict[str, Any]]:
    done = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                done[rec["point_key"]] = rec
    return done


def _point_key(point: Dict) -> str:
    return json.dumps({"/".join(k): v for k, v in sorted(point.items())})


def _stacked_state(cfg: ExperimentConfig, train_model, seeds, integer_inputs):
    """vmap the state factory over per-point seeds → stacked TrainState."""
    model_config, train_config = cfg.model, cfg.train
    family = model_config["layer"]
    betas = tuple(train_config.get("betas") or (0.9, 0.999))

    def make(seed):
        rng = jax.random.PRNGKey(seed)
        init_rng, _ = jax.random.split(rng)
        common = dict(
            rng=init_rng,
            in_dim=model_config["input_dim"],
            batch_size=2,  # init only traces shapes; batch dim is irrelevant
            seq_len=model_config["seq_len"],
            padded=train_config.get("padded", False),
            integer_inputs=integer_inputs,
        )
        if family in ("lru", "s4", "s5"):
            factory = create_train_state_s5 if family == "s5" else create_train_state
            state, _ = factory(
                train_model,
                weight_decay=train_config["wd"],
                norm=model_config.get("norm", "layer"),
                ssm_lr=train_config.get("ssm_lr", train_config["lr"]),
                ssm_vars=model_config.get("ssm_lr_vars", []),
                lr=train_config["lr"],
                betas=betas,
                **common,
            )
        else:
            state, _ = create_train_state_adamw(
                train_model,
                weight_decay=train_config["wd"],
                lr=train_config["lr"],
                betas=betas,
                param_group=train_config.get("param_group"),
                group_lr=train_config.get("group_lr", 1e-3),
                update_step=train_config.get("update_step", 1),
                **common,
            )
        return state

    return jax.vmap(make)(jnp.asarray(seeds, dtype=jnp.uint32))


def run_sweep_on_mesh(
    base: ExperimentConfig,
    points: List[Dict],
    dataset,
    metrics_fn,
    wandb_config: Optional[Dict[str, Any]] = None,
    conf_args: Optional[Dict[str, Any]] = None,
    mesh=None,
    max_points_per_device: int = 4,
) -> List[Tuple[Optional[str], float]]:
    """Train every sweep point in parallel on the mesh; then (serially)
    checkpoint each point and run the eigen analysis.

    Returns [(checkpoint_path | None, perf)] in point order.
    """
    mesh = mesh or default_mesh("grid")
    n_dev = int(np.prod(mesh.devices.shape))

    # resolve per-point configs; group by shape signature
    cfgs: List[ExperimentConfig] = []
    for point in points:
        c = apply_sweep_point(base, point)
        c.derive_runtime_fields(dataset)
        cfgs.append(c)

    journal_path = _journal_path(base)
    done = _load_journal(journal_path)
    # the reference-parity checkpoint name embeds seed/layers/conv/state_dim
    # + perf but NOT every swept param (ref train.py:711-715), so two points
    # (e.g. a wd sweep) with equal perf would silently overwrite each other;
    # disambiguate collisions within a sweep run with a -pN suffix
    used_paths = {r.get("path") for r in done.values() if r.get("path")}

    groups: Dict[str, List[int]] = {}
    for i, c in enumerate(cfgs):
        groups.setdefault(_group_signature(c), []).append(i)

    results: List[Tuple[Optional[str], float]] = [(None, 0.0)] * len(points)

    for sig, members in groups.items():
        pending = [i for i in members if _point_key(points[i]) not in done]
        for i in members:
            key = _point_key(points[i])
            if key in done:
                rec = done[key]
                results[i] = (rec.get("path"), rec.get("perf", 0.0))
        if not pending:
            continue
        # split into waves bounded by per-device HBM: each grid point carries
        # its own step transients, so points-per-device is the memory knob
        wave = max(1, max_points_per_device * n_dev)
        for w0 in range(0, len(pending), wave):
            _run_group(
                base, cfgs, points, pending[w0 : w0 + wave], dataset,
                metrics_fn, mesh, n_dev, results, journal_path,
                wandb_config, conf_args, used_paths,
            )

    return results


def _run_group(
    base, cfgs, points, members, dataset, metrics_fn, mesh, n_dev,
    results, journal_path, wandb_config, conf_args, used_paths=None,
):
    g_real = len(members)
    # pad the grid to a multiple of the device count
    g = -(-g_real // n_dev) * n_dev
    idx_members = members + [members[-1]] * (g - g_real)

    cfg0 = cfgs[members[0]]
    model_config, train_config = cfg0.model, cfg0.train
    family = model_config["layer"]
    norm = _family_norm(model_config, family)
    train_model, eval_model, _ = build_models(model_config, train_config.get("padded", False))
    integer_inputs = np.issubdtype(np.asarray(dataset.train_inputs[:1]).dtype, np.integer)

    seeds = [cfgs[i].seed for i in idx_members]
    lrs0 = np.array([cfgs[i].train["lr"] for i in idx_members], np.float32)
    ssm_lrs0 = np.array(
        [cfgs[i].train.get("ssm_lr", cfgs[i].train["lr"]) for i in idx_members],
        np.float32,
    )

    print(f"[sweep] group {len(members)} points (padded to {g}) on {n_dev} devices")
    state = _stacked_state(cfg0, train_model, seeds, integer_inputs)
    state = shard_leading_axis(state, mesh)

    data = put_dataset(
        np.asarray(dataset.train_inputs), np.asarray(dataset.train_labels)
    )
    test = put_dataset(
        np.asarray(dataset.test_inputs), np.asarray(dataset.test_labels)
    )
    data = replicate(data, mesh)
    test = replicate(test, mesh)

    total_steps = train_config.get("total_steps")
    if total_steps is None:
        spe = max(1, len(dataset.train_inputs) // train_config["batch_size"])
        total_steps = spe * train_config["num_epochs"]
        eval_every = spe
    else:
        eval_every = train_config["eval_every"]
    warmup = train_config.get("warmup_steps", train_config.get("warmup", 0)) or 0
    cosine = train_config.get("cosine_anneal", True)
    lr_min = train_config.get("lr_min", 1e-6)
    stop_criterion = train_config.get("stop_criterion")
    bsz = train_config["batch_size"]

    group_names = tuple(sorted(state.opt_state.inner_states.keys()))
    # sparse decoder head (see training/loop.py): gather the ≤K valid label
    # positions before the decoder matmul when labels are mostly -100 (MQAR);
    # identical loss/grads, vocab path shrinks by L/K per grid point.
    # K covers train ∪ test (shared helper, scan_loop.sparse_head_k_for).
    sparse_k = None
    if train_config.get("sparse_head", True):
        from ..training.scan_loop import sparse_head_k_for

        sparse_k = sparse_head_k_for(
            cfg0.model, dataset.train_labels, dataset.test_labels
        )
    block = make_train_block(
        train_model, norm, group_names, warmup, total_steps, cosine, lr_min,
        sparse_head_k=sparse_k,
    )
    evaluator = make_eval_block(eval_model, norm, metrics_fn, sparse_head_k=sparse_k)

    # vmap over the grid axis: per-point state, learning rates AND batch
    # index streams (each point samples batches from its own seed-derived
    # host rng, exactly as the serial loop does — the per-point gather from
    # the shared device-resident dataset is noise next to the train step);
    # the dataset itself is a broadcast argument (in_axes=None): closing
    # over it would bake the whole split into the serialized program as
    # constants (hundreds of MB through the remote-compile channel)
    eval_idx_arr = jnp.asarray(eval_indices(len(dataset.test_inputs), bsz))
    # the stacked grid state is donated: per-point params + moments update in
    # place (the grid axis multiplies the state footprint by points/device)
    vblock = jax.jit(
        jax.vmap(
            lambda st, rng, d, idx, step0, lr, slr: block(st, rng, d, idx, step0, lr, slr),
            in_axes=(0, 0, None, 0, None, 0, 0),
        ),
        donate_argnums=(0,),
    )
    veval = jax.jit(
        jax.vmap(lambda st, t, ei: evaluator(st, t, ei), in_axes=(0, None, None))
    )

    # Per-point rng streams derived exactly as the serial loop derives them
    # (training/loop.py::_make_state: ``init_rng, train_rng = split(PRNGKey(seed))``,
    # then one ``train_rng, block_rng = split(train_rng)`` per eval period;
    # and a per-point ``np.random.default_rng(seed)`` host batch-index
    # stream) — so every point's dropout draws AND data order depend only on
    # its own seed, never on grid slot or wave membership, and each point
    # reproduces its serial run up to vmap float reassociation.
    nprngs = [np.random.default_rng(cfgs[i].seed) for i in idx_members]
    train_rngs = jax.jit(jax.vmap(
        lambda s: jax.random.split(jax.random.PRNGKey(s))[1]
    ))(jnp.asarray(seeds, dtype=jnp.uint32))
    vsplit = jax.jit(jax.vmap(lambda k: jax.random.split(k)))

    lrs = jnp.asarray(lrs0)
    ssm_lrs = jnp.asarray(ssm_lrs0)
    active = np.ones(g, dtype=bool)
    perfs = np.zeros(g, np.float32)
    step = 0
    t0 = time.perf_counter()

    while step < total_steps and active.any():
        k = int(min(eval_every, total_steps - step))
        idx = jnp.asarray(np.stack([
            batch_indices(r, len(dataset.train_inputs), bsz, k) for r in nprngs
        ]))  # (g, k, B): per-point seed-derived batch streams
        # frozen points step with lr 0: parameters stay fixed
        eff_lr = jnp.where(jnp.asarray(active), lrs, 0.0)
        eff_slr = jnp.where(jnp.asarray(active), ssm_lrs, 0.0)
        keys = vsplit(train_rngs)
        train_rngs, block_rngs = keys[:, 0], keys[:, 1]
        state, train_loss = vblock(
            state, block_rngs, data, idx, jnp.asarray(step), eff_lr, eff_slr
        )
        step += k
        losses, perf_now = veval(state, test, eval_idx_arr)
        perf_now = np.asarray(perf_now)
        perfs = np.where(active, perf_now, perfs)
        if stop_criterion is not None:
            newly_done = active & (perf_now > stop_criterion)
            if newly_done.any():
                print(f"[sweep] step {step}: {int(newly_done.sum())} point(s) hit "
                      f"stop criterion {stop_criterion}")
            active &= ~(perf_now > stop_criterion)
        print(
            f"[sweep] step {step}/{total_steps}: active {int(active.sum())}/{g_real} "
            f"| best perf {float(perfs[:g_real].max()):.4f} "
            f"| {step * g_real / (time.perf_counter() - t0):.0f} point-steps/s"
        )

    # unstack, checkpoint, journal, analyse — host-side, per real point
    for slot, i in enumerate(idx_members[:g_real]):
        cfg_i = cfgs[i]
        perf = float(perfs[slot])
        point_state = jax.tree_util.tree_map(lambda x: np.asarray(x[slot]), state)
        path = None
        ckpt = cfg_i.checkpoint_name()
        if ckpt is not None:
            cfg_tree = {
                "model": dict(cfg_i.model), "train": dict(cfg_i.train),
                "data": dict(cfg_i.dataset),
            }
            path = ckpt + f"-perf{perf:0.3f}"
            if used_paths is not None:
                n, stem = 1, path
                while path in used_paths:
                    path = f"{stem}-p{n}"
                    n += 1
                used_paths.add(path)
            save_checkpoint(path, point_state, cfg_tree)
        results[i] = (path, perf)
        with open(journal_path, "a") as f:
            f.write(json.dumps({
                "point_key": _point_key(points[i]), "path": path, "perf": perf,
            }) + "\n")
        if path is not None and conf_args is not None:
            from ..analysis import eval_eig

            loader = dataset.test_dataloader(
                batch_size=conf_args["batch_size"], shuffle=False
            )
            # hand the unstacked in-memory params over — no orbax re-restore
            eval_eig(cfg_i.raw, conf_args, wandb_config, cfg_i.dataset,
                     loader, path, perf, params=point_state.params)
