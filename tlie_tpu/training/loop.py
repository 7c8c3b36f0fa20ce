"""Unified training driver for all six model families.

One loop replaces the reference's four (``train_torch`` / ``train_torch_step``
/ ``train_jax`` / ``train_jax_step``, ref train.py:36-704): every family is a
flax model with a jitted functional step, so the only remaining axes are
*step-driven vs epoch-driven* cadence and the optimizer grouping policy.
Dispatch rules match the reference (ref train.py:745-796):

  * transformer / mamba → AdamW + clip(1.0); step-driven when lang_model
  * lru / s4 / s5       → {ssm, regular} optax groups; step-driven when
                          lang_model or (lru ∧ listops); plateau decay
Early stopping on ``stop_criterion``, warmup→cosine LR, orbax checkpoint
named ``...-perf{:.3f}`` — all as in the reference.
"""

from __future__ import annotations

import sys
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os
import shutil

from ..config import ExperimentConfig
from ..models.registry import build_models
from .checkpoint import restore_resume, save_checkpoint, save_resume
from .schedules import PlateauState, reduce_lr_on_plateau, schedule_for_step
from .state import (
    create_train_state,
    create_train_state_adamw,
    create_train_state_s5,
)
from .steps import eval_step, prep_batch, train_step
from ..utils.logging import RunLogger


def _family_norm(model_config: Dict[str, Any], family: str) -> str:
    # the jitted step only branches on batch-norm (mutable batch_stats)
    return model_config.get("norm", "layer") if family in ("lru", "s4", "s5") else "layer"


def _data_mesh(batch_size: int):
    """1-D ``data`` mesh over all local devices for batch-sharded training
    (SURVEY.md §2.4) — None when single-device or the batch doesn't divide."""
    devs = jax.devices()
    if len(devs) <= 1 or batch_size % len(devs) != 0:
        return None
    from jax.sharding import Mesh

    return Mesh(np.asarray(devs), ("data",))


def _make_state(config: ExperimentConfig, train_model, integer_inputs: bool):
    model_config = config.model
    train_config = config.train
    family = model_config["layer"]
    rng = jax.random.PRNGKey(config.seed)
    init_rng, train_rng = jax.random.split(rng)
    betas = tuple(train_config.get("betas") or (0.9, 0.999))

    common = dict(
        rng=init_rng,
        in_dim=model_config["input_dim"],
        batch_size=train_config["batch_size"],
        seq_len=model_config["seq_len"],
        padded=train_config.get("padded", False),
        integer_inputs=integer_inputs,
    )
    if family in ("lru", "s4", "s5"):
        factory = create_train_state_s5 if family == "s5" else create_train_state
        state, counts = factory(
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
        state, counts = create_train_state_adamw(
            train_model,
            weight_decay=train_config["wd"],
            lr=train_config["lr"],
            betas=betas,
            param_group=train_config.get("param_group"),
            group_lr=train_config.get("group_lr", 1e-3),
            update_step=train_config.get("update_step", 1),
            **common,
        )
    return state, counts, train_rng


def _evaluate(state, eval_model, testloader, seq_len, in_dim, lang_model, norm, metrics_fn):
    losses, perfs = [], []
    for batch in testloader:
        inputs, labels = prep_batch(batch, seq_len, in_dim, lang_model)
        loss, _, logits = eval_step(inputs, labels, state, eval_model, norm)
        losses.append(loss)
        perfs.append(metrics_fn(logits, labels))
    return float(np.mean(jax.device_get(losses))), float(np.mean(jax.device_get(perfs)))


class TrainResult(tuple):
    """``(checkpoint_path | None, final perf)`` — the reference ``train()``
    contract (ref train.py:706) — that additionally carries the final
    ``TrainState`` as ``.state`` so the in-process train→analyze path can
    hand the trained params straight to ``eval_eig`` without re-restoring
    the checkpoint it just wrote (the orbax restore + param re-upload was
    the dominant warm analysis cost at LM shapes)."""

    def __new__(cls, path, perf, state):
        result = super().__new__(cls, (path, perf))
        result.state = state
        return result


def train(
    config: ExperimentConfig,
    trainloader,
    testloader,
    metrics_fn: Callable,
    wandb_config: Optional[Dict[str, Any]] = None,
) -> Tuple[Optional[str], float]:
    """Train one configuration; returns (checkpoint_path | None, final perf)
    as a :class:`TrainResult` that also exposes the final train state.

    Contract parity with ref train.py:706-803.
    """
    model_config = config.model
    train_config = config.train
    data_config = config.dataset
    family = model_config["layer"]
    lang_model = bool(config.raw.get("lang_model", config.lang_model))
    seq_len = model_config["seq_len"]
    in_dim = model_config["input_dim"]
    norm = _family_norm(model_config, family)
    padded = train_config.get("padded", False)

    run_name = (
        f"{(wandb_config or {}).get('name', family)}-dmodel{model_config['hidden_dim']}"
        f"-seed{config.seed}-num_layers{model_config['num_layers']}"
        f"-dqk{model_config['state_dim']}-lr{train_config['lr']}"
    )
    logger = RunLogger(wandb_config, run_name, config.raw)

    train_model, eval_model, _ = build_models(model_config, padded)
    integer_inputs = np.issubdtype(np.asarray(trainloader.inputs[:1]).dtype, np.integer)
    state, (nr_params, nr_encoder), train_rng = _make_state(
        config, train_model, integer_inputs
    )
    print(f"Nr. of parameters: {nr_params} (encoder: {nr_encoder})")
    logger.log({"params": nr_params, "params without encoder": nr_params - nr_encoder})

    group_names = set(state.opt_state.inner_states.keys())
    lr = train_config["lr"]
    ssm_lr = train_config.get("ssm_lr", lr)
    lr_min = train_config.get("lr_min", 1e-6)
    cosine = train_config.get("cosine_anneal", True)
    stop_criterion = train_config.get("stop_criterion")
    plateau_enabled = "reduce_factor" in train_config
    plateau = PlateauState(lr, ssm_lr, 0, -np.inf)

    step_driven = family in ("mamba", "transformer") and lang_model or (
        family in ("lru", "s4", "s5")
        and (lang_model or (family == "lru" and data_config.get("_name_") == "listops"))
    )

    if step_driven:
        total_steps = train_config["total_steps"]
        eval_every = train_config["eval_every"]
        warmup = train_config.get("warmup_steps", train_config.get("warmup", 0)) or 0
    else:
        steps_per_epoch = max(
            1, train_config["train_size"] // train_config["batch_size"]
        )
        num_epochs = train_config["num_epochs"]
        total_steps = steps_per_epoch * num_epochs
        eval_every = steps_per_epoch  # evaluate at epoch boundaries
        warmup = (train_config.get("warmup", 0) or 0) * steps_per_epoch

    def lrs_for(step_lr: int) -> Dict[str, jax.Array]:
        lr_now, ssm_lr_now = schedule_for_step(
            step_lr, warmup, total_steps, cosine, plateau.lr, plateau.ssm_lr, lr_min
        )
        lrs = {}
        if "regular" in group_names:
            lrs["regular"] = lr_now
        if "ssm" in group_names:
            lrs["ssm"] = ssm_lr_now
        if "group" in group_names:
            lrs["group"] = train_config.get("group_lr", 1e-3)
        return lrs

    step = 0
    running_loss, running_count = 0.0, 0
    stop_training = False
    best_perf, best_loss, best_step = -np.inf, np.inf, 0
    test_perf, test_loss = 0.0, np.inf
    t_start, steps_timed = time.perf_counter(), 0

    # On-device scanned training: the whole split lives in HBM and each
    # eval period runs as ONE jitted lax.scan dispatch (see scan_loop.py).
    use_scan = train_config.get("scan_blocks", True) and hasattr(trainloader, "inputs")
    if use_scan:
        from .scan_loop import (
            DeviceData, batch_indices, eval_indices,
            make_eval_block, make_train_block, put_dataset,
        )

        bsz = train_config["batch_size"]
        # data parallelism: replicate the device-resident dataset and params
        # over a 1-D mesh and shard each gathered batch on the ``data`` axis;
        # XLA inserts the gradient all-reduce over ICI (SURVEY.md §2.4).
        # train.model_parallel > 1 adds a second ``model`` mesh axis that
        # splits the vocabulary (embedding + LM head) — see parallel/tp.py.
        mp = int(train_config.get("model_parallel", 1))
        if mp > 1:
            from ..parallel.tp import mesh_2d

            mesh = mesh_2d(mp)
            if bsz % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch {bsz} not divisible by data axis {mesh.shape['data']}"
                )
        else:
            mesh = _data_mesh(bsz) if train_config.get("data_parallel", True) else None
        # sequence parallelism: split the TIME axis of the model's
        # recurrences (LRU/S5 scans, Mamba-1 selective scan) over a ``seq``
        # mesh — long-context capability the reference has no story for
        # (SURVEY.md §2.4).  Per-shard associative scans + one ICI
        # all-gather of state summaries (parallel/sp.py).  Mutually
        # exclusive with the data/model meshes (one mesh per program).
        sp_n = int(train_config.get("sequence_parallel", 1))
        sp_mesh = None
        if sp_n > 1:
            if mp > 1:
                raise ValueError(
                    "sequence_parallel and model_parallel are mutually exclusive"
                )
            if seq_len % sp_n != 0:
                raise ValueError(
                    f"seq_len {seq_len} not divisible by sequence_parallel {sp_n}"
                )
            from ..parallel.sp import seq_mesh

            sp_mesh = seq_mesh(sp_n)
            mesh = None
            print(f"[train] sequence parallelism: time axis over {sp_n} devices")
        repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(mesh, PartitionSpec())
            print(
                f"[train] mesh {dict(mesh.shape)}: batch sharded over 'data'"
                + (", vocab head over 'model'" if mp > 1 else "")
            )

        train_data = put_dataset(
            np.asarray(trainloader.inputs), np.asarray(trainloader.labels),
            np.asarray(trainloader.lengths) if (padded and trainloader.lengths is not None) else None,
            sharding=repl,
        )
        test_data = put_dataset(
            np.asarray(testloader.inputs), np.asarray(testloader.labels),
            np.asarray(testloader.lengths) if (padded and testloader.lengths is not None) else None,
            sharding=repl,
        )
        if repl is not None:
            if mp > 1:
                from ..parallel.tp import shard_vocab_parallel

                state = shard_vocab_parallel(state, mesh)
            else:
                state = jax.device_put(state, repl)
        # fused decoder+softmax-CE head (ops/fused_xent.py): exact same loss,
        # logits cube never materialised.  Opt-in: at bench shapes it measured
        # ~10% slower than XLA's bf16 materialised-logits path (fp32 in-kernel
        # matmuls); it wins when the logits cube doesn't fit HBM.
        # per-position decoder head? (the gate both head optimisations share)
        # transformer ignores pooling when classifier=False (per-position
        # decoder, ref models/transformer.py:149-161); mamba and the SSM
        # backbone pool before their decoder so only pooling="none" is
        # per-position
        per_pos = (
            lang_model
            and not model_config.get("classifier", False)
            and not model_config.get("dual", False)
            and (
                family == "transformer"
                or model_config.get("pooling") == "none"
            )
        )
        fused_head = bool(train_config.get("fused_xent", False))
        if mp > 1:
            # the fused Pallas head is a single-device kernel that reads the
            # decoder params directly; under vocab tensor parallelism the
            # sharded XLA logits path (with its GSPMD collectives) applies
            fused_head = False
        # under compute_dtype=bfloat16 the kernel's matmuls ride bf16
        # operands (f32 accumulate), matching the model's precision mode
        fused_head_dtype = (
            jnp.bfloat16
            if (fused_head and model_config.get("compute_dtype") == "bfloat16")
            else None
        )
        if fused_head:
            from ..ops.fused_xent import fused_xent_eligible

            m_rows = bsz * seq_len
            on_tpu = jax.default_backend() not in ("cpu", "gpu")
            fused_head = (
                per_pos
                and on_tpu
                and fused_xent_eligible(
                    m_rows, model_config["hidden_dim"], model_config["output_dim"]
                )
            )
        # sparse decoder head: when the task's (B, L) labels are mostly
        # ignore (-100) — MQAR supervises only its num_kv_pairs query
        # positions (ref dataloaders/mqar.py:83-135) — gather the ≤K valid
        # positions before the decoder matmul.  Identical loss and grads
        # (masked positions have exactly zero logit-gradient), but the vocab
        # path (decoder matmuls + logits HBM traffic + CE) shrinks by L/K:
        # 8× at the reference MQAR shapes.  K is the max valid count over
        # train ∪ test, so no valid position is ever dropped (shared gating
        # helper — see scan_loop.sparse_head_k_for).
        sparse_head_k = None
        if (
            train_config.get("sparse_head", True)
            and lang_model
            and not fused_head
            and mp == 1
        ):
            from .scan_loop import sparse_head_k_for

            sparse_head_k = sparse_head_k_for(
                model_config, trainloader.labels, testloader.labels
            )
        train_block = make_train_block(
            train_model, norm, tuple(sorted(group_names)),
            warmup, total_steps, cosine, lr_min,
            group_lr=train_config.get("group_lr", 1e-3),
            fused_head=fused_head,
            mesh=mesh,
            fused_head_dtype=fused_head_dtype,
            sparse_head_k=sparse_head_k,
            sp_mesh=sp_mesh,
        )
        if fused_head:
            print("[train] fused decoder+softmax-CE head enabled")
        if sparse_head_k is not None:
            print(f"[train] sparse decoder head: K={sparse_head_k} of L={seq_len}")
        eval_block = make_eval_block(
            eval_model, norm, metrics_fn, mesh=mesh, sparse_head_k=sparse_head_k,
            sp_mesh=sp_mesh,
        )
        eval_idx = eval_indices(len(testloader.inputs), bsz)
        nprng = np.random.default_rng(config.seed)

        # mid-training step-resume (an improvement over the reference, which
        # only saves at the end — SURVEY.md §5): snapshot every
        # ``checkpoint_every`` steps; ``resume: true`` (or --resume) picks the
        # run back up with the exact step counter, schedules, plateau state,
        # rng stream and host batch-index stream.
        ckpt_stem = config.checkpoint_name()
        checkpoint_every = train_config.get("checkpoint_every")
        resume_dir = (
            ckpt_stem + "-resume" if (ckpt_stem and checkpoint_every) else None
        )
        steps_since_snap = 0
        if resume_dir and train_config.get("resume") and os.path.isdir(resume_dir):
            meta_t = {
                "step": 0,
                "plateau": {"lr": 0.0, "ssm_lr": 0.0, "count": 0, "best": 0.0},
                "best": {"perf": 0.0, "loss": 0.0, "step": 0},
                "train_rng": train_rng,
            }
            restored = restore_resume(resume_dir, state, meta_t)
            state, meta = restored["model"], restored["meta"]
            step = int(meta["step"])
            p = meta["plateau"]
            plateau = PlateauState(
                float(p["lr"]), float(p["ssm_lr"]), int(p["count"]), float(p["best"])
            )
            best_perf = float(meta["best"]["perf"])
            best_loss = float(meta["best"]["loss"])
            best_step = int(meta["best"]["step"])
            train_rng = jnp.asarray(meta["train_rng"])
            # replay the deterministic host batch-index stream to the
            # restored step so the data order continues exactly
            s = 0
            while s < step:
                k = int(min(eval_every, total_steps - s))
                batch_indices(nprng, len(trainloader.inputs), bsz, k)
                s += k
            print(f"[train] resumed at step {step} from {resume_dir}")

        # One eval period = one host-side index draw (keeps the rng stream —
        # and therefore resume replay — independent of dispatch size), but
        # dispatched in sub-blocks of ≤ block_cap scanned steps: very long
        # single XLA executions (≳1e3 steps at LRA shapes) can exceed the
        # remote runtime's execution limits and crash the worker.
        block_cap = int(train_config.get("block_cap", 480))

        while step < total_steps and not stop_training:
            k = int(min(eval_every, total_steps - step))
            idx = batch_indices(nprng, len(trainloader.inputs), bsz, k)
            train_rng, block_rng = jax.random.split(train_rng)
            losses, done = [], 0
            while done < k:
                kk = min(block_cap, k - done)
                state, sub_loss = train_block(
                    state, block_rng, train_data, idx[done : done + kk],
                    step + done, plateau.lr, plateau.ssm_lr,
                )
                losses.append((float(sub_loss), kk))
                done += kk
            step += k
            loss_v, perf_v = eval_block(state, test_data, eval_idx)
            train_loss = sum(l * n for l, n in losses) / k
            test_loss, test_perf = float(loss_v), float(perf_v)
            elapsed = time.perf_counter() - t_start
            sps = (step - steps_timed) / max(elapsed, 1e-9)
            t_start, steps_timed = time.perf_counter(), step
            print(
                f"step {step}: train loss {train_loss:.4f} | test loss "
                f"{test_loss:.4f} | test perf {test_perf:.4f} | {sps:.1f} steps/s"
            )
            sys.stdout.flush()
            metrics = {"train loss": train_loss, "test loss": test_loss,
                       "test perf": test_perf, "steps_per_sec": sps,
                       "lr": plateau.lr, "ssm_lr": plateau.ssm_lr}
            if model_config.get("mixer") == "hybrid":
                # learned convex-combination weights (ref train.py:352-367)
                for i in range(model_config["num_layers"]):
                    alpha = state.params[f"layers_{i}"]["mixer"]["alpha"]
                    metrics[f"mixer_alpha_{i}"] = float(
                        jax.nn.sigmoid(jnp.asarray(alpha))[0]
                    )
            logger.log(metrics, step=step)
            if test_perf > best_perf:
                best_perf, best_loss, best_step = test_perf, test_loss, step
            if plateau_enabled:
                plateau = reduce_lr_on_plateau(
                    plateau, test_perf,
                    factor=train_config.get("reduce_factor", 0.2),
                    patience=train_config.get("lr_patience", 20),
                    lr_min=lr_min,
                )
            if stop_criterion is not None and test_perf > stop_criterion:
                print(
                    f"Stopping: test perf {test_perf:.4f} exceeded "
                    f"criterion {stop_criterion}"
                )
                stop_training = True
            steps_since_snap += k
            if resume_dir and steps_since_snap >= checkpoint_every and not stop_training and step < total_steps:
                save_resume(resume_dir, state, {
                    "step": step,
                    "plateau": {"lr": plateau.lr, "ssm_lr": plateau.ssm_lr,
                                "count": plateau.count, "best": plateau.best},
                    "best": {"perf": best_perf, "loss": best_loss,
                             "step": best_step},
                    "train_rng": train_rng,
                })
                steps_since_snap = 0
                print(f"[train] resume snapshot at step {step}")

        if resume_dir and os.path.isdir(resume_dir):
            shutil.rmtree(resume_dir)  # run completed; snapshot obsolete

    while not use_scan and step < total_steps and not stop_training:
        for batch in trainloader:
            if step >= total_steps:
                break
            inputs, labels = prep_batch(batch, seq_len, in_dim, lang_model)
            train_rng, drop_rng = jax.random.split(train_rng)
            state, loss = train_step(
                state, drop_rng, inputs, labels, lrs_for(step), train_model, norm
            )
            running_loss += float(loss)
            running_count += 1

            if step % eval_every == 0 and step > 0:
                train_loss = running_loss / max(running_count, 1)
                running_loss, running_count = 0.0, 0
                test_loss, test_perf = _evaluate(
                    state, eval_model, testloader, seq_len, in_dim,
                    lang_model, norm, metrics_fn,
                )
                elapsed = time.perf_counter() - t_start
                sps = (step - steps_timed) / max(elapsed, 1e-9)
                t_start, steps_timed = time.perf_counter(), step
                print(
                    f"step {step}: train loss {train_loss:.4f} | test loss "
                    f"{test_loss:.4f} | test perf {test_perf:.4f} | {sps:.1f} steps/s"
                )
                sys.stdout.flush()
                logger.log(
                    {
                        "train loss": train_loss,
                        "test loss": test_loss,
                        "test perf": test_perf,
                        "lr": lrs_for(step).get("regular", lr),
                        "ssm_lr": lrs_for(step).get("ssm", ssm_lr),
                        "steps_per_sec": sps,
                    },
                    step=step,
                )
                if test_perf > best_perf:
                    best_perf, best_loss, best_step = test_perf, test_loss, step
                if plateau_enabled:
                    plateau = reduce_lr_on_plateau(
                        plateau,
                        test_perf,
                        factor=train_config.get("reduce_factor", 0.2),
                        patience=train_config.get("lr_patience", 20),
                        lr_min=lr_min,
                    )
                if stop_criterion is not None and test_perf > stop_criterion:
                    print(
                        f"Stopping: test perf {test_perf:.4f} exceeded "
                        f"criterion {stop_criterion}"
                    )
                    stop_training = True
                    break
            step += 1

    # final evaluation if we never hit an eval boundary
    if np.isinf(test_loss):
        test_loss, test_perf = _evaluate(
            state, eval_model, testloader, seq_len, in_dim, lang_model, norm, metrics_fn
        )

    logger.summary("Best Val Loss", best_loss)
    logger.summary("Best Val Accuracy", best_perf)
    logger.summary("Best Step", best_step)

    path = None
    checkpoint = config.checkpoint_name()
    if checkpoint is not None:
        cfg_tree = {"model": dict(model_config), "train": dict(train_config),
                    "data": dict(data_config)}
        path = checkpoint + f"-perf{test_perf:0.3f}"
        save_checkpoint(path, state, cfg_tree)

    logger.finish()
    return TrainResult(path, test_perf, state)
