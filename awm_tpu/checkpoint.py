"""Checkpointing (orbax) + reference-.pth weight importer.

Reference behaviors reproduced (SURVEY.md section 5):
- best-model saves on val improvement (ref: py/main14.py:443-447)
- full resumable checkpoint {epoch, step, best_val, gen, det, opt, sched}
  written as latest every epoch and best on improvement, auto-resumed at
  startup (ref: py/main14d.py:540-623) — here one orbax tree carrying
  TrainState + metadata; the LR schedule is a pure function of step so no
  separate scheduler state is needed
- '_orig_mod.' torch.compile prefix stripping on load
  (ref: py/main14.py:593-598)

The importer maps the reference's torch state dicts (models/*.pth) onto this
build's flax parameter trees so quality parity is checked against the
shipped detector_best.pth (BASELINE.json bit-exactness requirement).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# orbax save/restore


def _ckpt(path: str):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer(), os.path.abspath(path)


ARCH_FILE = "awm_arch.json"


def write_arch(path: str, model_cfg, shaping_cfg=None) -> None:
    """Record the ModelConfig next to the orbax tree (inside the checkpoint
    directory) so inference can reconstruct the exact architecture variant
    without user flags.  A dilated-head checkpoint loaded into the default
    shared-head detector restores cleanly (subset tree) but decodes bits
    from channels that received zero gradient — self-description prevents
    that silent failure.

    When the training config's delta-shaping chain is enabled (main16,
    ref: py/main16.py:244-247 applies it in train/val/eval alike), it is
    recorded under a "shaping" key so inference sessions reproduce the
    shaped delta — in particular the hard limit_rms cap."""
    import dataclasses
    import json

    doc = dataclasses.asdict(model_cfg)
    if shaping_cfg is not None and getattr(shaping_cfg, "enabled", False):
        doc["shaping"] = dataclasses.asdict(shaping_cfg)
    with open(os.path.join(os.path.abspath(path), ARCH_FILE), "w") as f:
        json.dump(doc, f, indent=1)


def read_arch(path: str):
    """Return the recorded ModelConfig dict, or None for checkpoints written
    before architecture self-description (they are all default-arch)."""
    import json

    p = os.path.join(os.path.abspath(path), ARCH_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_checkpoint(path: str, state, *, epoch: int = 0,
                    best_val: float = float("inf"), model_cfg=None,
                    shaping_cfg=None) -> None:
    """Write {state, epoch, best_val} at path (overwrites).  model_cfg, if
    given, is recorded as an arch sidecar (write_arch) AFTER the orbax save
    — ckptr.save(force=True) clears the directory first."""
    import orbax.checkpoint as ocp

    ckptr, path = _ckpt(path)
    payload = {
        "state": state,
        "meta": {
            "epoch": np.asarray(epoch, np.int32),
            "best_val": np.asarray(best_val, np.float64),
        },
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if model_cfg is not None:
        write_arch(path, model_cfg, shaping_cfg)


def _host_template(tree):
    """jax.Array template leaves -> numpy so orbax restores to HOST memory.

    A checkpoint records the mesh/device layout it was SAVED with; restoring
    onto concrete jax arrays makes orbax reconstruct that layout, which fails
    on a different platform (a TPU-trained checkpoint opened with
    `--platform cpu` raised "sharding ... Got None").  Numpy leaves restore
    platform-independently; the first jitted call device_puts them."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


def restore_checkpoint(path: str, state_template) -> Tuple[Any, int, float]:
    """Restore (state, epoch, best_val); state_template supplies the tree
    structure/shapes (build it with train.init_state)."""
    ckptr, path = _ckpt(path)
    template = {
        "state": _host_template(state_template),
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "best_val": np.asarray(0.0, np.float64),
        },
    }
    restored = ckptr.restore(path, template)
    meta = restored["meta"]
    return restored["state"], int(meta["epoch"]), float(meta["best_val"])


def restore_params(path: str, state_template, allow_missing: bool = False) -> Tuple[Any, int, float]:
    """Restore only {params, batch_stats} from a checkpoint into
    state_template, ignoring opt_state/step on disk.

    Inference consumers (InferenceSession.from_state, tools/demo_eval.py)
    only read params+batch_stats, but a full restore_checkpoint requires the
    template's opt_state TREE to match the checkpoint's — which depends on
    which optax schedule the training preset used.  This restores the
    weights regardless of the optimizer the checkpoint was trained with.

    allow_missing=True additionally tolerates template leaves ABSENT from the
    checkpoint: those keep their freshly-initialized values.  This is the
    cross-architecture warm-start path (e.g. fine-tuning a
    message_encoding='bits' generator from a 'table' checkpoint: conv/LSTM/
    detector weights restore, the new bit_proj trains from init).
    """
    import orbax.checkpoint as ocp

    _, path = _ckpt(path)
    template = {
        "state": _host_template({
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
        }),
        "meta": {
            "epoch": np.asarray(0, np.int32),
            "best_val": np.asarray(0.0, np.float64),
        },
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        # intersect the template with the on-disk tree ourselves: orbax's
        # partial_restore SILENTLY keeps template values for leaves absent
        # from the checkpoint, which would let a wholly mismatched restore
        # "succeed" with freshly-initialized weights
        on_disk = ckptr.metadata(path).item_metadata
        if on_disk is None:
            # orbax returns a metadata object with item_metadata=None for a
            # path that exists but holds no checkpoint (and raises for a
            # missing path only deep inside restore) — fail fast either way
            raise FileNotFoundError(
                f"no orbax checkpoint at {path!r}"
                + ("" if os.path.isdir(path) else " (path does not exist)")
            )
        skipped = []

        def _prune(tpl, meta, prefix):
            if not isinstance(tpl, dict):
                return tpl
            out = {}
            for k, v in tpl.items():
                if k not in meta:
                    skipped.append("/".join(prefix + (k,)))
                elif isinstance(v, dict):
                    out[k] = _prune(v, meta[k], prefix + (k,))
                else:
                    # a same-named leaf with a DIFFERENT shape is a different
                    # parameter (e.g. base vs strided 'gen/embedding/table');
                    # restoring it would crash deep in orbax — treat as absent
                    want = tuple(getattr(v, "shape", ()) or ())
                    disk = tuple(getattr(meta[k], "shape", ()) or ())
                    if want and disk and want != disk:
                        skipped.append(
                            "/".join(prefix + (k,)) + f" (shape {want} != on-disk {disk})"
                        )
                    else:
                        out[k] = v
            return out

        template = _prune(template, on_disk, ())

        # even with allow_missing, a restore that matches ZERO parameter
        # leaves is a wrong-path / wrong-family mistake, not a warm-start:
        # letting it "succeed" would train entirely from fresh init while
        # claiming to fine-tune (the exact failure this function's strict
        # mode exists to prevent)
        def _n_leaves(t):
            return sum(_n_leaves(v) for v in t.values()) if isinstance(t, dict) else 1

        if _n_leaves(template.get("state", {}).get("params", {})) == 0:
            raise ValueError(
                f"checkpoint {path} shares no parameter leaves with the "
                f"template (wrong path, or a different model family?); "
                f"{len(skipped)} template leaves absent, e.g. "
                f"{', '.join(skipped[:5])}"
            )
        if skipped and not allow_missing:
            raise ValueError(
                f"{len(skipped)} template leaves absent from checkpoint {path}: "
                f"{', '.join(skipped[:8])}{'...' if len(skipped) > 8 else ''} "
                f"(pass allow_missing=True to warm-start them from init)"
            )
        # partial_restore: the on-disk tree has extra keys (state.opt_state,
        # state.step) that the params-only template deliberately omits.
        # restore_type=np.ndarray per leaf: without it orbax restores each
        # array onto the device layout recorded at SAVE time, which fails
        # cross-platform (see _host_template)
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template
        )
        restored = ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=template, restore_args=restore_args, partial_restore=True
            ),
        )
    if skipped:
        print(f"restore_params: kept init for {len(skipped)} leaves absent "
              f"from {path}: {', '.join(skipped[:8])}")

    def _merge(tpl, res):
        if not isinstance(tpl, dict):
            return res
        return {k: (_merge(v, res[k]) if k in res else v) for k, v in tpl.items()}

    # meta / batch_stats may be partially pruned under allow_missing
    # (e.g. a params-only export); degrade to defaults instead of KeyError
    meta = restored.get("meta", {})
    rstate = restored.get("state", {})
    state = state_template.replace(
        params=_merge(state_template.params, rstate.get("params", {})),
        batch_stats=_merge(state_template.batch_stats, rstate.get("batch_stats", {})),
    )
    return state, int(meta.get("epoch", 0)), float(meta.get("best_val", 0.0))


def latest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "ckpt_latest")


def best_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "ckpt_best")


def maybe_resume(ckpt_dir: str, state_template):
    """main14d startup semantics: resume from ckpt_latest if present
    (ref: py/main14d.py:563-572).  Returns (state, epoch, best_val, resumed)."""
    p = latest_path(ckpt_dir)
    if os.path.isdir(p):
        state, epoch, best_val = restore_checkpoint(p, state_template)
        return state, epoch, best_val, True
    return state_template, 0, float("inf"), False


# ---------------------------------------------------------------------------
# torch .pth import


def strip_prefix(state_dict: Dict[str, Any], prefix: str = "_orig_mod.") -> Dict[str, Any]:
    """Remove the torch.compile wrapper prefix (ref: py/main14.py:593-598)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v
        for k, v in state_dict.items()
    }


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = strip_prefix(sd)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def _conv(sd, key):
    """torch Conv1d (out, in, k) -> ours (k, in, out)."""
    return {
        "w": jnp.asarray(np.transpose(sd[f"{key}.weight"], (2, 1, 0))),
        "b": jnp.asarray(sd[f"{key}.bias"]),
    }


def _conv_t(sd, key):
    """torch ConvTranspose1d (in, out, k) -> ours (k, in, out)."""
    return {
        "w": jnp.asarray(np.transpose(sd[f"{key}.weight"], (2, 0, 1))),
        "b": jnp.asarray(sd[f"{key}.bias"]),
    }


def _bn(sd, key):
    params = {
        "scale": jnp.asarray(sd[f"{key}.weight"]),
        "bias": jnp.asarray(sd[f"{key}.bias"]),
    }
    stats = {
        "mean": jnp.asarray(sd[f"{key}.running_mean"]),
        "var": jnp.asarray(sd[f"{key}.running_var"]),
    }
    return params, stats


def _resblock(sd, key):
    """Reference ResBlock: block.0 conv, block.1 bn, block.3 conv, block.4 bn
    (ref: py/main14.py:74-87)."""
    bn1_p, bn1_s = _bn(sd, f"{key}.block.1")
    bn2_p, bn2_s = _bn(sd, f"{key}.block.4")
    params = {
        "conv1": _conv(sd, f"{key}.block.0"),
        "conv2": _conv(sd, f"{key}.block.3"),
        "bn1": bn1_p,
        "bn2": bn2_p,
    }
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    return params, stats


def import_torch_detector(path: str) -> Dict[str, Any]:
    """models/detector_best.pth -> {'params', 'batch_stats'} for
    awm_tpu.models.Detector (torch layout: model.0 conv-in, model.1/2
    ResBlocks, model.3 conv-out; ref: py/main14.py:132-148)."""
    sd = _load_torch_state_dict(path)
    r1p, r1s = _resblock(sd, "model.1")
    r2p, r2s = _resblock(sd, "model.2")
    return {
        "params": {
            "conv_in": _conv(sd, "model.0"),
            "res1": r1p,
            "res2": r2p,
            "conv_out": _conv(sd, "model.3"),
        },
        "batch_stats": {"res1": r1s, "res2": r2s},
    }


def _strided_resblock(sd, key):
    """main14b_2 ResidualBlock: conv1, conv2, optional skip_conv
    (ref: py/main14b_2.py:86-103)."""
    p = {"conv1": _conv(sd, f"{key}.conv1"), "conv2": _conv(sd, f"{key}.conv2")}
    if f"{key}.skip_conv.weight" in sd:
        p["skip"] = _conv(sd, f"{key}.skip_conv")
    return p


def _lstm_layers(sd, key):
    """torch nn.LSTM(num_layers=N) -> {lstm0..lstmN-1} param dicts, biases
    summed (they only ever appear added)."""
    out = {}
    layer = 0
    while f"{key}.weight_ih_l{layer}" in sd:
        out[f"lstm{layer}"] = {
            "w_ih": jnp.asarray(sd[f"{key}.weight_ih_l{layer}"]),
            "w_hh": jnp.asarray(sd[f"{key}.weight_hh_l{layer}"]),
            "b": jnp.asarray(
                sd[f"{key}.bias_ih_l{layer}"] + sd[f"{key}.bias_hh_l{layer}"]
            ),
        }
        layer += 1
    return out


def import_torch_strided_generator(path: str, n_strides: int = 4) -> Dict[str, Any]:
    """main14b_2 generator .pth -> variables for awm_tpu.models.StridedGenerator
    (torch layout: E embedding, init_conv, encoder_blocks.{i} ResidualBlocks,
    proj Linear, lstm (2-layer), final_conv_enc, decoder_blocks alternating
    ConvTranspose1d / ResidualBlock, final_conv_dec;
    ref: py/main14b_2.py:105-178)."""
    sd = _load_torch_state_dict(path)
    params: Dict[str, Any] = {
        "init_conv": _conv(sd, "init_conv"),
        # torch Linear weight (out, in) -> ours (in, out)
        "proj": {
            "w": jnp.asarray(sd["proj.weight"].T),
            "b": jnp.asarray(sd["proj.bias"]),
        },
        "embedding": {"table": jnp.asarray(sd["E.weight"])},
        "final_conv_enc": _conv(sd, "final_conv_enc"),
        "final_conv_dec": _conv(sd, "final_conv_dec"),
    }
    params.update(_lstm_layers(sd, "lstm"))
    for i in range(n_strides):
        params[f"enc{i}"] = _strided_resblock(sd, f"encoder_blocks.{i}")
        params[f"dec_up{i}"] = _conv_t(sd, f"decoder_blocks.{2 * i}")
        params[f"dec_res{i}"] = _strided_resblock(sd, f"decoder_blocks.{2 * i + 1}")
    return {"params": params, "batch_stats": {}}


def import_torch_strided_detector(path: str, n_strides: int = 4) -> Dict[str, Any]:
    """main14b_2 detector .pth -> variables for awm_tpu.models.StridedDetector
    (torch layout: init_conv, encoder_blocks.{i}, upsample_blocks alternating
    ConvTranspose1d / ResidualBlock, final_conv;
    ref: py/main14b_2.py:180-224)."""
    sd = _load_torch_state_dict(path)
    params: Dict[str, Any] = {
        "init_conv": _conv(sd, "init_conv"),
        "final_conv": _conv(sd, "final_conv"),
    }
    for i in range(n_strides):
        params[f"enc{i}"] = _strided_resblock(sd, f"encoder_blocks.{i}")
        params[f"up{i}"] = _conv_t(sd, f"upsample_blocks.{2 * i}")
        params[f"up_res{i}"] = _strided_resblock(sd, f"upsample_blocks.{2 * i + 1}")
    return {"params": params, "batch_stats": {}}


def import_torch_generator(path: str) -> Dict[str, Any]:
    """generator_best.pth -> variables for awm_tpu.models.Generator
    (torch layout: encoder.0 conv, encoder.1/2 ResBlocks, lstm, embedding,
    decoder.0 ConvTranspose, decoder.1 ResBlock, decoder.2 conv;
    ref: py/main14.py:90-124).  The snapshot ships no generator_best.pth
    (SURVEY.md 2.4) but checkpoints from any reference run import here."""
    sd = _load_torch_state_dict(path)
    e1p, e1s = _resblock(sd, "encoder.1")
    e2p, e2s = _resblock(sd, "encoder.2")
    d1p, d1s = _resblock(sd, "decoder.1")
    params = {
        "enc_conv": _conv(sd, "encoder.0"),
        "enc_res1": e1p,
        "enc_res2": e2p,
        "lstm": {
            "w_ih": jnp.asarray(sd["lstm.weight_ih_l0"]),
            "w_hh": jnp.asarray(sd["lstm.weight_hh_l0"]),
            "b": jnp.asarray(sd["lstm.bias_ih_l0"] + sd["lstm.bias_hh_l0"]),
        },
        "embedding": {"table": jnp.asarray(sd["embedding.weight"])},
        "dec_deconv": _conv_t(sd, "decoder.0"),
        "dec_res": d1p,
        "dec_out": _conv(sd, "decoder.2"),
    }
    return {
        "params": params,
        "batch_stats": {"enc_res1": e1s, "enc_res2": e2s, "dec_res": d1s},
    }
