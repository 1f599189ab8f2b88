"""Reproduce the DEMO.md quality tables from a trained checkpoint.

Drives the public eval surface end-to-end on the held-out test split of the
same synthetic corpus the training CLI built (identical 80/10/10 split
seed), mirroring the reference's post-training evaluation blocks
(ref: py/main14.py:1043-1093 and main14.ipynb cells 11/16/19):

  quality   detection probs, detect/FP rate, ROC AUC, bit accuracy, delta
            RMS, power ratio, file round-trip + STOI/NSIM
  robust    attack-matrix sweep (evaluate_robustness)
  cross     imported reference detector vs OUR watermarks (key specificity)

Usage:
  python tools/demo_eval.py --ckpt runs/r2_base/ckpt_best [--preset base]
      [--synthetic-n 24576] [--n-eval 1024] [--sections quality,robust,cross]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _test_clips(cfg, n_total: int, n_eval: int) -> np.ndarray:
    from awm_tpu.data import SyntheticClips, split_indices

    ds = SyntheticClips(n=n_total, audio_len=cfg.audio_len)
    _, _, te_idx = split_indices(len(ds), (0.8, 0.1, 0.1), seed=cfg.train.seed)
    te_idx = te_idx[:n_eval]
    return np.stack([ds[i] for i in te_idx])


def section_quality(sess, clips, cfg, batch: int):
    from awm_tpu.api import detect_watermark, generate_watermarked_audio
    from awm_tpu.dsp.quality import nsim_quality
    from awm_tpu.dsp.stoi import stoi
    from awm_tpu.eval import roc_auc
    from awm_tpu.utils.audio_io import save_wav

    rng = np.random.default_rng(0)
    p_wm, p_clean, bits, bits_ml, d_rms, s_rms = [], [], [], [], [], []
    for i in range(0, len(clips), batch):
        s = clips[i : i + batch]
        msgs = rng.integers(0, 2**sess.message_bits, size=len(s)).astype(np.int32)
        out = sess.embed_detect(s, msgs)
        p_wm.extend(out["wm_prob"])
        p_clean.extend(out["clean_prob"])
        votes = out["msg_vote_frac"] > 0.5
        target = (msgs[:, None] & (1 << np.arange(sess.message_bits))) > 0
        bits.extend((votes == target).mean(axis=1))
        # the detect_watermark decode rule (time-mean logit > 0,
        # ref: py/main14.py:925-929) — what dec_loss_mode='mean' trains
        bits_ml.extend(((out["msg_logit_mean"] > 0) == target).mean(axis=1))
        d_rms.extend(out["delta_rms"])
        s_rms.extend(np.sqrt((s**2).mean(axis=1)))
    p_wm, p_clean = np.asarray(p_wm), np.asarray(p_clean)
    d_rms, s_rms = np.asarray(d_rms), np.asarray(s_rms)
    labels = [1] * len(p_wm) + [0] * len(p_clean)
    _, _, _, auc = roc_auc(labels, np.concatenate([p_wm, p_clean]))

    # file round-trip on a multi-second concatenation of held-out clips
    long = np.concatenate(clips[: int(np.ceil(13.3))])[: int(13.3 * cfg.sample_rate)]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "long.wav")
        save_wav(path, long, cfg.sample_rate)
        emb = generate_watermarked_audio(path, sess, os.path.join(d, "wm.wav"), seed=0)
        det_wm = detect_watermark(os.path.join(d, "wm.wav"), sess)
        det_clean = detect_watermark(path, sess)
    wm_wave = emb["watermarked_waveform"]
    return {
        "watermarked_prob": float(p_wm.mean()),
        "clean_prob": float(p_clean.mean()),
        "detect_rate": float((p_wm > 0.5).mean()),
        "false_positive_rate": float((p_clean > 0.5).mean()),
        "roc_auc": float(auc),
        "bit_accuracy": float(np.mean(bits)),
        "bit_accuracy_mean_logit": float(np.mean(bits_ml)),
        "delta_rms": float(d_rms.mean()),
        "power_ratio_db": float((20 * np.log10(s_rms / np.maximum(d_rms, 1e-12))).mean()),
        "file_roundtrip": {
            "seconds": round(len(long) / cfg.sample_rate, 1),
            "clean_prob": det_clean["mean_probability"],
            "wm_prob": det_wm["mean_probability"],
            "si_snr_db": emb["metrics"]["si_snr_db"],
            "stoi": float(stoi(long, wm_wave, cfg.sample_rate)),
            "nsim": float(nsim_quality(long, wm_wave, cfg.sample_rate)),
        },
    }


def section_robust(sess, clips, n: int = 128):
    from awm_tpu.eval import evaluate_robustness

    table = evaluate_robustness(sess, clips[:n], seed=0)
    return {
        k: {m: round(float(v), 4) for m, v in row.items()} for k, row in table.items()
    }


def aggregate_tables(tables):
    """{attack: {metric: value}} tables -> {attack: {metric: {mean,std,min,max}}}."""
    out = {}
    for atk in tables[0]:
        out[atk] = {}
        for m in tables[0][atk]:
            vals = np.asarray([t[atk][m] for t in tables], dtype=np.float64)
            out[atk][m] = {
                "mean": round(float(vals.mean()), 4),
                "std": round(float(vals.std()), 4),
                "min": round(float(vals.min()), 4),
                "max": round(float(vals.max()), 4),
            }
    return out


def section_variance(sess, clips, seeds, n: int = 128):
    """Across-seed spread of the attack matrix (VERDICT round-2 item 4: the
    reference reports single-seed evals, py/main14.py:1043-1093 — quantify
    the margin instead).  Each seed redraws the clip subset, the embedded
    messages, AND the stochastic attack realizations (noise, volume)."""
    from awm_tpu.eval import evaluate_robustness

    tables = []
    for s in seeds:
        rng = np.random.default_rng(1000 + s)
        idx = rng.choice(len(clips), size=min(n, len(clips)), replace=False)
        tables.append(evaluate_robustness(sess, clips[idx], seed=s))
    agg = aggregate_tables(tables)
    return {"seeds": list(seeds), "n_per_seed": int(min(n, len(clips))), "attacks": agg}


def section_ecc(sess, clips, n: int = 128):
    """Message-EXACT decode rates per attack, raw 16-bit vs SECDED-coded
    11-bit payloads (awm_tpu.ecc): the framework's answer to 'can I trust
    the decoded message', which per-bit accuracy alone understates."""
    from awm_tpu.eval import evaluate_robustness

    table = evaluate_robustness(sess, clips[:n], seed=0, ecc=True)
    keep = ("exact_rate_raw", "exact_rate_ecc", "ecc_flagged_rate", "bit_accuracy")
    return {k: {m: round(float(row[m]), 4) for m in keep} for k, row in table.items()}


def section_music(sess, cfg, n: int, batch: int):
    """Out-of-domain music generalization: embed+detect AND decode on
    music-like clips with the speech-trained model (the reference's
    GTZAN/FMA/Songs sweeps, ref: py/main15.py:1907,2030; py/main14.py:1641 —
    accuracy 0.96 on music per main14.ipynb cell 24).  bit_accuracy here is
    the round-2 'measured limitation' metric: decode on strongly tonal
    content sat at chance before the --music-frac training mix."""
    from awm_tpu.data import SyntheticMusicClips
    from awm_tpu.eval import roc_auc

    ds = SyntheticMusicClips(n=n, audio_len=cfg.audio_len, seed=7)
    clips = np.stack([ds[i] for i in range(len(ds))])
    rng = np.random.default_rng(0)
    p_wm, p_clean, bits_ml, d_rms = [], [], [], []
    for i in range(0, len(clips), batch):
        s = clips[i : i + batch]
        msgs = rng.integers(0, 2**sess.message_bits, size=len(s)).astype(np.int32)
        out = sess.embed_detect(s, msgs)
        p_wm.extend(out["wm_prob"])
        p_clean.extend(out["clean_prob"])
        target = (msgs[:, None] & (1 << np.arange(sess.message_bits))) > 0
        bits_ml.extend(((out["msg_logit_mean"] > 0) == target).mean(axis=1))
        d_rms.extend(out["delta_rms"])
    p_wm, p_clean = np.asarray(p_wm), np.asarray(p_clean)
    labels = [1] * len(p_wm) + [0] * len(p_clean)
    _, _, _, auc = roc_auc(labels, np.concatenate([p_wm, p_clean]))
    return {
        "watermarked_prob": float(p_wm.mean()),
        "clean_prob": float(p_clean.mean()),
        "accuracy": float(
            ((p_wm > 0.5).sum() + (p_clean <= 0.5).sum()) / (2 * len(p_wm))
        ),
        "roc_auc": float(auc),
        "bit_accuracy": float(np.mean(bits_ml)),
        "delta_rms": float(np.mean(d_rms)),
    }


def section_cross(sess, clips, cfg, torch_detector: str, batch: int):
    """Reference's shipped detector vs OUR watermarks: near-chance AUC is
    the expected key-specificity property (DEMO.md round-2 section)."""
    from awm_tpu import checkpoint as ck
    from awm_tpu.api import InferenceSession
    from awm_tpu.eval import roc_auc
    import jax.numpy as jnp

    dvars = ck.import_torch_detector(torch_detector)
    # The shipped torch detector is always the base family (shared 1x1 head,
    # ref: py/main14.py:132-148) — build its module from that arch, NOT from
    # the evaluated checkpoint's (whose dilated head has extra param leaves).
    from awm_tpu.models.detector import Detector

    ref_det = Detector(
        message_bits=cfg.message_bits,
        channels=cfg.model.channels,
        dtype=None,
        decode_head="shared",
    )
    ref_sess = InferenceSession(
        sess.gen, ref_det, sess.gen_vars, dvars,
        message_bits=cfg.message_bits, sample_rate=cfg.sample_rate,
        chunk_len=cfg.audio_len, compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    p_wm, p_clean = [], []
    for i in range(0, len(clips), batch):
        s = clips[i : i + batch]
        msgs = rng.integers(0, 2**sess.message_bits, size=len(s)).astype(np.int32)
        wm = s + sess.embed_chunks(s, msgs)  # OUR generator's watermark
        p_wm.extend(ref_sess.detect_summary(wm)[3])  # mean_prob
        p_clean.extend(ref_sess.detect_summary(s)[3])
    labels = [1] * len(p_wm) + [0] * len(p_clean)
    _, _, _, auc = roc_auc(labels, np.concatenate([p_wm, p_clean]))
    return {
        "ref_detector_prob_clean": float(np.mean(p_clean)),
        "ref_detector_prob_our_wm": float(np.mean(p_wm)),
        "ref_detector_auc_vs_our_wm": float(auc),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--preset", default="base")
    ap.add_argument("--synthetic-n", type=int, default=24576)
    ap.add_argument("--n-eval", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--sections", default="quality,robust,ecc,music,cross")
    ap.add_argument("--robust-seeds", default="0,1,2",
                    help="eval seeds for the opt-in 'variance' section "
                         "(clip draw + messages + attack realizations vary "
                         "per seed)")
    ap.add_argument("--message-encoding", choices=("table", "bits"), default=None,
                    help="override the preset's generator message pathway "
                         "(needed to evaluate --message-encoding bits ckpts)")
    ap.add_argument("--decode-head", choices=("shared", "dilated"), default=None)
    ap.add_argument("--dec-loss", choices=("per_sample", "mean"), default=None,
                    help="accepted for symmetry with `train` invocations; "
                         "IGNORED — eval computes no losses and always reports "
                         "bit accuracy under BOTH decode rules")
    ap.add_argument("--torch-detector", default="/root/reference/models/detector_best.pth")
    ap.add_argument("--platform", default=None, help="force a jax platform (cpu/tpu/axon)")
    args = ap.parse_args()

    known_sections = {"quality", "robust", "ecc", "music", "cross", "variance"}
    wanted = {s.strip() for s in args.sections.split(",") if s.strip()}
    unknown = wanted - known_sections
    if unknown:
        # fail loudly BEFORE any model/backend work: a typo'd section name
        # must not silently produce a partial evaluation (ADVICE.md round-2)
        raise SystemExit(
            f"unknown --sections {sorted(unknown)}; valid names: {sorted(known_sections)}"
        )

    import jax

    if args.platform:
        # sitecustomize imports jax at interpreter start and pins the axon
        # platform; in-process config update is the working override
        jax.config.update("jax_platforms", args.platform)

    from awm_tpu import checkpoint as ck
    from awm_tpu import train as tr
    from awm_tpu.api import InferenceSession
    from awm_tpu.config import get_config

    cfg = get_config(args.preset)
    arch = ck.read_arch(args.ckpt)
    if arch is not None:
        # self-describing checkpoint: adopt the recorded architecture (flags
        # only validate against it — see awm_tpu.checkpoint.write_arch)
        import dataclasses

        from awm_tpu.config import ModelConfig, ShapingConfig

        if "shaping" in arch:
            cfg = dataclasses.replace(cfg, shaping=ShapingConfig(**arch.pop("shaping")))
        known = {f.name for f in dataclasses.fields(ModelConfig)}
        arch = {k: v for k, v in arch.items() if k in known}
        if "strides" in arch:
            arch["strides"] = tuple(arch["strides"])
        recorded = ModelConfig(**arch)
        for flag in ("message_encoding", "decode_head"):
            given = getattr(args, flag)
            if given and given != getattr(recorded, flag):
                raise SystemExit(
                    f"--{flag} {given} conflicts with the checkpoint's recorded "
                    f"architecture ({flag}={getattr(recorded, flag)!r})"
                )
        cfg = dataclasses.replace(cfg, model=recorded)
    elif args.message_encoding or args.decode_head:
        import dataclasses

        if args.message_encoding:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, message_encoding=args.message_encoding)
            )
        if args.decode_head:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, decode_head=args.decode_head)
            )
    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    # params-only restore: works for checkpoints from ANY preset's optimizer
    state, _, best_val = ck.restore_params(args.ckpt, state)
    sess = InferenceSession.from_state(cfg, gen, det, state)
    clips = _test_clips(cfg, args.synthetic_n, args.n_eval)

    report = {"ckpt": args.ckpt, "best_val": best_val, "n_eval": len(clips)}
    if "quality" in wanted:
        report["quality"] = section_quality(sess, clips, cfg, args.batch_size)
    if "robust" in wanted:
        report["robust"] = section_robust(sess, clips)
    if "variance" in wanted:
        seeds = [int(s) for s in args.robust_seeds.split(",") if s.strip()]
        report["variance"] = section_variance(sess, clips, seeds)
    if "ecc" in wanted:
        report["ecc"] = section_ecc(sess, clips)
    if "music" in wanted:
        report["music"] = section_music(sess, cfg, min(args.n_eval, 512), args.batch_size)
    if "cross" in wanted and os.path.exists(args.torch_detector):
        report["cross"] = section_cross(
            sess, clips[:256], cfg, args.torch_detector, args.batch_size
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
