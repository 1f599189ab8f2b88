"""Command-line interface: python -m awm_tpu <command>.

The reference is a notebook collection with hand-edited constants
(SURVEY.md section 5 "Config / flag system"); this CLI exposes every
workflow — train, fine-tune, embed, detect, evaluate, benchmark, and the
dataset-prep tools — over the named presets.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _apply_platform(args):
    """--platform cpu/axon/tpu: must run before any backend use.  The image's
    sitecustomize can force a TPU plugin regardless of JAX_PLATFORMS, so the
    CLI applies the override through jax.config."""
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def _cfg_for(args):
    from awm_tpu.config import get_config

    cfg = get_config(args.preset)
    if getattr(args, "audio_len", None):
        cfg = dataclasses.replace(cfg, audio_len=args.audio_len)
    # architecture variants must match the checkpoint being loaded — a
    # mismatched decode_head would silently decode from untrained channels
    # (restore_params only catches the bits-encoder mismatch loudly)
    if getattr(args, "message_encoding", None):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, message_encoding=args.message_encoding)
        )
    if getattr(args, "decode_head", None):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, decode_head=args.decode_head)
        )
    if getattr(args, "delta_band_hz", None) is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, delta_band_hz=args.delta_band_hz)
        )
    return cfg


def _load_session(args):
    """Build an InferenceSession from --ckpt (orbax) or --torch-ckpt (.pth)."""
    import jax

    from awm_tpu import checkpoint as ck
    from awm_tpu import train as tr
    from awm_tpu.api import InferenceSession

    import jax.numpy as jnp

    cfg = _cfg_for(args)
    if getattr(args, "ckpt", None):
        # self-describing checkpoints: adopt the recorded architecture so a
        # variant checkpoint (e.g. --decode-head dilated) can never be loaded
        # into the wrong detector silently; explicit flags only validate
        arch = ck.read_arch(args.ckpt)
        if arch is not None:
            from awm_tpu.config import ModelConfig, ShapingConfig

            if "shaping" in arch:
                # shaping-trained checkpoint (main16 family): reproduce the
                # delta-shaping chain at embed time (hard limit_rms cap)
                cfg = dataclasses.replace(
                    cfg, shaping=ShapingConfig(**arch.pop("shaping"))
                )
            known = {f.name for f in dataclasses.fields(ModelConfig)}
            arch = {k: v for k, v in arch.items() if k in known}
            if "strides" in arch:
                arch["strides"] = tuple(arch["strides"])
            recorded = ModelConfig(**arch)
            for flag in ("message_encoding", "decode_head", "delta_band_hz"):
                given = getattr(args, flag, None)
                if given is not None and given != getattr(recorded, flag):
                    sys.exit(
                        f"--{flag.replace('_', '-')}={given} conflicts with the "
                        f"checkpoint's recorded architecture "
                        f"({flag}={getattr(recorded, flag)!r} in "
                        f"{args.ckpt}/{ck.ARCH_FILE})"
                    )
            cfg = dataclasses.replace(cfg, model=recorded)
    from_torch = getattr(args, "torch_generator", None) or getattr(
        args, "torch_detector", None
    )
    # strict checkpoint parity for imported reference weights: default to
    # fp32 compute unless the user explicitly opts into bf16
    explicit = getattr(args, "compute_dtype", None)
    if explicit:
        dtype = jnp.float32 if explicit == "float32" else jnp.bfloat16
    else:
        dtype = jnp.float32 if from_torch else jnp.bfloat16

    state, gen, det = tr.init_state(cfg, jax.random.key(0))
    if getattr(args, "ckpt", None):
        # params-only restore: independent of which preset's optimizer
        # produced the checkpoint
        state, _, _ = ck.restore_params(args.ckpt, state)
        return InferenceSession.from_state(cfg, gen, det, state, compute_dtype=dtype)
    gvars = {"params": state.params["gen"], "batch_stats": state.batch_stats["gen"]}
    dvars = {"params": state.params["det"], "batch_stats": state.batch_stats["det"]}
    strided = cfg.model.family == "strided"
    n_strides = len(cfg.model.strides)
    if getattr(args, "torch_generator", None):
        gvars = (
            ck.import_torch_strided_generator(args.torch_generator, n_strides)
            if strided else ck.import_torch_generator(args.torch_generator)
        )
    if getattr(args, "torch_detector", None):
        dvars = (
            ck.import_torch_strided_detector(args.torch_detector, n_strides)
            if strided else ck.import_torch_detector(args.torch_detector)
        )
    return InferenceSession(gen, det, gvars, dvars,
                            message_bits=cfg.message_bits,
                            sample_rate=cfg.sample_rate,
                            chunk_len=cfg.audio_len,
                            compute_dtype=dtype)


def cmd_embed(args):
    from awm_tpu.api import generate_watermarked_audio

    sess = _load_session(args)
    res = generate_watermarked_audio(
        args.input, sess, args.output, message=args.message, seed=args.seed,
        ecc=args.ecc,
    )
    out = {"output": args.output, **res["metrics"]}
    if "payloads" in res:
        out["payloads"] = [int(p) for p in res["payloads"]]
    print(json.dumps(out, indent=2))


def cmd_detect(args):
    from awm_tpu.api import detect_watermark

    sess = _load_session(args)
    r = detect_watermark(args.input, sess, args.threshold,
                         visualize=args.visualize, ecc=args.ecc)
    out = {k: r[k] for k in ("mean_probability", "is_watermarked", "decision")}
    out["predicted_message"] = r.get("predicted_message")
    if "ecc" in r:
        out["ecc"] = r["ecc"]
    print(json.dumps(out, indent=2))


def cmd_verify(args):
    from awm_tpu.api import verify_watermark

    sess = _load_session(args)
    r = verify_watermark(
        args.input, sess, args.message, args.threshold, alpha=args.alpha,
        ecc=args.ecc,
    )
    print(json.dumps(r, indent=2))


def cmd_train(args):
    from awm_tpu.data import (
        BatchLoader,
        ConcatClips,
        OneSecClips,
        SyntheticClips,
        SyntheticMusicClips,
        split_indices,
    )
    from awm_tpu.trainer import fit

    cfg = _cfg_for(args)
    if args.epochs:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, epochs=args.epochs))
    if args.batch_size:
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size))
    if args.lr:
        # set the field the active schedule actually reads: constant -> lr,
        # onecycle -> max_lr (peak)
        if cfg.train.schedule.kind == "onecycle":
            sch = dataclasses.replace(cfg.train.schedule, max_lr=args.lr)
        else:
            sch = dataclasses.replace(cfg.train.schedule, lr=args.lr)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, schedule=sch))
    if args.patience:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, early_stop_patience=args.patience)
        )
    if args.seed is not None:
        # one seed drives init, the split, and loader shuffling — two runs
        # differing only in --seed measure training-seed variance
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, seed=args.seed)
        )
    if args.freeze:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, freeze=args.freeze)
        )
    if args.message_encoding:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, message_encoding=args.message_encoding)
        )
    if args.decode_head:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, decode_head=args.decode_head)
        )
    if args.dec_loss:
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, dec_loss_mode=args.dec_loss)
        )
    if args.dec_bit_balance is not None:
        if (args.dec_loss or cfg.loss.dec_loss_mode) != "mean":
            sys.exit("--dec-bit-balance requires --dec-loss mean "
                     "(per-bit weights are defined on the time-mean statistic)")
        cfg = dataclasses.replace(
            cfg, loss=dataclasses.replace(cfg.loss, dec_bit_balance=args.dec_bit_balance)
        )
    if args.shape_max_rms is not None:
        # hard RMS cap by construction (main16 limit_rms, ref: py/main16.py:69-72):
        # enables the full shaping chain with the given cap; recorded in the
        # checkpoint's arch sidecar so inference reproduces it
        cfg = dataclasses.replace(
            cfg, shaping=dataclasses.replace(
                cfg.shaping, enabled=True, max_rms=args.shape_max_rms
            )
        )
    if args.loss_weights:
        # term names match --select-metric / the val CSV columns
        field_of = {"l1": "lambda_l1", "mel": "lambda_msspec", "loud": "lambda_loud",
                    "loc": "lambda_loc", "dec": "lambda_dec", "hf": "hf_penalty_w"}
        over = {}
        for kv in args.loss_weights.split(","):
            k, _, v = kv.partition("=")
            try:
                over[field_of[k.strip()]] = float(v)
            except (KeyError, ValueError):
                sys.exit(f"--loss-weights: expected term=value with term in "
                         f"{sorted(field_of)} and a numeric value, got {kv!r}")
        cfg = dataclasses.replace(cfg, loss=dataclasses.replace(cfg.loss, **over))
    if args.augment:
        # the measured-good robustness curriculum (DEMO.md study): every
        # channel attack applied independently per example with p<1, on BOTH
        # detector halves (train._forward) — always-on or s_w-only attack
        # curricula collapse the detector
        from awm_tpu.augment import AugmentConfig

        # noise floor 15 dB: evaluating AT the curriculum's minimum SNR
        # (20 dB) failed when trained with min=20 — train past the eval edge
        lo, hi = (float(x) for x in args.noise_snr.split(","))
        cuts = tuple(float(x) for x in args.lowpass_hz.split(","))
        rates = tuple(int(x) for x in args.resample_hz.split(","))
        cfg = dataclasses.replace(cfg, augment=AugmentConfig(
            noise_snr_db=(lo, hi), volume_range=(0.3, 1.2),
            lowpass_hz=cuts if len(cuts) > 1 else cuts[0],
            lowpass_filter="fir" if args.lowpass_fir else "biquad",
            quantize=True,
            resample_hz=rates if len(rates) > 1 else rates[0],
            attack_prob=args.attack_prob,
            mulaw=args.mulaw,
            val_attacks=not args.clean_val,
        ))
    if args.data:
        ds = OneSecClips(args.data, cfg.sample_rate, cfg.audio_len)
        if not len(ds):
            sys.exit(f"no .wav files under {args.data}")
        n_total = len(ds)
    else:
        print("no --data given; training on synthetic clips (smoke mode)")
        n_total = args.synthetic_n
        n_music = int(round(args.music_frac * n_total))
        ds = SyntheticClips(n=n_total - n_music, audio_len=cfg.audio_len)
    if args.music_frac > 0.0:
        # tonal-content curriculum axis (VERDICT round-2 item 3): mix
        # synthetic music clips into the corpus so decode doesn't collapse
        # on tonal OOD content.  music_frac is the music fraction of the
        # final corpus (synthetic keeps the total at --synthetic-n; --data
        # adds music on top of the disk clips).  Music uses seed=1; the
        # demo_eval music section evaluates seed=7 draws, so eval clips
        # stay unseen.
        n_music = int(round(args.music_frac * n_total))
        ds = ConcatClips(
            ds, SyntheticMusicClips(n=n_music, audio_len=cfg.audio_len, seed=1)
        )
    tr_idx, va_idx, _ = split_indices(len(ds), (0.8, 0.1, 0.1), seed=cfg.train.seed)
    # val keeps partial batches (drop_last=False): small validation splits
    # would otherwise yield zero batches and silently skip validation
    mk = lambda idx, sh: BatchLoader(
        ds, cfg.train.batch_size, indices=idx, shuffle=sh, drop_last=sh,
        seed=cfg.train.seed, num_workers=args.workers,
    )
    mesh = None
    if args.data_parallel:
        from awm_tpu.parallel import make_mesh

        mesh = make_mesh(model_parallel=args.model_parallel)
    out = fit(
        cfg, mk(tr_idx, True), mk(va_idx, False),
        ckpt_dir=args.ckpt_dir, init_from=args.init_from, mesh=mesh,
        log_path=args.log_csv, plot_path=args.loss_plot, seed=cfg.train.seed,
        select_metric=args.select_metric,
    )
    print(json.dumps({"best_val": out["best_val"], "epochs": len(out["history"]),
                      "stopped_early": out["stopped_early"]}, indent=2))


# Staged training recipes as data: leg name -> (extra train argv, robust?,
# env-override argv appended LAST so it wins argparse's last-occurrence rule).
# The reference trains in one stage (ref: py/main14.py:432-452) but its
# message decode lands at chance (bit acc 0.5009, main14.ipynb cell 11,
# BASELINE.md); the measured fix is a staged-head curriculum (DEMO.md
# "Message decode" / "Band-limited carrier").  The 2-leg simplification was
# probed and failed (evidence/blS2* — the co-trained-dilated-head ceiling),
# so the minimal recipe stays 4 legs; this command makes it ONE command.
# The measured round-5 environment override for balance/tighten legs (the
# blB/blF3 lineage environment; see the comment inside robust_decode).
_BL_ENV = ["--music-frac", "0.0", "--resample-hz", "8000"]

_CURRICULA = {
    # Placement of --dec-bit-balance is measured, not stylistic: balance
    # during the ROBUST leg collapses decode to ~0.54 (evidence/arc3C);
    # balance during tighten legs revives dead bit channels (blB/blF3).
    # SEQUENCING within the tighten stage is also measured: turning balance
    # on SIMULTANEOUSLY with the first post-robust budget step wedges decode
    # in winner-take-all collapse (arc3b leg D2 AND cur3 leg D_tighten both
    # landed ~0.64 with 4 live / 12 dead bit channels, evidence/cur3 +
    # tools/bit_diagnostic.py), where the split order — budget step WITHOUT
    # balance (blT: 0.66->0.76), then balance AT THE HELD budget (blB:
    # ->0.85 all 16 live) — succeeded.  Once one balance leg has flattened
    # the per-bit profile, budget and balance can co-move (blF3: loud 6->8
    # with balance held -> 0.93).  Hence D2_budget / E2_balance below.
    # ENVIRONMENT of the balance/tighten legs is measured too (round-5
    # probe matrix, evidence/r5/winner.json): with the 15% music mix and
    # the 3-rate resample attack active, balance CANNOT revive dead bit
    # channels — neither stronger balance (2.0 -> 0.674) nor relaxed-budget
    # placement (-> 0.665) helps, while the same wedged checkpoint returned
    # to the music-free single-rate-resample environment revives within 12
    # epochs (0.675 -> 0.747, dead-channel |logit| lifting 0.1-0.3 ->
    # 0.4-1.3).  The channel-sim diversity that detection training wants
    # starves weak bit carriers of gradient, so the E2+ legs override the
    # environment back to the bl configuration; C/D2 keep the full
    # environment (balance-free detection training was proven there:
    # 12/12 channels at 1.00/0.00, evidence/cur3/D_tighten).
    "robust_decode": {
        "common": ["--message-encoding", "bits", "--dec-loss", "mean",
                   "--delta-band-hz", "3000"],
        "robust": ["--augment", "--attack-prob", "0.45", "--noise-snr", "10,40",
                   "--lowpass-hz", "3500,5000,7000",
                   "--resample-hz", "8000,11025,22050"],
        "legs": [
            # clean scratch, SHARED decode head, relaxed perceptual budget
            ("A_shared", ["--epochs", "22", "--patience", "6",
                          "--loss-weights", "dec=10,loud=3,mel=1",
                          "--select-metric", "dec"], False, []),
            # dilated head added FRESH (restore_params keeps init for new leaves)
            ("B_dilated", ["--decode-head", "dilated", "--epochs", "18",
                           "--patience", "6",
                           "--loss-weights", "dec=10,loud=3,mel=1",
                           "--select-metric", "dec"], False, []),
            # channel-attack curriculum, budget HELD, NO balance (blR2 leg)
            ("C_robust", ["--decode-head", "dilated", "--epochs", "26",
                          "--patience", "99",
                          "--loss-weights", "dec=10,loud=3,mel=1",
                          "--select-metric", "loc,dec"], True, []),
            # first post-robust budget step, NO balance (blT replica: the
            # fused budget+balance leg wedged twice, see note above)
            ("D2_budget", ["--decode-head", "dilated", "--epochs", "28",
                           "--patience", "99",
                           "--loss-weights", "dec=10,loud=6,mel=1.5",
                           "--select-metric", "loc,dec"], True, []),
            # balance turned on AT THE HELD budget (blB replica: revives
            # all 16 bit channels, 0.76 -> 0.85)
            ("E2_balance", ["--decode-head", "dilated", "--epochs", "30",
                            "--patience", "99", "--dec-bit-balance", "1.0",
                            "--loss-weights", "dec=10,loud=6,mel=1.5",
                            "--select-metric", "loc,dec"], True, _BL_ENV),
            # gradual re-tighten with balance held (blF3: first improvement
            # at epoch 28/40 — patience is load-bearing; -> decode 0.93)
            ("F2_tighten", ["--decode-head", "dilated", "--epochs", "40",
                            "--patience", "99", "--dec-bit-balance", "1.0",
                            "--loss-weights", "dec=10,loud=8,mel=1.75",
                            "--select-metric", "loc,dec"], True, _BL_ENV),
            # imperceptibility push (VERDICT r3 item 2): blF3 was still
            # improving when stopped at loud=8; keep the proven gradual
            # schedule going.  H2 also nudges loc so the detection margin
            # tightens with the budget rather than after it.
            ("G2_tighten", ["--decode-head", "dilated", "--epochs", "30",
                            "--patience", "99", "--dec-bit-balance", "1.0",
                            "--loss-weights", "dec=10,loud=10,mel=2.0",
                            "--select-metric", "loc,dec"], True, _BL_ENV),
            ("H2_tighten", ["--decode-head", "dilated", "--epochs", "30",
                            "--patience", "99", "--dec-bit-balance", "1.0",
                            "--loss-weights", "dec=10,loud=13,mel=2.5,loc=14",
                            "--select-metric", "loc,dec"], True, _BL_ENV),
        ],
    },
}


def cmd_curriculum(args):
    """Run a staged multi-leg recipe; each leg fine-tunes the previous leg's
    best checkpoint.  Legs are resumable: a finished leg leaves a .done
    marker and is skipped on re-run."""
    import os

    rec = _CURRICULA[args.recipe]
    leg_names = [n for n, *_ in rec["legs"]]
    if args.stop_after and args.stop_after not in leg_names:
        raise SystemExit(
            f"--stop-after {args.stop_after!r} is not a leg of "
            f"{args.recipe!r}; legs: {', '.join(leg_names)}")
    shared = ["--batch-size", str(args.batch_size),
              "--music-frac", str(args.music_frac),
              "--workers", str(args.workers)]
    shared += ["--data", args.data] if args.data else \
              ["--synthetic-n", str(args.synthetic_n)]
    if args.seed is not None:
        shared += ["--seed", str(args.seed)]
    if args.audio_len:
        shared += ["--audio-len", str(args.audio_len)]

    prev = args.init_from
    legs_out = {}
    for name, leg, robust, env_override in rec["legs"]:
        d = os.path.join(args.out, name)
        marker = os.path.join(d, ".done")
        if os.path.isfile(marker):
            print(f"curriculum: leg {name} already done, skipping", flush=True)
            prev = os.path.join(d, "ckpt_best")
            legs_out[name] = prev
            if args.stop_after and name == args.stop_after:
                print(f"curriculum: stopping after leg {name} (--stop-after)",
                      flush=True)
                break
            continue
        leg = list(leg)
        if args.smoke:
            leg[leg.index("--epochs") + 1] = "1"
        elif args.epochs_scale != 1.0:
            k = leg.index("--epochs") + 1
            leg[k] = str(max(1, round(int(leg[k]) * args.epochs_scale)))
        argv = (["--platform", args.platform] if args.platform else [])
        argv += ["train"] + rec["common"] + shared + leg
        argv += rec["robust"] if robust else []
        argv += env_override  # last occurrence wins in argparse
        if prev:
            argv += ["--init-from", prev]
        argv += ["--ckpt-dir", d, "--log-csv", os.path.join(d, "metrics.csv")]
        print(f"== curriculum leg {name}: awm_tpu " + " ".join(argv), flush=True)
        main(argv)
        with open(marker, "w") as f:
            f.write("")
        prev = os.path.join(d, "ckpt_best")
        legs_out[name] = prev
        if args.stop_after and name == args.stop_after:
            print(f"curriculum: stopping after leg {name} (--stop-after)",
                  flush=True)
            break
    print(json.dumps({"recipe": args.recipe, "legs": legs_out,
                      "final_ckpt": prev}, indent=2))


def cmd_evaluate(args):
    from awm_tpu.eval import evaluate_corpus, interpret_results

    sess = _load_session(args)
    out = evaluate_corpus(args.data, sess, max_files=args.max_files)
    report = out.pop("report", "")
    print(json.dumps(out, indent=2))
    print(report)
    if "accuracy" in out:
        print(interpret_results(out["accuracy"]))


def cmd_embed_folder(args):
    from awm_tpu.eval import embed_watermark_folder

    sess = _load_session(args)
    print(json.dumps(embed_watermark_folder(args.input, args.output, sess), indent=2))


def cmd_detect_folder(args):
    from awm_tpu.eval import detect_watermark_folder

    sess = _load_session(args)
    out = detect_watermark_folder(args.input, sess, threshold=args.threshold)
    out.pop("per_file")
    print(json.dumps(out, indent=2))


def cmd_serve(args):
    from awm_tpu.serve import serve as _serve

    sess = _load_session(args)
    _serve(sess, host=args.host, port=args.port,
           max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)


def cmd_bench(args):
    import bench

    bench.main()


def cmd_prep(args):
    from awm_tpu.data import prep

    if args.prep_cmd == "metadata":
        n = prep.build_metadata(args.dir, args.output)
        print(f"wrote {n} rows to {args.output}")
    elif args.prep_cmd == "select":
        n, total = prep.select_audios(
            args.metadata, args.output, hours=args.hours, seconds=args.seconds, seed=args.seed
        )
        print(f"selected {n} files / {total/3600:.2f} h -> {args.output}")
    elif args.prep_cmd == "segment":
        files = [p for p, _ in prep.read_metadata(args.metadata)] if args.metadata else None
        if files is None:
            import glob as g, os as o

            files = sorted(g.glob(o.path.join(args.dir, "**", "*.wav"), recursive=True))
        n = prep.segment_to_clips(
            files, args.output, seg_seconds=args.seconds or 1.0,
            per_file_subdirs=args.subdirs, workers=args.workers,
        )
        print(f"wrote {n} clips to {args.output}")
    elif args.prep_cmd == "classify":
        if args.sample:
            print(json.dumps(prep.sample_feature_stats(
                args.dir, args.sample, full=args.full
            ), indent=2))
            return
        print(json.dumps(prep.classify_folder(
            args.dir, args.output, workers=args.workers, max_files=args.max_files,
            full=args.full,
        ), indent=2))
    elif args.prep_cmd == "speech-only":
        n = prep.copy_speech_only(args.list, args.output)
        print(f"copied {n} speech files to {args.output}")
    elif args.prep_cmd == "silent":
        for p in prep.find_silent(args.dir, args.threshold):
            print(p)
    elif args.prep_cmd == "compare":
        print(json.dumps(prep.compare_metadata(args.a, args.b), indent=2))


def _add_session_args(p):
    p.add_argument("--preset", default="base", help="config preset (base/light/onecycle20/quality/ft_robust/strided)")
    p.add_argument("--audio-len", type=int, help="override chunk length in samples (default 16000)")
    p.add_argument("--ckpt", help="orbax checkpoint path (ckpt_best/ckpt_latest dir)")
    p.add_argument("--torch-generator", help="reference generator_best.pth to import")
    p.add_argument("--torch-detector", help="reference detector_best.pth to import")
    p.add_argument(
        "--compute-dtype", choices=["bfloat16", "float32"],
        help="inference compute dtype (default: bfloat16, or float32 when "
        "importing --torch-* weights for strict checkpoint parity)",
    )
    # architecture variants: MUST match how the checkpoint was trained.  A
    # dilated-head checkpoint loaded into the default shared-head detector
    # restores cleanly (the shared template is a subset) but decodes bits
    # from conv_out channels that received zero gradient during training.
    p.add_argument("--message-encoding", choices=("table", "bits"),
                   help="generator message pathway the checkpoint was trained "
                        "with (train --message-encoding)")
    p.add_argument("--decode-head", choices=("shared", "dilated"),
                   help="detector bit head the checkpoint was trained with "
                        "(train --decode-head)")
    p.add_argument("--delta-band-hz", type=float,
                   help="carrier band-limit the checkpoint was trained with "
                        "(train --delta-band-hz)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="awm_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("embed", help="watermark an audio file")
    _add_session_args(p)
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--message", type=int, help="fixed 16-bit message (default: random per chunk)")
    p.add_argument("--seed", type=int)
    p.add_argument("--ecc", action="store_true",
                   help="treat --message as an 11-bit payload and embed its "
                        "SECDED codeword (awm_tpu.ecc): blind decode then "
                        "survives any single flipped bit per chunk")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("detect", help="detect a watermark in an audio file")
    _add_session_args(p)
    p.add_argument("input")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--visualize", action="store_true", help="save temporal-probability plot")
    p.add_argument("--ecc", action="store_true",
                   help="decode the 16 bits as a SECDED codeword: corrects "
                        "one flipped bit, flags uncorrectable double errors")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser(
        "verify",
        help="authenticate a file against an expected message "
             "(detection + exact binomial test on the decoded bits)",
    )
    _add_session_args(p)
    p.add_argument("input")
    p.add_argument("--message", type=int, required=True,
                   help="the 16-bit message the file is expected to carry "
                        "(embed --message N)")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--alpha", type=float, default=0.01,
                   help="significance level for the bit-agreement test "
                        "(AUTHENTIC needs detection AND p_value <= alpha)")
    p.add_argument("--ecc", action="store_true",
                   help="--message is an 11-bit payload; verify against its "
                        "SECDED codeword (embed --ecc)")
    p.set_defaults(fn=cmd_verify)

    p = sub.add_parser("train", help="train generator+detector")
    p.add_argument("--preset", default="base")
    p.add_argument("--audio-len", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--data", help="directory of 1-s wav clips")
    p.add_argument("--synthetic-n", type=int, default=256)
    p.add_argument("--music-frac", type=float, default=0.0,
                   help="fraction of the training corpus drawn from synthetic "
                        "music clips (tonal-content curriculum; fixes decode "
                        "collapse on tonal OOD content)")
    p.add_argument("--epochs", type=int)
    p.add_argument("--ckpt-dir", default="checkpoints")
    p.add_argument("--init-from", help="checkpoint to fine-tune from (main15c flow)")
    p.add_argument("--lr", type=float, help="override the schedule's (peak) learning rate")
    p.add_argument("--patience", type=int, help="early-stopping patience override")
    p.add_argument("--freeze", choices=("gen", "det"),
                   help="freeze one network (params + BN stats); e.g. "
                        "--freeze gen trains only the detector, so embedded "
                        "watermarks stay bit-identical (decode-head fine-tunes). "
                        "Use with --init-from, not with an unfrozen run's "
                        "--ckpt-dir resume (opt_state tree differs)")
    p.add_argument("--select-metric",
                   help="comma-separated val loss terms (e.g. loc,dec) whose sum "
                        "drives best-checkpoint selection + early stopping; "
                        "default: weighted total.  Use loc,dec for robustness "
                        "fine-tunes (attack curricula trade quality terms for "
                        "detection, so total val bottoms out at epoch 0)")
    p.add_argument("--augment", action="store_true",
                   help="on-device channel-attack curriculum (noise/volume/"
                   "lowpass/quantize/resample, per-example probability)")
    p.add_argument("--attack-prob", type=float, default=0.35,
                   help="per-example per-attack application probability")
    p.add_argument("--noise-snr", default="15,40",
                   help="noise-attack SNR range 'min,max' dB for --augment "
                        "(train past the eval edge: a curriculum whose MINIMUM "
                        "equals the eval SNR leaves that SNR undetected)")
    p.add_argument("--lowpass-fir", action="store_true",
                   help="use the steep 101-tap FIR for the --augment lowpass "
                        "attack instead of the biquad (the biquad's soft "
                        "rolloff leaks out-of-band carrier energy; the FIR "
                        "forces the watermark fully below the cutoff, which "
                        "resample-channel survival requires)")
    p.add_argument("--lowpass-hz", default="7000",
                   help="lowpass-attack cutoff(s) in Hz for --augment; a "
                        "comma list becomes a per-example curriculum (e.g. "
                        "'3500,5000,7000' keeps the watermark carrier below "
                        "the harshest cutoff so out-of-band lowpass attacks "
                        "cannot strip it)")
    p.add_argument("--resample-hz", default="8000",
                   help="resample-attack target rate(s) in Hz for --augment; "
                        "a comma list becomes a per-example curriculum.  Any "
                        "rational ratio works (polyphase, dsp.resample), e.g. "
                        "'8000,11025,22050'")
    p.add_argument("--mulaw", action="store_true",
                   help="add an 8-bit G.711 mu-law round trip to the "
                        "--augment attack chain (telephony codec, "
                        "dsp/codec.py — audioop-exact)")
    p.add_argument("--message-encoding", choices=("table", "bits"),
                   help="message pathway: 'table' = reference Embedding(2^16) "
                        "lookup; 'bits' = bit-compositional encoder (fixes "
                        "the reference's decode collapse, models/generator.py)")
    p.add_argument("--decode-head", choices=("shared", "dilated"),
                   help="detector bit-channel head: 'shared' = reference 1x1 "
                        "conv (15-sample RF); 'dilated' = dilated-conv stack "
                        "(~147 ms RF) for learnable message decode")
    p.add_argument("--delta-band-hz", type=float,
                   help="band-limit the watermark carrier by construction "
                        "(fixed zero-phase FIR as the generator's last op); "
                        "e.g. 3000 keeps the carrier inside the resample@8k "
                        "passband so the down-up trip cannot strip it")
    p.add_argument("--dec-loss", choices=("per_sample", "mean"),
                   help="decode objective: 'per_sample' = reference BCE over "
                        "every timestep; 'mean' = BCE on the time-mean logit "
                        "(the statistic inference thresholds, losses.dec_loss)")
    p.add_argument("--loss-weights",
                   help="override loss-term weights, e.g. 'dec=5,l1=0.2' "
                        "(terms: l1, mel, loud, loc, dec, hf — the preset's "
                        "reference values otherwise, ref: py/main14.py:34-38)")
    p.add_argument("--shape-max-rms", type=float, default=None,
                   help="enable the main16 delta-shaping chain with this hard "
                        "limit_rms cap (e.g. 0.010); applied in training AND "
                        "recorded in the checkpoint so inference shapes "
                        "identically — the watermark RMS is bounded by "
                        "construction, not just by loss pressure")
    p.add_argument("--dec-bit-balance", type=float, default=None,
                   help="γ>0 re-weights each bit's dec BCE by (its batch BCE "
                        "/ mean)^γ — concentrates decode pressure on unlearned "
                        "bit positions (band-limited runs collapse to ~5 live "
                        "channels otherwise; see losses.dec_loss).  Requires "
                        "--dec-loss mean")
    p.add_argument("--clean-val", action="store_true",
                   help="validate on CLEAN batches even with --augment.  By "
                        "default validation applies the same attack curriculum "
                        "with deterministic epoch-independent draws, so "
                        "--select-metric loc,dec tracks detection UNDER attack "
                        "(clean loc/dec are already converged at fine-tune "
                        "start and would freeze selection at epoch 0)")
    p.add_argument("--seed", type=int,
                   help="training seed override (init + split + shuffle); "
                        "default: the preset's seed")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--data-parallel", action="store_true", help="shard over all local devices")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--log-csv", default=None)
    p.add_argument("--loss-plot", default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "curriculum",
        help="staged multi-leg training recipe in one command "
             "(the flagship robust+decode arc: DEMO.md 'Band-limited carrier')",
    )
    p.add_argument("recipe", choices=sorted(_CURRICULA))
    p.add_argument("--out", required=True, help="root dir; one subdir per leg")
    p.add_argument("--data", help="directory of 1-s wav clips")
    p.add_argument("--synthetic-n", type=int, default=24576)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--music-frac", type=float, default=0.15)
    p.add_argument("--audio-len", type=int)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, help="training seed for every leg")
    p.add_argument("--init-from", help="start the first leg from a checkpoint")
    p.add_argument("--smoke", action="store_true",
                   help="1 epoch per leg (pipeline smoke test)")
    p.add_argument("--epochs-scale", type=float, default=1.0,
                   help="scale every leg's epoch budget (e.g. 0.5 for a "
                        "compressed recipe-stability / seed-variance run)")
    p.add_argument("--stop-after", default=None,
                   help="stop after the named leg finishes (drivers use this "
                        "to interleave evals/snapshots between legs; re-run "
                        "to continue — finished legs are skipped)")
    p.set_defaults(fn=cmd_curriculum)

    p = sub.add_parser("evaluate", help="corpus sweep: accuracy/AUC/K-fold")
    _add_session_args(p)
    p.add_argument("data")
    p.add_argument("--max-files", type=int)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("embed-folder", help="watermark a directory tree")
    _add_session_args(p)
    p.add_argument("input")
    p.add_argument("output")
    p.set_defaults(fn=cmd_embed_folder)

    p = sub.add_parser("detect-folder", help="detect over a directory tree")
    _add_session_args(p)
    p.add_argument("input")
    p.add_argument("--threshold", type=float, default=0.5)
    p.set_defaults(fn=cmd_detect_folder)

    p = sub.add_parser("bench", help="clips/sec/chip benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("serve", help="HTTP embed/detect server")
    _add_session_args(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--max-batch", type=int, default=256,
                   help="micro-batch chunk budget per device call")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="max time a request waits for batch co-riders")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("prep", help="dataset creation tools")
    psub = p.add_subparsers(dest="prep_cmd", required=True)
    q = psub.add_parser("metadata"); q.add_argument("dir"); q.add_argument("output")
    q = psub.add_parser("select"); q.add_argument("metadata"); q.add_argument("output")
    q.add_argument("--hours", type=float); q.add_argument("--seconds", type=float)
    q.add_argument("--seed", type=int)
    q = psub.add_parser("segment"); q.add_argument("output")
    q.add_argument("--metadata"); q.add_argument("--dir")
    q.add_argument("--seconds", type=float, default=1.0)
    q.add_argument("--subdirs", action="store_true")
    q.add_argument("--workers", type=int, default=8)
    q = psub.add_parser("classify"); q.add_argument("dir"); q.add_argument("output")
    q.add_argument("--workers", type=int, default=8); q.add_argument("--max-files", type=int)
    q.add_argument("--full", action="store_true",
                   help="record the full noise.py feature set (MFCC stats, "
                   "spectral bandwidth/rolloff, order-5 band filter)")
    q.add_argument("--sample", type=int,
                   help="tuning mode: analyze N random files and print "
                   "per-feature statistics instead of classifying the folder")
    q = psub.add_parser("speech-only"); q.add_argument("list"); q.add_argument("output")
    q = psub.add_parser("silent"); q.add_argument("dir")
    q.add_argument("--threshold", type=float, default=1e-4)
    q = psub.add_parser("compare"); q.add_argument("a"); q.add_argument("b")
    p.set_defaults(fn=cmd_prep)

    ap.add_argument("--platform", help="force a jax platform (cpu/tpu/axon)")
    args = ap.parse_args(argv)
    _apply_platform(args)
    args.fn(args)


if __name__ == "__main__":
    main()
