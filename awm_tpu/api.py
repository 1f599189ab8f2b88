"""Public embed/detect API, reference-compatible signatures and results.

Mirrors the reference's entry points (ref: generate_watermarked_audio
py/main14.py:719-808, detect_watermark py/main14.py:856-949,
run_inference_on_file py/main14.py:609-686, quality save path
py/main15.py:850-867) with one structural change, the single biggest
throughput win (SURVEY.md section 3.2): the reference loops over 1-second
chunks in Python with a host->device->host round-trip per chunk; here an
N-second file is reshaped to (n_chunks, 16000) and processed in ONE device
call.  Chunk counts are padded to power-of-two buckets so arbitrary file
lengths reuse a handful of compiled graphs instead of recompiling per length
(SURVEY.md "hard parts": variable-length API under jit).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from awm_tpu.config import AUDIO_LEN, SAMPLE_RATE
from awm_tpu.dsp import lowpass_biquad
from awm_tpu.utils.audio_io import load_mono_16k, save_wav

_MAX_BUCKET = 512  # chunks per device call; longer files loop over megabatches


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, _MAX_BUCKET)


class InferenceSession:
    """Bundles generator/detector modules + variables + jitted chunk kernels.

    The reference passes bare nn.Modules around; in JAX the (module,
    variables) pair plus compiled callables is the natural unit.
    """

    def __init__(
        self,
        gen_module,
        det_module,
        gen_vars,
        det_vars,
        *,
        message_bits: int = 16,
        sample_rate: int = SAMPLE_RATE,
        chunk_len: int = AUDIO_LEN,
        compute_dtype=jnp.bfloat16,
        shaping=None,
    ):
        # Inference precision is governed HERE by casting variables+inputs,
        # not by the modules' training compute dtype — neutralize any dtype
        # the training config baked in so compute_dtype=fp32 really is fp32
        # (strict parity) and bf16 is applied exactly once.
        def _neutral(m):
            return m.clone(dtype=None) if "dtype" in getattr(m, "__dataclass_fields__", {}) else m

        self.gen = _neutral(gen_module)
        self.det = _neutral(det_module)
        self.gen_vars = gen_vars
        self.det_vars = det_vars
        self.message_bits = message_bits
        self.sample_rate = sample_rate
        self.chunk_len = chunk_len
        self.compute_dtype = compute_dtype
        # main16 delta-shaping chain at embed time: the reference applies
        # fir_lowpass -> clamp_peak -> limit_rms in eval exactly as in
        # training (ref: py/main16.py:384-386), so a shaping-trained
        # checkpoint must shape its inference deltas too — this is what
        # makes the limit_rms cap a HARD guarantee on served watermarks.
        self.shaping = shaping if (shaping is not None and shaping.enabled) else None

        # bf16 conv/BN compute for serving: 1.8x detector throughput with no
        # measurable change in mean detection probability (the LSTM kernel
        # and every reduction stay fp32).  Pass compute_dtype=jnp.float32
        # for strict checkpoint-parity numerics.
        if compute_dtype != jnp.float32:
            _cast = lambda tree: jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if hasattr(a, "dtype") and a.dtype == jnp.float32
                else a,
                tree,
            )
            gen_vars_c, det_vars_c = _cast(gen_vars), _cast(det_vars)
        else:
            gen_vars_c, det_vars_c = gen_vars, det_vars

        def _embed_fn(chunks, msgs):
            delta = self.gen.apply(
                gen_vars_c, chunks.astype(compute_dtype), msgs
            ).astype(jnp.float32)
            if self.shaping is not None:
                from awm_tpu.shaping import shape_delta

                delta = shape_delta(delta, self.shaping, self.sample_rate)
            return delta

        self._embed = jax.jit(_embed_fn)
        self._detect = jax.jit(
            lambda chunks: self.det.apply(
                det_vars_c, chunks.astype(compute_dtype)
            ).astype(jnp.float32)
        )

        def _detect_reduced(chunks, lengths):
            """Detector + on-device reductions.  Returns per-sample probs and
            per-chunk message summaries so only O(T) floats per chunk cross
            the host boundary instead of the full (N, T, 17) logits tensor
            (a 17x D2H saving — decisive through the TPU tunnel)."""
            logits = self.det.apply(
                det_vars_c, chunks.astype(compute_dtype)
            ).astype(jnp.float32)
            probs = jax.nn.sigmoid(logits[:, :, 0])  # (N, T)
            t = chunks.shape[1]
            mask = (
                jnp.arange(t)[None, :] < lengths[:, None]
            ).astype(jnp.float32)  # valid samples (tail chunk is shorter)
            denom = jnp.maximum(lengths.astype(jnp.float32), 1.0)[:, None]
            msg_logit_mean = (logits[:, :, 1:] * mask[:, :, None]).sum(axis=1) / denom
            votes = (logits[:, :, 1:] > 0).astype(jnp.float32)
            msg_vote_frac = (votes * mask[:, :, None]).sum(axis=1) / denom
            mean_prob = (probs * mask).sum(axis=1) / denom[:, 0]
            return probs, msg_logit_mean, msg_vote_frac, mean_prob

        self._detect_reduced = jax.jit(_detect_reduced)
        def _embed_detect(chunks, msgs, lengths):
            """Fused embed+detect round trip fully on device (bench/eval
            path): returns delta stats + detection summaries, no waveform
            D2H at all."""
            delta = self.gen.apply(
                gen_vars_c, chunks.astype(compute_dtype), msgs
            ).astype(jnp.float32)
            s_w = chunks + delta
            both = jnp.concatenate([s_w, chunks], axis=0)
            probs, mlm, mvf, mp = _detect_reduced(both, jnp.concatenate([lengths, lengths]))
            n = chunks.shape[0]
            rms = jnp.sqrt(jnp.mean(jnp.square(delta), axis=1))
            return {
                "wm_prob": mp[:n],
                "clean_prob": mp[n:],
                "msg_logit_mean": mlm[:n],
                "msg_vote_frac": mvf[:n],
                "delta_rms": rms,
            }

        self._embed_detect = jax.jit(_embed_detect)

    @classmethod
    def from_state(cls, cfg, gen, det, state, compute_dtype=jnp.bfloat16) -> "InferenceSession":
        """Build from a TrainState (awm_tpu.train).  Adopts the config's
        delta-shaping chain when enabled (main16 eval parity)."""
        return cls(
            gen,
            det,
            {"params": state.params["gen"], "batch_stats": state.batch_stats["gen"]},
            {"params": state.params["det"], "batch_stats": state.batch_stats["det"]},
            message_bits=cfg.message_bits,
            sample_rate=cfg.sample_rate,
            chunk_len=cfg.audio_len,
            compute_dtype=compute_dtype,
            shaping=cfg.shaping,
        )

    # -- batched chunk kernels (bucket-padded static shapes) ----------------

    def embed_chunks(self, chunks: np.ndarray, messages: np.ndarray) -> np.ndarray:
        """(N, 16000) float32 + (N,) int32 -> (N, 16000) delta."""
        return self._run_bucketed(self._embed, [chunks, messages])

    def detect_chunks(self, chunks: np.ndarray) -> np.ndarray:
        """(N, 16000) -> (N, 16000, 1+bits) raw logits.  Prefer
        detect_summary for large sweeps — raw logits are a 17x larger
        host transfer."""
        return self._run_bucketed(self._detect, [chunks])

    def detect_summary(self, chunks: np.ndarray, lengths: Optional[np.ndarray] = None):
        """(N, L) [+ per-chunk valid lengths] ->
        (probs (N, L), msg_logit_mean (N, bits), msg_vote_frac (N, bits),
        mean_prob (N,)), reduced on device."""
        if lengths is None:
            lengths = np.full(chunks.shape[0], chunks.shape[1], np.int32)
        return self._run_bucketed(
            self._detect_reduced, [chunks, lengths.astype(np.int32)],
            pad_values=[0.0, 1],
        )

    def embed_detect(self, chunks: np.ndarray, messages: np.ndarray,
                     lengths: Optional[np.ndarray] = None):
        """Fused embed+detect sweep, summaries only (dict of per-chunk
        arrays) — the fast path for corpus eval and benchmarking."""
        if lengths is None:
            lengths = np.full(chunks.shape[0], chunks.shape[1], np.int32)
        return self._run_bucketed(
            self._embed_detect,
            [chunks, messages.astype(np.int32), lengths.astype(np.int32)],
            pad_values=[0.0, 0, 1],
        )

    def _run_bucketed(self, fn, arrays, pad_values=None):
        """Run fn over row-aligned arrays in power-of-two buckets, slicing
        padding back off.  Handles array / tuple / dict outputs."""
        n = arrays[0].shape[0]
        if pad_values is None:
            pad_values = [0] * len(arrays)
        outs = []
        i = 0
        while i < n:
            take = min(_MAX_BUCKET, n - i)
            b = _bucket(take)
            ins = []
            for arr, pv in zip(arrays, pad_values):
                a = arr[i : i + take]
                if take < b:
                    pad = np.full((b - take,) + a.shape[1:], pv, a.dtype)
                    a = np.concatenate([a, pad])
                ins.append(jnp.asarray(a))
            out = fn(*ins)
            outs.append(jax.tree.map(lambda o: np.asarray(o)[:take], out))
            i += take
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(lambda *xs: np.concatenate(xs), *outs)


def _to_chunks(waveform: np.ndarray, chunk_len: int = AUDIO_LEN):
    """(T,) -> ((n_chunks, chunk_len), total_samples).  Tail zero-padded
    (ref pads the remainder chunk, py/main14.py:753-757)."""
    total = waveform.shape[-1]
    n_chunks = max(1, -(-total // chunk_len))
    padded = np.zeros(n_chunks * chunk_len, dtype=np.float32)
    padded[:total] = waveform
    return padded.reshape(n_chunks, chunk_len), total


def watermark_array(
    waveform: np.ndarray,
    session: InferenceSession,
    *,
    message=None,
    seed: Optional[int] = None,
    ecc: bool = False,
) -> Dict:
    """Embed into a raw (T,) 16 kHz waveform.  Fresh random message per chunk
    (ref: py/main14.py:743) unless a fixed message (int) or an explicit
    per-chunk message array is given.

    ecc=True interprets the message(s) as 11-bit payloads and embeds their
    SECDED codewords (awm_tpu.ecc) — blind decode then survives any
    single-bit error per chunk.  The result dict gains "payloads"."""
    chunks, total = _to_chunks(waveform, session.chunk_len)
    n = chunks.shape[0]
    rng = np.random.default_rng(seed)
    payloads = None
    if ecc:
        from awm_tpu.ecc import PAYLOAD_BITS, ecc_encode

        if message is None:
            payloads = rng.integers(0, 2**PAYLOAD_BITS, size=n, dtype=np.int64)
        elif np.ndim(message) > 0:
            payloads = np.asarray(message, dtype=np.int64)
        else:
            payloads = np.full(n, int(message), dtype=np.int64)
        message = np.asarray([ecc_encode(int(p)) for p in payloads], np.int64)
    if message is None:
        messages = rng.integers(0, 2**session.message_bits, size=n, dtype=np.int64)
    elif np.ndim(message) > 0:
        messages = np.asarray(message, dtype=np.int64)
        if messages.shape != (n,):
            raise ValueError(
                f"per-chunk messages must have shape ({n},) for this waveform, "
                f"got {messages.shape}"
            )
    else:
        messages = np.full(n, int(message), dtype=np.int64)
    deltas = session.embed_chunks(chunks, messages.astype(np.int32))
    delta = deltas.reshape(-1)[:total]
    watermarked = waveform[:total] + delta
    out = {
        "watermarked_waveform": watermarked,
        "delta_waveform": delta,
        "original_waveform": waveform[:total],
        "messages": messages,
    }
    if payloads is not None:
        out["payloads"] = payloads
    return out


def detect_array(
    waveform: np.ndarray,
    session: InferenceSession,
    detection_threshold: float = 0.5,
    *,
    ecc: bool = False,
) -> Dict:
    """Detect on a raw (T,) waveform.  Matches detect_watermark's reductions:
    per-sample sigmoid probs over valid samples only, chunk-level time-mean
    message logits averaged across chunks, bits = mean logit > 0
    (ref: py/main14.py:875-929)."""
    chunks, total = _to_chunks(waveform, session.chunk_len)
    n, chunk_len = chunks.shape
    # per-chunk valid lengths: the tail chunk's logits are sliced to the
    # remainder before any mean (ref: py/main14.py:905-908)
    lengths = np.full(n, chunk_len, np.int32)
    if total % chunk_len:
        lengths[-1] = total % chunk_len
    probs, msg_logit_mean, _, _ = session.detect_summary(chunks, lengths)
    temporal_probs = probs.reshape(-1)[:total]
    mean_prob = float(temporal_probs.mean())
    # mean over chunks of per-chunk time-mean bit logits (ref: py/main14.py:925-927)
    msg_logits_mean = msg_logit_mean.mean(axis=0)

    is_wm = mean_prob > detection_threshold
    out = {
        "mean_probability": mean_prob,
        "is_watermarked": bool(is_wm),
        "temporal_probs": temporal_probs,
        "decision": "WATERMARKED" if is_wm else "NOT WATERMARKED",
        "predicted_message": (msg_logits_mean > 0).astype(int).tolist(),
        "message_confidence": (1.0 / (1.0 + np.exp(-msg_logits_mean))).tolist(),
    }
    if ecc:
        from awm_tpu.ecc import ecc_decode

        payload, corrected, ok = ecc_decode(out["predicted_message"])
        out["ecc"] = {
            "payload": payload,
            "corrected_bits": corrected,
            "ok": bool(ok),
        }
    return out


def _binom_sf(k: int, n: int) -> float:
    """Exact P(X >= k) for X ~ Binomial(n, 1/2) — the null distribution of
    per-bit agreement when the audio is unwatermarked (or watermarked with an
    independent message): each decoded bit matches the expected one with
    probability 1/2."""
    from math import comb

    return sum(comb(n, j) for j in range(k, n + 1)) / float(2**n)


def verify_array(
    waveform: np.ndarray,
    session: InferenceSession,
    expected_message: int,
    detection_threshold: float = 0.5,
    alpha: float = 0.01,
    *,
    ecc: bool = False,
) -> Dict:
    """Authenticate a raw (T,) waveform against an EXPECTED message.

    The reference stops at detection + free-form decode (ref:
    py/main14.py:856-949); the authentication use-case the repo is named for
    is stronger: the verifier KNOWS which message it embedded and wants a
    calibrated accept/reject.  This tests the decoded bits against the
    expected ones — per-bit agreement k/n, exact binomial p-value under the
    null (unwatermarked audio decodes each bit right with prob 1/2), and the
    expected-sign logit margin — and combines it with the detection score:
    AUTHENTIC requires BOTH the watermark to be detected and the agreement
    to be significant at `alpha`.

    All statistics derive from the same on-device reductions as
    detect_array (per-chunk time-mean bit logits); nothing new crosses the
    host boundary.
    """
    payload = None
    if ecc:
        from awm_tpu.ecc import ecc_encode

        payload = int(expected_message)
        expected_message = ecc_encode(payload)
    det = detect_array(waveform, session, detection_threshold)
    bits = session.message_bits
    expected = (int(expected_message) >> np.arange(bits)) & 1  # LSB first
    decoded = np.asarray(det["predicted_message"])
    agree = int((decoded == expected).sum())
    p_value = _binom_sf(agree, bits)
    # margin: mean bit logit signed toward the expected bit — positive means
    # the evidence points at expected_message, magnitude is confidence
    conf = np.asarray(det["message_confidence"])
    logits = np.log(conf / (1.0 - conf + 1e-12) + 1e-12)
    margin = float((logits * np.where(expected == 1, 1.0, -1.0)).mean())
    authentic = bool(det["is_watermarked"] and p_value <= alpha)
    out_extra = {} if payload is None else {"expected_payload": payload}
    return {
        **out_extra,
        "mean_probability": det["mean_probability"],
        "is_watermarked": det["is_watermarked"],
        "expected_message": int(expected_message),
        "decoded_message": int((decoded.astype(np.int64) << np.arange(bits)).sum()),
        "bit_agreement": agree,
        "bit_agreement_frac": agree / bits,
        "p_value": p_value,
        "match_margin": margin,
        "alpha": alpha,
        "is_authentic": authentic,
        "decision": "AUTHENTIC" if authentic else "NOT AUTHENTIC",
    }


def verify_watermark(
    input_file: str,
    session: InferenceSession,
    expected_message: int,
    detection_threshold: float = 0.5,
    alpha: float = 0.01,
    *,
    ecc: bool = False,
) -> Dict:
    """File-level authenticate-against-expected-message API (see
    verify_array)."""
    waveform = load_mono_16k(input_file, session.sample_rate)
    return verify_array(
        waveform, session, expected_message, detection_threshold, alpha, ecc=ecc
    )


def _si_snr_np(s: np.ndarray, s_hat: np.ndarray, eps: float = 1e-8) -> float:
    """Reference compute_si_snr on host arrays (ref: py/main14.py:650-659)."""
    s = s - s.mean()
    s_hat = s_hat - s_hat.mean()
    alpha = float((s * s_hat).sum() / ((s * s).sum() + eps))
    s_target = alpha * s
    e_noise = s_hat - s_target
    return float(10.0 * np.log10((s_target**2).sum() / ((e_noise**2).sum() + eps)))


def generate_watermarked_audio(
    input_file: str,
    session: InferenceSession,
    output_file: Optional[str] = None,
    *,
    message: Optional[int] = None,
    seed: Optional[int] = None,
    ecc: bool = False,
) -> Dict:
    """File-level embed API, reference-compatible result dict
    (ref: py/main14.py:719-808)."""
    waveform = load_mono_16k(input_file, session.sample_rate)
    res = watermark_array(waveform, session, message=message, seed=seed, ecc=ecc)
    delta = res["delta_waveform"]
    wm = res["watermarked_waveform"]

    watermark_rms = float(np.sqrt((delta**2).mean()))
    si_snr_db = _si_snr_np(waveform, wm)
    power_ratio_db = float(10.0 * np.log10((waveform**2).mean() / (delta**2).mean()))

    if output_file:
        save_wav(output_file, wm, session.sample_rate)

    return {
        "watermarked_waveform": wm,
        "delta_waveform": delta,
        "original_waveform": waveform,
        "messages": res["messages"],
        **({"payloads": res["payloads"]} if "payloads" in res else {}),
        "metrics": {
            "watermark_rms": watermark_rms,
            "si_snr_db": si_snr_db,
            "power_ratio_db": power_ratio_db,
        },
    }


def detect_watermark(
    input_file: str,
    session: InferenceSession,
    detection_threshold: float = 0.5,
    visualize: bool = False,
    *,
    ecc: bool = False,
) -> Dict:
    """File-level detect API (ref: py/main14.py:856-949).  visualize=True
    writes the reference's temporal-probability plot next to the input."""
    waveform = load_mono_16k(input_file, session.sample_rate)
    result = detect_array(waveform, session, detection_threshold, ecc=ecc)
    if visualize:
        _plot_detection(input_file, result, detection_threshold, session.sample_rate)
    return result


def _plot_detection(input_file, result, threshold, sample_rate):
    """Temporal-probability figure matching the reference's output format
    (labels/colors/layout kept identical on purpose so downstream consumers
    of the PNG see the same artifact; ref: py/main14.py:931-947)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    probs = result["temporal_probs"]
    time_axis = np.linspace(0, len(probs) / sample_rate, len(probs))
    plt.figure(figsize=(12, 6))
    plt.plot(time_axis, probs, label="Detection Probability", color="blue", alpha=0.7)
    plt.axhline(y=threshold, color="red", linestyle="--", label=f"Threshold ({threshold})")
    plt.axhline(
        y=result["mean_probability"],
        color="green",
        linestyle="-.",
        label=f"Mean Probability ({result['mean_probability']:.4f})",
    )
    plt.xlabel("Time (seconds)")
    plt.ylabel("Watermark Detection Probability")
    plt.title(
        f"Watermark Detection Results for {os.path.basename(input_file)}\n"
        f"Decision: {result['decision']}"
    )
    plt.ylim(-0.05, 1.05)
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    out = os.path.splitext(input_file)[0] + "_detection.png"
    plt.savefig(out)
    plt.close()


def run_inference_on_file(input_file: str, session: InferenceSession):
    """Embed + detect + metrics on one file; returns
    (watermarked, detection_prob, watermark_rms, si_snr_db)
    (ref: py/main14.py:662-686)."""
    res = generate_watermarked_audio(input_file, session)
    wm = res["watermarked_waveform"]
    det = detect_array(wm, session)
    return (
        wm,
        det["mean_probability"],
        res["metrics"]["watermark_rms"],
        res["metrics"]["si_snr_db"],
    )


def save_audio_quality(waveform: np.ndarray, output_path: str, sample_rate: int = SAMPLE_RATE):
    """main15 quality save path: 7 kHz lowpass -> clamp -> int16 PCM WAV
    (ref: py/main15.py:850-867).  The biquad runs on device (short-FIR
    equivalent), the file write on host."""
    filtered = np.asarray(lowpass_biquad(jnp.asarray(waveform), sample_rate, 7000.0))
    save_wav(output_path, filtered, sample_rate)
