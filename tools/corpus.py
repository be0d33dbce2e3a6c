"""Deterministic in-repo test corpus (no network).

Plays the role of lewton's sha256-pinned downloaded asset corpus
(dev/cmp/src/lib.rs:238-674): a spread of Ogg Vorbis files covering rates,
channel counts, qualities, bitrate management, chaining, silence, transients
and tiny files — generated with libvorbisenc, with golden PCM decoded by
libvorbisfile. Files land in tests/data/corpus (gitignored; regenerated on
demand, keyed by GENERATOR_VERSION).
"""

from __future__ import annotations

import json
import os

import numpy as np

from . import vorbisref as vr

GENERATOR_VERSION = 5


def _music(rate: int, seconds: float, channels: int, seed: int) -> np.ndarray:
    """Music-like deterministic signal: harmonics with vibrato + noise floor
    + amplitude envelope + occasional transients (forces short blocks)."""
    rng = np.random.RandomState(seed)
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64) / rate
    out = np.zeros((channels, n))
    for ch in range(channels):
        sig = np.zeros(n)
        for k in range(1, 6):
            f0 = 110.0 * (2 ** rng.randint(0, 4)) * k
            if f0 > rate / 2 * 0.9:
                continue
            vib = 1.0 + 0.002 * np.sin(2 * np.pi * (4 + ch) * t + rng.rand() * 6)
            sig += (0.5 / k) * np.sin(2 * np.pi * f0 * vib * t + rng.rand() * 6)
        env = 0.4 + 0.3 * np.sin(2 * np.pi * 0.7 * t + ch)
        sig *= env
        sig += 0.01 * rng.randn(n)
        # transient clicks every ~0.4s
        for click in np.arange(0.2, seconds - 0.05, 0.4):
            i = int(click * rate) + rng.randint(0, 100)
            dur = int(0.004 * rate) or 1
            sig[i : i + dur] += rng.randn(dur) * 0.8
        out[ch] = sig
    peak = np.abs(out).max() or 1.0
    return (out / peak * 0.85).astype(np.float32)


def _speech(rate: int, seconds: float, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n = int(rate * seconds)
    t = np.arange(n, dtype=np.float64) / rate
    pitch = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    phase = np.cumsum(pitch) / rate
    sig = sum(np.sin(2 * np.pi * k * phase) / k for k in range(1, 9))
    formant = np.sin(2 * np.pi * 800 * t) * 0.2
    voiced = (np.sin(2 * np.pi * 1.1 * t) > -0.3).astype(np.float64)
    sig = (sig * 0.3 + formant) * voiced + 0.05 * rng.randn(n) * (1 - voiced)
    return (sig / np.abs(sig).max() * 0.8).astype(np.float32)[None, :]


def _impulses(rate: int, seconds: float) -> np.ndarray:
    n = int(rate * seconds)
    sig = np.zeros((2, n), dtype=np.float32)
    for i in range(0, n, max(1, rate // 10)):
        sig[:, i : i + 8] = 0.9
        sig[:, i + 8 : i + 16] = -0.9
    return sig


SPECS = [
    # name, builder kwargs
    ("mono_8k_q-1", dict(kind="speech", rate=8000, seconds=1.5, quality=-0.1)),
    ("mono_16k_q3", dict(kind="speech", rate=16000, seconds=1.5, quality=0.3)),
    ("stereo_44k_q3", dict(kind="music", rate=44100, seconds=3.0, channels=2, quality=0.3)),
    ("stereo_44k_q10", dict(kind="music", rate=44100, seconds=1.0, channels=2, quality=1.0)),
    ("stereo_48k_q5", dict(kind="music", rate=48000, seconds=1.5, channels=2, quality=0.5)),
    ("stereo_96k_q6", dict(kind="music", rate=96000, seconds=1.0, channels=2, quality=0.6)),
    ("ch6_44k_q3", dict(kind="music", rate=44100, seconds=1.0, channels=6, quality=0.3)),
    ("ch4_32k_q2", dict(kind="music", rate=32000, seconds=1.0, channels=4, quality=0.2)),
    ("stereo_44k_managed", dict(kind="music", rate=44100, seconds=1.0, channels=2,
                                bitrates=(128000, 112000, 96000))),
    ("tiny_44k", dict(kind="music", rate=44100, seconds=0.05, channels=2, quality=0.3)),
    ("silence_44k", dict(kind="silence", rate=44100, seconds=0.5, channels=2, quality=0.3)),
    ("impulses_44k", dict(kind="impulses", rate=44100, seconds=1.0, quality=0.4)),
    ("chained_44k", dict(kind="chained", rate=44100, seconds=0.7, channels=2, quality=0.3)),
    ("ch8_44k_q4", dict(kind="music", rate=44100, seconds=0.8, channels=8, quality=0.4)),
    ("mono_11k_q0", dict(kind="speech", rate=11025, seconds=1.2, quality=0.0)),
    ("stereo_22k_q0", dict(kind="music", rate=22050, seconds=1.2, channels=2, quality=0.0)),
    ("long_44k_q2", dict(kind="music", rate=44100, seconds=12.0, channels=2, quality=0.2)),
]


def _signal(kind: str, rate: int, seconds: float, channels: int, seed: int) -> np.ndarray:
    if kind == "music":
        return _music(rate, seconds, channels, seed)
    if kind == "speech":
        return _speech(rate, seconds, seed)
    if kind == "silence":
        return np.zeros((channels, int(rate * seconds)), dtype=np.float32)
    if kind == "impulses":
        return _impulses(rate, seconds)
    raise ValueError(kind)


def build_file(name: str, spec: dict, seed: int) -> tuple[bytes, dict]:
    kind = spec["kind"]
    rate = spec["rate"]
    seconds = spec["seconds"]
    channels = spec.get("channels", 1)
    quality = spec.get("quality")
    bitrates = spec.get("bitrates")
    if kind == "chained":
        pcm1 = _music(rate, seconds, channels, seed)
        pcm2 = _music(rate, seconds, channels, seed + 1)
        data = vr.encode(pcm1, rate, quality=quality, serial=1000 + seed) + vr.encode(
            pcm2, rate, quality=0.6, serial=2000 + seed
        )
        channels = pcm1.shape[0]
    else:
        pcm = _signal(kind, rate, seconds, channels, seed)
        data = vr.encode(
            pcm, rate, quality=quality, bitrates=bitrates, serial=seed
        )
        channels = pcm.shape[0]
    meta = {"rate": rate, "channels": channels, "kind": kind}
    return data, meta


def ensure_corpus(root: str) -> None:
    stamp = os.path.join(root, "VERSION")
    if os.path.exists(stamp) and open(stamp).read().strip() == str(GENERATOR_VERSION):
        return
    os.makedirs(root, exist_ok=True)
    for seed, (name, spec) in enumerate(SPECS, start=7):
        data, meta = build_file(name, spec, seed)
        path = os.path.join(root, name + ".ogg")
        with open(path, "wb") as f:
            f.write(data)
        golden = vr.decode_file_i16(path)
        np.save(os.path.join(root, name + ".golden.npy"), golden)
        meta["pcm_total"] = int(golden.shape[0])
        meta["ogg_bytes"] = len(data)
        with open(os.path.join(root, name + ".json"), "w") as f:
            json.dump(meta, f)
    with open(stamp, "w") as f:
        f.write(str(GENERATOR_VERSION))


if __name__ == "__main__":
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "tests/data/corpus"
    ensure_corpus(root)
    for n in sorted(os.listdir(root)):
        print(n)
