#!/usr/bin/env python3
"""Decode an Ogg Vorbis file to a WAV file (or play it when an audio
device is available via the `simpleaudio`/`sounddevice` optional deps).

Analog of the reference's examples/player.rs (OpenAL playback): this
container has no audio device, so the default sink is a .wav next to the
input.

Usage: python examples/player.py FILE.ogg [OUT.wav] [--backend ...]
"""

import argparse
import struct
import sys

sys.path.insert(0, ".")

from lewton_tpu.inside_ogg import OggStreamReader  # noqa: E402


def write_wav(path, pcm_i16, rate):
    """Minimal RIFF/WAVE writer: 16-bit PCM, interleaved [n, ch]."""
    n, ch = pcm_i16.shape
    data = pcm_i16.astype("<i2").tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(data)))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ch * 2,
                            ch * 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", len(data)))
        f.write(data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output", nargs="?")
    ap.add_argument("--backend", default="native",
                    choices=["numpy", "native", "jax"])
    args = ap.parse_args()
    out = args.output or args.input.rsplit(".", 1)[0] + ".wav"
    r = OggStreamReader(args.input, backend=args.backend)
    pcm = r.read_all_i16()
    write_wav(out, pcm, r.ident_hdr.sample_rate)
    secs = pcm.shape[0] / r.ident_hdr.sample_rate
    print(f"wrote {out}: {pcm.shape[0]} samples x {pcm.shape[1]} ch "
          f"({secs:.2f}s @ {r.ident_hdr.sample_rate} Hz)")


if __name__ == "__main__":
    main()
