"""Isolate the Wang split's numeric contribution on the real chip:
decode a stream through the i16 fast path with USE_DCT4_SPLIT off and
on, and report the max |i16 difference| — split vs direct DIRECTLY,
without the libvorbis golden in between. Complements `bench.py
--dct4-split --check` (the gate) when the gate reddens and the question
is "how much of that is the split vs everything else".

    python tools/split_diff.py [--file tests/data/corpus/stereo_44k_q3.ogg]
    python tools/split_diff.py --crafted f1_bs8192
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def decode(path: str, split: bool) -> np.ndarray:
    import jax

    from lewton_tpu.inside_ogg import OggStreamReader
    from lewton_tpu.ops import imdct as imdct_mod

    imdct_mod.USE_DCT4_SPLIT = split
    jax.clear_caches()  # re-trace: the flag is read at trace time
    return OggStreamReader(path, backend="jax").read_all_i16()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="tests/data/corpus/stereo_44k_q3.ogg")
    ap.add_argument("--crafted", default=None,
                    help="crafted variant name from tools/craft.py")
    args = ap.parse_args()
    path = args.file
    if args.crafted:
        import tempfile

        from tools.craft import VARIANTS, build_stream

        data = build_stream(dict(VARIANTS)[args.crafted])
        f = tempfile.NamedTemporaryFile(suffix=".ogg", delete=False)
        f.write(data)
        f.close()
        path = f.name
    a = decode(path, split=False)
    b = decode(path, split=True)
    assert a.shape == b.shape, (a.shape, b.shape)
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    print(f"split vs direct: maxdiff {int(d.max())} LSB, "
          f">1: {int((d > 1).sum())}, >2: {int((d > 2).sum())} "
          f"of {d.size} samples")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
