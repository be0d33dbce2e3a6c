"""Debug taps: the four stage intermediates match between the numpy
reference and the device pipeline (the reference's record_* points,
lewton src/lib.rs:56-94)."""

import os

import numpy as np

from lewton_tpu import debug
from lewton_tpu.audio import decode_packet_entropy
from lewton_tpu.inside_ogg import OggStreamReader, read_headers
from lewton_tpu.models.decoder import compile_setup, decode_frames, pack_frames
from lewton_tpu.ogg import PacketReader
from lewton_tpu.ops.windowing import init_window_carry


def test_taps_match_between_backends(corpus_dir):
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    with open(path, "rb") as f:
        data = f.read()
    rdr = PacketReader(data)
    headers, serial = read_headers(rdr)
    pcks = []
    while (p := rdr.read_packet()) is not None:
        if p.stream_serial == serial:
            pcks.append(p.data)
    pcks = pcks[:8]

    # numpy reference taps
    with debug.taps() as t:
        r = OggStreamReader(path)
        for _ in range(len(pcks)):
            r.read_dec_packet()
    assert len(t["pre_mdct"]) == len(pcks)

    # device taps
    cs = compile_setup(headers.ident, headers.setup)
    plans = [decode_packet_entropy(headers.ident, headers.setup, p)
             for p in pcks]
    fr = pack_frames(cs, plans, len(pcks))
    import jax.numpy as jnp

    fr = {k: jnp.asarray(v) for k, v in fr.items()}
    carry = init_window_carry(cs.channels, cs.n1 // 2)
    (out, out_len, taps), _ = decode_frames(cs, fr, carry, with_taps=True)

    for k in ("residue_pre_inverse", "residue_post_inverse", "pre_mdct"):
        dev = np.asarray(taps[k])  # device taps span w_eff columns
        for i, ref in enumerate(t[k]):
            n2 = min(ref.shape[1], cs.w_eff)
            np.testing.assert_allclose(
                dev[i, :, :n2], ref[:, :n2], atol=2e-6, err_msg=f"{k}[{i}]")
            # the w_eff premise: reference values past it are exactly zero
            assert np.all(ref[:, cs.w_eff:] == 0), f"{k}[{i}] beyond w_eff"
    dev = np.asarray(taps["post_mdct"])
    for i, ref in enumerate(t["post_mdct"]):
        n = ref.shape[1]
        np.testing.assert_allclose(
            dev[i, :, :n], ref, atol=1e-4, err_msg=f"post_mdct[{i}]")
