"""Async API facade (lewton_tpu/aio.py) vs the sync reader — identical
PCM when the bytes dribble in, plus header surface and Stream parity
(ref: lewton src/inside_ogg.rs:316-451 async_api)."""

import asyncio
import os

import numpy as np
import pytest

from lewton_tpu import native
from lewton_tpu.aio import AsyncOggStreamReader, HeadersReader
from lewton_tpu.errors import OggError
from lewton_tpu.inside_ogg import OggStreamReader


class _Dribble:
    """async source: serves the file in tiny uneven chunks."""

    def __init__(self, data: bytes, step: int):
        self._data = data
        self._pos = 0
        self._step = step

    async def read(self, n: int) -> bytes:
        await asyncio.sleep(0)
        step = min(self._step, n)
        out = self._data[self._pos : self._pos + step]
        self._pos += len(out)
        return out


async def _collect(data: bytes, step: int, backend: str):
    rdr = await AsyncOggStreamReader.new(_Dribble(data, step), backend=backend)
    chunks = []
    async for pcm in rdr:
        if pcm.shape[1]:
            chunks.append(pcm)
    return (np.concatenate(chunks, axis=1) if chunks
            else np.zeros((rdr.ident_hdr.channels, 0), np.int16)), rdr


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_async_matches_sync(corpus_dir, backend):
    if backend == "native" and not native.available():
        pytest.skip("native library not built")
    data = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()
    got, rdr = asyncio.run(_collect(data, step=777, backend=backend))
    want = OggStreamReader(data, backend=backend).read_all_i16().T  # [ch, n]
    assert got.shape == want.shape
    assert np.array_equal(got, want)
    assert rdr.ident_hdr.channels == 2
    assert rdr.get_last_absgp() == want.shape[1]


@pytest.mark.parametrize("step,backend", [(555, "numpy"), (17, "numpy"),
                                          (555, "native")])
def test_async_chained_stream(corpus_dir, step, backend):
    """Chained Ogg through the async reader: a new link's BOS ident page
    and its comment/setup page are SEPARATE pages, so with incremental
    feeding the re-init always hits a starved demuxer mid-headers. The
    resumable chain re-init (inside_ogg._resumable_chain) must push back
    and await more bytes rather than raise OggError mid-stream."""
    if backend == "native" and not native.available():
        pytest.skip("native library not built")
    data = open(os.path.join(corpus_dir, "chained_44k.ogg"), "rb").read()
    got, rdr = asyncio.run(_collect(data, step=step, backend=backend))
    sync = OggStreamReader(data, backend=backend)
    chunks = []
    while True:
        pcm = sync.read_dec_packet()
        if pcm is None:
            break
        if pcm.shape[1]:
            chunks.append(pcm)
    want = np.concatenate(chunks, axis=1)
    assert got.shape == want.shape
    assert np.array_equal(got, want)


def test_headers_reader(corpus_dir):
    data = open(os.path.join(corpus_dir, "mono_16k_q3.ogg"), "rb").read()

    async def go():
        hr = HeadersReader(_Dribble(data, 333))
        ident, comment, setup_pck = await hr.read_headers()
        return ident, comment

    ident, comment = asyncio.run(go())
    assert ident.channels == 1 and ident.sample_rate == 16000
    assert comment.vendor  # libvorbis vendor string


def test_headers_eof_errors():
    async def go():
        hr = HeadersReader(_Dribble(b"OggS\x00trunc", 4))
        await hr.read_headers()

    with pytest.raises(OggError):
        asyncio.run(go())


def test_async_iterator_protocol(corpus_dir):
    data = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()

    async def go():
        rdr = await AsyncOggStreamReader.new(_Dribble(data, 1024))
        out = await rdr.read_dec_packet_itl()
        total = 0 if out is None else out.shape[0]
        async for pcm in rdr:
            total += pcm.size
        return total

    total = asyncio.run(go())
    want = OggStreamReader(data).read_all_i16().size
    assert total == want
