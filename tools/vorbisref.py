"""ctypes bindings to the system libvorbis/libvorbisenc/libvorbisfile/libogg.

Role: the *reference oracle* for conformance testing — the same role libvorbis
plays in lewton's dev/cmp harness (`dev/cmp/src/lib.rs`). With no network
egress, test vectors are generated in-repo: synthetic PCM -> libvorbisenc ->
.ogg, and golden PCM comes from libvorbisfile decode. The decode contract is
lewton's: every sample within +/-2 i16 LSB of libvorbis output.

Only the stable public xiph ABI structs are declared (ogg_packet, ogg_page,
vorbis_info, vorbis_comment); stateful structs are over-allocated opaque
buffers passed by pointer.
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

_LIBDIR = "/usr/lib/x86_64-linux-gnu"


def _load(name: str) -> C.CDLL:
    return C.CDLL(os.path.join(_LIBDIR, name), mode=C.RTLD_GLOBAL)


_ogg = _load("libogg.so.0")
_vorbis = _load("libvorbis.so.0")
_vorbisenc = _load("libvorbisenc.so.2")
_vorbisfile = _load("libvorbisfile.so.3")


class ogg_packet(C.Structure):
    _fields_ = [
        ("packet", C.POINTER(C.c_ubyte)),
        ("bytes", C.c_long),
        ("b_o_s", C.c_long),
        ("e_o_s", C.c_long),
        ("granulepos", C.c_int64),
        ("packetno", C.c_int64),
    ]


class ogg_page(C.Structure):
    _fields_ = [
        ("header", C.POINTER(C.c_ubyte)),
        ("header_len", C.c_long),
        ("body", C.POINTER(C.c_ubyte)),
        ("body_len", C.c_long),
    ]


class vorbis_info(C.Structure):
    _fields_ = [
        ("version", C.c_int),
        ("channels", C.c_int),
        ("rate", C.c_long),
        ("bitrate_upper", C.c_long),
        ("bitrate_nominal", C.c_long),
        ("bitrate_lower", C.c_long),
        ("bitrate_window", C.c_long),
        ("codec_setup", C.c_void_p),
    ]


class vorbis_comment(C.Structure):
    _fields_ = [
        ("user_comments", C.POINTER(C.c_char_p)),
        ("comment_lengths", C.POINTER(C.c_int)),
        ("comments", C.c_int),
        ("vendor", C.c_char_p),
    ]


def _opaque(nbytes: int):
    return (C.c_ubyte * nbytes)()


# prototypes we rely on
_vorbisfile.ov_fopen.argtypes = [C.c_char_p, C.c_void_p]
_vorbisfile.ov_info.restype = C.POINTER(vorbis_info)
_vorbisfile.ov_pcm_total.restype = C.c_int64
_vorbisfile.ov_pcm_total.argtypes = [C.c_void_p, C.c_int]
_vorbisfile.ov_read.argtypes = [
    C.c_void_p, C.c_char_p, C.c_int, C.c_int, C.c_int, C.c_int,
    C.POINTER(C.c_int),
]
_vorbisfile.ov_read_float.argtypes = [
    C.c_void_p, C.POINTER(C.POINTER(C.POINTER(C.c_float))), C.c_int,
    C.POINTER(C.c_int),
]
_vorbisfile.ov_pcm_seek.argtypes = [C.c_void_p, C.c_int64]
_vorbis.vorbis_analysis_buffer.restype = C.POINTER(C.POINTER(C.c_float))
_vorbisenc.vorbis_encode_init_vbr.argtypes = [
    C.c_void_p, C.c_long, C.c_long, C.c_float,
]
_vorbisenc.vorbis_encode_init.argtypes = [
    C.c_void_p, C.c_long, C.c_long, C.c_long, C.c_long, C.c_long,
]


def encode(
    pcm: np.ndarray,
    rate: int,
    quality: float | None = 0.3,
    bitrates: tuple[int, int, int] | None = None,
    serial: int = 0,
    comments: dict[str, str] | None = None,
    chunk: int = 1024,
) -> bytes:
    """Encode planar float32 PCM [channels, samples] to an Ogg Vorbis stream.

    quality is libvorbis VBR quality in [-0.1, 1.0]; if ``bitrates`` is given
    as (max, nominal, min) it uses managed-bitrate mode instead.
    """
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    assert pcm.ndim == 2
    channels, total = pcm.shape

    vi = _opaque(512)
    _vorbis.vorbis_info_init(vi)
    if bitrates is not None:
        mx, nom, mn = bitrates
        r = _vorbisenc.vorbis_encode_init(vi, channels, rate, mx, nom, mn)
    else:
        r = _vorbisenc.vorbis_encode_init_vbr(vi, channels, rate, float(quality))
    if r != 0:
        raise RuntimeError(f"vorbis_encode_init failed: {r}")

    vc = vorbis_comment()
    _vorbis.vorbis_comment_init(C.byref(vc))
    for k, v in (comments or {"ENCODER": "lewton_tpu corpus"}).items():
        _vorbis.vorbis_comment_add_tag(C.byref(vc), k.encode(), v.encode())

    vd = _opaque(8192)
    vb = _opaque(8192)
    if _vorbis.vorbis_analysis_init(vd, vi) != 0:
        raise RuntimeError("vorbis_analysis_init failed")
    _vorbis.vorbis_block_init(vd, vb)

    osz = _opaque(4096)
    _ogg.ogg_stream_init(osz, serial)

    out = bytearray()
    og = ogg_page()

    def pages(flush: bool) -> None:
        fn = _ogg.ogg_stream_flush if flush else _ogg.ogg_stream_pageout
        while fn(osz, C.byref(og)) != 0:
            out.extend(C.string_at(og.header, og.header_len))
            out.extend(C.string_at(og.body, og.body_len))

    op = ogg_packet()
    op_comm = ogg_packet()
    op_code = ogg_packet()
    _vorbis.vorbis_analysis_headerout(
        vd, C.byref(vc), C.byref(op), C.byref(op_comm), C.byref(op_code)
    )
    _ogg.ogg_stream_packetin(osz, C.byref(op))
    _ogg.ogg_stream_packetin(osz, C.byref(op_comm))
    _ogg.ogg_stream_packetin(osz, C.byref(op_code))
    pages(flush=True)  # headers end on their own page (spec requirement)

    pos = 0
    done_feeding = False
    while True:
        if not done_feeding:
            n = min(chunk, total - pos)
            if n > 0:
                buf = _vorbis.vorbis_analysis_buffer(vd, n)
                for ch in range(channels):
                    C.memmove(
                        buf[ch],
                        pcm[ch, pos : pos + n].ctypes.data,
                        n * 4,
                    )
                _vorbis.vorbis_analysis_wrote(vd, n)
                pos += n
            else:
                _vorbis.vorbis_analysis_wrote(vd, 0)  # EOS
                done_feeding = True
        progressed = False
        while _vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            progressed = True
            _vorbis.vorbis_analysis(vb, None)
            _vorbis.vorbis_bitrate_addblock(vb)
            opk = ogg_packet()
            while _vorbis.vorbis_bitrate_flushpacket(vd, C.byref(opk)) == 1:
                _ogg.ogg_stream_packetin(osz, C.byref(opk))
                pages(flush=False)
        if done_feeding and not progressed:
            break
    pages(flush=True)

    _ogg.ogg_stream_clear(osz)
    _vorbis.vorbis_block_clear(vb)
    _vorbis.vorbis_dsp_clear(vd)
    _vorbis.vorbis_comment_clear(C.byref(vc))
    _vorbis.vorbis_info_clear(vi)
    return bytes(out)


class RefDecoder:
    """Golden decoder via libvorbisfile (ov_*)."""

    def __init__(self, path: str):
        self._vf = _opaque(8192)
        r = _vorbisfile.ov_fopen(path.encode(), self._vf)
        if r != 0:
            raise RuntimeError(f"ov_fopen({path}) failed: {r}")
        self._open = True

    def info(self, link: int = -1) -> tuple[int, int]:
        vi = _vorbisfile.ov_info(self._vf, link)
        return vi.contents.channels, vi.contents.rate

    def read_all_i16(self) -> np.ndarray:
        """Decode the whole (possibly chained) file to interleaved i16
        [samples, channels]. Assumes constant channel count across links."""
        channels, _ = self.info()
        chunks = []
        buf = C.create_string_buffer(65536)
        bs = C.c_int(0)
        while True:
            n = _vorbisfile.ov_read(self._vf, buf, 65536, 0, 2, 1, C.byref(bs))
            if n == 0:
                break
            if n < 0:
                raise RuntimeError(f"ov_read error {n}")
            chunks.append(np.frombuffer(buf.raw[:n], dtype="<i2").copy())
        flat = (
            np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int16)
        )
        return flat.reshape(-1, channels)

    def read_all_f32(self) -> np.ndarray:
        """Decode to planar float32 [channels, samples]."""
        channels, _ = self.info()
        cols = []
        pcm = C.POINTER(C.POINTER(C.c_float))()
        bs = C.c_int(0)
        while True:
            n = _vorbisfile.ov_read_float(self._vf, C.byref(pcm), 4096, C.byref(bs))
            if n == 0:
                break
            if n < 0:
                raise RuntimeError(f"ov_read_float error {n}")
            block = np.empty((channels, n), dtype=np.float32)
            for ch in range(channels):
                block[ch] = np.ctypeslib.as_array(pcm[ch], shape=(n,))
            cols.append(block)
        return (
            np.concatenate(cols, axis=1)
            if cols
            else np.zeros((channels, 0), dtype=np.float32)
        )

    def pcm_total(self, link: int = -1) -> int:
        return _vorbisfile.ov_pcm_total(self._vf, link)

    def pcm_seek(self, pos: int) -> None:
        r = _vorbisfile.ov_pcm_seek(self._vf, pos)
        if r != 0:
            raise RuntimeError(f"ov_pcm_seek error {r}")

    def close(self) -> None:
        if self._open:
            _vorbisfile.ov_clear(self._vf)
            self._open = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def decode_file_i16(path: str) -> np.ndarray:
    with RefDecoder(path) as d:
        return d.read_all_i16()
