"""High-level Ogg/Vorbis stream API.

`OggStreamReader` mirrors the reference's `inside_ogg::OggStreamReader`
surface (lewton src/inside_ogg.rs:66-314): header reading with serial
filtering, per-packet decode, chained-stream re-initialization, end-of-stream
truncation to the page granule, linear sample skip and page-granularity seek.

The decode backend is pluggable: ``backend="numpy"`` uses the pure reference
synthesis, ``backend="jax"`` routes the numeric half through the TPU device
pipeline (see lewton_tpu.models.decoder).
"""

from __future__ import annotations

import io

import numpy as np

from . import samples as samples_mod
from .audio import (
    PreviousWindowRight,
    get_decoded_sample_count,
    read_audio_packet_generic,
)
from .errors import OggError, VorbisError
from .header import (
    HeaderSet,
    read_header_comment,
    read_header_ident,
    read_header_setup,
)
from .ogg import Packet, PacketReader

__all__ = ["read_headers", "OggStreamReader"]


def read_headers(rdr: PacketReader) -> tuple[HeaderSet, int]:
    """Read the three Vorbis headers; skips packets of other serials
    (ref: lewton src/inside_ogg.rs:30-51)."""
    pck = rdr.read_packet_expected()
    ident = read_header_ident(pck.data)
    serial = pck.stream_serial
    raw_ident = pck.data

    pck = rdr.read_packet_expected()
    while pck.stream_serial != serial:
        pck = rdr.read_packet_expected()
    comment = read_header_comment(pck.data)

    pck = rdr.read_packet_expected()
    while pck.stream_serial != serial:
        pck = rdr.read_packet_expected()
    setup = read_header_setup(pck.data, ident)

    rdr.delete_unread_packets()
    hs = HeaderSet(ident, comment, setup)
    hs.raw_ident = raw_ident
    hs.raw_setup = pck.data
    return hs, serial


class OggStreamReader:
    """Reads and decodes a (possibly chained) Ogg Vorbis stream."""

    def __init__(self, source, backend: str = "numpy"):
        if isinstance(source, (str, bytes, bytearray, memoryview)):
            if isinstance(source, str):
                with open(source, "rb") as f:
                    source = f.read()
            self.rdr = self._make_reader(bytes(source))
        elif hasattr(source, "read_packet"):
            self.rdr = source
        else:
            self.rdr = self._make_reader(source.read())
        # Light header read: ident + comment parse eagerly, setup lazily —
        # the codebook/Huffman build is the expensive part and the native
        # backend has its own (the C++ parse). `setup_hdr` is a property.
        pck = self.rdr.read_packet_expected()
        self.ident_hdr = read_header_ident(pck.data)
        serial = pck.stream_serial
        raw_ident = pck.data
        pck = self.rdr.read_packet_expected()
        while pck.stream_serial != serial:
            pck = self.rdr.read_packet_expected()
        self.comment_hdr = read_header_comment(pck.data)
        pck = self.rdr.read_packet_expected()
        while pck.stream_serial != serial:
            pck = self.rdr.read_packet_expected()
        self.rdr.delete_unread_packets()
        self._setup_hdr = None
        self._raw_headers = (raw_ident, pck.data)
        self.stream_serial = serial
        self.pwr = PreviousWindowRight()
        self._native_dec = None
        self._jax_dec = None
        self._decode_started = False
        # Deliberate improvement over the reference: start granule tracking
        # at 0 so end-of-stream truncation works even when all audio sits on
        # a single page (the reference only learns absgp at the first page
        # boundary and would emit the encoder's padding samples there;
        # libvorbis truncates — we match libvorbis).
        self.cur_absgp: int | None = 0
        self.backend = backend
        #: set by read_next_audio_packet when a chained-stream re-init just
        #: happened; the batch (jax) path uses it to restart its decoder.
        self._fresh_link = False
        #: True until any audio packet is consumed or the reader seeks —
        #: gates the one-call native whole-stream path (read_all_i16)
        self._pristine = True
        #: incremental-feed support for chained streams: when the packet
        #: source can temporarily run dry (async feed), a chain link's
        #: comment/setup packets may not have been fed yet. With
        #: `_resumable_chain` set (aio.AsyncOggStreamReader does), the
        #: re-init pushes the consumed packets back onto `_chain_pending`
        #: and surfaces None ("need more data") instead of raising; the
        #: retry re-runs the re-init from the pushed-back BOS packet.
        self._chain_pending: list = []
        self._resumable_chain = False

    # ------------------------------------------------------------------ #

    @property
    def setup_hdr(self) -> "SetupHeader":
        if self._setup_hdr is None:
            self._setup_hdr = read_header_setup(
                self._raw_headers[1], self.ident_hdr
            )
        return self._setup_hdr

    @setup_hdr.setter
    def setup_hdr(self, value) -> None:
        self._setup_hdr = value

    @staticmethod
    def _make_reader(data: bytes):
        """Prefer the native (C++) demuxer when built — identical packets
        (parity-tested), ~7x faster page parse."""
        from . import native

        try:
            if native.available():
                return native.NativePacketReader(data)
        except Exception:  # noqa: BLE001 — fall back to the reference demux
            pass
        return PacketReader(data)

    def _decode(self, packet: bytes) -> np.ndarray:
        """Decode one packet to planar f32 [ch, out]."""
        self._decode_started = True
        if self.backend == "native":
            if self._native_dec is None:
                from . import native

                self._native_dec = native.NativeDecoder(*self._raw_headers)
            return self._native_dec.decode(packet)
        if self.backend == "jax":
            # Per-packet device decode: a persistent 1-packet-chunk
            # StreamDecoder carries window state across calls. Correct but
            # dispatch-latency-bound — for throughput use read_all_* /
            # BatchDecoder, which amortize over whole chunks.
            if self._jax_dec is None:
                from .models.decoder import StreamDecoder

                self._jax_dec = StreamDecoder(
                    self.ident_hdr, self.setup_hdr, chunk=1,
                    raw_headers=self._raw_headers,
                )
            return self._jax_dec.decode_packets([packet])[0]
        return read_audio_packet_generic(
            self.ident_hdr, self.setup_hdr, packet, self.pwr, fmt="planar_f32"
        )

    def _clear_backend_decoders(self) -> None:
        """Drop per-setup decoder instances (chained-stream re-init)."""
        self._native_dec = None
        self._jax_dec = None

    def _reset_decode_state(self) -> None:
        """Reset the inter-packet window state (all backends)."""
        self.pwr = PreviousWindowRight()
        if self._native_dec is not None:
            self._native_dec.reset()
        if self._jax_dec is not None:
            self._jax_dec.reset()
        self._decode_started = False

    def _next_raw_packet(self) -> Packet | None:
        if self._chain_pending:
            return self._chain_pending.pop(0)
        return self.rdr.read_packet()

    def _chain_starved(self, consumed: list) -> None:
        """A chain link's header packets are split across input that has
        not been fed yet. Resumable (async) readers push the consumed
        packets back and report 'need more data'; on a complete stream
        this is truncation mid-chain-headers, an error (ref parity:
        read_packet_expected, lewton src/inside_ogg.rs:129-137)."""
        if self._resumable_chain:
            self._chain_pending = consumed + self._chain_pending
            return None
        raise OggError("unexpected end of ogg stream")

    def read_next_audio_packet(self) -> Packet | None:
        """Next audio packet of the current stream; handles chained-ogg
        re-init (ref: lewton src/inside_ogg.rs:114-158)."""
        self._pristine = False
        while True:
            pck = self._next_raw_packet()
            if pck is None:
                return None
            if pck.stream_serial == self.stream_serial:
                return pck
            if pck.first_in_stream:
                # Chained ogg: re-read headers, reset state. The first audio
                # packet of the new link is returned as a normal packet; with
                # an empty window it decodes to 0 samples, which is exactly
                # the reference's "prime and discard" behavior
                # (lewton src/inside_ogg.rs:121-154) without a special path.
                # State only mutates once all three header packets are in
                # hand, so a starved re-init is safely retryable.
                ident = read_header_ident(pck.data)
                pck2 = self._next_raw_packet()
                if pck2 is None:
                    return self._chain_starved([pck])
                comment = read_header_comment(pck2.data)
                pck3 = self._next_raw_packet()
                if pck3 is None:
                    return self._chain_starved([pck, pck2])
                self.ident_hdr = ident
                self.comment_hdr = comment
                self._setup_hdr = None  # lazy parse (see setup_hdr property)
                self._raw_headers = (pck.data, pck3.data)
                self._clear_backend_decoders()  # new link, new setup tables
                self._reset_decode_state()
                self.stream_serial = pck3.stream_serial
                # granule positions restart at 0 in each chain link
                self.cur_absgp = 0
                self._fresh_link = True
                return self.rdr.read_packet()
            # else: ignore packets of unrelated multiplexed streams

    def _apply_absgp(self, pck: Packet, decoded: np.ndarray) -> np.ndarray:
        """End-of-stream truncation + absgp bookkeeping on a decoded packet
        (ref: lewton src/inside_ogg.rs:209-229)."""
        if self.cur_absgp is not None and pck.last_in_stream:
            target = max(0, (pck.absgp_page or 0) - self.cur_absgp)
            decoded = decoded[:, :target]
        if pck.last_in_page and pck.absgp_page is not None:
            self.cur_absgp = pck.absgp_page
        elif self.cur_absgp is not None:
            self.cur_absgp += decoded.shape[1]
        return decoded

    def dec_packet_planar_f32(self, pck: Packet) -> np.ndarray:
        return self._apply_absgp(pck, self._decode(pck.data))

    def read_dec_packet_generic(self, fmt: str = "planar_i16") -> np.ndarray | None:
        pck = self.read_next_audio_packet()
        if pck is None:
            return None
        return getattr(samples_mod, fmt)(self.dec_packet_planar_f32(pck))

    def read_dec_packet(self) -> np.ndarray | None:
        """Planar i16 [ch, n] (ref: read_dec_packet)."""
        return self.read_dec_packet_generic("planar_i16")

    def read_dec_packet_itl(self) -> np.ndarray | None:
        """Interleaved i16 [n*ch] (ref: read_dec_packet_itl)."""
        return self.read_dec_packet_generic("interleaved_i16")

    def read_all_planar_f32(self) -> np.ndarray:
        """Decode the whole stream to planar f32 [ch, samples].

        With ``backend="jax"`` the numeric half runs as the batched device
        pipeline (host entropy decode -> chunked `decode_frames`); the
        ``"numpy"`` backend decodes packet by packet.
        """
        if self.backend == "jax":
            return self._read_all_jax()
        if self.backend == "native":
            return self._read_all_native()
        chunks = []
        while (pck := self.read_next_audio_packet()) is not None:
            chunks.append(self.dec_packet_planar_f32(pck))
        if not chunks:
            return np.zeros((self.ident_hdr.channels, 0), np.float32)
        # chained links may change the channel count; pad to the widest
        # (same layout as the jax/native whole-stream paths)
        ch = max(c.shape[0] for c in chunks)
        chunks = [
            c if c.shape[0] == ch else np.pad(c, [(0, ch - c.shape[0]), (0, 0)])
            for c in chunks
        ]
        return np.concatenate(chunks, axis=1)

    def _read_all_buffered(self, make_dec, decode_buf,
                           empty_dtype=np.float32) -> np.ndarray:
        """Shared whole-stream loop for the batching back-ends (native and
        jax decode whole buffers per chain link).

        Granule bookkeeping (_apply_absgp) is stateful and RESTARTS at 0
        in every chain link, while read_next_audio_packet's re-init
        mutates that state BEFORE the loop sees the new link's first
        packet — so buffered packets must flush at their link's EOS
        packet, not when the next link is detected (flushing after the
        re-init applied link 1's granules on link 2's restarted clock and
        over-truncated the next link's EOS packet)."""
        outs: list[np.ndarray] = []
        dec = make_dec()
        buf: list[Packet] = []

        def flush(d):
            if not buf:
                return
            for pck, pcm in zip(buf, decode_buf(d, [p.data for p in buf])):
                outs.append(self._apply_absgp(pck, pcm))
            buf.clear()

        while (pck := self.read_next_audio_packet()) is not None:
            if self._fresh_link:
                if buf:  # malformed chain: previous link had no EOS page
                    flush(dec)
                    self.cur_absgp = 0  # granules restart per link
                dec = make_dec()
                self._fresh_link = False
            buf.append(pck)
            if pck.last_in_stream:
                flush(dec)  # link ends here: apply absgp BEFORE re-init
        flush(dec)
        if not outs:
            return np.zeros((self.ident_hdr.channels, 0), empty_dtype)
        # chained links may change the channel count; pad to the widest
        # (reference emits per-packet, we concatenate)
        ch = max(o.shape[0] for o in outs)
        outs = [
            o if o.shape[0] == ch
            else np.pad(o, [(0, ch - o.shape[0]), (0, 0)])
            for o in outs
        ]
        return np.concatenate(outs, axis=1)

    def _read_all_native(self) -> np.ndarray:
        """Whole-stream decode through one native call per chain link."""
        from . import native

        def decode_buf(d, datas):
            pcm, lens = d.decode_many(datas)
            ch = d.channels
            flat = pcm.reshape(len(datas), -1)
            pcms = []
            for i in range(len(datas)):
                n = int(lens[i])
                if n < 0:
                    from .errors import AudioBadFormat

                    raise AudioBadFormat("undecodable packet")
                # rows are packed [C, n] at the packet's own length
                pcms.append(flat[i, : ch * n].reshape(ch, n))
            return pcms

        return self._read_all_buffered(
            lambda: native.NativeDecoder(*self._raw_headers), decode_buf)

    def _read_all_jax(self, i16: bool = False) -> np.ndarray:
        from .models.decoder import StreamDecoder

        def decode_buf(d, datas):
            return (d.decode_packets_i16(datas) if i16
                    else d.decode_packets(datas))

        return self._read_all_buffered(
            lambda: StreamDecoder(self.ident_hdr, self.setup_hdr,
                                  raw_headers=self._raw_headers),
            decode_buf, np.int16 if i16 else np.float32)

    def read_all_i16(self) -> np.ndarray:
        """Convenience: decode the whole stream to interleaved i16
        [samples, channels]. Chained links that change the channel count
        are padded to the widest link (planar layout rules).

        With ``backend="jax"`` the i16 conversion happens on device in the
        fused overlap+i16 pass (absgp truncation only drops samples, so
        truncating the i16 rows is equivalent to truncating f32 first).

        With ``backend="native"`` on a fresh reader the whole decode runs
        as ONE native call (demux -> chained headers -> synthesis -> i16;
        native/lt_file.cc) — the per-packet Python loop costs more wall
        time than the C++ decode itself. Streams the fast path cannot
        represent (chain links changing channel count or growing the
        blocksize) fall back to the loop below, identical output."""
        if self.backend == "jax":
            return self._read_all_jax(i16=True).T
        if self.backend == "native" and self._pristine:
            from . import native

            if isinstance(self.rdr, native.NativePacketReader):
                res = native.decode_ogg_i16(
                    self.rdr._data, self.ident_hdr.channels,
                    1 << self.ident_hdr.blocksize_1)
                if res is not None:
                    pcm, absgp = res
                    self.rdr._i = len(self.rdr._pcks)  # stream consumed
                    self.cur_absgp = absgp
                    self._pristine = False
                    return pcm.T
        return samples_mod.to_i16(self.read_all_planar_f32()).T

    # ------------------------------------------------------------------ #

    def skip_samples_linear(self, to_skip: int, fmt: str = "planar_i16"):
        """Skip cheaply using sample counts only; decodes just the packet
        before the target (to re-prime pwr) and the target packet
        (ref: lewton src/inside_ogg.rs:244-283).

        Returns (decoded_packet_or_None, leftover_to_skip).
        """
        last_pck: Packet | None = None
        # A packet decoded against an empty window emits 0 samples; count it
        # as such so skip positions are sample-accurate from stream start
        # (deliberate fix of a reference quirk — lewton counts the first
        # packet's nominal length, see its get_decoded_sample_count docs).
        first_primes = not self._decode_started
        while True:
            next_pck = self.read_next_audio_packet()
            if next_pck is None:
                return None, to_skip
            if self._fresh_link:
                # a chain link's first packet decodes to 0 samples against
                # the freshly reset window, so it must count as the link's
                # primer, not its nominal length (the reference decodes-
                # and-discards it inside the re-init, inside_ogg.rs:
                # 149-155); this also prevents an OLD-link last_pck from
                # re-priming the new link's window below
                self._fresh_link = False
                first_primes = True
            sample_cnt = get_decoded_sample_count(
                self.ident_hdr, self.setup_hdr, next_pck.data
            )
            if first_primes:
                sample_cnt = 0
                first_primes = False
                last_pck = next_pck
                self._decode(next_pck.data)  # prime the window
                continue
            if self.cur_absgp is not None and next_pck.last_in_stream:
                last_pck = None
                target = max(0, (next_pck.absgp_page or 0) - self.cur_absgp)
                sample_cnt = min(sample_cnt, target)
            if to_skip < sample_cnt:
                if last_pck is not None:
                    self._reset_decode_state()
                    self._decode(last_pck.data)
                decoded = self.dec_packet_planar_f32(next_pck)
                return getattr(samples_mod, fmt)(decoded), to_skip
            to_skip -= sample_cnt
            if self.cur_absgp is not None:
                self.cur_absgp += sample_cnt
            last_pck = next_pck

    def get_last_absgp(self) -> int | None:
        return self.cur_absgp

    # ------------------------------------------------------------------ #
    # Checkpoint/resume: the resumable decode state is exactly the window
    # carry + granule position (SURVEY.md §5 "checkpoint/resume"; ref state
    # is PreviousWindowRight + cur_absgp, lewton src/inside_ogg.rs:67-76).

    def save_decode_state(self) -> dict:
        """Snapshot (window carry, granule). Does not capture the container
        read position — pair with your own byte offset for full resume."""
        state = {"cur_absgp": self.cur_absgp, "backend": self.backend,
                 "started": self._decode_started}
        if self.backend == "native" and self._native_dec is not None:
            state["native"] = self._native_dec.save_state()
        elif self.backend == "jax" and self._jax_dec is not None:
            state["jax"] = self._jax_dec.save_state()
        else:
            state["pwr"] = (
                None if self.pwr.data is None else self.pwr.data.copy()
            )
        return state

    def restore_decode_state(self, state: dict) -> None:
        self.cur_absgp = state["cur_absgp"]
        self._decode_started = state["started"]
        if "native" in state:
            if self._native_dec is None:
                from . import native

                self._native_dec = native.NativeDecoder(*self._raw_headers)
            self._native_dec.load_state(state["native"])
        elif "jax" in state:
            if self._jax_dec is None:
                from .models.decoder import StreamDecoder

                self._jax_dec = StreamDecoder(
                    self.ident_hdr, self.setup_hdr, chunk=1,
                    raw_headers=self._raw_headers,
                )
            self._jax_dec.load_state(state["jax"])
        else:
            self.pwr = PreviousWindowRight(
                None if state.get("pwr") is None else state["pwr"].copy()
            )
            # a state saved BEFORE any decode carries no backend snapshot:
            # reset any live decoder back to the fresh-window state
            if self._jax_dec is not None:
                self._jax_dec.reset()
            if self._native_dec is not None and self.backend == "native":
                self._native_dec.reset()

    def seek_absgp_pg(self, absgp: int) -> None:
        """Page-granularity seek; resets decode state
        (ref: lewton src/inside_ogg.rs:307-313)."""
        self._pristine = False
        self.rdr.seek_absgp(absgp)
        self.cur_absgp = None
        self._reset_decode_state()
