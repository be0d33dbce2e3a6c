"""StreamingScheduler: batched many-stream serving equals offline decode."""

import os

import numpy as np

from lewton_tpu.inside_ogg import OggStreamReader
from lewton_tpu.serve import StreamingScheduler


def test_scheduler_matches_offline(corpus_dir):
    files = {
        "a": "stereo_44k_q3.ogg",
        "b": "stereo_44k_q3.ogg",  # same setup group as a
        "c": "mono_8k_q-1.ogg",    # different group
    }
    sched = StreamingScheduler(capacity=4, chunk=16)
    for sid, name in files.items():
        with open(os.path.join(corpus_dir, name), "rb") as f:
            sched.add_stream(sid, f.read())
    got = {sid: [] for sid in files}
    while sched.step():
        for sid in files:
            got[sid].append(sched.poll(sid))
    for sid in files:
        got[sid].append(sched.poll(sid))
        assert sched.is_done(sid)
    for sid, name in files.items():
        want = OggStreamReader(
            os.path.join(corpus_dir, name), backend="numpy").read_all_i16()
        out = np.concatenate(got[sid], axis=0)
        assert out.shape == want.shape, sid
        d = np.abs(out.astype(np.int32) - want.astype(np.int32))
        assert d.max() <= 1, sid


def test_scheduler_add_remove_slots(corpus_dir):
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    data = open(path, "rb").read()
    sched = StreamingScheduler(capacity=2, chunk=8)
    sched.add_stream(1, data)
    sched.add_stream(2, data)
    while sched.step():
        pass
    a = sched.poll(1)
    sched.remove_stream(1)
    # slot freed: a third stream fits and decodes identically
    sched.add_stream(3, data)
    while sched.step():
        pass
    b = sched.poll(3)
    np.testing.assert_array_equal(a, b)


def test_scheduler_incremental_feed(corpus_dir):
    """Bytes fed in arbitrary chunks decode identically to offline."""
    import random

    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    data = open(path, "rb").read()
    sched = StreamingScheduler(capacity=2, chunk=16)
    sched.add_stream("s", None)
    rng = random.Random(9)
    got = []
    i = 0
    while i < len(data):
        step = rng.randint(200, 4000)
        sched.feed("s", data[i : i + step])
        i += step
        sched.step()
        got.append(sched.poll("s"))
    while sched.step():
        pass
    got.append(sched.poll("s"))
    assert sched.is_done("s")
    out = np.concatenate([g for g in got if g.size], axis=0)
    want = OggStreamReader(path, backend="numpy").read_all_i16()
    assert out.shape == want.shape
    assert np.abs(out.astype(np.int32) - want.astype(np.int32)).max() <= 1


def _repage(data: bytes, ident: bytes | None = None,
            inject_empty_at: int | None = None) -> bytes:
    """Demux a valid stream and rebuild its pages (correct CRCs), optionally
    swapping the ident packet and/or injecting an empty (undecodable)
    audio packet at the given audio-packet index."""
    from lewton_tpu.ogg import PacketReader
    from tools.floor0_stream import ogg_page

    r = PacketReader(data)
    pcks = []
    while (p := r.read_packet()) is not None:
        pcks.append(p)
    serial = pcks[0].stream_serial
    headers = [p.data for p in pcks[:3]]
    end_granule = pcks[-1].absgp_page  # original stream length (truncated)
    if ident is not None:
        headers[0] = ident
    audio = [p.data for p in pcks[3:]]
    if inject_empty_at is not None:
        audio = (audio[:inject_empty_at] + [b""] + audio[inject_empty_at:])
    # cumulative sample counts (mode+window flags only, no decode); empty
    # packets contribute nothing, the first real packet primes the window
    from lewton_tpu.audio import get_decoded_sample_count
    from lewton_tpu.header import read_header_ident, read_header_setup

    ih = read_header_ident(headers[0])
    sh = read_header_setup(headers[2], ih)
    cum, started, cums = 0, False, []
    for p in audio:
        if p:
            if started:
                cum += get_decoded_sample_count(ih, sh, p)
            started = True
        cums.append(cum)
    pages = [ogg_page(serial, 0, 0, [headers[0]], bos=True),
             ogg_page(serial, 1, 0, headers[1:3])]
    per_page, seq = 6, 2
    for i in range(0, len(audio), per_page):
        chunk = audio[i : i + per_page]
        eos = i + per_page >= len(audio)
        gr = end_granule if eos else cums[i + len(chunk) - 1]
        pages.append(ogg_page(serial, seq, gr, chunk, eos=eos))
        seq += 1
    return b"".join(pages)


def test_scheduler_groups_keyed_by_ident_and_setup(corpus_dir):
    """Byte-identical setup packets with DIFFERENT ident headers must not
    share a group: the group's CompiledSetup bakes in the ident geometry
    (blocksizes, rate, channels), so sharing would decode the second
    stream with the wrong compiled setup."""
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    data = open(path, "rb").read()
    a = _repage(data)
    # Patch only the ident's sample-rate field (bytes 12..16): the setup
    # packet stays byte-identical and PCM is unaffected (rate is playback
    # metadata), isolating the group-keying behavior.
    from lewton_tpu.ogg import PacketReader

    ident = PacketReader(data).read_packet().data
    b_ident = ident[:12] + (32000).to_bytes(4, "little") + ident[16:]
    b = _repage(data, ident=b_ident)

    sched = StreamingScheduler(capacity=2, chunk=8)
    sched.add_stream("a", a)
    sched.add_stream("b", b)
    while sched.step():
        pass
    out_a, out_b = sched.poll("a"), sched.poll("b")
    assert out_a.size and out_b.size
    np.testing.assert_array_equal(out_a, out_b)
    assert len(sched.groups) == 2, \
        "distinct ident headers must get distinct groups"


def test_scheduler_survives_undecodable_packet(corpus_dir):
    """A hostile/corrupt packet in one stream must not crash the scheduler
    or stall other streams: the packet is skipped, recorded in
    stream_errors, and the stream's remaining audio still decodes."""
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    data = open(path, "rb").read()
    from lewton_tpu.ogg import PacketReader

    r = PacketReader(data)
    n_audio = -3
    while r.read_packet() is not None:
        n_audio += 1
    bad_at = n_audio // 2
    corrupted = _repage(data, inject_empty_at=bad_at)

    sched = StreamingScheduler(capacity=2, chunk=8)
    sched.add_stream("ok", data)
    sched.add_stream("bad", corrupted)
    while sched.step():
        pass
    out_ok = sched.poll("ok")
    out_bad = sched.poll("bad")
    errs = sched.stream_errors("bad")
    assert len(errs) == 1 and errs[0][0] == bad_at
    assert sched.stream_errors("ok") == []
    # the skipped packet contributes nothing; all other audio matches
    # (device pipeline vs numpy reference: +/-1 LSB, as elsewhere)
    want = OggStreamReader(path, backend="numpy").read_all_i16()
    assert out_ok.shape == want.shape
    assert np.abs(out_ok.astype(np.int32) - want.astype(np.int32)).max() <= 1
    assert out_bad.shape == want.shape
    np.testing.assert_array_equal(out_bad, out_ok)


def test_scheduler_group_overflow_spawns_new_group(corpus_dir):
    """More streams than one group's capacity: a second group forms."""
    data = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()
    sched = StreamingScheduler(capacity=2, chunk=8)
    for sid in range(5):
        sched.add_stream(sid, data)
    while sched.step():
        pass
    outs = [sched.poll(sid) for sid in range(5)]
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    assert len(next(iter(sched.groups.values()))) == 3  # ceil(5/2)


def test_is_done_waits_for_inflight_pcm(corpus_dir):
    """A stream whose final chunk is still in the pipeline (kept inflight
    while ANOTHER group has pending work) must not report done — a caller
    stopping at is_done would drop the last chunk's PCM."""
    small = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()
    big = open(os.path.join(corpus_dir, "mono_8k_q-1.ogg"), "rb").read()
    sched = StreamingScheduler(capacity=2, chunk=8)
    sched.add_stream("small", small)   # its group finishes first
    sched.add_stream("big", big)       # DIFFERENT group, keeps stepping
    got = []
    stopped = False
    while sched.step():
        got.append(sched.poll("small"))
        if sched.is_done("small"):
            stopped = True   # caller is allowed to stop here for good
            break
    if not stopped:
        got.append(sched.poll("small"))
        assert sched.is_done("small")
    want = OggStreamReader(small, backend="numpy").read_all_i16()
    out = np.concatenate([g for g in got if g.size] or
                         [np.zeros((0, want.shape[1]), np.int16)], axis=0)
    # is_done True must imply ALL PCM was pollable (the device path is
    # allowed the usual 1 LSB vs the numpy oracle)
    assert out.shape == want.shape
    assert np.abs(out.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_remove_pending_stream():
    """Removing a stream whose headers never completed must unregister it
    cleanly (not KeyError)."""
    sched = StreamingScheduler(capacity=2, chunk=8)
    sched.add_stream("half")           # no bytes at all
    sched.feed("half", b"OggS\x00")    # partial page
    sched.remove_stream("half")
    assert "half" not in sched.pending
    sched.add_stream("half")           # id reusable after removal


def test_scheduler_scan_matches_per_chunk(corpus_dir):
    """scan=N (N sub-chunks per device dispatch via lax.scan) must
    bit-match the per-chunk scheduler, including tail steps that fall
    back to single-chunk dispatch and error bookkeeping offsets."""
    files = {"a": "stereo_44k_q3.ogg", "b": "mono_8k_q-1.ogg"}
    outs = {}
    for scan in (1, 3):
        sched = StreamingScheduler(capacity=2, chunk=16, scan=scan)
        for sid, name in files.items():
            with open(os.path.join(corpus_dir, name), "rb") as f:
                sched.add_stream(sid, f.read())
        got = {sid: [] for sid in files}
        while sched.step():
            for sid in files:
                got[sid].append(sched.poll(sid))
        for sid in files:
            got[sid].append(sched.poll(sid))
            assert sched.is_done(sid)
        outs[scan] = {sid: np.concatenate(got[sid], axis=0)
                      for sid in files}
    for sid in files:
        np.testing.assert_array_equal(outs[1][sid], outs[3][sid])


def test_scheduler_latency_stats(corpus_dir):
    """latency_stats(): retired completed streams report first-PCM and
    turnaround percentiles; first_pcm <= turnaround, all positive, and
    the window stays bounded (deque maxlen)."""
    data = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()
    sched = StreamingScheduler(capacity=4, chunk=8)
    assert sched.latency_stats() == {}  # nothing retired yet
    for i in range(6):
        sched.add_stream(i, data)
    while sched.step():
        pass
    for i in range(6):
        sched.poll(i)
        assert sched.is_done(i)
        sched.remove_stream(i)
    st = sched.latency_stats()
    assert st["streams"] == 6
    for row in (st["first_pcm"], st["turnaround"]):
        assert 0 < row["p50_s"] <= row["p95_s"] <= row["p99_s"] <= row["max_s"]
    assert st["first_pcm"]["p50_s"] <= st["turnaround"]["p50_s"] + 1e-9
    assert st["turnaround"]["max_s"] < 60.0  # sanity: seconds, not stamps
