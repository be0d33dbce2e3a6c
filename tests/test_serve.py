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
