"""Multi-host window sharding: shard selection, byte allgather, and
deterministic stitching (SURVEY.md §5.8 — the layer the reference lacks;
its wrapper chunks targets *sequentially*, scripts/racon_wrapper.py:86-148).
"""

import numpy as np
import pytest

from racon_tpu.parallel import mesh as M


DATA = "/root/reference/test/data"


def test_allgather_bytes_two_shards(monkeypatch):
    """Emulate two processes: process_allgather is replaced by a fake that
    stacks both shards' contributions in call order (dims, idx, lens, buf)."""
    pieces0 = [(0, b"AC"), (2, b"GGTT")]
    pieces1 = [(1, b"T")]

    # precompute shard 1's arrays exactly as allgather_bytes builds them
    def arrays(pieces, n_pad, l_pad):
        idx = np.full((n_pad,), -1, np.int32)
        lens = np.zeros((n_pad,), np.int32)
        buf = np.zeros((n_pad, max(l_pad, 1)), np.uint8)
        for j, (i, b) in enumerate(pieces):
            idx[j] = i
            lens[j] = len(b)
            buf[j, :len(b)] = np.frombuffer(b, np.uint8)
        return idx, lens, buf

    calls = []

    class FakeMultihost:
        @staticmethod
        def process_allgather(x):
            x = np.asarray(x)
            calls.append(x.shape)
            if x.ndim == 1 and x.shape == (2,) and len(calls) == 1:  # dims
                return np.stack([x, np.asarray([1, 1], np.int32)])
            n_pad, l_pad = 2, 4
            i1, l1, b1 = arrays(pieces1, n_pad, l_pad)
            if x.ndim == 1 and x.dtype == np.int32 and len(calls) == 2:
                return np.stack([x, i1])                  # idx
            if x.ndim == 1:
                return np.stack([x, l1])                  # lens
            return np.stack([x, b1])                      # buf

    import jax.experimental.multihost_utils as mhu
    monkeypatch.setattr(mhu, "process_allgather",
                        FakeMultihost.process_allgather)

    out = M.allgather_bytes(pieces0, shard_id=0, num_shards=2)
    assert out == {0: b"AC", 1: b"T", 2: b"GGTT"}


def test_sharded_polish_matches_unsharded(monkeypatch):
    """Two simulated shards produce the identical stitched FASTA."""
    from racon_tpu.pipeline import PolisherType, create_polisher

    def make():
        p = create_polisher(
            f"{DATA}/sample_reads.fastq.gz", f"{DATA}/sample_overlaps.sam.gz",
            f"{DATA}/sample_layout.fasta.gz",
            PolisherType.kC, 500, 10.0, 0.3, True, 3, -5, -4,
            num_threads=2, engine="native")
        p.initialize()
        # keep it small: polish only the first 8 windows
        p.windows = p.windows[:8]
        return p

    ref = make()
    want = ref.polish(drop_unpolished_sequences=False)

    # simulate shard 0 of 2: windows are dealt round-robin in
    # depth-sorted order (load balancing), so recompute the expected
    # deal with the same rule and inject shard 1's results out-of-band
    p = make()
    other = make()
    order = sorted(range(len(other.windows)),
                   key=lambda i: len(other.windows[i].sequences))
    mine0 = [i for pos, i in enumerate(order) if pos % 2 == 0]
    mine1 = [i for pos, i in enumerate(order) if pos % 2 == 1]
    engine_other = other._make_engine()
    results_other = engine_other.polish_windows(
        [other.windows[i] for i in mine1], other.trim)
    other_pieces = {i: (b"\x01" if pol else b"\x00") + cons
                    for i, (cons, pol) in zip(mine1, results_other)}

    monkeypatch.setattr(M, "process_shard", lambda: (0, 2))
    seen = {}

    def fake_gather(pieces, shard_id, num_shards):
        assert shard_id == 0 and num_shards == 2
        assert [i for i, _ in pieces] == mine0
        seen.update(dict(pieces))
        seen.update(other_pieces)
        return dict(seen)

    monkeypatch.setattr(M, "allgather_bytes", fake_gather)
    got = p.polish(drop_unpolished_sequences=False)

    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a.name == b.name
        assert a.data == b.data
