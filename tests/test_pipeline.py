"""Pipeline-level semantics on small synthetic data: ingest dedup, overlap
filters, kC longest-overlap dedup, kF mode, stitching tags."""

import gzip
import os
import random

import pytest

from racon_tpu.pipeline import PolisherType, create_polisher


def write_fasta(path, seqs):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for name, data in seqs:
            f.write(f">{name}\n{data}\n")


def write_fastq(path, seqs):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for name, data, qual in seqs:
            f.write(f"@{name}\n{data}\n+\n{qual}\n")


def write_paf(path, rows):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "wt") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def noisy(s, rate, rng):
    out = []
    for c in s:
        r = rng.random()
        if r < rate / 3:
            continue
        elif r < 2 * rate / 3:
            out.append(rng.choice("ACGT"))
            out.append(c)
        elif r < rate:
            out.append(rng.choice("ACGT"))
        else:
            out.append(c)
    return "".join(out)


@pytest.fixture
def synth(tmp_path):
    rng = random.Random(11)
    true = "".join(rng.choice("ACGT") for _ in range(400))
    target = noisy(true, 0.08, rng)
    reads = [noisy(true, 0.08, rng) for _ in range(8)]

    tpath = str(tmp_path / "target.fasta")
    rpath = str(tmp_path / "reads.fasta")
    opath = str(tmp_path / "ovl.paf")
    write_fasta(tpath, [("ctg", target)])
    write_fasta(rpath, [(str(i + 1), r) for i, r in enumerate(reads)])
    write_paf(opath, [
        (i + 1, len(r), 0, len(r), "+", "ctg", len(target), 0, len(target),
         len(r), len(target), 60)
        for i, r in enumerate(reads)])
    return dict(true=true, target=target, reads=reads,
                tpath=tpath, rpath=rpath, opath=opath)


def test_polish_improves_target(synth):
    from racon_tpu.align.edit_distance import edit_distance
    p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4, 1,
                        engine="oracle")
    p.initialize()
    dst = p.polish(True)
    assert len(dst) == 1
    before = edit_distance(synth["target"].encode(), synth["true"].encode())
    after = edit_distance(dst[0].data, synth["true"].encode())
    assert after < before // 2


def test_output_tags(synth):
    p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4, 1,
                        engine="oracle")
    p.initialize()
    dst = p.polish(True)
    name = dst[0].name
    assert name.startswith("ctg LN:i:")
    assert " RC:i:8 " in name + " "
    assert " XC:f:1.000000" in name


def test_drop_unpolished(tmp_path, synth):
    # a target with no overlaps is dropped unless include_unpolished
    t2 = str(tmp_path / "targets2.fasta")
    write_fasta(t2, [("ctg", synth["target"]), ("orphan", "ACGT" * 50)])
    p = create_polisher(synth["rpath"], synth["opath"], t2,
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4, 1,
                        engine="oracle")
    p.initialize()
    dst = p.polish(True)
    assert len(dst) == 1

    p = create_polisher(synth["rpath"], synth["opath"], t2,
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4, 1,
                        engine="oracle")
    p.initialize()
    dst = p.polish(False)
    assert len(dst) == 2
    assert dst[1].name.startswith("orphan")
    assert " XC:f:0.000000" in dst[1].name


def test_kc_keeps_longest_overlap_per_query(synth):
    # duplicate the first read's overlap with a shorter span; kC keeps longest
    rows = []
    with open(synth["opath"]) as f:
        lines = [l.split("\t") for l in f.read().splitlines()]
    extra = lines[0][:]
    extra[2], extra[3] = "0", "50"   # short overlap for read 1
    extra[7], extra[8] = "0", "50"
    rows = [lines[0], extra] + lines[1:]
    import gzip
    with open(synth["opath"], "w") as f:
        for r in rows:
            f.write("\t".join(r) + "\n")

    p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4, 1,
                        engine="oracle")
    p.initialize()
    # 8 overlaps survive (the short duplicate dropped) -> RC:i:8
    dst = p.polish(True)
    assert " RC:i:8 " in dst[0].name + " "


def test_fragment_correction_mode(tmp_path):
    rng = random.Random(3)
    true = "".join(rng.choice("ACGT") for _ in range(300))
    reads = [noisy(true, 0.1, rng) for _ in range(6)]
    rpath = str(tmp_path / "reads.fasta")
    write_fasta(rpath, [(str(i + 1), r) for i, r in enumerate(reads)])
    # all-vs-all overlaps (dual)
    rows = []
    for i in range(len(reads)):
        for j in range(len(reads)):
            if i == j:
                continue
            rows.append((i + 1, len(reads[i]), 0, len(reads[i]), "+",
                         j + 1, len(reads[j]), 0, len(reads[j]),
                         min(len(reads[i]), len(reads[j])),
                         max(len(reads[i]), len(reads[j])), 60))
    opath = str(tmp_path / "ava.paf")
    write_paf(opath, rows)

    p = create_polisher(rpath, opath, rpath, PolisherType.kF,
                        500, 10.0, 0.3, True, 1, -1, -1, 1, engine="oracle")
    p.initialize()
    dst = p.polish(False)
    assert len(dst) == 6
    # kF output names carry the 'r' marker before the tags
    assert all(d.name.startswith(f"{i + 1}r LN:i:")
               for i, d in enumerate(dst))
    # corrected reads should be closer to truth than raw reads on average
    from racon_tpu.align.edit_distance import edit_distance
    raw = sum(edit_distance(r.encode(), true.encode()) for r in reads)
    cor = sum(edit_distance(d.data, true.encode()) for d in dst)
    assert cor < raw


def test_quality_threshold_filters_layers(tmp_path):
    rng = random.Random(5)
    true = "".join(rng.choice("ACGT") for _ in range(200))
    target = noisy(true, 0.1, rng)
    good = [noisy(true, 0.1, rng) for _ in range(4)]
    bad = [noisy(true, 0.4, rng) for _ in range(4)]
    tpath = str(tmp_path / "t.fasta")
    rpath = str(tmp_path / "r.fastq")
    write_fasta(tpath, [("ctg", target)])
    seqs = [(str(i + 1), r, "I" * len(r)) for i, r in enumerate(good)]
    seqs += [(str(i + 5), r, '"' * len(r)) for i, r in enumerate(bad)]
    write_fastq(rpath, seqs)
    rows = [(i + 1, len(r), 0, len(r), "+", "ctg", len(target), 0,
             len(target), len(r), len(target), 60)
            for i, r in enumerate(good + bad)]
    opath = str(tmp_path / "o.paf")
    write_paf(opath, rows)

    p = create_polisher(rpath, opath, tpath, PolisherType.kC,
                        500, 10.0, 0.3, True, 3, -5, -4, 1, engine="oracle")
    p.initialize()
    # only the 4 high-quality layers pass the q>=10 mean-quality filter
    assert p.windows[0].n_layers - 1 == 4


class TestCreatePolisherValidation:
    """Error-path tests mirroring the reference EXPECT_DEATH suite
    (test/racon_test.cpp:53-84)."""

    def test_invalid_type(self):
        from racon_tpu.pipeline import create_polisher
        with pytest.raises(RuntimeError, match="invalid polisher type"):
            create_polisher("a.fasta", "b.paf", "c.fasta", type=3)

    def test_invalid_window(self):
        from racon_tpu.pipeline import PolisherType, create_polisher
        with pytest.raises(RuntimeError, match="invalid window length"):
            create_polisher("a.fasta", "b.paf", "c.fasta",
                            PolisherType.kC, window_length=0)

    @pytest.mark.parametrize("seqs,ovl,tgt", [
        ("a.txt", "b.paf", "c.fasta"),
        ("a.fasta", "b.txt", "c.fasta"),
        ("a.fasta", "b.paf", "c.txt"),
    ])
    def test_invalid_extension(self, seqs, ovl, tgt):
        from racon_tpu.pipeline import PolisherType, create_polisher
        with pytest.raises(RuntimeError, match="unsupported format"):
            create_polisher(seqs, ovl, tgt, PolisherType.kC)

    def test_empty_target_set(self, tmp_path):
        from racon_tpu.pipeline import PolisherType, create_polisher
        t = tmp_path / "t.fasta"
        t.write_text("")
        r = tmp_path / "r.fasta"
        r.write_text(">1\nACGT\n")
        o = tmp_path / "o.paf"
        o.write_text("")
        p = create_polisher(str(r), str(o), str(t), PolisherType.kC)
        with pytest.raises(RuntimeError, match="empty target"):
            p.initialize()


class TestDevicePrewarm:
    """initialize() overlaps accelerator backend attach with ingest for
    device engines only (the CLAUDE.md invariant: host-only runs must
    never touch jax backend init)."""

    def _spawned(self, monkeypatch, synth, engine):
        import threading
        spawned = []
        real = threading.Thread

        class Spy(real):
            def __init__(self, *a, **kw):
                if kw.get("name") == "racon-tpu-prewarm":
                    spawned.append(kw)
                super().__init__(*a, **kw)

        monkeypatch.setattr(threading, "Thread", Spy)
        p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                            PolisherType.kC, 100, 10.0, 0.3, True,
                            3, -5, -4, 1, engine=engine)
        p.initialize()
        return spawned, p

    def test_tpu_engine_prewarms_and_polishes(self, monkeypatch, synth):
        spawned, p = self._spawned(monkeypatch, synth, "tpu")
        assert len(spawned) == 1
        assert len(p.polish(True)) == 1   # pipeline unaffected

    def test_host_engines_do_not_touch_backend(self, monkeypatch, synth):
        for engine in ("native", "oracle"):
            spawned, _ = self._spawned(monkeypatch, synth, engine)
            assert spawned == []


# --------------------------------------------------------------------- #
# streamed align->consensus overlap (pipeline._polish_streamed)
# --------------------------------------------------------------------- #

LAMBDA = "/root/reference/test/data"


def _run_lambda(overlaps_file, stream):
    p = create_polisher(f"{LAMBDA}/sample_reads.fastq.gz",
                        f"{LAMBDA}/{overlaps_file}",
                        f"{LAMBDA}/sample_layout.fasta.gz",
                        PolisherType.kC, 500, 10.0, 0.3, True, 5, -4, -8,
                        num_threads=2, engine="native", stream=stream)
    p.initialize()
    cov = None if stream else list(p.targets_coverages)
    dst = p.polish(True)
    return dst, cov, p


def test_streamed_matches_phased_lambda_paf():
    """Streamed mode must reproduce the phased pipeline byte-for-byte on
    real data through the host aligner (the producer thread aligns while
    the consumer polishes the completed frontier)."""
    phased, cov, _ = _run_lambda("sample_overlaps.paf.gz", stream=False)
    streamed, _, sp = _run_lambda("sample_overlaps.paf.gz", stream=True)
    assert len(phased) == len(streamed) == 1
    assert phased[0].name == streamed[0].name     # LN/RC/XC tags included
    assert phased[0].data == streamed[0].data


def test_streamed_matches_phased_lambda_sam():
    """Same equivalence with minimap2-supplied CIGARs (no aligner in the
    producer — pure breaking-point walk + frontier bookkeeping)."""
    phased, _, _ = _run_lambda("sample_overlaps.sam.gz", stream=False)
    streamed, _, _ = _run_lambda("sample_overlaps.sam.gz", stream=True)
    assert phased[0].name == streamed[0].name
    assert phased[0].data == streamed[0].data


def test_streamed_matches_phased_kf_multi_target(tmp_path):
    """Fragment-correction mode drives the frontier across many targets;
    streamed output (all records, all tags) must match phased exactly."""
    rng = random.Random(3)
    true = "".join(rng.choice("ACGT") for _ in range(300))
    reads = [noisy(true, 0.1, rng) for _ in range(6)]
    rpath = str(tmp_path / "reads.fasta")
    write_fasta(rpath, [(str(i + 1), r) for i, r in enumerate(reads)])
    rows = []
    for i in range(len(reads)):
        for j in range(len(reads)):
            if i == j:
                continue
            rows.append((i + 1, len(reads[i]), 0, len(reads[i]), "+",
                         j + 1, len(reads[j]), 0, len(reads[j]),
                         min(len(reads[i]), len(reads[j])),
                         max(len(reads[i]), len(reads[j])), 60))
    opath = str(tmp_path / "ava.paf")
    write_paf(opath, rows)

    outs = []
    for stream in (False, True):
        p = create_polisher(rpath, opath, rpath, PolisherType.kF,
                            500, 10.0, 0.3, True, 1, -1, -1, 1,
                            engine="native", stream=stream)
        p.initialize()
        outs.append(p.polish(False))
    phased, streamed = outs
    assert [(d.name, d.data) for d in phased] == \
        [(d.name, d.data) for d in streamed]


def test_streamed_with_host_assist(synth, monkeypatch):
    """Streaming producer + host-assist worker + engine segments all at
    once (the production composition) must still match the phased oracle
    output exactly."""
    monkeypatch.setenv("RACON_TPU_HOST_ASSIST", "force")
    p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4,
                        num_threads=2, engine="tpu", stream=True)
    p.initialize()
    assert p._stream_overlaps is not None
    streamed = p.polish(True)

    monkeypatch.setenv("RACON_TPU_HOST_ASSIST", "0")
    q = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4,
                        num_threads=2, engine="oracle")
    q.initialize()
    phased = q.polish(True)
    assert [(d.name, d.data) for d in streamed] == \
        [(d.name, d.data) for d in phased]


def test_tpu_align_wins_over_streaming(synth):
    """--tpu-align is a phased-only feature: requesting it must disable
    the streamed path rather than being silently skipped by it."""
    p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4,
                        engine="native", stream=True, tpu_align=True)
    assert not p._streaming_enabled()
    p.initialize()
    assert p._stream_overlaps is None          # phased path taken
    assert sum(len(w.sequences) - 1 for w in p.windows) > 0


def test_streamed_failure_poisons_retry(synth, monkeypatch):
    """If the engine dies mid-stream, window layers are partially
    assigned; a blind polish() retry must fail loudly instead of running
    the phased path on half-built windows."""
    p = create_polisher(synth["rpath"], synth["opath"], synth["tpath"],
                        PolisherType.kC, 100, 10.0, 0.3, True, 3, -5, -4,
                        engine="oracle", stream=True)
    monkeypatch.setenv("RACON_TPU_STREAM", "1")
    p.initialize()
    assert p._stream_overlaps is not None

    class Boom(RuntimeError):
        pass

    def exploding_engine():
        class E:
            def polish_windows(self, windows, trim):
                raise Boom("device died")
        return E()

    monkeypatch.setattr(p, "_make_engine", exploding_engine)
    with pytest.raises(Boom):
        p.polish(True)
    with pytest.raises(RuntimeError, match="recreate the polisher"):
        p.polish(True)
