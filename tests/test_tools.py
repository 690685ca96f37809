import os

from racon_tpu.io import parsers
from racon_tpu.tools import sampler


def test_split(tmp_path):
    path = str(tmp_path / "in.fasta")
    with open(path, "w") as f:
        for i in range(10):
            f.write(f">s{i}\n{'ACGT' * 25}\n")   # 100 bp each
    outs = sampler.split(path, 250, str(tmp_path))
    assert len(outs) == 5  # 2 sequences (200bp) per chunk
    total = []
    for o in outs:
        total += parsers.parse_fasta(o)
    assert [s.name for s in total] == [f"s{i}" for i in range(10)]


def test_subsample(tmp_path):
    path = str(tmp_path / "in.fastq")
    with open(path, "w") as f:
        for i in range(20):
            f.write(f"@s{i}\n{'ACGT' * 25}\nIIII\n{'I' * 100}\n".replace(
                "\nIIII\n", "\n+\n"))
    out = sampler.subsample(path, 100, 5, str(tmp_path), seed=1)
    seqs = parsers.parse_fastq(out)
    total = sum(len(s.data) for s in seqs)
    assert 500 <= total <= 600  # target 500 bases, last pick may overshoot
    assert out.endswith("_5x.fastq")


def test_cli_runs(tmp_path, capsys):
    import random
    from racon_tpu import cli
    rng = random.Random(2)
    true = "".join(rng.choice("ACGT") for _ in range(200))

    def noisy(s):
        out = []
        for c in s:
            r = rng.random()
            if r < 0.03:
                continue
            elif r < 0.06:
                out.append(rng.choice("ACGT"))
                out.append(c)
            elif r < 0.09:
                out.append(rng.choice("ACGT"))
            else:
                out.append(c)
        return "".join(out)

    tpath = str(tmp_path / "t.fasta")
    rpath = str(tmp_path / "r.fasta")
    opath = str(tmp_path / "o.paf")
    with open(tpath, "w") as f:
        f.write(f">ctg\n{noisy(true)}\n")
    reads = [noisy(true) for _ in range(5)]
    with open(rpath, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">{i + 1}\n{r}\n")
    tlen = len(parsers.parse_fasta(tpath)[0].data)
    with open(opath, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"{i + 1}\t{len(r)}\t0\t{len(r)}\t+\tctg\t{tlen}\t0\t"
                    f"{tlen}\t{min(len(r), tlen)}\t{max(len(r), tlen)}\t60\n")

    rc = cli.main([rpath, opath, tpath, "--engine", "oracle", "-w", "100"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">ctg LN:i:")
    assert len(out.splitlines()) == 2


def test_preprocess(tmp_path, capsys):
    from racon_tpu.tools import preprocess
    p1 = str(tmp_path / "a.fastq")
    with open(p1, "w") as f:
        f.write("@r1 extra\nACGT\n+\nIIII\n@r2\nGGCC\n+\nIIII\n")
    p2 = str(tmp_path / "b.fastq")
    with open(p2, "w") as f:
        f.write("@r1\nTTAA\n+\nIIII\n")
    rc = preprocess.main([p1, p2])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "@r11"
    assert out[4] == "@r21"
    assert out[8] == "@r12"


def test_wrapper_checkpoint_resume(tmp_path, capsys, monkeypatch):
    """Per-chunk checkpointing: second run skips completed parts and emits
    identical output (SURVEY.md §5.4 — the layer the reference lacks)."""
    import random
    from racon_tpu.tools import wrapper

    rng = random.Random(4)

    def noisy(s):
        out = []
        for c in s:
            r = rng.random()
            if r < 0.04:
                continue
            elif r < 0.08:
                out.append(rng.choice("ACGT"))
                out.append(c)
            else:
                out.append(c)
        return "".join(out)

    trues = ["".join(rng.choice("ACGT") for _ in range(150))
             for _ in range(2)]
    tpath = str(tmp_path / "t.fasta")
    rpath = str(tmp_path / "r.fasta")
    opath = str(tmp_path / "o.paf")
    with open(tpath, "w") as f:
        for i, t in enumerate(trues):
            f.write(f">ctg{i}\n{noisy(t)}\n")
    with open(rpath, "w") as f:
        k = 0
        for i, t in enumerate(trues):
            for _ in range(4):
                k += 1
                f.write(f">r{k}\n{noisy(t)}\n")
    tlens = [len(s.data) for s in parsers.parse_fasta(tpath)]
    rlens = [len(s.data) for s in parsers.parse_fasta(rpath)]
    with open(opath, "w") as f:
        k = 0
        for i, t in enumerate(trues):
            for _ in range(4):
                rl = rlens[k]
                k += 1
                f.write(f"r{k}\t{rl}\t0\t{rl}\t+\tctg{i}\t{tlens[i]}\t0\t"
                        f"{tlens[i]}\t{min(rl, tlens[i])}\t"
                        f"{max(rl, tlens[i])}\t60\n")

    ckpt = str(tmp_path / "ckpt")
    args = [rpath, opath, tpath, "--engine", "oracle", "-w", "100",
            "--split", "160", "--checkpoint", ckpt]
    assert wrapper.main(list(args)) == 0
    first = capsys.readouterr().out
    assert first.count(">") >= 2
    import os
    assert "MANIFEST" in os.listdir(ckpt)
    parts = sorted(p for p in os.listdir(ckpt) if p.startswith("part_"))
    assert len(parts) >= 2 and all(p.endswith(".fasta") for p in parts)

    # resume: polishing must not run again
    def boom(*a, **k):
        raise AssertionError("polisher ran despite checkpoints")

    import racon_tpu.pipeline as pipeline
    monkeypatch.setattr(pipeline, "create_polisher", boom)
    assert wrapper.main(list(args)) == 0
    second = capsys.readouterr().out
    assert second == first


def test_wrapper_checkpoint_invalidation(tmp_path, capsys):
    """Changing parameters invalidates existing checkpoint parts
    (stale output from a different configuration must never be reused)."""
    import os
    from racon_tpu.tools import wrapper

    tpath = str(tmp_path / "t.fasta")
    rpath = str(tmp_path / "r.fasta")
    opath = str(tmp_path / "o.paf")
    seq = "ACGTACGTACGTACGTACGTACGTACGTACGT" * 5
    with open(tpath, "w") as f:
        f.write(f">ctg0\n{seq}\n")
    with open(rpath, "w") as f:
        for k in range(3):
            f.write(f">r{k}\n{seq}\n")
    with open(opath, "w") as f:
        for k in range(3):
            f.write(f"r{k}\t{len(seq)}\t0\t{len(seq)}\t+\tctg0\t{len(seq)}"
                    f"\t0\t{len(seq)}\t{len(seq)}\t{len(seq)}\t60\n")

    ckpt = str(tmp_path / "ckpt")
    base = [rpath, opath, tpath, "--engine", "oracle", "--checkpoint", ckpt]
    assert wrapper.main(base + ["-w", "100"]) == 0
    capsys.readouterr()
    with open(os.path.join(ckpt, "MANIFEST")) as f:
        m1 = f.read()
    part = os.path.join(ckpt, "part_00000.fasta")
    mtime1 = os.path.getmtime(part)

    # different window length -> manifest mismatch -> parts rebuilt
    assert wrapper.main(base + ["-w", "50"]) == 0
    capsys.readouterr()
    with open(os.path.join(ckpt, "MANIFEST")) as f:
        m2 = f.read()
    assert m1 != m2
    assert os.path.getmtime(part) >= mtime1
