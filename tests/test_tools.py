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
