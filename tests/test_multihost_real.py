"""Real two-process multi-host test.

Launches TWO separate Python processes that join a jax.distributed
coordination service (CPU backend), each polishing its window shard of the
same synthetic dataset through the real CLI entry point, and asserts that
(a) both emit byte-identical FASTA and (b) it equals a plain
single-process run.  This exercises the genuine DCN path
(multihost_utils.process_allgather), not a monkeypatched gather
(SURVEY.md §5.8; the reference has no multi-node story at all).
"""

import os
import random
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_dataset(tmp_path):
    rng = random.Random(7)
    trues = ["".join(rng.choice("ACGT") for _ in range(220))
             for _ in range(3)]

    def noisy(s):
        out = []
        for c in s:
            r = rng.random()
            if r < 0.03:
                continue
            elif r < 0.06:
                out.append(rng.choice("ACGT"))
                out.append(c)
            else:
                out.append(c)
        return "".join(out)

    tpath = str(tmp_path / "t.fasta")
    rpath = str(tmp_path / "r.fasta")
    opath = str(tmp_path / "o.paf")
    ctgs = [noisy(t) for t in trues]
    with open(tpath, "w") as f:
        for i, c in enumerate(ctgs):
            f.write(f">ctg{i}\n{c}\n")
    reads = []
    with open(rpath, "w") as f:
        k = 0
        for i, t in enumerate(trues):
            for _ in range(5):
                k += 1
                r = noisy(t)
                reads.append((f"r{k}", r, i))
                f.write(f">r{k}\n{r}\n")
    with open(opath, "w") as f:
        for name, r, i in reads:
            f.write(f"{name}\t{len(r)}\t0\t{len(r)}\t+\tctg{i}\t"
                    f"{len(ctgs[i])}\t0\t{len(ctgs[i])}\t"
                    f"{min(len(r), len(ctgs[i]))}\t"
                    f"{max(len(r), len(ctgs[i]))}\t60\n")
    return rpath, opath, tpath


CLI = ("import sys; from racon_tpu.cli import main; "
       "sys.exit(main(sys.argv[1:]))")


def _run_proc(env, args, timeout=240):
    e = dict(os.environ)
    e.update(env)
    e["JAX_PLATFORMS"] = "cpu"
    e.pop("XLA_FLAGS", None)
    # drop the axon sitecustomize: this test validates CPU multi-host
    # logic and must never touch the TPU plugin (whose backend init
    # hangs for minutes when the tunnel is down)
    e["PYTHONPATH"] = "/root/repo"
    return subprocess.run(
        [sys.executable, "-c", CLI, *args],
        capture_output=True, timeout=timeout, env=e, cwd="/root/repo")


@pytest.mark.slow
def test_two_process_polish_matches_single(tmp_path):
    rpath, opath, tpath = _make_dataset(tmp_path)
    args = [rpath, opath, tpath, "--engine", "oracle", "-w", "100"]

    single = _run_proc({}, args)
    assert single.returncode == 0, single.stderr.decode()[-2000:]
    assert single.stdout.count(b">") == 3

    port = _free_port()
    base = {
        "RACON_TPU_COORDINATOR": f"127.0.0.1:{port}",
        "RACON_TPU_NUM_PROCESSES": "2",
    }
    procs = []
    for pid in range(2):
        e = dict(base)
        e["RACON_TPU_PROCESS_ID"] = str(pid)
        env = dict(os.environ)
        env.update(e)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = "/root/repo"
        procs.append(subprocess.Popen(
            [sys.executable, "-c", CLI, *args],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd="/root/repo"))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(out)

    # both hosts stitch the identical full output, equal to single-process
    # (the CPU Gloo collective backend prints a per-rank banner line on
    # stdout — drop it before comparing the FASTA bytes)
    def fasta(b: bytes) -> bytes:
        return b"".join(ln for ln in b.splitlines(keepends=True)
                        if not ln.startswith(b"[Gloo]"))

    assert fasta(outs[0]) == fasta(outs[1])
    assert fasta(outs[0]) == fasta(single.stdout)
