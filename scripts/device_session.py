#!/usr/bin/env python
"""One-process device worklist: the axon tunnel charges minutes of attach
latency per NEW process, so all real-TPU measurements for a work session
run sequentially from this single process.

Stages (each gated on the previous; all output flushed):
  1. probe
  2. synthetic chunk A/B: K=1 vs K=2 steady state (D=22 lambda-class)
  3. real lambda windows through BatchedPOAEngine at K=1 and K=2
     (bit-compare consensus, steady-state windows/s)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def probe(tag=""):
    t = time.time()
    v = float(np.asarray(jnp.sum(jnp.arange(1024.0))))
    assert v == 1024 * 1023 / 2
    print(f"probe{tag}: PASS ({time.time() - t:.1f}s)", flush=True)


def stage_ab(ks=(1, 2), D=22, reps=4, N=1791, P=12, band_sub=0, B=32):
    from racon_tpu.poa import engine as E
    from racon_tpu.poa import fused_chunk as FC
    from tests.test_fused_chunk import build_chunk_inputs, random_problem

    L0, L = 500, 511
    sub_l = -(-(L + 1) // 128)
    t_cap = N + L
    state0, layers = random_problem(B, L0, L, D, N, P, seed=0, partial=False)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(99)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    ar = (jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen),
          jnp.asarray(metas), jnp.asarray(seq_t), jnp.asarray(wts_t))
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
              t_cap=t_cap, band_sub=band_sub)
    print(f"[ab] B={B} N={N} L={L} sub_l={sub_l} D={D} P={P} "
          f"band={band_sub}", flush=True)
    base = None
    for K in ks:
        try:
            t0 = time.time()
            st, nr = FC.polish_chunk(*ar, interleave=K, **kw)
            flags = np.asarray(st[:, FC.R_MISC, 1])
            print(f"[ab] K={K} band={band_sub}: compile+run "
                  f"{time.time() - t0:.1f}s "
                  f"failed={int((flags > 0).sum())}", flush=True)
            t0 = time.time()
            for _ in range(reps):
                st, nr = FC.polish_chunk(*ar, interleave=K, **kw)
            _ = np.asarray(st[:, FC.R_MISC, :2])
            dt = (time.time() - t0) / reps
        except Exception as e:
            print(f"[ab] K={K} band={band_sub}: ERROR "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        per_wl = dt / (D * B)   # per-window-layer cost: comparable across B
        sp = "" if base is None else f"  speedup: {base / per_wl:.2f}x"
        if base is None:
            base = per_wl
        print(f"[ab] K={K} band={band_sub} B={B}: {dt * 1e3:8.2f} ms/chunk, "
              f"{dt / D * 1e3:7.3f} ms/layer-step, "
              f"{per_wl * 1e6:7.1f} us/window-layer{sp}", flush=True)


def stage_phases(ks=(1, 2), D=22, reps=3, N=1791, P=12):
    """Per-phase roofline: time the kernel truncated after each phase.
    stop_phase: 1=DP, 2=+sink, 3=+traceback, 4=+update, 5=+merge, 9=full.
    """
    from racon_tpu.poa import engine as E
    from racon_tpu.poa import fused_chunk as FC
    from tests.test_fused_chunk import build_chunk_inputs, random_problem

    B, L0, L = 32, 500, 511
    sub_l = -(-(L + 1) // 128)
    t_cap = N + L
    state0, layers = random_problem(B, L0, L, D, N, P, seed=0, partial=False)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(99)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    ar = (jnp.asarray(bb), jnp.asarray(bw), jnp.asarray(blen),
          jnp.asarray(metas), jnp.asarray(seq_t), jnp.asarray(wts_t))
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
              t_cap=t_cap)
    for K in ks:
        prev = 0.0
        for sp in (1, 2, 3, 9):
            # stop=4/5 (mid-update truncation) hit a TPU backend error on
            # 2026-08-17; the 1/3/9 diffs cover the three big phases
            try:
                st, nr = FC.polish_chunk(*ar, interleave=K, stop_phase=sp,
                                         **kw)
                _ = np.asarray(st[:, 0, :2])
                t0 = time.time()
                for _r in range(reps):
                    st, nr = FC.polish_chunk(*ar, interleave=K,
                                             stop_phase=sp, **kw)
                _ = np.asarray(st[:, 0, :2])
                dt = (time.time() - t0) / reps
            except Exception as e:
                print(f"[phases] K={K} stop={sp}: ERROR {e}", flush=True)
                continue
            print(f"[phases] K={K} stop={sp}: {dt * 1e3:8.2f} ms/chunk "
                  f"(+{(dt - prev) / D * 1e3:7.3f} ms/layer-step)",
                  flush=True)
            prev = dt


def stage_xfer():
    """Tunnel transfer microbenchmark: upload/download bandwidth and
    per-RPC latency — sizes the t_pack (upload) and t_wait (download)
    sinks seen at genome scale (BENCH_scale_r03: t_pack 249 s for ~3 GB
    of int32 layer tiles; t_wait 598 s).  Decides whether int8 uploads
    and in-kernel consensus (download shrink) are the right levers."""
    import jax

    dev = jax.devices()[0]

    def up(arr, reps=3):
        # time device_put + forced materialization (a consuming op whose
        # scalar result is read back; block_until_ready under-reports
        # through the tunnel)
        ts = []
        for _ in range(reps):
            t0 = time.time()
            xd = jax.device_put(arr, dev)
            _ = float(np.asarray(jnp.sum(xd[:1].astype(jnp.int32))))
            ts.append(time.time() - t0)
        return min(ts)

    def down(make_xd, reps=3):
        # jax Arrays cache the host copy after the first np.asarray, so
        # each rep needs a FRESH computed array
        ts = []
        for _ in range(reps):
            xd = make_xd()
            t0 = time.time()
            _ = np.asarray(xd)
            ts.append(time.time() - t0)
        return min(ts)

    # production chunk shapes: tiles (D=32, B=32, sub_l=5, 128)
    tile32 = np.random.randint(0, 5, (32, 32, 5, 128)).astype(np.int32)
    tile8 = tile32.astype(np.int8)
    for name, arr in (("tile_i32_10.5MB", tile32), ("tile_i8_2.6MB", tile8),
                      ("small_4KB", np.zeros((32, 32), np.int32)),
                      ("mid_1MB", np.zeros((256, 1024), np.int32))):
        dt = up(arr)
        mb = arr.nbytes / 1e6
        print(f"[xfer] upload {name}: {dt * 1e3:8.1f} ms "
              f"({mb / dt:6.1f} MB/s incl. readback RTT)", flush=True)

    # downloads at the production collect sizes.  The array must be a
    # device COMPUTATION output: device_put from numpy keeps the host
    # buffer alive and np.asarray returns it without any transfer (the
    # first cut of this stage measured 360 GB/s "downloads" that way).
    bump = jax.jit(lambda a: a + 1)
    for name, arr in (
            ("pred_i16_1.4MB", np.zeros((32, 1793, 12), np.int16)),
            ("predw_i32_2.8MB", np.zeros((32, 1793, 12), np.int32)),
            ("row_i16_115KB", np.zeros((32, 1793), np.int16)),
            ("tiny_4KB", np.zeros((32, 32), np.int32)),
            ("cons_i8_57KB", np.zeros((32, 1793), np.int8))):
        base = jax.device_put(jnp.asarray(arr), dev)

        def make_xd(base=base):
            xd = bump(base)
            _ = float(np.asarray(jnp.sum(xd[:1].astype(jnp.int32))))
            return xd

        dt = down(make_xd)
        mb = arr.nbytes / 1e6
        print(f"[xfer] download {name}: {dt * 1e3:8.1f} ms "
              f"({mb / dt:6.1f} MB/s)", flush=True)


def stage_collect(K=4, D=22, N=1791, P=12, B=32, band_sub=3):
    """Time the REAL per-chunk cycle at production shapes: launch (upload
    + dispatch), device compute, and the collect download of the packed
    graph arrays — the decomposition bench_scale's t_wait hides.
    band_sub=3 matches the production auto band at K=4/sub_l=5 (full
    rows at K=4 put the H scratch at ~18 MB > the 16 MB VMEM limit —
    the first cut of this stage died there)."""
    from racon_tpu.poa import engine as E
    from racon_tpu.poa import fused_chunk as FC
    from tests.test_fused_chunk import build_chunk_inputs, random_problem

    L0, L = 500, 639
    sub_l = -(-(L + 1) // 128)
    t_cap = N + L
    state0, layers = random_problem(B, L0, L, D, N, P, seed=0, partial=False)
    codes0 = np.asarray(state0.codes)
    blen = np.asarray(state0.n_nodes)
    bb = codes0[:, :L0].astype(np.int32)
    rng = np.random.RandomState(99)
    bw = rng.randint(1, 50, size=(B, L0)).astype(np.int32)
    for b in range(B):
        bb[b, blen[b]:] = E.PAD_CODE
        bw[b, blen[b]:] = 0
    metas, seq_t, wts_t = build_chunk_inputs(layers, sub_l)
    seq8 = np.asarray(seq_t, np.int8)
    wts8 = np.asarray(wts_t, np.int8)
    kw = dict(n_cap=N, p_cap=P, sub_l=sub_l, match=3, mismatch=-5, gap=-4,
              t_cap=t_cap, interleave=K, band_sub=band_sub)
    host = (np.asarray(bb), np.asarray(bw), np.asarray(blen),
            np.asarray(metas), seq8, wts8)
    def pack(st, nr, cons):
        return (FC.pack_consensus_chunk(st) if cons else
                FC.pack_for_download_chunk(st, nr, p_cap=P))

    for cons in (False, True):
        # warm compile
        ar = tuple(jnp.asarray(a) for a in host)
        st, nr = FC.polish_chunk(*ar, consensus=cons, **kw)
        packed = pack(st, nr, cons)
        _ = {k: np.asarray(v) for k, v in packed.items()}
        for rep in range(3):
            t0 = time.time()
            ar = tuple(jnp.asarray(a) for a in host)   # upload (async-ish)
            st, nr = FC.polish_chunk(*ar, consensus=cons, **kw)  # dispatch
            packed = pack(st, nr, cons)
            t1 = time.time()
            out = {k: np.asarray(v) for k, v in packed.items()}  # wait+down
            t2 = time.time()
            nbytes = sum(v.nbytes for v in out.values())
            flags = (FC.unpack_consensus_chunk(out["consfused"])["failed"]
                     if cons else out["failed"])
            print(f"[collect] K={K} cons={int(cons)} rep{rep}: "
                  f"launch {t1 - t0:6.3f}s, "
                  f"collect {t2 - t1:6.3f}s ({nbytes / 1e6:.1f} MB down), "
                  f"cycle {t2 - t0:6.3f}s "
                  f"failed={int(np.asarray(flags).sum())}",
                  flush=True)
            # collect split: which downloads cost what (per-RPC latency
            # vs bandwidth)
            st2, nr2 = FC.polish_chunk(*ar, consensus=cons, **kw)
            packed2 = pack(st2, nr2, cons)
            for k, v in packed2.items():
                t0 = time.time()
                a = np.asarray(v)
                print(f"[collect]   {k:12s} {a.nbytes / 1e3:8.1f} KB "
                      f"{(time.time() - t0) * 1e3:8.1f} ms", flush=True)


def _make_lambda_polisher(wlen=500):
    from racon_tpu.pipeline import PolisherType, create_polisher
    D = "/root/reference/test/data"
    p = create_polisher(f"{D}/sample_reads.fastq.gz",
                        f"{D}/sample_overlaps.paf.gz",
                        f"{D}/sample_layout.fasta.gz", PolisherType.kC,
                        wlen, 10.0, 0.3, True, 5, -4, -8, num_threads=4,
                        engine="native")
    p.initialize()
    return p


def stage_lambda(cfgs=((1, 0), (2, -1), (3, -1), (4, -1))):
    """Default ladder; the round-4 'ladder' stage runs the full
    K x band grid from VERDICT item 1."""
    _stage_lambda(cfgs)


def _stage_lambda(cfgs):
    """Real lambda windows through BatchedPOAEngine at each
    (K, band_sub[, batch_size]) config (band -1 = leave the auto policy):
    bit-compare consensus vs the first config, steady-state w/s, failure
    stats (CLAUDE.md timing trap: check failed flags)."""
    from racon_tpu.poa.batched import BatchedPOAEngine
    p = _make_lambda_polisher()
    windows = p.windows
    print(f"[lambda] {len(windows)} windows", flush=True)
    ref = None
    for cfg in cfgs:
        K, band = cfg[0], cfg[1]
        bs = cfg[2] if len(cfg) > 2 else 32
        try:
            eng = BatchedPOAEngine(5, -4, -8, num_threads=4, interleave=K,
                                   batch_size=bs)
            if band >= 0:
                eng.band_sub = band
            t0 = time.time()
            res = eng.polish_windows(windows, p.trim)
            warm = time.time() - t0
            t0 = time.time()
            res = eng.polish_windows(windows, p.trim)
            dt = time.time() - t0
        except Exception as e:
            print(f"[lambda] K={K} band={band}: ERROR "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        wps = len(windows) / dt
        print(f"[lambda] K={K} band={band} bs={bs}: warm={warm:.1f}s "
              f"timed={dt:.2f}s {wps:.1f} w/s stats={eng.stats}", flush=True)
        if ref is None:
            ref = res
        else:
            ndiff = sum(1 for a, b in zip(ref, res) if a != b)
            print(f"[lambda] K={K} band={band} vs base consensus: "
                  f"{ndiff} differing windows", flush=True)


def stage_w1000(cfgs=((1, 2), (1, -1), (2, -1))):
    """w=1000 lambda: banding shrinks the per-rank H row so the full
    node budget fits VMEM — goal fail_nodes=0 (VERDICT round-2 item 3)."""
    from racon_tpu.poa.batched import BatchedPOAEngine
    p = _make_lambda_polisher(wlen=1000)
    windows = p.windows
    print(f"[w1000] {len(windows)} windows", flush=True)
    ref = None
    for K, band in cfgs:
        try:
            eng = BatchedPOAEngine(5, -4, -8, num_threads=4, interleave=K)
            if band >= 0:
                eng.band_sub = band
            t0 = time.time()
            res = eng.polish_windows(windows, p.trim)
            warm = time.time() - t0
        except Exception as e:
            print(f"[w1000] K={K} band={band}: ERROR "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        print(f"[w1000] K={K} band={band}: warm={warm:.1f}s "
              f"stats={eng.stats}", flush=True)
        if ref is None:
            ref = res
        else:
            ndiff = sum(1 for a, b in zip(ref, res) if a != b)
            print(f"[w1000] K={K} band={band} vs base consensus: "
                  f"{ndiff} differing windows", flush=True)


def stage_assist(K=2, cfgs=("0", "1")):
    """A/B host-assist work stealing at the production K: device-only vs
    device + native host worker stealing from the deep end of the queue
    (batched.py RACON_TPU_HOST_ASSIST).  Bit-compare + steady-state w/s."""
    from racon_tpu.poa.batched import BatchedPOAEngine
    p = _make_lambda_polisher()
    windows = p.windows
    print(f"[assist] {len(windows)} windows, K={K}", flush=True)
    ref = None
    for assist in cfgs:
        os.environ["RACON_TPU_HOST_ASSIST"] = assist
        try:
            eng = BatchedPOAEngine(5, -4, -8, num_threads=4, interleave=K)
            t0 = time.time()
            res = eng.polish_windows(windows, p.trim)
            warm = time.time() - t0
            t0 = time.time()
            res = eng.polish_windows(windows, p.trim)
            dt = time.time() - t0
        except Exception as e:
            print(f"[assist] assist={assist}: ERROR "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        finally:
            os.environ["RACON_TPU_HOST_ASSIST"] = "0"
        print(f"[assist] assist={assist}: warm={warm:.1f}s timed={dt:.2f}s "
              f"{len(windows) / dt:.1f} w/s stats={eng.stats}", flush=True)
        if ref is None:
            ref = res
        else:
            ndiff = sum(1 for a, b in zip(ref, res) if a != b)
            print(f"[assist] assist={assist} vs base consensus: "
                  f"{ndiff} differing windows", flush=True)


def stage_cons(K=4, cfgs=("0", "1")):
    """A/B device consensus: graph download + host heaviest_bundle vs
    kernel phase 7 + consensus-rows-only download
    (RACON_TPU_DEVICE_CONS).  Bit-compare + steady-state w/s + failure
    stats (code 6 = consensus overflow/cap fallback)."""
    from racon_tpu.poa.batched import BatchedPOAEngine
    p = _make_lambda_polisher()
    windows = p.windows
    print(f"[cons] {len(windows)} windows, K={K}", flush=True)
    ref = None
    old = os.environ.get("RACON_TPU_DEVICE_CONS")
    try:
        for cons in cfgs:
            os.environ["RACON_TPU_DEVICE_CONS"] = cons
            try:
                eng = BatchedPOAEngine(5, -4, -8, num_threads=4,
                                       interleave=K)
                t0 = time.time()
                res = eng.polish_windows(windows, p.trim)
                warm = time.time() - t0
                t0 = time.time()
                res = eng.polish_windows(windows, p.trim)
                dt = time.time() - t0
            except Exception as e:
                print(f"[cons] cons={cons}: ERROR "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
                continue
            print(f"[cons] cons={cons}: warm={warm:.1f}s timed={dt:.2f}s "
                  f"{len(windows) / dt:.1f} w/s stats={eng.stats}",
                  flush=True)
            if ref is None:
                ref = res
            else:
                ndiff = sum(1 for a, b in zip(ref, res) if a != b)
                print(f"[cons] cons={cons} vs base consensus: "
                      f"{ndiff} differing windows", flush=True)
    finally:
        if old is None:
            os.environ.pop("RACON_TPU_DEVICE_CONS", None)
        else:
            os.environ["RACON_TPU_DEVICE_CONS"] = old


def stage_ed(wlen=500, expect=1309, stream=False, assist=False):
    """End-to-end verify surface: polish lambda on the TPU engine and
    edit-distance the contig against the truth (w=500 expect 1309, reference
    CPU golden 1312; w=1000 expect 1284, reference golden 1289 — round-4
    edlib tie order, rtlib.py).  stream=True runs the
    streamed align->consensus overlap (the CLI default); assist=True
    enables host-assist work stealing."""
    from racon_tpu.pipeline import PolisherType, create_polisher
    from racon_tpu.io.parsers import parse_sequences
    from racon_tpu.native import rtlib
    D = "/root/reference/test/data"
    os.environ["RACON_TPU_HOST_ASSIST"] = "1" if assist else "0"
    tag = f"stream={int(stream)} assist={int(assist)}"
    try:
        t_all = time.time()
        p = create_polisher(f"{D}/sample_reads.fastq.gz",
                            f"{D}/sample_overlaps.paf.gz",
                            f"{D}/sample_layout.fasta.gz", PolisherType.kC,
                            wlen, 10.0, 0.3, True, 5, -4, -8, num_threads=4,
                            engine="tpu", stream=stream)
        p.initialize()
        t0 = time.time()
        res = p.polish()
        truth = parse_sequences(f"{D}/sample_reference.fasta.gz")[0]
        s = res[0]
        s.create_reverse_complement()
        ed = rtlib.edit_distance(s.reverse_complement, truth.data)
        print(f"[ed] lambda w={wlen} {tag} e2e TPU ED vs truth: {ed} "
              f"(polish {time.time() - t0:.1f}s, "
              f"e2e {time.time() - t_all:.1f}s, expect {expect})",
              flush=True)
    finally:
        os.environ["RACON_TPU_HOST_ASSIST"] = "0"


def _guarded(fn):
    """One failing stage must not kill the whole session (each NEW
    process pays the tunnel a minutes-long attach penalty) — print and
    move on.  A wedged tunnel makes the next probe hang, which is the
    correct place to stop."""
    import functools

    @functools.wraps(fn)
    def w(*a, **k):
        try:
            return fn(*a, **k)
        except Exception as e:
            print(f"[session] stage {fn.__name__} FAILED: "
                  f"{type(e).__name__}: {str(e)[:400]}", flush=True)
    return w


if __name__ == "__main__":
    stages = sys.argv[1:] or ["ab", "lambda"]
    for _n in list(globals()):
        if _n.startswith("stage_") or _n == "_stage_lambda":
            globals()[_n] = _guarded(globals()[_n])
    # keep the K/band A/B stages pure-device (unconditionally — an
    # inherited =1 must not leak into the timings); the "assist" stage
    # flips host assist on explicitly for its own A/B
    os.environ["RACON_TPU_HOST_ASSIST"] = "0"
    probe()
    if "xfer" in stages:
        stage_xfer()
        probe(" post-xfer")
    if "collect" in stages:
        stage_collect()
        probe(" post-collect")
    if "ab" in stages:
        stage_ab()
        probe(" post-ab")
    if "abband" in stages:
        stage_ab(ks=(1, 2, 4), band_sub=2)
        probe(" post-abband")
    if "ab3" in stages:
        # K=3 at full p_cap=12 (B=33 keeps B % K == 0; the
        # us/window-layer column is the cross-B-comparable number)
        stage_ab(ks=(1, 3), B=33)
        probe(" post-ab3")
    if "abk4" in stages:
        # K=4 at FULL p_cap=12: the 16-bit state-row packing (cov+rep,
        # letter pairs -> 24 padded rows) fits 4 private streams in SMEM;
        # H rows at N=1791 x 4 streams sit right at the VMEM budget, so
        # also try band=2 (halves H) in case full rows fail to compile
        stage_ab(ks=(1, 2, 4))
        probe(" post-abk4")
        stage_ab(ks=(4,), band_sub=2)
        probe(" post-abk4band")
    if "ab4" in stages:
        stage_ab(ks=(4,))
        probe(" post-ab4")
    if "ab4n" in stages:
        # N-alignment hypothesis for the production K=4 compile failure:
        # the scheduler computes N=1792 (N+1=1793, not 8-divisible) while
        # every A/B uses N=1791; K=4 band=3 at N=1791 compiles fine
        stage_ab(ks=(4,), band_sub=3, N=1792)
        probe(" post-ab4n")
    if "ab4b3" in stages:
        # repro of the production-path K=4 compile failure (2026-08-18):
        # the lambda scheduler auto-banded K=4 to band_sub=3; the plain
        # A/B only covered band 0 and 2 (both compiled, 2.07x)
        stage_ab(ks=(4,), band_sub=3)
        probe(" post-ab4b3")
    if "phases" in stages:
        stage_phases()
        probe(" post-phases")
    if "lambda" in stages:
        stage_lambda()
        probe(" post-lambda")
    if "ladder" in stages:
        # round-4 production re-pin (VERDICT item 1): phased K x band
        # grid on real lambda windows, warm + timed, stats printed
        # (band -1 = auto policy, 0 = full rows)
        _stage_lambda(((1, -1), (1, 0), (2, -1), (2, 0), (3, -1), (3, 0),
                       (4, -1)))
        probe(" post-ladder")
    if "rung4" in stages:
        # round-4 K=4 unlock validation: per-chunk sub_l rungs + the
        # input-block-aware SMEM model (batched.py/fused_chunk.py) let
        # narrow-rung chunks run K=4 (auto band=3, the shape ab4n proved
        # compiles) while sub_l=6 chunks stay K=3.  Expect k=4 in stats,
        # no launch failures, bit-identity vs K=3, and >= 1.1x w/s.
        # Also a bs=64 config: larger chunks amortize launch + collect.
        _stage_lambda(((3, -1), (4, -1), (4, -1, 64)))
        probe(" post-rung4")
    if "w1000" in stages:
        stage_w1000()
        probe(" post-w1000")
    if "assist" in stages:
        stage_assist()
        probe(" post-assist")
    if "assist4" in stages:
        stage_assist(K=4)
        probe(" post-assist4")
    if "cons" in stages:
        stage_cons()
        probe(" post-cons")
    if "ed" in stages:
        stage_ed()
        probe(" post-ed")
    if "edstream" in stages:
        # the production CLI config: streamed + host assist
        stage_ed(stream=True, assist=True)
        probe(" post-edstream")
    if "edstream0" in stages:
        # streamed WITHOUT host assist (the 1-core production default)
        stage_ed(stream=True, assist=False)
        probe(" post-edstream0")
    if "edw1000" in stages:
        stage_ed(wlen=1000, expect=1284)
        probe(" post-edw1000")
    print("DONE", flush=True)
