"""Multi-device sharding: the engine step must compile and run with the
window-batch axis sharded over an 8-device mesh (virtual CPU devices), and
produce the same results as the unsharded run."""

import numpy as np
import pytest


def test_mesh_has_8_devices():
    import jax
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_step_matches_unsharded():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    import __graft_entry__ as ge
    from racon_tpu.parallel import mesh as M
    from racon_tpu.poa import engine as E

    state, layer, t_cap = ge._synthetic_bucket(B=8, seed=3)
    out_ref = E.add_layer(state, layer, 3, -5, -4, t_cap)

    mesh = M.make_mesh()
    sh = M.batch_sharding(mesh)
    state_s = M.shard_pytree_batch(state, mesh)
    layer_s = M.shard_pytree_batch(layer, mesh)
    out = jax.jit(
        lambda s, l: E.add_layer(s, l, 3, -5, -4, t_cap))(state_s, layer_s)

    for name in ("codes", "key", "pred", "pred_w", "pred_cnt", "cov",
                 "rep", "order", "rank", "n_nodes", "failed"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name)), np.asarray(getattr(out_ref, name)),
            err_msg=name)


def test_entry_compiles():
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(np.asarray(out.n_nodes).min()) > 0


def test_engine_round_robin_over_devices():
    """Chunks place round-robin over all local devices (the reference's
    N batches x M GPUs model, src/cuda/cudapolisher.cpp:165-199) and the
    results stay bit-identical to the oracle."""
    import random

    import jax
    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    rng = random.Random(21)
    windows = [make_window(rng, length=80, depth=5)[0] for _ in range(12)]
    eng = BatchedPOAEngine(3, -5, -4, batch_size=2, mode="xla")
    assert len(eng.devices) == 8

    seen_devices = set()
    orig = eng._launch_chunk

    def spy(chunk, windows_, **kw):
        packed = orig(chunk, windows_, **kw)
        leaf = packed["codes"] if isinstance(packed, dict) else packed
        seen_devices.update(d.id for d in leaf.devices())
        return packed

    eng._launch_chunk = spy
    got = eng.polish_windows(windows, trim=False)
    assert len(seen_devices) >= 6, seen_devices   # 6 chunks -> 6 devices
    for w, (cons, polished) in zip(windows, got):
        rc, rp = consensus_window(w, 3, -5, -4, trim=False)
        assert cons == rc and polished == rp


def test_host_assist_work_stealing(monkeypatch):
    """With host assist forced on, a native worker thread steals windows
    from the deep end of the depth-sorted queue while the device loop
    consumes the front; every window is polished exactly once and the
    output stays bit-identical to the oracle."""
    import random

    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    monkeypatch.setenv("RACON_TPU_HOST_ASSIST", "force")
    rng = random.Random(41)
    windows = [make_window(rng, length=70, depth=3 + (j % 5))[0]
               for j in range(20)]
    eng = BatchedPOAEngine(3, -5, -4, batch_size=4, mode="xla")
    got = eng.polish_windows(windows, trim=False)
    s = eng.stats
    assert s.get("host_assist", 0) > 0
    assert (s.get("host_assist", 0) + s["device"] + s["trivial"]
            + s["fallback"] == len(windows))
    for w, (cons, polished) in zip(windows, got):
        rc, rp = consensus_window(w, 3, -5, -4, trim=False)
        assert cons == rc and polished == rp


def test_host_assist_fused_interpret(monkeypatch):
    """Host assist mixed with the production fused-kernel path (interpret
    mode): results bit-identical to the oracle with both consumers live."""
    import random

    from racon_tpu.poa import fused_chunk as FC
    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    monkeypatch.setattr(FC, "INTERPRET", True)
    monkeypatch.setenv("RACON_TPU_HOST_ASSIST", "force")
    rng = random.Random(43)
    windows = [make_window(rng, length=60, depth=4, with_quality=True,
                           partial=True)[0] for _ in range(8)]
    eng = BatchedPOAEngine(3, -5, -4, batch_size=2, mode="fused",
                           interleave=2)
    got = eng.polish_windows(windows, trim=False)
    s = eng.stats
    assert (s.get("host_assist", 0) + s["device"] + s["trivial"]
            + s["fallback"] == len(windows))
    for w, (cons, polished) in zip(windows, got):
        rc, rp = consensus_window(w, 3, -5, -4, trim=False)
        assert cons == rc and polished == rp


def test_fused_round_robin_over_devices(monkeypatch):
    """The PRODUCTION (fused chunk kernel) path round-robins over
    multiple virtual devices with K=2 interleave and stays bit-identical
    to the oracle (VERDICT round-2 item 7: multi-device coverage for the
    kernel actually used on hardware)."""
    import random

    from racon_tpu.poa import fused_chunk as FC
    from racon_tpu.poa.batched import BatchedPOAEngine
    from racon_tpu.poa.consensus import consensus_window
    from tests.test_engine import make_window

    monkeypatch.setattr(FC, "INTERPRET", True)
    rng = random.Random(31)
    windows = [make_window(rng, length=60, depth=5, with_quality=True,
                           partial=True)[0] for _ in range(8)]
    eng = BatchedPOAEngine(3, -5, -4, batch_size=2, mode="fused",
                           interleave=2)
    assert len(eng.devices) == 8
    seen = set()
    orig = eng._launch_chunk

    def spy(chunk, windows_, **kw):
        packed = orig(chunk, windows_, **kw)
        seen.update(d.id for d in packed["codes"].devices())
        return packed

    eng._launch_chunk = spy
    got = eng.polish_windows(windows, trim=False)
    assert eng.stats["fallback"] == 0
    assert len(seen) >= 3, seen                   # 4 chunks round-robin
    for w, (cons, polished) in zip(windows, got):
        rc, rp = consensus_window(w, 3, -5, -4, trim=False)
        assert cons == rc and polished == rp
