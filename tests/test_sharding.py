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
