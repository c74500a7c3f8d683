'''Pod-efficiency prediction machinery (tools/bench_scaling.py --predict;
SCALING.md "Predicted pod efficiency").

The predicted-efficiency table rests on two ingredients this suite can pin
down exactly: program-derived collective payloads (jaxpr census) and the
hierarchical ICI/DCN all-reduce model.
'''
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tools.bench_scaling import _allreduce_ms, collective_bytes  # noqa: E402

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def test_collective_bytes_counts_halo_program():
    '''The census finds the halo train program's ppermutes and psums, and
    the ppermute payload matches the boundary-block accounting: every
    exchanged tensor is (B_loc, H, width) -- so total bytes must be an
    integer combination of H-row blocks, and grow linearly with H.'''
    import optax

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.parallel import (make_halo_train_step, make_mesh,
                                        shard_halo_batch, spatial_sort)

    model = NewtonNet(cutoff=3.0, n_features=8, n_basis=4, n_interactions=2,
                      graph_mode='neighborlist', k_max=16,
                      output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=1, graph=2)
    rs = np.random.RandomState(0)
    N = 32
    z = rs.choice([1, 6], size=(1, N)).astype(np.int32)
    pos = (rs.rand(1, N, 3) * [32.0, 4, 4]).astype(np.float32)
    z, pos, _ = spatial_sort(z, pos, None, n_shards=2)
    batch = {'z': jnp.asarray(z), 'pos': jnp.asarray(pos, jnp.float32),
             'cell': jnp.zeros((1, 3, 3), jnp.float32),
             'energy': jnp.zeros((1,), jnp.float32),
             'force': jnp.zeros((1, N, 3), jnp.float32),
             'graph_mask': jnp.ones((1,), bool)}
    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    tx = optax.adam(1e-3)

    def comm_at(h):
        step = make_halo_train_step(model, tx, mesh, n_halo=h)
        sb = shard_halo_batch(batch, mesh)
        return collective_bytes(lambda p, o, b: step(p, o, b),
                                params, tx.init(params), sb)

    c4, c8 = comm_at(4), comm_at(8)
    assert c4['ppermute'] > 0 and c4['psum'] > 0
    # boundary-only: doubling H doubles the ppermute volume exactly (every
    # exchanged payload has the halo block as its atom dimension)
    assert c8['ppermute'] == 2 * c4['ppermute']
    # the parameter-gradient psum dominates psum volume: >= param bytes
    param_bytes = sum(x.size * np.dtype(x.dtype).itemsize
                      for x in jax.tree.leaves(params))
    assert c4['psum'] >= param_bytes


def test_allreduce_model_shape():
    '''Hierarchical ring model: zero at 1 chip, ICI-only within a host,
    a DCN stage beyond 8 chips, monotone in payload.'''
    p = 1.6e6
    assert _allreduce_ms(p, 1) == 0.0
    t8 = _allreduce_ms(p, 8)
    t64 = _allreduce_ms(p, 64)
    assert 0 < t8 < t64           # DCN stage appears across hosts
    assert _allreduce_ms(2 * p, 8) > t8
    # within-host time matches the closed form 2P(D-1)/D / (2*ICI)
    from tools.bench_scaling import ICI_LINK_BW
    expect = 2 * p * (7 / 8) / (2 * ICI_LINK_BW) * 1e3
    np.testing.assert_allclose(t8, expect, rtol=1e-12)
