#!/usr/bin/env python
'''Sweep neighborlist-path variants at large N on TPU.

Variants: {fp32, bf16 compute} x {plain gathers, reverse_lists}.
All with precomputed nlist (build excluded; see profile_nlist_step.py).
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_nlist_step import make_box, timeit


def main():
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import neighbor_list

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    z, pos, cell = make_box(N)
    _ = float(jnp.sum(pos))  # poison fetch (PERF_NOTES.md)

    idx, kmask, _, _ = jax.jit(
        lambda p, c, m: neighbor_list(p, c, m, 5.0, K))(pos, cell, z > 0)
    edges = int(jnp.sum(kmask))
    print(f'N={N} K={K} edges={edges}')

    from newtonnet_tpu.ops.nlist import build_reverse_list
    rev, rev_mask = jax.jit(build_reverse_list)(idx, kmask)

    ref_force = None
    for cd in ('', 'bfloat16'):
        for rl in (0, 1, 2):  # 0: plain, 1: in-step rev, 2: precomputed rev
            model = NewtonNet(
                cutoff=5.0, graph_mode='neighborlist', k_max=K,
                reverse_lists=rl > 0, compute_dtype=cd,
                output_properties=('energy', 'gradient_force'))
            params = jax.jit(model.init)(jax.random.PRNGKey(0), z, pos, cell)
            nl = (idx, kmask, rev, rev_mask) if rl == 2 else (idx, kmask)
            f = jax.jit(lambda p, nl=nl: model.apply(
                p, z, pos, cell, nlist=nl)['gradient_force'])
            force = f(params)
            if ref_force is None:
                ref_force = force
            err = float(jnp.max(jnp.abs(force - ref_force)))
            t = timeit(f, params)
            print(f'cd={cd or "fp32":9s} rev={rl}: '
                  f'{t:7.2f} ms  {edges / t * 1e3 / 1e6:5.2f} M edges/s  '
                  f'max|dF|={err:.2e}')


if __name__ == '__main__':
    main()
