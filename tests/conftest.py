'''Test configuration: force JAX onto a virtual 8-device CPU mesh.

The axon TPU plugin overrides the JAX_PLATFORMS env var, so the platform is
pinned via jax.config before any backend initialization. Multi-chip sharding
tests run against 8 virtual CPU devices
(xla_force_host_platform_device_count), per SURVEY.md section 4.
'''
import os
import sys

os.environ.setdefault(
    'XLA_FLAGS',
    os.environ.get('XLA_FLAGS', '') + ' --xla_force_host_platform_device_count=8',
)

import jax

jax.config.update('jax_platforms', 'cpu')
# fp64 for strict numerical parity vs the torch oracle (reference MD17 config
# trains in double precision, scripts/config.yml:4). fp32/bf16-specific
# behavior is tested by explicit casts.
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    return jax.random.PRNGKey(0)
