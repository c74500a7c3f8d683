'''Driver entry points must stay importable and runnable.'''
import jax
import pytest


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    energy, forces = jax.jit(fn)(*args)
    assert energy.shape == (8,)
    assert forces.shape == (8, 24, 3)


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__
    n = min(8, len(jax.devices()))
    __graft_entry__.dryrun_multichip(n)
