"""Driver-hook regression tests: entry() compiles, dryrun_multichip runs on
the 8-device mesh. These mirror what the round driver executes."""

import importlib.util

import jax
import pytest


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.mark.slow
def test_entry_compiles():
    m = _load()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 1024, 128)


@pytest.mark.slow
def test_dryrun_multichip_8():
    m = _load()
    m.dryrun_multichip(8)
